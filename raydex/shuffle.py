"""Scoped DataContext overrides for keyed hash shuffles.

Ray Data's hash-shuffle aggregator actors reserve
``override x partitions/aggregator`` CPUs EACH
(ray.data hash_shuffle.py ``_get_aggregator_ray_remote_args``); left at
defaults, a 200-partition groupby on a 4-cpu cluster requests actors
that never schedule — the streaming executor then deadlocks with the
producing stage. Every keyed shuffle in raydex (index build routing,
nested fold, collapse expand) applies the same guard: cap the
aggregator pool at half the cluster and size the per-partition CPU
override so the WHOLE pool fits. This module is the one copy.
"""

from __future__ import annotations

import os
from contextlib import contextmanager


@contextmanager
def scoped_hash_shuffle(*datasets, num_partitions: int = 200):
    """Hash-shuffle strategy + deadlock-safe aggregator sizing, applied
    to the global DataContext (restored on exit) AND to the captured
    context of each given dataset (kept — a Dataset snapshots its
    context at creation, and derived datasets inherit it, so later
    groupbys stay safe). Each given dataset's context is DETACHED
    (deep-copied) first: derived datasets share the parent's context
    object by reference, so mutating it in place would otherwise leak
    the override into the caller's upstream lineage forever (the
    _keyed_blocks post-LSH deadlock class). Yields the cluster CPU
    count."""
    import copy as _copy

    import ray
    from ray.data.context import DataContext, ShuffleStrategy

    ctx = DataContext.get_current()
    saved = (
        ctx.shuffle_strategy,
        ctx.max_hash_shuffle_aggregators,
        ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override,
    )
    ncpu = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8
    per_part = float(os.environ.get(
        "RAYDEX_SHUFFLE_CPU_PER_PART",
        min(0.25, ncpu / (2.0 * max(num_partitions, 1))),
    ))
    naggs = int(os.environ.get("RAYDEX_SHUFFLE_AGGS", str(max(2, ncpu // 2))))
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    ctx.max_hash_shuffle_aggregators = naggs
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = per_part
    for ds in datasets:
        plan = getattr(ds, "_plan", None)
        if plan is not None and getattr(plan, "_context", None) is not None:
            plan._context = _copy.deepcopy(plan._context)
        dctx = getattr(ds, "context", None)
        if dctx is not None:
            dctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
            dctx.max_hash_shuffle_aggregators = naggs
            dctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = per_part
    try:
        yield ncpu
    finally:
        (ctx.shuffle_strategy,
         ctx.max_hash_shuffle_aggregators,
         ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override) = saved
