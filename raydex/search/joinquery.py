"""Per-partition two-phase evaluation of ``has_child``/``has_parent``.

The reference executes these through Lucene's
``JoinUtil.createJoinQuery`` over the join field's global ordinals,
per shard (``modules/parent-join/.../query/HasChildQueryBuilder.java:
288-327``). raydex makes the same two phases explicit over a
partition's segments:

- **phase 1** (per segment, embarrassingly parallel): evaluate the
  inner query, keep docs of the queried relation, emit their
  ``(parent_id, score)`` pairs — children's declared parents for
  ``has_child``, the parents' own ids for ``has_parent``.
- **reduce** (coordinator or local): group pairs per partition and
  parent id; apply ``score_mode`` / ``min_children`` / ``max_children``
  (has_child) or the ``score`` flag (has_parent). The result is one
  small ``{parent_id: score}`` map per (node, partition) — bounded by
  the number of MATCHING parents, never the corpus.
- **phase 2** (inside :class:`SegmentEvaluator`, composable in bool):
  a doc matches when its relation name and parent-id doc-values hit
  the partition's map.

Correctness leans on the build-time routing contract: a parent and all
of its children share one partition (``joinfield.join_routing_keys``),
so per-partition maps are complete.
"""

from __future__ import annotations

import re

import numpy as np

_PART_RE = re.compile(r"part=(\d+)")


def partition_of(seg_dir: str) -> int:
    m = _PART_RE.search(seg_dir)
    return int(m.group(1)) if m else 0


def join_phase1(readers, nodes, stats, analyzer, runtime_mappings=None):
    """Phase-1 partials over ``readers``: ``{node_idx: {part:
    (parent_ids ndarray, scores ndarray)}}`` — serializable, one RPC's
    worth per scatter actor."""
    from raydex.search.query import HasChild, SegmentEvaluator

    out: dict = {i: {} for i in range(len(nodes))}
    for r in readers:
        part = partition_of(r.seg_dir)
        ev = SegmentEvaluator(r, stats, analyzer,
                              runtime_mappings=runtime_mappings)
        names, pids, _ = r.join_field_data()
        for i, node in enumerate(nodes):
            sc, mk = ev.eval(node.inner)
            if r.live is not None:
                mk = mk & r.live
            rel = node.type if isinstance(node, HasChild) else node.parent_type
            ids = np.flatnonzero(mk & (names == rel))
            ps, ss = out[i].setdefault(part, ([], []))
            ps.append(pids[ids])
            ss.append(sc[ids])
    for i in out:
        out[i] = {
            p: (
                np.concatenate(ps) if ps else np.empty(0, dtype=object),
                np.concatenate(ss) if ss else np.empty(0),
            )
            for p, (ps, ss) in out[i].items()
        }
    return out


def reduce_join_phase1(nodes, partials_list) -> dict:
    """Merge phase-1 partials (one per scatter actor) into the final
    per-(node, partition) parent maps ``{node_idx: {part: {parent_id:
    score}}}``, applying score_mode / min_children / max_children /
    the has_parent score flag."""
    from raydex.search.query import HasChild

    maps: dict = {i: {} for i in range(len(nodes))}
    for i, node in enumerate(nodes):
        per_part: dict = {}
        for partial in partials_list:
            for part, (pids, scs) in partial.get(i, {}).items():
                ps, ss = per_part.setdefault(part, ([], []))
                ps.append(pids)
                ss.append(scs)
        for part, (ps, ss) in per_part.items():
            pid = np.concatenate(ps) if ps else np.empty(0, dtype=object)
            sc = np.concatenate(ss) if ss else np.empty(0)
            if pid.size == 0:
                maps[i][part] = {}
                continue
            if isinstance(node, HasChild):
                uniq, inv = np.unique(pid.astype(str), return_inverse=True)
                cnt = np.bincount(inv)
                mode = node.score_mode
                if mode == "sum":
                    val = np.bincount(inv, weights=sc)
                elif mode == "avg":
                    val = np.bincount(inv, weights=sc) / cnt
                elif mode == "min":
                    val = np.full(uniq.size, np.inf)
                    np.minimum.at(val, inv, sc)
                elif mode == "max":
                    val = np.full(uniq.size, -np.inf)
                    np.maximum.at(val, inv, sc)
                else:  # none -> constant (the filter-context contract)
                    val = np.ones(uniq.size)
                keep = cnt >= node.min_children
                if node.max_children:
                    keep &= cnt <= node.max_children
                maps[i][part] = {
                    str(u): float(v) for u, v in zip(uniq[keep], val[keep])
                }
            else:  # HasParent — parent ids are unique per partition
                if node.score:
                    maps[i][part] = {
                        str(u): float(s) for u, s in zip(pid, sc)
                    }
                else:
                    maps[i][part] = dict.fromkeys(
                        (str(u) for u in pid), 1.0
                    )
    return maps


def evaluator_join_maps(jnodes, join_maps, seg_dir) -> dict | None:
    """The per-reader slice handed to SegmentEvaluator: {id(node):
    {parent_id: score}} for this reader's partition."""
    if not jnodes:
        return None
    part = partition_of(seg_dir)
    return {
        id(node): join_maps.get(i, {}).get(part, {})
        for i, node in enumerate(jnodes)
    }
