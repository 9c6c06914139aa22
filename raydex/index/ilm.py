"""Index lifecycle management (ILM) — age-driven phase execution.

Reference: ``x-pack/plugin/ilm`` (``IndexLifecycleService``,
``LifecyclePolicy``, ``TimeseriesLifecycleType``): a policy names
ordered phases (hot → warm → cold → delete), each entered after
``min_age`` and running a fixed set of actions; the service steps every
managed index idempotently. The phase/action vocabulary here maps onto
this engine's existing primitives:

- hot.rollover      -> :meth:`raydex.index.aliases.AliasRegistry.rollover`
- warm.forcemerge   -> :func:`raydex.index.compact.expunge_deletes`
                       (+ :func:`raydex.index.merge.merge_index` when
                       ``max_num_segments`` requested and mergeable)
- warm.shrink       -> :func:`raydex.index.reshape.shrink_index` into a
                       ``<index>-shrink`` sibling, alias repointed
- delete.delete     -> removed from the alias and the filesystem

State per managed index lives in ``<index>/ilm.json`` (phase + done
actions) so `step()` is idempotent and resumable — the reference keeps
the same cursor in index metadata (``LifecycleExecutionState``)."""

from __future__ import annotations

import json
import os
import shutil
import time

_PHASE_ORDER = ("hot", "warm", "cold", "delete")


def _age_s(index_dir: str) -> float:
    from raydex.index.build import INDEX_MANIFEST

    return time.time() - os.path.getmtime(
        os.path.join(index_dir, INDEX_MANIFEST))


def _state_path(index_dir: str) -> str:
    return os.path.join(index_dir, "ilm.json")


def _load_state(index_dir: str) -> dict:
    p = _state_path(index_dir)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"phase": "hot", "done": []}


def _store_state(index_dir: str, st: dict) -> None:
    tmp = _state_path(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(st, f)
    os.replace(tmp, _state_path(index_dir))


def step(registry, alias: str, policy: dict,
         now_age_s=None) -> list[dict]:
    """One ILM tick over every index of ``alias``: advance phases whose
    ``min_age_s`` has passed, run each phase's not-yet-done actions
    once. ``now_age_s`` (callable index_dir -> age seconds) overrides
    the mtime clock for tests. Returns a log of applied actions."""
    from raydex.index.compact import expunge_deletes
    from raydex.index.reshape import shrink_index

    phases = policy.get("phases") or {}
    log: list[dict] = []
    for row in list(registry.get(alias)):
        idx = row["index"]
        if not os.path.exists(idx):
            continue
        st = _load_state(idx)
        # monotone age: index actions (forcemerge, shrink) rewrite the
        # manifest and reset its mtime, so the clock anchors on the
        # FIRST tick's observed age (managed_age_epoch) and only grows —
        # a regressed clock must never re-open earlier gates or, worse,
        # let a later phase (delete!) run before its min_age
        raw_age = (now_age_s(idx) if now_age_s else _age_s(idx))
        anchor = st.get("managed_age_epoch")
        if anchor is None:
            st["managed_age_epoch"] = time.time() - raw_age
            age = raw_age
        else:
            age = max(raw_age, time.time() - anchor)
        if now_age_s:  # test clock is authoritative when supplied
            age = raw_age
        # the furthest phase whose min_age has passed
        target = st["phase"]
        for ph in _PHASE_ORDER:
            body = phases.get(ph)
            if body is None:
                continue
            if age >= float(body.get("min_age_s", 0)):
                target = ph
        # run phases from current to target in order; EVERY phase is
        # age-gated at execution time — a target that regressed behind
        # the stored phase must not fall through to later phases
        started = False
        for ph in _PHASE_ORDER:
            if ph == st["phase"]:
                started = True
            if not started or phases.get(ph) is None:
                continue
            if age < float(phases[ph].get("min_age_s", 0)):
                break  # this phase (and all later ones) not due yet
            actions = phases[ph].get("actions") or {}
            for aname in ("rollover", "forcemerge", "shrink", "delete"):
                if aname not in actions:
                    continue
                key = f"{ph}.{aname}"
                if key in st["done"]:
                    continue
                body = actions[aname]
                if aname == "rollover":
                    if row.get("is_write_index"):
                        r = registry.rollover(alias, body)
                        if r["rolled_over"]:
                            log.append({"index": idx, "action": key,
                                        "new_index": r["new_index"]})
                            st["done"].append(key)
                    # non-write indexes skip rollover permanently
                    else:
                        st["done"].append(key)
                elif aname == "forcemerge":
                    expunge_deletes(idx, use_ray=False)
                    log.append({"index": idx, "action": key})
                    st["done"].append(key)
                elif aname == "shrink":
                    nshards = int(body.get("number_of_shards", 1))
                    dst = idx.rstrip("/") + "-shrink"
                    if not os.path.exists(dst):
                        shrink_index(idx, dst, nshards)
                    registry.update_aliases([
                        {"remove": {"alias": alias, "index": idx}},
                        {"add": {"alias": alias, "index": dst,
                                 "is_write_index":
                                     bool(row.get("is_write_index"))}},
                    ])
                    log.append({"index": idx, "action": key,
                                "shrunk_to": dst})
                    st["done"].append(key)
                    _store_state(dst, st)
                    # the reference's shrink action deletes the source
                    # index after the swap — keeping it would silently
                    # double the disk footprint forever
                    shutil.rmtree(idx, ignore_errors=True)
                    idx = dst  # later phases act on the shrunk index
                elif aname == "delete":
                    registry.update_aliases(
                        [{"remove": {"alias": alias, "index": idx}}])
                    shutil.rmtree(idx, ignore_errors=True)
                    log.append({"index": idx, "action": key})
                    idx = None
                    break
            # phase-completion gate: the reference blocks the phase
            # transition until every action of the current phase has
            # run (WaitForRolloverReadyStep holds a write index in hot
            # until rollover fires) — an incomplete phase (e.g. unmet
            # rollover conditions) must NOT fall through to warm/delete,
            # which would forcemerge/shrink/rmtree an un-rolled write
            # index and lose data
            if idx is not None:
                pending = [a for a in
                           ("rollover", "forcemerge", "shrink", "delete")
                           if a in actions
                           and f"{ph}.{a}" not in st["done"]]
                if pending:
                    target = ph  # stored phase must not advance past here
                    break
            if idx is None or ph == target:
                break
        if idx is not None:
            # phase never regresses (ordered by _PHASE_ORDER)
            if _PHASE_ORDER.index(target) > _PHASE_ORDER.index(st["phase"]):
                st["phase"] = target
            _store_state(idx, st)
    return log
