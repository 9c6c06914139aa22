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
            ps, ss, us = out[i].setdefault(part, ([], [], []))
            ps.append(pids[ids])
            ss.append(sc[ids])
            if node.inner_hits is not None:
                # inner_hits needs the matching docs themselves, not just
                # their parent pointers — but only the top `size` per
                # parent survive the reduce, so prune per segment first
                # (url_of loops + RPC bytes stay O(parents x size), not
                # O(matching children)). docid order == url order on
                # url-sorted segments, so the (score desc, docid asc)
                # prune comparator matches the reduce's (score desc,
                # url asc) exactly; index-sorted segments skip the prune.
                keep = ids
                size = int(dict(node.inner_hits).get("size", 3))
                if ids.size > size and not r.manifest.get("index_sort"):
                    p = pids[ids]
                    order = np.lexsort((ids, -sc[ids], p))
                    p_sorted = p[order]
                    starts = np.r_[True, p_sorted[1:] != p_sorted[:-1]]
                    grp = np.cumsum(starts) - 1
                    ridx = np.arange(order.size)
                    rank = ridx - ridx[starts][grp]
                    keep = np.sort(ids[order[rank < size]])
                us.append((
                    pids[keep],
                    sc[keep],
                    np.asarray([r.url_of(int(d)) for d in keep],
                               dtype=object),
                ))
    for i in out:
        out[i] = {
            p: (
                np.concatenate(ps) if ps else np.empty(0, dtype=object),
                np.concatenate(ss) if ss else np.empty(0),
                (
                    np.concatenate([u[0] for u in us]),
                    np.concatenate([u[1] for u in us]),
                    np.concatenate([u[2] for u in us]),
                ) if us else None,
            )
            for p, (ps, ss, us) in out[i].items()
        }
    return out


_EMPTY_MAP = (np.empty(0, dtype="<U1"), np.empty(0))


def reduce_join_phase1(nodes, partials_list) -> dict:
    """Merge phase-1 partials (one per scatter actor) into the final
    per-(node, partition) parent maps ``{node_idx: {part: (sorted
    parent-id ndarray, score ndarray)}}`` (vectorized searchsorted
    lookup in phase 2 — python dicts were the constant-factor ceiling
    at 10^5 matching parents), applying score_mode / min_children /
    max_children / the has_parent score flag."""
    from raydex.search.query import HasChild

    maps: dict = {i: {} for i in range(len(nodes))}
    for i, node in enumerate(nodes):
        per_part: dict = {}
        for partial in partials_list:
            for part, entry in partial.get(i, {}).items():
                pids, scs = entry[0], entry[1]
                ps, ss = per_part.setdefault(part, ([], []))
                ps.append(pids)
                ss.append(scs)
        for part, (ps, ss) in per_part.items():
            pid = np.concatenate(ps) if ps else np.empty(0, dtype=object)
            sc = np.concatenate(ss) if ss else np.empty(0)
            if pid.size == 0:
                maps[i][part] = _EMPTY_MAP
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
                maps[i][part] = (uniq[keep], val[keep].astype(np.float64))
            else:  # HasParent — parent ids are unique per partition
                keys = pid.astype(str)
                order = np.argsort(keys, kind="stable")
                vals = (sc[order].astype(np.float64) if node.score
                        else np.ones(keys.size))
                maps[i][part] = (keys[order], vals)
    return maps


def reduce_inner_hits(nodes, partials_list) -> dict:
    """Per-(node, partition) inner-hit lists from the same phase-1
    partials (the reference's inner_hits fetch sub-phase,
    ``ParentChildInnerHitContextBuilder.java``): for has_child,
    ``{parent_id: [(child_url, score), ...]}`` — the top ``size``
    matching children by (score desc, url); for has_parent,
    ``{parent_id: (parent_url, score)}`` — the matching parent itself.
    Empty for nodes that did not request inner_hits."""
    from raydex.search.query import HasChild

    out: dict = {}
    for i, node in enumerate(nodes):
        if node.inner_hits is None:
            continue
        size = int(dict(node.inner_hits).get("size", 3))
        per_part: dict = {}
        for partial in partials_list:
            for part, entry in partial.get(i, {}).items():
                ih = entry[2]
                if ih is None:
                    continue
                pids, scs, urls = ih
                bucket = per_part.setdefault(part, {})
                if isinstance(node, HasChild):
                    for p, s, u in zip(pids, scs, urls):
                        bucket.setdefault(str(p), []).append((float(s), str(u)))
                else:
                    for p, s, u in zip(pids, scs, urls):
                        bucket[str(p)] = (str(u), float(s))
        if isinstance(node, HasChild):
            for bucket in per_part.values():
                for p, lst in bucket.items():
                    lst.sort(key=lambda t: (-t[0], t[1]))
                    bucket[p] = [
                        {"url": u, "score": s} for s, u in lst[:size]
                    ]
        else:
            for bucket in per_part.values():
                for p, (u, s) in bucket.items():
                    bucket[p] = [{"url": u, "score": s}]
        out[i] = per_part
    return out


def attach_inner_hits(hits, nodes, inner_maps, seg_dirs, parent_ids_of):
    """Decorate merged top-k ``hits`` in place with their inner_hits
    sections. ``parent_ids_of([(ordinal, docid), ...]) -> [parent_id]``
    resolves a child hit's parent pointer (has_parent needs it; the
    local searcher reads its own readers, the scatter searcher asks the
    actor that owns the segment)."""
    from raydex.search.query import HasChild

    if not inner_maps:
        return hits
    need_parent = any(
        not isinstance(nodes[i], HasChild) for i in inner_maps
    )
    hit_pids = None
    if need_parent and hits:
        hit_pids = parent_ids_of([(h["ordinal"], h["docid"]) for h in hits])
    for hi, h in enumerate(hits):
        part = partition_of(seg_dirs[h["ordinal"]])
        for i, per_part in inner_maps.items():
            node = nodes[i]
            name = dict(node.inner_hits).get(
                "name",
                node.type if isinstance(node, HasChild) else node.parent_type,
            )
            bucket = per_part.get(part, {})
            key = h["url"] if isinstance(node, HasChild) else (
                hit_pids[hi] if hit_pids is not None else None
            )
            sub = bucket.get(key) if key is not None else None
            if sub:
                h.setdefault("inner_hits", {})[name] = sub
    return hits


def evaluator_join_maps(jnodes, join_maps, seg_dir) -> dict | None:
    """The per-reader slice handed to SegmentEvaluator: {id(node):
    (sorted parent-id ndarray, score ndarray)} for this reader's
    partition."""
    if not jnodes:
        return None
    part = partition_of(seg_dir)
    return {
        id(node): join_maps.get(i, {}).get(part, _EMPTY_MAP)
        for i, node in enumerate(jnodes)
    }
