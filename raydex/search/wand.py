"""Block-max WAND (BMW) top-k with dynamic pruning, + block-max conjunction.

Re-implements, from the published BMW algorithm family (Ding & Suel,
"Faster top-k document retrieval using block-max indexes", SIGIR 2011 —
the same dynamic pruning the reference enables via
``ScoreMode.TOP_SCORES`` / ``totalHitsThreshold``,
``server/.../search/query/QueryPhase.java:373-395``,
``TopDocsCollectorContext.java:202-204``), document-at-a-time scoring
over the block posting lists of ``raydex.index.postings``:

- each term iterator carries a per-block score upper bound computed from
  the stored ``(max_tf, min_dl)`` metadata — sound because BM25 is
  increasing in tf and decreasing in dl;
- a pivot is chosen where the prefix sum of term upper bounds first
  exceeds the current threshold θ (kth best score); block-level maxima
  then either justify full evaluation or allow skipping to the next
  block boundary;
- candidate docs are scored by summing term contributions in the
  ORIGINAL query-term order — bit-identical float64 arithmetic to the
  brute-force scorer, so `wand == brute` exactly (property-tested).

Threshold semantics: within a segment docids are visited in increasing
order, so a candidate must score STRICTLY above θ once k docs are
collected (equal score ⇒ loses the docid-asc tie-break).
"""

from __future__ import annotations

import heapq

import numpy as np

from raydex.index.postings import decode_block
from raydex.search.bm25 import (
    B,
    K1,
    GlobalStats,
    idf,
    term_score,
    tf_norm_denom_add,
)

_INF = np.iinfo(np.int64).max


class TermIter:
    """Document-at-a-time iterator over one term's block postings."""

    __slots__ = (
        "reader", "ti", "idf_t", "avgdl", "off", "idsb", "nb", "n",
        "last", "maxtf", "mindl", "block_ub", "max_ub", "nblocks",
        "cur_b", "ids", "tfs", "pos", "exhausted",
    )

    def __init__(self, reader, ti: int, idf_t: float, avgdl: float):
        self.reader = reader
        self.ti = ti
        self.idf_t = idf_t
        self.avgdl = avgdl
        sl = reader.term_blocks(ti)
        self.off = reader.blk_off[sl]
        self.idsb = reader.blk_idsb[sl]
        self.nb = reader.blk_nb[sl]
        self.n = reader.blk_n[sl]
        self.last = reader.blk_last[sl]
        self.maxtf = reader.blk_maxtf[sl].astype(np.float64)
        self.mindl = reader.blk_mindl[sl].astype(np.float64)
        denom_add = K1 * (1.0 - B + B * self.mindl / avgdl)
        self.block_ub = idf_t * (K1 + 1.0) * self.maxtf / (self.maxtf + denom_add)
        self.max_ub = float(self.block_ub.max())
        self.nblocks = self.last.size
        self.cur_b = -1
        self.exhausted = False
        self._load_block(0)

    def _load_block(self, b: int) -> None:
        if b >= self.nblocks:
            self.exhausted = True
            return
        self.cur_b = b
        self.ids, self.tfs = decode_block(
            self.reader.payload, int(self.off[b]), int(self.idsb[b]), int(self.nb[b])
        )
        self.pos = 0

    def doc(self) -> int:
        return _INF if self.exhausted else int(self.ids[self.pos])

    def next_geq(self, target: int) -> None:
        if self.exhausted or self.ids[self.pos] >= target:
            return
        if target > self.last[self.cur_b]:
            b = int(np.searchsorted(self.last, target))
            if b >= self.nblocks:
                self.exhausted = True
                return
            self._load_block(b)
        self.pos = int(np.searchsorted(self.ids, target))

    def advance(self) -> None:
        self.pos += 1
        if self.pos >= self.ids.size:
            self._load_block(self.cur_b + 1)

    def block_bound_for(self, target: int) -> float:
        """UB of the block that WOULD contain the first docid >= target
        (shallow move — metadata only, no decode)."""
        if self.exhausted:
            return 0.0
        if target <= self.last[self.cur_b]:
            return float(self.block_ub[self.cur_b])
        b = int(np.searchsorted(self.last, target))
        if b >= self.nblocks:
            return 0.0
        return float(self.block_ub[b])

    def block_last_for(self, target: int) -> int:
        if self.exhausted:
            return _INF
        if target <= self.last[self.cur_b]:
            return int(self.last[self.cur_b])
        b = int(np.searchsorted(self.last, target))
        return _INF if b >= self.nblocks else int(self.last[b])

    def score_current(self) -> float:
        tf = float(self.tfs[self.pos])
        dl = float(self.reader.dl_quant[int(self.ids[self.pos])])
        denom_add = K1 * (1.0 - B + B * dl / self.avgdl)
        return self.idf_t * (K1 + 1.0) * tf / (tf + denom_add)


def _finalize(results: list[tuple[float, int]], k: int):
    results.sort(key=lambda x: (-x[0], x[1]))
    results = results[:k]
    ids = np.array([d for _, d in results], dtype=np.int64)
    scores = np.array([s for s, _ in results], dtype=np.float32)
    return ids, scores


def _make_iters(reader, terms, stats: GlobalStats):
    avgdl = stats.avgdl
    iters = []
    for term in terms:
        ti = reader.lookup(term)
        gdf = stats.df.get(term, 0)
        if ti < 0 or gdf == 0:
            iters.append(None)  # keep slot for AND semantics / term order
            continue
        iters.append(TermIter(reader, ti, float(idf(stats.ndocs, gdf)), avgdl))
    return iters


def _score_doc(iters_in_order, d: int) -> float:
    """Sum contributions in original query-term order (float-identical to
    the brute-force accumulation)."""
    s = 0.0
    for it in iters_in_order:
        if it is not None and not it.exhausted and it.doc() == d:
            s += it.score_current()
    return s


class _TermState:
    """Per-term block cursor for the vectorized BMW scorer."""

    __slots__ = ("idf_t", "last", "ub", "off", "idsb", "nb", "n",
                 "nblocks", "bi", "ids", "tfs", "lo", "hi")

    def __init__(self, reader, ti: int, idf_t: float, avgdl: float):
        sl = reader.term_blocks(ti)
        self.idf_t = idf_t
        self.last = reader.blk_last[sl]
        self.off = reader.blk_off[sl]
        self.idsb = reader.blk_idsb[sl]
        self.nb = reader.blk_nb[sl]
        self.n = reader.blk_n[sl]
        maxtf = reader.blk_maxtf[sl].astype(np.float64)
        mindl = reader.blk_mindl[sl].astype(np.float64)
        denom_add = K1 * (1.0 - B + B * mindl / avgdl)
        self.ub = idf_t * (K1 + 1.0) * maxtf / (maxtf + denom_add)
        self.nblocks = self.last.size
        self.bi = 0
        self.ids = None  # decoded current block (lazy — skips never decode)
        self.tfs = None
        self.lo = self.hi = 0


def wand_top_k(
    reader, terms: list[str], k: int, stats: GlobalStats
) -> tuple[np.ndarray, np.ndarray]:
    """Disjunctive top-k via vectorized MaxScore with block-max lookups
    (Turtle & Flood's MaxScore essential-list split + the block-max
    refinement of Ding & Suel 2011 for the non-essential side; the same
    pruning family the reference enables through ``ScoreMode.TOP_SCORES``,
    ``QueryPhase.java:373-395``):

    1. bootstrap θ = exact kth-best single-term partial score of the
       highest-upper-bound term (partials are lower bounds, so θ is a
       sound threshold);
    2. split terms: the maximal ascending-UB prefix with
       ``cumsum(max_ub) < θ`` is NON-ESSENTIAL — a doc matching only
       those terms scores strictly below the final kth score and can be
       dropped without changing even tie-breaks; the rest are ESSENTIAL;
    3. candidates = docs matching any essential term, marked in a DENSE
       boolean over the segment's doc space (scatter-stores, no sorted
       candidate list — the compacted-list variant paid O(|C| log df)
       searchsorted per term and measured 2-3x SLOWER than brute on
       head-term queries where |C| approaches ndocs);
    4. non-essential contributions are fetched by decoding ONLY the
       blocks whose docid span contains a candidate (one prefix-sum of
       the mask + an O(nblocks) range test — block-max metadata gives
       the spans without touching the payload), then added through the
       candidate mask;
    5. accumulate into brute's dense float64 score array in the
       ORIGINAL query-term order — bit-identical arithmetic to the
       brute-force scorer, then the same ``top_k_select`` tie handling.

    Degradation is graceful by construction: with a useless θ the split
    makes every term essential and the algorithm IS the brute scorer
    (plus one θ bootstrap) — unlike a document-at-a-time WAND loop,
    whose per-doc Python overhead made it 40x slower than brute on
    head-term-heavy queries (measured on a 150k-doc segment; the DAAT
    variant is kept below for differential testing).
    """
    from raydex.index.postings import decode_blocks as _decb

    avgdl = stats.avgdl
    slots: list[tuple[int, float] | None] = []  # (term index, idf)
    for term in terms:
        ti = reader.lookup(term)
        gdf = stats.df.get(term, 0)
        if ti < 0 or gdf == 0:
            slots.append(None)
            continue
        slots.append((ti, float(idf(stats.ndocs, gdf))))
    live = [s for s in slots if s is not None]
    if not live or k <= 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)

    dl_quant = reader.dl_quant

    def term_max_ub(ti: int, idf_t: float) -> float:
        sl = reader.term_blocks(ti)
        maxtf = reader.blk_maxtf[sl].astype(np.float64)
        mindl = reader.blk_mindl[sl].astype(np.float64)
        denom_add = K1 * (1.0 - B + B * mindl / avgdl)
        return float((idf_t * (K1 + 1.0) * maxtf / (maxtf + denom_add)).max())

    ubs = np.array([term_max_ub(ti, f) for ti, f in live])

    # 1. θ bootstrap from the highest-UB term's exact partial top-k
    theta = -1.0
    if len(live) > 1:
        bi = int(np.argmax(ubs))
        ti_b, idf_b = live[bi]
        ids_b, tfs_b = reader.postings(ti_b)
        if ids_b.size >= k:
            part = term_score(tfs_b, tf_norm_denom_add(dl_quant[ids_b], avgdl), idf_b)
            theta = float(-np.partition(-part, k - 1)[k - 1])

    # 2. essential split (ascending UB, strict < θ — ties stay essential
    # so equal-score docid tie-breaks survive exactly)
    order = np.argsort(ubs, kind="stable")
    csum = np.cumsum(ubs[order])
    n_nonessential = int(np.searchsorted(csum, theta, side="left"))
    noness = set(order[:n_nonessential].tolist())

    # 3. mark candidates = docs matching ANY essential term, in a dense
    # boolean over the segment's doc space (brute's accumulator shape:
    # scatter-stores replace the sort/searchsorted bookkeeping of a
    # compacted candidate list — measured 2-3x on head-term queries,
    # where |C| is a large fraction of ndocs)
    cand_mask = np.zeros(reader.ndocs, dtype=bool)
    any_ess = False
    for j, (ti, _) in enumerate(live):
        if j not in noness:
            cand_mask[reader.postings(ti)[0]] = True
            any_ess = True
    if not any_ess:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)
    # prefix-sum of the mask: O(nblocks) candidate-in-block tests for
    # the selective decode below, no per-candidate searchsorted
    cum = None

    # 4+5. accumulate in ORIGINAL term order (float64 parity with brute)
    scores = np.zeros(reader.ndocs, dtype=np.float64)
    post_cache = getattr(reader, "_post_cache", None)
    li = 0
    for s in slots:
        if s is None:
            continue
        ti, idf_t = s
        j = li
        li += 1
        if j in noness:
            # non-essential: contributions land ONLY on candidate docs;
            # source = the decoded-postings LRU when warm (repeated
            # query terms), else a ONE-PASS decode of only the blocks
            # whose docid range contains a candidate (block-max metadata
            # gives the spans without touching the payload)
            cached = post_cache.get(ti) if post_cache is not None else None
            if cached is not None:
                ids_t, tfs_t = cached
            else:
                sl = reader.term_blocks(ti)
                last = reader.blk_last[sl]
                if cum is None:
                    cum = np.zeros(reader.ndocs + 1, dtype=np.int64)
                    np.cumsum(cand_mask, out=cum[1:])
                prev_last = np.empty(last.size, dtype=np.int64)
                prev_last[0] = -1
                prev_last[1:] = last[:-1]
                touched = np.flatnonzero(
                    cum[last.astype(np.int64) + 1] - cum[prev_last + 1] > 0)
                if touched.size == 0:
                    continue
                if touched.size * 4 >= last.size:
                    # most blocks touched: a full decode costs the same
                    # AND lands in the LRU for the next query
                    ids_t, tfs_t = reader.postings(ti)
                else:
                    ids_t, tfs_t = _decb(
                        reader.payload,
                        reader.blk_off[sl][touched],
                        reader.blk_idsb[sl][touched],
                        reader.blk_nb[sl][touched],
                        reader.blk_n[sl][touched],
                    )
            sel = cand_mask[ids_t]
            if not sel.any():
                continue
            ids_h = ids_t[sel]
            denom = tf_norm_denom_add(dl_quant[ids_h], avgdl)
            scores[ids_h] += term_score(tfs_t[sel], denom, idf_t)
        else:
            from raydex.search.bm25 import cached_term_contrib

            ids_t, tfs_t = reader.postings(ti)
            scores[ids_t] += cached_term_contrib(
                reader, ti, ids_t, tfs_t, idf_t, avgdl)

    # exact (score desc, docid asc) top-k with brute's tie handling
    from raydex.search.bm25 import top_k_select

    return top_k_select(scores, k, cand_mask)


def wand_top_k_daat(
    reader, terms: list[str], k: int, stats: GlobalStats
) -> tuple[np.ndarray, np.ndarray]:
    """Doc-at-a-time BMW (the round-1/2 scorer) — kept as a differential
    oracle for the vectorized path."""
    slots = _make_iters(reader, terms, stats)
    live = [it for it in slots if it is not None]
    if not live or k <= 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)

    heap: list[float] = []  # min-heap of the current top-k scores
    results: list[tuple[float, int]] = []

    while True:
        live = [it for it in live if not it.exhausted]
        if not live:
            break
        live.sort(key=lambda it: it.doc())
        theta = heap[0] if len(heap) >= k else -1.0

        # pivot: first index where prefix of term UBs exceeds theta
        acc = 0.0
        pivot = -1
        for i, it in enumerate(live):
            acc += it.max_ub
            if acc > theta:
                pivot = i
                break
        if pivot < 0:
            break  # no document can beat theta
        pivot_doc = live[pivot].doc()
        # extend over iterators tied at pivot_doc — they contribute too
        upto = pivot
        while upto + 1 < len(live) and live[upto + 1].doc() == pivot_doc:
            upto += 1

        # block-max refinement at pivot_doc
        block_sum = 0.0
        for it in live[: upto + 1]:
            block_sum += it.block_bound_for(pivot_doc)
        if block_sum > theta:
            if live[0].doc() == pivot_doc:
                # fully evaluate pivot_doc
                s = _score_doc(slots, pivot_doc)
                if s > theta or len(heap) < k:
                    heapq.heappush(heap, s)
                    if len(heap) > k:
                        heapq.heappop(heap)
                    results.append((s, pivot_doc))
                # advance EVERY iterator positioned at pivot_doc (iterators
                # beyond the pivot may be parked on the same doc)
                for it in live:
                    if not it.exhausted and it.doc() == pivot_doc:
                        it.advance()
            else:
                # advance the largest-UB iterator still strictly before
                # pivot_doc (choosing one already AT pivot_doc would no-op)
                behind = [it for it in live[:pivot] if it.doc() < pivot_doc]
                cand = max(behind, key=lambda it: it.max_ub)
                cand.next_geq(pivot_doc)
        else:
            # skip: next doc where some block configuration changes
            d = min(it.block_last_for(pivot_doc) for it in live[: upto + 1]) + 1
            if upto + 1 < len(live):
                d = min(d, live[upto + 1].doc())
            d = max(d, pivot_doc + 1)
            for it in live[: upto + 1]:
                if it.doc() < d:
                    it.next_geq(d)

    # keep only entries that made the final top-k
    return _finalize(results, k)


def conjunction_top_k(
    reader, terms: list[str], k: int, stats: GlobalStats
) -> tuple[np.ndarray, np.ndarray]:
    """Conjunctive (bool.must / operator=and) top-k via vectorized
    sorted-list intersection: survivors narrow from the RAREST list
    through one ``searchsorted`` per other term (the reference's
    lead-cost conjunction ordering, SURVEY.md §2.8, without the
    per-doc Python advance loop it replaced — measured 20x+ on
    head-term conjunctions), then one vectorized scoring pass in the
    ORIGINAL term order (float64, bit-identical to the brute scorer)."""
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32))
    tis: list[tuple[int, float]] = []
    for term in terms:
        ti = reader.lookup(term)
        gdf = stats.df.get(term, 0)
        if ti < 0 or gdf == 0:  # a missing must-term empties the result
            return empty
        tis.append((ti, float(idf(stats.ndocs, gdf))))
    if not tis or k <= 0:
        return empty
    posts = [reader.postings(ti) for ti, _ in tis]
    lead = min(range(len(posts)), key=lambda i: posts[i][0].size)
    ids = posts[lead][0]
    for i, (ids_t, _) in enumerate(posts):
        if i == lead or ids.size == 0:
            continue
        pos = np.searchsorted(ids_t, ids)
        in_rng = pos < ids_t.size
        hit = np.zeros(ids.size, dtype=bool)
        hit[in_rng] = ids_t[pos[in_rng]] == ids[in_rng]
        ids = ids[hit]
    if ids.size == 0:
        return empty
    scores = np.zeros(ids.size, dtype=np.float64)
    denom = tf_norm_denom_add(reader.dl_quant[ids], stats.avgdl)
    for (ti, idf_t), (ids_t, tfs_t) in zip(tis, posts):
        pos = np.searchsorted(ids_t, ids)
        scores += term_score(tfs_t[pos], denom, idf_t)
    if ids.size > k:
        kth = -np.partition(-scores, k - 1)[k - 1]
        keep = scores >= kth
        ids, scores = ids[keep], scores[keep]
    order = np.lexsort((ids, -scores))[:k]
    return ids[order], scores[order].astype(np.float32)
