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
from raydex.search.bm25 import B, K1, GlobalStats, idf

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


def wand_top_k(
    reader, terms: list[str], k: int, stats: GlobalStats
) -> tuple[np.ndarray, np.ndarray]:
    """Disjunctive (match/bool.should) top-k with BMW pruning."""
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
    """Conjunctive (bool.must / operator=and) top-k via galloping
    next_geq intersection (the reference's postings conjunction shape,
    SURVEY.md §2.8)."""
    slots = _make_iters(reader, terms, stats)
    if not slots or any(it is None for it in slots) or k <= 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)
    iters = sorted(slots, key=lambda it: it.reader.df[it.ti])
    results: list[tuple[float, int]] = []
    d = 0
    while True:
        lead = iters[0]
        lead.next_geq(d)
        if lead.exhausted:
            break
        d = lead.doc()
        ok = True
        for it in iters[1:]:
            it.next_geq(d)
            if it.exhausted:
                return _finalize(results, k)
            if it.doc() != d:
                d = it.doc()
                ok = False
                break
        if ok:
            results.append((_score_doc(slots, d), d))
            d += 1
    return _finalize(results, k)
