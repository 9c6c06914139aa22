"""Distributed query: segment-reader actor pool + scatter-gather merge.

The query path mirrors the reference's query-then-fetch (SURVEY.md §3.2):
the driver analyzes the query with the index's analyzer, collects EXACT
global stats for the query terms (df summed over segments, N/avgdl from
the index manifest — the dfs_query_then_fetch-consistent mode), scatters
``top_k`` to an actor pool where each actor pins a slice of segments
(state loaded once per actor, reference analogue
``ContextIndexSearcher``/``ReaderContext``, SURVEY.md §2.4), and merges
per-segment top-k lists with the ``TopDocs.merge`` tie-break:
score desc, then segment ordinal asc, then docid asc
(``server/.../action/search/SearchPhaseController.java:144,186-208``).

Latency path = plain Ray actor calls (not a Dataset op); batch-QPS path
pipelines many queries across the pool. A ``LocalSearcher`` runs the
same code without Ray for unit tests.
"""

from __future__ import annotations

import heapq

import numpy as np

from raydex.analysis.tokenizer import get_analyzer
from raydex.index.segment import SegmentReader
from raydex.search.bm25 import GlobalStats, brute_force_top_k
from raydex.search.wand import conjunction_top_k, wand_top_k


class SegmentGroup:
    """Plain-python holder of a slice of segments (used by actor + local)."""

    def __init__(self, seg_dirs: list[str], ordinals: list[int]):
        self.readers = [SegmentReader(d) for d in seg_dirs]
        self.ordinals = ordinals

    def term_stats(self, terms: list[str]) -> dict[str, int]:
        out = dict.fromkeys(terms, 0)
        for r in self.readers:
            for t in terms:
                ti = r.lookup(t)
                if ti >= 0:
                    out[t] += int(r.df[ti])
        return out

    def top_k(
        self,
        terms: list[str],
        k: int,
        ndocs: int,
        sum_dl: int,
        df: dict[str, int],
        method: str = "wand",
        operator: str = "or",
        minimum_should_match: int = 0,
    ) -> list[tuple[int, list[int], list[float], list[str]]]:
        stats = GlobalStats(ndocs=ndocs, sum_dl=sum_dl, df=df)
        out = []
        for r, o in zip(self.readers, self.ordinals):
            m = method
            if m == "auto":
                # dispatch per segment: the vectorized exhaustive scorer
                # beats the python-loop WAND below ~500k candidate
                # postings; above that, block-max pruning wins (and is
                # the only viable path at 10^12-doc scale)
                seg_df = sum(
                    int(r.df[ti]) for t in terms if (ti := r.lookup(t)) >= 0
                )
                m = "brute" if seg_df < 500_000 else "wand"
            if operator == "and" and m != "brute":
                ids, sc = conjunction_top_k(r, terms, k, stats)
            elif m == "wand" and operator == "or" and minimum_should_match <= 1:
                ids, sc = wand_top_k(r, terms, k, stats)
            else:
                ids, sc = brute_force_top_k(
                    r, terms, k, stats, operator=operator,
                    minimum_should_match=minimum_should_match,
                )
            urls = [r.url_of(d) for d in ids]
            out.append((o, ids.tolist(), sc.tolist(), urls))
        return out


def merge_top_k(per_segment, k: int):
    """``TopDocs.merge``-style k-way merge.

    ``per_segment``: iterable of (ordinal, docids, scores, urls), each
    list already sorted by (score desc, docid asc). Tie-break:
    score desc, ordinal asc, docid asc.
    """
    heap = []
    for o, ids, scores, urls in per_segment:
        if ids:
            heap.append((-scores[0], o, ids[0], 0, (ids, scores, urls)))
    heapq.heapify(heap)
    out = []
    while heap and len(out) < k:
        negs, o, d, i, payload = heapq.heappop(heap)
        ids, scores, urls = payload
        out.append({"ordinal": o, "docid": d, "score": scores[i], "url": urls[i]})
        if i + 1 < len(ids):
            heapq.heappush(
                heap, (-scores[i + 1], o, ids[i + 1], i + 1, payload)
            )
    return out


class SearcherBase:
    def __init__(self, index_dir: str):
        from raydex.index.build import load_index_manifest, segment_dirs

        self.manifest = load_index_manifest(index_dir)
        self.analyzer = get_analyzer(self.manifest["analyzer"])
        self.seg_dirs = segment_dirs(index_dir, self.manifest)
        self.ndocs = self.manifest["doc_count"]
        self.sum_dl = self.manifest["sum_dl"]

    def analyze(self, query_text: str) -> list[str]:
        return self.analyzer(query_text)


class LocalSearcher(SearcherBase):
    """Single-process searcher (tests / tiny indexes)."""

    def __init__(self, index_dir: str):
        super().__init__(index_dir)
        self.group = SegmentGroup(self.seg_dirs, list(range(len(self.seg_dirs))))

    def search(self, query_text: str, k: int = 10, method: str = "auto",
               operator: str = "or", minimum_should_match: int = 0):
        terms = self.analyze(query_text)
        if not terms:
            return []
        df = self.group.term_stats(terms)
        per_seg = self.group.top_k(
            terms, k, self.ndocs, self.sum_dl, df, method, operator,
            minimum_should_match,
        )
        return merge_top_k(per_seg, k)


class RaySearcher(SearcherBase):
    """Actor-pool scatter-gather searcher.

    ``num_actors`` actors each pin a contiguous slice of the global
    segment order; df collection and top-k are one round-trip each
    (df per query is k terms × actors — tiny).
    """

    def __init__(self, index_dir: str, num_actors: int = 8):
        super().__init__(index_dir)
        import ray

        n = max(1, min(num_actors, len(self.seg_dirs)))
        RemoteGroup = ray.remote(SegmentGroup)
        self.actors = []
        # round-robin segments over actors to balance partitions
        slices: list[list[int]] = [[] for _ in range(n)]
        for i in range(len(self.seg_dirs)):
            slices[i % n].append(i)
        for idx in slices:
            self.actors.append(
                RemoteGroup.options(num_cpus=1).remote(
                    [self.seg_dirs[i] for i in idx], idx
                )
            )
        self._ray = ray

    def _stats(self, terms: list[str]) -> dict[str, int]:
        partials = self._ray.get([a.term_stats.remote(terms) for a in self.actors])
        df = dict.fromkeys(terms, 0)
        for p in partials:
            for t, v in p.items():
                df[t] += v
        return df

    def search(self, query_text: str, k: int = 10, method: str = "auto",
               operator: str = "or", minimum_should_match: int = 0):
        terms = self.analyze(query_text)
        if not terms:
            return []
        df = self._stats(terms)
        refs = [
            a.top_k.remote(terms, k, self.ndocs, self.sum_dl, df, method,
                           operator, minimum_should_match)
            for a in self.actors
        ]
        per_seg = [seg for actor_out in self._ray.get(refs) for seg in actor_out]
        return merge_top_k(per_seg, k)

    def search_batch(self, queries: list[tuple[str, int]], method: str = "auto"):
        """Pipelined batch evaluation (the QPS path): all scatter calls in
        flight at once; df lookups batched per query."""
        analyzed = [self.analyze(q) for q, _ in queries]
        uniq_terms = sorted({t for ts in analyzed for t in ts})
        gdf = self._stats(uniq_terms) if uniq_terms else {}
        all_refs = []
        for terms, (_, k) in zip(analyzed, queries):
            if not terms:
                all_refs.append(None)
                continue
            df = {t: gdf.get(t, 0) for t in terms}
            all_refs.append(
                [a.top_k.remote(terms, k, self.ndocs, self.sum_dl, df, method)
                 for a in self.actors]
            )
        out = []
        for refs, (_, k) in zip(all_refs, queries):
            if refs is None:
                out.append([])
            else:
                per_seg = [s for actor_out in self._ray.get(refs) for s in actor_out]
                out.append(merge_top_k(per_seg, k))
        return out
