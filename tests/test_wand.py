"""Property tests: WAND / conjunction == brute force (SURVEY.md §5 oracle b)."""

import numpy as np
import pytest

from raydex.analysis.tokenizer import get_analyzer
from raydex.corpus import make_pages_table, make_queries_table
from raydex.index.segment import SegmentReader, build_segment
from raydex.search.bm25 import GlobalStats, brute_force_top_k
from raydex.search.wand import conjunction_top_k, wand_top_k, wand_top_k_daat


def _stats_for(reader, terms):
    df = {}
    for t in terms:
        ti = reader.lookup(t)
        df[t] = int(reader.df[ti]) if ti >= 0 else 0
    return GlobalStats(ndocs=reader.ndocs, sum_dl=reader.sum_dl, df=df)


@pytest.fixture(scope="module")
def rand_seg(tmp_path_factory):
    rng = np.random.default_rng(11)
    vocab = np.array(
        [f"w{i}" for i in range(60)] + ["head"] * 1, dtype=object
    )
    probs = np.array([1.0 / (i + 1) for i in range(vocab.size)])
    probs /= probs.sum()
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(1, 300), p=probs))
        for _ in range(800)
    ]
    urls = [f"u{i:05d}" for i in range(800)]
    d = str(tmp_path_factory.mktemp("wand") / "seg")
    build_segment(d, urls, texts, analyzer="standard")
    return SegmentReader(d)


def test_wand_equals_brute_random_queries(rand_seg):
    rng = np.random.default_rng(12)
    vocab = [f"w{i}" for i in range(60)] + ["head", "absent1"]
    for trial in range(60):
        nt = int(rng.integers(1, 5))
        terms = [vocab[i] for i in rng.integers(0, len(vocab), size=nt)]
        k = int(rng.choice([1, 3, 10, 100]))
        stats = _stats_for(rand_seg, terms)
        b_ids, b_sc = brute_force_top_k(rand_seg, terms, k, stats)
        w_ids, w_sc = wand_top_k(rand_seg, terms, k, stats)
        assert b_ids.tolist() == w_ids.tolist(), (terms, k)
        np.testing.assert_array_equal(b_sc, w_sc)
        # three-way differential: vectorized block-at-a-time == doc-at-a-time
        d_ids, d_sc = wand_top_k_daat(rand_seg, terms, k, stats)
        assert d_ids.tolist() == w_ids.tolist(), (terms, k)
        np.testing.assert_array_equal(d_sc, w_sc)


def test_conjunction_equals_brute_and(rand_seg):
    rng = np.random.default_rng(13)
    vocab = [f"w{i}" for i in range(25)]
    for trial in range(40):
        nt = int(rng.integers(1, 4))
        terms = [vocab[i] for i in rng.integers(0, len(vocab), size=nt)]
        k = int(rng.choice([1, 10, 50]))
        stats = _stats_for(rand_seg, terms)
        b_ids, b_sc = brute_force_top_k(rand_seg, terms, k, stats, operator="and")
        c_ids, c_sc = conjunction_top_k(rand_seg, terms, k, stats)
        assert b_ids.tolist() == c_ids.tolist(), (terms, k)
        np.testing.assert_array_equal(b_sc, c_sc)


def test_wand_on_generated_corpus(tmp_path):
    pages = make_pages_table(400, seed=42)
    # latest-wins dedup then url-sorted doc order (the build pipeline's rule)
    import pandas as pd

    df = pages.select(["url", "warc_ts", "text"]).to_pandas()
    df = df.sort_values("warc_ts").groupby("url", as_index=False).last()
    df = df.sort_values("url")
    d = str(tmp_path / "seg")
    build_segment(d, df["url"].tolist(), df["text"].tolist(), analyzer="standard_en")
    r = SegmentReader(d)
    an = get_analyzer("standard_en")
    q = make_queries_table(30)
    for qid, qtext, k in zip(
        q["qid"].to_pylist(), q["query_text"].to_pylist(), q["k"].to_pylist()
    ):
        terms = an(qtext)
        stats = _stats_for(r, terms)
        b_ids, b_sc = brute_force_top_k(r, terms, k, stats)
        w_ids, w_sc = wand_top_k(r, terms, k, stats)
        assert b_ids.tolist() == w_ids.tolist(), (qid, qtext)
        np.testing.assert_array_equal(b_sc, w_sc)
        if not terms:  # stopword-only → zero terms → empty
            assert b_ids.size == 0
