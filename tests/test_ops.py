"""Ops-layer tests: aggs vs duckdb, dedup/similarity/text invariants."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd
from raydex.ops import aggs, dedup, similarity, text
from raydex.ops.multimodal import extract_media_features, make_media_table
from raydex.ops.sketches import HllPlusPlus, cardinality_hll


@pytest.fixture(scope="module")
def docs_ds(ray_session, sf_dir):
    return rd.read_parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in ["documents", "events", "embeddings", "orders"]:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return c


def test_terms_agg(docs_ds, con):
    got = aggs.terms_agg(docs_ds, "lang", size=3).to_pandas()
    want = con.execute(
        "SELECT lang, COUNT(*) AS doc_count FROM documents GROUP BY lang "
        "ORDER BY doc_count DESC, lang LIMIT 3"
    ).df()
    assert got["lang"].tolist() == want["lang"].tolist()
    assert got["doc_count"].tolist() == want["doc_count"].tolist()


def test_terms_agg_null_keys_and_ties(ray_session):
    """Map-side-combine parity on a synthetic column with nulls and
    tied counts: value_counts partials must reduce to the same exact
    counts + (count desc, key asc) tie order as a plain GROUP BY."""
    import ray.data as rd

    vals = (["a"] * 5 + ["b"] * 5 + ["c"] * 2 + [None] * 3) * 4
    ds = rd.from_arrow(pa.table({"k": pa.array(vals, pa.string())}))
    got = aggs.terms_agg(ds, "k", size=10).to_pandas()
    rows = list(zip(got["k"].tolist(), got["doc_count"].tolist()))
    assert rows[:2] == [("a", 20), ("b", 20)]   # tie broken by key asc
    norm = [(None if k is None or k != k else k, c) for k, c in rows]
    assert (None, 12) in norm
    assert ("c", 8) in norm


def test_stats_agg(docs_ds, con):
    got = aggs.stats_agg(docs_ds, "n_chars").to_pylist()[0]
    want = con.execute(
        "SELECT COUNT(n_chars) cnt, MIN(n_chars) min_v, MAX(n_chars) max_v, "
        "SUM(n_chars) sum_v, AVG(n_chars) avg_v FROM documents"
    ).df().iloc[0]
    assert got["cnt"] == want["cnt"] and got["sum_v"] == want["sum_v"]
    assert got["avg_v"] == pytest.approx(want["avg_v"], rel=1e-12)


def test_range_histogram_date(docs_ds, con, ray_session, sf_dir):
    got = aggs.range_agg(docs_ds, "n_chars", [100, 200, 400]).to_pandas()
    want = con.execute(
        "SELECT CASE WHEN n_chars < 100 THEN '*-100' "
        "WHEN n_chars < 200 THEN '100-200' WHEN n_chars < 400 THEN '200-400' "
        "ELSE '400-*' END AS bucket, COUNT(*) AS doc_count FROM documents "
        "GROUP BY bucket ORDER BY bucket"
    ).df()
    m = dict(zip(got["bucket"], got["doc_count"]))
    for b, c in zip(want["bucket"], want["doc_count"]):
        assert m.get(b, 0) == c

    ev = rd.read_parquet(f"{sf_dir}/events.parquet")
    got = aggs.date_histogram_agg(ev, "ts", unit="day").to_pandas()
    want = con.execute(
        "SELECT date_trunc('day', ts) AS bucket_ts, COUNT(*) AS doc_count "
        "FROM events GROUP BY 1 ORDER BY 1"
    ).df()
    assert got["doc_count"].tolist() == want["doc_count"].tolist()


def test_collapse_and_composite(ray_session, sf_dir, con):
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet")
    got = (
        aggs.collapse_best(orders, "o_custkey", "o_totalprice", "o_orderkey")
        .to_pandas()
        .sort_values("o_custkey")
        .reset_index(drop=True)
    )
    want = con.execute(
        "SELECT * FROM orders QUALIFY ROW_NUMBER() OVER "
        "(PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) = 1 "
        "ORDER BY o_custkey"
    ).df()
    assert got["o_orderkey"].tolist() == want["o_orderkey"].tolist()

    got = aggs.composite_agg(orders, ["o_orderstatus", "o_orderpriority"]).to_pandas()
    want = con.execute(
        "SELECT o_orderstatus, o_orderpriority, COUNT(*) AS doc_count "
        "FROM orders GROUP BY 1,2 ORDER BY 1,2"
    ).df()
    assert got["doc_count"].tolist() == want["doc_count"].tolist()


def test_cardinality_exact_and_hll(docs_ds, con):
    got = aggs.cardinality_exact(docs_ds, "source").to_pylist()[0]["cardinality"]
    want = con.execute("SELECT COUNT(DISTINCT source) FROM documents").fetchone()[0]
    assert got == want
    # HLL++ accuracy + merge law
    approx = cardinality_hll(docs_ds, "doc_id").to_pylist()[0]["cardinality"]
    exact = con.execute("SELECT COUNT(DISTINCT doc_id) FROM documents").fetchone()[0]
    assert abs(approx - exact) / exact < 0.05


def test_hll_merge_law():
    rng = np.random.default_rng(3)
    vals = [f"v{i}" for i in rng.integers(0, 50000, size=20000)]
    single = HllPlusPlus()
    single.add(vals)
    parts = [HllPlusPlus() for _ in range(7)]
    for i, v in enumerate(vals):
        parts[i % 7].add([v])
    merged = parts[0]
    for p in parts[1:]:
        merged.merge(p)
    assert merged.cardinality() == single.cardinality()  # exact same registers
    exact = len(set(vals))
    assert abs(single.cardinality() - exact) / exact < 0.03


def test_exact_dedup(docs_ds, con):
    got = dedup.exact_dedup(docs_ds, "text", "doc_id").to_pandas()
    want = con.execute(
        "SELECT * FROM documents QUALIFY ROW_NUMBER() OVER "
        "(PARTITION BY text ORDER BY doc_id) = 1"
    ).df()
    assert sorted(got["doc_id"]) == sorted(want["doc_id"])


def test_exact_dedup_default_never_materializes_on_driver(
        docs_ds, con, monkeypatch):
    """The DEFAULT keep mode must be the scale-safe semi-join path: on
    a mostly-unique 100 TB corpus the winner-id set is corpus-sized, so
    `take_all()` on it (the keep='rows' broadcast path) is forbidden
    unless explicitly opted into."""
    import ray.data

    def boom(self, *a, **k):
        raise AssertionError(
            "exact_dedup default path called Dataset.take_all()")

    monkeypatch.setattr(ray.data.Dataset, "take_all", boom)
    got = dedup.exact_dedup(docs_ds, "text", "doc_id").to_pandas()
    want = con.execute(
        "SELECT COUNT(DISTINCT text) FROM documents").fetchone()[0]
    assert len(got) == want


def test_minhash_and_jaccard(ray_session):
    rows = [
        {"doc_id": 0, "text": "the quick brown fox jumps over the lazy dog today"},
        {"doc_id": 1, "text": "the quick brown fox jumps over the lazy dog tonight"},
        {"doc_id": 2, "text": "completely different content about ray data pipelines"},
        {"doc_id": 3, "text": "completely different content about ray data pipelines"},
    ]
    ds = rd.from_items(rows)
    texts = {r["doc_id"]: r["text"] for r in rows}
    pairs = dedup.minhash_lsh_pairs(
        ds, "text", "doc_id", jaccard_threshold=0.5, texts_lookup=texts
    ).take_all()
    got = {(p["id_a"], p["id_b"]) for p in pairs}
    assert (2, 3) in got  # identical docs always pair
    assert (0, 1) in got  # near-identical pair found
    assert (0, 2) not in got and (1, 3) not in got
    assert dedup.ngram_jaccard(rows[2]["text"], rows[3]["text"]) == 1.0
    # 100 TB verify path: texts fetched by co-partitioned join instead of
    # the whole-corpus broadcast — pairs must be IDENTICAL
    pairs2 = dedup.minhash_lsh_pairs(
        ds, "text", "doc_id", jaccard_threshold=0.5,
        texts_ds=rd.from_items(rows),
    ).take_all()
    assert {(p["id_a"], p["id_b"]) for p in pairs2} == got


def test_simhash(ray_session):
    base = ("alpha beta gamma delta epsilon zeta eta theta " * 8).strip()
    rows = [
        {"doc_id": 0, "text": base},
        {"doc_id": 1, "text": base + " iota"},  # tiny perturbation
        {"doc_id": 2, "text": "unrelated words entirely disjoint vocabulary set"},
        {"doc_id": 3, "text": base},  # identical -> distance 0
    ]
    h0 = dedup.simhash64(rows[0]["text"])
    assert h0 == dedup.simhash64(rows[0]["text"])  # deterministic
    d01 = bin(h0 ^ dedup.simhash64(rows[1]["text"])).count("1")
    pairs = dedup.simhash_near_dup_pairs(
        rd.from_items(rows), "text", "doc_id", max_hamming=max(3, d01)
    ).take_all()
    got = {(p["id_a"], p["id_b"]) for p in pairs}
    assert (0, 3) in got  # identical docs always found (distance 0)
    assert (0, 1) in got  # near-identical found within its radius
    assert (0, 2) not in got


def test_embedding_near_dup_and_knn(ray_session, sf_dir, con):
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    first = pq.read_table(f"{sf_dir}/embeddings.parquet")
    q = np.asarray(first["embedding"].to_pylist()[:3], dtype=np.float64)
    got = similarity.knn_brute_force(emb, q, "embedding", "vec_id", k=5).to_pandas()
    # oracle: duckdb cosine on the same vectors, ids-only comparison
    for qi in range(3):
        vec = "[" + ",".join(str(x) for x in q[qi]) + "]"
        want = con.execute(
            f"SELECT vec_id FROM embeddings "
            f"ORDER BY list_cosine_similarity(embedding, {vec}::FLOAT[]) DESC, vec_id "
            f"LIMIT 5"
        ).df()["vec_id"].tolist()
        mine = got[got["query_id"] == qi].sort_values("rank")["doc_id"].tolist()
        assert mine == want, qi
    # self-match: query 0 is row 0's vector
    assert got[(got["query_id"] == 0) & (got["rank"] == 0)]["cosine"].iloc[0] == pytest.approx(1.0)

    # IVF recall vs brute force on the same queries (coarse buckets on
    # near-random vectors: expect the exact self-match plus overlap >=1)
    cents = similarity.train_centroids(emb, "embedding", num_centroids=16)
    ivf = similarity.knn_ivf(
        emb, q, "embedding", "vec_id", k=5, centroids=cents, nprobe=4
    ).to_pandas()
    for qi in range(3):
        b = set(got[got["query_id"] == qi]["doc_id"])
        a = set(ivf[ivf["query_id"] == qi]["doc_id"])
        assert qi in a or len(a & b) >= 1
        assert len(a & b) >= 1


def test_embedding_near_dup_block_verify(ray_session, sf_dir):
    """The keyed-block verify must emit exactly the same-bucket pairs a
    direct local recomputation finds (pairs AND cosines) — proves the
    map_groups -> keyed-block rewrite changed nothing."""
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    got = dedup.embedding_near_dup_pairs(
        emb, "embedding", "vec_id", threshold=0.3, num_planes=4, seed=7
    ).to_pandas()
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = np.asarray(tbl["vec_id"].to_pylist(), dtype=np.int64)
    v = np.asarray(tbl["embedding"].to_pylist(), dtype=np.float64)
    rng = np.random.default_rng(7)
    planes = rng.standard_normal((v.shape[1], 4))
    key = (((v @ planes) >= 0).astype(np.uint32)
           << np.arange(4, dtype=np.uint32)).sum(axis=1)
    norm = np.linalg.norm(v, axis=1, keepdims=True)
    norm[norm == 0] = 1.0
    u = v / norm
    want = {}
    order = np.argsort(ids, kind="stable")
    for b in np.unique(key):
        sel = order[key[order] == b]
        for i in range(sel.size):
            for j in range(i + 1, sel.size):
                c = float(u[sel[i]] @ u[sel[j]])
                if c >= 0.3:
                    a, bb = sorted((int(ids[sel[i]]), int(ids[sel[j]])))
                    want[(a, bb)] = c
    got_pairs = {
        (int(r.id_a), int(r.id_b)): float(r.cosine) for r in got.itertuples()
    }
    assert set(got_pairs) == set(want)
    for k, c in want.items():
        assert got_pairs[k] == pytest.approx(c, abs=1e-12)


def test_text_ops(docs_ds, con):
    tc = text.token_counts(docs_ds, "text", "doc_id").to_pandas()
    want = con.execute(
        "SELECT doc_id, len(string_split(text, ' ')) AS ws_tokens FROM documents ORDER BY doc_id"
    ).df()
    got = tc.sort_values("doc_id")
    assert got["ws_tokens"].tolist() == want["ws_tokens"].tolist()

    tt = text.top_terms(docs_ds, "text", size=5).to_pandas()
    want = con.execute(
        "SELECT tok AS token, COUNT(*) AS cnt FROM (SELECT unnest(string_split(text,' ')) AS tok "
        "FROM documents) GROUP BY tok ORDER BY cnt DESC, token LIMIT 5"
    ).df()
    assert tt["token"].tolist() == want["token"].tolist()
    assert tt["cnt"].tolist() == want["cnt"].tolist()

    assert text.detect_lang("the cat is on the mat and it is happy") == "en"
    assert text.detect_lang("der hund ist nicht mit der katze") == "de"
    assert text.detect_lang("日本語のテキストです") in ("ja", "zh")

    qf = text.quality_features(docs_ds, "text", "doc_id").to_pandas()
    assert (qf["char_len"] > 0).all()
    fp = text.doc_fingerprint(docs_ds.limit(20), "text", "doc_id").to_pandas()
    assert fp["fingerprint"].map(len).max() <= 4
    # vectorized lang_id == scalar detect_lang row by row (tie rule incl.)
    li = text.lang_id(docs_ds, "text").to_pandas().sort_values("doc_id")
    docs = con.execute("SELECT doc_id, text FROM documents ORDER BY doc_id").df()
    assert li["lang_pred"].tolist() == [
        text.detect_lang(str(s)) for s in docs["text"]
    ]
    # O(1) rolling fingerprints == direct per-window hash_tokens
    for s in list(docs["text"][:10]) + ["one two", ""]:
        toks = str(s).split()
        padded = toks + [""] * max(0, 8 - len(toks))
        want = [
            text.hash_tokens(padded[i : i + 8], 257, (1 << 61) - 1)
            for i in range(len(padded) - 7)
        ]
        assert text.rolling_fingerprints(str(s), 8) == want
    # vectorized doc_fingerprint == scalar winnow, per doc (corpus +
    # edge lengths: empty, shorter-than-window, exactly-window)
    import pyarrow as pa

    edge = ["", "a", "a b c", "a b c d e f g h", "x " * 40]
    texts = list(docs["text"][:50]) + edge
    et = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array([str(s) for s in texts]),
    })
    got = (
        text.doc_fingerprint(rd.from_arrow(et), "text", "doc_id")
        .to_pandas().sort_values("doc_id")["fingerprint"]
    )
    for g, s in zip(got, texts):
        assert list(g) == sorted(text.rolling_fingerprints(str(s), 8))[:4]


def test_multimodal_stub(ray_session):
    t = make_media_table(32)
    ds = rd.from_arrow(t)
    out = extract_media_features(ds, dim=16, concurrency=2, batch_size=8).to_pandas()
    assert len(out) == 32
    assert len(out["features"].iloc[0]) == 16
    # deterministic: same payload -> same features
    out2 = extract_media_features(rd.from_arrow(t), dim=16, concurrency=2, batch_size=8).to_pandas()
    a = np.asarray(out.sort_values("media_id")["features"].tolist())
    b = np.asarray(out2.sort_values("media_id")["features"].tolist())
    np.testing.assert_array_equal(a, b)


def test_minhash_batch_equals_scalar():
    """The vectorized signature path is value-identical to the scalar
    reference implementation, row by row (the refactor-identity gate)."""
    texts = [
        "the quick brown fox jumps over the lazy dog today",
        "",
        "one two",
        "completely different content about ray data pipelines " * 3,
    ]
    a, b = dedup._minhash_coefficients(64)
    batch = dedup.minhash_signatures_batch(texts, 64, 3, a, b)
    for i, t in enumerate(texts):
        np.testing.assert_array_equal(batch[i], dedup.minhash_signature(t, 64, 3))


def test_simhash_batch_equals_scalar_defn():
    """Batch simhash matches the per-doc definition (murmur3 token bits,
    ±1 sums, sign pack) including empty docs."""
    texts = ["alpha beta gamma", "", "alpha beta gamma delta " * 10, "x"]
    got = dedup.simhash64_batch(texts)
    for i, t in enumerate(texts):
        toks = t.split()
        if not toks:
            assert got[i] == 0
            continue
        from raydex.partition import murmur3_hash_many
        h1 = murmur3_hash_many(toks).astype(np.uint64) & np.uint64(0xFFFFFFFF)
        h2 = murmur3_hash_many([x + "\x01" for x in toks]).astype(np.uint64) & np.uint64(0xFFFFFFFF)
        h = (h1 << np.uint64(32)) | h2
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
        v = (2 * bits - 1).sum(axis=0)
        want = int(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())
        assert int(got[i]) == want


def test_bucket_pair_star_guard():
    """Oversized buckets emit O(n) star pairs preserving connectivity."""
    ids = np.arange(100, dtype=np.int64)
    full = dedup._bucket_pairs_df(ids, max_bucket_size=200)
    assert len(full) == 100 * 99 // 2
    star = dedup._bucket_pairs_df(ids, max_bucket_size=50)
    assert len(star) == 99
    assert (star["id_a"] == 0).all()


def test_ivf_index_prunes_io_and_matches_inflight(ray_session, sf_dir, tmp_path):
    import os
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    first = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    q = np.asarray(first["embedding"].to_pylist()[:2], dtype=np.float64)
    cents = similarity.train_centroids(emb, "embedding", num_centroids=16)
    idx = str(tmp_path / "ivf")
    similarity.build_ivf_index(emb, "embedding", "vec_id", idx, centroids=cents)
    info = {}
    got = similarity.knn_ivf_index(
        idx, q, "embedding", "vec_id", k=5, nprobe=4, _probe_info=info
    ).to_pandas()
    want = similarity.knn_ivf(
        emb, q, "embedding", "vec_id", k=5, centroids=cents, nprobe=4
    ).to_pandas()
    assert got.values.tolist() == want.values.tolist()
    # I/O pruning: only the probed bucket partitions are read
    assert len(info["buckets"]) <= 2 * 4  # <= nq * nprobe buckets
    assert len(info["buckets"]) < info["num_buckets_total"]
    probed = sum(os.path.getsize(p) for p in info["paths"])
    total = sum(
        os.path.getsize(os.path.join(r, f))
        for d in os.listdir(idx) if d.startswith("bucket=")
        for r, _, fs in os.walk(os.path.join(idx, d)) for f in fs
    )
    assert probed < total  # unprobed bytes never leave storage


def test_mad_and_variable_width_and_auto_date(docs_ds, con, ray_session, sf_dir):
    from raydex.ops.more_aggs import (
        auto_date_histogram,
        median_absolute_deviation,
        variable_width_histogram,
    )

    got = median_absolute_deviation(docs_ds, "n_chars").to_pylist()[0]["mad"]
    want = con.execute("SELECT mad(n_chars) FROM documents").fetchone()[0]
    assert got == pytest.approx(float(want))

    vw = variable_width_histogram(docs_ds, "n_chars", buckets=6).to_pandas()
    assert len(vw) == 6
    total = con.execute("SELECT COUNT(n_chars) FROM documents").fetchone()[0]
    assert vw["doc_count"].sum() == total
    assert (vw["min"] <= vw["key"]).all() and (vw["key"] <= vw["max"]).all()
    assert vw["min"].is_monotonic_increasing

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
    adh = auto_date_histogram(ev, "ts", target_buckets=10).to_pandas()
    assert 1 <= len(adh) <= 10
    n_events = con.execute("SELECT COUNT(*) FROM events").fetchone()[0]
    assert adh["doc_count"].sum() == n_events


def test_nested_query_semantics(ray_session):
    """The nested property: conditions must hold on the SAME sub-doc."""
    import pyarrow.compute as pc

    from raydex.ops.nested import nest, nested_count, nested_filter

    # parent 1: one child satisfies both; parent 2: conditions split
    # across children (flattened mapping would wrongly match parent 2)
    rows = [
        {"pk": 1, "a": 10, "b": 1},
        {"pk": 1, "a": 0, "b": 0},
        {"pk": 2, "a": 10, "b": 0},
        {"pk": 2, "a": 0, "b": 1},
        {"pk": 3, "a": 0, "b": 0},
    ]
    nested = nest(rd.from_items(rows), "pk", ["a", "b"])

    def pred(flat):
        return pc.and_(
            pc.greater(flat.field("a"), 5), pc.greater(flat.field("b"), 0)
        ).to_numpy(zero_copy_only=False)

    kept = nested_filter(nested, "children", pred).to_pandas()
    assert kept["pk"].tolist() == [1]
    assert nested_count(nested, "children", pred) == 1
    # min_matches honors the count of matching sub-docs
    def any_a(flat):
        return pc.greater(flat.field("a"), -1).to_numpy(zero_copy_only=False)
    assert nested_count(nested, "children", any_a, min_matches=2) == 2  # pk 1,2


def test_nested_agg_and_reverse_nested(ray_session):
    """nested agg = sub-doc context counts; reverse_nested = distinct
    PARENTS per sub-doc bucket (a parent with two 'x' children counts
    once in reverse, twice in nested)."""
    from raydex.ops.nested import (
        nest,
        nested_terms_agg,
        reverse_nested_counts,
    )

    rows = [
        {"pk": 1, "tag": "x"},
        {"pk": 1, "tag": "x"},
        {"pk": 1, "tag": "y"},
        {"pk": 2, "tag": "x"},
        {"pk": 3, "tag": "y"},
    ]
    nested = nest(rd.from_items(rows), "pk", ["tag"]).materialize()
    terms = nested_terms_agg(nested, "children", "tag",
                             count_name="n").to_pandas()
    assert dict(zip(terms["tag"], terms["n"])) == {"x": 3, "y": 2}
    rev = reverse_nested_counts(nested, "children", "tag", "pk",
                                count_name="n").to_pandas()
    assert dict(zip(rev["tag"], rev["n"])) == {"x": 2, "y": 2}


def test_nested_gate_vs_duckdb(ray_session, sf_dir, con_li):
    import __ray_entry__ as e

    got = e.q_nested_lineitems_count(sf_dir).to_pydict()["n_orders"][0]
    want = con_li.execute(
        "SELECT COUNT(DISTINCT l_orderkey) FROM lineitem "
        "WHERE l_quantity > 45.0 AND l_discount < 0.05"
    ).fetchone()[0]
    assert got == want


@pytest.fixture(scope="module")
def con_li(sf_dir):
    c = duckdb.connect()
    c.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{sf_dir}/lineitem.parquet'")
    return c


def test_semi_join_and_partitioned_dedup(docs_ds, con, ray_session, sf_dir):
    from raydex.ops.joins import semi_join

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
    en = docs.filter(lambda r: r["lang"] == "en")
    kept = semi_join(docs, en, "doc_id", "doc_id").to_pandas()
    want = con.execute("SELECT doc_id FROM documents WHERE lang='en'").df()
    assert sorted(kept["doc_id"]) == sorted(want["doc_id"])
    assert set(kept.columns) == {"doc_id", "lang"}
    anti = semi_join(docs, en, "doc_id", "doc_id", anti=True).to_pandas()
    assert sorted(anti["doc_id"]) == sorted(
        con.execute("SELECT doc_id FROM documents WHERE lang<>'en'").df()["doc_id"]
    )
    # partitioned rows dedup == broadcast rows dedup
    a = dedup.exact_dedup(docs_ds, "text", "doc_id", keep="rows").to_pandas()
    b = dedup.exact_dedup(docs_ds, "text", "doc_id", keep="rows_partitioned").to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])


def test_decontaminate(ray_session, sf_dir):
    import ray.data as rd

    from raydex.ops.text import benchmark_ngram_set, decontaminate

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    df = ds.to_pandas()
    bench_texts = df[df.doc_id % 100 == 0]["text"].tolist()
    grams = benchmark_ngram_set(bench_texts, n=8)
    out = decontaminate(ds, "text", "doc_id", grams, n=8, threshold=0.5).to_pandas()
    assert len(out) == len(df)
    # every benchmark doc is fully contaminated with itself
    bench_rows = out[out.doc_id % 100 == 0]
    assert (bench_rows["contamination"] == 1.0).all()
    assert bool(bench_rows["contaminated"].all())
    # overlap counts are bounded by totals, ratio in [0, 1]
    assert (out["ngram_hits"] <= out["ngram_total"]).all()
    assert out["contamination"].between(0.0, 1.0).all()


def test_pii_redact(ray_session):
    import pandas as pd
    import ray.data as rd

    from raydex.ops.text import pii_redact

    rows = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "mail a.b+c@ex.co and 10.1.2.3 then 123-45-6789 or +1-202-555-0100",
                "no pii here at all",
                "two mails x@y.io z@w.ai one ip 255.255.255.255",
            ],
        }
    )
    out = (
        pii_redact(rd.from_pandas(rows), "text", "doc_id")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.loc[0, "redacted"] == "mail <EMAIL> and <IP> then <SSN> or <PHONE>"
    assert list(out.loc[0, ["n_emails", "n_ipv4", "n_ssn", "n_phones"]]) == [1, 1, 1, 1]
    assert out.loc[1, "redacted"] == "no pii here at all"
    assert out.loc[1, ["n_emails", "n_ipv4", "n_ssn", "n_phones"]].sum() == 0
    assert list(out.loc[2, ["n_emails", "n_ipv4"]]) == [2, 1]
    assert "<EMAIL>" in out.loc[2, "redacted"] and "<IP>" in out.loc[2, "redacted"]


def test_stratified_sample(ray_session, sf_dir):
    import ray.data as rd

    from raydex.ops.text import stratified_sample

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])
    full = ds.to_pandas()
    out = stratified_sample(
        ds, "source", "doc_id", {"src0": 0.0, "src1": 1.0}, default_rate=0.5
    ).to_pandas()
    assert (out["source"] != "src0").all()  # rate 0 drops all
    n1 = (full["source"] == "src1").sum()
    assert (out["source"] == "src1").sum() == n1  # rate 1 keeps all
    # default 0.5 keeps a strict, deterministic subset
    rest = out[~out["source"].isin(["src0", "src1"])]
    rest_full = full[~full["source"].isin(["src0", "src1"])]
    assert 0 < len(rest) < len(rest_full)
    # deterministic: second run identical
    out2 = stratified_sample(
        ds, "source", "doc_id", {"src0": 0.0, "src1": 1.0}, default_rate=0.5
    ).to_pandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])
    # salt changes the sample but not the per-stratum guarantee
    out3 = stratified_sample(
        ds, "source", "doc_id", {"src0": 0.0, "src1": 1.0},
        default_rate=0.5, salt=99,
    ).to_pandas()
    assert sorted(out3["doc_id"]) != sorted(out["doc_id"])
    assert (out3["source"] != "src0").all()


def test_repetition_stats(ray_session):
    import pandas as pd
    import ray.data as rd

    from raydex.ops.text import repetition_stats

    rows = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "a b a b a b",        # bigrams: ab ba ab ba ab -> 5 total 2 distinct
                "w x y z",             # all distinct
                "solo",                # < n tokens -> single unigram fallback
            ],
        }
    )
    out = (
        repetition_stats(rd.from_pandas(rows), "text", "doc_id", n=2)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert list(out["ngram_total"]) == [5, 3, 1]
    assert list(out["ngram_distinct"]) == [2, 3, 1]
    assert abs(out.loc[0, "dup_frac"] - 0.6) < 1e-12
    assert out.loc[1, "dup_frac"] == 0.0


def test_query_and_agg_registries(ray_session, sf_dir):
    import ray.data as rd

    from raydex.ops.aggs import register_agg, run_agg
    from raydex.search.query import Term, parse_query, register_query

    # SearchPlugin#getQueries analogue: a plugin kind composing builtins
    register_query("only_u01", lambda body: Term(fld="url", value="u01"))
    q = parse_query({"only_u01": {}})
    assert isinstance(q, Term) and q.value == "u01"

    # SearchPlugin#getAggregations analogue + spec-driven dispatch
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"])
    out = run_agg("terms", ds, key="lang", size=3).to_pandas()
    assert len(out) == 3 and (out["doc_count"] > 0).all()

    register_agg("n_rows", lambda d: d.count())
    assert run_agg("n_rows", ds) == ds.count()

    import pytest as _pytest

    with _pytest.raises(ValueError):
        run_agg("nope", ds)
    with _pytest.raises(ValueError):
        parse_query({"never_registered_kind": {}})


def test_date_math_and_range_filter(ray_session, sf_dir):
    import pandas as pd
    import ray.data as rd

    from raydex.ops.datemath import date_range_filter, parse_date_math

    now = pd.Timestamp("2026-08-17T13:45:30.123")
    assert parse_date_math("now-7d/d", now) == pd.Timestamp("2026-08-10")
    assert parse_date_math("now/w", now) == pd.Timestamp("2026-08-17")  # ISO Monday
    assert parse_date_math("now/M", now, roundup=True) == pd.Timestamp(
        "2026-08-31 23:59:59.999"
    )
    assert parse_date_math("2026-01-31||+1M/d", now) == pd.Timestamp("2026-02-28")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        parse_date_math("now^d", now)
    with _pytest.raises(ValueError):
        parse_date_math("now-7d")  # now anchor requires explicit now=

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "ts"])
    full = ds.to_pandas()
    anchor = full["ts"].max()
    out = date_range_filter(ds, "ts", gte="now-3d/d", now=anchor).to_pandas()
    lo = parse_date_math("now-3d/d", anchor)
    expect = full[full["ts"] >= lo]
    assert sorted(out["event_id"]) == sorted(expect["event_id"])
    assert 0 < len(out) < len(full)


def test_date_range_and_ip_range_aggs(ray_session):
    import numpy as np

    ts = np.array(["2020-01-05", "2020-02-10", "2020-03-15", "2020-03-20"],
                  dtype="datetime64[us]")
    ds = rd.from_arrow(pa.table({"ts": pa.array(ts)}))
    out = aggs.date_range_agg(
        ds, "ts",
        [("jan", None, "2020-02-01"),
         ("feb_mar", "2020-02-01", "2020-04-01"),
         ("q1", "2020-01-01", "2020-04-01")],  # overlapping bucket
    ).to_pandas().set_index("bucket")["doc_count"]
    assert out["jan"] == 1 and out["feb_mar"] == 3 and out["q1"] == 4

    ips = ["10.0.0.1", "10.127.255.255", "10.128.0.0", "192.168.1.9"]
    ds = rd.from_arrow(pa.table({"ip": pa.array(ips)}))
    out = aggs.ip_range_agg(
        ds, "ip",
        [("ten_lower", "10.0.0.0/9"),       # CIDR [10.0.0.0, 10.128.0.0)
         ("ten_upper", "10.128.0.0", "11.0.0.0"),
         ("all_above", "10.0.0.0", None)],
    ).to_pandas().set_index("bucket")["doc_count"]
    assert out["ten_lower"] == 2 and out["ten_upper"] == 1
    assert out["all_above"] == 4
    # /32 mask = exact host
    host = aggs.ip_range_agg(
        ds, "ip", [("one", "10.128.0.0/32")]
    ).to_pandas()
    assert host["doc_count"].iloc[0] == 1


def test_duplicated_window_stats(ray_session):
    """Substring-level dedup (duplicated k-token windows) vs a brute
    in-memory oracle."""
    docs = [
        (0, "a b c d e f"),
        (1, "x y z a b c d"),
        (2, "q r s t"),
        (3, "a b"),           # shorter than k -> absent from output
        (4, "m m m m m"),     # self-repetition only: NOT cross-doc dup
    ]
    ds = rd.from_arrow(pa.table({"doc_id": [d for d, _ in docs],
                                 "text": [t for _, t in docs]}))
    out = dedup.duplicated_window_stats(ds, "text", "doc_id", k=3) \
        .to_pandas().set_index("doc_id")
    # doc0 windows: abc bcd cde def; abc+bcd shared with doc1
    assert out.loc[0, "n_windows"] == 4 and out.loc[0, "dup_windows"] == 2
    assert out.loc[1, "n_windows"] == 5 and out.loc[1, "dup_windows"] == 2
    assert out.loc[2, "dup_windows"] == 0
    assert 3 not in out.index
    # "m m m" repeats within one doc but appears in no other doc
    assert out.loc[4, "n_windows"] == 3 and out.loc[4, "dup_windows"] == 0
    assert out.loc[0, "dup_fraction"] == pytest.approx(0.5)


def test_duplicated_window_stats_tiny_block(ray_session):
    """ADVICE r2 (low): a block whose total token count < k must emit
    the same 3-column schema as normal blocks (no KeyError on cnt)."""
    docs = [(0, "a b"), (1, "a b c d e"), (2, "c d e f g")]
    # one row per block forces a sub-k block through _window_pairs
    ds = rd.from_arrow(pa.table({"doc_id": [d for d, _ in docs],
                                 "text": [t for _, t in docs]})) \
        .repartition(3)
    out = dedup.duplicated_window_stats(ds, "text", "doc_id", k=3) \
        .to_pandas().set_index("doc_id")
    assert 0 not in out.index
    assert out.loc[1, "dup_windows"] == 1  # "c d e" shared
    assert out.loc[2, "dup_windows"] == 1


def test_significant_text_multi_terms_top_metrics_boxplot(docs_ds, con, ray_session, sf_dir):
    import pyarrow.compute as pc

    from raydex.ops.more_aggs import (
        boxplot_agg,
        multi_terms,
        significant_text,
        top_metrics,
    )

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang", "source", "n_chars"])

    # significant_text: tokens over-represented in lang='de' docs — the
    # German marker words must rank above the shared vocabulary
    sig = significant_text(
        ds, "text",
        lambda t: pc.equal(t["lang"], "de").to_numpy(zero_copy_only=False),
        size=10,
    ).to_pandas()
    assert len(sig) > 0
    # every scored term must actually be fg-over-represented (JLH > 0)
    assert (sig["score"] > 0).all()
    # doc-frequency contract: doc_count <= number of de docs
    n_de = con.execute("SELECT COUNT(*) FROM documents WHERE lang='de'").fetchone()[0]
    assert (sig["doc_count"] <= n_de).all()
    # dedup guard keeps output shape
    sig2 = significant_text(
        ds, "text",
        lambda t: pc.equal(t["lang"], "de").to_numpy(zero_copy_only=False),
        size=10, filter_duplicate_text=True,
    ).to_pandas()
    assert (sig2["score"] > 0).all()

    # multi_terms == SQL GROUP BY two keys ORDER BY count DESC, keys ASC
    mt = multi_terms(ds, ["lang", "source"], size=8).to_pandas()
    want = con.execute(
        "SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS doc_count "
        "FROM documents GROUP BY 1, 2 "
        "ORDER BY doc_count DESC, lang, source LIMIT 8"
    ).df()
    assert mt[["lang", "source", "doc_count"]].values.tolist() == want.values.tolist()

    # top_metrics == SQL ORDER BY sort LIMIT n
    tm = top_metrics(ds, "n_chars", ["doc_id", "lang"], order="desc", size=3).to_pandas()
    want = con.execute(
        "SELECT n_chars, doc_id, lang FROM documents "
        "ORDER BY n_chars DESC LIMIT 3"
    ).df()
    assert tm["n_chars"].tolist() == want["n_chars"].tolist()

    # boxplot: exact min/max, t-digest quartiles within tolerance
    bp = boxplot_agg(ds, "n_chars").to_pylist()[0]
    mn, mx = con.execute("SELECT MIN(n_chars), MAX(n_chars) FROM documents").fetchone()
    assert bp["min"] == float(mn) and bp["max"] == float(mx)
    for q, col in ((0.25, "q1"), (0.5, "q2"), (0.75, "q3")):
        exact = con.execute(
            f"SELECT quantile_cont(n_chars, {q}) FROM documents"
        ).fetchone()[0]
        assert abs(bp[col] - float(exact)) / max(float(exact), 1) < 0.05
    assert bp["min"] <= bp["q1"] <= bp["q2"] <= bp["q3"] <= bp["max"]


def test_multimodal_resize_and_frame_sample(ray_session):
    """Resize rewrites payload + metadata per the aspect-fit contract;
    frame-sample explodes one row per kept frame with carried metadata
    (the one-to-many video layout) — both actor-pool stages with the
    stub codec."""
    import ray.data as rd

    from raydex.ops.multimodal import (
        FRAME_BYTES,
        make_media_table,
        resize_images,
        sample_frames,
    )

    t = make_media_table(12, seed=3, payload_bytes=FRAME_BYTES * 25)
    ds = rd.from_arrow(t)
    out = resize_images(ds, max_side=128, concurrency=2,
                        batch_size=4).to_arrow_refs()
    import ray as _ray

    resized = pa.concat_tables([_ray.get(r) for r in out])
    assert resized.num_rows == 12
    assert resized["width"].to_numpy().max() <= 128
    assert resized["height"].to_numpy().max() <= 128
    # aspect preserved (within integer truncation)
    w0, h0 = t["width"][0].as_py(), t["height"][0].as_py()
    w1, h1 = resized["width"][0].as_py(), resized["height"][0].as_py()
    assert abs(w0 * h1 - h0 * w1) <= max(w0, h0)

    frames = sample_frames(rd.from_arrow(t), every_n=5, concurrency=2,
                           batch_size=4).to_pandas()
    # 25 frames per payload, every 5th kept -> 5 rows per media
    assert len(frames) == 12 * 5
    assert set(frames.columns) == {"media_id", "frame_idx", "frame"}
    assert sorted(frames[frames["media_id"] == 0]["frame_idx"]) == [0, 5, 10, 15, 20]
    # each kept frame is the exact byte slice of the source payload
    p0 = t["payload"][0].as_py()
    f10 = frames[(frames["media_id"] == 0) & (frames["frame_idx"] == 10)]["frame"].iloc[0]
    assert bytes(f10) == p0[10 * FRAME_BYTES : 11 * FRAME_BYTES]


def test_collapse_inner_hits_vs_duckdb(ray_session, sf_dir, con):
    """collapse expand (inner_hits): top-3 orders per customer by
    (totalprice desc, orderkey asc) with ranks == SQL ROW_NUMBER."""
    from raydex.ops.aggs import collapse_top_rows

    got = (
        collapse_top_rows(
            rd.read_parquet(
                f"{sf_dir}/orders.parquet",
                columns=["o_custkey", "o_orderkey", "o_totalprice"],
            ),
            "o_custkey", "o_totalprice", "o_orderkey", k=3, rank_name="rnk",
        )
        .to_pandas()
        .sort_values(["o_custkey", "rnk"])
        .reset_index(drop=True)
    )
    want = con.execute(
        "SELECT o_custkey, o_orderkey, o_totalprice, "
        "CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey "
        "ORDER BY o_totalprice DESC, o_orderkey) - 1 AS BIGINT) AS rnk "
        "FROM orders QUALIFY rnk < 3 ORDER BY o_custkey, rnk"
    ).df()
    assert len(got) == len(want)
    import pandas as pd

    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)],
        check_dtype=False,
    )


def test_mad_vwh_sketch_fallback_high_cardinality(ray_session):
    """Round-5: above max_exact_distinct the distinct-value table must
    NOT land on the driver — mad switches to the reference's one-digest
    algorithm (cdf binary search), vwh to per-block quantile
    pre-clustering. Both stay within stated error bounds of ground
    truth on a continuous column where |distinct| == |rows|."""
    import ray.data as rd

    from raydex.ops.more_aggs import (median_absolute_deviation,
                                      variable_width_histogram)

    rng = np.random.default_rng(7)
    n = 200_000
    # bimodal continuous data: all values distinct
    vals = np.concatenate([rng.normal(0.0, 1.0, n // 2),
                           rng.normal(50.0, 2.0, n // 2)])
    rng.shuffle(vals)
    ds = rd.from_arrow(pa.table({"x": pa.array(vals, pa.float64())}))

    # ground truth MAD
    med = np.median(vals)
    true_mad = np.median(np.abs(vals - med))
    got = median_absolute_deviation(
        ds, "x", max_exact_distinct=1000).to_pylist()[0]["mad"]
    assert abs(got - true_mad) / true_mad < 0.05  # 5% error bound

    # exact path (below threshold) still bit-equal to the old behavior
    small = rd.from_arrow(pa.table({"x": pa.array(
        np.round(vals[:5000]).astype(np.float64))}))
    exact = median_absolute_deviation(small, "x").to_pylist()[0]["mad"]
    sv = np.round(vals[:5000])
    assert exact == np.median(np.abs(sv - np.median(sv)))

    # vwh fallback: bucket invariants + cluster recovery
    out = variable_width_histogram(
        ds, "x", buckets=2, max_exact_distinct=1000).to_pydict()
    assert len(out["key"]) == 2
    assert sum(out["doc_count"]) == n          # weight conservation
    assert out["min"] == sorted(out["min"])    # range-ordered buckets
    assert abs(out["key"][0] - 0.0) < 1.0      # recovers both modes
    assert abs(out["key"][1] - 50.0) < 1.0
    assert out["doc_count"][0] == out["doc_count"][1] == n // 2
