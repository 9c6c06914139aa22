"""Deduplication family — first-class training-data-pipeline operators.

All five flavors requested by the build brief, each Ray-Data-first:

- exact          content-hash -> hash-partitioned groupby -> keep first
                 (the reference's `_id` version-map analogue, SURVEY §2.8)
- minhash_lsh    shingle -> minhash -> band buckets -> groupby(band,sig)
                 candidate pairs -> Jaccard verify
- simhash        64-bit simhash fingerprint + hamming-radius buckets
- ngram_jaccard  exact n-gram Jaccard verification of candidate pairs
- embedding      cosine near-dup over an embedding column via coarse
                 LSH (random hyperplane) buckets -> in-bucket matmul

Hashing is murmur3-based (raydex.partition) — deterministic, seeded, no
wall clock. Shuffles: one groupby per stage, always on a hash key;
candidate verification happens inside the bucket group (no N^2).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from raydex.partition import murmur3_hash_many


def content_hash_column(texts) -> list[str]:
    return [hashlib.md5(str(t).encode()).hexdigest() for t in texts]


def exact_dedup(ds, text_col: str, id_col: str, keep: str = "rows"):
    """Keep the lowest-id row per distinct text (deterministic winner).

    map_batches(add md5) -> groupby(hash) native Min aggregate (map-side
    combine; NO per-group python). ``keep='ids'`` returns just the
    winning ids (one shuffle); ``keep='rows'`` additionally broadcasts
    the (sorted) winner-id array and filters the input — at 100 TB the
    winner set may not fit one node, in which case use keep='ids' and a
    partitioned join instead.
    """

    def add_hash(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_chash", pa.array(content_hash_column(t[text_col].to_pylist()))
        )

    from ray.data.aggregate import Min

    winners = (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("_chash")
        .aggregate(Min(id_col, alias_name="_win"))
    )
    if keep == "ids":
        return winners.map_batches(
            lambda t: pa.table({id_col: t["_win"]}), batch_format="pyarrow"
        )
    import ray

    win_ids = np.sort(
        np.asarray([r["_win"] for r in winners.take_all()], dtype=np.int64)
    )
    ref = ray.put(win_ids)

    def filt(t: pa.Table) -> pa.Table:
        w = ray.get(ref)
        ids = t[id_col].to_numpy()
        pos = np.searchsorted(w, ids)
        mask = (pos < w.size) & (w[np.minimum(pos, w.size - 1)] == ids)
        return t.filter(pa.array(mask))

    return ds.map_batches(filt, batch_format="pyarrow")


# ---------------------------------------------------------------- minhash


def _shingles(text: str, n: int = 3) -> list[str]:
    toks = text.split()
    if len(toks) < n:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def minhash_signature(text: str, num_hashes: int, n: int = 3) -> np.ndarray:
    """num_hashes 32-bit minhashes via seed-salted murmur3."""
    sh = _shingles(text, n)
    if not sh:
        return np.full(num_hashes, np.iinfo(np.uint32).max, dtype=np.uint32)
    base = murmur3_hash_many(sh).astype(np.uint64) & np.uint64(0xFFFFFFFF)
    # k-wise hashing: h_i(x) = (a_i * x + b_i) mod 2^61-1, truncated
    rng = np.random.default_rng(1234)
    a = rng.integers(1, 2**31, size=num_hashes, dtype=np.uint64)
    b = rng.integers(0, 2**31, size=num_hashes, dtype=np.uint64)
    M = np.uint64(2305843009213693951)  # 2^61-1
    vals = (base[None, :] * a[:, None] + b[:, None]) % M
    return vals.min(axis=1).astype(np.uint32)


class _MinhashBatch:
    """Actor-pool stage: hash params computed once per actor."""

    def __init__(self, text_col: str, id_col: str, num_hashes: int, bands: int, n: int):
        self.text_col, self.id_col = text_col, id_col
        self.num_hashes, self.bands, self.n = num_hashes, bands, n
        self.rows_per_band = num_hashes // bands

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t[self.id_col].to_pylist()
        texts = t[self.text_col].to_pylist()
        out_id, out_band, out_sig = [], [], []
        for i, txt in zip(ids, texts):
            sig = minhash_signature(str(txt), self.num_hashes, self.n)
            for band in range(self.bands):
                chunk = sig[band * self.rows_per_band : (band + 1) * self.rows_per_band]
                out_id.append(i)
                out_band.append(band)
                out_sig.append(hashlib.md5(chunk.tobytes()).hexdigest()[:16])
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "band": pa.array(out_band, pa.int32()),
                "sig": pa.array(out_sig, pa.string()),
            }
        )


def minhash_lsh_pairs(
    ds,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.0,
    texts_lookup: dict | None = None,
):
    """Candidate near-dup pairs: (band, sig) groupby -> within-bucket
    pairs, deduplicated, optionally Jaccard-verified against
    ``texts_lookup`` (a broadcast {id: text} for the verify stage)."""

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(g["doc_id"].tolist()))
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []}).astype("int64")
        a, b = zip(*[(x, y) for i, x in enumerate(ids) for y in ids[i + 1 :]])
        return pd.DataFrame({"id_a": list(a), "id_b": list(b)})

    pairs = (
        ds.map_batches(
            _MinhashBatch(text_col, id_col, num_hashes, bands, shingle_n),
            batch_format="pyarrow",
        )
        .groupby(["band", "sig"])
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    pdf = pairs.to_pandas()
    if pdf.empty:
        pdf = pd.DataFrame({"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64")})
    pdf = pdf.drop_duplicates().sort_values(["id_a", "id_b"])
    if jaccard_threshold > 0 and texts_lookup is not None:
        keep = []
        for ra, rb in zip(pdf["id_a"], pdf["id_b"]):
            j = ngram_jaccard(
                str(texts_lookup[ra]), str(texts_lookup[rb]), n=shingle_n
            )
            keep.append(j >= jaccard_threshold)
        pdf = pdf[np.array(keep, dtype=bool)] if len(keep) else pdf
    return pa.Table.from_pandas(pdf.reset_index(drop=True), preserve_index=False)


def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    sa, sb = set(_shingles(a, n)), set(_shingles(b, n))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))


# ---------------------------------------------------------------- simhash


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (murmur3-derived bits)."""
    toks = text.split()
    if not toks:
        return 0
    h1 = murmur3_hash_many(toks).astype(np.uint64) & np.uint64(0xFFFFFFFF)
    h2 = murmur3_hash_many([t + "\x01" for t in toks]).astype(np.uint64) & np.uint64(0xFFFFFFFF)
    h = (h1 << np.uint64(32)) | h2
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
    v = (2 * bits - 1).sum(axis=0)
    return int(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def simhash_column(ds, text_col: str, out_col: str = "simhash"):
    def add(t: pa.Table) -> pa.Table:
        vals = [simhash64(str(x)) for x in t[text_col].to_pylist()]
        return t.append_column(out_col, pa.array(np.array(vals, dtype=np.uint64)))

    return ds.map_batches(add, batch_format="pyarrow")


def simhash_near_dup_pairs(ds, text_col: str, id_col: str, max_hamming: int = 3):
    """Hamming-radius candidate pairs via the band pigeonhole trick:
    with ``max_hamming+1`` bands, any two hashes within the radius share
    at least one full band; groupby(band, band_value) then verify exact
    hamming distance in-bucket."""
    nbands = max_hamming + 1
    band_bits = 64 // nbands
    band_mask = (1 << band_bits) - 1

    def explode(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        hs = [simhash64(str(x)) for x in t[text_col].to_pylist()]
        rid, rb, rv, rh = [], [], [], []
        for i, h in zip(ids, hs):
            for band in range(nbands):
                rid.append(i)
                rb.append(band)
                rv.append((h >> (band * band_bits)) & band_mask)
                rh.append(h)
        return pa.table(
            {
                "doc_id": pa.array(rid, pa.int64()),
                "band": pa.array(rb, pa.int32()),
                "band_val": pa.array(rv, pa.int64()),
                "simhash": pa.array(np.array(rh, dtype=np.uint64)),
            }
        )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        rows = g.drop_duplicates("doc_id").sort_values("doc_id")
        ids = rows["doc_id"].to_numpy()
        hs = rows["simhash"].to_numpy().astype(np.uint64)
        out_a, out_b = [], []
        for i in range(len(ids)):
            x = hs[i] ^ hs[i + 1 :]
            d = np.array([bin(int(v)).count("1") for v in x])
            for j in np.flatnonzero(d <= max_hamming):
                out_a.append(int(ids[i]))
                out_b.append(int(ids[i + 1 + j]))
        return pd.DataFrame({"id_a": out_a, "id_b": out_b}).astype("int64")

    pairs = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby(["band", "band_val"])
        .map_groups(verify, batch_format="pandas")
    )
    pdf = pairs.to_pandas()
    if pdf.empty:
        pdf = pd.DataFrame({"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64")})
    pdf = pdf.drop_duplicates().sort_values(["id_a", "id_b"])
    return pa.Table.from_pandas(pdf.reset_index(drop=True), preserve_index=False)


# ------------------------------------------------------------- embeddings


def embedding_near_dup_pairs(
    ds, vec_col: str, id_col: str, threshold: float = 0.95, num_planes: int = 8, seed: int = 7
):
    """Cosine near-dup via random-hyperplane LSH buckets + in-bucket
    matmul verify. ``num_planes`` trades recall for bucket size; pairs
    split across buckets are found because near-identical vectors share
    sign patterns with high probability (document: approximate recall)."""

    def bucketize(t: pa.Table) -> pa.Table:
        vecs = np.asarray(t[vec_col].to_pylist(), dtype=np.float64)
        dim = vecs.shape[1]
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((dim, num_planes))
        signs = (vecs @ planes) >= 0
        key = (signs.astype(np.uint32) << np.arange(num_planes, dtype=np.uint32)).sum(axis=1)
        return pa.table(
            {
                "bucket": pa.array(key.astype(np.int64)),
                "doc_id": t[id_col],
                "vec": t[vec_col],
            }
        )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["doc_id"].to_numpy()
        v = np.asarray(list(g["vec"]), dtype=np.float64)
        norm = np.linalg.norm(v, axis=1, keepdims=True)
        norm[norm == 0] = 1.0
        u = v / norm
        sim = u @ u.T
        iu = np.triu_indices(len(ids), k=1)
        mask = sim[iu] >= threshold
        return pd.DataFrame(
            {
                "id_a": ids[iu[0][mask]],
                "id_b": ids[iu[1][mask]],
                "cosine": sim[iu][mask],
            }
        )

    pairs = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(verify, batch_format="pandas")
    )
    pdf = pairs.to_pandas()
    if pdf.empty:
        pdf = pd.DataFrame(
            {
                "id_a": pd.Series(dtype="int64"),
                "id_b": pd.Series(dtype="int64"),
                "cosine": pd.Series(dtype="float64"),
            }
        )
    pdf = pdf.drop_duplicates(["id_a", "id_b"]).sort_values(["id_a", "id_b"])
    return pa.Table.from_pandas(pdf.reset_index(drop=True), preserve_index=False)
