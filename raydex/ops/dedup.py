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

Scale contract (100 TB): the pair-producing operators return a
``ray.data.Dataset`` — the pair list NEVER lands on the driver; callers
``write_parquet`` it or feed it to a connected-components pass. Pair
dedup (the same pair surfacing from several bands/buckets) is a keyed
``groupby`` shuffle, not driver pandas. Degenerate LSH buckets (every
doc identical → O(n²) candidate pairs) are guarded by
``max_bucket_size``: oversized buckets emit STAR pairs (everything
paired with the bucket's min id) — O(n) output that preserves
connectivity for dedup-by-connected-components, documented reduced pair
recall for analytics.

Signature computation is batch-vectorized: per-batch flat shingle/token
hashing (murmur3_hash_many), the (num_hashes × shingles) permutation
matrix + per-doc ``np.minimum.reduceat``, FNV-style band folding — no
per-document Python in the hot path. Hash coefficients are drawn once
per actor in ``__init__``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from raydex.partition import murmur3_hash_many

_M61 = np.uint64(2305843009213693951)  # 2^61-1
_FNV = np.uint64(1099511628211)
_POPCNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array via a byte lookup table."""
    b = np.ascontiguousarray(x).view(np.uint8).reshape(x.shape + (8,))
    return _POPCNT8[b].sum(axis=-1).astype(np.int64)


def content_hash_column(texts) -> list[str]:
    # hashlib.md5 runs in C at memory bandwidth; measured 100x FASTER
    # than a "vectorized" salted-murmur pass here (murmur3_hash_many
    # pads every row to the batch max length — O(n*maxlen) traffic
    # dominates on long documents). The comprehension is not the
    # bottleneck; 128-bit digests make cross-corpus collisions
    # negligible at any scale.
    return [hashlib.md5(str(t).encode()).hexdigest() for t in texts]


def exact_dedup(ds, text_col: str, id_col: str,
                keep: str = "rows_partitioned"):
    """Keep the lowest-id row per distinct text (deterministic winner).

    map_batches(add md5) -> groupby(hash) native Min aggregate (map-side
    combine; NO per-group python). ``keep='ids'`` returns just the
    winning ids (one shuffle); ``keep='rows_partitioned'`` (the
    DEFAULT — scale-safe) resolves membership via a bucketed SEMI join
    (raydex.ops.joins.semi_join): the winner set never lands on the
    driver, which matters because on a mostly-unique corpus it is
    corpus-sized; ``keep='rows'`` instead broadcasts the (sorted)
    winner-id array and filters the input — an explicit small-scale
    opt-in for when the winner set provably fits one node.
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
    if keep == "rows_partitioned":
        from raydex.ops.joins import semi_join

        win_ids = winners.map_batches(
            lambda t: pa.table({id_col: t["_win"]}), batch_format="pyarrow"
        )
        return semi_join(ds, win_ids, id_col, id_col)
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


def _minhash_coefficients(num_hashes: int) -> tuple[np.ndarray, np.ndarray]:
    """The k-wise hash family parameters — fixed seed, drawn ONCE."""
    rng = np.random.default_rng(1234)
    a = rng.integers(1, 2**31, size=num_hashes, dtype=np.uint64)
    b = rng.integers(0, 2**31, size=num_hashes, dtype=np.uint64)
    return a, b


def minhash_signature(text: str, num_hashes: int, n: int = 3) -> np.ndarray:
    """Scalar reference implementation (property-test oracle for the
    batch path): num_hashes 32-bit minhashes via seed-salted murmur3."""
    sh = _shingles(text, n)
    if not sh:
        return np.full(num_hashes, np.iinfo(np.uint32).max, dtype=np.uint32)
    base = murmur3_hash_many(sh).astype(np.uint64) & np.uint64(0xFFFFFFFF)
    a, b = _minhash_coefficients(num_hashes)
    vals = (base[None, :] * a[:, None] + b[:, None]) % _M61
    return vals.min(axis=1).astype(np.uint32)


def minhash_signatures_batch(
    texts: list[str], num_hashes: int, n: int, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """Vectorized (ndocs, num_hashes) uint32 signature matrix.

    One murmur3 pass over the batch's flat shingle list, one
    (num_hashes × total_shingles) permutation product, per-doc min via
    ``np.minimum.reduceat`` — identical values to ``minhash_signature``
    row by row (tested)."""
    ndocs = len(texts)
    flat: list[str] = []
    counts = np.empty(ndocs, dtype=np.int64)
    for i, t in enumerate(texts):
        sh = _shingles(str(t), n)
        counts[i] = len(sh)
        flat.extend(sh)
    sigs = np.full((ndocs, num_hashes), np.iinfo(np.uint32).max, dtype=np.uint32)
    if not flat:
        return sigs
    base = murmur3_hash_many(flat).astype(np.uint64) & np.uint64(0xFFFFFFFF)
    vals = (base[None, :] * a[:, None] + b[:, None]) % _M61  # (H, S)
    nonempty = np.flatnonzero(counts)
    starts = (np.cumsum(counts) - counts)[nonempty]
    mins = np.minimum.reduceat(vals, starts, axis=1)  # (H, ndocs_nonempty)
    sigs[nonempty] = mins.T.astype(np.uint32)
    return sigs


class _MinhashBatch:
    """Actor-pool stage: hash params computed once per actor (__init__);
    __call__ is fully batch-vectorized."""

    def __init__(self, text_col: str, id_col: str, num_hashes: int, bands: int, n: int):
        self.text_col, self.id_col = text_col, id_col
        self.num_hashes, self.bands, self.n = num_hashes, bands, n
        self.rows_per_band = num_hashes // bands
        self.a, self.b = _minhash_coefficients(num_hashes)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t[self.id_col].to_numpy()
        texts = t[self.text_col].to_pylist()
        sigs = minhash_signatures_batch(texts, self.num_hashes, self.n, self.a, self.b)
        # band folding: FNV-mix the rows_per_band lanes of each band into
        # one uint64 key (equality structure == equality of the lane
        # vector, modulo negligible 64-bit collisions)
        lanes = sigs.reshape(len(ids), self.bands, self.rows_per_band)
        h = np.full((len(ids), self.bands), np.uint64(14695981039346656037))
        for r in range(self.rows_per_band):
            h = (h * _FNV) ^ lanes[:, :, r].astype(np.uint64)
        nb = self.bands
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids.astype(np.int64), nb)),
                "band": pa.array(np.tile(np.arange(nb, dtype=np.int32), len(ids))),
                # int64 view of the uint64 fold (equality-preserving; the
                # hash shuffle keys on it)
                "sig": pa.array(h.ravel().view(np.int64)),
            }
        )


def _keyed_blocks(ds, keys: list[str], cpu_denom: float = 4.0):
    """Hash-repartition so every key group lands wholly in one block
    (scoped HASH_SHUFFLE override, the build_index pattern) — the
    downstream stage then processes WHOLE BLOCKS, paying one Python call
    per block instead of one per group (map_groups costs ~1 task per
    group: measured 80k sig-buckets -> 80k calls)."""
    import ray
    from ray.data.context import DataContext, ShuffleStrategy

    ctx = DataContext.get_current()
    saved = (
        ctx.shuffle_strategy,
        ctx.max_hash_shuffle_aggregators,
        ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override,
    )
    ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    nb = max(16, ncpu)
    # small aggregator pool: each hash shuffle spins an actor pool whose
    # startup is a FIXED cost (~seconds); pair datasets are orders of
    # magnitude smaller than the corpus, so a handful of aggregators is
    # plenty and the spin-up dominates otherwise. Cap each pool's TOTAL
    # CPU reservation at ncpu/4: near-dup pipelines chain TWO hash
    # shuffles, and Ray's default (half the cluster per pool) deadlocks
    # a 4-cpu cluster with both pools pending plus the read task.
    dctx = getattr(ds, "context", None)
    saved_ds = None if dctx is None else (
        dctx.shuffle_strategy,
        dctx.max_hash_shuffle_aggregators,
        dctx.hash_shuffle_operator_actor_num_cpus_per_partition_override,
    )
    for c in (ctx, dctx):
        if c is not None:
            c.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
            c.max_hash_shuffle_aggregators = max(2, min(8, int(ncpu // cpu_denom)))
            c.hash_shuffle_operator_actor_num_cpus_per_partition_override = (
                ncpu / (cpu_denom * nb)
            )
    try:
        out = ds.repartition(num_blocks=nb, keys=keys)
        # Ray Data DERIVED datasets share the parent's context object —
        # without a detach, the override above would leak into the
        # CALLER'S input dataset (and everything else sharing its
        # lineage) forever, silently switching later unrelated shuffles
        # to tiny hash-aggregator pools (measured: a post-LSH
        # semi-join deadlocking a 4-cpu cluster). Give the returned
        # chain its own context snapshot carrying the override, then
        # restore the shared one in the finally.
        import copy as _copy

        plan = getattr(out, "_plan", None)
        if plan is not None and getattr(plan, "_context", None) is not None:
            plan._context = _copy.deepcopy(plan._context)
        return out
    finally:
        (
            ctx.shuffle_strategy,
            ctx.max_hash_shuffle_aggregators,
            ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override,
        ) = saved
        if dctx is not None and dctx is not ctx:
            (
                dctx.shuffle_strategy,
                dctx.max_hash_shuffle_aggregators,
                dctx.hash_shuffle_operator_actor_num_cpus_per_partition_override,
            ) = saved_ds


def _group_bounds(*key_arrays: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(starts, ends) of equal-key runs over pre-sorted parallel arrays."""
    n = key_arrays[0].size
    change = np.zeros(n, dtype=bool)
    change[0] = True
    for a in key_arrays:
        change[1:] |= a[1:] != a[:-1]
    starts = np.flatnonzero(change)
    return starts, np.r_[starts[1:], n]


_PAIR_SCHEMA = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())])


def _emit_group_pairs(ids: np.ndarray, starts, ends, max_bucket_size,
                      out_a: list, out_b: list) -> None:
    sizes = ends - starts
    for s, e in zip(starts[sizes >= 2], ends[sizes >= 2]):
        grp = np.unique(ids[s:e])
        if grp.size < 2:
            continue
        if grp.size > max_bucket_size:
            # degenerate bucket: O(n) star pairs keep connectivity
            out_a.append(np.full(grp.size - 1, grp[0]))
            out_b.append(grp[1:])
        else:
            iu = np.triu_indices(grp.size, k=1)
            out_a.append(grp[iu[0]])
            out_b.append(grp[iu[1]])


def _bucket_pairs_df(ids: np.ndarray, max_bucket_size: int) -> pd.DataFrame:
    """All-pairs within a bucket, star-capped when degenerate."""
    ids = np.unique(ids.astype(np.int64))
    if ids.size < 2:
        return pd.DataFrame({"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64")})
    if ids.size > max_bucket_size:
        # degenerate bucket (e.g. boilerplate duplicated n times): O(n)
        # star pairs keep the connected component intact without the
        # O(n²) pair explosion
        return pd.DataFrame({"id_a": np.full(ids.size - 1, ids[0]), "id_b": ids[1:]})
    iu = np.triu_indices(ids.size, k=1)
    return pd.DataFrame({"id_a": ids[iu[0]], "id_b": ids[iu[1]]})


def _dedup_pairs(pairs_ds):
    """Distinct (id_a, id_b): hash-repartition co-locates equal pairs,
    then ONE vectorized np.unique per block — no driver collect, no
    per-group Python, no sort-shuffle (the native groupby's sort
    exchange measured 17 s on a 35k-row pair set; this path is <2 s)."""

    def uniq(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _PAIR_SCHEMA.empty_table()
        arr = np.stack(
            [t["id_a"].to_numpy().astype(np.int64),
             t["id_b"].to_numpy().astype(np.int64)], axis=1
        )
        u = np.unique(arr, axis=0)
        return pa.table({"id_a": pa.array(u[:, 0]), "id_b": pa.array(u[:, 1])})

    return _keyed_blocks(pairs_ds, ["id_a", "id_b"]).map_batches(
        uniq, batch_format="pyarrow", batch_size=None
    )


def _attach_texts(pairs_ds, texts_ds, pair_key: str, id_col: str,
                  text_col: str, out_col: str, num_buckets: int = 64):
    """Co-partitioned text fetch: each pair row is routed to the bucket
    of its ``pair_key``, each corpus row to the bucket of its id; the
    lookup resolves INSIDE the block. This replaces the whole-corpus
    ``ray.put`` broadcast (r2's named scale-killer): shuffled bytes are
    O(pairs + corpus), peak memory is one bucket's texts, and nothing
    lands on the driver. Same shape as the reference's co-located
    parent-join (``modules/parent-join``), not its terms-lookup
    broadcast (which is for genuinely small sides,
    ``TermsQueryBuilder.java``)."""
    psch = pairs_ds.schema()
    pair_cols = list(psch.names)
    ptypes = dict(zip(psch.names, psch.types))
    tsch = texts_ds.schema()
    ttype = dict(zip(tsch.names, tsch.types))[text_col]
    out_schema = pa.schema(
        [(c, ptypes[c]) for c in pair_cols] + [(out_col, ttype)]
    )

    def tag_pairs(t: pa.Table) -> pa.Table:
        keys = [str(v) for v in t[pair_key].to_pylist()]
        b = murmur3_hash_many(keys).astype(np.int64) % num_buckets
        cols = {c: t[c] for c in pair_cols}
        cols["_tid"] = pa.nulls(t.num_rows, pa.string())
        cols["_text"] = pa.nulls(t.num_rows, ttype)
        out = pa.table(cols)
        out = out.append_column("_b", pa.array(b.astype(np.int32)))
        return out.append_column("_side", pa.array(["p"] * t.num_rows))

    def tag_texts(t: pa.Table) -> pa.Table:
        keys = [str(v) for v in t[id_col].to_pylist()]
        b = murmur3_hash_many(keys).astype(np.int64) % num_buckets
        cols = {c: pa.nulls(t.num_rows, ptypes[c]) for c in pair_cols}
        cols["_tid"] = pa.array(keys, pa.string())
        cols["_text"] = t[text_col].cast(ttype)
        out = pa.table(cols)
        out = out.append_column("_b", pa.array(b.astype(np.int32)))
        return out.append_column("_side", pa.array(["t"] * t.num_rows))

    tagged = pairs_ds.map_batches(tag_pairs, batch_format="pyarrow").union(
        texts_ds.map_batches(tag_texts, batch_format="pyarrow")
    )

    def resolve(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        side = np.asarray(t["_side"].to_pylist(), dtype=object)
        is_p = side == "p"
        tt = t.filter(pa.array(~is_p))
        lookup = dict(zip(tt["_tid"].to_pylist(), tt["_text"].to_pylist()))
        pt = t.filter(pa.array(is_p))
        if pt.num_rows == 0:
            return out_schema.empty_table()
        vals = [lookup.get(str(v)) for v in pt[pair_key].to_pylist()]
        cols = {c: pt[c] for c in pair_cols}
        cols[out_col] = pa.array(vals, ttype)
        return pa.table(cols).cast(out_schema)

    return _keyed_blocks(tagged, ["_b"], cpu_denom=8.0).map_batches(
        resolve, batch_format="pyarrow", batch_size=None
    )


def jaccard_verify_pairs(pairs_ds, texts_ds, id_col: str, text_col: str,
                         shingle_n: int = 3, threshold: float = 0.9,
                         num_buckets: int = 64):
    """Exact n-gram-Jaccard verification of candidate pairs with the
    texts fetched by co-partitioned join (both sides of every pair) —
    the 100 TB verify path; output identical to the broadcast-lookup
    variant."""
    p1 = _attach_texts(pairs_ds, texts_ds, "id_a", id_col, text_col,
                       "_text_a", num_buckets)
    p2 = _attach_texts(p1, texts_ds, "id_b", id_col, text_col,
                       "_text_b", num_buckets)

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.drop_columns(["_text_a", "_text_b"])
        keep = np.fromiter(
            (
                ngram_jaccard(str(a), str(b), n=shingle_n) >= threshold
                for a, b in zip(t["_text_a"].to_pylist(), t["_text_b"].to_pylist())
            ),
            dtype=bool,
            count=t.num_rows,
        )
        return t.filter(pa.array(keep)).drop_columns(["_text_a", "_text_b"])

    return p2.map_batches(verify, batch_format="pyarrow")


def minhash_lsh_pairs(
    ds,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.0,
    texts_lookup: dict | None = None,
    texts_ds=None,
    max_bucket_size: int = 4096,
):
    """Candidate near-dup pairs as a **Dataset**: (band, sig) keyed
    hash-repartition -> per-BLOCK vectorized pair emission (no per-group
    tasks), native-aggregate pair dedup, optionally Jaccard-verified.

    Verification sources, by scale: ``texts_ds`` (a Dataset carrying
    ``id_col``/``text_col``) fetches both pair texts via co-partitioned
    joins — the 100 TB path; ``texts_lookup`` (a broadcast {id: text}
    dict) is the small-corpus convenience. Nothing materializes on the
    driver; callers ``write_parquet`` / ``take_all`` at their own
    scale."""

    def emit_pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _PAIR_SCHEMA.empty_table()
        t = t.sort_by([("band", "ascending"), ("sig", "ascending")])
        band = t["band"].to_numpy()
        sig = t["sig"].to_numpy()
        ids = t["doc_id"].to_numpy()
        starts, ends = _group_bounds(band, sig)
        out_a: list = []
        out_b: list = []
        _emit_group_pairs(ids, starts, ends, max_bucket_size, out_a, out_b)
        if not out_a:
            return _PAIR_SCHEMA.empty_table()
        return pa.table(
            {"id_a": pa.array(np.concatenate(out_a)),
             "id_b": pa.array(np.concatenate(out_b))}
        )

    sigs = ds.map_batches(
        _MinhashBatch(text_col, id_col, num_hashes, bands, shingle_n),
        batch_format="pyarrow",
    )
    pairs = _keyed_blocks(sigs, ["band", "sig"]).map_batches(
        emit_pairs, batch_format="pyarrow", batch_size=None
    )
    pairs = _dedup_pairs(pairs)
    if jaccard_threshold > 0 and texts_ds is not None:
        return jaccard_verify_pairs(
            pairs, texts_ds, id_col, text_col,
            shingle_n=shingle_n, threshold=jaccard_threshold,
        )
    if jaccard_threshold > 0 and texts_lookup is not None:
        import ray

        ref = ray.put(texts_lookup)

        def verify(t: pa.Table) -> pa.Table:
            lookup = ray.get(ref)
            ia = t["id_a"].to_pylist()
            ib = t["id_b"].to_pylist()
            keep = [
                ngram_jaccard(str(lookup[x]), str(lookup[y]), n=shingle_n)
                >= jaccard_threshold
                for x, y in zip(ia, ib)
            ]
            return t.filter(pa.array(np.array(keep, dtype=bool)))

        pairs = pairs.map_batches(verify, batch_format="pyarrow")
    return pairs


def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    sa, sb = set(_shingles(a, n)), set(_shingles(b, n))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))


# ---------------------------------------------------------------- simhash


def simhash64_batch(texts: list[str]) -> np.ndarray:
    """Vectorized 64-bit SimHash per doc (murmur3-derived token bits).

    One murmur3 pass over the batch's flat token list; per-doc ±1 bit
    sums via ``np.add.reduceat``. Identical values to the scalar
    definition (tested)."""
    ndocs = len(texts)
    flat: list[str] = []
    counts = np.empty(ndocs, dtype=np.int64)
    for i, t in enumerate(texts):
        toks = str(t).split()
        counts[i] = len(toks)
        flat.extend(toks)
    out = np.zeros(ndocs, dtype=np.uint64)
    if not flat:
        return out
    h1 = murmur3_hash_many(flat).astype(np.uint64) & np.uint64(0xFFFFFFFF)
    h2 = murmur3_hash_many([t + "\x01" for t in flat]).astype(np.uint64) & np.uint64(
        0xFFFFFFFF
    )
    h = (h1 << np.uint64(32)) | h2
    shifts = np.arange(64, dtype=np.uint64)
    pm = (2 * ((h[:, None] >> shifts) & np.uint64(1)).astype(np.int32) - 1)  # (T, 64)
    nonempty = np.flatnonzero(counts)
    starts = (np.cumsum(counts) - counts)[nonempty]
    v = np.add.reduceat(pm, starts, axis=0)  # (ndocs_nonempty, 64)
    packed = ((v > 0).astype(np.uint64) << shifts).sum(axis=1)
    out[nonempty] = packed
    return out


def simhash64(text: str) -> int:
    """Scalar convenience wrapper over the batch path."""
    return int(simhash64_batch([text])[0])


def simhash_column(ds, text_col: str, out_col: str = "simhash"):
    def add(t: pa.Table) -> pa.Table:
        vals = simhash64_batch(t[text_col].to_pylist())
        return t.append_column(out_col, pa.array(vals))

    return ds.map_batches(add, batch_format="pyarrow")


def simhash_near_dup_pairs(
    ds, text_col: str, id_col: str, max_hamming: int = 3, max_bucket_size: int = 4096
):
    """Hamming-radius candidate pairs as a **Dataset**, via the band
    pigeonhole trick: with ``max_hamming+1`` bands, any two hashes
    within the radius share at least one full band; groupby(band,
    band_value), verify exact hamming distance in-bucket (vectorized
    XOR + table popcount), keyed-groupby dedup."""
    nbands = max_hamming + 1
    band_bits = 64 // nbands
    band_mask = np.uint64((1 << band_bits) - 1)

    def explode(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy().astype(np.int64)
        hs = simhash64_batch(t[text_col].to_pylist())  # (n,) uint64
        shifts = (np.arange(nbands, dtype=np.uint64) * np.uint64(band_bits))
        vals = (hs[:, None] >> shifts[None, :]) & band_mask  # (n, nbands)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, nbands)),
                "band": pa.array(np.tile(np.arange(nbands, dtype=np.int32), ids.size)),
                "band_val": pa.array(vals.ravel().astype(np.int64)),
                "simhash": pa.array(np.repeat(hs, nbands)),
            }
        )

    def verify_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _PAIR_SCHEMA.empty_table()
        t = t.sort_by(
            [("band", "ascending"), ("band_val", "ascending"), ("doc_id", "ascending")]
        )
        band = t["band"].to_numpy()
        bval = t["band_val"].to_numpy()
        ids = t["doc_id"].to_numpy().astype(np.int64)
        hs = t["simhash"].to_numpy().astype(np.uint64)
        starts, ends = _group_bounds(band, bval)
        sizes = ends - starts
        out_a: list = []
        out_b: list = []
        for s, e in zip(starts[sizes >= 2], ends[sizes >= 2]):
            grp, idx = np.unique(ids[s:e], return_index=True)
            n = grp.size
            if n < 2:
                continue
            hg = hs[s:e][idx]
            if n > max_bucket_size:
                d = _popcount64(hg[0] ^ hg[1:])
                sel = np.flatnonzero(d <= max_hamming)
                out_a.append(np.full(sel.size, grp[0]))
                out_b.append(grp[1 + sel])
            else:
                iu = np.triu_indices(n, k=1)
                d = _popcount64(hg[iu[0]] ^ hg[iu[1]])
                sel = d <= max_hamming
                out_a.append(grp[iu[0][sel]])
                out_b.append(grp[iu[1][sel]])
        if not out_a:
            return _PAIR_SCHEMA.empty_table()
        return pa.table(
            {"id_a": pa.array(np.concatenate(out_a)),
             "id_b": pa.array(np.concatenate(out_b))}
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    pairs = _keyed_blocks(exploded, ["band", "band_val"]).map_batches(
        verify_block, batch_format="pyarrow", batch_size=None
    )
    return _dedup_pairs(pairs)


# ------------------------------------------------------------- embeddings


def embedding_near_dup_pairs(
    ds,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
    num_planes: int = 8,
    seed: int = 7,
    max_bucket_size: int = 8192,
):
    """Cosine near-dup pairs as a **Dataset** via random-hyperplane LSH
    buckets + in-bucket matmul verify. ``num_planes`` trades recall for
    bucket size; pairs split across buckets are found because
    near-identical vectors share sign patterns with high probability
    (document: approximate recall). Same-pair-in-many-buckets dedup is a
    keyed groupby (keeps max — the cosine is identical anyway)."""

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

    schema = pa.schema(
        [("id_a", pa.int64()), ("id_b", pa.int64()), ("cosine", pa.float64())]
    )

    def verify_block(t: pa.Table) -> pa.Table:
        """All bucket groups of one hash-partitioned block in ONE call —
        the `_keyed_blocks` pattern (map_groups cost one Ray task + a
        pandas conversion PER BUCKET: 2^num_planes tasks at scale —
        r2's named weak spot; this is the simhash `verify_block` shape)."""
        if t.num_rows == 0:
            return schema.empty_table()
        t = t.sort_by([("bucket", "ascending"), ("doc_id", "ascending")])
        buckets = t["bucket"].to_numpy()
        ids = t["doc_id"].to_numpy().astype(np.int64)
        v = np.asarray(t["vec"].to_pylist(), dtype=np.float64)
        norm = np.linalg.norm(v, axis=1, keepdims=True)
        norm[norm == 0] = 1.0
        u = v / norm
        starts, ends = _group_bounds(buckets)
        out_a: list = []
        out_b: list = []
        out_c: list = []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            grp_ids = ids[s:e]
            gu = u[s:e]
            keep = np.ones(e - s, dtype=bool)  # dedup doc_id (sorted)
            keep[1:] = grp_ids[1:] != grp_ids[:-1]
            grp_ids, gu = grp_ids[keep], gu[keep]
            n = grp_ids.size
            if n < 2:
                continue
            if n > max_bucket_size:
                # degenerate bucket: compare to the min-id vector only
                sim = gu[1:] @ gu[0]
                sel = np.flatnonzero(sim >= threshold)
                out_a.append(np.full(sel.size, grp_ids[0]))
                out_b.append(grp_ids[1 + sel])
                out_c.append(sim[sel])
            else:
                sim = gu @ gu.T
                iu = np.triu_indices(n, k=1)
                mask = sim[iu] >= threshold
                out_a.append(grp_ids[iu[0][mask]])
                out_b.append(grp_ids[iu[1][mask]])
                out_c.append(sim[iu][mask])
        if not out_a:
            return schema.empty_table()
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(out_a)),
                "id_b": pa.array(np.concatenate(out_b)),
                "cosine": pa.array(np.concatenate(out_c)),
            }
        )

    pairs = _keyed_blocks(
        ds.map_batches(bucketize, batch_format="pyarrow"), ["bucket"]
    ).map_batches(verify_block, batch_format="pyarrow", batch_size=None)
    # pair dedup keeping the cosine (identical across copies): hash
    # co-location + per-block drop_duplicates — same shape as
    # _dedup_pairs, no sort exchange

    def uniqc(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return schema.empty_table()
        df = t.to_pandas().drop_duplicates(["id_a", "id_b"])
        return pa.Table.from_pandas(df, preserve_index=False).cast(schema)

    return _keyed_blocks(pairs, ["id_a", "id_b"]).map_batches(
        uniqc, batch_format="pyarrow", batch_size=None
    )


# ------------------------------------------------- duplicated windows


def _window_pairs(t: pa.Table, text_col: str, id_col: str, k: int) -> pa.Table:
    """Explode one batch into (w, id) rows — every k-token window of
    every doc, fully vectorized: split once, build windows by joining k
    shifted views of the flat token array, mask windows that straddle a
    doc boundary."""
    import pyarrow.compute as pc

    toks = pc.split_pattern(t[text_col], " ")
    flat = pc.list_flatten(toks).combine_chunks()
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offs = toks.offsets.to_numpy()  # len = nrows + 1
    m = len(flat)
    if m < k:
        return pa.table({"w": pa.array([], pa.string()),
                         id_col: pa.array([], t[id_col].type),
                         "cnt": pa.array([], pa.int64())})
    # window starting at flat position j is valid iff j+k <= end of the
    # doc containing j
    starts = np.arange(m - k + 1)
    doc_of = np.searchsorted(offs, starts, side="right") - 1
    valid = starts + k <= offs[doc_of + 1]
    shifted = [flat.slice(j, m - k + 1) for j in range(k)]
    windows = pc.binary_join_element_wise(*shifted, " ")
    mask = pa.array(valid)
    ids = pc.take(t[id_col], pa.array(doc_of[valid]))
    out = pa.table({"w": pc.filter(windows, mask), id_col: ids})
    # local combine: (w, id) -> cnt inside the batch (map-side partial —
    # cuts shuffle rows before the one hash exchange on w)
    wnp = np.asarray(out["w"].to_pylist(), dtype=object)
    inp = out[id_col].to_numpy()
    order = np.lexsort((inp, wnp))
    wnp, inp = wnp[order], inp[order]
    starts, ends = _group_bounds(wnp, inp)
    return pa.table({
        "w": pa.array(wnp[starts]),
        id_col: pa.array(inp[starts]),
        "cnt": pa.array(ends - starts, pa.int64()),
    })


def duplicated_window_stats(ds, text_col: str, id_col: str, k: int = 8):
    """Substring-level dedup signal (Lee et al., "Deduplicating Training
    Data Makes Language Models Better"): for every doc, the fraction of
    its k-token windows whose exact text also occurs in ANOTHER doc.

    Pipeline (all distributed, no driver collect):
      explode + local (w, id)->cnt combine           [map]
      -> hash partition by w                         [ONE wide shuffle]
      -> in-block: merge (w,id) partials, mark cross-doc dup,
         fold to per-doc partials                    [map]
      -> groupby(id).sum                             [small shuffle]

    Docs shorter than k tokens emit no windows and are absent from the
    result (the SQL-oracle convention). The window STRING is the
    groupby key — exact; at 100 TB swap in a 128-bit window hash as the
    key (collision-safe), which drops shuffle bytes ~10x without
    changing the algebra.
    """
    pairs = ds.map_batches(
        lambda t: _window_pairs(t, text_col, id_col, k),
        batch_format="pyarrow",
    )

    def mark_and_partial(t: pa.Table) -> pa.Table:
        # block holds ALL rows of every window value it contains (hash
        # partitioned by w): merge the map-side (w, id, cnt) partials,
        # then a window is duplicated iff its run spans >= 2 docs — all
        # vectorized, folded straight to per-doc partials
        if t.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "n_windows": pa.array([], pa.int64()),
                             "dup_windows": pa.array([], pa.int64())})
        w = np.asarray(t["w"].to_pylist(), dtype=object)
        ids = t[id_col].to_numpy()
        cnt = t["cnt"].to_numpy()
        order = np.lexsort((ids, w))
        w, ids, cnt = w[order], ids[order], cnt[order]
        ws, we = _group_bounds(w, ids)  # (w, id) runs -> merge partials
        ids, cnt = ids[ws], np.add.reduceat(cnt, ws)
        w = w[ws]
        starts, ends = _group_bounds(w)
        sizes = ends - starts
        dup = np.repeat(sizes >= 2, sizes)
        order2 = np.argsort(ids, kind="mergesort")
        ids, cnt, dup = ids[order2], cnt[order2], dup[order2]
        uniq, ustarts = np.unique(ids, return_index=True)
        n_win = np.add.reduceat(cnt, ustarts)
        d_win = np.add.reduceat(np.where(dup, cnt, 0), ustarts)
        return pa.table({
            id_col: pa.array(uniq),
            "n_windows": pa.array(n_win, pa.int64()),
            "dup_windows": pa.array(d_win, pa.int64()),
        })

    out = (
        _keyed_blocks(pairs, ["w"])
        .map_batches(mark_and_partial, batch_format="pyarrow", batch_size=None)
        .groupby(id_col)
        .sum(["n_windows", "dup_windows"])
    )

    def finish(t: pa.Table) -> pa.Table:
        t = t.rename_columns([id_col, "n_windows", "dup_windows"])
        frac = t["dup_windows"].to_numpy() / np.maximum(
            t["n_windows"].to_numpy(), 1
        )
        return t.append_column("dup_fraction", pa.array(frac, pa.float64()))

    return out.map_batches(finish, batch_format="pyarrow").sort(id_col)


# ------------------------------------------------- connected components


def _inherit_global_context(ds):
    """Pair datasets built by the LSH tier carry a SCOPED hash-shuffle
    context (tiny aggregator pools sized for that one repartition —
    _keyed_blocks). Iterative consumers (the CC loop's joins/groupbys)
    must run under the session defaults or their shuffles inherit those
    pool sizes and deadlock on small clusters; copy the global
    context's shuffle fields onto the materialized dataset."""
    from ray.data.context import DataContext as _DC

    g = _DC.get_current()
    c = getattr(ds, "context", None)
    if c is not None:
        c.shuffle_strategy = g.shuffle_strategy
        c.max_hash_shuffle_aggregators = g.max_hash_shuffle_aggregators
        c.hash_shuffle_operator_actor_num_cpus_per_partition_override = \
            g.hash_shuffle_operator_actor_num_cpus_per_partition_override
    return ds


def _cc_numpy(a: np.ndarray, b: np.ndarray):
    """Exact connected components over a driver-sized edge list:
    min-label propagation with pointer jumping, fully vectorized
    (``np.minimum.at`` scatter + ``lab[lab]`` doubling) — O(E log d)
    with no Python loop over edges. Returns (node ids, component
    labels) where the label is the component's minimum node id
    (np.unique sorts, so index order == id order)."""
    ids = np.unique(np.concatenate([a, b]))
    ca = np.searchsorted(ids, a)
    cb = np.searchsorted(ids, b)
    lab = np.arange(len(ids), dtype=np.int64)
    while True:
        prev = lab
        lab = lab.copy()
        np.minimum.at(lab, ca, lab[cb])
        np.minimum.at(lab, cb, lab[ca])
        while True:
            nxt = lab[lab]
            if np.array_equal(nxt, lab):
                break
            lab = nxt
        if np.array_equal(lab, prev):
            break
    return ids, ids[lab]


def connected_components(pairs_ds, id_a: str = "id_a", id_b: str = "id_b",
                         node_col: str = "doc_id",
                         label_col: str = "component",
                         max_iters: int = 25,
                         max_driver_edges: int = 5_000_000):
    """Distributed connected components over a near-dup pair Dataset —
    the pairs -> clusters step every dedup pipeline needs before
    choosing survivors. Min-label propagation (the MapReduce-CC family,
    Kiveris et al., "Connected Components in MapReduce and Beyond"):
    every node repeatedly adopts the minimum label among itself and its
    neighbors; each iteration is one co-partitioned join (labels onto
    the symmetric edge stream) plus one keyed groupby-min — no
    driver-side graph. Convergence detected by the global label sum,
    which is strictly decreasing while any label changes (labels are
    int64 doc ids, min-propagation only lowers them). The LSH bucket
    emitter's star pairs keep component diameter tiny, so 2-3
    iterations typically suffice; ``max_iters`` bounds pathological
    chains. Returns a Dataset (node_col, label_col) with one row per
    node that appears in any pair; the label is the component's
    minimum doc id.

    The pair graph is the LSH CANDIDATE set — orders of magnitude
    smaller than the corpus — so below ``max_driver_edges`` (~80 MB of
    int64 pairs) the exact in-memory path runs instead: one vectorized
    numpy min-label/pointer-jump pass (``_cc_numpy``), skipping the
    per-iteration join+shuffle fixed costs that dominate on small
    graphs. The guard itself is a distributed count over the already
    materialized edge blocks; above it, the iterative loop below is
    the 100 TB-shaped path."""
    import pyarrow.compute as pc

    def sym(t: pa.Table) -> pa.Table:
        a = t[id_a].cast(pa.int64()).combine_chunks()
        b = t[id_b].cast(pa.int64()).combine_chunks()
        return pa.table({"node": pa.concat_arrays([a, b]),
                         "nbr": pa.concat_arrays([b, a])})

    edges = _inherit_global_context(
        pairs_ds.map_batches(sym, batch_format="pyarrow").materialize())
    if edges.count() <= 2 * max_driver_edges:
        import ray
        import ray.data as rd

        parts = [p for p in ray.get(edges.to_arrow_refs())
                 if p.num_rows]
        if not parts:
            return rd.from_arrow(pa.table(
                {node_col: pa.array([], pa.int64()),
                 label_col: pa.array([], pa.int64())}))
        t = pa.concat_tables(parts)
        ids, labs = _cc_numpy(
            t["node"].to_numpy(zero_copy_only=False),
            t["nbr"].to_numpy(zero_copy_only=False))
        return rd.from_arrow(pa.table(
            {node_col: pa.array(ids, pa.int64()),
             label_col: pa.array(labs, pa.int64())}))

    def init_cand(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["node"],
                         "label": pc.min_element_wise(t["node"], t["nbr"])})

    def _gmin(ds_):
        # bound the block count: union + groupby otherwise multiply
        # blocks every round (iteration cost grows superlinearly)
        out = ds_.groupby("node").min("label")
        return out.map_batches(
            lambda t: t.rename_columns(["node", "label"]),
            batch_format="pyarrow").repartition(8)

    labels = _inherit_global_context(
        _gmin(edges.map_batches(init_cand,
                                batch_format="pyarrow")).materialize())
    prev_sum = labels.sum("label")
    from raydex.ops.joins import copartition_join

    for _ in range(max_iters):
        # neighbor propagation: each node sees its neighbors' labels
        j = copartition_join(edges, labels, "nbr", "node",
                             ["node", "nbr"], ["node", "label"],
                             num_buckets=8)
        cand = j.map_batches(
            lambda t: pa.table({"node": t["node"].cast(pa.int64()),
                                "label": t["label_r"].cast(pa.int64())}),
            batch_format="pyarrow")
        # pointer jumping (label <- label[label]): halves the residual
        # path length each round, so long chains converge in O(log d)
        # joins instead of O(d) (the CC-MR "large-star" acceleration)
        jj = copartition_join(labels, labels, "label", "node",
                              ["node", "label"], ["node", "label"],
                              num_buckets=8)
        hop = jj.map_batches(
            lambda t: pa.table({"node": t["node"].cast(pa.int64()),
                                "label": t["label_r"].cast(pa.int64())}),
            batch_format="pyarrow")
        labels = _inherit_global_context(
            _gmin(cand.union(hop).union(labels)).materialize())
        new_sum = labels.sum("label")
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels.map_batches(
        lambda t: t.rename_columns([node_col, label_col]),
        batch_format="pyarrow")


def dedup_by_components(ds, pairs_ds, id_col: str,
                        id_a: str = "id_a", id_b: str = "id_b"):
    """Near-dup dedup end to end: resolve the pair graph to components,
    keep ONE survivor per component (the minimum doc id — the same
    latest/first-wins convention as exact_dedup) plus every doc that
    appears in no pair. The loser set never lands on the driver: the
    filter is a bucketed ANTI join against it (semi_join machinery)."""
    comp = _inherit_global_context(
        connected_components(pairs_ds, id_a=id_a, id_b=id_b,
                             node_col="node",
                             label_col="component").materialize())
    import pyarrow.compute as pc

    losers = comp.map_batches(
        lambda t: t.filter(pc.not_equal(t["node"], t["component"]))
                   .select(["node"]),
        batch_format="pyarrow")
    from raydex.ops.joins import semi_join

    return semi_join(ds, losers, id_col, "node", anti=True)
