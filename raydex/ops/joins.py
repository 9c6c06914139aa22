"""Join / lookup operators (SURVEY.md §2.5).

The reference has no general join; what exists maps to two Ray patterns:

- ``broadcast_join``: the `terms`-lookup / enrich shape — the small side
  is ``ray.put`` once and hash-looked-up inside ``map_batches`` (no
  shuffle; reference ``TermsQueryBuilder`` fetch path / x-pack enrich).
- ``copartition_join``: the parent-join shape — both sides get
  ``bucket = murmur3(key) % B``, are grouped per bucket, and joined
  pairwise inside the group (shard-local join via routing, reference
  ``modules/parent-join`` global-ordinal trick). Works when each bucket
  pair fits a worker; salt hot keys by raising B.

Both keep exact inner/left semantics and are DuckDB-oracle-checked.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raydex.partition import murmur3_hash_many


def broadcast_join(big_ds, small_table: pa.Table, key_big: str, key_small: str,
                   take_cols: list[str], how: str = "inner"):
    """Decorate each big-side row with columns from the (broadcast) small
    side. ``how='inner'`` drops unmatched big rows; 'left' keeps them."""
    import ray

    small_df = small_table.to_pandas().set_index(key_small)[take_cols]
    ref = ray.put(small_df)

    def join(batch: pa.Table) -> pa.Table:
        small = ray.get(ref)
        keys = batch[key_big].to_pandas()
        matched = small.reindex(keys)
        out = batch
        for c in take_cols:
            out = out.append_column(c, pa.array(matched[c].to_numpy()))
        if how == "inner":
            mask = pa.array(~matched[take_cols[0]].isna().to_numpy())
            out = out.filter(mask)
        return out

    return big_ds.map_batches(join, batch_format="pyarrow")


def copartition_join(left_ds, right_ds, key_left: str, key_right: str,
                     left_cols: list[str], right_cols: list[str],
                     num_buckets: int = 32, suffix: str = "_r"):
    """Partitioned hash join of two large Datasets: both sides bucketed
    by murmur3(key) % B, schemas aligned to a superset (right columns
    suffixed, other side null-padded), one groupby on bucket, Acero
    hash join inside each bucket group (Arrow-native — no pandas
    round-trip). ``left_cols``/``right_cols`` are the projected
    columns (key included)."""
    right_renamed = [c + suffix for c in right_cols]
    key_right_out = key_right + suffix
    all_cols = left_cols + right_renamed
    lsch = left_ds.schema()
    rsch = right_ds.schema()
    types = dict(zip(lsch.names, lsch.types))
    rtypes = dict(zip(rsch.names, rsch.types))
    for c in right_cols:
        types[c + suffix] = rtypes[c]

    def tag(side: str, key: str, own: list[str], rename: dict):
        def f(t: pa.Table) -> pa.Table:
            keys = [str(v) for v in t[key].to_pylist()]
            b = murmur3_hash_many(keys).astype(np.int64) % num_buckets
            arrays, names = [], []
            for c in all_cols:
                names.append(c)
                src = rename.get(c, c)
                if src in t.schema.names:
                    arrays.append(t[src])
                else:
                    arrays.append(pa.nulls(t.num_rows, type=types[c]))
            out = pa.table(dict(zip(names, arrays)))
            out = out.append_column("_bucket", pa.array(b.astype(np.int32)))
            return out.append_column("_side", pa.array([side] * t.num_rows))

        return f

    left = left_ds.map_batches(
        tag("l", key_left, left_cols, {}), batch_format="pyarrow"
    )
    right = right_ds.map_batches(
        tag("r", key_right, right_renamed, {c + suffix: c for c in right_cols}),
        batch_format="pyarrow",
    )

    out_cols = [c for c in all_cols if c != key_right_out]
    out_schema = pa.schema([(c, types[c]) for c in out_cols])

    def join_bucket(g: pa.Table) -> pa.Table:
        # Arrow-native: Acero hash join inside the bucket group — no
        # pandas round-trip, and the recorded Arrow types survive
        # unchanged (pandas used to widen null-padded ints to float64)
        import pyarrow.compute as pc

        lmask = pc.equal(g["_side"], "l")
        l = g.filter(lmask).select(left_cols)
        r = g.filter(pc.invert(lmask)).select(right_renamed)
        if l.num_rows == 0 or r.num_rows == 0:
            return out_schema.empty_table()
        out = l.join(r, keys=[key_left], right_keys=[key_right_out],
                     join_type="inner")
        return out.select(out_cols).cast(out_schema)

    both = left.union(right)
    return both.groupby("_bucket").map_groups(join_bucket,
                                              batch_format="pyarrow")


def semi_join(left_ds, right_ds, key_left: str, key_right: str,
              num_buckets: int = 64, anti: bool = False):
    """Partitioned SEMI join: keep left rows whose key appears on the
    right (``anti=True`` inverts — the bool.filter / must_not shapes at
    scale). Both sides bucketed by murmur3(key) % B; membership resolved
    inside the bucket group with a numpy isin — neither side ever lands
    on the driver (the scale path when the right side is too big to
    broadcast)."""
    lsch = left_ds.schema()
    out_schema = pa.schema(list(zip(lsch.names, lsch.types)))
    left_cols = list(lsch.names)

    def tag(side: str, key: str, keep_cols: list[str]):
        def f(t: pa.Table) -> pa.Table:
            keys = [str(v) for v in t[key].to_pylist()]
            b = murmur3_hash_many(keys).astype(np.int64) % num_buckets
            arrays = {c: t[c] for c in keep_cols}
            arrays["_k"] = t[key].cast(pa.string()) if t[key].type != pa.string() else t[key]
            out = pa.table(arrays)
            out = out.append_column("_bucket", pa.array(b.astype(np.int32)))
            return out.append_column("_side", pa.array([side] * t.num_rows))

        return f

    left = left_ds.map_batches(tag("l", key_left, left_cols), batch_format="pyarrow")
    # right side ships ONLY its key
    right = right_ds.map_batches(
        lambda t, _f=tag("r", key_right, []): _f(t), batch_format="pyarrow"
    )

    def filter_bucket(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lmask = pc.equal(g["_side"], "l")
        l = g.filter(lmask)
        if l.num_rows == 0:
            return out_schema.empty_table()
        rkeys = g.filter(pc.invert(lmask))["_k"].combine_chunks().unique()
        mask = pc.is_in(l["_k"], value_set=rkeys)
        if anti:
            mask = pc.invert(mask)
        kept = l.filter(mask).select(left_cols)
        if kept.num_rows == 0:
            return out_schema.empty_table()
        return kept.cast(out_schema)

    # align schemas for the union: left carries its columns, right only _k
    def pad_right(t: pa.Table) -> pa.Table:
        arrays = {}
        for c, typ in zip(lsch.names, lsch.types):
            arrays[c] = pa.nulls(t.num_rows, type=typ)
        arrays["_k"] = t["_k"]
        out = pa.table(arrays)
        out = out.append_column("_bucket", t["_bucket"])
        return out.append_column("_side", t["_side"])

    right = right.map_batches(pad_right, batch_format="pyarrow")
    both = left.union(right)
    return both.groupby("_bucket").map_groups(filter_bucket,
                                              batch_format="pyarrow")
