"""Nested documents: mapper + query (SURVEY §2.5).

The reference stores nested sub-documents as adjacent Lucene docs in
the same segment and `nested` queries match a parent when ONE sub-doc
satisfies all inner conditions (``server/src/main/java/org/elasticsearch/
index/query/NestedQueryBuilder.java``, ``index/mapper/NestedObjectMapper``)
— the property a flattened object mapping loses (cross-object matches).

Ray-Data-first re-expression:

- ``nest``: children co-located with their parent via ONE keyed
  hash-shuffle (the same routing primitive as the index build), then a
  per-block columnar fold into a ``list<struct>`` column — the
  block-adjacency analogue of the reference's doc-adjacency.
- ``nested_filter``: fully vectorized — flatten the list column, run
  the inner predicate over the flat sub-doc struct array, reduce
  per-parent match counts with offset-difference sums; parents kept
  when matches >= min_matches. No per-row Python.

Scale: one shuffle keyed on the parent key; each block folds its own
complete key groups; the nested column never materializes on the
driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def nest(child_ds, parent_key: str, child_fields: list[str],
         nested_col: str = "children", num_blocks: int | None = None):
    """One row per parent: (parent_key, nested_col=list<struct>).

    Children are hash-routed by ``parent_key`` so every block holds
    complete groups, then each block folds columnar (sort + run-length
    offsets + ListArray over the struct of child fields)."""
    from raydex.shuffle import scoped_hash_shuffle

    with scoped_hash_shuffle(child_ds) as ncpu:
        nb = num_blocks or 2 * ncpu

        def fold(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table(
                    {
                        parent_key: pa.array([], t.schema.field(parent_key).type),
                        nested_col: pa.array(
                            [],
                            pa.list_(pa.struct(
                                [(f, t.schema.field(f).type) for f in child_fields]
                            )),
                        ),
                    }
                )
            t = t.sort_by(parent_key)
            keys = t[parent_key].combine_chunks()
            kn = keys.to_numpy(zero_copy_only=False)
            starts = np.flatnonzero(np.r_[True, kn[1:] != kn[:-1]])
            offsets = np.r_[starts, t.num_rows].astype(np.int32)
            struct = pa.StructArray.from_arrays(
                [t[f].combine_chunks() for f in child_fields], child_fields
            )
            nested = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), struct)
            return pa.table(
                {parent_key: pc.take(keys, pa.array(starts.astype(np.int64))),
                 nested_col: nested}
            )

        return child_ds.repartition(num_blocks=nb, keys=[parent_key]).map_batches(
            fold, batch_format="pyarrow", batch_size=None
        )


def nested_filter(ds, nested_col: str, inner_pred, min_matches: int = 1):
    """Keep parents where >= min_matches sub-docs satisfy
    ``inner_pred(flat_struct_array) -> bool mask`` — the `nested` query:
    all inner conditions evaluated on the SAME sub-doc."""

    def f(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        col = t[nested_col].combine_chunks()
        flat = col.flatten()
        mask_flat = np.asarray(inner_pred(flat), dtype=np.int64)
        offs = np.asarray(col.offsets, dtype=np.int64)
        # per-parent match counts via offset-difference of the cumsum
        cs = np.r_[0, np.cumsum(mask_flat)]
        base = offs[0]
        matches = cs[offs[1:] - base] - cs[offs[:-1] - base]
        return t.filter(pa.array(matches >= min_matches))

    return ds.map_batches(f, batch_format="pyarrow")


def nested_count(ds, nested_col: str, inner_pred, min_matches: int = 1) -> int:
    """`_count` with a nested query."""
    return nested_filter(ds, nested_col, inner_pred, min_matches).count()


def nested_explode(ds, nested_col: str, fields: list[str],
                   parent_cols: list[str] | None = None):
    """Switch from parent context to NESTED context (the `nested`
    aggregation, ``es/search/aggregations/bucket/nested/
    NestedAggregationBuilder.java``): one row per sub-doc, vectorized
    (list_flatten + struct_field, parent columns repeated via
    list_parent_indices) — no per-row Python."""

    def f(t: pa.Table) -> pa.Table:
        col = t[nested_col].combine_chunks()
        flat = pc.list_flatten(col)
        cols = {fl: pc.struct_field(flat, fl) for fl in fields}
        for p in parent_cols or []:
            cols[p] = t[p].take(pc.list_parent_indices(col))
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow")


def nested_terms_agg(ds, nested_col: str, sub_field: str, size: int = 10,
                     count_name: str = "doc_count"):
    """`nested` > `terms` over a sub-doc field: explode, then the exact
    top-N terms agg (sub-doc counts, the reference's nested doc_count
    semantics)."""
    from raydex.ops.aggs import terms_agg

    return terms_agg(
        nested_explode(ds, nested_col, [sub_field]), sub_field,
        size=size, count_name=count_name,
    )


def reverse_nested_counts(ds, nested_col: str, sub_field: str,
                          parent_key: str, count_name: str = "n_parents"):
    """`nested` > `terms(sub_field)` > `reverse_nested` (``es/search/
    aggregations/bucket/nested/ReverseNestedAggregationBuilder.java``):
    per sub-field bucket, the number of distinct PARENT docs owning at
    least one sub-doc in the bucket. Map-side (bucket, parent) dedup
    inside each block before the one wide shuffle, then a distinct
    count — never materializes the pair set on the driver."""
    ex = nested_explode(ds, nested_col, [sub_field], parent_cols=[parent_key])

    def block_dedup(t: pa.Table) -> pa.Table:
        return t.group_by([sub_field, parent_key]).aggregate([])

    pairs = ex.map_batches(block_dedup, batch_format="pyarrow")
    # materialize the distinct-pair set between the two aggregates:
    # chained hash-aggregate pools each reserve aggregator CPUs and the
    # streaming executor keeps both alive — on a small cluster that
    # deadlocks. The barrier is cheap: pairs are bounded by
    # parents x buckets, far below the sub-doc count.
    agg = pairs.groupby([sub_field, parent_key]).count().materialize()
    out = agg.groupby(sub_field).count()

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns([sub_field, count_name]).set_column(
            1, count_name, t.column(1).cast(pa.int64())
        )

    return out.map_batches(rename, batch_format="pyarrow").sort(sub_field)
