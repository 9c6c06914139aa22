"""Reindex / update_by_query / delete_by_query — the reference's
ES-as-a-dataflow (``modules/reindex/.../Reindexer.java``, SURVEY.md
§3.3) expressed directly as a Ray Data pipeline:

    read (scroll analogue = streaming blocks)
      -> optional predicate (delete_by_query = inverted filter)
      -> optional script transform (update_by_query / reindex script)
      -> write_parquet dest (bulk-write analogue)

Slicing (``BulkByScrollParallelizationHelper``: slice =
floorMod(hash(_id), slices)) maps to Ray block parallelism for free; an
explicit ``slices``/``slice_id`` filter is still provided for
partial/resumable reindex runs. Throttling (RethrottleAction) maps to
``max_rows_per_second`` (driver-side pacing of block consumption).
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa

from raydex.partition import murmur3_hash_many


def reindex(
    ds,
    dest_dir: str | None = None,
    transform=None,
    predicate=None,
    delete_predicate=None,
    id_col: str | None = None,
    slices: int = 0,
    slice_id: int = 0,
    max_rows_per_second: float = 0.0,
):
    """Returns the transformed Dataset; writes parquet when ``dest_dir``.

    - ``predicate(table) -> bool mask``: keep rows (the reindex query)
    - ``delete_predicate``: drop rows (delete_by_query)
    - ``transform(table) -> table``: the script (update_by_query)
    - ``slices/slice_id``: process only rows with
      floorMod(murmur3(id), slices) == slice_id
    """

    def stage(t: pa.Table) -> pa.Table:
        if slices > 1 and id_col is not None:
            h = murmur3_hash_many([str(v) for v in t[id_col].to_pylist()])
            t = t.filter(pa.array((h.astype(np.int64) % slices) == slice_id))
        if predicate is not None:
            t = t.filter(pa.array(np.asarray(predicate(t), dtype=bool)))
        if delete_predicate is not None:
            t = t.filter(pa.array(~np.asarray(delete_predicate(t), dtype=bool)))
        if transform is not None:
            t = transform(t)
        return t

    out = ds.map_batches(stage, batch_format="pyarrow")
    if dest_dir is None:
        return out
    if max_rows_per_second > 0:
        # throttled consumption: pace block iteration on the driver
        import pyarrow.parquet as pq
        import os

        os.makedirs(dest_dir, exist_ok=True)
        written = 0
        t0 = time.perf_counter()
        for i, b in enumerate(out.iter_batches(batch_format="pyarrow", batch_size=8192)):
            tbl = pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
            pq.write_table(tbl, f"{dest_dir}/part-{i:05d}.parquet")
            written += tbl.num_rows
            budget = written / max_rows_per_second
            elapsed = time.perf_counter() - t0
            if budget > elapsed:
                time.sleep(budget - elapsed)
        return out
    out.write_parquet(dest_dir)
    return out
