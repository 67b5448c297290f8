"""Resumable partitioned Parquet sink.

Output is one directory per shard (``shard=<k>/part.parquet`` with a
``_SUCCESS`` marker), never one giant file, so a failed 100 TB run
restarts by skipping finished shards (SURVEY.md §4.2 checkpoint/resume
row).  Sharding key is ``hash_column % n_shards`` — the same partitioning
key the frontier uses, so crawl output and frontier state co-locate.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def write_partitioned(
    ds,
    out_dir: str,
    *,
    shard_column: str = "doc_id",
    n_shards: int = 16,
    resume: bool = True,
) -> dict:
    """Write a Dataset to ``out_dir/shard=<k>/`` partitions.

    With ``resume=True``, shards whose ``_SUCCESS`` marker exists are
    skipped (their rows are filtered out at the map stage, so the input
    stream is still pruned early, not post-hoc)."""
    os.makedirs(out_dir, exist_ok=True)
    done = {
        k
        for k in range(n_shards)
        if resume
        and os.path.exists(os.path.join(out_dir, f"shard={k}", "_SUCCESS"))
    }

    def assign_shard(batch: pa.Table) -> pa.Table:
        import numpy as np

        vals = batch.column(shard_column).to_numpy(zero_copy_only=False)
        shard = pa.array(np.abs(vals.astype(np.int64)) % n_shards, pa.int64())
        batch = batch.append_column("__shard", shard)
        if done:
            keep = pc.invert(pc.is_in(shard, value_set=pa.array(sorted(done), pa.int64())))
            batch = batch.filter(keep)
        return batch

    sharded = ds.map_batches(assign_shard, batch_format="pyarrow")

    # Group rows per shard and write each partition file + marker.
    def write_shard(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({"shard": pa.array([], pa.int64()), "rows": pa.array([], pa.int64())})
        k = group.column("__shard")[0].as_py()
        shard_dir = os.path.join(out_dir, f"shard={k}")
        os.makedirs(shard_dir, exist_ok=True)
        tmp = os.path.join(shard_dir, "part.parquet.tmp")
        final = os.path.join(shard_dir, "part.parquet")
        pq.write_table(group.drop_columns(["__shard"]), tmp)
        os.replace(tmp, final)
        open(os.path.join(shard_dir, "_SUCCESS"), "w").close()
        return pa.table({"shard": pa.array([k], pa.int64()), "rows": pa.array([group.num_rows], pa.int64())})

    report = sharded.groupby("__shard").map_groups(write_shard, batch_format="pyarrow")
    rows_written = 0
    shards_written = []
    for row in report.take_all():
        shards_written.append(row["shard"])
        rows_written += row["rows"]
    return {
        "rows_written": rows_written,
        "shards_written": sorted(shards_written),
        "shards_skipped": sorted(done),
        "out_dir": out_dir,
    }


def read_partitioned(out_dir: str):
    import glob

    import ray.data

    files = sorted(glob.glob(os.path.join(out_dir, "shard=*", "part.parquet")))
    return ray.data.read_parquet(files)
