"""Resumable partitioned sinks (Parquet + gzip'd JSONL).

Output is one directory per shard (``shard=<k>/part.<ext>`` with a
``_SUCCESS`` marker), never one giant file, so a failed 100 TB run
restarts by skipping finished shards (SURVEY.md §4.2 checkpoint/resume
row).  Sharding key is ``hash_column % n_shards`` — the same partitioning
key the frontier uses, so crawl output and frontier state co-locate.

``write_partitioned`` emits Parquet (the engine's native interchange);
``write_jsonl_shards`` emits byte-deterministic ``part.jsonl.gz`` files
(sorted keys, gzip mtime=0) — the layout LLM training loaders consume,
reproducible across reruns so shards can be content-addressed.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def _sharded_write(
    ds,
    out_dir: str,
    *,
    shard_column: str,
    n_shards: int,
    resume: bool,
    write_group,
) -> dict:
    """Shared sharded-sink core: assign ``__shard``, prune finished
    shards at the map stage (the input stream is cut early, not
    post-hoc), group per shard, call ``write_group(table, shard_dir)``
    to emit the partition file, then stamp ``_SUCCESS``."""
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
            keep = pc.invert(
                pc.is_in(shard, value_set=pa.array(sorted(done), pa.int64()))
            )
            batch = batch.filter(keep)
        return batch

    sharded = ds.map_batches(assign_shard, batch_format="pyarrow")

    def write_shard(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table(
                {"shard": pa.array([], pa.int64()), "rows": pa.array([], pa.int64())}
            )
        k = group.column("__shard")[0].as_py()
        shard_dir = os.path.join(out_dir, f"shard={k}")
        os.makedirs(shard_dir, exist_ok=True)
        write_group(group.drop_columns(["__shard"]), shard_dir)
        open(os.path.join(shard_dir, "_SUCCESS"), "w").close()
        return pa.table(
            {
                "shard": pa.array([k], pa.int64()),
                "rows": pa.array([group.num_rows], pa.int64()),
            }
        )

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


def write_partitioned(
    ds,
    out_dir: str,
    *,
    shard_column: str = "doc_id",
    n_shards: int = 16,
    resume: bool = True,
) -> dict:
    """Write a Dataset to ``out_dir/shard=<k>/part.parquet`` partitions.

    With ``resume=True``, shards whose ``_SUCCESS`` marker exists are
    skipped (their rows are filtered out at the map stage, so the input
    stream is still pruned early, not post-hoc)."""

    def write_group(group: pa.Table, shard_dir: str) -> None:
        tmp = os.path.join(shard_dir, "part.parquet.tmp")
        pq.write_table(group, tmp)
        os.replace(tmp, os.path.join(shard_dir, "part.parquet"))

    return _sharded_write(
        ds,
        out_dir,
        shard_column=shard_column,
        n_shards=n_shards,
        resume=resume,
        write_group=write_group,
    )


def write_jsonl_shards(
    ds,
    out_dir: str,
    *,
    shard_column: str = "doc_id",
    n_shards: int = 16,
    resume: bool = True,
    sort_within_shard: bool = True,
) -> dict:
    """Training-export sink: ``out_dir/shard=<k>/part.jsonl.gz`` with the
    same resumable ``_SUCCESS`` contract as :func:`write_partitioned`.

    Bytes are deterministic: rows sorted by the shard column within each
    shard (group arrival order is executor-dependent), JSON keys sorted,
    gzip header mtime pinned to 0 — two runs over the same data produce
    identical files, so shards can be content-addressed/diffed."""
    import gzip
    import json

    def write_group(group: pa.Table, shard_dir: str) -> None:
        if sort_within_shard:
            # total order over EVERY column: group arrival order is
            # executor-dependent, and a non-unique shard column alone
            # would leave tied rows in arrival order, breaking the
            # byte-determinism contract (full-duplicate rows are the
            # only ties left, and those are byte-identical anyway)
            group = group.sort_by([(c, "ascending") for c in group.column_names])
        tmp = os.path.join(shard_dir, "part.jsonl.gz.tmp")
        with open(tmp, "wb") as raw, gzip.GzipFile(
            filename="", mode="wb", fileobj=raw, mtime=0
        ) as gz:
            for row in group.to_pylist():
                gz.write(
                    (json.dumps(row, sort_keys=True, ensure_ascii=False) + "\n").encode(
                        "utf-8"
                    )
                )
        os.replace(tmp, os.path.join(shard_dir, "part.jsonl.gz"))

    return _sharded_write(
        ds,
        out_dir,
        shard_column=shard_column,
        n_shards=n_shards,
        resume=resume,
        write_group=write_group,
    )


def read_partitioned(out_dir: str):
    import glob

    import ray.data

    files = sorted(glob.glob(os.path.join(out_dir, "shard=*", "part.parquet")))
    return ray.data.read_parquet(files)


def read_jsonl_shards(out_dir: str):
    """Round-trip reader for :func:`write_jsonl_shards` output (gzip
    detected by extension via Arrow's JSON reader)."""
    import glob

    import ray.data

    files = sorted(glob.glob(os.path.join(out_dir, "shard=*", "part.jsonl.gz")))
    # partitioning=None: the shard=<k> path segment is a resume marker,
    # not a hive partition column — don't let the reader re-infer it
    return ray.data.read_json(files, partitioning=None)
