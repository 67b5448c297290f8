"""Cluster job entrypoint — the driver script SURVEY §3.2 promises for
``ray job submit``.

On a real cluster:

    ray job submit --working-dir . -- \
        python tools/job_entry.py --pipeline extract \
            --sf-dir /mnt/data/sf100 --out /mnt/out/run1

In this sandbox the same script runs standalone (``address="local"``):
``ray.init(address="auto")`` inside a Ray job picks up the cluster; the
``--local-cpus`` fallback covers laptop/sandbox runs.  Output is
resumable partitioned parquet (``sources/sink.write_partitioned``:
``shard=K/`` directories with ``_SUCCESS`` markers, so a resubmitted
job skips finished partitions) plus one metrics JSON line on stdout —
the per-partition lineage + metrics contract of the north rule.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pipeline", choices=("extract", "crawl"), default="extract")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", required=True, help="output directory (parquet shards)")
    ap.add_argument("--n-shards", type=int, default=16)
    ap.add_argument("--no-resume", action="store_true",
                    help="rewrite finished shards instead of skipping them")
    ap.add_argument("--extensive", action="store_true",
                    help="extract: run the extensive-search cascade")
    ap.add_argument("--budget", type=int, default=4,
                    help="crawl: per-host politeness budget per wave")
    ap.add_argument("--local-cpus", type=int, default=8,
                    help="cpus for the standalone (non-cluster) fallback")
    args = ap.parse_args()

    import ray

    # Inside `ray job submit` the cluster address is in the environment;
    # standalone runs fall back to a local session.
    if not ray.is_initialized():
        try:
            ray.init(address="auto", include_dashboard=False,
                     log_to_driver=False)
        except ConnectionError:
            ray.init(address="local", num_cpus=args.local_cpus,
                     include_dashboard=False, log_to_driver=False)

    from go_htmldate_ray.sources.sink import write_partitioned

    t0 = time.perf_counter()
    metrics: dict = {"pipeline": args.pipeline, "sf_dir": args.sf_dir}

    if args.pipeline == "extract":
        from go_htmldate_ray.pipelines.extract_dates import extract_dates

        ds = extract_dates(
            args.sf_dir, skip_extensive_search=not args.extensive
        )
        sink = write_partitioned(
            ds, args.out, n_shards=args.n_shards, resume=not args.no_resume
        )
        metrics.update(sink)
    else:
        from go_htmldate_ray.pipelines.crawl import crawl

        ckpt = os.path.join(args.out, "checkpoint")
        visited, stats = crawl(
            args.sf_dir,
            politeness_budget=args.budget,
            checkpoint_dir=ckpt,
            resume=not args.no_resume and os.path.isdir(ckpt),
        )
        sink = write_partitioned(
            visited, os.path.join(args.out, "visited"),
            shard_column="url_hash" if "url_hash" in visited.schema().names
            else "doc_id",
            n_shards=args.n_shards, resume=False,
        )
        metrics.update(stats)
        metrics.update(sink)

    metrics["wall_s"] = round(time.perf_counter() - t0, 3)
    print(json.dumps(metrics))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
