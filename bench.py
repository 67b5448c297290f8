"""Benchmark driver: headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N, ...}

--scaling runs the headline extraction twice in fresh processes
(num_cpus=8 then 32) on the same input and reports both throughputs plus
the scaling efficiency (sandbox stand-in for the N vs 4N node criterion).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPEAT = int(os.environ.get("GRAFT_BENCH_REPEAT", "20"))


def _init_ray():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            log_to_driver=False,
        )


def _consume(ds) -> int:
    n = 0
    for batch in ds.iter_batches(batch_format="pyarrow", batch_size=4096):
        n += batch.num_rows
    return n


def repeated_pages(sf_dir: str, repeat: int):
    """Synthetic pages corpus scaled up ×repeat (doc_ids offset per copy) —
    enough work per core to measure scaling, still deterministic."""
    import pyarrow as pa
    import ray.data

    from go_htmldate_ray.sources.pages import count_documents, synthesize_pages_batch

    n_docs = count_documents(sf_dir)
    total = n_docs * repeat

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    copies = [ds] if repeat == 1 else [ds] + [
        ds.map_batches(
            lambda b, off=r * n_docs: b.set_column(
                b.schema.get_field_index("doc_id"),
                "doc_id",
                pa.compute.add(b.column("doc_id"), off),
            ),
            batch_format="pyarrow",
        )
        for r in range(1, repeat)
    ]
    full = copies[0].union(*copies[1:]) if len(copies) > 1 else copies[0]
    return full.map_batches(
        lambda b: synthesize_pages_batch(b, total),
        batch_format="pyarrow",
        batch_size=256,
    ), total


def bench_extract(sf_dir: str, skip_extensive: bool, repeat: int) -> tuple[float, int]:
    from go_htmldate_ray.stages.extract_stage import HtmldateExtractor

    pages, total = repeated_pages(sf_dir, repeat)
    t0 = time.perf_counter()
    extracted = pages.map_batches(
        HtmldateExtractor,
        fn_constructor_kwargs={
            "use_original_date": True,
            "skip_extensive_search": skip_extensive,
        },
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(2, NUM_CPUS),
        num_cpus=1,
    ).select_columns(["doc_id", "date_str"])
    n = _consume(extracted)
    return time.perf_counter() - t0, n


def bench_golden_corpus() -> tuple[float, int]:
    """Real-page throughput: the reference's 1000-doc corpus ×3, fast mode —
    the direct comparison point against BASELINE.md's 1304 docs/s."""
    import json as _json
    from pathlib import Path

    import ray.data

    from go_htmldate_ray.stages.extract_stage import HtmldateExtractor

    data = Path(__file__).parent / "tests" / "data" / "comparison_corpus.json"
    entries = _json.loads(data.read_text())
    dirs = [Path("/root/reference/test-files") / d for d in ("mediacloud", "comparison", "mock")]
    items = []
    for rep in range(3):
        for e in entries:
            for d in dirs:
                p = d / e["file"]
                if p.exists():
                    items.append({"url": e["url"], "path": str(p)})
                    break
    ds = ray.data.from_items(items)

    def load(batch):
        import pyarrow as pa

        htmls = [open(p, "rb").read() for p in batch.column("path").to_pylist()]
        return pa.table({"url": batch.column("url"), "html": pa.array(htmls, pa.binary())})

    t0 = time.perf_counter()
    extracted = ds.map_batches(load, batch_format="pyarrow", batch_size=32).map_batches(
        HtmldateExtractor,
        fn_constructor_kwargs={"use_original_date": True, "skip_extensive_search": True},
        batch_format="pyarrow",
        batch_size=32,
        concurrency=(2, NUM_CPUS),
        num_cpus=1,
    ).select_columns(["url", "date_str"])
    n = _consume(extracted)
    return time.perf_counter() - t0, n


def bench_query(fn) -> float:
    t0 = time.perf_counter()
    _consume(fn(SF_DIR))
    return time.perf_counter() - t0


def run_headline() -> dict:
    _init_ray()
    queries: dict[str, float] = {}
    extra: dict[str, float] = {}

    t, n = bench_extract(SF_DIR, skip_extensive=True, repeat=REPEAT)
    queries["extract_fast"] = round(t, 3)
    extra["extract_fast_pages_per_s"] = round(n / t, 1)

    t, n = bench_extract(SF_DIR, skip_extensive=False, repeat=max(1, REPEAT // 4))
    queries["extract_extensive"] = round(t, 3)
    extra["extract_extensive_pages_per_s"] = round(n / t, 1)

    t, n = bench_golden_corpus()
    queries["golden_corpus_fast"] = round(t, 3)
    extra["golden_corpus_docs_per_s"] = round(n / t, 1)

    from go_htmldate_ray.pipelines import analytics
    from go_htmldate_ray.stages import dedup, similarity

    import ray.data

    queries["dedup_exact"] = round(
        bench_query(lambda sf: dedup.exact_dedup(ray.data.read_parquet(f"{sf}/documents.parquet"))), 3
    )
    queries["minhash_lsh"] = round(
        bench_query(lambda sf: dedup.minhash_lsh_pairs(ray.data.read_parquet(f"{sf}/documents.parquet"))), 3
    )
    queries["ann_topk"] = round(
        bench_query(
            lambda sf: similarity.brute_force_topk(
                ray.data.read_parquet(f"{sf}/embeddings.parquet"), list(range(8)), 5
            )
        ),
        3,
    )
    queries["pricing_summary"] = round(bench_query(analytics.pricing_summary), 3)
    queries["events_by_type"] = round(bench_query(analytics.events_by_type), 3)

    return {
        "metric": "pages date-extracted per second (synthetic CC-style corpus, fast mode)",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        **extra,
    }


def run_scaling() -> dict:
    """Same extraction job at num_cpus=8 and 32 in fresh processes."""
    results = {}
    for cpus in (8, 32):
        env = dict(os.environ)
        env["RAY_GRAFT_CPUS"] = str(cpus)
        env["GRAFT_SF_DIR"] = SF_DIR
        out = subprocess.run(
            [sys.executable, __file__, "--extract-only"],
            env=env,
            capture_output=True,
            text=True,
            timeout=1800,
        )
        line = out.stdout.strip().splitlines()[-1]
        results[cpus] = json.loads(line)
    tp8 = results[8]["pages_per_s"]
    tp32 = results[32]["pages_per_s"]
    efficiency = (tp32 / tp8) / (32 / 8)
    return {
        "metric": "scaling efficiency, extraction throughput 8→32 cpus",
        "value": round(efficiency, 3),
        "unit": "efficiency",
        "pages_per_s_8cpus": tp8,
        "pages_per_s_32cpus": tp32,
        "sf": SF_DIR,
    }


def run_extract_only() -> dict:
    _init_ray()
    t, n = bench_extract(SF_DIR, skip_extensive=True, repeat=REPEAT)
    return {"sec": round(t, 3), "pages": n, "pages_per_s": round(n / t, 1), "num_cpus": NUM_CPUS}


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        result = run_scaling()
    elif "--extract-only" in sys.argv:
        result = run_extract_only()
    else:
        result = run_headline()
    print(json.dumps(result))
    import ray

    if ray.is_initialized():
        ray.shutdown()
