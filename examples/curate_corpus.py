"""End-to-end corpus curation: quality-filter, exact- and semantically
dedup, then export training-ready shards — the composition a pipeline
user actually runs, as one library call (the CLI ``curate`` command
wraps the same function):

    documents ─ gopher quality rules ─┐
                                      ├─ keep-set intersection ─ jsonl.gz shards
    documents ─ exact dedup (keep first)
    embeddings ─ SemDeDup keep flags ─┘

Usage: python examples/curate_corpus.py [sf_dir] [out_dir]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import ray

if not ray.is_initialized():
    ray.init(
        address="local",
        num_cpus=8,
        include_dashboard=False,
        # workers need the repo on their path too — the sys.path shim
        # above only patches the driver process
        runtime_env={
            "env_vars": {"PYTHONPATH": str(Path(__file__).resolve().parent.parent)}
        },
    )

from go_htmldate_ray.pipelines.curation import curate_to_jsonl

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curated_corpus"

report = curate_to_jsonl(sf_dir, out_dir)
print(
    f"quality {report['n_quality']} ∩ exact-dedup {report['n_exact']} "
    f"∩ semdedup {report['n_semdedup']} → {report['n_kept']} docs kept"
)
print("export:", report)
ray.shutdown()
