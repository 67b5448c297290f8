"""End-to-end corpus curation: quality-filter, exact- and semantically
dedup, then export training-ready shards — the composition a pipeline
user actually runs, stitched from the engine's own operators.

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


from go_htmldate_ray.sources.io import read_parquet_clean
from go_htmldate_ray.sources.sink import write_jsonl_shards
from go_htmldate_ray.stages.dedup import exact_dedup
from go_htmldate_ray.stages.similarity import semdedup
from go_htmldate_ray.stages.text_stage import gopher_quality_batch

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curated_corpus"

docs = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
emb = read_parquet_clean(f"{sf_dir}/embeddings.parquet")

# 1. quality: Gopher rule keep flags (stateless batch map) — the word
# minimum is scaled down to the short synthetic fixture texts; real
# corpora use the paper defaults
quality_keep = {
    r["doc_id"]
    for r in docs.map_batches(
        gopher_quality_batch,
        fn_kwargs={"min_words": 15, "min_stopword_hits": 1},
        batch_format="pyarrow",
    )
    .filter(lambda r: r["passes"] == 1)
    .select_columns(["doc_id"])
    .take_all()
}

# 2. exact dedup: representative (min doc_id) per distinct text
exact_keep = {r["doc_id"] for r in exact_dedup(docs).take_all()}

# 3. semantic dedup: SemDeDup keep flags over the embedding space
sem_keep = {
    r["vec_id"]
    for r in semdedup(emb, n_clusters=8, threshold=0.5).take_all()
    if r["keep"] == 1
}

keep = quality_keep & exact_keep & sem_keep
print(
    f"quality {len(quality_keep)} ∩ exact-dedup {len(exact_keep)} "
    f"∩ semdedup {len(sem_keep)} → {len(keep)} docs kept"
)

# 4. export: byte-deterministic resumable jsonl.gz shards
keep_ref = ray.put(frozenset(keep))


def keep_filter(batch):
    import pyarrow as pa

    ks = ray.get(keep_ref)
    mask = pa.array([i in ks for i in batch.column("doc_id").to_pylist()])
    return batch.filter(mask)


report = write_jsonl_shards(
    docs.map_batches(keep_filter, batch_format="pyarrow"), out_dir, n_shards=8
)
print("export:", report)
ray.shutdown()
