"""End-to-end corpus curation: the funnel a training-data run actually
executes — quality rules, language ID, and near-duplicate removal
composed over one corpus read, reported per predicted language.

Scale shape (the whole point of the composition):

- The Gopher quality rules and the stopword language ID are *stateless*
  kernels, so both run in ONE ``map_batches`` pass over the pruned
  (doc_id, text) read — the corpus text is scanned exactly once here and
  once inside the MinHash signature stage; everything downstream carries
  light int64/flag rows.
- ``near_dup_keep`` contributes its (doc_id, keep) flags via the
  MinHash → LSH band → verify → connected-components path (see
  stages/dedup.py for that pipeline's own shuffle budget).
- One bucketed ``hash_join`` on doc_id attaches keep to the signal rows
  (unique key on both sides: no cartesian amplification), then per-batch
  per-language partial sums feed a tiny ``Sum`` groupby — the final
  shuffle moves ≤ n_languages × n_blocks rows.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..sources.io import read_parquet_clean
from ..stages import text_stage
from ..stages.dedup import near_dup_keep
from ..stages.joins import hash_join


def curated_corpus_stats(
    sf_dir: str,
    *,
    min_words: int = 30,
    max_words: int = 80,
    min_stopword_hits: int = 1,
    hot_buckets: str = "sample",
):
    """documents → (pred_lang, n_docs, n_kept, kept_tokens).

    A document is *kept* when it passes the Gopher quality rules AND is
    its near-dup cluster's representative (or a singleton); kept_tokens
    sums the whitespace word counts of kept docs.  Quality thresholds
    default to the fixture-calibrated values the ``gopher_quality``
    query uses so both outcomes occur at every scale factor.
    """
    from ray.data.aggregate import Sum

    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def signals(batch: pa.Table) -> pa.Table:
        q = text_stage.gopher_quality_batch(
            batch,
            min_words=min_words,
            max_words=max_words,
            min_stopword_hits=min_stopword_hits,
        )
        lang = text_stage.lang_id_batch(batch)
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "pred_lang": lang.column("pred_lang"),
                "n_words": q.column("n_words").cast(pa.int64()),
                "passes": q.column("passes").cast(pa.int64()),
            }
        )

    sig = docs.map_batches(signals, batch_format="pyarrow")
    keep = near_dup_keep(docs, hot_buckets=hot_buckets)
    joined = hash_join(sig, keep, on="doc_id")

    def partial(batch: pa.Table) -> pa.Table:
        kept = pc.and_(
            pc.equal(batch.column("passes"), 1), pc.equal(batch.column("keep"), 1)
        )
        kept_i = pc.cast(kept, pa.int64())
        t = pa.table(
            {
                "pred_lang": batch.column("pred_lang"),
                "one": pa.array([1] * batch.num_rows, pa.int64()),
                "kept": kept_i,
                "kept_tok": pc.multiply(batch.column("n_words"), kept_i),
            }
        )
        g = t.group_by("pred_lang").aggregate(
            [("one", "sum"), ("kept", "sum"), ("kept_tok", "sum")]
        )
        return pa.table(
            {
                "pred_lang": g.column("pred_lang"),
                "n": g.column("one_sum").cast(pa.int64()),
                "k": g.column("kept_sum").cast(pa.int64()),
                "kt": g.column("kept_tok_sum").cast(pa.int64()),
            }
        )

    return (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("pred_lang")
        .aggregate(Sum("n"), Sum("k"), Sum("kt"))
        .map_batches(
            lambda b: pa.table(
                {
                    "pred_lang": b.column("pred_lang"),
                    "n_docs": b.column("sum(n)").cast(pa.int64()),
                    "n_kept": b.column("sum(k)").cast(pa.int64()),
                    "kept_tokens": b.column("sum(kt)").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )


def curate_to_jsonl(
    sf_dir: str,
    out_dir: str,
    *,
    min_words: int = 15,
    sem_threshold: float = 0.5,
    n_shards: int = 8,
    n_clusters: int = 8,
):
    """The full curation funnel as one callable (the CLI ``curate``
    command and ``examples/curate_corpus.py`` both run this): Gopher
    quality rules ∩ exact-dedup representatives ∩ SemDeDup keep set →
    byte-deterministic resumable jsonl.gz shards.

    The three keep sets are materialized as driver-side id sets — small
    sides by semantics (ids only, 8 bytes/doc); at corpus scale each
    intersection becomes the bucketed anti/semi-join the dedup stages
    already provide, keeping the same result.  Returns the sink report
    plus the per-stage keep counts.
    """
    from ..sources.sink import write_jsonl_shards
    from ..stages.dedup import exact_dedup
    from ..stages.similarity import semdedup
    from ..stages.text_stage import gopher_quality_batch

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    emb = read_parquet_clean(f"{sf_dir}/embeddings.parquet")

    quality_keep = {
        r["doc_id"]
        for r in docs.map_batches(
            gopher_quality_batch,
            fn_kwargs={"min_words": min_words, "min_stopword_hits": 1},
            batch_format="pyarrow",
        )
        .map_batches(
            lambda b: b.filter(pc.equal(b.column("passes"), 1)),
            batch_format="pyarrow",
        )
        .select_columns(["doc_id"])
        .take_all()
    }
    exact_keep = {r["doc_id"] for r in exact_dedup(docs).take_all()}
    sem_keep = {
        r["vec_id"]
        for r in semdedup(emb, n_clusters=n_clusters, threshold=sem_threshold).take_all()
        if r["keep"] == 1
    }
    keep = quality_keep & exact_keep & sem_keep

    keep_arr = pa.array(sorted(keep), pa.int64())

    def keep_filter(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.is_in(batch.column("doc_id"), value_set=keep_arr)
        )

    report = write_jsonl_shards(
        docs.map_batches(keep_filter, batch_format="pyarrow"),
        out_dir,
        n_shards=n_shards,
    )
    report["n_quality"] = len(quality_keep)
    report["n_exact"] = len(exact_keep)
    report["n_semdedup"] = len(sem_keep)
    report["n_kept"] = len(keep)
    return report
