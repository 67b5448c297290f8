"""Data selection via importance resampling (DSIR, Xie et al. 2023,
arXiv:2302.03169): score every document by how much more likely its
hashed-unigram features are under a *target* distribution than under the
raw corpus, then keep the top-weighted documents.

The published recipe, re-expressed Ray-Data-first in two streaming
passes over the corpus (never materializing it):

1. **Feature-count pass** — one ``map_batches`` emits per-batch partial
   (bucket, raw-count, target-count) rows for the ≤ ``n_buckets``
   hashed-unigram features, then ONE tiny keyed ``Sum`` groupby; the
   driver receives ≤ ``n_buckets`` light rows (the only
   materialization).
2. **Scoring pass** — the per-bucket log-likelihood-ratio table (an
   int64 array, ``ray.put`` once, read zero-copy in every task) scores
   each document as the integer sum of its tokens' bucket weights.

Exactness contract (shared with :mod:`.search`): per-bucket log ratios
are rounded to integer **nanos** (``floor(x·1e9 + 0.5)``, ``math.log``
is bit-identical to DuckDB's ``ln``) before the per-document sum, so
document weights are exact integers — immune to float summation order —
and the SQL oracle reproduces them bit-for-bit.  Laplace (+1) smoothing
over ``n_buckets`` possible features keeps every ratio finite.

Documents with no tokens have no feature evidence and are omitted (the
SQL side drops them in the same place: unnest of an empty token array).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_NANO = 1e9


def _token_buckets(flat: pa.Array, n_buckets: int) -> np.ndarray:
    """Bucket id per token.  The per-worker md5 memo makes a direct map
    faster than np.unique + inverse (an object-array unique pays a
    Python string-compare sort; the Zipfian head is all cache hits)."""
    from .cleaning import _hash63_cached

    toks = flat.to_pylist()
    if not toks:
        return np.zeros(0, dtype=np.int64)
    return np.fromiter(
        (_hash63_cached(t) % n_buckets for t in toks),
        dtype=np.int64,
        count=len(toks),
    )


def _bucket_weights(
    ds,
    *,
    target_col: str,
    target_value: str,
    n_buckets: int,
) -> np.ndarray:
    """Feature-count pass → int64 nano log-ratio weight per bucket."""
    from ray.data.aggregate import Sum

    def partial_counts(batch: pa.Table) -> pa.Table:
        toks = pc.utf8_split_whitespace(batch.column("text").combine_chunks())
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks)
        is_tgt = pc.take(
            pc.equal(batch.column(target_col).combine_chunks(), target_value),
            parents,
        )
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        tgt = np.asarray(is_tgt.filter(keep).fill_null(False))
        bids = _token_buckets(flat, n_buckets)
        craw = np.bincount(bids, minlength=n_buckets)
        ctgt = np.bincount(bids[tgt], minlength=n_buckets)
        nz = np.nonzero(craw)[0]
        return pa.table(
            {
                "bkt": pa.array(nz, pa.int64()),
                "craw": pa.array(craw[nz], pa.int64()),
                "ctgt": pa.array(ctgt[nz], pa.int64()),
            }
        )

    rows = (
        ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("bkt")
        .aggregate(Sum("craw"), Sum("ctgt"))
        .take_all()  # bounded: <= n_buckets light rows
    )
    craw = np.zeros(n_buckets, dtype=np.int64)
    ctgt = np.zeros(n_buckets, dtype=np.int64)
    for r in rows:
        craw[r["bkt"]] = r["sum(craw)"]
        ctgt[r["bkt"]] = r["sum(ctgt)"]
    t_raw = int(craw.sum())
    t_tgt = int(ctgt.sum())
    wn = np.zeros(n_buckets, dtype=np.int64)
    for b in np.nonzero(craw)[0]:
        x = math.log((int(ctgt[b]) + 1) / (t_tgt + n_buckets)) - math.log(
            (int(craw[b]) + 1) / (t_raw + n_buckets)
        )
        wn[b] = int(math.floor(x * _NANO + 0.5))
    return wn


def dsir_weights(
    ds,
    *,
    target_col: str = "lang",
    target_value: str = "en",
    n_buckets: int = 4096,
):
    """documents → (doc_id, weight_nano): per-document DSIR importance
    weight (nano fixed-point log-likelihood ratio of target vs raw
    hashed-unigram models).  Higher = more target-like."""
    import ray

    wn_ref = ray.put(_bucket_weights(
        ds, target_col=target_col, target_value=target_value,
        n_buckets=n_buckets,
    ))

    def score(batch: pa.Table) -> pa.Table:
        wn = ray.get(wn_ref)  # zero-copy int64 array from plasma
        toks = pc.utf8_split_whitespace(batch.column("text").combine_chunks())
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        par = np.asarray(parents.filter(keep), dtype=np.int64)
        bids = _token_buckets(flat, n_buckets)
        n = len(batch)
        sums = np.zeros(n, dtype=np.int64)
        np.add.at(sums, par, wn[bids])
        has_tok = np.bincount(par, minlength=n) > 0
        ids = np.asarray(
            batch.column("doc_id").combine_chunks().cast(pa.int64())
        )
        return pa.table(
            {
                "doc_id": pa.array(ids[has_tok], pa.int64()),
                "weight_nano": pa.array(sums[has_tok], pa.int64()),
            }
        )

    return ds.select_columns(["doc_id", "text", target_col]).map_batches(
        score, batch_format="pyarrow"
    )


def dsir_select(
    ds,
    *,
    k: int = 50,
    target_col: str = "lang",
    target_value: str = "en",
    n_buckets: int = 4096,
):
    """The resampling half: the ``k`` most target-like documents by
    (weight desc, doc_id asc) — a total order, so the cut is exact.
    ``sort + limit`` moves only light (doc_id, weight) rows."""
    return (
        dsir_weights(
            ds,
            target_col=target_col,
            target_value=target_value,
            n_buckets=n_buckets,
        )
        .sort(key=["weight_nano", "doc_id"], descending=[True, False])
        .limit(k)
    )


# --- hashed linear (fastText-style) quality classifier -----------------------
# Batched model inference with a broadcast weight table: the shape of
# every "score each document with a small model" stage (fastText quality
# filters, logistic spam scorers).  The model here is a deterministic
# int64 weight per hash bucket so the inference is integer-exact and the
# SQL oracle regenerates the weights from the same md5 formula; swapping
# in trained weights is a one-array change.
def classifier_weight_table(n_buckets: int = 4096) -> np.ndarray:
    """w[i] = (md5_int63(f"w:{i}") % 17) - 8 — int64 weights in [-8, 8]."""
    from .cleaning import _hash63

    return np.fromiter(
        ((_hash63(f"w:{i}") % 17) - 8 for i in range(n_buckets)),
        dtype=np.int64,
        count=n_buckets,
    )


# per-process broadcast cache (same discipline as cleaning._cached_blocklist:
# resolve the ref once per worker, never per batch)
_W_CACHE: dict[str, np.ndarray] = {}


def _cached_weights(ref) -> np.ndarray:
    import ray

    key = ref.hex()
    got = _W_CACHE.get(key)
    if got is None:
        _W_CACHE.clear()
        got = _W_CACHE[key] = ray.get(ref)
    return got


def _doc_feature_buckets(
    texts: list[str], n_buckets: int
) -> tuple[np.ndarray, np.ndarray]:
    """(doc_idx, bucket) per feature — hashed lowercase unigrams plus
    adjacent-pair bigrams ("tok tok"), the classic fastText feature set."""
    from .cleaning import _hash63_cached

    doc_idx, buckets = [], []
    for d, t in enumerate(texts):
        toks = (t or "").lower().split()
        feats = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        doc_idx.extend([d] * len(feats))
        buckets.extend(_hash63_cached(f) % n_buckets for f in feats)
    return (
        np.asarray(doc_idx, dtype=np.int64),
        np.asarray(buckets, dtype=np.int64),
    )


def hashed_classifier(ds, *, n_buckets: int = 4096):
    """documents → (doc_id, n_features, logit, pred) — linear model
    inference over hashed unigram+bigram features.

    The weight table ships once via ``ray.put`` and is resolved once per
    worker process; per batch the score is one np.take + bincount (sums
    of |w| ≤ 8 · n_features stay far below 2^53, so the float64 bincount
    accumulator is exact and the int64 cast is lossless).  Empty docs
    score logit 0 → pred 1 (the margin-0 convention, mirrored in SQL).
    """
    import ray

    w_ref = ray.put(classifier_weight_table(n_buckets))

    def score(batch: pa.Table) -> pa.Table:
        w = _cached_weights(w_ref)
        texts = batch.column("text").to_pylist()
        n_docs = len(texts)
        doc_idx, buckets = _doc_feature_buckets(texts, n_buckets)
        n_feat = np.bincount(doc_idx, minlength=n_docs).astype(np.int64)
        logit = np.bincount(
            doc_idx, weights=w[buckets], minlength=n_docs
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_features": pa.array(n_feat, pa.int64()),
                "logit": pa.array(logit, pa.int64()),
                "pred": pa.array((logit >= 0).astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def ccnet_buckets(ds):
    """CCNet's head/middle/tail split (arXiv:1911.00359 §4.3): documents
    bucketed by per-bigram LM score terciles — head = best (lowest
    perplexity) third, the slice CCNet keeps by default.

    Composition of two verified operators: :func:`~go_htmldate_ray.
    stages.lm.charlm_nll` scores each doc (exact integer nanos;
    ``v = nll_nano // n_bigrams`` keeps the order key integral), the
    exact-quantile operator finds the 1/3 and 2/3 thresholds
    (percentile_disc semantics), and a broadcast-scalar batch map
    assigns buckets.  The scored (doc_id, v) table is materialized once
    — two int64 columns — so the model pass runs once, not twice."""
    from .lm import charlm_nll
    from .quantiles import exact_quantiles

    scored = charlm_nll(ds)

    def add_v(batch: pa.Table) -> pa.Table:
        import numpy as np

        nll = np.asarray(batch.column("nll_nano"), dtype=np.int64)
        n = np.maximum(np.asarray(batch.column("n_bigrams"), dtype=np.int64), 1)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "v": pa.array(nll // n, pa.int64()),
            }
        )

    light = scored.map_batches(add_v, batch_format="pyarrow").materialize()
    qdf = exact_quantiles(light, "v", [1 / 3, 2 / 3])
    t1, t2 = sorted(int(v) for v in qdf["value"])

    def bucket(batch: pa.Table) -> pa.Table:
        v = batch.column("v")
        b = pc.if_else(
            pc.less_equal(v, t1),
            pa.scalar("head"),
            pc.if_else(pc.less_equal(v, t2), pa.scalar("middle"), pa.scalar("tail")),
        )
        return pa.table({"doc_id": batch.column("doc_id"), "bucket": b})

    return light.map_batches(bucket, batch_format="pyarrow")
