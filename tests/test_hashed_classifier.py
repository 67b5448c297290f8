"""Unit tests for the hashed linear classifier (selection.hashed_classifier)."""

import numpy as np
import pyarrow as pa
import pytest

from go_htmldate_ray.stages.cleaning import _hash63
from go_htmldate_ray.stages.selection import (
    _doc_feature_buckets,
    classifier_weight_table,
    hashed_classifier,
)


def test_weight_table_deterministic_and_bounded():
    w = classifier_weight_table(256)
    w2 = classifier_weight_table(256)
    assert np.array_equal(w, w2)
    assert w.min() >= -8 and w.max() <= 8
    assert w[7] == (_hash63("w:7") % 17) - 8


def test_feature_buckets_unigrams_plus_bigrams():
    doc_idx, bkts = _doc_feature_buckets(["A b c", ""], 4096)
    # 3 unigrams + 2 bigrams, lowercased; empty doc contributes nothing
    assert doc_idx.tolist() == [0] * 5
    expect = [
        _hash63(f) % 4096 for f in ["a", "b", "c", "a b", "b c"]
    ]
    assert bkts.tolist() == expect


def _scalar_score(text, w, n_buckets):
    toks = (text or "").lower().split()
    feats = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return len(feats), sum(int(w[_hash63(f) % n_buckets]) for f in feats)


@pytest.mark.usefixtures("ray_session")
def test_inference_matches_scalar_reference():
    import ray.data

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "spark table row agg",
        "",
        None,
        "one",  # single token: no bigrams
    ]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": list(range(len(texts))), "text": texts})
    )
    out = {r["doc_id"]: r for r in hashed_classifier(ds, n_buckets=512).take_all()}
    w = classifier_weight_table(512)
    for i, t in enumerate(texts):
        n, logit = _scalar_score(t, w, 512)
        assert out[i]["n_features"] == n
        assert out[i]["logit"] == logit
        assert out[i]["pred"] == int(logit >= 0)
    # empty docs: 0 features, margin-0 convention
    assert out[2]["n_features"] == 0 and out[2]["pred"] == 1
