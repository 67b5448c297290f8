"""Content-defined chunking (gear rolling hash)."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from go_htmldate_ray.stages.text_stage import (
    _GEAR_A,
    _GEAR_B,
    _gear_boundary_mask,
    cdc_chunk_batch,
)


def _table(texts):
    return pa.table(
        {
            "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


def _scalar_mask(text: str, mask_bits: int = 6) -> np.ndarray:
    """Reference: per-position 64-term window sum, plain Python ints."""
    g = [(ord(c) * int(_GEAR_A) + int(_GEAR_B)) % (1 << 64) for c in text]
    out = []
    for t in range(len(g)):
        h = 0
        for k in range(min(64, t + 1)):
            h = (h + (g[t - k] << k)) % (1 << 64)
        out.append(h % (1 << mask_bits) == 0)
    return np.array(out, dtype=bool)


def test_batch_concat_matches_scalar():
    # the 63-cell zero-gear pad must fully isolate docs: batch-vectorized
    # masks == per-doc scalar recomputation, regardless of neighbors
    texts = [
        "the quick brown fox jumps over the lazy dog " * 4,
        "pack my box with five dozen liquor jugs " * 3,
        "ünïcödé çhärs — 日本語テキスト with wide code points " * 3,
    ]
    masks = _gear_boundary_mask(texts, 6)
    for t, m in zip(texts, masks):
        assert np.array_equal(m, _scalar_mask(t)), t[:20]


def test_chunks_partition_each_document():
    texts = ["alpha beta gamma delta " * 10, "", "x"]
    df = cdc_chunk_batch(_table(texts)).to_pandas()
    assert 2 not in set(df.doc_id)  # empty doc yields no chunks
    for doc_id, text in ((1, texts[0]), (3, texts[2])):
        d = df[df.doc_id == doc_id].sort_values("chunk_idx")
        assert d.length.sum() == len(text)  # exact cover
        assert (d.chunk_idx.to_numpy() == np.arange(len(d))).all()
        # contiguous: each chunk starts where the previous ended
        assert (d.start.to_numpy()[1:] == (d.start + d.length).to_numpy()[:-1]).all()
        # md5 really is of the chunk substring
        r = d.iloc[0]
        piece = text[r.start : r.start + r.length]
        assert r.chunk_md5 == hashlib.md5(piece.encode()).hexdigest()[:16]


def test_shift_invariance():
    # the CDC property fixed-size windows lack: a prefix edit leaves
    # boundaries >64 code points downstream intact
    base = "content defined chunking preserves downstream boundaries " * 8
    a = cdc_chunk_batch(_table([base])).to_pandas()
    b = cdc_chunk_batch(_table(["PREFIX-EDIT " + base])).to_pandas()
    shared = set(a.chunk_md5) & set(b.chunk_md5)
    assert len(shared) >= len(set(a.chunk_md5)) - 2  # only the head differs


def test_mask_bits_controls_granularity():
    text = "granularity of the expected chunk size doubles per mask bit " * 20
    fine = cdc_chunk_batch(_table([text]), mask_bits=4).to_pandas()
    coarse = cdc_chunk_batch(_table([text]), mask_bits=8).to_pandas()
    assert len(fine) > len(coarse)
    assert fine.length.sum() == coarse.length.sum() == len(text)


def test_cdc_dup_chunk_stats(ray_session):
    import ray.data

    from go_htmldate_ray.stages.cleaning import cdc_dup_chunk_stats

    # two docs sharing one long repeated span, one unique doc
    shared = "this exact boilerplate span repeats across two documents " * 4
    rows = [
        {"doc_id": 1, "text": "intro A. " + shared + " outro A."},
        {"doc_id": 2, "text": "totally different lead-in: " + shared},
        {"doc_id": 3, "text": "nothing shared here at all, unique content."},
    ]
    ds = ray.data.from_items(rows)
    df = cdc_dup_chunk_stats(ds).to_pandas()
    assert len(df) > 0  # the shared span must surface at least one dup key
    assert (df.n_occurrences > 1).all()
    assert (df.n_docs <= df.n_occurrences).all()
    # dup keys must involve both sharing docs for at least one chunk
    assert (df.n_docs >= 2).any()

    # local recomputation over the same rows
    from collections import Counter

    from go_htmldate_ray.stages.text_stage import cdc_chunk_batch

    t = pa.table(
        {
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
        }
    )
    chunks = cdc_chunk_batch(t).to_pandas()
    cnt = Counter(chunks.chunk_md5)
    expect = {k: v for k, v in cnt.items() if v > 1}
    got = dict(zip(df.chunk_md5, df.n_occurrences))
    assert got == expect
