"""Bloom URL-seen filter: unit properties + pipeline-vs-local parity.

The distributed build (per-block bitmap partials OR'd by the driver)
must be bit-identical to a single local filter over the same keys —
OR-monoid commutativity is the whole design, so block boundaries must
not matter.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from go_htmldate_ray.state import bloom


def test_no_false_negatives_and_determinism():
    f = bloom.BloomFilter(m_bits=4096, k=4)
    keys = [f"https://h{i % 7}.example.org/p/{i}" for i in range(300)]
    hashes = bloom.hash_keys(keys)
    f.add_hashes(hashes)
    assert f.contains_hashes(hashes).all()  # Bloom's hard guarantee
    g = bloom.BloomFilter(m_bits=4096, k=4)
    g.add_hashes(bloom.hash_keys(keys))
    assert np.array_equal(f.words, g.words)  # no RNG anywhere


def test_block_partials_equal_single_filter():
    keys = [f"https://site{i % 13}.example.org/a/{i}" for i in range(500)]
    single = bloom.BloomFilter(m_bits=1024, k=4)
    single.add_hashes(bloom.hash_keys(keys))

    # same keys split across 7 uneven "blocks"
    cuts = [0, 3, 50, 51, 200, 333, 420, 500]
    rows = []
    for lo, hi in zip(cuts, cuts[1:]):
        t = pa.table({"url": pa.array(keys[lo:hi], pa.string())})
        rows.extend(
            bloom.partial_bitmap_batch(t, key_column="url", m_bits=1024, k=4)
            .to_pylist()
        )
    combined = bloom.combine_bitmaps(rows, m_bits=1024, k=4)
    assert np.array_equal(single.words, combined.words)


def test_positions_match_sql_formula():
    # pin the double-hashing formula the DuckDB oracle mirrors
    f = bloom.BloomFilter(m_bits=1024, k=4)
    key = "https://site3.example.org/article/3.html"
    h = bloom.key_hash64(key)
    expect = [((h >> 32) + i * ((h & 0xFFFFFFFF) | 1)) % 1024 for i in range(4)]
    got = f.positions(np.array([h], dtype=np.uint64))[:, 0].tolist()
    assert got == expect


def test_undersized_filter_reports_false_positives():
    # the audit's non-degeneracy precondition: an undersized filter on a
    # disjoint probe set MUST show some maybe_seen (otherwise the oracle
    # only ever proves the no-false-negative side)
    f = bloom.BloomFilter(m_bits=128, k=4)
    f.add_hashes(bloom.hash_keys([f"seen-{i}" for i in range(60)]))
    probe = f.contains_hashes(bloom.hash_keys([f"new-{i}" for i in range(200)]))
    assert 0 < probe.sum() < 200


def test_validation():
    with pytest.raises(ValueError):
        bloom.BloomFilter(m_bits=100, k=4)  # not a multiple of 64
    with pytest.raises(ValueError):
        bloom.BloomFilter(m_bits=1024, k=0)


def test_bloom_seen_audit_pipeline(ray_session):
    from go_htmldate_ray.pipelines.extract_dates import bloom_seen_audit

    sf = "/root/testdata/sf0.001"
    df = bloom_seen_audit(sf).to_pandas().sort_values("doc_id")

    # local recomputation of the whole audit
    from go_htmldate_ray.sources.pages import page_url

    ids = df["doc_id"].to_numpy()
    f = bloom.BloomFilter(m_bits=1024, k=4)
    f.add_hashes(bloom.hash_keys([page_url(int(i)) for i in ids if i % 3 != 0]))
    maybe = f.contains_hashes(bloom.hash_keys([page_url(int(i)) for i in ids]))
    assert np.array_equal(df["maybe_seen"].to_numpy(), maybe)
    assert np.array_equal(df["is_seen"].to_numpy(), ids % 3 != 0)
    assert np.array_equal(
        df["false_positive"].to_numpy(), maybe & (ids % 3 == 0)
    )
    # every actually-seen URL must probe positive
    assert df.loc[df["is_seen"], "maybe_seen"].all()


def test_sizing_helpers():
    from go_htmldate_ray.state.bloom import k_for, m_bits_for

    m = m_bits_for(1_000_000, 0.01)
    assert m % 64 == 0
    # textbook: ~9.59 bits/key at 1% FPR
    assert 9.5 <= m / 1_000_000 <= 9.7
    assert k_for(m, 1_000_000) == 7  # (m/n) ln2 ≈ 6.64 -> 7

    # empirical agreement: a right-sized filter lands near its target
    f = bloom.BloomFilter(m_bits_for(5000, 0.01), k=7)
    f.add_hashes(bloom.hash_keys([f"k{i}" for i in range(5000)]))
    probe = f.contains_hashes(bloom.hash_keys([f"other{i}" for i in range(20000)]))
    assert probe.mean() < 0.03  # 1% target, generous bound
    assert abs(f.expected_fpr() - probe.mean()) < 0.02

    import pytest as _pytest

    with _pytest.raises(ValueError):
        m_bits_for(0, 0.01)
    with _pytest.raises(ValueError):
        m_bits_for(100, 1.5)
