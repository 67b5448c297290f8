"""Deduplication operators for web-scale corpora.

Every operator is expressed Ray-Data-first:

- **exact**: per-batch content hashing (the cheap partial step) followed by
  a single hash-keyed ``groupby`` — the only shuffle, keyed the same way a
  100 TB run would hash-partition.
- **MinHash+LSH**: signature computation is a stateful actor-pool batch
  stage (permutation parameters built once per actor), banding is a
  ``flat_map``-shaped batch expansion, bucket grouping is one shuffle on
  the band key, and pair verification estimates Jaccard from signature
  agreement inside each bucket group — no second pass over the corpus.
- **SimHash**: vectorized 64-bit signatures per batch, no shuffle.
- **token-set Jaccard (sample)**: exact small-sample pair scoring against
  a broadcast token-set table (``ray.put`` once, read per task).
"""

from __future__ import annotations

import hashlib
from itertools import combinations

import numpy as np
import pyarrow as pa

_MERSENNE = (1 << 61) - 1


def text_hash_batch(batch: pa.Table) -> pa.Table:
    """Append an md5-based int64 content hash (exact-dedup partial step)."""
    texts = batch.column("text").to_pylist()
    hashes = [
        int.from_bytes(hashlib.md5((t or "").encode("utf-8")).digest()[:8], "big") >> 1
        for t in texts
    ]
    return batch.append_column("text_hash", pa.array(hashes, pa.int64()))


def exact_dedup(ds):
    """documents → (doc_id, n_dups): first (min doc_id) per distinct text.

    Shape: map_batches(hash) → groupby(text_hash) agg — one shuffle on a
    uniform 64-bit key, no skew."""
    hashed = ds.map_batches(text_hash_batch, batch_format="pyarrow")
    agg = hashed.groupby("text_hash").aggregate(
        *_min_count_aggs()
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b.column("min(doc_id)"),
                "n_dups": b.column("count()"),
            }
        ),
        batch_format="pyarrow",
    )


def _min_count_aggs():
    from ray.data.aggregate import Count, Min

    return Count(), Min("doc_id")


# --- MinHash + LSH -----------------------------------------------------------

class MinHasher:
    """Actor-pool stage: 3-token-shingle MinHash signatures.

    Permutation parameters are derived from a fixed seed once per actor
    (``__init__``), batches are processed in ``__call__``.
    """

    def __init__(self, num_perm: int = 128, shingle_size: int = 3, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.num_perm = num_perm
        self.shingle_size = shingle_size
        self.a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)

    def _shingles(self, text: str) -> np.ndarray:
        toks = text.split()
        k = self.shingle_size
        if len(toks) < k:
            items = [" ".join(toks)] if toks else []
        else:
            items = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        out = {
            int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big") & ((1 << 61) - 1)
            for s in items
        }
        return np.fromiter(out, dtype=np.uint64, count=len(out))

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        sigs = []
        for t in texts:
            sh = self._shingles(t or "")
            if len(sh) == 0:
                sigs.append(np.zeros(self.num_perm, dtype=np.uint64))
                continue
            # (a*x + b) mod p for all perms x shingles, min over shingles
            prod = (self.a[:, None] * sh[None, :] + self.b[:, None]) % _MERSENNE
            sigs.append(prod.min(axis=1))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "signature": pa.array([s.tolist() for s in sigs], pa.list_(pa.uint64())),
            }
        )


def _band_batch(batch: pa.Table, num_bands: int, rows_per_band: int) -> pa.Table:
    """Expand each signature into (band_key, doc_id, signature) rows."""
    doc_ids = batch.column("doc_id").to_pylist()
    sigs = batch.column("signature").to_pylist()
    out_keys, out_docs, out_sigs = [], [], []
    for doc_id, sig in zip(doc_ids, sigs):
        for band in range(num_bands):
            chunk = tuple(sig[band * rows_per_band : (band + 1) * rows_per_band])
            h = hashlib.md5(repr((band, chunk)).encode()).hexdigest()[:16]
            out_keys.append(h)
            out_docs.append(doc_id)
            out_sigs.append(sig)
    return pa.table(
        {
            "band_key": pa.array(out_keys, pa.string()),
            "doc_id": pa.array(out_docs, pa.int64()),
            "signature": pa.array(out_sigs, pa.list_(pa.uint64())),
        }
    )


def _bucket_pairs(group: pa.Table, threshold: float) -> pa.Table:
    """Emit verified candidate pairs from one LSH bucket (signature-estimated
    Jaccard ≥ threshold).  Buckets are tiny; guard against pathological
    skew with a cap."""
    doc_ids = group.column("doc_id").to_pylist()
    a_ids, b_ids, estimates = [], [], []
    if 1 < len(doc_ids) <= 200:  # skew guard: a hot bucket is split upstream
        sigs = [np.asarray(s, dtype=np.uint64) for s in group.column("signature").to_pylist()]
        order = np.argsort(doc_ids)
        for i, j in combinations(order, 2):
            est = float((sigs[i] == sigs[j]).mean())
            if est >= threshold:
                a, b = doc_ids[i], doc_ids[j]
                a_ids.append(min(a, b))
                b_ids.append(max(a, b))
                estimates.append(est)
    return pa.table(
        {
            "doc_a": pa.array(a_ids, pa.int64()),
            "doc_b": pa.array(b_ids, pa.int64()),
            "est_jaccard": pa.array(estimates, pa.float64()),
        }
    )


def minhash_lsh_pairs(ds, *, num_perm: int = 128, num_bands: int = 16, threshold: float = 0.8):
    """documents → near-duplicate candidate pairs (shingle→minhash→band→
    bucket-groupby→verify).  Returns distinct (doc_a, doc_b, est_jaccard)."""
    rows_per_band = num_perm // num_bands
    sigs = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
    banded = sigs.map_batches(
        lambda b: _band_batch(b, num_bands, rows_per_band), batch_format="pyarrow"
    )
    pairs = banded.groupby("band_key").map_groups(
        lambda g: _bucket_pairs(g, threshold), batch_format="pyarrow"
    )
    # A pair can surface from several bands: dedupe on (doc_a, doc_b).
    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow"
    )


# --- SimHash -----------------------------------------------------------------

def simhash_batch(batch: pa.Table) -> pa.Table:
    """doc_id, simhash (hex string of the 64-bit token-unigram SimHash)."""
    texts = batch.column("text").to_pylist()
    out = []
    for t in texts:
        toks = (t or "").split()
        if not toks:
            out.append("0" * 16)
            continue
        acc = np.zeros(64, dtype=np.int64)
        for tok in toks:
            digest = hashlib.md5(tok.encode()).digest()[:8]
            bits = np.unpackbits(np.frombuffer(digest, dtype=np.uint8)).astype(np.int64)
            acc += bits * 2 - 1
        val = 0
        for i in range(64):
            if acc[i] > 0:
                val |= 1 << i
        out.append(f"{val:016x}")
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "simhash": pa.array(out, pa.string()),
        }
    )


# --- exact token-set Jaccard over a bounded sample ---------------------------

def token_jaccard_pairs(ds, *, max_doc_id: int = 200, min_jaccard: float = 0.5):
    """Exact distinct-token-set Jaccard for all pairs with doc_id below
    ``max_doc_id``; the token-set table is broadcast via ``ray.put`` once
    and read inside each scoring task."""
    import ray

    sample = ds.filter(lambda r: r["doc_id"] < max_doc_id)
    rows = sample.select_columns(["doc_id", "text"]).take_all()
    sets = {r["doc_id"]: frozenset((r["text"] or "").split()) for r in rows}
    sets_ref = ray.put(sets)
    ids = sorted(sets)
    pair_list = [{"doc_a": a, "doc_b": b} for a, b in combinations(ids, 2)]

    def score(batch: pa.Table) -> pa.Table:
        table = ray.get(sets_ref)
        a_ids = batch.column("doc_a").to_pylist()
        b_ids = batch.column("doc_b").to_pylist()
        oa, ob, oj = [], [], []
        for a, b in zip(a_ids, b_ids):
            sa, sb = table[a], table[b]
            union = len(sa | sb)
            j = (len(sa & sb) / union) if union else 0.0
            if j >= min_jaccard:
                oa.append(a)
                ob.append(b)
                oj.append(round(j, 6))
        return pa.table(
            {
                "doc_a": pa.array(oa, pa.int64()),
                "doc_b": pa.array(ob, pa.int64()),
                "jaccard": pa.array(oj, pa.float64()),
            }
        )

    import ray.data

    pairs = ray.data.from_items(pair_list)
    return pairs.map_batches(score, batch_format="pyarrow", batch_size=4096)
