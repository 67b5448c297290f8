"""Similarity search over embedding columns.

- ``brute_force_topk``: baseline exact cosine top-k — a numpy matmul per
  batch against a broadcast query matrix (``ray.put`` once, read per task),
  partial top-k inside each batch, then one tiny groupby to merge partials.
  This is the canonical scale shape: the corpus streams, only
  ``n_queries × k × n_blocks`` candidate rows ever shuffle.
- ``lsh_topk``: random-hyperplane LSH variant — the scale path that
  restricts scoring to colliding buckets (multi-probe over Hamming-1
  neighbors of the query bucket).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _query_matrix(ds, query_ids: list[int]):
    rows = ds.filter(lambda r: r["vec_id"] in set(query_ids)).take_all()
    rows.sort(key=lambda r: r["vec_id"])
    ids = [r["vec_id"] for r in rows]
    mat = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    return ids, mat


def _partial_topk_batch(batch: pa.Table, qids, qmat_ref, k: int) -> pa.Table:
    import ray

    qmat = ray.get(qmat_ref) if not isinstance(qmat_ref, np.ndarray) else qmat_ref
    vec_ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
    emb = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(emb, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    emb = emb / norms

    cos = qmat @ emb.T  # (n_queries, batch)
    out_q, out_n, out_c = [], [], []
    for qi, qid in enumerate(qids):
        row = cos[qi]
        mask = vec_ids != qid
        cand_ids = vec_ids[mask]
        cand_cos = row[mask]
        if len(cand_ids) > k:
            sel = np.argpartition(-cand_cos, k)[:k]
            cand_ids, cand_cos = cand_ids[sel], cand_cos[sel]
        out_q.extend([qid] * len(cand_ids))
        out_n.extend(cand_ids.tolist())
        out_c.extend(cand_cos.tolist())
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "neighbor_id": pa.array(out_n, pa.int64()),
            "cosine": pa.array(out_c, pa.float64()),
        }
    )


def _merge_topk(group: pa.Table, k: int) -> pa.Table:
    qid = group.column("query_id")[0].as_py()
    n = group.column("neighbor_id").to_pylist()
    c = group.column("cosine").to_pylist()
    order = sorted(range(len(n)), key=lambda i: (-c[i], n[i]))[:k]
    return pa.table(
        {
            "query_id": pa.array([qid] * len(order), pa.int64()),
            "neighbor_id": pa.array([n[i] for i in order], pa.int64()),
            "rank": pa.array(range(1, len(order) + 1), pa.int64()),
        }
    )


def brute_force_topk(ds, query_ids: list[int], k: int = 5):
    """embeddings → (query_id, neighbor_id, rank): exact cosine top-k."""
    import ray

    qids, qmat = _query_matrix(ds, query_ids)
    qmat_ref = ray.put(qmat)
    partials = ds.map_batches(
        lambda b: _partial_topk_batch(b, qids, qmat_ref, k),
        batch_format="pyarrow",
        batch_size=1024,
    )
    return partials.groupby("query_id").map_groups(
        lambda g: _merge_topk(g, k), batch_format="pyarrow"
    )


# --- LSH variant -------------------------------------------------------------

class HyperplaneHasher:
    """Random-hyperplane signer: planes drawn once per actor from a fixed
    seed, so bucket assignment is deterministic across the cluster."""

    def __init__(self, dim: int, n_planes: int = 12, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.planes = rng.standard_normal((n_planes, dim))

    def bucket_of(self, vecs: np.ndarray) -> np.ndarray:
        signs = (vecs @ self.planes.T) > 0
        return (signs * (1 << np.arange(signs.shape[1]))).sum(axis=1).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float64)
        return batch.append_column(
            "bucket", pa.array(self.bucket_of(emb), pa.int64())
        )


def lsh_topk(ds, query_ids: list[int], k: int = 5, n_planes: int = 12):
    """Approximate cosine top-k: score only rows whose LSH bucket is within
    Hamming distance 1 of the query's bucket (multi-probe)."""
    import ray

    qids, qmat = _query_matrix(ds, query_ids)
    dim = qmat.shape[1]
    hasher = HyperplaneHasher(dim, n_planes)
    q_buckets = hasher.bucket_of(qmat)
    probe_sets = []
    for b in q_buckets:
        probes = {int(b)}
        probes.update(int(b) ^ (1 << p) for p in range(n_planes))
        probe_sets.append(probes)
    wanted = set().union(*probe_sets)

    bucketed = ds.map_batches(
        HyperplaneHasher,
        fn_constructor_kwargs={"dim": dim, "n_planes": n_planes},
        batch_format="pyarrow",
        concurrency=(1, 8),
    ).filter(lambda r: r["bucket"] in wanted)

    qmat_ref = ray.put(qmat)
    partials = bucketed.map_batches(
        lambda b: _partial_topk_batch(b, qids, qmat_ref, k),
        batch_format="pyarrow",
        batch_size=1024,
    )
    return partials.groupby("query_id").map_groups(
        lambda g: _merge_topk(g, k), batch_format="pyarrow"
    )


def embedding_dup_pairs(ds, *, threshold: float = 0.4):
    """Embedding-cosine near-duplicate pairs: (vec_a, vec_b, cosine) for all
    pairs with cosine ≥ threshold, vec_a < vec_b.

    The normalized matrix is broadcast once (``ray.put``); each batch
    matmuls its rows against the full matrix and emits only its
    above-threshold pairs — the corpus streams, the O(N²) score space
    never materialises.  The 100 TB path replaces the broadcast with the
    hyperplane-LSH buckets above (score only within colliding buckets).
    """
    import ray

    rows = ds.select_columns(["vec_id", "embedding"]).take_all()
    rows.sort(key=lambda r: r["vec_id"])
    ids = np.asarray([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mat = mat / norms
    mat_ref = ray.put((ids, mat))

    import ray.data

    blocks = ray.data.from_items(
        [{"start": i} for i in range(0, len(ids), 256)]
    )

    def score(batch: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(mat_ref)
        oa, ob, oc = [], [], []
        for start in batch.column("start").to_pylist():
            chunk = all_mat[start : start + 256]
            cos = chunk @ all_mat.T
            for i in range(chunk.shape[0]):
                gi = start + i
                hits = np.nonzero(cos[i] >= threshold)[0]
                for j in hits:
                    if all_ids[gi] < all_ids[j]:
                        oa.append(int(all_ids[gi]))
                        ob.append(int(all_ids[j]))
                        oc.append(round(float(cos[i, j]), 6))
        return pa.table(
            {
                "vec_a": pa.array(oa, pa.int64()),
                "vec_b": pa.array(ob, pa.int64()),
                "cosine": pa.array(oc, pa.float64()),
            }
        )

    return blocks.map_batches(score, batch_format="pyarrow", batch_size=4)
