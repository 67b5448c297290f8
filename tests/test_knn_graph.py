"""Tests for the LSH k-NN graph (similarity.knn_graph)."""

import numpy as np
import pyarrow as pa
import pytest


def _vecs(n=60, dim=16, seed=7):
    rng = np.random.RandomState(seed)
    m = rng.standard_normal((n, dim))
    return m


@pytest.mark.usefixtures("ray_session")
def test_planted_duplicate_is_rank_one():
    import ray.data

    m = _vecs()
    # vector 59 := exact copy of vector 0 -> each must be the other's
    # nearest neighbor (cosine 1.0 collides in every band)
    m[59] = m[0]
    ds = ray.data.from_arrow(
        pa.table(
            {"vec_id": list(range(len(m))), "embedding": [row.tolist() for row in m]}
        )
    )
    from go_htmldate_ray.stages.similarity import knn_graph

    rows = knn_graph(ds, k=3).take_all()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["vec_id"], []).append((r["rank"], r["neighbor_id"]))
    assert sorted(by_q[0])[0] == (1, 59)
    assert sorted(by_q[59])[0] == (1, 0)
    # ranks are 1..k without gaps per vector
    for q, lst in by_q.items():
        ranks = sorted(rk for rk, _ in lst)
        assert ranks == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 3
        # no self-edges
        assert all(n != q for _rk, n in lst)


@pytest.mark.usefixtures("ray_session")
def test_deterministic_across_runs():
    import ray.data

    m = _vecs(n=40)
    t = pa.table(
        {"vec_id": list(range(len(m))), "embedding": [row.tolist() for row in m]}
    )
    from go_htmldate_ray.stages.similarity import knn_graph

    def run():
        rows = knn_graph(ray.data.from_arrow(t), k=2).take_all()
        return sorted((r["vec_id"], r["rank"], r["neighbor_id"]) for r in rows)

    assert run() == run()
