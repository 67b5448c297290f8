"""Deterministic sampling operators (SURVEY §2.7's sampling slot).

Ray's built-in ``Dataset.random_sample`` draws per-run randomness; a
training-data pipeline wants REPRODUCIBLE samples — rerunning a failed
shard must keep the same rows.  Both operators here key the keep/drop
decision on ``md5(seed:id)``, a pure function of (row id, seed): no
shuffle, streams batch-by-batch, and a DuckDB oracle reproduces the
exact row set from the same formula.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

_HALF_RANGE = 1 << 63  # md5 prefix >> 1 is uniform on [0, 2^63)


def _keep_hash(seed: int, row_id) -> int:
    return (
        int.from_bytes(hashlib.md5(f"{seed}:{row_id}".encode()).digest()[:8], "big")
        >> 1
    )


def bernoulli_sample(ds, *, rate: float, seed: int = 42, id_col: str = "doc_id"):
    """Keep each row independently with probability ``rate``,
    deterministically in (id, seed)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    threshold = int(rate * _HALF_RANGE)

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        keep = [_keep_hash(seed, i) < threshold for i in ids]
        return batch.filter(pa.array(keep, pa.bool_()))

    return ds.map_batches(f, batch_format="pyarrow")


def stratified_sample(
    ds,
    *,
    strata_col: str,
    rates: dict,
    default_rate: float = 0.0,
    seed: int = 42,
    id_col: str = "doc_id",
):
    """Per-stratum Bernoulli rates (e.g. keep 50% of ``en`` docs, 10% of
    the rest) — the language-rebalancing sampler of a web-corpus
    pipeline.  Same deterministic keep rule as :func:`bernoulli_sample`;
    the stratum only selects the rate."""
    thresholds = {k: int(v * _HALF_RANGE) for k, v in rates.items()}
    default_threshold = int(default_rate * _HALF_RANGE)

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        strata = batch.column(strata_col).to_pylist()
        keep = [
            _keep_hash(seed, i) < thresholds.get(s, default_threshold)
            for i, s in zip(ids, strata)
        ]
        return batch.filter(pa.array(keep, pa.bool_()))

    return ds.map_batches(f, batch_format="pyarrow")


def dataset_split(
    ds,
    *,
    fractions: tuple[float, float] = (0.8, 0.1),
    seed: int = 11,
    id_col: str = "doc_id",
):
    """Assign every row a deterministic train/val/test split label
    (train = ``fractions[0]``, val = ``fractions[1]``, test = the rest).
    Same md5(seed:id) uniform draw as the samplers: reproducible across
    reruns and shard retries, no shuffle, streams batch-by-batch."""
    t_train = int(fractions[0] * _HALF_RANGE)
    t_val = int((fractions[0] + fractions[1]) * _HALF_RANGE)

    def f(batch: pa.Table) -> pa.Table:
        labels = []
        for i in batch.column(id_col).to_pylist():
            u = _keep_hash(seed, i)
            labels.append("train" if u < t_train else "val" if u < t_val else "test")
        return batch.append_column("split", pa.array(labels, pa.string()))

    return ds.map_batches(f, batch_format="pyarrow")
