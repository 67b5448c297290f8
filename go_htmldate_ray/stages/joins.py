"""Keyed lookup-join building block for candidate-pair verification.

``attach_payload`` hash-co-locates a (key → payload bytes) lookup table
with rows that reference the key, using one ``groupby`` shuffle — the
same exchange a hash join performs, but built on Ray Data's sort-based
shuffle rather than the experimental ``Dataset.join`` operator (whose
per-partition aggregator actors over-subscribe small clusters and choke
on schema-less empty partitions).  Cost is O(|pairs| + |lookup|) rows
through one shuffle keyed on the lookup key.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_KEY = "__join_key"
_PAYLOAD = "__join_payload"
_IS_LOOKUP = "__join_is_lookup"


def attach_payload(
    pairs,
    lookup,
    key_col: str,
    out_col: str,
    carry_cols: dict[str, pa.DataType],
    dedupe: bool = False,
):
    """Inner-join ``lookup``'s payload onto ``pairs``.

    Args:
        pairs: Dataset whose rows reference a key via ``key_col``.
        lookup: Dataset with columns ``key`` (int64) and ``payload``
            (binary) — at most one row per key.
        key_col: column of ``pairs`` naming the lookup key.
        out_col: name for the attached payload column (binary).
        carry_cols: name → Arrow type of the ``pairs`` columns to carry
            through (must include ``key_col``).
        dedupe: drop duplicate carry tuples inside each key group —
            rows with identical carry values co-locate on the join key,
            so candidate-pair dedup piggybacks on this shuffle instead
            of needing its own all-to-all.

    Returns a Dataset with ``carry_cols`` + ``out_col``; pairs whose key
    has no lookup row are dropped (inner semantics).
    """
    names = list(carry_cols)

    def tag_pairs(batch: pa.Table) -> pa.Table:
        cols = {c: batch.column(c).cast(carry_cols[c]) for c in names}
        cols[_KEY] = batch.column(key_col).cast(pa.int64())
        cols[_PAYLOAD] = pa.array([b""] * batch.num_rows, pa.binary())
        cols[_IS_LOOKUP] = pa.array([False] * batch.num_rows, pa.bool_())
        return pa.table(cols)

    def tag_lookup(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {c: pa.nulls(n, carry_cols[c]) for c in names}
        cols[_KEY] = batch.column("key").cast(pa.int64())
        cols[_PAYLOAD] = batch.column("payload").cast(pa.binary())
        cols[_IS_LOOKUP] = pa.array([True] * n, pa.bool_())
        return pa.table(cols)

    unioned = pairs.map_batches(tag_pairs, batch_format="pyarrow").union(
        lookup.map_batches(tag_lookup, batch_format="pyarrow")
    )

    empty = pa.table(
        {
            **{c: pa.array([], carry_cols[c]) for c in names},
            out_col: pa.array([], pa.binary()),
        }
    )

    def resolve(group: pa.Table) -> pa.Table:
        mask = group.column(_IS_LOOKUP)
        lookup_rows = group.filter(mask)
        pair_rows = group.filter(pc.invert(mask))
        if lookup_rows.num_rows == 0 or pair_rows.num_rows == 0:
            return empty
        payload = lookup_rows.column(_PAYLOAD)[0].as_py()
        if dedupe and pair_rows.num_rows > 1:
            seen: set = set()
            keep = []
            carries = [pair_rows.column(c).to_pylist() for c in names]
            for i, tup in enumerate(zip(*carries)):
                if tup not in seen:
                    seen.add(tup)
                    keep.append(i)
            if len(keep) < pair_rows.num_rows:
                pair_rows = pair_rows.take(pa.array(keep, pa.int64()))
        cols = {c: pair_rows.column(c) for c in names}
        cols[out_col] = pa.array([payload] * pair_rows.num_rows, pa.binary())
        return pa.table(cols)

    return unioned.groupby(_KEY).map_groups(resolve, batch_format="pyarrow")
