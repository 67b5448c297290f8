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


_SIDE = "__join_side"


def hash_join(left, right, *, on: str, right_on: str | None = None):
    """General distributed inner equi-join via one keyed sort-shuffle.

    Both sides are tagged and unioned; one ``groupby`` on the join key
    co-locates matching rows; each group emits the cartesian product of
    its left × right rows.  This is the classic hash/sort-merge exchange
    built from stable Ray Data primitives (the built-in ``Dataset.join``
    operator is experimental: its per-partition aggregator actors
    over-subscribe small clusters and it rejects schema-less empty
    partitions).

    Column layout: all left columns + all right columns except the right
    key (mirrors SQL ``USING``).  Non-key column-name collisions are the
    caller's responsibility.  Skewed keys amplify the within-group
    cartesian — this is an equi-join; pre-aggregate hot keys first.
    """
    right_on = right_on or on

    left_schema = left.schema()
    right_schema = right.schema()
    left_names = list(left_schema.names)
    right_names = [n for n in right_schema.names if n != right_on]
    left_types = dict(zip(left_schema.names, left_schema.types))
    right_types = {
        n: t
        for n, t in zip(right_schema.names, right_schema.types)
        if n != right_on
    }

    def tag_left(batch: pa.Table) -> pa.Table:
        cols = {f"l_{c}": batch.column(c) for c in left_names}
        cols.update(
            {f"r_{c}": pa.nulls(batch.num_rows, right_types[c]) for c in right_names}
        )
        cols[_KEY] = batch.column(on).cast(pa.int64())
        cols[_SIDE] = pa.array([0] * batch.num_rows, pa.int8())
        return pa.table(cols)

    def tag_right(batch: pa.Table) -> pa.Table:
        cols = {f"l_{c}": pa.nulls(batch.num_rows, left_types[c]) for c in left_names}
        cols.update({f"r_{c}": batch.column(c) for c in right_names})
        cols[_KEY] = batch.column(right_on).cast(pa.int64())
        cols[_SIDE] = pa.array([1] * batch.num_rows, pa.int8())
        return pa.table(cols)

    unioned = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )

    out_fields = [(n, left_types[n]) for n in left_names] + [
        (n, right_types[n]) for n in right_names
    ]
    empty = pa.table({n: pa.array([], t) for n, t in out_fields})

    def emit(group: pa.Table) -> pa.Table:
        side = group.column(_SIDE)
        lrows = group.filter(pc.equal(side, 0))
        rrows = group.filter(pc.equal(side, 1))
        nl, nr = lrows.num_rows, rrows.num_rows
        if nl == 0 or nr == 0:
            return empty
        # cartesian within the key group: repeat left rows, tile right
        l_idx = pa.array([i for i in range(nl) for _ in range(nr)], pa.int64())
        r_idx = pa.array(list(range(nr)) * nl, pa.int64())
        cols = {}
        for n in left_names:
            cols[n] = lrows.column(f"l_{n}").take(l_idx)
        for n in right_names:
            cols[n] = rrows.column(f"r_{n}").take(r_idx)
        return pa.table(cols)

    return unioned.groupby(_KEY).map_groups(emit, batch_format="pyarrow")


PAIR_CAP = 200  # bucket size above which all-pairs expansion is star-sampled


def bucket_pair_candidates(
    group: pa.Table, id_col: str, a_col: str, b_col: str, logger, what: str,
    strict: bool = False,
) -> pa.Table:
    """Candidate pairs from one LSH bucket (shared by the MinHash and
    embedding paths).  Buckets up to ``PAIR_CAP`` members expand to all
    pairs; hotter buckets are star-sampled (min id ↔ every other member):
    the duplicate *cluster* stays connected — the full pair set is
    recoverable by union-find — while output stays O(G).  Truncation is
    logged, never silent.  With ``strict`` a hot bucket RAISES instead:
    oracle runs use this so an engine/oracle semantics divergence (the
    SQL oracles enumerate all collision pairs) surfaces as a loud error,
    never a confusing hash mismatch."""
    import numpy as np

    ids = np.unique(np.asarray(group.column(id_col).to_pylist(), dtype=np.int64))
    g = len(ids)
    if g < 2:
        return pa.table(
            {a_col: pa.array([], pa.int64()), b_col: pa.array([], pa.int64())}
        )
    if g <= PAIR_CAP:
        ii, jj = np.triu_indices(g, 1)
        return pa.table(
            {
                a_col: pa.array(ids[ii], pa.int64()),
                b_col: pa.array(ids[jj], pa.int64()),
            }
        )
    if strict:
        raise ValueError(
            f"{what} LSH bucket with {g} members exceeds PAIR_CAP={PAIR_CAP} "
            "in strict (oracle) mode: the exact-enumeration oracle would "
            "diverge from star-sampling — raise PAIR_CAP or use "
            "hot_buckets='sample'"
        )
    logger.warning(
        "%s LSH bucket with %d members star-sampled: emitting %d spanning "
        "pairs instead of %d all-pairs (cluster connectivity preserved)",
        what, g, g - 1, g * (g - 1) // 2,
    )
    return pa.table(
        {
            a_col: pa.array(np.full(g - 1, ids[0]), pa.int64()),
            b_col: pa.array(ids[1:], pa.int64()),
        }
    )
