"""Keyed lookup-join building blocks for candidate-pair verification.

``attach_payload`` and ``hash_join`` hash-co-locate rows through ONE
``groupby`` shuffle — the same exchange a hash join performs, but built
on Ray Data's stable sort-based shuffle rather than the experimental
``Dataset.join`` operator (whose per-partition aggregator actors
over-subscribe small clusters and choke on schema-less empty
partitions).

The grouping key is a HASH BUCKET of the join key, not the key itself:
grouping on the raw key would invoke a per-group Python callback once
per key — the maximum-overhead shape for a corpus-sized key domain
(one call per document at 10^10 keys).  With ``n_buckets`` groups, each
callback receives a whole bucket of keys and resolves them with
vectorized numpy (searchsorted for the ≤1-row-per-key lookup side; a
repeat/tile index construction for the general cartesian), so per-group
overhead is amortised over ~|rows|/n_buckets rows.  Size ``n_buckets``
like shuffle partitions (a few × cluster cores, or data / ~100 MB).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_KEY = "__join_key"
_BUCKET = "__join_bucket"
_PAYLOAD = "__join_payload"
_IS_LOOKUP = "__join_is_lookup"

DEFAULT_JOIN_BUCKETS = 64


def adaptive_buckets(n_rows: int) -> int:
    """Shared shuffle-width heuristic for keyed joins over ``n_rows``-row
    state tables (~500k rows per bucket, floor 8, cap 256): small inputs
    skip paying dozens of near-empty shuffle tasks per exchange."""
    return max(8, min(256, n_rows // 500_000 + 8))


def _bucket_of(keys: pa.ChunkedArray | pa.Array, n_buckets: int) -> pa.Array:
    # splitmix-style mix (in uint64, wrapping) so adjacent ids spread
    k = np.asarray(keys, dtype=np.int64).astype(np.uint64)
    k ^= k >> np.uint64(33)
    k *= np.uint64(0xFF51AFD7ED558CCD)
    return pa.array((k % np.uint64(n_buckets)).astype(np.int64), pa.int64())


def attach_payload(
    pairs,
    lookup,
    key_col: str,
    out_col: str,
    carry_cols: dict[str, pa.DataType],
    dedupe: bool = False,
    n_buckets: int = DEFAULT_JOIN_BUCKETS,
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
        dedupe: drop duplicate carry tuples — rows with identical carry
            values co-locate on the join bucket, so candidate-pair dedup
            piggybacks on this shuffle instead of needing its own
            all-to-all.
        n_buckets: hash buckets for the grouping (see module docstring).

    Returns a Dataset with ``carry_cols`` + ``out_col``; pairs whose key
    has no lookup row are dropped (inner semantics).
    """
    names = list(carry_cols)

    def tag_pairs(batch: pa.Table) -> pa.Table:
        cols = {c: batch.column(c).cast(carry_cols[c]) for c in names}
        key = batch.column(key_col).cast(pa.int64())
        cols[_KEY] = key
        cols[_BUCKET] = _bucket_of(key, n_buckets)
        cols[_PAYLOAD] = pa.array([b""] * batch.num_rows, pa.binary())
        cols[_IS_LOOKUP] = pa.array([False] * batch.num_rows, pa.bool_())
        return pa.table(cols)

    def tag_lookup(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {c: pa.nulls(n, carry_cols[c]) for c in names}
        key = batch.column("key").cast(pa.int64())
        cols[_KEY] = key
        cols[_BUCKET] = _bucket_of(key, n_buckets)
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

    def resolve_bucket(group: pa.Table) -> pa.Table:
        """Vectorized whole-bucket resolve: searchsorted lookup of every
        pair key against the bucket's (sorted) lookup keys."""
        mask = group.column(_IS_LOOKUP)
        lookup_rows = group.filter(mask)
        pair_rows = group.filter(pc.invert(mask))
        if lookup_rows.num_rows == 0 or pair_rows.num_rows == 0:
            return empty
        if dedupe and pair_rows.num_rows > 1:
            # distinct carry tuples (pyarrow hash group-by, no Python loop)
            pair_rows = (
                pair_rows.select(names + [_KEY])
                .group_by(names + [_KEY], use_threads=False)
                .aggregate([])
            )
        lk = np.asarray(lookup_rows.column(_KEY), dtype=np.int64)
        order = np.argsort(lk, kind="stable")
        lk_sorted = lk[order]
        pk = np.asarray(pair_rows.column(_KEY), dtype=np.int64)
        pos = np.searchsorted(lk_sorted, pk)
        pos_clip = np.minimum(pos, len(lk_sorted) - 1)
        valid = lk_sorted[pos_clip] == pk
        matched = pair_rows.filter(pa.array(valid))
        payload_src = lookup_rows.column(_PAYLOAD).take(
            pa.array(order[pos_clip[valid]], pa.int64())
        )
        cols = {c: matched.column(c) for c in names}
        cols[out_col] = payload_src
        return pa.table(cols)

    return unioned.groupby(_BUCKET).map_groups(resolve_bucket, batch_format="pyarrow")


_SIDE = "__join_side"


def hash_join(
    left,
    right,
    *,
    on: str,
    right_on: str | None = None,
    n_buckets: int = DEFAULT_JOIN_BUCKETS,
    how: str = "inner",
):
    """General distributed equi-join via one keyed sort-shuffle
    (``how="inner"``, ``"left"`` or ``"full"`` — outer modes keep
    unmatched rows with typed nulls in the other side's columns; the
    right key column surfaces as the ``on`` column for right-only rows
    of a full join, mirroring SQL ``USING``/``coalesce`` semantics).

    Both sides are tagged and unioned; one ``groupby`` on the key's hash
    bucket co-locates matching rows; each bucket emits the cartesian
    product of its left × right rows per key, built with vectorized
    repeat/tile index arrays (no per-key Python callback — see module
    docstring).

    Column layout: all left columns + all right columns except the right
    key (mirrors SQL ``USING``).  Non-key column-name collisions are the
    caller's responsibility.  Skewed keys amplify the within-group
    cartesian — this is an equi-join; pre-aggregate hot keys first.
    """
    if how not in ("inner", "left", "full"):
        raise ValueError(f"how must be 'inner', 'left' or 'full', got {how!r}")
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
        key = batch.column(on).cast(pa.int64())
        cols[_KEY] = key
        cols[_BUCKET] = _bucket_of(key, n_buckets)
        cols[_SIDE] = pa.array([0] * batch.num_rows, pa.int8())
        return pa.table(cols)

    def tag_right(batch: pa.Table) -> pa.Table:
        cols = {f"l_{c}": pa.nulls(batch.num_rows, left_types[c]) for c in left_names}
        cols.update({f"r_{c}": batch.column(c) for c in right_names})
        key = batch.column(right_on).cast(pa.int64())
        cols[_KEY] = key
        cols[_BUCKET] = _bucket_of(key, n_buckets)
        cols[_SIDE] = pa.array([1] * batch.num_rows, pa.int8())
        return pa.table(cols)

    unioned = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )

    out_fields = [(n, left_types[n]) for n in left_names] + [
        (n, right_types[n]) for n in right_names
    ]
    empty = pa.table({n: pa.array([], t) for n, t in out_fields})

    def _left_only(lrows: pa.Table, mask: np.ndarray) -> pa.Table:
        """Unmatched left rows + typed nulls for the right columns."""
        kept = lrows.filter(pa.array(mask))
        cols = {n: kept.column(f"l_{n}") for n in left_names}
        cols.update(
            {n: pa.nulls(kept.num_rows, right_types[n]) for n in right_names}
        )
        return pa.table(cols)

    def _right_only(rrows: pa.Table, mask: np.ndarray) -> pa.Table:
        """Unmatched right rows: nulls for left columns, except the join
        key column, which carries the right key (SQL USING semantics)."""
        kept = rrows.filter(pa.array(mask))
        cols = {}
        for n in left_names:
            if n == on:
                cols[n] = kept.column(_KEY).cast(left_types[n])
            else:
                cols[n] = pa.nulls(kept.num_rows, left_types[n])
        cols.update({n: kept.column(f"r_{n}") for n in right_names})
        return pa.table(cols)

    def emit_bucket(group: pa.Table) -> pa.Table:
        side = group.column(_SIDE)
        lrows = group.filter(pc.equal(side, 0))
        rrows = group.filter(pc.equal(side, 1))
        if lrows.num_rows == 0:
            if how == "full" and rrows.num_rows:
                return _right_only(
                    rrows, np.ones(rrows.num_rows, dtype=bool)
                )
            return empty
        lk = np.asarray(lrows.column(_KEY), dtype=np.int64)
        if rrows.num_rows == 0:
            if how in ("left", "full"):
                return _left_only(lrows, np.ones(len(lk), dtype=bool))
            return empty
        rk = np.asarray(rrows.column(_KEY), dtype=np.int64)
        l_order = np.argsort(lk, kind="stable")
        r_order = np.argsort(rk, kind="stable")
        lk_s, rk_s = lk[l_order], rk[r_order]
        # per-key run starts/counts on both sorted sides
        lu, l_start, l_cnt = np.unique(lk_s, return_index=True, return_counts=True)
        ru, r_start, r_cnt = np.unique(rk_s, return_index=True, return_counts=True)
        # match the key sets
        li = np.searchsorted(ru, lu)
        li_clip = np.minimum(li, len(ru) - 1)
        common = ru[li_clip] == lu
        outer_parts = []
        mk = lu[common]
        if how in ("left", "full") and not common.all():
            if len(mk):
                pos = np.minimum(np.searchsorted(mk, lk), len(mk) - 1)
                unmatched = mk[pos] != lk
            else:
                unmatched = np.ones(len(lk), dtype=bool)
            outer_parts.append(_left_only(lrows, unmatched))
        if how == "full":
            if len(mk):
                pos = np.minimum(np.searchsorted(mk, rk), len(mk) - 1)
                r_unmatched = mk[pos] != rk
            else:
                r_unmatched = np.ones(len(rk), dtype=bool)
            if r_unmatched.any():
                outer_parts.append(_right_only(rrows, r_unmatched))
        if not common.any():
            if outer_parts:
                return pa.concat_tables(outer_parts)
            return empty
        lc, ls = l_cnt[common], l_start[common]
        rc = r_cnt[li_clip[common]]
        rs = r_start[li_clip[common]]
        # vectorized per-key cartesian: for key k with (lc, rc) rows the
        # output enumerates p = 0..lc*rc-1 as (p // rc, p % rc)
        m = lc * rc
        total = int(m.sum())
        key_id = np.repeat(np.arange(len(m)), m)
        p = np.arange(total) - np.repeat(np.cumsum(m) - m, m)
        l_idx = pa.array(l_order[ls[key_id] + p // rc[key_id]], pa.int64())
        r_idx = pa.array(r_order[rs[key_id] + p % rc[key_id]], pa.int64())
        cols = {}
        for n in left_names:
            cols[n] = lrows.column(f"l_{n}").take(l_idx)
        for n in right_names:
            cols[n] = rrows.column(f"r_{n}").take(r_idx)
        inner = pa.table(cols)
        if outer_parts:
            return pa.concat_tables([inner] + outer_parts)
        return inner

    return unioned.groupby(_BUCKET).map_groups(emit_bucket, batch_format="pyarrow")


def anti_join(
    left,
    right,
    *,
    on: str,
    right_on: str | None = None,
    n_buckets: int = DEFAULT_JOIN_BUCKETS,
):
    """Left ANTI equi-join: left rows whose key has NO match in right —
    the "new since the last snapshot" / incremental-dedup exchange.

    Same single bucketed sort-shuffle as :func:`hash_join`, but the
    right side ships only its key column, locally deduplicated per
    batch first (``pc.unique``), so a heavily-duplicated probe side
    costs one light int64 row per distinct key per block.  Per bucket
    the resolve is one sorted ``searchsorted`` membership test.

    Returns left's columns unchanged.
    """
    right_on = right_on or on

    left_schema = left.schema()
    left_names = list(left_schema.names)
    left_types = dict(zip(left_schema.names, left_schema.types))

    def tag_left(batch: pa.Table) -> pa.Table:
        cols = {f"l_{c}": batch.column(c) for c in left_names}
        key = batch.column(on).cast(pa.int64())
        cols[_KEY] = key
        cols[_BUCKET] = _bucket_of(key, n_buckets)
        cols[_SIDE] = pa.array([0] * batch.num_rows, pa.int8())
        return pa.table(cols)

    def tag_right(batch: pa.Table) -> pa.Table:
        key = pc.unique(
            batch.column(right_on).cast(pa.int64()).combine_chunks()
        )
        cols = {f"l_{c}": pa.nulls(len(key), left_types[c]) for c in left_names}
        cols[_KEY] = key
        cols[_BUCKET] = _bucket_of(key, n_buckets)
        cols[_SIDE] = pa.array([1] * len(key), pa.int8())
        return pa.table(cols)

    unioned = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )
    empty = pa.table({n: pa.array([], left_types[n]) for n in left_names})

    def emit_bucket(group: pa.Table) -> pa.Table:
        side = group.column(_SIDE)
        lrows = group.filter(pc.equal(side, 0))
        if lrows.num_rows == 0:
            return empty
        rkeys = np.unique(
            np.asarray(group.filter(pc.equal(side, 1)).column(_KEY), dtype=np.int64)
        )
        lk = np.asarray(lrows.column(_KEY), dtype=np.int64)
        if len(rkeys):
            pos = np.searchsorted(rkeys, lk)
            pos_clip = np.minimum(pos, len(rkeys) - 1)
            keep_mask = rkeys[pos_clip] != lk
        else:
            keep_mask = np.ones(len(lk), dtype=bool)
        kept = lrows.filter(pa.array(keep_mask))
        return pa.table({n: kept.column(f"l_{n}") for n in left_names})

    return unioned.groupby(_BUCKET).map_groups(emit_bucket, batch_format="pyarrow")


PAIR_CAP = 200  # bucket size above which all-pairs expansion is star-sampled


def _expand_ids(
    ids: np.ndarray, logger, what: str, strict: bool
) -> tuple[np.ndarray, np.ndarray] | None:
    """All-pairs (or star-sampled) expansion of one collision cluster's
    distinct ids — the numpy core shared by the per-group and bucketed
    candidate generators."""
    g = len(ids)
    if g < 2:
        return None
    if g <= PAIR_CAP:
        ii, jj = np.triu_indices(g, 1)
        return ids[ii], ids[jj]
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
    return np.full(g - 1, ids[0]), ids[1:]


def collision_pairs(
    group: pa.Table,
    key_col: str,
    id_col: str,
    a_col: str,
    b_col: str,
    logger,
    what: str,
    strict: bool = False,
) -> pa.Table:
    """Candidate pairs from a HASH BUCKET of LSH band rows.

    The group holds many distinct band keys (the grouping key is
    ``hash(band_key) % n_buckets``, not the band key itself — per-key
    groups would mean one Python callback per mostly-singleton key at
    corpus scale).  Collision runs are found with one lexsort +
    np.unique; only runs with ≥2 members — actual collisions, rare by
    construction — are expanded, under the PAIR_CAP star-sampling /
    strict-mode contract documented on :func:`_expand_ids`."""
    keys = np.asarray(group.column(key_col), dtype=np.int64)
    ids = np.asarray(group.column(id_col), dtype=np.int64)
    order = np.lexsort((ids, keys))
    ks, vs = keys[order], ids[order]
    _uk, start, cnt = np.unique(ks, return_index=True, return_counts=True)
    oa: list[np.ndarray] = []
    ob: list[np.ndarray] = []
    for s, c in zip(start[cnt >= 2], cnt[cnt >= 2]):
        expanded = _expand_ids(np.unique(vs[s : s + c]), logger, what, strict)
        if expanded is not None:
            oa.append(expanded[0])
            ob.append(expanded[1])
    if not oa:
        return pa.table(
            {a_col: pa.array([], pa.int64()), b_col: pa.array([], pa.int64())}
        )
    return pa.table(
        {
            a_col: pa.array(np.concatenate(oa), pa.int64()),
            b_col: pa.array(np.concatenate(ob), pa.int64()),
        }
    )




_CELL = "__range_cell"


def _ts_us(col):
    return pc.cast(pc.cast(col, pa.timestamp("us")), pa.int64())


def _expand_cells(batch: pa.Table, start_col: str, end_col: str, grid_us: int) -> pa.Table:
    """Replicate each half-open-interval row to every grid cell it
    overlaps (vectorized repeat + segmented iota; empty intervals expand
    to zero cells)."""
    starts = _ts_us(batch.column(start_col)).to_numpy(zero_copy_only=False)
    ends = _ts_us(batch.column(end_col)).to_numpy(zero_copy_only=False)
    first = starts // grid_us
    # last cell of the half-open interval: floor((end-1)/grid); empty
    # intervals ([s, s) or inverted) expand to zero cells — set
    # semantics: an empty span contains no instants and matches nothing
    last = (ends - 1) // grid_us
    counts = np.where(ends > starts, last - first + 1, 0).astype(np.int64)
    idx = np.repeat(np.arange(batch.num_rows, dtype=np.int64), counts)
    total = int(counts.sum())
    offs = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(counts) - counts, counts
    )
    cells = np.repeat(first, counts) + offs
    out = batch.take(pa.array(idx, pa.int64()))
    return out.append_column(_CELL, pa.array(cells, pa.int64()))


def range_join(
    left,
    right,
    *,
    left_ts: str,
    right_start: str,
    right_end: str,
    grid_us: int,
    n_buckets: int = DEFAULT_JOIN_BUCKETS,
):
    """Distributed range (interval) join: left rows whose ``left_ts``
    falls inside a right row's half-open ``[right_start, right_end)``.

    The classic grid-bucket reduction of a range join to an equi-join:
    each interval is replicated to every ``grid_us``-wide time cell it
    overlaps (a per-batch vectorized flat expansion — replication factor
    ≈ width/grid + 1), each point row is stamped with its single cell,
    and one :func:`hash_join` on the cell co-locates candidates; the
    exact containment predicate filters the cell-cartesian afterwards.
    All timestamps are compared as int64 epoch-µs (no tz/unit drift).

    Pick ``grid_us`` near the typical interval width: much smaller
    multiplies interval replication, much larger multiplies the
    per-cell cartesian.  Time-skewed points (one hot cell) inherit the
    equi-join's skew caveat — widen the grid or pre-split hot windows.
    Column layout: all left columns + all right columns (the cell key
    is internal and dropped).
    """

    _us = _ts_us

    def stamp_left(batch: pa.Table) -> pa.Table:
        # numpy floor division: matches _expand_cells for pre-epoch
        # (negative) timestamps too — Arrow's divide truncates toward
        # zero, which would stamp cell 0 for ts in (-grid, 0)
        ts = np.asarray(_us(batch.column(left_ts)), dtype=np.int64)
        cell = ts // grid_us
        return batch.append_column(_CELL, pa.array(cell, pa.int64()))

    def expand_right(batch: pa.Table) -> pa.Table:
        return _expand_cells(batch, right_start, right_end, grid_us)

    left_cells = left.map_batches(stamp_left, batch_format="pyarrow")
    right_cells = right.map_batches(expand_right, batch_format="pyarrow")
    joined = hash_join(
        left_cells, right_cells, on=_CELL, n_buckets=n_buckets, how="inner"
    )

    def contain(batch: pa.Table) -> pa.Table:
        ts = _us(batch.column(left_ts))
        ok = pc.and_(
            pc.greater_equal(ts, _us(batch.column(right_start))),
            pc.less(ts, _us(batch.column(right_end))),
        )
        return batch.filter(ok).drop_columns([_CELL])

    return joined.map_batches(contain, batch_format="pyarrow")


def interval_overlap_join(
    left,
    right,
    *,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    grid_us: int,
    n_buckets: int = DEFAULT_JOIN_BUCKETS,
):
    """Distributed interval-overlap join: pairs whose half-open spans
    intersect (``l.start < r.end AND r.start < l.end``).

    Both sides expand to their grid cells (:func:`_expand_cells`); one
    bucketed equi-join on the cell generates candidates.  An overlapping
    pair co-occurs in EVERY cell its spans share, so the join emits each
    pair exactly once by keeping only the FIRST shared cell —
    ``cell == max(floor(l.start/g), floor(r.start/g))`` — the standard
    dedup-free reduction (no second distinct shuffle needed).  Pick the
    grid near the typical interval width; replication ≈ width/grid + 1
    per side.
    """

    def contain(batch: pa.Table) -> pa.Table:
        ls = _ts_us(batch.column(left_start))
        le = _ts_us(batch.column(left_end))
        rs = _ts_us(batch.column(right_start))
        re = _ts_us(batch.column(right_end))
        overlap = pc.and_(pc.less(ls, re), pc.less(rs, le))
        # floor division in numpy: Arrow divide truncates toward zero,
        # which would disagree with _expand_cells' flooring for
        # pre-epoch (negative) starts and silently drop those pairs
        ls_np = np.asarray(ls, dtype=np.int64)
        rs_np = np.asarray(rs, dtype=np.int64)
        first_shared = pa.array(
            np.maximum(ls_np // grid_us, rs_np // grid_us), pa.int64()
        )
        once = pc.equal(batch.column(_CELL), first_shared)
        return batch.filter(pc.and_(overlap, once)).drop_columns([_CELL])

    left_cells = left.map_batches(
        lambda b: _expand_cells(b, left_start, left_end, grid_us),
        batch_format="pyarrow",
    )
    right_cells = right.map_batches(
        lambda b: _expand_cells(b, right_start, right_end, grid_us),
        batch_format="pyarrow",
    )
    joined = hash_join(
        left_cells, right_cells, on=_CELL, n_buckets=n_buckets, how="inner"
    )
    return joined.map_batches(contain, batch_format="pyarrow")


_SKEW_HOT_KEY_LIMIT = 100_000  # driver-side hot-key set bound


def skew_join(
    left,
    right,
    *,
    on: str,
    right_on: str | None = None,
    hot_threshold: int = 10_000,
    n_buckets: int = DEFAULT_JOIN_BUCKETS,
    materialize_left: bool = False,
):
    """Skew-aware inner equi-join: keys whose LEFT-side frequency reaches
    ``hot_threshold`` take the broadcast path (their right-side rows are
    ``ray.put`` once and matched inside ``map_batches`` — no shuffle can
    co-locate a mega-key on one task), everything else takes the normal
    bucketed :func:`hash_join`.  The standard hot-key split: without it,
    one key owning 10% of a 10¹⁰-row fact table routes 10⁹ rows through
    ONE join task.

    Assumes the dimension-table shape on the right: few rows per hot key
    (the broadcast side is ``|hot keys| × right-rows-per-key``, and the
    hot-key SET itself is bounded by ``|left| / hot_threshold``, both
    enforced against ``_SKEW_HOT_KEY_LIMIT``).  Hot right rows are
    collected by a DISTRIBUTED filter pass — only the (bounded)
    survivors plus one count-sentinel row per block reach the driver,
    never the right table itself — and the same pass yields the right
    row total, so no second ``count()`` execution.  Output column layout
    matches :func:`hash_join` (left columns + right columns minus the
    right key); row order is not significant, as with every join here.

    ``materialize_left``: the left lineage is consumed three times (key
    counts, hot map, cold map).  For a plain read that recompute is
    cheaper than pinning the table; for an expensive derived left, pass
    True to materialize once and trade object-store footprint for the
    3× recompute.
    """
    import ray
    from ray.data.aggregate import Sum

    right_on = right_on or on
    right_names = [n for n in right.schema().names if n != right_on]
    if materialize_left:
        left = left.materialize()

    def key_counts(batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch.column(on), dtype=np.int64)
        u, c = np.unique(keys, return_counts=True)
        # light combiner: only keys that could plausibly go hot matter,
        # but partial counts must SUM across blocks, so ship all uniques
        return pa.table(
            {
                "k": pa.array(u, pa.int64()),
                "c": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    counts = (
        left.map_batches(key_counts, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("c"))
    )
    hot_rows = counts.map_batches(
        # vectorized filter: counts has one row per DISTINCT left key —
        # a per-row Python callback here is the max-overhead shape
        lambda b: b.filter(pc.greater_equal(b.column("sum(c)"), hot_threshold)),
        batch_format="pyarrow",
    ).take_all()  # ≤ |left| / hot_threshold rows by construction
    if len(hot_rows) > _SKEW_HOT_KEY_LIMIT:
        raise ValueError(
            f"skew_join: {len(hot_rows)} hot keys exceed the broadcast "
            f"bound {_SKEW_HOT_KEY_LIMIT}; raise hot_threshold"
        )
    hot_keys = frozenset(int(r["k"]) for r in hot_rows)

    if not hot_keys:
        return hash_join(left, right, on=on, right_on=right_on, n_buckets=n_buckets)

    hot_arr = pa.array(sorted(hot_keys), pa.int64())

    probe_fields = list(zip(right.schema().names, right.schema().types))
    _PROBE_N = "__skew_probe_n"

    def probe_hot(batch: pa.Table) -> pa.Table:
        """Distributed hot-row filter: emits the batch's hot rows
        (``_PROBE_N`` = 0) plus ONE count-sentinel row carrying the
        batch's total row count — so the driver learns |right| from the
        same pass that collects the (bounded) broadcast side."""
        hot = batch.filter(pc.is_in(batch.column(right_on), value_set=hot_arr))
        if hot.num_rows > _SKEW_HOT_KEY_LIMIT:
            # fail inside the task, before anything ships to the driver
            raise ValueError(
                f"skew_join: right side has >{_SKEW_HOT_KEY_LIMIT} rows for "
                "hot keys in one block — not the dimension shape this "
                "broadcast assumes"
            )
        hot = hot.append_column(
            _PROBE_N, pa.array(np.zeros(hot.num_rows, dtype=np.int64), pa.int64())
        )
        if batch.num_rows == 0:
            return hot
        sentinel = pa.table(
            {
                **{n: pa.nulls(1, t) for n, t in probe_fields},
                _PROBE_N: pa.array([batch.num_rows], pa.int64()),
            }
        )
        return pa.concat_tables([hot, sentinel])

    # batch_size=None → whole-block batches: one sentinel row per block
    probe = right.map_batches(probe_hot, batch_format="pyarrow", batch_size=None)
    empty_probe = pa.table(
        {
            **{n: pa.array([], t) for n, t in probe_fields},
            _PROBE_N: pa.array([], pa.int64()),
        }
    )
    # gather as Arrow block refs (schema-exact, zero row re-inference);
    # the empty seed keeps an all-empty right side a typed empty join
    parts = [t for t in ray.get(probe.to_arrow_refs()) if t.num_rows]
    tbl = pa.concat_tables([empty_probe] + parts)
    right_total = int(pc.sum(tbl.column(_PROBE_N)).as_py() or 0)
    right_hot_tbl = tbl.filter(pc.equal(tbl.column(_PROBE_N), 0)).drop_columns(
        [_PROBE_N]
    )
    if right_hot_tbl.num_rows > _SKEW_HOT_KEY_LIMIT:
        raise ValueError(
            f"skew_join: right side has {right_hot_tbl.num_rows} rows for "
            "hot keys — not the dimension shape this broadcast assumes"
        )
    # sorted by key ONCE here, so the per-batch hot path is pure
    # searchsorted — no argsort or table copy per batch
    right_hot_tbl = right_hot_tbl.sort_by(right_on)
    hot_ref = ray.put(right_hot_tbl)

    all_right_hot = right_total == right_hot_tbl.num_rows

    left_cold = left.map_batches(
        lambda b: b.filter(
            pc.invert(pc.is_in(b.column(on), value_set=hot_arr))
        ),
        batch_format="pyarrow",
    )
    right_cold = right.map_batches(
        lambda b: b.filter(
            pc.invert(pc.is_in(b.column(right_on), value_set=hot_arr))
        ),
        batch_format="pyarrow",
    )
    def hot_match(batch: pa.Table) -> pa.Table:
        rt = ray.get(hot_ref)  # already key-sorted
        sel = batch.filter(pc.is_in(batch.column(on), value_set=hot_arr))
        rk_s = np.asarray(rt.column(right_on), dtype=np.int64)
        lk = np.asarray(sel.column(on), dtype=np.int64)
        starts = np.searchsorted(rk_s, lk, side="left")
        stops = np.searchsorted(rk_s, lk, side="right")
        reps = (stops - starts).astype(np.int64)
        left_idx = np.repeat(np.arange(len(lk)), reps)
        # right-row indices: per left row, the contiguous [start, stop) run
        right_idx = np.concatenate(
            [np.arange(s, e) for s, e in zip(starts, stops)]
        ) if len(lk) else np.array([], dtype=np.int64)
        out = {
            c: sel.column(c).take(pa.array(left_idx, pa.int64()))
            for c in sel.column_names
        }
        for c in right_names:
            out[c] = rt.column(c).take(pa.array(right_idx, pa.int64()))
        return pa.table(out)

    hot = left.map_batches(hot_match, batch_format="pyarrow")
    if all_right_hot:
        # every right row (possibly zero) is on the broadcast side: the
        # cold inner join is provably empty — skip its barrier entirely
        # (this also sidesteps schema inference on an empty mapped side)
        return hot
    cold = hash_join(
        left_cold, right_cold, on=on, right_on=right_on, n_buckets=n_buckets
    )
    return cold.union(hot)
