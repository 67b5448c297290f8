"""Sketch operators: approximate distinct counting for 100 TB streams.

``hll_registers`` builds a HyperLogLog register table with ONE tiny
shuffle: per-batch partial register maxima (≤ 2^p light rows per block)
→ a keyed ``Max`` groupby.  The registers are pure integers derived
from md5, so a SQL oracle reproduces them bit-for-bit (DuckDB
``bin``/``strpos`` gives an exact leading-zero count — no float log2
anywhere on either side).  The float *estimate* is a driver-side fold
over ≤ 2^p rows (``hll_estimate``), verified statistically in pytest —
approximation quality is not SQL-expressible, register exactness is.

At 100 TB the value: distinct-URL / distinct-document counts without
the exact-distinct shuffle (`analytics.distinct_users_by_type` moves
every key; this moves 2^p × n_blocks rows, constant per block).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def _md5_u64(values: list) -> np.ndarray:
    """Big-endian first 8 md5 bytes of str(v) — the full 64-bit hash
    (matches SQL ``('0x'||substr(md5(v),1,16))::UBIGINT``)."""
    return np.array(
        [
            int.from_bytes(
                hashlib.md5(str(v).encode("utf-8")).digest()[:8], "big"
            )
            for v in values
        ],
        dtype=np.uint64,
    )


def _bit_length_u64(v: np.ndarray) -> np.ndarray:
    """Exact vectorized bit_length (no float log2 — values above 2^53
    would round across power-of-two boundaries)."""
    v = v.copy()
    bl = np.zeros(v.shape, dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        m = v >= (np.uint64(1) << np.uint64(s))
        bl[m] += s
        v[m] >>= np.uint64(s)
    bl[v > 0] += 1
    return bl


def hll_registers(ds, *, col: str, p: int = 10):
    """column → non-empty HLL registers (bucket, rho_max); nulls skipped.

    bucket = top ``p`` hash bits; rho = leading zeros of the remaining
    ``64-p`` bits + 1 (the classic HLL rank).  Output ≤ 2^p rows.
    """
    from ray.data.aggregate import Max

    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    rest_bits = 64 - p

    def partial(batch: pa.Table) -> pa.Table:
        chunk = batch.column(col).drop_null()
        vals = chunk.to_pylist()
        if not vals:
            return pa.table(
                {
                    "bucket": pa.array([], pa.int64()),
                    "rho": pa.array([], pa.int64()),
                }
            )
        h = _md5_u64(vals)
        bucket = (h >> np.uint64(rest_bits)).astype(np.int64)
        rest = h & ((np.uint64(1) << np.uint64(rest_bits)) - np.uint64(1))
        rho = rest_bits - _bit_length_u64(rest) + 1
        # local max per bucket (combiner): ships ≤ 2^p rows per block
        order = np.lexsort((-rho, bucket))
        b_s, r_s = bucket[order], rho[order]
        first = np.r_[True, b_s[1:] != b_s[:-1]]
        return pa.table(
            {
                "bucket": pa.array(b_s[first], pa.int64()),
                "rho": pa.array(r_s[first], pa.int64()),
            }
        )

    from .combine import tree_combine

    def combine(b: pa.Table) -> pa.Table:
        t = b.group_by("bucket").aggregate([("rho", "max")])
        return pa.table(
            {"bucket": t.column("bucket"), "rho": t.column("rho_max")}
        )

    # ≤ 2^p register rows: one merge task beats the sort exchange
    return tree_combine(
        ds.map_batches(partial, batch_format="pyarrow"), combine
    ).map_batches(
        lambda b: pa.table(
            {
                "bucket": b.column("bucket"),
                "rho_max": b.column("rho").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
        batch_size=None,
    )


def hll_estimate(registers, *, p: int = 10) -> float:
    """Fold ≤ 2^p register rows into the HLL cardinality estimate
    (Flajolet et al. 2007 bias constant + small-range linear counting).
    ``registers`` is the :func:`hll_registers` result (Dataset or rows).
    """
    m = 1 << p
    rows = registers.take_all() if hasattr(registers, "take_all") else registers
    reg = np.zeros(m, dtype=np.int64)
    for r in rows:
        reg[r["bucket"]] = r["rho_max"]
    if p == 4:
        alpha = 0.673
    elif p == 5:
        alpha = 0.697
    elif p == 6:
        alpha = 0.709
    else:
        alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-reg.astype(np.float64)))
    if est <= 2.5 * m:
        zeros = int(np.count_nonzero(reg == 0))
        if zeros:
            return float(m * np.log(m / zeros))
    return float(est)

def countmin_sketch(ds, *, col: str = "text", depth: int = 4, width: int = 256):
    """Token-frequency Count-Min sketch over a text column: counters
    (row_id, col_id, counter) with counter = Σ counts of tokens whose
    row-``row_id`` hash lands in col_id.

    Per-batch Counter combiner (one partial row per (row, col) per
    block, ≤ depth×width) → one keyed Sum groupby over light rows.  The
    row hashes are md5(f"{row}:{token}") — pure integers the SQL oracle
    recomputes.  Query with :func:`countmin_estimate` (min over rows:
    an upper-bounded overestimate, never an undercount).
    """
    from collections import Counter

    from ray.data.aggregate import Sum

    from .cleaning import _hash63_cached

    def partial(batch: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        for t in batch.column(col).to_pylist():
            counts.update((t or "").split())
        cells: Counter = Counter()
        for tok, c in counts.items():
            for j in range(depth):
                cells[(j, _hash63_cached(f"{j}:{tok}") % width)] += c
        return pa.table(
            {
                "row_id": pa.array([rc[0] for rc in cells], pa.int64()),
                "col_id": pa.array([rc[1] for rc in cells], pa.int64()),
                "c": pa.array(list(cells.values()), pa.int64()),
            }
        )

    from .combine import combine_sum_by

    # ≤ depth×width counter cells: one merge task beats the sort exchange
    agg = combine_sum_by(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["row_id", "col_id"],
        ["c"],
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "row_id": b.column("row_id"),
                "col_id": b.column("col_id"),
                "counter": b.column("c").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
        batch_size=None,
    )


def countmin_estimate(sketch, token: str, *, depth: int = 4, width: int = 256) -> int:
    """Point-query the sketch: min over rows of the token's counter.
    ``sketch`` is the :func:`countmin_sketch` result (Dataset or rows)."""
    from .cleaning import _hash63_cached

    rows = sketch.take_all() if hasattr(sketch, "take_all") else sketch
    table = {(r["row_id"], r["col_id"]): r["counter"] for r in rows}
    return min(
        table.get((j, _hash63_cached(f"{j}:{token}") % width), 0)
        for j in range(depth)
    )


def heavy_hitters(
    ds,
    *,
    col: str = "text",
    threshold: int = 50,
    support: int | None = None,
    ngram: int = 1,
):
    """Exact frequency-threshold heavy hitters in two passes (the
    TPUT-style prune-then-verify shape) — every token whose TOTAL corpus
    frequency reaches ``threshold``, with exact counts, without ever
    shuffling the full vocabulary.

    Pass 1 (candidates): each batch counts its own tokens and emits only
    those with local count ≥ L (the support), as light rows
    ``(token, cnt, delta)`` with ``delta = cnt - bound_b`` where
    ``bound_b`` is the batch's truncation ceiling (largest NON-emitted
    count, ≤ L-1), plus one marker row ``("", 0, bound_b)``.  One Sum
    groupby gives every surviving token's upper bound
    ``upper(t) = U + Σ delta`` with ``U = Σ_b bound_b`` (the marker
    sum) — valid because a batch where t was not emitted contributes at
    most ``bound_b``.  Candidates = ``upper >= threshold``.

    No-false-negative guarantee: a token ABSENT from every batch's
    emission has true total ≤ U ≤ B·(L-1).  The support auto-sizes to
    ``L = max(1, threshold // (2·B_est))`` (``B_est`` from a one-row-
    per-batch pre-pass), making that ceiling ≤ threshold/2; the exact
    ``U < threshold`` condition is REASSERTED at runtime from the marker
    sum, so a batch-count drift can only fail loudly, never silently
    drop a heavy hitter.  Tokens present somewhere keep a valid upper
    bound regardless of L (pigeonhole: total ≥ threshold over B batches
    ⇒ some batch count ≥ threshold/B ≥ L).

    Pass 2 (exact verify): the candidate set is broadcast (``ray.put``
    once, read per task), each batch recounts ONLY candidate tokens
    (partial combiner), one Sum groupby over ≤ |candidates| keys, filter
    ``n >= threshold``.  The result is exactly SQL's
    ``GROUP BY token HAVING count(*) >= threshold``.

    100 TB shape: pass-1 emission is ≤ batch_tokens/L rows per batch;
    the only shuffles are over supported-candidate keys, never the full
    vocabulary (contrast ``top_tokens``, which shuffles every distinct
    token).
    """
    import ray
    from collections import Counter

    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    if threshold < 1:
        raise ValueError(f"threshold must be >= 1, got {threshold}")
    if ngram < 1:
        raise ValueError(f"ngram must be >= 1, got {ngram}")

    def _toks(t):
        w = (t or "").split()
        if ngram == 1:
            return w
        return [" ".join(w[i : i + ngram]) for i in range(len(w) - ngram + 1)]

    if support is None:
        # one-row-per-batch pre-pass: an over-count of pass-1 batches can
        # only LOWER L (safe); the ×2 margin absorbs batch-formation
        # drift between passes, and the U < threshold assert backstops it
        b_est = (
            ds.map_batches(
                lambda b: pa.table({"one": pa.array([1], pa.int64())}),
                batch_format="pyarrow",
            ).count()
            or 1
        )
        support = max(1, threshold // (2 * b_est))

    def partial_support(batch: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        for t in batch.column(col).to_pylist():
            counts.update(_toks(t))
        top = [(t, c) for t, c in counts.items() if c >= support]
        excluded = [c for c in counts.values() if c < support]
        bound = max(excluded) if excluded else 0
        toks = [t for t, _ in top] + [""]
        cnts = [c for _, c in top] + [0]
        deltas = [c - bound for _, c in top] + [bound]
        return pa.table(
            {
                "token": pa.array(toks, pa.string()),
                "cnt": pa.array(cnts, pa.int64()),
                "delta": pa.array(deltas, pa.int64()),
            }
        )

    summary = (
        ds.map_batches(partial_support, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("cnt"), Sum("delta"))
        .materialize()  # small by design: ≤ batch_tokens/L rows per batch
    )
    marker = summary.map_batches(
        lambda b: b.filter(pc.equal(b.column("token"), "")),
        batch_format="pyarrow",
    ).take_all()
    u_total = int(marker[0]["sum(delta)"]) if marker else 0
    if support > 1 and u_total >= threshold:
        raise ValueError(
            f"heavy_hitters: truncation mass U={u_total} >= threshold="
            f"{threshold} — an all-absent token could be a heavy hitter; "
            f"rerun with support <= {max(1, threshold // (2 * (u_total // max(1, support - 1) + 1)))}"
        )
    cand_rows = (
        summary.map_batches(
            lambda b: b.filter(
                pc.and_(
                    pc.not_equal(b.column("token"), ""),
                    pc.greater_equal(
                        pc.add(b.column("sum(delta)"), u_total), threshold
                    ),
                )
            ),
            batch_format="pyarrow",
        )
        .select_columns(["token"])
        .take_all()
    )
    candidates = frozenset(r["token"] for r in cand_rows)
    cand_ref = ray.put(candidates)

    def recount(batch: pa.Table) -> pa.Table:
        cand = ray.get(cand_ref)
        counts: Counter = Counter()
        for t in batch.column(col).to_pylist():
            counts.update(tok for tok in _toks(t) if tok in cand)
        return pa.table(
            {
                "token": pa.array(list(counts.keys()), pa.string()),
                "c": pa.array(list(counts.values()), pa.int64()),
            }
        )

    from .combine import combine_sum_by

    # candidate keys already fit a broadcast set: one merge task beats
    # the sort exchange for the exact recount rollup
    exact = combine_sum_by(
        ds.map_batches(recount, batch_format="pyarrow"), ["token"], ["c"]
    )
    return exact.map_batches(
        lambda b: pa.table(
            {
                "token": b.column("token"),
                "n": b.column("c").cast(pa.int64()),
            }
        ).filter(pc.greater_equal(pc.field("n"), threshold)),
        batch_format="pyarrow",
        batch_size=None,
    )


def grouped_hll_registers(ds, *, group_col: str, col: str, p: int = 8):
    """Per-GROUP HLL registers over the whitespace tokens of a text
    column → (group, bucket, rho_max): the mergeable-sketch answer to
    "distinct tokens per host" — per-batch (group, bucket) partial
    maxima (≤ groups×2^p light rows per block, usually far fewer) → one
    keyed Max groupby.  Same exact-integer rho as :func:`hll_registers`,
    so the SQL oracle reproduces every register; estimates come from
    :func:`hll_estimate` applied per group (pytest-verified accuracy).

    At 100 TB this replaces a per-group exact COUNT(DISTINCT token)
    shuffle (every (group, token) pair moves) with constant-size rows
    per group per block.
    """
    from ray.data.aggregate import Max

    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    rest_bits = 64 - p
    # the group output column keeps the INPUT column's Arrow type (an
    # int host id groups as int64, a host string as string) — hardcoding
    # pa.string() here would mis-type or reject non-string group keys
    _schema = ds.schema()
    group_type = dict(zip(_schema.names, _schema.types))[group_col]

    def partial(batch: pa.Table) -> pa.Table:
        pairs: set = set()
        for g, t in zip(
            batch.column(group_col).to_pylist(), batch.column(col).to_pylist()
        ):
            if g is None:
                continue  # null groups skipped, like hll_registers' drop_null
            for tok in (t or "").split():
                pairs.add((g, tok))
        if not pairs:
            return pa.table(
                {
                    "group": pa.array([], group_type),
                    "bucket": pa.array([], pa.int64()),
                    "rho": pa.array([], pa.int64()),
                }
            )
        groups = [g for g, _ in pairs]
        h = _md5_u64([tok for _, tok in pairs])
        bucket = (h >> np.uint64(rest_bits)).astype(np.int64)
        rest = h & ((np.uint64(1) << np.uint64(rest_bits)) - np.uint64(1))
        rho = rest_bits - _bit_length_u64(rest) + 1
        # local max per (group, bucket): lexsort + run boundaries
        gidx = np.unique(np.asarray(groups), return_inverse=True)[1]
        order = np.lexsort((-rho, bucket, gidx))
        gs = np.asarray(groups, dtype=object)[order]
        b_s, r_s = bucket[order], rho[order]
        g_s = gidx[order]
        first = np.r_[True, (g_s[1:] != g_s[:-1]) | (b_s[1:] != b_s[:-1])]
        return pa.table(
            {
                "group": pa.array(list(gs[first]), group_type),
                "bucket": pa.array(b_s[first], pa.int64()),
                "rho": pa.array(r_s[first], pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["group", "bucket"])
        .aggregate(Max("rho"))
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "group": b.column("group"),
                "bucket": b.column("bucket"),
                "rho_max": b.column("max(rho)").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def corpus_checksum(ds, *, id_col: str = "doc_id", text_col: str = "text"):
    """Order-insensitive corpus integrity checksum → ONE row
    (n_docs, sum_hash, xor_hash): per-row 63-bit md5 of ``id:text``,
    combined with the two commutative monoids (wrapping sum mod 2^63
    and xor), so any block order / partitioning / resume path yields
    the same digest — the cheap way to assert two 100 TB copies (or a
    rerun after failover) are row-identical without a sort or join.

    Per-batch partials are a single (cnt, sum, xor) row each → a tiny
    driver fold; nothing shuffles.
    """
    _MASK = (1 << 63) - 1

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        # shared md5 fold (_md5_u64, the SQL-idiom hash) >> 1 to 63 bits;
        # uint64 wrapping sum then mask IS sum mod 2^63 (mod 2^63 factors
        # through mod 2^64), so the vectorized fold matches the oracle
        h = _md5_u64([f"{i}:{t or ''}" for i, t in zip(ids, texts)]) >> np.uint64(1)
        s = int(h.sum(dtype=np.uint64)) & _MASK if len(h) else 0
        x = int(np.bitwise_xor.reduce(h)) if len(h) else 0
        return pa.table(
            {
                "cnt": pa.array([len(ids)], pa.int64()),
                "s": pa.array([s], pa.int64()),
                "x": pa.array([x], pa.int64()),
            }
        )

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    n = sum(r["cnt"] for r in rows)
    s = 0
    x = 0
    for r in rows:
        s = (s + r["s"]) & _MASK
        x ^= r["x"]
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "n_docs": pa.array([n], pa.int64()),
                "sum_hash": pa.array([s], pa.int64()),
                "xor_hash": pa.array([x], pa.int64()),
            }
        )
    )
