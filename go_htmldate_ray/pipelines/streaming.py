"""Streaming-shaped operators over the events table.

Ray Data lacks these as primitives, so they're composed per the custom-
operator ladder (map_batches + groupby().map_groups + sort):

- **Tumbling-window aggregate**: window assignment is a vectorized batch
  map (pure arithmetic on timestamps — the partial/combiner step), the
  final combine is a small groupby on (window, type).
- **As-of join**: the small side (orders per customer, sorted by date)
  is broadcast once via ``ray.put``; each event batch binary-searches its
  user's order history.  At 100 TB the same shape co-partitions both
  sides on the key and sort-merges within partitions — the partitioning
  assumption (events and orders hash-partitioned on the same key) is the
  one documented in SURVEY.md §2.6.
- **Sessionization**: groupby(user) → per-group sort by time → gap scan.
  Ordering is only assumed *within* a user group, which the groupby
  guarantees; session ids are deterministic (user_id * 10^6 + index).
"""

from __future__ import annotations

import bisect
from datetime import timedelta

import pyarrow as pa
import pyarrow.compute as pc
from ..sources.io import read_parquet_clean

SESSION_GAP_MINUTES = 30


def windowed_events(sf_dir: str):
    """events → (window_start, event_type, n_events, sum_value) over
    tumbling 1-hour windows."""
    import ray.data

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )

    def assign_and_partial(batch: pa.Table) -> pa.Table:
        window = pc.floor_temporal(batch.column("ts"), unit="hour")
        batch = batch.set_column(0, "window_start", window)
        t = batch.group_by(["window_start", "event_type"]).aggregate(
            [("value", "sum"), ("value", "count")]
        )
        return pa.table(
            {
                "window_start": t.column("window_start"),
                "event_type": t.column("event_type"),
                "part_sum": t.column("value_sum"),
                "part_count": t.column("value_count"),
            }
        )

    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(assign_and_partial, batch_format="pyarrow")
        .groupby(["window_start", "event_type"])
        .aggregate(Sum("part_sum"), Sum("part_count"))
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                # string timestamps: engine-independent value hashing
                "window_start": pc.strftime(b.column("window_start"), format="%Y-%m-%d %H:%M:%S"),
                "event_type": b.column("event_type"),
                "n_events": pc.cast(b.column("sum(part_count)"), pa.int64()),
                "sum_value": pc.round(b.column("sum(part_sum)"), ndigits=2),
            }
        ),
        batch_format="pyarrow",
    )


_ASOF_BROADCAST_ROW_LIMIT = 1_000_000  # small-side bound for the orders table


def asof_join_latest_order(sf_dir: str, mode: str = "auto"):
    """events ⟕asof orders: for each event, the latest order of the same
    customer placed on or before the event date → (event_id, o_orderkey);
    -1 when the customer has no earlier order.

    ``mode``: "broadcast" ships the per-customer order history once via
    ``ray.put`` (right while orders ≪ events); "copartition" is the
    scale path — both sides hash-co-located on the customer key by one
    union + groupby shuffle, the as-of walk running per key group with
    no driver-side or broadcast state.  "auto" picks by orders row
    count."""
    import pyarrow.parquet as pq
    import ray
    import ray.data

    if mode == "auto":
        n_orders = pq.ParquetFile(f"{sf_dir}/orders.parquet").metadata.num_rows
        mode = "broadcast" if n_orders <= _ASOF_BROADCAST_ROW_LIMIT else "copartition"
    if mode == "copartition":
        return _asof_latest_order_copartition(sf_dir)

    orders = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate", "o_orderkey"]
    )
    by_cust: dict[int, list[tuple]] = {}
    for ck, od, ok in zip(
        orders.column("o_custkey").to_pylist(),
        orders.column("o_orderdate").to_pylist(),
        orders.column("o_orderkey").to_pylist(),
    ):
        if hasattr(od, "date"):
            od = od.date()
        by_cust.setdefault(ck, []).append((od, ok))
    for ck in by_cust:
        # Ties on date resolve to the highest orderkey, matching the SQL
        # row_number ordering (o_orderdate DESC, o_orderkey DESC).
        by_cust[ck].sort()
    orders_ref = ray.put(by_cust)

    events = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )

    def join(batch: pa.Table) -> pa.Table:
        table = ray.get(orders_ref)
        out = []
        for uid, ts in zip(
            batch.column("user_id").to_pylist(), batch.column("ts").to_pylist()
        ):
            hist = table.get(uid)
            if not hist:
                out.append(-1)
                continue
            d = ts.date()
            idx = bisect.bisect_right(hist, (d, float("inf")))
            if idx == 0:
                out.append(-1)
            else:
                # among same latest date, take max orderkey
                latest_date = hist[idx - 1][0]
                k = idx - 1
                best = hist[k][1]
                while k > 0 and hist[k - 1][0] == latest_date:
                    k -= 1
                    best = max(best, hist[k][1])
                out.append(best)
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "o_orderkey": pa.array(out, pa.int64()),
            }
        )

    return events.map_batches(join, batch_format="pyarrow")


def _asof_latest_order_copartition(sf_dir: str):
    """Co-partitioned as-of join: events and orders are tagged, unioned
    and hash-co-located on the customer key by ONE groupby shuffle; the
    as-of walk (sort orders, bisect per event) runs inside each key
    group.  Nothing is broadcast and the driver holds no state — the
    shape that survives an orders table too large for ``ray.put``."""
    import ray.data

    events = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate", "o_orderkey"]
    )

    def tag_events(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "key": batch.column("user_id").cast(pa.int64()),
                "is_order": pa.array([False] * n, pa.bool_()),
                "event_id": batch.column("event_id").cast(pa.int64()),
                "ts": batch.column("ts").cast(pa.timestamp("us")),
                "o_orderkey": pa.nulls(n, pa.int64()),
                "o_orderdate": pa.nulls(n, pa.date32()),
            }
        )

    def tag_orders(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "key": batch.column("o_custkey").cast(pa.int64()),
                "is_order": pa.array([True] * n, pa.bool_()),
                "event_id": pa.nulls(n, pa.int64()),
                "ts": pa.nulls(n, pa.timestamp("us")),
                "o_orderkey": batch.column("o_orderkey").cast(pa.int64()),
                "o_orderdate": batch.column("o_orderdate").cast(pa.date32()),
            }
        )

    unioned = events.map_batches(tag_events, batch_format="pyarrow").union(
        orders.map_batches(tag_orders, batch_format="pyarrow")
    )

    empty = pa.table(
        {"event_id": pa.array([], pa.int64()), "o_orderkey": pa.array([], pa.int64())}
    )

    def asof_group(group: pa.Table) -> pa.Table:
        mask = group.column("is_order")
        order_rows = group.filter(mask)
        event_rows = group.filter(pa.compute.invert(mask))
        if event_rows.num_rows == 0:
            return empty
        hist = sorted(
            zip(
                order_rows.column("o_orderdate").to_pylist(),
                order_rows.column("o_orderkey").to_pylist(),
            )
        )
        out = []
        for ts in event_rows.column("ts").to_pylist():
            if not hist:
                out.append(-1)
                continue
            d = ts.date()
            idx = bisect.bisect_right(hist, (d, float("inf")))
            if idx == 0:
                out.append(-1)
            else:
                latest_date = hist[idx - 1][0]
                k = idx - 1
                best = hist[k][1]
                while k > 0 and hist[k - 1][0] == latest_date:
                    k -= 1
                    best = max(best, hist[k][1])
                out.append(best)
        return pa.table(
            {
                "event_id": event_rows.column("event_id"),
                "o_orderkey": pa.array(out, pa.int64()),
            }
        )

    return unioned.groupby("key").map_groups(asof_group, batch_format="pyarrow")


def sessionize_events(sf_dir: str):
    """events → (event_id, session_id): a new session starts when a user's
    gap since their previous event exceeds 30 minutes.
    session_id = user_id * 10^6 + per-user session index (0-based)."""
    import ray.data

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )

    gap = timedelta(minutes=SESSION_GAP_MINUTES)

    def sessionize(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        g = group.take(order)
        uid = g.column("user_id")[0].as_py()
        tss = g.column("ts").to_pylist()
        session_idx = 0
        ids = []
        prev = None
        for ts in tss:
            if prev is not None and (ts - prev) > gap:
                session_idx += 1
            ids.append(uid * 10**6 + session_idx)
            prev = ts
        return pa.table(
            {
                "event_id": g.column("event_id"),
                "session_id": pa.array(ids, pa.int64()),
            }
        )

    return ds.groupby("user_id").map_groups(sessionize, batch_format="pyarrow")


def sliding_window_events(sf_dir: str, window_hours: int = 2, hop_hours: int = 1):
    """events → (window_start, event_type, n_events, sum_value) over
    SLIDING windows (window > hop ⇒ each event lands in window/hop
    windows).  Same combiner-before-shuffle shape as the tumbling
    variant: window replication + per-batch partial aggregation is pure
    batch arithmetic, the final groupby moves one row per
    (window, type) per block."""
    import ray.data
    from ray.data.aggregate import Sum

    if window_hours % hop_hours:
        raise ValueError("window must be a multiple of hop")
    n_offsets = window_hours // hop_hours
    hop_us = hop_hours * 3_600_000_000

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )

    def assign_and_partial(batch: pa.Table) -> pa.Table:
        base = pc.floor_temporal(batch.column("ts"), multiple=hop_hours, unit="hour")
        # pin the unit before dropping to int64 arithmetic — a ts column
        # stored as timestamp[ns]/[s] would otherwise shift by the wrong
        # magnitude when hop_us is subtracted
        base_us = pc.cast(pc.cast(base, pa.timestamp("us")), pa.int64())
        parts = []
        for j in range(n_offsets):
            shifted = pc.cast(
                pc.subtract(base_us, j * hop_us), pa.timestamp("us")
            )
            parts.append(
                pa.table(
                    {
                        "window_start": shifted,
                        "event_type": batch.column("event_type"),
                        "value": batch.column("value"),
                    }
                )
            )
        t = (
            pa.concat_tables(parts)
            .group_by(["window_start", "event_type"])
            .aggregate([("value", "sum"), ("value", "count")])
        )
        return pa.table(
            {
                "window_start": t.column("window_start"),
                "event_type": t.column("event_type"),
                "part_sum": t.column("value_sum"),
                "part_count": t.column("value_count"),
            }
        )

    agg = (
        ds.map_batches(assign_and_partial, batch_format="pyarrow")
        .groupby(["window_start", "event_type"])
        .aggregate(Sum("part_sum"), Sum("part_count"))
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "window_start": pc.strftime(
                    b.column("window_start"), format="%Y-%m-%d %H:%M:%S"
                ),
                "event_type": b.column("event_type"),
                "n_events": pc.cast(b.column("sum(part_count)"), pa.int64()),
                "sum_value": pc.round(b.column("sum(part_sum)"), ndigits=2),
            }
        ),
        batch_format="pyarrow",
    )


N_MAINTENANCE_WINDOWS = 180  # one per 4h over the events month
_WINDOW_STRIDE_US = 4 * 3600 * 1_000_000
_EVENTS_EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z


def maintenance_windows() -> pa.Table:
    """Deterministic overlapping interval table: window i starts at
    epoch + i·4h and lasts 2h + (i mod 5)h (2–6h, so ~40% of windows
    overlap their successor) — recomputable in SQL from the formula."""
    import numpy as np

    i = np.arange(N_MAINTENANCE_WINDOWS, dtype=np.int64)
    starts = _EVENTS_EPOCH_US + i * _WINDOW_STRIDE_US
    ends = starts + (2 + (i % 5)) * 3600 * 1_000_000
    return pa.table(
        {
            "window_id": pa.array(i, pa.int64()),
            "wstart": pa.array(starts, pa.timestamp("us")),
            "wend": pa.array(ends, pa.timestamp("us")),
        }
    )


def events_in_windows(sf_dir: str):
    """Range (interval) join: events × overlapping maintenance windows →
    one row per (event, containing window).

    The general :func:`~go_htmldate_ray.stages.joins.range_join` shape:
    grid-cell equi-join reduction (grid = the 4 h window stride, so
    interval replication ≤ 2–3 cells) followed by the exact containment
    filter.  The window table here is tiny, but the join deliberately
    runs the distributed two-sided path — the same code handles a
    billion-interval right side."""
    import ray.data

    from ..stages.joins import range_join

    events = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts"]
    )
    windows = ray.data.from_arrow(maintenance_windows())
    joined = range_join(
        events,
        windows,
        left_ts="ts",
        right_start="wstart",
        right_end="wend",
        grid_us=_WINDOW_STRIDE_US,
    )
    return joined.select_columns(["event_id", "window_id"])


N_SERVICE_WINDOWS = 240  # one per 10 days over the 1995-2001 orders span
_SERVICE_STRIDE_US = 10 * 86_400 * 1_000_000
_ORDERS_EPOCH_US = 788_918_400_000_000  # 1995-01-01T00:00:00Z
_DAY_US = 86_400 * 1_000_000


def service_windows() -> pa.Table:
    """Formula-literal interval table over the orders era: window i
    starts at 1995-01-01 + i·10d and lasts 3 + (i mod 9) days."""
    import numpy as np

    i = np.arange(N_SERVICE_WINDOWS, dtype=np.int64)
    starts = _ORDERS_EPOCH_US + i * _SERVICE_STRIDE_US
    ends = starts + (3 + (i % 9)) * _DAY_US
    return pa.table(
        {
            "window_id": pa.array(i, pa.int64()),
            "wstart": pa.array(starts, pa.timestamp("us")),
            "wend": pa.array(ends, pa.timestamp("us")),
        }
    )


def orders_overlapping_windows(sf_dir: str):
    """Interval-overlap join: order fulfillment spans
    ``[o_orderdate, +1..7 days)`` × service windows → one row per
    overlapping (order, window) pair.

    Exercises the two-sided
    :func:`~go_htmldate_ray.stages.joins.interval_overlap_join`
    (both sides grid-expanded, first-shared-cell dedup — no distinct
    shuffle) with the grid at the window stride."""
    import ray.data

    from ..stages.joins import interval_overlap_join

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    )

    def add_span(batch: pa.Table) -> pa.Table:
        import numpy as np

        start_us = pc.cast(
            pc.cast(batch.column("o_orderdate"), pa.timestamp("us")), pa.int64()
        ).to_numpy(zero_copy_only=False)
        keys = np.asarray(batch.column("o_orderkey"), dtype=np.int64)
        end_us = start_us + (1 + keys % 7) * _DAY_US
        return pa.table(
            {
                "o_orderkey": batch.column("o_orderkey"),
                "ostart": pa.array(start_us, pa.timestamp("us")),
                "oend": pa.array(end_us, pa.timestamp("us")),
            }
        )

    spans = orders.map_batches(add_span, batch_format="pyarrow")
    joined = interval_overlap_join(
        spans,
        ray.data.from_arrow(service_windows()),
        left_start="ostart",
        left_end="oend",
        right_start="wstart",
        right_end="wend",
        grid_us=_SERVICE_STRIDE_US,
    )
    return joined.select_columns(["o_orderkey", "window_id"])
