"""Hierarchical URL-path statistics for crawl budgeting.

``hot_path_subtrees`` finds, per host, the DEEPEST path prefixes whose
subtree URL count still reaches a threshold — the hierarchical-heavy-
hitter frontier ("which directories are the actual hot spots"), the
signal a crawler uses to budget per path subtree instead of per host
(a calendar subtree can dwarf the rest of its site; see
``crawl_trap_hosts`` for the adversarial version of the same idea).

Prefix lattice: every directory prefix of the path (each ending in
``/``) plus the full path as its own leaf.  A prefix is reported iff
its subtree count ≥ threshold AND no strictly deeper prefix of the
same host also reaches the threshold (maximal depth — the frontier of
the θ-heavy forest).  Because directory prefixes end in ``/``, string
prefix containment between candidates coincides with lattice ancestry,
which is what both the engine's small-side check and the SQL oracle
exploit.
"""

from __future__ import annotations

import pyarrow as pa


def path_prefixes(path: str) -> list[str]:
    """Directory prefixes (each with a trailing ``/``) plus the full
    path: ``/a/b/c.html`` → ``['/', '/a/', '/a/b/', '/a/b/c.html']``."""
    if not path.startswith("/"):
        path = "/" + path
    segs = path.split("/")  # ['', 'a', 'b', 'c.html']
    out = ["/".join(segs[:i]) + "/" for i in range(1, len(segs))]
    if path != "/" and not path.endswith("/"):
        out.append(path)
    return out


def hot_path_subtrees(ds, *, host_col: str = "host", path_col: str = "path", threshold: int = 4):
    """(host, path) rows → (host, prefix, n_urls): the deepest per-host
    path prefixes whose subtree count reaches ``threshold``.

    Shape: per-batch (host, prefix) count partials (≤ depth rows per
    URL) → ONE Sum groupby on light pairs → the candidate set
    (count ≥ threshold, bounded by n_urls/threshold — the documented
    driver small side) → maximal-depth filter by string-prefix ancestry
    within each host.
    """
    from collections import Counter

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        for h, p in zip(
            batch.column(host_col).to_pylist(), batch.column(path_col).to_pylist()
        ):
            if h is None or p is None:
                continue
            for pref in path_prefixes(p):
                counts[(h, pref)] += 1
        return pa.table(
            {
                "host": pa.array([k[0] for k in counts], pa.string()),
                "prefix": pa.array([k[1] for k in counts], pa.string()),
                "n": pa.array(list(counts.values()), pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["host", "prefix"])
        .aggregate(Sum("n"))
    )
    import pyarrow.compute as pc

    candidates = agg.map_batches(
        lambda b: pa.table(
            {
                "host": b.column("host"),
                "prefix": b.column("prefix"),
                "n_urls": b.column("sum(n)").cast(pa.int64()),
            }
        ).filter(pc.greater_equal(pc.field("n_urls"), threshold)),
        batch_format="pyarrow",
    )
    # candidate set is the small side by construction (≤ n_urls/threshold
    # rows): resolve maximality on the driver
    rows = candidates.take_all()
    by_host: dict[str, list[dict]] = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r)
    out_h, out_p, out_n = [], [], []
    for h, cands in sorted(by_host.items()):
        prefixes = [c["prefix"] for c in cands]
        for c in sorted(cands, key=lambda c: c["prefix"]):
            p = c["prefix"]
            if any(q != p and q.startswith(p) for q in prefixes):
                continue  # a deeper candidate exists — not maximal
            out_h.append(h)
            out_p.append(p)
            out_n.append(c["n_urls"])
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "host": pa.array(out_h, pa.string()),
                "prefix": pa.array(out_p, pa.string()),
                "n_urls": pa.array(out_n, pa.int64()),
            }
        )
    )
