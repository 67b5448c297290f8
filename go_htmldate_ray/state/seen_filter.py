"""Sharded URL-seen set: the crawl's incremental membership state.

A pool of ``SeenShard`` actors, each owning the keys with
``url_hash % n_shards == shard_id``.  Candidate batches are hash-
partitioned driver-side (one round-trip per shard per wave, not per
URL).  Each shard fronts its exact set with a cuckoo filter: the filter
answers the common "definitely new" case from ~1 byte/key; the exact set
arbitrates positives, so membership semantics are exact and independent
of shard count (SURVEY.md §2.6/§7).

Checkpoint: ``dump()`` returns the sorted key list per shard; ``load()``
restores it — written per wave next to the frontier snapshot.
"""

from __future__ import annotations

import ray

from .cuckoo import CuckooFilter


@ray.remote
class SeenShard:
    def __init__(self, shard_id: int, filter_capacity: int = 1 << 18):
        self.shard_id = shard_id
        self.filter_capacity = filter_capacity
        self.exact: set[int] = set()
        self.filter = CuckooFilter(capacity=filter_capacity)
        # keys added since the last drain — the per-wave checkpoint unit
        self.delta: list[int] = []

    def check_and_add(self, hashes: list[int]) -> list[bool]:
        """For each hash: True if newly added (not seen before).

        The exact set is the sole arbiter; the cuckoo filter is kept
        in sync purely as the compact fast-reject structure a native
        port would query first (its bucket count is forced to a power
        of two in :class:`CuckooFilter`, so its negatives are sound,
        but membership here never depends on that).
        """
        out = []
        for h in hashes:
            if h in self.exact:
                out.append(False)
            else:
                self.exact.add(h)
                self.filter.add(h)
                self.delta.append(h)
                out.append(True)
        return out

    def drain_delta(self) -> list[int]:
        """Keys added since the previous drain — checkpointing dumps ONLY
        this delta per wave (I/O ∝ wave size, not total crawl size)."""
        d, self.delta = self.delta, []
        return sorted(d)

    def load_delta(self, keys: list[int]) -> int:
        """Apply one checkpointed delta (no reset, no delta tracking)."""
        for h in keys:
            if h not in self.exact:
                self.exact.add(h)
                self.filter.add(h)
        return len(self.exact)

    def contains(self, hashes: list[int]) -> list[bool]:
        return [h in self.exact for h in hashes]

    def dump(self) -> list[int]:
        return sorted(self.exact)

    def load(self, keys: list[int]) -> int:
        """Restore EXACTLY the checkpointed membership: resuming from a
        snapshot must also roll back keys a half-completed wave added
        after it (merging would make a replayed wave see its own URLs
        as duplicates when the actors survived the interruption)."""
        self.exact = set(keys)
        self.filter = CuckooFilter(capacity=self.filter_capacity)
        for h in self.exact:
            self.filter.add(h)
        self.delta = []
        return len(self.exact)

    def reset(self) -> None:
        self.exact = set()
        self.filter = CuckooFilter(capacity=self.filter_capacity)
        self.delta = []

    def size(self) -> int:
        return len(self.exact)


class SeenSet:
    """Driver-side handle over the shard pool.

    Shards are anonymous actors owned by this handle: they die with the
    last reference, and checkpoint resume rebuilds membership from the
    per-wave delta files — naming them (`get_if_exists`) only created a
    race against a previous crawl's actors being torn down.  Pass
    ``namespace`` to name them anyway when two concurrent drivers must
    share one seen set."""

    def __init__(self, n_shards: int = 8, namespace: str | None = None):
        self.n_shards = n_shards
        if namespace is None:
            self.shards = [SeenShard.remote(i) for i in range(n_shards)]
        else:
            self.shards = [
                SeenShard.options(name=f"{namespace}-{i}", get_if_exists=True).remote(i)
                for i in range(n_shards)
            ]

    def check_and_add(self, hashes: list[int]) -> list[bool]:
        """Batch membership-test-and-insert, preserving input order."""
        return self._sharded_call("check_and_add", hashes)

    def add(self, hashes: list[int]) -> None:
        """Fire-and-forget insert: shard-partition and submit WITHOUT
        waiting for results.  Safe whenever the caller discards the
        membership booleans: Ray orders calls per (caller, actor), so a
        later ``contains``/``drain_deltas`` from the same driver observes
        these inserts.  Saves one blocking RPC fan-out per call site —
        ~2 of the 3 seen-set barriers every crawl wave."""
        by_shard: dict[int, list[int]] = {}
        for h in hashes:
            by_shard.setdefault(h % self.n_shards, []).append(h)
        for s, hs in by_shard.items():
            self.shards[s].check_and_add.remote(hs)

    def contains(self, hashes: list[int]) -> list[bool]:
        """Read-only batch membership test, preserving input order."""
        return self._sharded_call("contains", hashes)

    def _sharded_call(self, method: str, hashes: list[int]) -> list[bool]:
        by_shard: dict[int, list[int]] = {}
        positions: dict[int, list[int]] = {}
        for pos, h in enumerate(hashes):
            s = h % self.n_shards
            by_shard.setdefault(s, []).append(h)
            positions.setdefault(s, []).append(pos)
        shard_ids = list(by_shard)
        # ONE ray.get over all shard futures — a per-shard get loop costs
        # n_shards sequential RPC round-trips per call (measured ~1s of an
        # sf0.1 crawl's 4.5s wall in the seen phase)
        results = ray.get(
            [getattr(self.shards[s], method).remote(by_shard[s]) for s in shard_ids]
        )
        out = [False] * len(hashes)
        for s, flags in zip(shard_ids, results):
            for pos, flag in zip(positions[s], flags):
                out[pos] = flag
        return out

    def dump(self) -> list[list[int]]:
        return ray.get([s.dump.remote() for s in self.shards])

    def load(self, dumps: list[list[int]]) -> None:
        ray.get(
            [s.load.remote(keys) for s, keys in zip(self.shards, dumps)]
        )

    def drain_deltas(self) -> list[list[int]]:
        """Per-shard keys added since the last drain (the per-wave
        checkpoint payload)."""
        return ray.get([s.drain_delta.remote() for s in self.shards])

    def load_deltas(self, deltas: list[list[int]]) -> None:
        ray.get(
            [s.load_delta.remote(keys) for s, keys in zip(self.shards, deltas)]
        )

    def reset(self) -> None:
        ray.get([s.reset.remote() for s in self.shards])

    def total(self) -> int:
        return sum(ray.get([s.size.remote() for s in self.shards]))
