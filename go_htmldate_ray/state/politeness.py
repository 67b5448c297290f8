"""Per-host politeness state: token buckets + crawl-delay.

Two politeness modes exist in the engine:

1. **Logical-time budgets** (used by the wave scheduler,
   pipelines/crawl.py): each host may fetch ≤ budget URLs per wave.
   Pure function of (seed list, budget) → deterministic crawl ordering,
   which is what the reproducibility criterion needs.
2. **Wall-clock token buckets** (this module): per-host refill-rate
   limiting for a live-HTTP deployment, held in a sharded actor (shard =
   hash(host) % n).  The clock is injected so behaviour is testable
   deterministically.
"""

from __future__ import annotations

from typing import Callable, Optional

import ray


class TokenBucket:
    """Classic token bucket: ``rate`` tokens/sec, burst up to ``capacity``."""

    __slots__ = ("rate", "capacity", "tokens", "last")

    def __init__(self, rate: float, capacity: float, now: float):
        self.rate = rate
        self.capacity = capacity
        self.tokens = capacity
        self.last = now

    def grant(self, n: int, now: float) -> int:
        """Grant up to n tokens; returns how many were granted."""
        self.tokens = min(self.capacity, self.tokens + (now - self.last) * self.rate)
        self.last = now
        granted = int(min(n, self.tokens))
        self.tokens -= granted
        return granted


@ray.remote
class PolitenessShard:
    """Owns the token buckets for hosts hashing into this shard.

    ``clock`` defaults to ``time.monotonic``; tests inject a fake.
    Crawl-delay overrides (e.g. from robots.txt) set a per-host rate.
    """

    def __init__(
        self,
        default_rate: float = 1.0,
        default_capacity: float = 4.0,
        clock: Optional[Callable[[], float]] = None,
    ):
        import time

        self.default_rate = default_rate
        self.default_capacity = default_capacity
        self.clock = clock or time.monotonic
        self.buckets: dict[str, TokenBucket] = {}
        self.rates: dict[str, float] = {}

    def set_crawl_delay(self, host: str, delay_seconds: float) -> None:
        """robots crawl-delay → rate = 1/delay tokens per second."""
        self.rates[host] = 1.0 / max(delay_seconds, 1e-6)
        self.buckets.pop(host, None)

    def grant(self, requests: list[tuple[str, int]], now: Optional[float] = None) -> list[int]:
        """For each (host, n) request, return how many fetches may proceed."""
        t = self.clock() if now is None else now
        out = []
        for host, n in requests:
            bucket = self.buckets.get(host)
            if bucket is None:
                rate = self.rates.get(host, self.default_rate)
                bucket = TokenBucket(rate, self.default_capacity, t)
                self.buckets[host] = bucket
            out.append(bucket.grant(n, t))
        return out
