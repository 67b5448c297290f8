"""Cuckoo filter for approximate URL-seen membership.

The scale-path gate in front of each seen-set shard: the data structure
is 8-bit fingerprints in 4-slot buckets (~1 byte/key in a packed native
implementation; this Python prototype trades that compactness for
clarity — a production port would back it with a bytearray).  False
positives are possible (tunable via fingerprint size), false negatives
are not, so the shard uses the filter as a cheap reject path and an
exact set as the arbiter for correctness audits (SURVEY.md §7.3:
membership must be independent of shard count).
"""

from __future__ import annotations

import hashlib


class CuckooFilter:
    def __init__(self, capacity: int = 1 << 16, bucket_size: int = 4, max_kicks: int = 500):
        # Bucket count must be a power of two: _index2's xor partial-key
        # trick is only an involution (i1 == _index2(_index2(i1, fp), fp))
        # when the modulus is a power of two — any other size lets a kicked
        # fingerprint land in a bucket where lookups can't find it, i.e. a
        # false negative.  Round up so "no false negatives" actually holds.
        want = max(1, capacity // bucket_size)
        self.n_buckets = 1 << (want - 1).bit_length()
        self.bucket_size = bucket_size
        self.max_kicks = max_kicks
        self.buckets: list[list[int]] = [[] for _ in range(self.n_buckets)]
        self.count = 0
        self.overflow: set[int] = set()  # keys that lost the kick fight

    def _fingerprint(self, key: int) -> int:
        fp = (key * 0x9E3779B97F4A7C15) & 0xFF
        return fp or 1

    def _index1(self, key: int) -> int:
        return key % self.n_buckets

    def _index2(self, i1: int, fp: int) -> int:
        h = int.from_bytes(hashlib.md5(bytes([fp])).digest()[:4], "big")
        return (i1 ^ h) % self.n_buckets

    def add(self, key: int) -> None:
        fp = self._fingerprint(key)
        i1 = self._index1(key)
        i2 = self._index2(i1, fp)
        for i in (i1, i2):
            if len(self.buckets[i]) < self.bucket_size:
                self.buckets[i].append(fp)
                self.count += 1
                return
        # kick loop
        import random

        rng = random.Random(key)  # deterministic per key
        i = rng.choice((i1, i2))
        for _ in range(self.max_kicks):
            j = rng.randrange(self.bucket_size)
            fp, self.buckets[i][j] = self.buckets[i][j], fp
            i = self._index2(i, fp)
            if len(self.buckets[i]) < self.bucket_size:
                self.buckets[i].append(fp)
                self.count += 1
                return
        self.overflow.add(fp)
        self.count += 1

    def might_contain(self, key: int) -> bool:
        fp = self._fingerprint(key)
        i1 = self._index1(key)
        if fp in self.buckets[i1]:
            return True
        i2 = self._index2(i1, fp)
        return fp in self.buckets[i2] or fp in self.overflow
