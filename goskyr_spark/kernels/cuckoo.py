"""Salted-hash cuckoo filter + Bloom pre-filter for the URL-seen set.

North-rule machinery (BASELINE.json): the 10^10-URL frontier cannot
afford a full shuffle of every outlink against the seen table each
round. Per-partition slabs of these filters answer "definitely new"
locally; only "maybe seen" candidates pay the exact anti-join, and —
critically — a filter hit NEVER drops a URL by itself (false positives
fall through to the exact join; see spark/crawl.py), so the seen set
stays exact.

Pure numpy, serializable to bytes, deterministic: all hashing derives
from the 64-bit url_hash computed once Spark-side (xxhash64), salted
with a fixed engine seed. No reference-code analog exists (goskyr's only
dedup is a per-item memo map, scraper.go:394) — this is new machinery
per SURVEY §2.8.
"""

from __future__ import annotations

import numpy as np

SALT = np.uint64(0x9E3779B97F4A7C15)  # fixed engine salt (golden ratio)
_M1 = np.uint64(0xFF51AFD7ED558CCD)
_M2 = np.uint64(0xC4CEB9FE1A85EC53)


def _mix(h: np.ndarray) -> np.ndarray:
    """splitmix64-style avalanche over uint64 arrays (vectorized)."""
    h = h.astype(np.uint64, copy=True)
    h ^= h >> np.uint64(33)
    h *= _M1
    h ^= h >> np.uint64(33)
    h *= _M2
    h ^= h >> np.uint64(33)
    return h


class BloomFilter:
    """Per-partition pre-filter: k=2 double-hashed probes over a bit array.

    'absent' answers are authoritative (definitely new); 'present' falls
    through to the cuckoo filter and, if still present, the exact join.
    """

    HEADER = 16  # nbits(u64) + count(u64)

    def __init__(self, nbits: int):
        nbits = max(64, int(nbits))
        self.nbits = nbits
        self.bits = np.zeros((nbits + 7) // 8, dtype=np.uint8)
        self.count = 0

    @classmethod
    def sized_for(cls, n_items: int, bits_per_item: int = 12):
        return cls(max(64, n_items * bits_per_item))

    def _probes(self, hashes: np.ndarray):
        h = _mix(np.asarray(hashes, dtype=np.uint64) ^ SALT)
        h2 = _mix(h ^ _M2)
        nb = np.uint64(self.nbits)
        return (h % nb, (h + h2) % nb)

    def add_many(self, hashes) -> None:
        if len(hashes) == 0:
            return
        for idx in self._probes(hashes):
            np.bitwise_or.at(self.bits, (idx // np.uint64(8)).astype(np.int64),
                             np.left_shift(np.uint8(1),
                                           (idx % np.uint64(8)).astype(np.uint8)))
        self.count += len(hashes)

    def contains_many(self, hashes) -> np.ndarray:
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        res = np.ones(len(hashes), dtype=bool)
        for idx in self._probes(hashes):
            byte = self.bits[(idx // np.uint64(8)).astype(np.int64)]
            bit = np.left_shift(np.uint8(1), (idx % np.uint64(8)).astype(np.uint8))
            res &= (byte & bit) != 0
        return res

    def to_bytes(self) -> bytes:
        head = np.array([self.nbits, self.count], dtype=np.uint64).tobytes()
        return head + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes):
        head = np.frombuffer(data[:cls.HEADER], dtype=np.uint64)
        f = cls(int(head[0]))
        f.count = int(head[1])
        f.bits = np.frombuffer(data[cls.HEADER:], dtype=np.uint8).copy()
        return f


class CuckooFilter:
    """4-way bucketed cuckoo filter with 16-bit fingerprints (~0.95 load).

    Partial-key cuckoo hashing: i2 = i1 XOR H(fingerprint), so membership
    tests need only the stored fingerprint. Deletion-free test-and-insert
    is all the crawl needs (URLs are never unseen).
    """

    SLOTS = 4
    HEADER = 16  # nbuckets(u64) + count(u64)

    def __init__(self, nbuckets: int):
        # power-of-two buckets for mask indexing
        nb = 1
        while nb < nbuckets:
            nb <<= 1
        self.nbuckets = nb
        self.mask = np.uint64(nb - 1)
        self.table = np.zeros((nb, self.SLOTS), dtype=np.uint16)
        self.count = 0

    @classmethod
    def sized_for(cls, n_items: int, load: float = 0.84):
        return cls(max(8, int(n_items / (cls.SLOTS * load)) + 1))

    def _fp_and_index(self, h: int):
        h = np.uint64(h) ^ SALT
        m = int(_mix(np.array([h], dtype=np.uint64))[0])
        fp = (m >> 48) & 0xFFFF
        if fp == 0:
            fp = 1
        i1 = m & int(self.mask)
        return np.uint16(fp), i1

    def _alt_index(self, i: int, fp: int) -> int:
        # hash the fingerprint with the same mixer, XOR into the index
        fph = int(_mix(np.array([fp], dtype=np.uint64) ^ SALT)[0])
        return (i ^ fph) & int(self.mask)

    def contains(self, h: int) -> bool:
        fp, i1 = self._fp_and_index(h)
        if fp in self.table[i1]:
            return True
        i2 = self._alt_index(i1, int(fp))
        return fp in self.table[i2]

    def insert(self, h: int) -> bool:
        """Insert; returns False only when the filter is over-full (the
        caller then falls back to exact-join-only for those keys)."""
        fp, i1 = self._fp_and_index(h)
        i2 = self._alt_index(i1, int(fp))
        for i in (i1, i2):
            row = self.table[i]
            empty = np.where(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                self.count += 1
                return True
        # evict: deterministic kick sequence seeded by the key hash
        i = i1 if (int(fp) & 1) == 0 else i2
        cur = int(fp)
        state = int(_mix(np.array([h], dtype=np.uint64))[0])
        for _ in range(500):
            state = int(_mix(np.array([state], dtype=np.uint64))[0])
            slot = state % self.SLOTS
            cur, self.table[i][slot] = int(self.table[i][slot]), np.uint16(cur)
            i = self._alt_index(i, cur)
            row = self.table[i]
            empty = np.where(row == 0)[0]
            if len(empty):
                row[empty[0]] = np.uint16(cur)
                self.count += 1
                return True
        return False

    def contains_many(self, hashes) -> np.ndarray:
        """Vectorized membership for uint64 hash arrays."""
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        h = np.asarray(hashes, dtype=np.uint64) ^ SALT
        m = _mix(h)
        fp = ((m >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
        fp = np.where(fp == 0, np.uint16(1), fp)
        i1 = (m & self.mask).astype(np.int64)
        fph = _mix(fp.astype(np.uint64) ^ SALT)
        i2 = ((i1.astype(np.uint64) ^ fph) & self.mask).astype(np.int64)
        fpc = fp[:, None]
        return ((self.table[i1] == fpc).any(axis=1) |
                (self.table[i2] == fpc).any(axis=1))

    def insert_many(self, hashes) -> int:
        """Scalar loop insert (inserts are rare relative to tests);
        returns number actually inserted."""
        n = 0
        for h in hashes:
            if self.insert(int(h)):
                n += 1
        return n

    def to_bytes(self) -> bytes:
        head = np.array([self.nbuckets, self.count], dtype=np.uint64).tobytes()
        return head + self.table.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes):
        head = np.frombuffer(data[:cls.HEADER], dtype=np.uint64)
        f = cls(int(head[0]))
        f.count = int(head[1])
        f.table = np.frombuffer(data[cls.HEADER:], dtype=np.uint16).reshape(
            int(head[0]), cls.SLOTS).copy()
        return f
