"""Vectorized Bloom filter over uint64 keys.

Engine addition (no GeoTrellis counterpart): the memory-bounded membership
sketch a crawl-scale pipeline uses to probe "is this document's hash in the
reference corpus?" without broadcasting the full key set — 10 bits/key and
k=7 gives ~1% false positives regardless of corpus size, and the bit array
OR-merges losslessly, so partial filters built per block combine into the
global filter with a tree merge.

Double hashing (Kirsch–Mitzenmatcher): position_i = h1 + i * h2 (mod m),
with h1 the key itself (already uniform — callers feed sha256-derived
hashes) and h2 a splitmix64-style remix, forced odd so it is a unit mod a
power-of-two m. All add/contains paths are pure numpy over whole arrays.
"""
from __future__ import annotations

import numpy as np

__all__ = ["BloomFilter", "bloom_size_bits"]


def bloom_size_bits(n_keys: int, bits_per_key: int = 10) -> int:
    """Power-of-two bit size for an expected key count."""
    m = 1024
    while m < n_keys * bits_per_key:
        m <<= 1
    return m


def _h2(keys: np.ndarray) -> np.ndarray:
    x = keys.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(33)
    return x | np.uint64(1)  # odd -> coprime with power-of-two m


class BloomFilter:
    def __init__(self, m_bits: int, k: int = 7,
                 bits: np.ndarray | None = None):
        if m_bits & (m_bits - 1):
            raise ValueError("m_bits must be a power of two")
        self.m = m_bits
        self.k = k
        self.bits = np.zeros(m_bits >> 6, np.uint64) if bits is None else bits

    def add_many(self, keys: np.ndarray) -> None:
        keys = keys.astype(np.uint64, copy=False)
        h1, h2 = keys, _h2(keys)
        mask = np.uint64(self.m - 1)
        for i in range(self.k):
            pos = (h1 + np.uint64(i) * h2) & mask
            np.bitwise_or.at(self.bits, pos >> np.uint64(6),
                             np.uint64(1) << (pos & np.uint64(63)))

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        keys = keys.astype(np.uint64, copy=False)
        h1, h2 = keys, _h2(keys)
        mask = np.uint64(self.m - 1)
        out = np.ones(len(keys), bool)
        for i in range(self.k):
            pos = (h1 + np.uint64(i) * h2) & mask
            bit = (self.bits[pos >> np.uint64(6)]
                   >> (pos & np.uint64(63))) & np.uint64(1)
            out &= bit.astype(bool)
        return out

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        self.bits |= other.bits
        return self

    def to_bytes(self) -> bytes:
        return self.bits.tobytes()

    @classmethod
    def from_bytes(cls, m_bits: int, k: int, raw: bytes) -> "BloomFilter":
        return cls(m_bits, k, bits=np.frombuffer(raw, np.uint64).copy())
