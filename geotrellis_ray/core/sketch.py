"""HyperLogLog distinct-count sketch — the classic fixed-size mergeable
cardinality estimator (Flajolet et al. 2007, with the standard small-range
linear-counting correction). The 100-TB aggregate for COUNT(DISTINCT):
per-block registers are a few KB regardless of data volume, merges are a
vectorized elementwise max, and the estimate error is ~1.04/sqrt(2^p).

No GeoTrellis counterpart (its sketches are value histograms —
core/histogram.py covers those); this is the LLM-data first-class addition
for corpus-scale distinct counts (unique urls / domains / shingles)."""

from __future__ import annotations

import base64

import numpy as np

_SPLITMIX_C1 = np.uint64(0xBF58476D1CE4E5B9)
_SPLITMIX_C2 = np.uint64(0x94D049BB133111EB)
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — the standard 64-bit integer mix."""
    z = x.astype(np.uint64) + _GOLDEN
    z = (z ^ (z >> np.uint64(30))) * _SPLITMIX_C1
    z = (z ^ (z >> np.uint64(27))) * _SPLITMIX_C2
    return z ^ (z >> np.uint64(31))


def _bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Exact vectorized bit_length for uint64 (np.log2 on the full 64 bits
    is NOT exact past 2^53 — split into 32-bit halves, each exact in
    float64)."""
    hi = (w >> np.uint64(32)).astype(np.float64)
    lo = (w & np.uint64(0xFFFFFFFF)).astype(np.float64)

    def bl32(v):
        out = np.zeros_like(v)
        nz = v > 0
        out[nz] = np.floor(np.log2(v[nz])) + 1.0
        return out

    return np.where(hi > 0, bl32(hi) + 32.0, bl32(lo)).astype(np.int64)


def hash_values(values) -> np.ndarray:
    """Any column -> uint64 hashes: integers through splitmix64, everything
    else through pandas' vectorized C hasher (deterministic, no per-row
    Python)."""
    arr = np.asarray(values)
    if arr.dtype.kind in ("i", "u"):
        return splitmix64(arr.astype(np.uint64))
    import pandas as pd

    return pd.util.hash_array(arr if arr.dtype == object else arr.astype(object))


class HyperLogLog:
    """p-bit register index (m = 2^p registers), 64-bit hashes. Default
    p=12: 4096 one-byte registers, ~1.6% standard error."""

    def __init__(self, p: int = 12, registers: np.ndarray | None = None):
        if not 4 <= p <= 18:
            raise ValueError("p must be in [4, 18]")
        self.p = p
        self.m = 1 << p
        self.reg = (registers if registers is not None
                    else np.zeros(self.m, dtype=np.uint8))

    def update_hashes(self, h: np.ndarray) -> "HyperLogLog":
        if len(h) == 0:
            return self
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        w = (h << np.uint64(self.p)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        # rank = leading zeros of the remaining 64-p bits + 1
        rho = (64 - self.p) - _bit_length_u64(w >> np.uint64(self.p)) + 1
        np.maximum.at(self.reg, idx, rho.astype(np.uint8))
        return self

    def update(self, values) -> "HyperLogLog":
        return self.update_hashes(hash_values(values))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if other.p != self.p:
            raise ValueError("precision mismatch")
        np.maximum(self.reg, other.reg, out=self.reg)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)  # standard large-m constant
        E = alpha * m * m / np.sum(np.exp2(-self.reg.astype(np.float64)))
        if E <= 2.5 * m:
            zeros = int(np.count_nonzero(self.reg == 0))
            if zeros:
                return float(m * np.log(m / zeros))  # linear counting
        return float(E)

    def to_dict(self) -> dict:
        return {"p": self.p,
                "reg": base64.b64encode(self.reg.tobytes()).decode("ascii")}

    @classmethod
    def from_dict(cls, d: dict) -> "HyperLogLog":
        reg = np.frombuffer(base64.b64decode(d["reg"]), dtype=np.uint8).copy()
        return cls(p=int(d["p"]), registers=reg)
