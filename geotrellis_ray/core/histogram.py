"""Mergeable histogram sketches — the canonical partial+final aggregates.

Re-expresses (from scratch, per the published Ben-Haim & Tom-Tov 2010
"A Streaming Parallel Decision Tree Algorithm" JMLR paper):
- StreamingHistogram  ref:raster/src/main/scala/geotrellis/raster/histogram/StreamingHistogram.scala (~550 LoC, L:unverified)
- FastMapHistogram    ref:raster/.../histogram/FastMapHistogram.scala (L:unverified)
(/root/reference empty at survey time — SURVEY.md §0, §2.5.)

Both sketches serialize to plain dicts/arrays so a map_batches stage can emit
one sketch row per block and a tiny groupby merges them (SURVEY.md §2.5
"partial+final").
"""

from __future__ import annotations

import numpy as np


class StreamingHistogram:
    """Ben-Haim–Tom-Tov fixed-size centroid histogram for doubles."""

    def __init__(self, size: int = 80, centroids=None, counts=None):
        self.size = size
        self.centroids = np.asarray(centroids, dtype=np.float64) if centroids is not None else np.empty(0)
        self.counts = np.asarray(counts, dtype=np.float64) if counts is not None else np.empty(0)

    def update(self, values: np.ndarray) -> "StreamingHistogram":
        """Bulk update: bin the batch exactly, then compress to `size` bins."""
        values = np.asarray(values, dtype=np.float64)
        values = values[np.isfinite(values)]
        if len(values) == 0:
            return self
        uniq, cnt = np.unique(values, return_counts=True)
        self.centroids = np.concatenate([self.centroids, uniq])
        self.counts = np.concatenate([self.counts, cnt.astype(np.float64)])
        self._compress()
        return self

    def merge(self, other: "StreamingHistogram") -> "StreamingHistogram":
        self.centroids = np.concatenate([self.centroids, other.centroids])
        self.counts = np.concatenate([self.counts, other.counts])
        self._compress()
        return self

    def _compress(self) -> None:
        order = np.argsort(self.centroids, kind="stable")
        c, w = self.centroids[order], self.counts[order]
        # merge exact duplicates first
        if len(c) > 1:
            same = np.concatenate([[False], np.diff(c) == 0])
            if same.any():
                keep_idx = np.where(~same)[0]
                w = np.add.reduceat(w, keep_idx)
                c = c[keep_idx]
        while len(c) > self.size:
            gaps = np.diff(c)
            i = int(np.argmin(gaps))
            tot = w[i] + w[i + 1]
            c[i] = (c[i] * w[i] + c[i + 1] * w[i + 1]) / tot
            w[i] = tot
            c = np.delete(c, i + 1)
            w = np.delete(w, i + 1)
        self.centroids, self.counts = c, w

    # --- queries ---

    def total(self) -> float:
        return float(self.counts.sum())

    def mean(self) -> float:
        t = self.total()
        return float((self.centroids * self.counts).sum() / t) if t else float("nan")

    def min(self) -> float:
        return float(self.centroids.min()) if len(self.centroids) else float("nan")

    def max(self) -> float:
        return float(self.centroids.max()) if len(self.centroids) else float("nan")

    def cdf(self, x: float) -> float:
        """Approximate count of values <= x (BTT `sum` procedure)."""
        c, w = self.centroids, self.counts
        if len(c) == 0:
            return 0.0
        if x >= c[-1]:
            return self.total()
        if x < c[0]:
            return 0.0
        i = int(np.searchsorted(c, x, side="right")) - 1
        if i + 1 >= len(c):
            return self.total()
        # trapezoid interpolation between centroid i and i+1
        mb = w[i] + (w[i + 1] - w[i]) * (x - c[i]) / (c[i + 1] - c[i])
        s = (w[i] + mb) / 2.0 * (x - c[i]) / (c[i + 1] - c[i])
        return float(w[:i].sum() + w[i] / 2.0 + s)

    def quantile_breaks(self, n: int) -> list[float]:
        """n-1 approximate quantile break values (classBreaks semantics:
        ref:spark/.../summary/StatsTileRDDMethods.scala classBreaks)."""
        total = self.total()
        if total == 0 or len(self.centroids) == 0:
            return []
        targets = [total * i / n for i in range(1, n)]
        lo, hi = self.min(), self.max()
        out = []
        for t in targets:
            a, b = lo, hi
            for _ in range(40):  # bisect the cdf
                m = (a + b) / 2.0
                if self.cdf(m) < t:
                    a = m
                else:
                    b = m
            out.append((a + b) / 2.0)
        return out

    # --- serialization (one sketch row per block) ---

    def to_dict(self) -> dict:
        return {"size": self.size, "centroids": self.centroids.tolist(), "counts": self.counts.tolist()}

    @staticmethod
    def from_dict(d: dict) -> "StreamingHistogram":
        return StreamingHistogram(d["size"], d["centroids"], d["counts"])


class FastMapHistogram:
    """Exact integer-value histogram (dict sketch), mergeable."""

    def __init__(self, counts: dict[int, int] | None = None):
        self.m: dict[int, int] = dict(counts or {})

    def update(self, values: np.ndarray) -> "FastMapHistogram":
        uniq, cnt = np.unique(np.asarray(values, dtype=np.int64), return_counts=True)
        for v, c in zip(uniq.tolist(), cnt.tolist()):
            self.m[v] = self.m.get(v, 0) + c
        return self

    def merge(self, other: "FastMapHistogram") -> "FastMapHistogram":
        for v, c in other.m.items():
            self.m[v] = self.m.get(v, 0) + c
        return self

    def item_count(self, v: int) -> int:
        return self.m.get(v, 0)

    def total(self) -> int:
        return sum(self.m.values())

    def min(self) -> int | None:
        return min(self.m) if self.m else None

    def max(self) -> int | None:
        return max(self.m) if self.m else None

    def mode(self) -> int | None:
        """Most frequent value; ties -> smallest value (deterministic)."""
        if not self.m:
            return None
        return min(self.m, key=lambda v: (-self.m[v], v))

    def quantile_breaks(self, n: int) -> list[int]:
        """n-1 EXACT quantile break values (classBreaks on the exact CDF —
        GeoTrellis FastMapHistogram path): break i (1..n-1) = smallest value
        v with cum_count(v) * n >= total * i. Pure integer rule, so a SQL
        oracle reproduces it bit-exact (no float CDF, no bisection)."""
        if not self.m:
            return []
        vals = np.array(sorted(self.m), dtype=np.int64)
        cum = np.cumsum([self.m[int(v)] for v in vals], dtype=np.int64)
        total = int(cum[-1])
        idx = np.searchsorted(cum * n, total * np.arange(1, n, dtype=np.int64),
                              side="left")
        return [int(v) for v in vals[idx]]

    def to_dict(self) -> dict:
        return {"values": list(self.m.keys()), "counts": list(self.m.values())}

    @staticmethod
    def from_dict(d: dict) -> "FastMapHistogram":
        return FastMapHistogram(dict(zip(d["values"], d["counts"])))
