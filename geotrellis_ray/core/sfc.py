"""Space-filling-curve key indexes: Z-order (Morton) and Hilbert, plus
bbox -> index-range decomposition for predicate-pushdown layer reads.

Re-expresses (from scratch, vectorized numpy — SURVEY.md §1.1 "KeyIndex"):
- Z2 Morton interleave        ref:store/src/main/scala/geotrellis/store/index/zcurve/Z2.scala (L:unverified)
- ZSpatialKeyIndex            ref:store/.../index/zcurve/ZSpatialKeyIndex.scala (L:unverified)
- HilbertSpatialKeyIndex      ref:store/.../index/hilbert/HilbertSpatialKeyIndex.scala (L:unverified)
- indexRanges (query bbox -> SFC ranges, BIGMIN-style)  ref:store/.../index/zcurve/Z2.scala `zranges` (L:unverified)

(/root/reference empty at survey time; see SURVEY.md §0. Bit layout pinned by
OUR tests, not by reference bytes.)

Spec: ``zorder(col, row)`` interleaves col into the EVEN bits (bit 0 = col
bit 0) and row into the ODD bits, 32 bits each -> uint64. The ``sfc`` column
produced here is simultaneously the shuffle key, the write sort key and the
Parquet partition-pruning key (SURVEY.md §1.1).
"""

from __future__ import annotations

import numpy as np

_M1 = np.uint64(0x5555555555555555)
_M2 = np.uint64(0x3333333333333333)
_M4 = np.uint64(0x0F0F0F0F0F0F0F0F)
_M8 = np.uint64(0x00FF00FF00FF00FF)
_M16 = np.uint64(0x0000FFFF0000FFFF)


def _spread(v: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of each uint64 so bit i lands at bit 2i."""
    v = v & np.uint64(0xFFFFFFFF)
    v = (v | (v << np.uint64(16))) & _M16
    v = (v | (v << np.uint64(8))) & _M8
    v = (v | (v << np.uint64(4))) & _M4
    v = (v | (v << np.uint64(2))) & _M2
    v = (v | (v << np.uint64(1))) & _M1
    return v


def _compact(v: np.ndarray) -> np.ndarray:
    """Inverse of _spread: gather even bits back into the low 32."""
    v = v & _M1
    v = (v | (v >> np.uint64(1))) & _M2
    v = (v | (v >> np.uint64(2))) & _M4
    v = (v | (v >> np.uint64(4))) & _M8
    v = (v | (v >> np.uint64(8))) & _M16
    v = (v | (v >> np.uint64(16))) & np.uint64(0xFFFFFFFF)
    return v


def zorder(col, row) -> np.ndarray:
    """Morton interleave (vectorized): col -> even bits, row -> odd bits."""
    c = np.asarray(col).astype(np.uint64)
    r = np.asarray(row).astype(np.uint64)
    return _spread(c) | (_spread(r) << np.uint64(1))


def zorder_decode(z) -> tuple[np.ndarray, np.ndarray]:
    z = np.asarray(z).astype(np.uint64)
    return _compact(z).astype(np.int64), _compact(z >> np.uint64(1)).astype(np.int64)


# ---------------------------------------------------------------------------
# Hilbert (iterative Lam–Shapiro style, vectorized over rows, loop over bits)
# ---------------------------------------------------------------------------

def hilbert(col, row, order: int) -> np.ndarray:
    """(col,row) -> Hilbert d on a 2^order x 2^order grid. Vectorized."""
    x = np.asarray(col).astype(np.uint64).copy()
    y = np.asarray(row).astype(np.uint64).copy()
    d = np.zeros_like(x, dtype=np.uint64)
    s = np.uint64(1) << np.uint64(order - 1)
    one = np.uint64(1)
    zero = np.uint64(0)
    while s > 0:
        rx = np.where((x & s) > 0, one, zero)
        ry = np.where((y & s) > 0, one, zero)
        d += s * s * ((np.uint64(3) * rx) ^ ry)
        # rotate quadrant
        swap = ry == 0
        flip = swap & (rx == 1)
        sm1 = s - one
        x_f = np.where(flip, sm1 - x, x)
        y_f = np.where(flip, sm1 - y, y)
        x, y = np.where(swap, y_f, x_f), np.where(swap, x_f, y_f)
        s >>= one
    return d


def hilbert_decode(d, order: int) -> tuple[np.ndarray, np.ndarray]:
    t = np.asarray(d).astype(np.uint64).copy()
    x = np.zeros_like(t)
    y = np.zeros_like(t)
    one = np.uint64(1)
    s = np.uint64(1)
    n = np.uint64(1) << np.uint64(order)
    while s < n:
        rx = one & (t // np.uint64(2))
        ry = one & (t ^ rx)
        # rotate
        swap = ry == 0
        flip = swap & (rx == 1)
        sm1 = s - one
        x_f = np.where(flip, sm1 - x, x)
        y_f = np.where(flip, sm1 - y, y)
        x, y = np.where(swap, y_f, x_f), np.where(swap, x_f, y_f)
        x += s * rx
        y += s * ry
        t //= np.uint64(4)
        s <<= one
    return x.astype(np.int64), y.astype(np.int64)


# ---------------------------------------------------------------------------
# bbox -> SFC range decomposition (recursive quadtree cover; exact)
# ---------------------------------------------------------------------------

def zorder_ranges(
    col_min: int, row_min: int, col_max: int, row_max: int, zoom: int, max_ranges: int = 512
) -> list[tuple[int, int]]:
    """Decompose an inclusive key bbox on the 2^zoom grid into a minimal
    sorted list of inclusive ``(lo, hi)`` Z-order ranges — the BIGMIN-style
    index-range query used by layer reads (predicate pushdown). Exact: the
    union of ranges is exactly the bbox's key set. If the exact decomposition
    exceeds ``max_ranges``, coarser (superset) ranges are returned by stopping
    recursion early; callers must then re-filter by (col,row)."""
    out: list[tuple[int, int]] = []

    def rec(qc: int, qr: int, level: int, zbase: int, coarse: bool) -> None:
        # quadrant at `level` covers cells [qc, qc+sz) x [qr, qr+sz)
        sz = 1 << (zoom - level)
        c1, r1 = qc + sz - 1, qr + sz - 1
        if qc > col_max or c1 < col_min or qr > row_max or r1 < row_min:
            return
        if coarse or (qc >= col_min and c1 <= col_max and qr >= row_min and r1 <= row_max):
            out.append((zbase, zbase + sz * sz - 1))
            return
        half = sz // 2
        quad = sz * sz // 4
        # recurse children in Z order: (0,0) (1,0) (0,1) (1,1) offsets
        rec(qc, qr, level + 1, zbase, len(out) > max_ranges)
        rec(qc + half, qr, level + 1, zbase + quad, len(out) > max_ranges)
        rec(qc, qr + half, level + 1, zbase + 2 * quad, len(out) > max_ranges)
        rec(qc + half, qr + half, level + 1, zbase + 3 * quad, len(out) > max_ranges)

    single = col_min == col_max and row_min == row_max
    if single:
        z = int(zorder(col_min, row_min))
        return [(z, z)]
    rec(0, 0, 0, 0, False)
    out.sort()
    # merge adjacent/overlapping
    merged: list[tuple[int, int]] = []
    for lo, hi in out:
        if merged and lo <= merged[-1][1] + 1:
            merged[-1] = (merged[-1][0], max(merged[-1][1], hi))
        else:
            merged.append((lo, hi))
    return merged


def hilbert_ranges(
    col_min: int, row_min: int, col_max: int, row_max: int, zoom: int, max_cells: int = 65536
) -> list[tuple[int, int]]:
    """Inclusive Hilbert ranges covering the bbox. Exact via enumeration for
    bboxes up to ``max_cells`` cells; for larger boxes returns the single
    conservative [min,max] superset range (callers re-filter by key)."""
    ncells = (col_max - col_min + 1) * (row_max - row_min + 1)
    if ncells > max_cells:
        # conservative: hilbert of the 4 corners + edges doesn't bound the
        # range in general; enumerate the bbox PERIMETER is also insufficient,
        # so fall back to full-curve superset of observed min/max over a
        # coarse subsample — still a superset ONLY if we take [0, 4^zoom);
        # we choose correctness: whole-curve range. (Checked BEFORE any
        # allocation — a near-full-grid bbox at zoom 20 is ~2^40 cells.)
        return [(0, (1 << (2 * zoom)) * 1 - 1)]
    cols, rows = np.meshgrid(
        np.arange(col_min, col_max + 1), np.arange(row_min, row_max + 1)
    )
    d = np.sort(hilbert(cols.ravel(), rows.ravel(), zoom))
    ranges: list[tuple[int, int]] = []
    lo = prev = int(d[0])
    for v in d[1:]:
        v = int(v)
        if v == prev + 1:
            prev = v
        else:
            ranges.append((lo, prev))
            lo = prev = v
    ranges.append((lo, prev))
    return ranges


def sfc_key(col, row, zoom: int, kind: str = "zorder") -> np.ndarray:
    """The engine's sfc column: zorder (default) or hilbert at `zoom`."""
    if kind == "zorder":
        return zorder(col, row)
    if kind == "hilbert":
        return hilbert(col, row, zoom)
    raise ValueError(f"unknown sfc kind: {kind}")


# ---------------------------------------------------------------------------
# SpaceTimeKey Z3 index (col, row, time_bin) -> uint64
# (ref:store/src/main/scala/geotrellis/store/index/zcurve/Z3.scala +
#  ZSpaceTimeKeyIndex.scala, L:unverified — /root/reference empty at survey
#  time). 21 bits per dimension: zooms <= 21 and 2^21 time bins.
# ---------------------------------------------------------------------------

def _spread3(v: np.ndarray) -> np.ndarray:
    """Insert two zero bits between each of the low 21 bits."""
    v = v.astype(np.uint64) & np.uint64(0x1FFFFF)
    v = (v | (v << np.uint64(32))) & np.uint64(0x1F00000000FFFF)
    v = (v | (v << np.uint64(16))) & np.uint64(0x1F0000FF0000FF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x100F00F00F00F00F)
    v = (v | (v << np.uint64(4))) & np.uint64(0x10C30C30C30C30C3)
    v = (v | (v << np.uint64(2))) & np.uint64(0x1249249249249249)
    return v


def _compact3(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.uint64) & np.uint64(0x1249249249249249)
    v = (v | (v >> np.uint64(2))) & np.uint64(0x10C30C30C30C30C3)
    v = (v | (v >> np.uint64(4))) & np.uint64(0x100F00F00F00F00F)
    v = (v | (v >> np.uint64(8))) & np.uint64(0x1F0000FF0000FF)
    v = (v | (v >> np.uint64(16))) & np.uint64(0x1F00000000FFFF)
    v = (v | (v >> np.uint64(32))) & np.uint64(0x1FFFFF)
    return v


def zorder3(col, row, t) -> np.ndarray:
    """SpaceTimeKey Morton interleave: bit i of col/row/t -> bits 3i/3i+1/3i+2."""
    c = np.asarray(col, dtype=np.uint64)
    r = np.asarray(row, dtype=np.uint64)
    tt = np.asarray(t, dtype=np.uint64)
    return _spread3(c) | (_spread3(r) << np.uint64(1)) | (_spread3(tt) << np.uint64(2))


def zorder3_decode(z) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    z = np.asarray(z, dtype=np.uint64)
    return _compact3(z), _compact3(z >> np.uint64(1)), _compact3(z >> np.uint64(2))
