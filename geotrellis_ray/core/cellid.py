"""Discrete-global-grid cell ids: an S2-style cube-face quadtree id and an
H3-style hexagonal id — both OUR OWN published specs, implemented from
scratch, vectorized (north_star mandates H3/S2 cells; exact bit-compat with
Google S2 / Uber H3 is explicitly NOT required — BASELINE.json north_rule
"from scratch", SURVEY.md §7.3. No GeoTrellis counterpart; /root/reference
empty at survey time).

S2-like spec (``cell_s2like``): 64-bit id =

    bits 63..61  face f in 0..5       (cube face, +x -x +y -y +z -z order)
    bits 60..61-2L  Morton interleave of (i, j) at level L (2 bits/level,
                    i -> even bits of the pair, MSB-first)
    bits below      zero-padded
    bits 4..0    level L (0..28)

Projection: lat/lon -> unit sphere (x,y,z) -> dominant-axis face -> gnomonic
(u,v) in [-1,1] -> LINEAR (not tan/quadratic — our spec) (s,t) in [0,1) ->
i = floor(s * 2^L), j likewise.

Hex spec (``cell_hexlike``): pointy-top axial hex grid laid over the
equirectangular lon/lat plane. Resolution r has hex size (circumradius, in
degrees) ``size = 45 / 2^r``. 64-bit id =

    bits 63..60  resolution r (0..15)
    bits 59..30  q axial coord, two's-complement 30-bit
    bits 29..0   s axial coord, two's-complement 30-bit

Neighbours via the 6 axial direction vectors; k-rings via the standard cube-
coordinate ring walk — used by the kNN ring-expansion search.
"""

from __future__ import annotations

import numpy as np

from .sfc import zorder

# ---------------------------------------------------------------------------
# S2-like cube-face quadtree
# ---------------------------------------------------------------------------

S2_MAX_LEVEL = 28


def _sphere_xyz(lat, lon):
    la = np.radians(np.asarray(lat, dtype=np.float64))
    lo = np.radians(np.asarray(lon, dtype=np.float64))
    cl = np.cos(la)
    return cl * np.cos(lo), cl * np.sin(lo), np.sin(la)


def cell_s2like(lat, lon, level: int) -> np.ndarray:
    """Vectorized lat/lon -> S2-like cell id at `level` (see module spec)."""
    if not 0 <= level <= S2_MAX_LEVEL:
        raise ValueError("level must be in [0, 28]")
    x, y, z = _sphere_xyz(lat, lon)
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    # dominant axis -> face: 0:+x 1:-x 2:+y 3:-y 4:+z 5:-z
    face = np.where(
        (ax >= ay) & (ax >= az),
        np.where(x >= 0, 0, 1),
        np.where(ay >= az, np.where(y >= 0, 2, 3), np.where(z >= 0, 4, 5)),
    ).astype(np.uint64)
    # gnomonic projection onto the dominant face, divided by the SIGNED
    # dominant component (our spec): X faces -> (y/x, z/x), Y faces ->
    # (x/y, z/y), Z faces -> (x/z, y/z). Bijective per face.
    axis_x = (face == 0) | (face == 1)
    axis_y = (face == 2) | (face == 3)
    with np.errstate(divide="ignore", invalid="ignore"):
        u = np.select([axis_x, axis_y], [y / x, x / y], default=x / z)
        v = np.select([axis_x, axis_y], [z / x, z / y], default=y / z)
    u = np.clip(np.nan_to_num(u), -1.0, 1.0)
    v = np.clip(np.nan_to_num(v), -1.0, 1.0)
    n = np.uint64(1) << np.uint64(level)
    nf = float(1 << level)
    i = np.minimum((np.uint64(0) + ((u + 1.0) * 0.5 * nf).astype(np.uint64)), n - np.uint64(1))
    j = np.minimum((np.uint64(0) + ((v + 1.0) * 0.5 * nf).astype(np.uint64)), n - np.uint64(1))
    m = zorder(i, j)  # i -> even bits
    pos_bits = np.uint64(2 * level)
    cid = (face << np.uint64(61)) | (m << (np.uint64(61) - pos_bits)) | np.uint64(level)
    return cid


def s2like_parent(cid, parent_level: int) -> np.ndarray:
    """Truncate an id to an ancestor level (clears finer position bits)."""
    cid = np.asarray(cid, dtype=np.uint64)
    keep = np.uint64(61 - 2 * parent_level)
    mask = ~((np.uint64(1) << keep) - np.uint64(1))
    return (cid & mask & ~np.uint64(0x1F)) | np.uint64(parent_level)


def s2like_level(cid) -> np.ndarray:
    return (np.asarray(cid, dtype=np.uint64) & np.uint64(0x1F)).astype(np.int64)


# ---------------------------------------------------------------------------
# H3-like axial hex grid (pointy-top, equirectangular plane)
# ---------------------------------------------------------------------------

_SQRT3 = np.sqrt(3.0)
_HEX_MASK30 = np.uint64((1 << 30) - 1)
# axial neighbour directions (dq, ds)
HEX_DIRS = [(1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1)]


def hex_size(res: int) -> float:
    return 45.0 / float(1 << res)


def _axial_round(qf: np.ndarray, rf: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Cube-coordinate rounding (x=q, z=r, y=-x-z), vectorized."""
    xf, zf = qf, rf
    yf = -xf - zf
    rx, ry, rz = np.round(xf), np.round(yf), np.round(zf)
    dx, dy, dz = np.abs(rx - xf), np.abs(ry - yf), np.abs(rz - zf)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & (dz > dy)
    rx = np.where(fix_x, -ry - rz, rx)
    rz = np.where(fix_z, -rx - ry, rz)
    return rx.astype(np.int64), rz.astype(np.int64)


def hex_qr(lat, lon, res: int) -> tuple[np.ndarray, np.ndarray]:
    """lat/lon -> axial (q, r) at resolution `res` (pointy-top; x=lon, y=lat)."""
    size = hex_size(res)
    x = np.asarray(lon, dtype=np.float64) / size
    y = np.asarray(lat, dtype=np.float64) / size
    qf = (_SQRT3 / 3.0) * x - (1.0 / 3.0) * y
    rf = (2.0 / 3.0) * y
    return _axial_round(qf, rf)


def hex_center(q, r, res: int) -> tuple[np.ndarray, np.ndarray]:
    """axial (q, r) -> (lat, lon) of the hex center."""
    size = hex_size(res)
    q = np.asarray(q, dtype=np.float64)
    r = np.asarray(r, dtype=np.float64)
    lon = size * (_SQRT3 * q + _SQRT3 / 2.0 * r)
    lat = size * (1.5 * r)
    return lat, lon


def hex_pack(q, r, res: int) -> np.ndarray:
    q = np.asarray(q, dtype=np.int64)
    r = np.asarray(r, dtype=np.int64)
    qm = q.astype(np.uint64) & _HEX_MASK30
    rm = r.astype(np.uint64) & _HEX_MASK30
    return (np.uint64(res) << np.uint64(60)) | (qm << np.uint64(30)) | rm


def hex_unpack(cid) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    cid = np.asarray(cid, dtype=np.uint64)
    res = (cid >> np.uint64(60)).astype(np.int64)
    q = ((cid >> np.uint64(30)) & _HEX_MASK30).astype(np.int64)
    r = (cid & _HEX_MASK30).astype(np.int64)
    # sign-extend 30-bit two's complement
    sign = np.int64(1 << 29)
    q = (q ^ sign) - sign
    r = (r ^ sign) - sign
    return q, r, res


def cell_hexlike(lat, lon, res: int) -> np.ndarray:
    """Vectorized lat/lon -> H3-like hex cell id (see module spec)."""
    if not 0 <= res <= 15:
        raise ValueError("res must be in [0, 15]")
    q, r = hex_qr(lat, lon, res)
    return hex_pack(q, r, res)


def hex_ring(q: int, r: int, k: int) -> list[tuple[int, int]]:
    """The ring of hexes at exactly distance k from (q, r) (k=0 -> itself).
    Standard cube-coordinate ring walk; used by kNN ring expansion."""
    if k == 0:
        return [(q, r)]
    out = []
    cq, cr = q + HEX_DIRS[4][0] * k, r + HEX_DIRS[4][1] * k
    for side in range(6):
        dq, dr = HEX_DIRS[side]
        for _ in range(k):
            out.append((cq, cr))
            cq += dq
            cr += dr
    return out


def hex_disk(q: int, r: int, k: int) -> list[tuple[int, int]]:
    """All hexes within distance k (the filled k-ring)."""
    out = []
    for kk in range(k + 1):
        out.extend(hex_ring(q, r, kk))
    return out


# ---------------------------------------------------------------------------
# Geohash (public base32 spec, Niemeyer 2008)
# ---------------------------------------------------------------------------

GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"
_GH_ARR = np.array(list(GEOHASH_ALPHABET))


def geohash_encode(lat, lon, precision: int = 6) -> np.ndarray:
    """Vectorized geohash strings (standard spec: bits alternate starting
    with LONGITUDE; 5 bits/char, base32 alphabet). Bit-identical to the
    reference algorithm: lon gets ceil(5p/2) bits, lat floor(5p/2), each
    axis quantized by successive halving == floor(frac * 2^bits) clipped."""
    if not 1 <= precision <= 12:
        raise ValueError("precision must be in [1, 12]")
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    total = 5 * precision
    lon_bits = (total + 1) // 2
    lat_bits = total // 2
    lonq = np.clip(((lon + 180.0) / 360.0 * (1 << lon_bits)).astype(np.int64),
                   0, (1 << lon_bits) - 1).astype(np.uint64)
    latq = np.clip(((lat + 90.0) / 180.0 * (1 << lat_bits)).astype(np.int64),
                   0, (1 << lat_bits) - 1).astype(np.uint64)
    z = np.zeros(len(lonq) if lonq.ndim else 1, np.uint64)
    li, ai = lon_bits, lat_bits
    for b in range(total):
        z <<= np.uint64(1)
        if b % 2 == 0:
            li -= 1
            z |= (lonq >> np.uint64(li)) & np.uint64(1)
        else:
            ai -= 1
            z |= (latq >> np.uint64(ai)) & np.uint64(1)
    out = np.empty(len(z), dtype=object)
    out[:] = ""
    for k in range(precision):
        idx = ((z >> np.uint64(5 * (precision - 1 - k))) & np.uint64(31)).astype(np.int64)
        out = np.char.add(out.astype(str), _GH_ARR[idx])
    return out.astype(object)


def geohash_decode(gh: str) -> tuple[float, float, float, float]:
    """Geohash -> (lat_min, lat_max, lon_min, lon_max) cell bounds."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    even = True
    for ch in gh:
        v = GEOHASH_ALPHABET.index(ch)
        for b in (16, 8, 4, 2, 1):
            if even:
                mid = (lon_lo + lon_hi) / 2
                if v & b:
                    lon_lo = mid
                else:
                    lon_hi = mid
            else:
                mid = (lat_lo + lat_hi) / 2
                if v & b:
                    lat_lo = mid
                else:
                    lat_hi = mid
            even = not even
    return lat_lo, lat_hi, lon_lo, lon_hi
