"""Minimal pure-Python/numpy WKB codec (no shapely in this environment).

Covers the geometry types the engine needs: Point, LineString, Polygon (with
rings), MultiPoint, MultiLineString, MultiPolygon. Little-endian ISO WKB.

Re-expresses: ref:vector/src/main/scala/geotrellis/vector/io/wkb/WKB.scala
(L:unverified; /root/reference empty at survey time — SURVEY.md §0/§2.1).

Decoded representation (plain dict — cheap to build per batch, numpy coords):
    {"type": "Point",        "coords": np.ndarray (2,)}
    {"type": "LineString",   "coords": np.ndarray (n, 2)}
    {"type": "Polygon",      "rings":  [np.ndarray (n, 2), ...]}  # ring 0 = shell
    {"type": "MultiX",       "parts":  [decoded dicts]}
"""

from __future__ import annotations

import struct

import numpy as np

_POINT, _LINESTRING, _POLYGON, _MULTIPOINT, _MULTILINESTRING, _MULTIPOLYGON = 1, 2, 3, 4, 5, 6
_TYPE_NAMES = {
    _POINT: "Point",
    _LINESTRING: "LineString",
    _POLYGON: "Polygon",
    _MULTIPOINT: "MultiPoint",
    _MULTILINESTRING: "MultiLineString",
    _MULTIPOLYGON: "MultiPolygon",
}
_TYPE_CODES = {v: k for k, v in _TYPE_NAMES.items()}


def encode_point(x: float, y: float) -> bytes:
    return struct.pack("<BIdd", 1, _POINT, x, y)


def encode_linestring(coords) -> bytes:
    coords = np.asarray(coords, dtype="<f8")
    return struct.pack("<BII", 1, _LINESTRING, len(coords)) + coords.tobytes()


def encode_polygon(rings) -> bytes:
    """rings: list of (n,2) arrays, ring 0 = shell; rings are closed here if
    not already (first point appended)."""
    out = [struct.pack("<BII", 1, _POLYGON, len(rings))]
    for ring in rings:
        ring = np.asarray(ring, dtype="<f8")
        if not np.array_equal(ring[0], ring[-1]):
            ring = np.vstack([ring, ring[:1]])
        out.append(struct.pack("<I", len(ring)) + ring.tobytes())
    return b"".join(out)


def encode_multi(kind: str, parts: list[bytes]) -> bytes:
    return struct.pack("<BII", 1, _TYPE_CODES[kind], len(parts)) + b"".join(parts)


def encode(geom: dict) -> bytes:
    t = geom["type"]
    if t == "Point":
        x, y = np.asarray(geom["coords"], dtype=np.float64).ravel()[:2]
        return encode_point(float(x), float(y))
    if t == "LineString":
        return encode_linestring(geom["coords"])
    if t == "Polygon":
        return encode_polygon(geom["rings"])
    if t in ("MultiPoint", "MultiLineString", "MultiPolygon"):
        return encode_multi(t, [encode(p) for p in geom["parts"]])
    raise ValueError(f"unsupported geometry type {t}")


def _decode_at(buf: bytes, off: int) -> tuple[dict, int]:
    byte_order = buf[off]
    endian = "<" if byte_order == 1 else ">"
    (gtype,) = struct.unpack_from(endian + "I", buf, off + 1)
    gtype &= 0xFF  # tolerate SRID-less ISO variants
    off += 5
    if gtype == _POINT:
        x, y = struct.unpack_from(endian + "dd", buf, off)
        return {"type": "Point", "coords": np.array([x, y])}, off + 16
    if gtype == _LINESTRING:
        (n,) = struct.unpack_from(endian + "I", buf, off)
        off += 4
        coords = np.frombuffer(buf, dtype=endian + "f8", count=2 * n, offset=off).reshape(n, 2)
        return {"type": "LineString", "coords": coords}, off + 16 * n
    if gtype == _POLYGON:
        (nrings,) = struct.unpack_from(endian + "I", buf, off)
        off += 4
        rings = []
        for _ in range(nrings):
            (n,) = struct.unpack_from(endian + "I", buf, off)
            off += 4
            rings.append(np.frombuffer(buf, dtype=endian + "f8", count=2 * n, offset=off).reshape(n, 2))
            off += 16 * n
        return {"type": "Polygon", "rings": rings}, off
    if gtype in (_MULTIPOINT, _MULTILINESTRING, _MULTIPOLYGON):
        (nparts,) = struct.unpack_from(endian + "I", buf, off)
        off += 4
        parts = []
        for _ in range(nparts):
            part, off = _decode_at(buf, off)
            parts.append(part)
        return {"type": _TYPE_NAMES[gtype], "parts": parts}, off
    raise ValueError(f"unsupported wkb geometry code {gtype}")


def decode(buf: bytes) -> dict:
    geom, _ = _decode_at(buf, 0)
    return geom
