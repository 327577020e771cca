"""GeoJSON + WKT IO for the engine's geometry dict model (core/wkb.py).

Re-expresses (pure Python/numpy, no shapely in this environment):
- ref:vector/src/main/scala/geotrellis/vector/io/json/GeometryFormats.scala
- ref:vector/src/main/scala/geotrellis/vector/io/wkt/WKT.scala
(L:unverified — /root/reference empty at survey time; SURVEY.md §2.1.)

Geometry dicts: {"type": "Point", "coords": (2,)}, {"type": "LineString",
"coords": (n,2)}, {"type": "Polygon", "rings": [(n,2), ...]},
{"type": "MultiX", "parts": [...]}.

``read_geojson`` is the distributed feature source: files stream through
``ray.data.read_binary_files`` and each FeatureCollection parses inside
``map_batches`` (one task per file — the parallel unit is the file, like
every other ingest in this engine). Properties land in a JSON string column
(schema-stable regardless of heterogeneity); geometry lands as WKB.
"""

from __future__ import annotations

import json
import re

import numpy as np

from . import wkb


# --- GeoJSON ----------------------------------------------------------------

def geom_to_geojson(geom: dict) -> dict:
    t = geom["type"]
    if t == "Point":
        c = np.asarray(geom["coords"], dtype=np.float64).ravel()[:2]
        return {"type": "Point", "coordinates": [float(c[0]), float(c[1])]}
    if t == "LineString":
        return {"type": "LineString",
                "coordinates": np.asarray(geom["coords"], dtype=np.float64).tolist()}
    if t == "Polygon":
        return {"type": "Polygon",
                "coordinates": [_closed(np.asarray(r, dtype=np.float64)).tolist()
                                for r in geom["rings"]]}
    if t in ("MultiPoint", "MultiLineString", "MultiPolygon"):
        inner = [geom_to_geojson(p)["coordinates"] for p in geom["parts"]]
        return {"type": t, "coordinates": inner}
    raise ValueError(f"unsupported geometry type {t}")


def _closed(ring: np.ndarray) -> np.ndarray:
    if len(ring) and not np.array_equal(ring[0], ring[-1]):
        return np.vstack([ring, ring[:1]])
    return ring


def geojson_to_geom(obj: dict) -> dict:
    t = obj["type"]
    c = obj.get("coordinates")
    if t == "Point":
        return {"type": "Point", "coords": np.asarray(c, dtype=np.float64)}
    if t == "LineString":
        return {"type": "LineString", "coords": np.asarray(c, dtype=np.float64)}
    if t == "Polygon":
        return {"type": "Polygon", "rings": [np.asarray(r, dtype=np.float64) for r in c]}
    if t == "MultiPoint":
        return {"type": "MultiPoint",
                "parts": [{"type": "Point", "coords": np.asarray(p, dtype=np.float64)} for p in c]}
    if t == "MultiLineString":
        return {"type": "MultiLineString",
                "parts": [{"type": "LineString", "coords": np.asarray(p, dtype=np.float64)} for p in c]}
    if t == "MultiPolygon":
        return {"type": "MultiPolygon",
                "parts": [{"type": "Polygon",
                           "rings": [np.asarray(r, dtype=np.float64) for r in p]} for p in c]}
    if t == "GeometryCollection":
        raise ValueError("GeometryCollection is not supported")
    raise ValueError(f"unsupported GeoJSON type {t}")


def feature_collection(geoms: list[dict], properties: list[dict] | None = None) -> dict:
    feats = []
    for i, g in enumerate(geoms):
        feats.append({
            "type": "Feature",
            "geometry": geom_to_geojson(g),
            "properties": (properties[i] if properties else {}) or {},
        })
    return {"type": "FeatureCollection", "features": feats}


def parse_feature_collection(text: str | bytes) -> list[tuple[dict, dict]]:
    """-> [(geom dict, properties dict)]. Accepts a FeatureCollection, a bare
    Feature, a bare geometry, or newline-delimited GeoJSON features."""
    if isinstance(text, bytes):
        text = text.decode("utf-8")
    text = text.strip()
    if "\n" in text and not text.startswith("{"):
        raise ValueError("not a GeoJSON document")
    try:
        obj = json.loads(text)
        objs = [obj]
    except json.JSONDecodeError:
        objs = [json.loads(line) for line in text.splitlines() if line.strip()]
    out: list[tuple[dict, dict]] = []
    for o in objs:
        if o.get("type") == "FeatureCollection":
            for f in o["features"]:
                out.append((geojson_to_geom(f["geometry"]), f.get("properties") or {}))
        elif o.get("type") == "Feature":
            out.append((geojson_to_geom(o["geometry"]), o.get("properties") or {}))
        else:
            out.append((geojson_to_geom(o), {}))
    return out


def read_geojson(path: str):
    """GeoJSON file(s)/dir -> Dataset (path, feature_idx, wkb, properties
    [JSON string]). One parse task per file; properties stay a JSON column so
    heterogeneous files keep a stable schema (project with a later
    map_batches when typed columns are needed)."""
    import pyarrow as pa
    import ray.data

    raw = ray.data.read_binary_files(path, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        paths, idxs, wkbs, props = [], [], [], []
        for p, data in zip(batch["path"].to_pylist(), batch["bytes"].to_pylist()):
            for i, (geom, pr) in enumerate(parse_feature_collection(data)):
                paths.append(p)
                idxs.append(i)
                wkbs.append(wkb.encode(geom))
                props.append(json.dumps(pr, sort_keys=True))
        return pa.table({
            "path": pa.array(paths, pa.string()),
            "feature_idx": pa.array(idxs, pa.int64()),
            "wkb": pa.array(wkbs, pa.binary()),
            "properties": pa.array(props, pa.string()),
        })

    return raw.map_batches(parse, batch_format="pyarrow", zero_copy_batch=True)


def write_geojson_batch(batch, wkb_col: str = "wkb", props_cols: list[str] | None = None) -> str:
    """Arrow batch -> FeatureCollection JSON string (driver/test-side helper
    for exporting small result sets; large exports should write per-shard
    files via map_batches + a binary sink)."""
    geoms = [wkb.decode(b) for b in batch[wkb_col].to_pylist()]
    props = None
    if props_cols:
        cols = {c: batch[c].to_pylist() for c in props_cols}
        props = [{c: cols[c][i] for c in props_cols} for i in range(batch.num_rows)]
    return json.dumps(feature_collection(geoms, props), sort_keys=True)


# --- WKT --------------------------------------------------------------------

def _f(x: float) -> str:
    # repr gives the SHORTEST decimal that round-trips the float64 exactly
    # (a fixed %.10g loses bits on values needing more digits)
    return repr(float(x))


def _fmt_coords(coords: np.ndarray) -> str:
    return ", ".join(f"{_f(x)} {_f(y)}" for x, y in np.asarray(coords, dtype=np.float64))


def wkt_encode(geom: dict) -> str:
    t = geom["type"]
    if t == "Point":
        c = np.asarray(geom["coords"], dtype=np.float64).ravel()[:2]
        return f"POINT ({_f(c[0])} {_f(c[1])})"
    if t == "LineString":
        return f"LINESTRING ({_fmt_coords(geom['coords'])})"
    if t == "Polygon":
        rings = ", ".join(f"({_fmt_coords(_closed(np.asarray(r)))})" for r in geom["rings"])
        return f"POLYGON ({rings})"
    if t == "MultiPoint":
        pts = ", ".join(f"({_fmt_coords(np.asarray(p['coords']).reshape(1, 2))})" for p in geom["parts"])
        return f"MULTIPOINT ({pts})"
    if t == "MultiLineString":
        ls = ", ".join(f"({_fmt_coords(p['coords'])})" for p in geom["parts"])
        return f"MULTILINESTRING ({ls})"
    if t == "MultiPolygon":
        polys = ", ".join(
            "(" + ", ".join(f"({_fmt_coords(_closed(np.asarray(r)))})" for r in p["rings"]) + ")"
            for p in geom["parts"]
        )
        return f"MULTIPOLYGON ({polys})"
    raise ValueError(f"unsupported geometry type {t}")


_WKT_HEAD = re.compile(r"^\s*([A-Za-z]+)\s*(EMPTY|\(.*\))\s*$", re.S)


def _split_top(s: str) -> list[str]:
    """Split a parenthesized list body on top-level commas."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur).strip())
    return parts


def _strip_parens(s: str) -> str:
    s = s.strip()
    if not (s.startswith("(") and s.endswith(")")):
        raise ValueError(f"malformed WKT fragment: {s[:40]!r}")
    return s[1:-1]


def _parse_coords(s: str) -> np.ndarray:
    pts = [p.strip() for p in s.split(",") if p.strip()]
    return np.array([[float(v) for v in p.split()[:2]] for p in pts], dtype=np.float64)


def wkt_decode(s: str) -> dict:
    m = _WKT_HEAD.match(s)
    if not m:
        raise ValueError(f"malformed WKT: {s[:60]!r}")
    kind = m.group(1).upper()
    body = m.group(2)
    if body == "EMPTY":
        raise ValueError("EMPTY geometries are not supported")
    inner = _strip_parens(body)
    if kind == "POINT":
        return {"type": "Point", "coords": _parse_coords(inner)[0]}
    if kind == "LINESTRING":
        return {"type": "LineString", "coords": _parse_coords(inner)}
    if kind == "POLYGON":
        return {"type": "Polygon",
                "rings": [_parse_coords(_strip_parens(r)) for r in _split_top(inner)]}
    if kind == "MULTIPOINT":
        pts = []
        for frag in _split_top(inner):
            frag = frag.strip()
            coords = _parse_coords(_strip_parens(frag) if frag.startswith("(") else frag)
            pts.append({"type": "Point", "coords": coords[0]})
        return {"type": "MultiPoint", "parts": pts}
    if kind == "MULTILINESTRING":
        return {"type": "MultiLineString",
                "parts": [{"type": "LineString", "coords": _parse_coords(_strip_parens(f))}
                          for f in _split_top(inner)]}
    if kind == "MULTIPOLYGON":
        polys = []
        for frag in _split_top(inner):
            rings = [_parse_coords(_strip_parens(r)) for r in _split_top(_strip_parens(frag))]
            polys.append({"type": "Polygon", "rings": rings})
        return {"type": "MultiPolygon", "parts": polys}
    raise ValueError(f"unsupported WKT type {kind}")
