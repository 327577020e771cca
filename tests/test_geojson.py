"""GeoJSON/WKT IO tests: byte-exact WKB round-trips through both text
formats, and the distributed read_geojson source."""

from __future__ import annotations

import json

import numpy as np
import pytest

from geotrellis_ray.core import wkb
from geotrellis_ray.core.geojson import (
    geojson_to_geom,
    geom_to_geojson,
    parse_feature_collection,
    read_geojson,
    wkt_decode,
    wkt_encode,
    write_geojson_batch,
)


def _sample_geoms():
    sq = np.array([(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0)])
    hole = np.array([(0.5, 0.5), (1.5, 0.5), (1.5, 1.5), (0.5, 1.5)])
    return [
        {"type": "Point", "coords": np.array([3.25, -7.5])},
        {"type": "LineString", "coords": np.array([(0.0, 0.0), (1.5, 2.5), (3.0, -1.0)])},
        {"type": "Polygon", "rings": [sq]},
        {"type": "Polygon", "rings": [sq, hole]},
        {"type": "MultiPoint", "parts": [{"type": "Point", "coords": np.array([1.0, 2.0])},
                                         {"type": "Point", "coords": np.array([-3.0, 4.5])}]},
        {"type": "MultiLineString", "parts": [
            {"type": "LineString", "coords": np.array([(0.0, 0.0), (1.0, 1.0)])},
            {"type": "LineString", "coords": np.array([(2.0, 2.0), (3.0, 1.0), (4.0, 4.0)])}]},
        {"type": "MultiPolygon", "parts": [
            {"type": "Polygon", "rings": [sq]},
            {"type": "Polygon", "rings": [sq + 10.0, hole + 10.0]}]},
    ]


@pytest.mark.parametrize("geom", _sample_geoms(), ids=lambda g: g["type"] + str(len(g.get("rings", g.get("parts", [1])))))
def test_geojson_roundtrip_wkb_exact(geom):
    back = geojson_to_geom(geom_to_geojson(geom))
    # ring closure is canonicalized by the wkb encoder, so compare WKB bytes
    assert wkb.encode(back) == wkb.encode(geom)


@pytest.mark.parametrize("geom", _sample_geoms(), ids=lambda g: g["type"] + str(len(g.get("rings", g.get("parts", [1])))))
def test_wkt_roundtrip_wkb_exact(geom):
    s = wkt_encode(geom)
    assert s.split(" ")[0] == geom["type"].upper().replace("STRING", "STRING")
    back = wkt_decode(s)
    assert wkb.encode(back) == wkb.encode(geom)


def test_parse_feature_collection_variants():
    g = _sample_geoms()[2]
    fc = {"type": "FeatureCollection", "features": [
        {"type": "Feature", "geometry": geom_to_geojson(g), "properties": {"name": "sq", "v": 3}},
        {"type": "Feature", "geometry": geom_to_geojson(_sample_geoms()[0]), "properties": None},
    ]}
    feats = parse_feature_collection(json.dumps(fc))
    assert len(feats) == 2 and feats[0][1] == {"name": "sq", "v": 3} and feats[1][1] == {}
    # bare geometry and bare feature
    assert parse_feature_collection(json.dumps(geom_to_geojson(g)))[0][1] == {}
    # ndjson of features
    nd = "\n".join(json.dumps({"type": "Feature", "geometry": geom_to_geojson(x), "properties": {}})
                   for x in _sample_geoms()[:3])
    assert len(parse_feature_collection(nd)) == 3


def test_read_geojson_distributed(ray_session, tmp_path):
    from geotrellis_ray.fixtures import gen_polygons_table

    tab = gen_polygons_table()
    geoms = [wkb.decode(b) for b in tab["wkb"].to_pylist()[:20]]
    names = tab["name"].to_pylist()[:20]
    for k in range(4):  # 4 files x 5 features
        fc = {"type": "FeatureCollection", "features": [
            {"type": "Feature", "geometry": geom_to_geojson(geoms[i]),
             "properties": {"name": names[i], "polygon_id": i}}
            for i in range(k * 5, k * 5 + 5)
        ]}
        (tmp_path / f"f{k}.geojson").write_text(json.dumps(fc))
    ds = read_geojson(str(tmp_path))
    df = ds.to_pandas().sort_values(["path", "feature_idx"]).reset_index(drop=True)
    assert len(df) == 20
    props = [json.loads(p) for p in df["properties"]]
    assert [p["polygon_id"] for p in props] == list(range(20))
    # geometry survives byte-exactly
    assert df["wkb"].tolist() == [wkb.encode(g) for g in geoms]
    # and the export helper round-trips
    import pyarrow as pa

    batch = pa.table({"wkb": pa.array(df["wkb"].tolist(), pa.binary()),
                      "name": pa.array([p["name"] for p in props], pa.string())})
    out = json.loads(write_geojson_batch(batch, props_cols=["name"]))
    assert len(out["features"]) == 20
    assert [parse_feature_collection(json.dumps(out))[i][1]["name"] for i in range(3)] == names[:3]
