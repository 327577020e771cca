"""Deterministic synthetic fixtures: the `pages` corpus and the `polygons`
join table (FIXTURES.md §1–§3). Everything is a pure function of (i, seed) —
no RNG state across rows — so any scale/parallelism reproduces byte-identical
tables. The generator writes ``text = extract_text(html)``, making the
byte-identity invariant (BASELINE.json input_hint) testable end-to-end.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from .core.geocode import CLUSTERS, geotag_coords, url_hash64
from .core.text import extract_text
from .core.wkb import encode_polygon

EPOCH_2025_US = 1735689600000000  # 2025-01-01T00:00:00Z in microseconds
LANGS = ["en", "de", "fr", "es", "pt", "zh", "ru", "ja"]

# fixed 256-word list, deterministic composition (no RNG)
_SYL = ["ba", "co", "di", "fu", "ge", "ha", "ki", "lo", "mu", "ne", "po", "qua", "ri", "so", "tu", "ve"]
WORDLIST = [_SYL[i // 16] + _SYL[i % 16] + ("s" if i % 3 == 0 else "") for i in range(256)]


def page_url(i: int) -> str:
    return f"https://site{i % 997}.example/p/{i}"


def page_html(i: int) -> bytes:
    url = page_url(i)
    d = hashlib.sha256(url.encode()).digest()
    h = int.from_bytes(d[:8], "big")
    nwords = 20 + h % 61
    body = " ".join(WORDLIST[(d[j % 32] + j) % 256] for j in range(nwords))
    geotag = b""
    if i % 5 == 0:
        glat, glon = geotag_coords(h)
        geotag = f'<meta name="geo.position" content="{glat:.6f};{glon:.6f}">'.encode()
    return (
        f"<html><head><title>Page {i}</title>".encode()
        + geotag
        + f"</head><body><h1>Page {i}</h1><p>".encode()
        + body.encode()
        + b"</p></body></html>"
    )


def gen_pages_table(n: int, start: int = 0) -> pa.Table:
    """Rows [start, start+n) of the pages corpus (FIXTURES.md §1 schema)."""
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for i in range(start, start + n):
        url = page_url(i)
        html = page_html(i)
        urls.append(url)
        tss.append(EPOCH_2025_US + i * 37_000_000)
        htmls.append(html)
        texts.append(extract_text(html))
        langs.append(LANGS[url_hash64(url) % 8])
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def write_pages_parquet(path: str, n: int, shard_rows: int = 100_000) -> list[str]:
    """Write the pages corpus as one parquet file per shard (resumable-layout
    friendly); returns file paths. Deterministic at any shard size."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    files = []
    for s, start in enumerate(range(0, n, shard_rows)):
        f = os.path.join(path, f"pages-{s:05d}.parquet")
        files.append(f)
        if os.path.exists(f):
            continue
        t = gen_pages_table(min(shard_rows, n - start), start)
        pq.write_table(t, f + ".tmp", row_group_size=25_000)
        os.replace(f + ".tmp", f)
    return files


# ---------------------------------------------------------------------------
# polygons — the small join side (FIXTURES.md §2)
# ---------------------------------------------------------------------------

def _convex_polygon(cx: float, cy: float, radius: float, nverts: int, phase: float) -> np.ndarray:
    ang = phase + np.arange(nverts) * (2 * np.pi / nverts)
    # deterministic per-vertex radial jitter (pure function of the angle index)
    jit = 0.6 + 0.4 * np.abs(np.sin(ang * 3.7 + phase))
    xs = cx + radius * jit * np.cos(ang)
    ys = cy + radius * jit * np.sin(ang)
    return np.column_stack([xs, ys])


def gen_polygons() -> list[dict]:
    """~171 deterministic polygons: 16x8 world rectangle grid (ids 0..127),
    40 convex polygons in the cluster boxes (ids 128..167), 3 overlapping
    polygons over cluster 0 (ids 168..170). Each dict: polygon_id, name,
    ring (numpy), bbox, zindex, value."""
    out = []
    for j in range(8):
        for i in range(16):
            pid = j * 16 + i
            xmin, ymin = -180.0 + i * 22.5, -90.0 + j * 22.5
            ring = np.array(
                [(xmin, ymin), (xmin + 22.5, ymin), (xmin + 22.5, ymin + 22.5), (xmin, ymin + 22.5)]
            )
            out.append(
                {
                    "polygon_id": pid,
                    "name": f"grid_{i}_{j}",
                    "ring": ring,
                    "zindex": 0,
                    "value": pid,
                }
            )
    for k in range(40):
        c = CLUSTERS[k % 5]
        h = int.from_bytes(hashlib.sha256(f"poly{k}".encode()).digest()[:8], "big")
        radius = 0.5 + (h % 1000) / 1000.0 * 4.5
        nverts = 8 + (h >> 10) % 9
        phase = ((h >> 20) % 6283) / 1000.0
        # center jittered inside the 2-degree cluster box
        cx = c[1] - 1.0 + ((h >> 32) % 2000) / 1000.0
        cy = c[0] - 1.0 + ((h >> 44) % 2000) / 1000.0
        ring = _convex_polygon(cx, cy, radius, nverts, phase)
        out.append({"polygon_id": 128 + k, "name": f"convex_{k}", "ring": ring, "zindex": 1, "value": 128 + k})
    # 3 overlapping polygons over cluster 0 (NYC) — multi-hit joins + z-index
    c0 = CLUSTERS[0]
    for k, (dx, dy, r) in enumerate([(-0.5, -0.5, 1.2), (0.5, -0.3, 1.0), (0.0, 0.5, 1.4)]):
        ring = _convex_polygon(c0[1] + dx, c0[0] + dy, r, 12, 0.3 * k)
        out.append({"polygon_id": 168 + k, "name": f"overlap_{k}", "ring": ring, "zindex": 2 + k, "value": 168 + k})
    for p in out:
        r = p["ring"]
        p["bbox"] = (float(r[:, 0].min()), float(r[:, 1].min()), float(r[:, 0].max()), float(r[:, 1].max()))
    return out


def gen_polygons_table() -> pa.Table:
    polys = gen_polygons()
    return pa.table(
        {
            "polygon_id": pa.array([p["polygon_id"] for p in polys], pa.int64()),
            "name": pa.array([p["name"] for p in polys], pa.string()),
            "wkb": pa.array([encode_polygon([p["ring"]]) for p in polys], pa.binary()),
            "xmin": pa.array([p["bbox"][0] for p in polys], pa.float64()),
            "ymin": pa.array([p["bbox"][1] for p in polys], pa.float64()),
            "xmax": pa.array([p["bbox"][2] for p in polys], pa.float64()),
            "ymax": pa.array([p["bbox"][3] for p in polys], pa.float64()),
            "zindex": pa.array([p["zindex"] for p in polys], pa.int32()),
            "value": pa.array([p["value"] for p in polys], pa.int32()),
        }
    )


def gen_rect_features(n: int = 160) -> pa.Table:
    """Cell-aligned dyadic rectangles on the 512x256 world grid (res =
    360/512 = 180/256 = 0.703125, exactly representable in binary): every
    edge lies on a CELL boundary and never on a TILE (32-cell) boundary —
    the %32 bump below — so no cell center can sit on a rectangle edge and
    no zero-width tile cover exists. Those are the two float ambiguities
    that kept Rasterize/ClipToGrid out of SQL; with them gone, the
    cell-center rule is integer interval membership and the DuckDB oracles
    (_sql_rasterize_rects / _sql_cliptogrid_rects) reproduce the mix32
    derivation verbatim. gy counts rows from the TOP (ymax), matching the
    engine's key_row orientation."""
    from .stages.sample import mix32

    i = np.arange(n, dtype=np.int64)
    a = (mix32(i) % 480 + 1).astype(np.int64)
    w = (mix32(i + 7001) % 20 + 1).astype(np.int64)
    b = (mix32(i + 7002) % 224 + 1).astype(np.int64)
    h = (mix32(i + 7003) % 12 + 1).astype(np.int64)
    z = (mix32(i + 7004) % 4).astype(np.int32)
    v = (mix32(i + 7005) % 1000 + 1).astype(np.int32)
    gx0 = a + (a % 32 == 0)
    gy0 = b + (b % 32 == 0)
    gx1 = gx0 + w
    gx1 = gx1 + (gx1 % 32 == 0)
    gy1 = gy0 + h
    gy1 = gy1 + (gy1 % 32 == 0)
    resx = 360.0 / 512.0
    resy = 180.0 / 256.0
    xmin = -180.0 + gx0 * resx
    xmax = -180.0 + gx1 * resx
    ymax = 90.0 - gy0 * resy
    ymin = 90.0 - gy1 * resy
    wkbs = [
        encode_polygon([np.array([[xmin[k], ymin[k]], [xmax[k], ymin[k]],
                                  [xmax[k], ymax[k]], [xmin[k], ymax[k]]])])
        for k in range(n)
    ]
    return pa.table({
        "polygon_id": pa.array(i, pa.int64()),
        "wkb": pa.array(wkbs, pa.binary()),
        "xmin": pa.array(xmin, pa.float64()),
        "ymin": pa.array(ymin, pa.float64()),
        "xmax": pa.array(xmax, pa.float64()),
        "ymax": pa.array(ymax, pa.float64()),
        "zindex": pa.array(z, pa.int32()),
        "value": pa.array(v, pa.int32()),
        "gx0": pa.array(gx0, pa.int64()),
        "gx1": pa.array(gx1, pa.int64()),
        "gy0": pa.array(gy0, pa.int64()),
        "gy1": pa.array(gy1, pa.int64()),
    })


def gen_halfcell_rects(n: int = 60) -> pa.Table:
    """HALF-cell-aligned dyadic rectangles on the 48x48 unit-cell world
    (Extent(0,0,48,48), cell = 1x1): every edge lies on a half-cell boundary
    (coordinates k/2, exactly representable), so the fractional cell
    coverage of any cell is an exact multiple of 1/4 and Sutherland-Hodgman
    clip + shoelace reproduce it bit-for-bit — the fixture that makes the
    FractionalRasterizer-style polygonal summary SQL-checkable. hx*/hy* are
    the integer HALF-UNIT coordinates (y measured UP from the world ymin,
    like the wkb geometry)."""
    from .stages.sample import mix32

    i = np.arange(n, dtype=np.int64)
    hx0 = (mix32(i) % 80 + 1).astype(np.int64)
    hy0 = (mix32(i + 9002) % 80 + 1).astype(np.int64)
    hx1 = hx0 + (mix32(i + 9001) % 14 + 1).astype(np.int64)
    hy1 = hy0 + (mix32(i + 9003) % 14 + 1).astype(np.int64)
    x0, x1 = hx0 / 2.0, hx1 / 2.0
    y0, y1 = hy0 / 2.0, hy1 / 2.0
    wkbs = [
        encode_polygon([np.array([[x0[k], y0[k]], [x1[k], y0[k]],
                                  [x1[k], y1[k]], [x0[k], y1[k]]])])
        for k in range(n)
    ]
    return pa.table({
        "polygon_id": pa.array(i, pa.int64()),
        "wkb": pa.array(wkbs, pa.binary()),
        "hx0": pa.array(hx0, pa.int64()),
        "hy0": pa.array(hy0, pa.int64()),
        "hx1": pa.array(hx1, pa.int64()),
        "hy1": pa.array(hy1, pa.int64()),
    })
