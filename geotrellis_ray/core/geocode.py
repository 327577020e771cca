"""Deterministic geocoder — lat/lon per page (FIXTURES.md §1.2 + §3 skew model).

Every page gets a (lat, lon) as a pure function of its url (sha256) and an
optional ``geo.position`` geotag embedded in the html head. The geotag, when
present, wins. 80%% of hash-geocoded rows are remapped into 5 dense cluster
boxes (urban stand-ins) to exercise salt-and-split skew handling downstream.

Spec (authoritative; generator and engine share this module):

    h   = uint64 big-endian of sha256(url_utf8)[:8]
    base: lat = -85.05112878 + (h % 2^32)        / (2^32 - 1) * 2 * 85.05112878
          lon = -180.0       + ((h >> 32) % 2^32) / (2^32 - 1) * 360.0
    skew: if h % 100 < 80 -> remap into cluster (h % 5):
          lat = clat - 1 + ((h >> 16) % 2^16) / (2^16 - 1) * 2
          lon = clon - 1 + ((h >> 40) % 2^16) / (2^16 - 1) * 2
    geotag override: '<meta name="geo.position" content="{lat:.6f};{lon:.6f}">'
          parsed from the RAW html (the tag body is invisible to extract_text);
          if present those coordinates replace everything above.

Reference parity: no GeoTrellis counterpart (corpus-specific stage,
SURVEY.md §2.2 "Geocoder"); /root/reference was empty at survey time.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

# (lat, lon) centers of the 5 cluster boxes (FIXTURES.md §3), each 2°x2°
CLUSTERS = np.array(
    [
        (40.71, -74.01),   # New York
        (51.51, -0.13),    # London
        (35.68, 139.69),   # Tokyo
        (-23.55, -46.63),  # São Paulo
        (19.08, 72.88),    # Mumbai
    ],
    dtype=np.float64,
)

MAX_LAT = 85.05112878  # WebMercator-safe latitude bound

_GEOTAG_B = re.compile(rb'<meta name="geo\.position" content="(-?\d+\.\d+);(-?\d+\.\d+)">')


def url_hash64(url: str) -> int:
    """uint64 big-endian of sha256(url)[:8] — THE deterministic page hash,
    reused for geocoding, salting and dedup bucketing."""
    return int.from_bytes(hashlib.sha256(url.encode("utf-8")).digest()[:8], "big")


def url_hash64_batch(urls) -> np.ndarray:
    """Vectorized-ish batch hash: one C-speed sha256 per url (no numpy sha)."""
    sha = hashlib.sha256
    return np.fromiter(
        (int.from_bytes(sha(u.encode("utf-8")).digest()[:8], "big") for u in urls),
        dtype=np.uint64,
        count=len(urls),
    )


def url_hash64_column(col) -> np.ndarray:
    """url_hash64_batch over an Arrow string column, hashed off zero-copy
    buffer views (bit-identical — Arrow strings are UTF-8 already)."""
    from ..functions.hashing import sha256_prefix64_column

    return sha256_prefix64_column(col)


def hash_coords(h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized base+skew coordinates from uint64 hashes (no geotag)."""
    h = np.asarray(h, dtype=np.uint64)
    lo32 = (h & np.uint64(0xFFFFFFFF)).astype(np.float64)
    hi32 = (h >> np.uint64(32)).astype(np.float64)
    lat = -MAX_LAT + lo32 / float(2**32 - 1) * 2.0 * MAX_LAT
    lon = -180.0 + hi32 / float(2**32 - 1) * 360.0
    skew = (h % np.uint64(100)) < np.uint64(80)
    cidx = (h % np.uint64(5)).astype(np.int64)
    f_lat = ((h >> np.uint64(16)) & np.uint64(0xFFFF)).astype(np.float64) / 65535.0
    f_lon = ((h >> np.uint64(40)) & np.uint64(0xFFFF)).astype(np.float64) / 65535.0
    clat = CLUSTERS[cidx, 0]
    clon = CLUSTERS[cidx, 1]
    lat = np.where(skew, clat - 1.0 + f_lat * 2.0, lat)
    lon = np.where(skew, clon - 1.0 + f_lon * 2.0, lon)
    return lat, lon


def parse_geotag(html: bytes) -> tuple[float, float] | None:
    m = _GEOTAG_B.search(html)
    if m is None:
        return None
    return float(m.group(1)), float(m.group(2))


def geocode_batch(urls, htmls) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batch geocode → (lat, lon, h). Geotag (parsed from raw html) wins over
    the hash coordinates. ``htmls`` may be None (hash-only path)."""
    h = url_hash64_batch(urls)
    lat, lon = hash_coords(h)
    if htmls is not None:
        for i, b in enumerate(htmls):
            if b is not None and b"geo.position" in b:
                tag = parse_geotag(b)
                if tag is not None:
                    lat[i], lon[i] = tag
    return lat, lon, h


def geotag_coords(h: int) -> tuple[float, float]:
    """Coordinates the GENERATOR embeds in a geotag: always the cluster-box
    remap of h (even when h %% 100 >= 80), rounded to the 6 decimals the tag
    carries — so for ~20%% of geotagged rows the override visibly differs from
    the hash path and the precedence is actually exercised."""
    c = CLUSTERS[h % 5]
    lat = c[0] - 1.0 + ((h >> 16) & 0xFFFF) / 65535.0 * 2.0
    lon = c[1] - 1.0 + ((h >> 40) & 0xFFFF) / 65535.0 * 2.0
    return round(lat, 6), round(lon, 6)
