"""sha256_prefix64_column — the buffer-sliced full-corpus hash primitive
(exact dedup + url geocode hot path). Parity vs the scalar sha256_64 spec
on every Arrow layout the stream can hand it, plus the fail-loud null
contract (a null's offsets alias '' in the flat buffer; hashing it would
silently merge null rows with genuinely-empty rows)."""

import numpy as np
import pyarrow as pa
import pytest

from geotrellis_ray.functions.hashing import sha256_64, sha256_prefix64_column


TEXTS = ["", "a", "hello world", "héllo wörld ☃", "x" * 5000, "tail"]


def _expected(texts):
    return np.array([sha256_64(t) for t in texts], np.uint64)


@pytest.mark.parametrize("typ", [pa.string(), pa.large_string()])
def test_prefix64_matches_scalar_spec(typ):
    arr = pa.array(TEXTS, typ)
    np.testing.assert_array_equal(sha256_prefix64_column(arr), _expected(TEXTS))


def test_prefix64_binary_and_chunked_and_sliced():
    # binary column: bytes hashed as-is (Arrow strings are already UTF-8)
    barr = pa.array([t.encode() for t in TEXTS], pa.binary())
    np.testing.assert_array_equal(sha256_prefix64_column(barr), _expected(TEXTS))

    # multi-chunk ChunkedArray
    ch = pa.chunked_array([pa.array(TEXTS[:3]), pa.array(TEXTS[3:])])
    np.testing.assert_array_equal(sha256_prefix64_column(ch), _expected(TEXTS))

    # non-zero chunk.offset (slice view shares the parent's values buffer —
    # the offsets slice must honor chunk.offset, not restart at 0)
    sl = pa.array(TEXTS).slice(2, 3)
    np.testing.assert_array_equal(sha256_prefix64_column(sl), _expected(TEXTS[2:5]))


def test_prefix64_nulls_fail_loud():
    with pytest.raises(ValueError, match="nulls"):
        sha256_prefix64_column(pa.array(["a", None, "b"]))
    # null hidden in a later chunk of a ChunkedArray
    with pytest.raises(ValueError, match="nulls"):
        sha256_prefix64_column(
            pa.chunked_array([pa.array(["a"]), pa.array([None], pa.string())]))
