"""Media codec tests: BMP/PNG/WAV roundtrips + the multimodal actor stage
decoding REAL payloads end-to-end."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

ray = pytest.importorskip("ray")
import ray.data  # noqa: E402
import pyarrow as pa  # noqa: E402

from geotrellis_ray.core.media import (  # noqa: E402
    decode_bmp,
    decode_png,
    decode_wav,
    encode_bmp,
    encode_wav,
)
from geotrellis_ray.core.render import encode_png_rgba  # noqa: E402


def test_bmp_roundtrip():
    rng = np.random.default_rng(1)
    for h, w in [(5, 7), (8, 8), (3, 1)]:  # odd widths exercise row padding
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        np.testing.assert_array_equal(decode_bmp(encode_bmp(img)), img)


def test_png_decode_own_encoder():
    rng = np.random.default_rng(2)
    rgba = rng.integers(0, 256, (6, 5, 4), dtype=np.uint8)
    out = decode_png(encode_png_rgba(rgba))
    np.testing.assert_array_equal(out, rgba)


def _png_with_filters(img: np.ndarray, ftypes: list[int]) -> bytes:
    """Reference encoder applying a given filter per row (forward direction)."""
    h, w, nch = img.shape
    stride = w * nch
    flat = img.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ft = ftypes[y % len(ftypes)]
        line = flat[y]
        enc = np.zeros(stride, dtype=np.int32)
        for x in range(stride):
            a = line[x - nch] if x >= nch else 0
            b = prev[x]
            c = prev[x - nch] if x >= nch else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else c)
            enc[x] = (line[x] - pred) & 0xFF
        raw.append(ft)
        raw += bytes(enc.astype(np.uint8))
        prev = line
    def chunk(tag, data):
        return struct.pack(">I", len(data)) + tag + data + struct.pack(">I", zlib.crc32(tag + data))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2 if nch == 3 else 6, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b""))


def test_png_decode_all_filters():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (10, 6, 3), dtype=np.uint8)
    for ftypes in ([1], [2], [3], [4], [0, 1, 2, 3, 4]):
        np.testing.assert_array_equal(decode_png(_png_with_filters(img, ftypes)), img)


def test_wav_roundtrip():
    t = np.linspace(0, 1, 8000, dtype=np.float32)
    pcm = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    out, rate = decode_wav(encode_wav(pcm, rate=8000))
    assert rate == 8000 and len(out) == len(pcm)
    np.testing.assert_allclose(out, pcm, atol=2 / 32768)  # 16-bit quantization + 32767/32768 scale


def test_image_decoder_stage_real_bmp(ray_session):
    from geotrellis_ray.stages.multimodal import ImageDecoder

    rng = np.random.default_rng(4)
    imgs = [rng.integers(0, 256, (16, 12, 3), dtype=np.uint8) for _ in range(6)]
    t = pa.table({"doc_id": pa.array(range(6), pa.int64()),
                  "media": pa.array([encode_bmp(i) for i in imgs], pa.binary())})
    out = ray.data.from_arrow(t).map_batches(
        ImageDecoder, fn_constructor_kwargs={"target_size": 8},
        batch_format="pyarrow", zero_copy_batch=True, batch_size=4, concurrency=2,
    ).to_pandas().sort_values("doc_id")
    assert out["img_h"].tolist() == [16] * 6 and out["img_w"].tolist() == [12] * 6
    # feature head = per-channel means of the nearest-resized real image
    for i, feat in enumerate(out["img_feat"]):
        assert abs(feat[0] - imgs[i][:, :, 0].astype(np.float32).mean()) < 30  # coarse: resize shifts means


def test_audio_stage_real_wav(ray_session):
    from geotrellis_ray.stages.multimodal import AudioFrameSampler

    t_ax = np.linspace(0, 1, 4000, dtype=np.float32)
    loud = (0.8 * np.sin(2 * np.pi * 220 * t_ax)).astype(np.float32)
    quiet = (0.05 * np.sin(2 * np.pi * 220 * t_ax)).astype(np.float32)
    t = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "media": pa.array([encode_wav(loud), encode_wav(quiet)], pa.binary())})
    out = ray.data.from_arrow(t).map_batches(
        AudioFrameSampler, fn_constructor_kwargs={"frames": 4},
        batch_format="pyarrow", zero_copy_batch=True, concurrency=1,
    ).to_pandas().sort_values("doc_id")
    rms = [np.mean(f) for f in out["audio_rms"]]
    assert rms[0] > 10 * rms[1]  # loud vs quiet separable from REAL decode


def test_unsupported_format_raises(ray_session):
    from geotrellis_ray.stages.multimodal import ImageDecoder

    dec = ImageDecoder()
    with pytest.raises(NotImplementedError):
        dec._decode(b"GIF89a not supported here")
    # JPEG now has a real decoder: corrupt JPEG is a decode ERROR, not a
    # refusal (round 3: core/jpeg.py)
    with pytest.raises(ValueError):
        dec._decode(b"\xff\xd8\xff\xe0JFIF-ish")


def test_image_decoder_on_error_skip(ray_session):
    from geotrellis_ray.stages.multimodal import ImageDecoder

    good = encode_bmp(np.full((4, 4, 3), 7, np.uint8))
    t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                  "media": pa.array([good, good[:20], b"\xff\xd8garbage"], pa.binary())})
    out = ray.data.from_arrow(t).map_batches(
        ImageDecoder, fn_constructor_kwargs={"on_error": "skip"},
        batch_format="pyarrow", zero_copy_batch=True, concurrency=1,
    ).to_pandas().sort_values("doc_id")
    assert out["decode_ok"].tolist() == [True, False, False]
    assert out["img_h"].tolist() == [4, -1, -1]
    assert len(out["img_feat"].iloc[1]) == 0 and len(out["img_feat"].iloc[0]) == 6


def test_dhash_invariances():
    """dHash: identical images -> distance 0; small perturbation -> small
    distance; unrelated images -> large distance."""
    import numpy as np

    from geotrellis_ray.functions.hashing import hamming64
    from geotrellis_ray.stages.multimodal import dhash64

    rng = np.random.default_rng(6)
    # smooth structured image (gradients survive pooling)
    yy, xx = np.mgrid[0:64, 0:64]
    base = np.stack([(xx * 4) % 256, (yy * 4) % 256, ((xx + yy) * 2) % 256],
                    axis=2).astype(np.uint8)
    h0 = dhash64(base)
    pert = base.copy()
    pert[10:13, 20:23] = 0  # tiny local edit
    h1 = dhash64(pert)
    noise = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    h2 = dhash64(noise.astype(np.uint8))
    d01 = int(hamming64(np.array([h0]), np.array([h1]))[0])
    d02 = int(hamming64(np.array([h0]), np.array([h2]))[0])
    assert d01 <= 3
    assert d02 > 10
    assert dhash64(base) == h0  # deterministic
    # scale invariance of the pooled gradient signature
    big = np.repeat(np.repeat(base, 2, axis=0), 2, axis=1)
    assert int(hamming64(np.array([h0]), np.array([dhash64(big)]))[0]) <= 3


def test_image_near_dups_planted(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from geotrellis_ray.core.media import encode_bmp
    from geotrellis_ray.functions.hashing import hamming64
    from geotrellis_ray.stages.multimodal import dhash64, image_near_dups

    rng = np.random.default_rng(9)
    yy, xx = np.mgrid[0:32, 0:32]
    imgs = []
    for i in range(12):
        img = np.stack([(xx * (i + 2)) % 256, (yy * (i + 3)) % 256,
                        ((xx + yy) * (i + 1)) % 256], axis=2).astype(np.uint8)
        imgs.append(img)
    # plant near-dups: 12 is a copy of 0 with a small edit, 13 copies 5
    n0 = imgs[0].copy(); n0[4:6, 4:6] = 0; imgs.append(n0)
    n5 = imgs[5].copy(); n5[20:22, 8:10] = 255; imgs.append(n5)
    tab = pa.table({"doc_id": pa.array(range(len(imgs)), pa.int64()),
                    "media": pa.array([encode_bmp(im) for im in imgs], pa.binary())})
    got = image_near_dups(rd.from_arrow(tab).repartition(4),
                          max_hamming=3).to_pandas()
    got_pairs = {(int(a), int(b)) for a, b in zip(got.id_a, got.id_b)}
    # brute oracle over all pairs
    hs = np.array([dhash64(im) for im in imgs], np.uint64)
    expect = set()
    for i in range(len(imgs)):
        for j in range(i + 1, len(imgs)):
            if int(hamming64(hs[i:i+1], hs[j:j+1])[0]) <= 3:
                expect.add((i, j))
    assert {(0, 12), (5, 13)} <= expect  # the planted pairs are near-dups
    assert got_pairs == expect


def test_jpeg_roundtrip_psnr():
    """Own baseline JPEG codec (core/jpeg.py): JFIF framing, round-trip
    quality bounds, constant-image exactness, quality ordering."""
    import numpy as np

    from geotrellis_ray.core.jpeg import decode_jpeg, encode_jpeg

    yy, xx = np.mgrid[0:40, 0:56]
    img = np.stack([(xx * 4) % 256, (yy * 3) % 256, ((xx + yy) * 2) % 256],
                   axis=2).astype(np.uint8)
    buf = encode_jpeg(img, quality=90)
    assert buf[:2] == b"\xff\xd8" and buf[-2:] == b"\xff\xd9"
    out = decode_jpeg(buf)
    assert out.shape == img.shape and out.dtype == np.uint8
    mse = ((out.astype(float) - img) ** 2).mean()
    psnr = 10 * np.log10(255**2 / mse)
    assert psnr > 35.0
    # constant image survives exactly (DC-only blocks)
    c = np.full((16, 16, 3), 130, np.uint8)
    assert (decode_jpeg(encode_jpeg(c, 75)) == 130).all()
    # lower quality -> smaller stream and not-better PSNR
    b50 = encode_jpeg(img, quality=40)
    assert len(b50) < len(buf)
    mse50 = ((decode_jpeg(b50).astype(float) - img) ** 2).mean()
    assert mse50 >= mse
    # non-multiple-of-8 dims, random content
    rng = np.random.default_rng(3)
    n = rng.integers(0, 256, (19, 21, 3), dtype=np.uint8).astype(np.uint8)
    on = decode_jpeg(encode_jpeg(n, 85))
    assert on.shape == n.shape


def test_image_decoder_jpeg_path(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from geotrellis_ray.core.jpeg import encode_jpeg
    from geotrellis_ray.stages.multimodal import ImageDecoder

    yy, xx = np.mgrid[0:32, 0:32]
    img = np.stack([(xx * 5) % 256, (yy * 7) % 256, (xx + yy) % 256],
                   axis=2).astype(np.uint8)
    tab = pa.table({"doc_id": pa.array([0], pa.int64()),
                    "media": pa.array([encode_jpeg(img, 90)], pa.binary())})
    out = rd.from_arrow(tab).map_batches(
        ImageDecoder, fn_constructor_kwargs={}, batch_format="pyarrow",
        concurrency=1).take_all()
    assert out[0]["img_h"] == 32 and out[0]["img_w"] == 32
    assert out[0]["decode_ok"] and len(out[0]["img_feat"]) == 6


def test_dhash_survives_jpeg_recompression():
    """Cross-format near-dup: a JPEG re-encode of an image keeps its dHash
    within the near-dup threshold (here: identical), so image_near_dups
    catches BMP-vs-JPEG copies of the same picture."""
    import numpy as np

    from geotrellis_ray.core.jpeg import decode_jpeg, encode_jpeg
    from geotrellis_ray.functions.hashing import hamming64
    from geotrellis_ray.stages.multimodal import dhash64

    yy, xx = np.mgrid[0:64, 0:64]
    img = np.stack([(xx * 4) % 256, (yy * 3) % 256, ((xx + yy) * 2) % 256],
                   axis=2).astype(np.uint8)
    h0 = dhash64(img)
    for q in (75, 30):
        h1 = dhash64(decode_jpeg(encode_jpeg(img, q)))
        assert int(hamming64(np.array([h0]), np.array([h1]))[0]) <= 3


def test_jpeg_grayscale_single_component():
    import numpy as np

    from geotrellis_ray.core.jpeg import decode_jpeg, encode_jpeg

    yy, xx = np.mgrid[0:24, 0:40]
    g = ((xx * 5 + yy * 3) % 256).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g, 90))
    assert out.shape == (24, 40, 3)
    assert (out[:, :, 0] == out[:, :, 1]).all() and (out[:, :, 1] == out[:, :, 2]).all()
    mse = ((out[:, :, 0].astype(float) - g) ** 2).mean()
    assert 10 * np.log10(255**2 / max(mse, 1e-12)) > 35.0


def _mp3_frame(bitrate_idx: int, sr_idx: int = 0, pad: int = 0, mono: bool = True,
               mpeg1: bool = True) -> bytes:
    """Hand-assemble one Layer-III frame from the public header spec."""
    from geotrellis_ray.core.media import (_MP3_BITRATE_V1L3, _MP3_BITRATE_V2L3,
                                           _MP3_SAMPLE_RATES)

    ver = 3 if mpeg1 else 2
    b1 = 0xE0 | (ver << 3) | (1 << 1) | 1  # sync tail + version + layer III
    b2 = (bitrate_idx << 4) | (sr_idx << 2) | (pad << 1)
    b3 = 0xC0 if mono else 0x00
    kbps = (_MP3_BITRATE_V1L3 if mpeg1 else _MP3_BITRATE_V2L3)[bitrate_idx]
    srate = _MP3_SAMPLE_RATES[ver][sr_idx]
    spf = 1152 if mpeg1 else 576
    flen = (spf // 8) * (kbps * 1000) // srate + pad
    return bytes([0xFF, b1, b2, b3]) + b"\x00" * (flen - 4)


def test_mp3_meta_frame_walk():
    from geotrellis_ray.core.media import mp3_meta

    # 5 CBR frames at 128 kbps / 44.1 kHz mono, one padded
    buf = b"".join(_mp3_frame(9, 0, pad=(1 if i == 2 else 0)) for i in range(5))
    m = mp3_meta(buf)
    assert m["codec"] == "mp3" and m["n_frames"] == 5
    assert m["sample_rate"] == 44100 and m["channels"] == 1
    assert m["bitrate_kbps"] == 128 and m["vbr"] is False
    assert abs(m["duration_ms"] - 5 * 1152 / 44100 * 1000) < 1e-9

    # VBR: mixed bitrates, stereo, MPEG-2 (576 samples/frame, 22.05 kHz)
    vbuf = _mp3_frame(4, 0, mono=False, mpeg1=False) + _mp3_frame(8, 0, mono=False, mpeg1=False)
    v = mp3_meta(vbuf)
    assert v["n_frames"] == 2 and v["vbr"] is True and v["channels"] == 2
    assert v["sample_rate"] == 22050
    assert abs(v["duration_ms"] - 2 * 576 / 22050 * 1000) < 1e-9

    # ID3v2 tag skipped (syncsafe size 200)
    id3 = b"ID3" + bytes([4, 0, 0, 0, 0, 1, 0x48]) + b"\x00" * 200
    t = mp3_meta(id3 + _mp3_frame(9, 0))
    assert t["n_frames"] == 1

    # garbage stops the walk cleanly
    g = mp3_meta(b"\xff\xfb\x00\x00")  # free-format bitrate -> rejected
    assert g["n_frames"] == 0 and g["sample_rate"] is None


def test_audio_meta_batch_wav_and_mp3():
    import pyarrow as pa

    from geotrellis_ray.core.media import encode_wav
    from geotrellis_ray.stages.multimodal import audio_meta_batch

    wav = encode_wav(np.sin(np.linspace(0, 100, 16000)).astype(np.float32), rate=16000)
    mp3 = b"".join(_mp3_frame(9, 0) for _ in range(3))
    t = pa.table({"id": pa.array([1, 2, 3], pa.int64()),
                  "media": pa.array([wav, mp3, b"\x00garbage"], pa.binary())})
    out = audio_meta_batch(t)
    assert "media" not in out.column_names  # payload projected away
    assert out["codec"].to_pylist() == ["wav", "mp3", None]
    assert out["sample_rate"].to_pylist() == [16000, 44100, None]
    assert out["duration_ms"].to_pylist()[0] == 1000.0
    assert out["n_frames"].to_pylist()[1] == 3


def test_mp4_meta_box_walk():
    """ISO-BMFF walker vs hand-assembled fixtures (encode_mp4_meta — the
    GeoTiff/MP3 fixture style): every track permutation, plus the v1-mvhd
    (64-bit duration) and largesize box paths built by hand, plus
    truncation robustness at every 7th byte."""
    import struct

    from geotrellis_ray.core.media import _mp4_box, encode_mp4_meta, mp4_meta

    full = encode_mp4_meta(600, 45000, [
        {"kind": "vide", "codec": "hev1", "width": 1920, "height": 1080},
        {"kind": "soun", "codec": "mp4a", "sample_rate": 44100, "channels": 2},
    ])
    m = mp4_meta(full)
    assert (m["duration_ms"], m["n_tracks"]) == (75000.0, 2)
    assert (m["video_codec"], m["width"], m["height"]) == ("hev1", 1920, 1080)
    assert (m["audio_codec"], m["audio_sample_rate"]) == ("mp4a", 44100)

    vonly = mp4_meta(encode_mp4_meta(1000, 5000, [
        {"kind": "vide", "codec": "avc1", "width": 640, "height": 360}]))
    assert vonly["audio_codec"] is None and vonly["n_tracks"] == 1
    aonly = mp4_meta(encode_mp4_meta(1000, 5000, [
        {"kind": "soun", "codec": "alac", "sample_rate": 48000}]))
    assert aonly["video_codec"] is None and aonly["audio_sample_rate"] == 48000
    empty = mp4_meta(encode_mp4_meta(1000, 5000, []))
    assert empty["n_tracks"] == 0 and empty["duration_ms"] == 5000.0

    # v1 mvhd: 64-bit duration beyond 2^32
    big = (1 << 33) + 123
    mvhd_v1 = _mp4_box(b"mvhd", struct.pack(
        ">I QQ I Q", 0x01000000, 0, 0, 1000, big) + b"\x00" * 80)
    m1 = mp4_meta(_mp4_box(b"ftyp", b"isom" + b"\x00" * 8)
                  + _mp4_box(b"moov", mvhd_v1))
    assert m1["duration_ms"] == big / 1000 * 1000.0

    # largesize (size==1 + 64-bit size) wrapping the moov
    moov_payload = full[full.index(b"moov") - 4 + 8:]
    large = struct.pack(">I", 1) + b"moov" + struct.pack(
        ">Q", 16 + len(moov_payload)) + moov_payload
    m2 = mp4_meta(full[:full.index(b"moov") - 4] + large)
    assert m2["video_codec"] == "hev1" and m2["n_tracks"] == 2

    for i in range(0, len(full), 7):
        mp4_meta(full[:i])  # must never raise


def test_video_meta_batch_stage(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from geotrellis_ray.core.media import encode_mp4_meta
    from geotrellis_ray.stages.multimodal import video_meta_batch

    payloads = [
        encode_mp4_meta(600, 6000, [{"kind": "vide", "codec": "avc1",
                                     "width": 320, "height": 240}]),
        b"not an mp4 at all",
        None,
    ]
    t = pa.table({"vid_id": pa.array([1, 2, 3], pa.int64()),
                  "media": pa.array(payloads, pa.binary())})
    out = rd.from_arrow(t).map_batches(
        video_meta_batch, batch_format="pyarrow", zero_copy_batch=True,
    ).to_pandas().sort_values("vid_id").reset_index(drop=True)
    assert out.loc[0, "video_codec"] == "avc1" and out.loc[0, "width"] == 320
    assert out.loc[1, "container"] is None or out.loc[1, "container"] != "mp4"
    assert len(out) == 3 and "media" not in out.columns


def test_mp4_mvhd_v1_short_payload_skipped():
    """A version-1 mvhd needs a 32-byte payload (4 ver/flags + 8+8 times +
    4 timescale + 8 duration). Shorter v1 boxes are malformed: they must be
    SKIPPED — neither read past the box end (struct beyond c1, or garbage
    from a following box) nor misparsed with v0 offsets."""
    import struct

    from geotrellis_ray.core.media import _mp4_box, mp4_meta

    for plen in (20, 24, 28, 31):
        mvhd = _mp4_box(b"mvhd", bytes([1]) + b"\x00" * (plen - 1))
        # follow with a sibling box so an over-read would land in real bytes
        moov = _mp4_box(b"moov", mvhd + _mp4_box(b"free", b"\xff" * 16))
        m = mp4_meta(_mp4_box(b"ftyp", b"isom" + b"\x00" * 8) + moov)
        assert m["duration_ms"] is None, plen  # skipped, not misparsed

    # exactly 32 is the minimum VALID v1 payload
    ok = _mp4_box(b"mvhd", struct.pack(">I QQ I Q", 0x01000000, 0, 0, 500, 1500))
    m = mp4_meta(_mp4_box(b"moov", ok))
    assert m["duration_ms"] == 3000.0
