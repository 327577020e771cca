"""Pure-stdlib media codecs (no imaging/audio libraries in this container):

- BMP: uncompressed 24-bit BI_RGB encode/decode (struct + numpy).
- PNG: 8-bit RGB/RGBA decode with all five scanline filters (zlib + numpy);
  encoder lives in core/render.py (filter 0 only).
- WAV: 16-bit PCM encode/decode via the stdlib ``wave`` module.

- JPEG: baseline JFIF encode/decode lives in core/jpeg.py (own T.81
  implementation — DCT, Annex-K tables, Huffman entropy coding; round 3).

These make the multimodal stages' decode REAL for the formats a from-scratch
engine can honestly own; the remaining compressed formats (MP3, H.264) stay
NotImplementedError behind the same interface (driver mandate: stub what the
container cannot support, keep the plumbing real).
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np


# --- BMP (24-bit BI_RGB) ---------------------------------------------------

def encode_bmp(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> BMP bytes (bottom-up rows, BGR, 4-byte row pad)."""
    h, w, _ = rgb.shape
    row_raw = w * 3
    pad = (4 - row_raw % 4) % 4
    body = bytearray()
    for y in range(h - 1, -1, -1):
        body += rgb[y, :, ::-1].tobytes()  # BGR
        body += b"\x00" * pad
    pixel_off = 14 + 40
    size = pixel_off + len(body)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, pixel_off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + dib + bytes(body)


def decode_bmp(buf: bytes) -> np.ndarray:
    """BMP bytes -> (h, w, 3) uint8 RGB. Supports uncompressed 24/32-bit."""
    if buf[:2] != b"BM":
        raise ValueError("not a BMP")
    (pixel_off,) = struct.unpack_from("<I", buf, 10)
    (dib_size, w, h, _planes, bpp, compression) = struct.unpack_from("<IiiHHI", buf, 14)
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(f"BMP bpp={bpp} compression={compression} unsupported")
    flip = h > 0
    h = abs(h)
    nch = bpp // 8
    row_raw = w * nch
    stride = (row_raw + 3) & ~3 if bpp == 24 else row_raw
    rows = []
    for y in range(h):
        off = pixel_off + y * stride
        row = np.frombuffer(buf, dtype=np.uint8, count=row_raw, offset=off).reshape(w, nch)
        rows.append(row[:, 2::-1])  # BGR(A) -> RGB
    img = np.stack(rows)
    return img[::-1] if flip else img


# --- PNG decode (8-bit RGB / RGBA) -----------------------------------------

def decode_png(buf: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, c) uint8 for 8-bit RGB/RGBA (all 5 filters)."""
    if buf[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    off = 8
    w = h = bitdepth = coltype = None
    idat = bytearray()
    while off < len(buf):
        (ln,) = struct.unpack_from(">I", buf, off)
        tag = buf[off + 4 : off + 8]
        data = buf[off + 8 : off + 8 + ln]
        if tag == b"IHDR":
            w, h, bitdepth, coltype, _comp, _filt, interlace = struct.unpack(">IIBBBBB", data)
            if bitdepth != 8 or coltype not in (2, 6) or interlace != 0:
                raise NotImplementedError("only 8-bit RGB/RGBA non-interlaced PNG")
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        off += 12 + ln
    nch = 3 if coltype == 2 else 4
    raw = zlib.decompress(bytes(idat))
    stride = w * nch
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1).astype(np.int32)
        pos += 1 + stride
        if ftype == 0:
            rec = line
        elif ftype == 2:  # Up
            rec = (line + prev) & 0xFF
        else:
            rec = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = rec[x - nch] if x >= nch else 0
                b = int(prev[x])
                c = int(prev[x - nch]) if x >= nch else 0
                if ftype == 1:  # Sub
                    pred = a
                elif ftype == 3:  # Average
                    pred = (a + b) // 2
                elif ftype == 4:  # Paeth
                    p = a + b - c
                    pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else c)
                else:
                    raise ValueError(f"bad PNG filter {ftype}")
                rec[x] = (line[x] + pred) & 0xFF
        out[y] = rec.astype(np.uint8)
        prev = out[y]
    return out.reshape(h, w, nch)


# --- WAV (16-bit PCM) ------------------------------------------------------

def encode_wav(pcm: np.ndarray, rate: int = 16_000) -> bytes:
    """float32 [-1, 1] mono -> 16-bit PCM WAV bytes."""
    i16 = np.clip(np.round(pcm * 32767.0), -32768, 32767).astype("<i2")
    bio = io.BytesIO()
    with wave.open(bio, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(i16.tobytes())
    return bio.getvalue()


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (float32 mono pcm in [-1, 1], sample_rate)."""
    with wave.open(io.BytesIO(buf), "rb") as f:
        rate = f.getframerate()
        nch = f.getnchannels()
        width = f.getsampwidth()
        frames = f.readframes(f.getnframes())
    if width != 2:
        raise NotImplementedError("only 16-bit PCM WAV")
    pcm = np.frombuffer(frames, dtype="<i2").astype(np.float32) / 32768.0
    if nch > 1:
        pcm = pcm.reshape(-1, nch).mean(axis=1)
    return pcm, rate


# --- MP3 (frame-header metadata only — entropy decode stays refused) --------

# public MPEG audio frame-header spec (ISO/IEC 11172-3 / 13818-3):
# AAAAAAAA AAABBCCD EEEEFFGH IIJJKLMM
_MP3_BITRATE_V1L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
_MP3_BITRATE_V2L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160]
_MP3_SAMPLE_RATES = {3: (44100, 48000, 32000),   # MPEG-1
                     2: (22050, 24000, 16000),   # MPEG-2
                     0: (11025, 12000, 8000)}    # MPEG-2.5


def mp3_meta(buf: bytes) -> dict:
    """MP3 stream metadata WITHOUT decoding: skips an ID3v2 tag (syncsafe
    size), then walks Layer-III frame headers — version, bitrate index,
    sample-rate index, padding, channel mode — summing exact per-frame
    durations (1152 samples/frame MPEG-1, 576 MPEG-2/2.5). Pure public
    header spec; the Huffman-coded audio itself remains the documented
    refusal (core/media.py module docstring). Returns a dict with codec,
    n_frames, sample_rate, channels, duration_ms, bitrate_kbps, vbr."""
    off = 0
    if buf[:3] == b"ID3" and len(buf) >= 10:
        size = ((buf[6] & 0x7F) << 21) | ((buf[7] & 0x7F) << 14) \
             | ((buf[8] & 0x7F) << 7) | (buf[9] & 0x7F)
        off = 10 + size
    n_frames = 0
    duration_ms = 0.0
    bitrates: list[int] = []
    sample_rate = None
    channels = None
    while off + 4 <= len(buf):
        b0, b1, b2, b3 = buf[off], buf[off + 1], buf[off + 2], buf[off + 3]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            break
        ver = (b1 >> 3) & 3      # 3=MPEG-1, 2=MPEG-2, 0=MPEG-2.5, 1=reserved
        layer = (b1 >> 1) & 3    # 1 = Layer III
        if ver == 1 or layer != 1:
            break
        bi = (b2 >> 4) & 0xF
        sri = (b2 >> 2) & 3
        pad = (b2 >> 1) & 1
        if bi in (0, 15) or sri == 3:  # free-format / invalid
            break
        kbps = (_MP3_BITRATE_V1L3 if ver == 3 else _MP3_BITRATE_V2L3)[bi]
        srate = _MP3_SAMPLE_RATES[ver][sri]
        spf = 1152 if ver == 3 else 576
        frame_len = (spf // 8) * (kbps * 1000) // srate + pad
        if frame_len < 4:
            break
        mode = (b3 >> 6) & 3     # 3 = mono
        n_frames += 1
        duration_ms += spf / srate * 1000.0
        bitrates.append(kbps)
        sample_rate = srate
        channels = 1 if mode == 3 else 2
        off += frame_len
    return {
        "codec": "mp3",
        "n_frames": n_frames,
        "sample_rate": sample_rate,
        "channels": channels,
        "duration_ms": duration_ms,
        "bitrate_kbps": (sum(bitrates) / len(bitrates)) if bitrates else None,
        "vbr": len(set(bitrates)) > 1,
    }


def wav_meta(buf: bytes) -> dict:
    """WAV header metadata (no sample read): same schema as mp3_meta."""
    with wave.open(io.BytesIO(buf), "rb") as f:
        rate = f.getframerate()
        n = f.getnframes()
        return {
            "codec": "wav",
            "n_frames": n,
            "sample_rate": rate,
            "channels": f.getnchannels(),
            "duration_ms": n / rate * 1000.0,
            "bitrate_kbps": rate * f.getnchannels() * f.getsampwidth() * 8 / 1000.0,
            "vbr": False,
        }


# --- MP4 / ISO-BMFF (box-structure metadata; no sample decode) --------------

def _mp4_box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def encode_mp4_meta(timescale: int, duration: int, tracks,
                    brand: bytes = b"isom") -> bytes:
    """Minimal valid ISO-BMFF metadata file (ftyp + moov, no mdat): the
    deterministic fixture generator for mp4_meta — hand-assembled from the
    public ISO/IEC 14496-12 box layout, same fixture style as the GeoTiff
    and MP3 tests. ``tracks``: [{"kind": "vide", "codec": "avc1",
    "width": W, "height": H} | {"kind": "soun", "codec": "mp4a",
    "sample_rate": R, "channels": C}]."""
    ftyp = _mp4_box(b"ftyp", brand + struct.pack(">I", 0) + brand)
    mvhd = _mp4_box(b"mvhd", struct.pack(
        ">I II II I H H 8x 36s 24x I", 0, 0, 0, int(timescale), int(duration),
        0x00010000, 0x0100, 0,
        struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000),
        len(tracks) + 1))
    traks = []
    for i, t in enumerate(tracks):
        w = int(t.get("width", 0)) << 16
        h = int(t.get("height", 0)) << 16
        tkhd = _mp4_box(b"tkhd", struct.pack(
            ">I II I 4x I 8x H H H 2x 36s I I", 3, 0, 0, i + 1, int(duration),
            0, 0, 0x0100 if t["kind"] == "soun" else 0,
            struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000),
            w, h))
        mdhd = _mp4_box(b"mdhd", struct.pack(
            ">I II II H 2x", 0, 0, 0, int(timescale), int(duration), 0x55C4))
        hdlr = _mp4_box(b"hdlr", struct.pack(">I 4x 4s 12x", 0,
                                             t["kind"].encode()) + b"\x00")
        codec = t["codec"].encode()
        if t["kind"] == "vide":
            entry = _mp4_box(codec, struct.pack(
                ">6x H 16x H H I I 4x H 32s H h", 1,
                int(t.get("width", 0)), int(t.get("height", 0)),
                0x00480000, 0x00480000, 1, b"", 0x18, -1))
        else:
            entry = _mp4_box(codec, struct.pack(
                ">6x H 8x H H 4x I", 1, int(t.get("channels", 2)), 16,
                int(t.get("sample_rate", 0)) << 16))
        stsd = _mp4_box(b"stsd", struct.pack(">I I", 0, 1) + entry)
        stbl = _mp4_box(b"stbl", stsd)
        minf = _mp4_box(b"minf", stbl)
        mdia = _mp4_box(b"mdia", mdhd + hdlr + minf)
        traks.append(_mp4_box(b"trak", tkhd + mdia))
    moov = _mp4_box(b"moov", mvhd + b"".join(traks))
    return ftyp + moov


def _mp4_children(buf: bytes, off: int, end: int):
    """Yield (type, payload_start, payload_end) for the boxes in [off, end)."""
    while off + 8 <= end:
        size = struct.unpack_from(">I", buf, off)[0]
        typ = buf[off + 4:off + 8]
        body = off + 8
        if size == 1:  # 64-bit largesize
            if off + 16 > end:
                return
            size = struct.unpack_from(">Q", buf, off + 8)[0]
            body = off + 16
        elif size == 0:  # to end of enclosing box
            size = end - off
        if size < 8 or off + size > end:
            return
        yield typ, body, off + size
        off += size


def mp4_meta(buf: bytes) -> dict:
    """MP4/ISO-BMFF metadata WITHOUT decoding (public 14496-12 box layout):
    walks ftyp -> brand and moov -> mvhd (movie timescale/duration),
    per-trak tkhd/mdia/hdlr/stsd (handler kind, first sample-entry codec
    fourcc, visual width/height, audio sample rate). Sample data (mdat)
    is never touched — H.264/AAC entropy decode stays the documented
    refusal. Returns container/major_brand/duration_ms/n_tracks/
    video_codec/width/height/audio_codec/audio_sample_rate."""
    out = {"container": "mp4", "major_brand": None, "duration_ms": None,
           "n_tracks": 0, "video_codec": None, "width": None, "height": None,
           "audio_codec": None, "audio_sample_rate": None}
    for typ, b0, b1 in _mp4_children(buf, 0, len(buf)):
        if typ == b"ftyp" and b1 - b0 >= 4:
            out["major_brand"] = buf[b0:b0 + 4].decode("latin-1")
        elif typ == b"moov":
            for t2, c0, c1 in _mp4_children(buf, b0, b1):
                if t2 == b"mvhd" and c1 - c0 >= 20:
                    # v1 payload: ver/flags 4 + ctime 8 + mtime 8 + timescale 4
                    # + duration 8 = 32 bytes; v0: 4 + 4 + 4 + 4 + 4 = 20. A v1
                    # box shorter than 32 is malformed -> skip (never read past
                    # the box, never misparse it with v0 offsets).
                    ver = buf[c0]
                    if ver == 1:
                        if c1 - c0 < 32:
                            continue
                        ts = struct.unpack_from(">I", buf, c0 + 20)[0]
                        dur = struct.unpack_from(">Q", buf, c0 + 24)[0]
                    else:
                        ts = struct.unpack_from(">I", buf, c0 + 12)[0]
                        dur = struct.unpack_from(">I", buf, c0 + 16)[0]
                    if ts:
                        out["duration_ms"] = dur / ts * 1000.0
                elif t2 == b"trak":
                    out["n_tracks"] += 1
                    kind = codec = None
                    width = height = rate = None
                    for t3, d0, d1 in _mp4_children(buf, c0, c1):
                        if t3 != b"mdia":
                            continue
                        for t4, e0, e1 in _mp4_children(buf, d0, d1):
                            if t4 == b"hdlr" and e1 - e0 >= 12:
                                kind = buf[e0 + 8:e0 + 12].decode("latin-1")
                            elif t4 == b"minf":
                                for t5, f0, f1 in _mp4_children(buf, e0, e1):
                                    if t5 != b"stbl":
                                        continue
                                    for t6, g0, g1 in _mp4_children(buf, f0, f1):
                                        if t6 != b"stsd" or g1 - g0 < 8:
                                            continue
                                        for t7, s0, s1 in _mp4_children(buf, g0 + 8, g1):
                                            codec = t7.decode("latin-1")
                                            if s1 - s0 >= 36:
                                                width = struct.unpack_from(">H", buf, s0 + 24)[0]
                                                height = struct.unpack_from(">H", buf, s0 + 26)[0]
                                            if s1 - s0 >= 28:
                                                rate = struct.unpack_from(">I", buf, s0 + 24)[0] >> 16
                                            break
                    if kind == "vide":
                        out["video_codec"] = codec
                        out["width"], out["height"] = width, height
                    elif kind == "soun":
                        out["audio_codec"] = codec
                        out["audio_sample_rate"] = rate
    return out
