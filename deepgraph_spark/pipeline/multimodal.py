"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, decoded and feature-extracted inside Arrow batches.

Two real, dependency-free decoders run on ``fake=False`` (no PIL/torchaudio/
pyav in this container, so the formats are ones a few dozen lines of numpy
parse exactly):

* **image / codec="ppm"** — binary PPM (P6, maxval 255): header parse +
  reshape to (h, w, 3), nearest-neighbor resize to a fixed grid, grayscale
  flatten as the feature vector.
* **image / codec="png"** — PNG (stdlib zlib + critical-chunk walk):
  8-bit, non-interlaced, grayscale/RGB/RGBA (color types 0/2/6), all five
  scanline filters (None/Sub/Up/Average/Paeth) with CRC verification —
  the one ubiquitous image format; everything richer still fails loud.
* **audio / codec="wav"** — RIFF/WAVE PCM 16-bit: chunk walk to the ``data``
  chunk, int16 → float, per-window RMS envelope as the feature vector.

Every other (media_type, codec) raises ``NotImplementedError`` at the exact
point a richer decoder would plug in. ``fake=True`` keeps the deterministic
hash-derived stub for plumbing tests. The Spark side — binary columns,
metadata struct, ``mapInPandas`` Arrow batches, output schema — is identical
on every path.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("media", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)


# ---------------------------------------------------------------------------
# codecs (numpy-only; exact for PPM P6 / WAV PCM16)
# ---------------------------------------------------------------------------

def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6, maxval 255)."""
    img = np.asarray(img, dtype=np.uint8)
    h, w, c = img.shape
    assert c == 3, "PPM P6 is RGB"
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval 255, '#' comments allowed) → (h, w, 3) uint8."""
    if not data.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    # header = magic, width, height, maxval as whitespace-separated tokens,
    # with optional '#' comment lines; pixel data starts after ONE whitespace
    # byte following maxval
    tokens, i = [], 2
    while len(tokens) < 3:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":
            while i < len(data) and data[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        tokens.append(int(data[i:j]))
        i = j
    w, h, maxval = tokens
    if maxval != 255:
        raise NotImplementedError("only maxval=255 PPM supported")
    i += 1  # single whitespace after maxval
    px = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=i)
    return px.reshape(h, w, 3)


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize — index arithmetic only, no interpolation libs."""
    h, w = img.shape[:2]
    rows = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    cols = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[rows][:, cols]


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(img: np.ndarray, *, filter_type: int = 0) -> bytes:
    """(h, w) grayscale / (h, w, 3) RGB / (h, w, 4) RGBA uint8 → PNG
    (8-bit, non-interlaced, stdlib zlib). ``filter_type`` selects the
    per-scanline filter: 0 (None), 1 (Sub), or 2 (Up) — enough for tests to
    exercise the decoder's distinct unfilter paths from independently-built
    bytes (Average/Paeth are covered decoder-side via handcrafted rows)."""
    import zlib

    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        ct, arr = 0, img[:, :, None]
    elif img.ndim == 3 and img.shape[2] == 3:
        ct, arr = 2, img
    elif img.ndim == 3 and img.shape[2] == 4:
        ct, arr = 6, img
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    h, w, ch = arr.shape
    raw = bytearray()
    prev = np.zeros((w, ch), dtype=np.int16)
    for r in range(h):
        row = arr[r].astype(np.int16)
        if filter_type == 0:
            filt = row
        elif filter_type == 1:  # Sub: minus reconstructed left
            left = np.vstack([np.zeros((1, ch), np.int16), row[:-1]])
            filt = (row - left) % 256
        elif filter_type == 2:  # Up: minus reconstructed above
            filt = (row - prev) % 256
        else:
            raise NotImplementedError("encode_png supports filter types 0/1/2")
        raw.append(filter_type)
        raw.extend(filt.astype(np.uint8).tobytes())
        prev = row

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """PNG → uint8 array: (h, w) for grayscale, (h, w, 3) RGB, (h, w, 4)
    RGBA. Stdlib-only (zlib inflate + critical-chunk walk), 8-bit,
    non-interlaced; all five scanline filters (None/Sub/Up/Average/Paeth)
    are unfiltered per the PNG spec, critical-chunk CRCs are verified, and
    every unsupported variant (16-bit, palette, Adam7) raises at the exact
    point a richer decoder would plug in — fail loud, not wrong."""
    import zlib

    if not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload (missing signature)")
    i = 8
    w = h = ct = None
    idat = bytearray()
    while i + 12 <= len(data):
        (ln,) = struct.unpack(">I", data[i : i + 4])
        tag = data[i + 4 : i + 8]
        body = data[i + 8 : i + 8 + ln]
        if tag in (b"IHDR", b"PLTE", b"IDAT", b"IEND"):
            (crc,) = struct.unpack(">I", data[i + 8 + ln : i + 12 + ln])
            if (zlib.crc32(tag + body) & 0xFFFFFFFF) != crc:
                raise ValueError(f"PNG {tag.decode()} chunk CRC mismatch")
        if tag == b"IHDR":
            w, h, bd, ct, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
            if bd != 8:
                raise NotImplementedError("only 8-bit PNG supported")
            if ct not in (0, 2, 6):
                raise NotImplementedError(
                    "only grayscale/RGB/RGBA PNG supported (color types 0/2/6; "
                    "palette images need a PLTE decoder)"
                )
            if interlace != 0:
                raise NotImplementedError("interlaced (Adam7) PNG not supported")
            if comp != 0 or filt != 0:
                raise ValueError("invalid PNG compression/filter method")
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        i += 12 + ln
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT chunk")
    ch = {0: 1, 2: 3, 6: 4}[ct]
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (1 + stride):
        raise ValueError("PNG pixel payload size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for r in range(h):
        ft = raw[r * (1 + stride)]
        line = np.frombuffer(raw, np.uint8, stride, r * (1 + stride) + 1).astype(np.int32)
        if ft == 0:  # None
            cur = line
        elif ft == 2:  # Up: whole-row vector add
            cur = (line + prev) % 256
        elif ft in (1, 3, 4):  # Sub / Average / Paeth: sequential in x
            cur = np.zeros(stride, dtype=np.int32)
            for k in range(stride):
                a = int(cur[k - ch]) if k >= ch else 0  # reconstructed left
                b = int(prev[k])  # reconstructed above
                if ft == 1:
                    pred = a
                elif ft == 3:
                    pred = (a + b) // 2
                else:
                    c = int(prev[k - ch]) if k >= ch else 0  # above-left
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[k] = (line[k] + pred) % 256
        else:
            raise ValueError(f"invalid PNG scanline filter type {ft}")
        out[r] = cur.astype(np.uint8)
        prev = cur
    arr = out.reshape(h, w, ch)
    return arr[:, :, 0] if ct == 0 else arr


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """float [-1, 1] (or int16) mono samples → RIFF/WAVE PCM16."""
    s = np.asarray(samples)
    if s.dtype.kind == "f":
        s = np.clip(s, -1.0, 1.0)
        s = (s * 32767.0).astype(np.int16)
    else:
        s = s.astype(np.int16)
    data = s.tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16,
        b"data", len(data),
    )
    return hdr + data


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 → (float64 samples in [-1, 1], sample_rate). Walks the
    chunk list (extra chunks like LIST are skipped), mono or first channel."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i, rate, n_ch, bits, raw = 12, None, 1, 16, None
    while i + 8 <= len(data):
        cid, sz = data[i : i + 4], struct.unpack("<I", data[i + 4 : i + 8])[0]
        body = data[i + 8 : i + 8 + sz]
        if cid == b"fmt ":
            fmt, n_ch, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if fmt != 1 or bits != 16:
                raise NotImplementedError("only PCM16 WAV supported")
        elif cid == b"data":
            raw = body
        i += 8 + sz + (sz & 1)  # chunks are word-aligned
    if raw is None or rate is None:
        raise ValueError("WAV missing fmt/data chunk")
    s = np.frombuffer(raw, dtype=np.int16)
    if n_ch > 1:
        s = s[::n_ch]
    return s.astype(np.float64) / 32768.0, rate


# ---------------------------------------------------------------------------
# feature extraction per modality (pure numpy, fixed output dim)
# ---------------------------------------------------------------------------

def decode_image(payload: bytes) -> np.ndarray:
    """Sniff the container from magic bytes and decode → (h, w, 3) uint8 RGB
    (grayscale broadcast across channels, RGBA alpha dropped)."""
    if payload.startswith(b"P6"):
        return decode_ppm(payload)
    if payload.startswith(_PNG_SIG):
        img = decode_png(payload)
        if img.ndim == 2:
            return np.repeat(img[:, :, None], 3, axis=2)
        return img[:, :, :3]
    raise NotImplementedError(
        "no dependency-free decoder for this image payload (magic bytes match "
        "neither PPM P6 nor PNG); richer codecs need PIL"
    )


def _image_features(payload: bytes, dim: int) -> np.ndarray:
    """Decode → nearest-neighbor resize to a ~sqrt(dim) grid → grayscale
    flatten, padded/truncated to exactly ``dim`` (in [0, 1])."""
    img = decode_image(payload)
    side = max(int(np.sqrt(dim)), 1)
    small = resize_nearest(img, side, side).astype(np.float64)
    gray = (small @ np.array([0.299, 0.587, 0.114])) / 255.0
    flat = gray.ravel()
    out = np.zeros(dim)
    out[: min(dim, flat.size)] = flat[:dim]
    return out

def _audio_features(payload: bytes, dim: int) -> np.ndarray:
    """Decode → per-window RMS envelope over ``dim`` equal windows."""
    s, _rate = decode_wav(payload)
    if s.size == 0:
        return np.zeros(dim)
    edges = np.linspace(0, s.size, dim + 1).astype(int)
    return np.array(
        [
            np.sqrt(np.mean(s[a:b] ** 2)) if b > a else 0.0
            for a, b in zip(edges[:-1], edges[1:])
        ]
    )


def _fake_features(payload: bytes, dim: int) -> np.ndarray:
    h = hashlib.sha256(payload).digest()
    seed = int.from_bytes(h[:8], "little")
    return np.random.default_rng(seed).standard_normal(dim)


# ---------------------------------------------------------------------------
# synthetic asset tables
# ---------------------------------------------------------------------------

def synthetic_assets(spark, n: int = 100, seed: int = 42, real: bool = False) -> DataFrame:
    """Deterministic asset table exercising the binary column path.

    ``real=False``: opaque random payloads (plumbing tests, fake features).
    ``real=True``: decodable payloads — PPM and PNG images (alternating, PNG
    with Sub/Up filtered scanlines) and PCM16 WAV audio — with matching
    metadata (video stays opaque: no dependency-free codec)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        mt = ["image", "audio", "video"][i % 3]
        if real and mt == "image":
            img = rng.integers(0, 256, size=(12, 16, 3), dtype=np.uint8)
            if (i // 3) % 2 == 0:
                payload, meta = encode_ppm(img), (16, 12, None, "ppm")
            else:
                payload = encode_png(img, filter_type=1 + ((i // 6) % 2))
                meta = (16, 12, None, "png")
        elif real and mt == "audio":
            t = np.arange(1600) / 16000.0
            wave = 0.5 * np.sin(2 * np.pi * (200 + 50 * (i % 5)) * t)
            payload, meta = encode_wav(wave), (None, None, 100, "wav")
        else:
            payload = rng.integers(0, 256, size=64, dtype=np.uint8).tobytes()
            # "jpeg" deliberately: a codec the real path must fail loud on
            meta = (64, 48, 1000 + i, "fake") if mt != "image" else (64, 48, None, "jpeg")
        rows.append((i, mt, bytearray(payload), meta))
    return spark.createDataFrame(rows, ASSET_SCHEMA)


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------

def extract_features(
    assets: DataFrame, *, dim: int = 16, fake: bool = True, batch_size: int = 256
) -> DataFrame:
    """Decode + feature-extract over the binary column (mapInPandas, Arrow
    batches). Returns (asset_id, media_type, features array<double>).

    ``fake=False`` decodes for real: PPM images and PCM16 WAV audio (see
    module docstring); any other (media_type, codec) raises
    NotImplementedError inside the task — fail loud, not wrong."""

    def batch(it):
        for pdf in it:
            feats = []
            for b, mt, meta in zip(
                pdf["media"].values, pdf["media_type"].values, pdf["meta"].values
            ):
                payload = bytes(b)
                if fake:
                    feats.append(_fake_features(payload, dim).tolist())
                    continue
                codec = (meta["codec"] if meta is not None else None) or ""
                if mt == "image" and codec in ("ppm", "png"):
                    feats.append(_image_features(payload, dim).tolist())
                elif mt == "audio" and codec == "wav":
                    feats.append(_audio_features(payload, dim).tolist())
                else:
                    raise NotImplementedError(
                        f"no dependency-free decoder for media_type={mt!r} "
                        f"codec={codec!r}; supported real paths: image/ppm, "
                        "image/png, audio/wav (richer codecs need "
                        "PIL/torchaudio/pyav)"
                    )
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].values,
                    "media_type": pdf["media_type"].values,
                    "features": feats,
                }
            )

    return assets.select("asset_id", "media_type", "media", "meta").mapInPandas(
        batch, "asset_id long, media_type string, features array<double>"
    )


def frame_sample(assets: DataFrame, *, every_ms: int = 500, fake: bool = True) -> DataFrame:
    """Video frame sampling stub: one row per sampled frame with the frame
    timestamp; payload decode stubbed (no dependency-free video codec)."""

    def batch(it):
        for pdf in it:
            if not fake:
                raise NotImplementedError("no video decoder in this container")
            ids, ts = [], []
            for aid, meta in zip(pdf["asset_id"].values, pdf["meta"].values):
                dur = (meta["duration_ms"] or 0) if meta is not None else 0
                stamps = list(range(0, int(dur), every_ms))
                ids.extend([aid] * len(stamps))
                ts.extend(stamps)
            yield pd.DataFrame({"asset_id": ids, "frame_ms": ts})

    return (
        assets.where(F.col("media_type") == "video")
        .select("asset_id", "meta")
        .mapInPandas(batch, "asset_id long, frame_ms int")
    )
