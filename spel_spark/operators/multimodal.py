"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Training-data pipelines carry image/audio/video as ``binary`` columns with
typed metadata; the Spark-side contract (schema, Arrow batch shape,
partition sizing) is real and tested — only the codec kernels are stubbed
because no image/audio libraries exist in this container.  Each stub is
deterministic (features derived from the payload bytes) so downstream
operators (dedup, ANN) are exercisable end to end; swap ``_decode_*`` for
PIL/torchaudio/ffmpeg bindings in a real deployment.

Design notes for 100 TB of media:
* payloads stay opaque ``binary`` until the LAST possible operator —
  filters/joins/dedup run on metadata and fingerprints, never on pixels;
* ``mapInPandas`` with ``spark.sql.execution.arrow.maxRecordsPerBatch``
  tuned down (payloads are MBs, not bytes) bounds executor memory;
* ``maxPartitionBytes`` (not row counts) governs scan parallelism.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, "
    "duration_ms int, codec string"
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, width int, height int, feature array<float>, phash string"
)

AUDIO_FEATURES_SCHEMA = (
    "media_id long, duration_ms int, n_frames int, feature array<float>"
)


def _bytes_rng(payload: bytes, n: int) -> np.ndarray:
    """Deterministic pseudo-features from payload bytes (stub kernel)."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "little")
    return np.random.Generator(np.random.PCG64(seed)).random(n, dtype=np.float32)


# -- real codec: PPM (P6), pure numpy — no image library needed -------------

def _parse_ppm(payload: bytes, offset: int = 0) -> tuple[np.ndarray, int]:
    """Parse one P6 frame at ``offset``; returns (image, next_offset)."""
    if not payload.startswith(b"P6", offset):
        raise ValueError("not a P6 PPM payload")
    fields: list[int] = []
    pos = offset + 2
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            pos = payload.index(b"\n", pos) + 1
            continue
        end = pos
        while end < len(payload) and not payload[end : end + 1].isspace():
            end += 1
        if end == pos:
            raise ValueError("malformed PPM header")
        fields.append(int(payload[pos:end]))
        pos = end
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    if w < 1 or h < 1:
        # a zero-dimension frame would crash feature extraction with an
        # IndexError that escapes the per-row ValueError isolation
        raise ValueError(f"degenerate PPM dimensions {w}x{h}")
    n = w * h * 3
    if len(payload) - pos < n:
        raise ValueError("truncated PPM payload")
    img = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos).reshape(h, w, 3)
    return img, pos + n


def decode_ppm(payload: bytes) -> np.ndarray:
    """REAL decoder for binary PPM (P6): header parse (incl. comments) +
    one zero-copy frombuffer reshape -> (h, w, 3) uint8.  PPM needs no
    external library, so this codec path is fully real; JPEG/PNG remain
    behind :func:`_decode_image_stub` until PIL/turbojpeg are present."""
    img, _ = _parse_ppm(payload)
    return img


def encode_ppm(img: np.ndarray) -> bytes:
    """Inverse of :func:`decode_ppm` (test fixture + sink helper)."""
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def resize_nearest(img: np.ndarray, th: int, tw: int) -> np.ndarray:
    """REAL nearest-neighbor resize via numpy index sampling."""
    h, w = img.shape[:2]
    rows = (np.arange(th) * h // th).clip(0, h - 1)
    cols = (np.arange(tw) * w // tw).clip(0, w - 1)
    return img[rows[:, None], cols[None, :]]


def _image_feature_vec(img: np.ndarray, grid: int = 4) -> np.ndarray:
    """Per-channel means + grid x grid mean-pooled grayscale (real
    feature extraction over decoded pixels)."""
    means = img.reshape(-1, 3).mean(axis=0) / 255.0
    gray = img.mean(axis=2)
    pooled = resize_nearest(gray[..., None], grid, grid)[..., 0].reshape(-1) / 255.0
    return np.concatenate([means, pooled]).astype(np.float32)


# -- real codec: PNG (zlib inflate + unfilter), pure stdlib + numpy ---------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, RGB, gray+alpha, RGBA
# decoded-bytes ceiling for the pure-python unfilter kernel (64 MiB —
# a 4096x4096 RGBA frame); see decode_png for the rationale
_MAX_DECODE_BYTES = 64 * 1024 * 1024


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter_scanline(
    ftype: int, line: bytes, prev: bytes, bpp: int
) -> bytes:
    """Reverse one scanline filter (PNG spec §9: None/Sub/Up/Average/
    Paeth).  Sequential along x by definition — pure-python ints beat
    numpy scalar indexing here; rows are independent of everything but
    the previous row, so the per-row cost is the only serial part."""
    n = len(line)
    if ftype == 0:
        return line
    if ftype == 2:  # Up — fully vectorizable (uint8 wraps mod 256)
        return (
            np.frombuffer(line, np.uint8) + np.frombuffer(prev, np.uint8)
        ).tobytes()
    if ftype == 1:  # Sub — per-lane prefix sum mod 256, fully vectorized:
        # cur[k*bpp+lane] = sum(line[i*bpp+lane] for i <= k) mod 256
        arr = np.frombuffer(line, np.uint8).copy()
        for lane in range(bpp):
            arr[lane::bpp] = np.cumsum(arr[lane::bpp], dtype=np.int64) & 0xFF
        return arr.tobytes()
    cur = bytearray(line)
    if ftype == 3:  # Average
        for x in range(n):
            left = cur[x - bpp] if x >= bpp else 0
            cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
    elif ftype == 4:  # Paeth
        for x in range(n):
            a = cur[x - bpp] if x >= bpp else 0
            c = prev[x - bpp] if x >= bpp else 0
            cur[x] = (cur[x] + _paeth(a, prev[x], c)) & 0xFF
    else:
        raise ValueError(f"bad scanline filter type {ftype}")
    return bytes(cur)


def decode_png(payload: bytes) -> np.ndarray:
    """REAL decoder for 8-bit non-interlaced PNG (gray / gray+alpha /
    RGB / RGBA): chunk walk with CRC verification, stdlib zlib inflate,
    per-scanline unfilter — no image library.  Returns (h, w, channels)
    uint8.  Palette, 16-bit, and Adam7-interlaced images raise ValueError
    (corrupt-payload isolation path), as do truncated chunks and CRC
    mismatches.  Production swaps this kernel for libpng/PIL; the Spark
    plumbing around it is identical either way."""
    import zlib

    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = len(_PNG_SIG), None, []
    while pos + 12 <= len(payload):
        ln = int.from_bytes(payload[pos : pos + 4], "big")
        ctype = payload[pos + 4 : pos + 8]
        if pos + 12 + ln > len(payload):
            raise ValueError("truncated PNG chunk")
        body = payload[pos + 8 : pos + 8 + ln]
        crc = int.from_bytes(payload[pos + 8 + ln : pos + 12 + ln], "big")
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or len(ihdr) < 13 or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    if w < 1 or h < 1:
        # a zero-dimension image would crash feature extraction with an
        # IndexError that escapes the per-row ValueError isolation
        raise ValueError(f"degenerate PNG dimensions {w}x{h}")
    bit_depth, color_type, _comp, _filt, interlace = ihdr[8:13]
    if bit_depth != 8:
        raise ValueError(f"unsupported bit depth {bit_depth} (8-bit only)")
    channels = _PNG_CHANNELS.get(color_type)
    if channels is None:
        raise ValueError(f"unsupported color type {color_type} (no palette)")
    if interlace:
        raise ValueError("Adam7 interlacing unsupported")
    # decoded-size cap: the Average/Paeth unfilters are per-byte Python
    # loops (sequential along x by spec), so one huge filtered image could
    # stall a whole Arrow batch in the mapInPandas worker.  Oversized
    # images take the same per-row ValueError isolation path as corrupt
    # payloads; production swaps this kernel for libpng and lifts the cap.
    if w * h * channels > _MAX_DECODE_BYTES:
        raise ValueError(
            f"PNG decoded size {w}x{h}x{channels} exceeds the pure-python "
            f"kernel cap ({_MAX_DECODE_BYTES} bytes)"
        )
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as exc:
        raise ValueError(f"corrupt IDAT stream: {exc}") from exc
    stride = w * channels
    if len(raw) != (stride + 1) * h:
        raise ValueError("IDAT length does not match dimensions")
    rows, prev = [], bytes(stride)
    for y in range(h):
        off = y * (stride + 1)
        prev = _unfilter_scanline(raw[off], raw[off + 1 : off + 1 + stride], prev, channels)
        rows.append(prev)
    return np.frombuffer(b"".join(rows), np.uint8).reshape(h, w, channels)


def _filter_scanline(ftype: int, line: bytes, prev: bytes, bpp: int) -> bytes:
    """Forward filter (encoder side / test fixtures for every unfilter
    branch)."""
    n = len(line)
    out = bytearray(n)
    for x in range(n):
        a = line[x - bpp] if x >= bpp else 0
        b = prev[x]
        c = prev[x - bpp] if x >= bpp else 0
        pred = {0: 0, 1: a, 2: b, 3: (a + b) >> 1, 4: _paeth(a, b, c)}[ftype]
        out[x] = (line[x] - pred) & 0xFF
    return bytes(out)


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """Inverse of :func:`decode_png` (8-bit gray/gray+alpha/RGB/RGBA;
    ``filter_type`` applies one PNG filter to every scanline so tests
    can exercise each unfilter branch)."""
    import zlib

    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    prev = bytes(w * ch)
    filtered = []
    for y in range(h):
        line = img[y].tobytes()
        filtered.append(bytes([filter_type]) + _filter_scanline(filter_type, line, prev, ch))
        prev = line
    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([8, color_type, 0, 0, 0])
    )

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            len(body).to_bytes(4, "big") + ctype + body
            + (zlib.crc32(ctype + body) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"".join(filtered)))
        + chunk(b"IEND", b"")
    )


def _png_to_rgb(img: np.ndarray) -> np.ndarray:
    """Collapse decoded PNG channels to the (h, w, 3) shape the feature
    kernel expects: gray broadcast to 3 channels, alpha dropped."""
    ch = img.shape[2]
    if ch == 1:
        return np.repeat(img, 3, axis=2)
    if ch == 2:  # gray + alpha
        return np.repeat(img[:, :, :1], 3, axis=2)
    return img[:, :, :3]  # RGB stays; RGBA drops alpha


def _decode_image_stub(payload: bytes, dim: int = 16) -> np.ndarray:
    """STUB — replace with a real decoder (PIL/turbojpeg).  JPEG is the
    one remaining stubbed image format (its entropy coding needs a
    library this container lacks); PPM and PNG take the real decode
    paths above.  Raises for empty payloads, mimicking codec errors."""
    if not payload:
        raise NotImplementedError(
            "real image decoding requires an image library absent from "
            "this container; payload was empty"
        )
    return _bytes_rng(payload, dim)


def image_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Decode + feature-extract images via mapInPandas (Arrow batches).

    PPM (P6) and PNG payloads get the REAL pipeline — decode -> resize ->
    channel-mean + pooled-grayscale features, true width/height from the
    header; other formats (JPEG) fall to the library-gated stub.  Real
    plumbing either way: batch iterator in/out, per-row failure isolation
    (bad payloads are dropped, not fatal — at 100 TB some blobs are
    corrupt).
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "feature": [], "phash": []}
            for mid, w, h, payload in zip(
                pdf["media_id"], pdf["width"], pdf["height"], pdf["payload"]
            ):
                try:
                    raw = bytes(payload)
                    if raw.startswith(b"P6"):
                        img = decode_ppm(raw)
                        feat = _image_feature_vec(img)
                        h, w = img.shape[:2]
                    elif raw.startswith(_PNG_SIG):
                        img = _png_to_rgb(decode_png(raw))
                        feat = _image_feature_vec(img)
                        h, w = img.shape[:2]
                    else:
                        feat = _decode_image_stub(raw, dim)
                except (NotImplementedError, ValueError):
                    continue
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["feature"].append(feat.tolist())
                out["phash"].append(hashlib.md5(feat.tobytes()).hexdigest()[:16])
            if out["media_id"]:  # empty frames infer wrong Arrow types
                yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "image").select(
        "media_id", "width", "height", "payload"
    ).mapInPandas(op, schema=IMAGE_FEATURES_SCHEMA)


VIDEO_FRAMES_SCHEMA = (
    "media_id long, frame_idx int, width int, height int, feature array<float>"
)


def video_frame_sample(media: DataFrame, every_k: int = 2) -> DataFrame:
    """REAL frame sampling: 'video' payloads are concatenated P6 frames;
    parse the frame sequence, keep every ``every_k``-th frame, emit
    per-frame features.  mapInPandas so one executor never materializes
    more than a batch of videos."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "width": [], "height": [], "feature": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload or b"")
                pos, idx = 0, 0
                while raw.startswith(b"P6", pos):
                    try:
                        img, pos = _parse_ppm(raw, pos)
                    except ValueError:
                        break
                    h, w = img.shape[:2]
                    if idx % every_k == 0:
                        out["media_id"].append(mid)
                        out["frame_idx"].append(idx)
                        out["width"].append(w)
                        out["height"].append(h)
                        out["feature"].append(_image_feature_vec(img).tolist())
                    idx += 1
            if out["media_id"]:
                yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "video").select(
        "media_id", "payload"
    ).mapInPandas(op, schema=VIDEO_FRAMES_SCHEMA)


# -- real codec: WAV (RIFF PCM), pure struct + numpy ------------------------

def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """REAL decoder for RIFF/WAVE PCM (8- and 16-bit, any channel count,
    multi-channel mean-downmixed): chunk walk + one frombuffer — no audio
    library.  Returns (float64 samples in [-1, 1], sample_rate)."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        sz = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        body = payload[pos + 8 : pos + 8 + sz]
        if cid in (b"fmt ", b"data") and len(body) != sz:
            # a declared size past the payload end means a truncated blob;
            # silently decoding the shorter slice would yield fewer samples
            # and a wrong duration instead of hitting the per-row isolation
            raise ValueError(f"truncated {cid.decode().strip()} chunk")
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_ch, rate, _bps, _align, bits = fmt
    if audio_format != 1:
        raise ValueError(f"unsupported WAVE format {audio_format} (PCM only)")
    if bits == 16:
        arr = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 8:
        arr = (np.frombuffer(data, dtype="u1").astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    if n_ch > 1:
        arr = arr[: len(arr) // n_ch * n_ch].reshape(-1, n_ch).mean(axis=1)
    return arr, rate


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Inverse of :func:`decode_wav` (16-bit mono; test fixture helper)."""
    import struct

    pcm = np.clip(samples, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(pcm), b"WAVE", b"fmt ", 16,
        1, 1, rate, rate * 2, 2, 16, b"data", len(pcm),
    )
    return hdr + pcm


def _audio_feature_vec(samples: np.ndarray, rate: int, frame_ms: int) -> tuple[np.ndarray, int, int]:
    """Real per-frame audio features: overall (rms, zero-crossing rate,
    peak) + per-frame rms.  Returns (features, n_frames, duration_ms)."""
    n = len(samples)
    duration_ms = int(round(n * 1000.0 / rate)) if rate else 0
    rms = float(np.sqrt(np.mean(samples**2))) if n else 0.0
    zcr = float(np.mean(np.abs(np.diff(np.signbit(samples))))) if n > 1 else 0.0
    peak = float(np.max(np.abs(samples))) if n else 0.0
    flen = max(1, rate * frame_ms // 1000)
    n_frames = max(1, (n + flen - 1) // flen)
    # empty slices (0-sample data chunk forced to 1 frame) are 0.0, not
    # np.mean([]) = NaN silently poisoning downstream aggregations
    frame_rms = [
        float(np.sqrt(np.mean(sl**2))) if len(sl) else 0.0
        for i in range(n_frames)
        for sl in [samples[i * flen : (i + 1) * flen]]
    ]
    return (
        np.array([rms, zcr, peak] + frame_rms, dtype=np.float32),
        n_frames,
        duration_ms,
    )


def audio_frame_sample(media: DataFrame, frame_ms: int = 1000, dim: int = 8) -> DataFrame:
    """Frame-sample audio payloads.

    RIFF/WAVE PCM payloads get the REAL pipeline — decode -> overall
    (rms, zcr, peak) + per-frame rms, with the true duration computed
    from sample count / rate; other formats (mp3/flac/ogg need codec
    libraries absent from this container) fall to the deterministic stub.
    Real plumbing either way: Arrow batches, per-row failure isolation.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "duration_ms": [], "n_frames": [], "feature": []}
            for mid, dur, payload in zip(
                pdf["media_id"], pdf["duration_ms"], pdf["payload"]
            ):
                if payload is None or len(payload) == 0:
                    continue
                raw = bytes(payload)
                if raw.startswith(b"RIFF"):
                    try:
                        samples, rate = decode_wav(raw)
                    except ValueError:
                        continue  # corrupt blob: isolate, don't fail the job
                    feat, n_frames, dur = _audio_feature_vec(samples, rate, frame_ms)
                else:
                    n_frames = max(1, int(dur or 0) // frame_ms)
                    feat = _bytes_rng(raw, dim)
                out["media_id"].append(mid)
                out["duration_ms"].append(dur)
                out["n_frames"].append(n_frames)
                out["feature"].append(feat.tolist())
            if out["media_id"]:  # empty frames infer wrong Arrow types
                yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "audio").select(
        "media_id", "duration_ms", "payload"
    ).mapInPandas(op, schema=AUDIO_FEATURES_SCHEMA)


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests: images alternate REAL
    P6 PPM and REAL PNG payloads (cycling the PNG filter types), videos
    are concatenated P6 frames, and every other audio row is a REAL
    16-bit PCM WAV sine (all exercising the real codec paths); the
    remaining audio rows stay opaque bytes (stub path)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        w, h = 8 + i % 8, 6 + i % 6
        if kind == "image":
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            if (i // 3) % 2 == 1:
                payload, codec = encode_png(img, filter_type=(i // 6) % 5), "png"
            else:
                payload, codec = encode_ppm(img), "ppm"
        elif kind == "video":
            frames = [
                encode_ppm(rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8))
                for _ in range(2 + i % 4)
            ]
            payload, codec = b"".join(frames), "ppm-seq"
        elif i % 2 == 1:
            rate, dur_s, freq = 8000, 1 + i % 3, 220.0 * (1 + i % 4)
            tt = np.arange(rate * dur_s) / rate
            payload = encode_wav(0.5 * np.sin(2 * np.pi * freq * tt), rate)
            codec = "wav-pcm16"
        else:
            payload, codec = (
                bytes(rng.integers(0, 256, size=64 + (i % 5) * 32, dtype=np.uint8)),
                "fake",
            )
        rows.append((i, kind, payload, w, h, 1000 * (1 + i % 30), codec))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
