"""Multimodal: real PPM codec path (decode/resize/features/frame-sample),
stub fallback for library-gated formats, batching, failure isolation."""

import numpy as np
import pytest

from spel_spark.operators.multimodal import (
    audio_frame_sample,
    decode_ppm,
    encode_ppm,
    image_features,
    resize_nearest,
    synthetic_media,
    video_frame_sample,
)


def test_ppm_codec_roundtrip():
    rng = np.random.Generator(np.random.PCG64(3))
    img = rng.integers(0, 256, size=(7, 11, 3), dtype=np.uint8)
    assert (decode_ppm(encode_ppm(img)) == img).all()
    # comments + arbitrary whitespace in header
    manual = b"P6\n# a comment\n4  2\n255\n" + bytes(range(24))
    got = decode_ppm(manual)
    assert got.shape == (2, 4, 3)
    assert got.reshape(-1).tolist() == list(range(24))
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n2 2\n255\nxy")  # truncated
    with pytest.raises(ValueError):
        decode_ppm(b"JFIF....")


def test_resize_nearest():
    img = np.arange(36, dtype=np.uint8).reshape(6, 6, 1)
    small = resize_nearest(img, 3, 3)
    assert small.shape == (3, 3, 1)
    assert small[0, 0, 0] == img[0, 0, 0]
    up = resize_nearest(small, 6, 6)
    assert up.shape == (6, 6, 1)


def test_image_features_real_ppm_path(spark):
    media = synthetic_media(spark, n=30)
    f1 = image_features(media)
    rows1 = sorted((r.media_id, r.phash) for r in f1.collect())
    rows2 = sorted((r.media_id, r.phash) for r in image_features(media).collect())
    assert rows1 == rows2  # deterministic
    assert len(rows1) == media.filter("kind = 'image'").count()
    first = f1.orderBy("media_id").first()
    # real path: 3 channel means + 4x4 pooled grayscale = 19 features
    assert len(first.feature) == 19
    assert all(0.0 <= v <= 1.0 for v in first.feature)
    # width/height come from the PPM header and match the table metadata
    meta = {r.media_id: (r.width, r.height) for r in media.collect()}
    for r in f1.collect():
        assert (r.width, r.height) == meta[r.media_id]


def test_image_features_stub_fallback(spark):
    media = spark.createDataFrame(
        [(1, "image", b"not-ppm-bytes", 10, 10, 0, "fake")],
        "media_id long, kind string, payload binary, width int, height int, "
        "duration_ms int, codec string",
    )
    out = image_features(media).collect()
    assert len(out) == 1 and len(out[0].feature) == 16  # stub dim


def test_video_frame_sample_real(spark):
    media = synthetic_media(spark, n=30)
    frames = video_frame_sample(media, every_k=2)
    rows = frames.collect()
    assert rows
    # every video contributes ceil(n_frames / 2) sampled frames
    by_vid = {}
    for r in rows:
        by_vid.setdefault(r.media_id, []).append(r.frame_idx)
    vid_ids = [r.media_id for r in media.filter("kind = 'video'").collect()]
    assert sorted(by_vid) == sorted(vid_ids)
    for mid, idxs in by_vid.items():
        n_frames = 2 + mid % 4  # synthetic_media's generator parameter
        assert sorted(idxs) == list(range(0, n_frames, 2))
        assert all(len(f.feature) == 19 for f in rows if f.media_id == mid)


def test_audio_frame_sample(spark):
    """Both audio paths: WAV rows (i % 6 == 1) run the REAL PCM decoder —
    true duration from sample count, per-frame rms, sine physics
    (rms = amp/sqrt(2), zcr = 2f/rate) — while fake-codec rows keep the
    deterministic stub features."""
    import math

    media = synthetic_media(spark, n=30)
    out = audio_frame_sample(media)
    rows = {r.media_id: r for r in out.collect()}
    assert len(rows) == media.filter("kind = 'audio'").count()
    for mid, r in rows.items():
        if mid % 2 == 1:  # real WAV sine: rate 8000, dur 1+i%3 s, amp 0.5
            dur_s = 1 + mid % 3
            freq = 220.0 * (1 + mid % 4)
            assert r.duration_ms == 1000 * dur_s
            assert r.n_frames == dur_s
            assert len(r.feature) == 3 + dur_s
            rms, zcr, peak = r.feature[:3]
            assert abs(rms - 0.5 / math.sqrt(2)) < 0.01
            assert abs(zcr - 2 * freq / 8000) < 0.01
            assert 0.45 <= peak <= 0.5
            for frame_rms in r.feature[3:]:
                assert abs(frame_rms - rms) < 0.01
        else:  # stub path unchanged
            assert r.n_frames == max(1, r.duration_ms // 1000)
            assert len(r.feature) == 8


def test_wav_codec_roundtrip_and_downmix(spark):
    import struct

    import numpy as np
    import pytest

    from spel_spark.operators.multimodal import decode_wav, encode_wav

    t = np.arange(8000) / 8000.0
    x = 0.25 * np.sin(2 * np.pi * 440 * t)
    got, rate = decode_wav(encode_wav(x, 8000))
    assert rate == 8000 and len(got) == len(x)
    assert np.max(np.abs(got - x)) < 1.5 / 32767  # 16-bit quantization

    # stereo 8-bit: channels mean-downmix
    l = (np.clip(np.sin(2 * np.pi * 10 * t[:800]), -1, 1) * 127 + 128).astype("u1")
    r = np.full(800, 128, dtype="u1")
    inter = np.empty(1600, dtype="u1")
    inter[0::2], inter[1::2] = l, r
    pcm = inter.tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(pcm), b"WAVE", b"fmt ", 16,
        1, 2, 8000, 8000 * 2, 2, 8, b"data", len(pcm),
    )
    mono, _ = decode_wav(hdr + pcm)
    want = ((l.astype(float) - 128) / 128.0) / 2.0  # right channel is silence
    assert np.max(np.abs(mono - want)) < 1e-6

    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxWAVEgarbage-without-chunks")
    with pytest.raises(ValueError):
        decode_wav(b"not audio at all")
    # truncated mid-fmt must be a ValueError (NOT struct.error escaping
    # the per-row isolation in audio_frame_sample)
    with pytest.raises(ValueError):
        decode_wav(encode_wav(x, 8000)[:30])


def test_corrupt_and_empty_wav_rows_isolated(spark):
    """One truncated WAV must not fail the job (row dropped), and a
    structurally-valid WAV with a 0-byte data chunk must not emit NaN
    features."""
    import math
    import struct

    import numpy as np

    from spel_spark.operators.multimodal import encode_wav

    good = encode_wav(0.5 * np.sin(np.arange(8000) / 8000.0 * 6.28), 8000)
    truncated = good[:30]
    empty_data = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36, b"WAVE", b"fmt ", 16, 1, 1, 8000, 16000, 2, 16, b"data", 0,
    )
    media = spark.createDataFrame(
        [
            (1, "audio", truncated, 0, 0, 1000, "wav"),
            (2, "audio", good, 0, 0, 1000, "wav"),
            (3, "audio", empty_data, 0, 0, 1000, "wav"),
        ],
        "media_id long, kind string, payload binary, width int, height int, "
        "duration_ms int, codec string",
    )
    rows = {r.media_id: r for r in audio_frame_sample(media).collect()}
    assert set(rows) == {2, 3}  # truncated row isolated, job survives
    for r in rows.values():
        assert all(not math.isnan(f) for f in r.feature), r
    assert rows[3].duration_ms == 0 and rows[3].feature == [0.0, 0.0, 0.0, 0.0]


def test_corrupt_payload_dropped_not_fatal(spark):
    media = spark.createDataFrame(
        [
            (1, "image", b"", 10, 10, 0, "fake"),
            (2, "image", b"ok-bytes", 10, 10, 0, "fake"),
            (3, "image", b"P6\n9 9\n255\nshort", 9, 9, 0, "ppm"),  # truncated
        ],
        "media_id long, kind string, payload binary, width int, height int, "
        "duration_ms int, codec string",
    )
    out = image_features(media).collect()
    assert [r.media_id for r in out] == [2]


# --- round 5: real PNG codec -----------------------------------------------


def test_png_codec_roundtrip_all_filters_and_channels():
    """Every scanline filter (None/Sub/Up/Average/Paeth) x every
    supported channel layout (gray, gray+alpha, RGB, RGBA) round-trips
    bit-exactly through the pure-stdlib codec."""
    from spel_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.Generator(np.random.PCG64(11))
    for ch in (1, 2, 3, 4):
        img = rng.integers(0, 256, size=(9, 13, ch), dtype=np.uint8)
        for ftype in range(5):
            got = decode_png(encode_png(img, filter_type=ftype))
            assert got.shape == (9, 13, ch), (ch, ftype)
            assert (got == img).all(), (ch, ftype)
    # 2-D gray input is accepted and comes back as (h, w, 1)
    gray = rng.integers(0, 256, size=(5, 7), dtype=np.uint8)
    assert (decode_png(encode_png(gray))[:, :, 0] == gray).all()


def test_png_oversized_dimensions_rejected():
    """Images past the pure-python kernel's decoded-size cap raise (the
    Average/Paeth unfilters are sequential per-byte loops — one huge
    filtered frame must hit the corrupt-payload isolation path, not stall
    an Arrow batch).  Built by hand so only IHDR dims are huge; no real
    giant buffer is allocated."""
    import zlib as _z

    import pytest

    from spel_spark.operators.multimodal import _MAX_DECODE_BYTES, decode_png

    w = h = 1 << 16  # 4G pixels x 3 channels >> cap
    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
    def chunk(ctype, body):
        crc = (_z.crc32(ctype + body) & 0xFFFFFFFF).to_bytes(4, "big")
        return len(body).to_bytes(4, "big") + ctype + body + crc
    payload = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", _z.compress(b"\x00")) + chunk(b"IEND", b"")
    )
    assert w * h * 3 > _MAX_DECODE_BYTES
    with pytest.raises(ValueError, match="exceeds the pure-python kernel cap"):
        decode_png(payload)


def test_png_decode_rejects_corruption():
    import pytest

    from spel_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.Generator(np.random.PCG64(12))
    img = rng.integers(0, 256, size=(6, 6, 3), dtype=np.uint8)
    good = encode_png(img)
    with pytest.raises(ValueError):
        decode_png(b"not a png")
    with pytest.raises(ValueError):
        decode_png(good[:40])  # truncated chunk
    flipped = bytearray(good)
    flipped[-20] ^= 0xFF  # corrupt a byte inside IDAT -> CRC mismatch
    with pytest.raises(ValueError):
        decode_png(bytes(flipped))
    # declared interlace -> rejected loudly (header byte 12 of IHDR body);
    # rebuild the CRC so the interlace check (not CRC) is what fires
    import zlib as _z

    ihdr_body = bytearray(good[16:29])
    ihdr_body[12] = 1
    crc = (_z.crc32(b"IHDR" + bytes(ihdr_body)) & 0xFFFFFFFF).to_bytes(4, "big")
    interlaced = good[:16] + bytes(ihdr_body) + crc + good[33:]
    with pytest.raises(ValueError, match="interlac"):
        decode_png(interlaced)


def test_image_features_real_png_path(spark):
    """PNG rows of the synthetic table run the REAL decode path: 19
    features (channel means + 4x4 pooled grayscale), header-true
    dimensions, and features identical to the same pixels via PPM."""
    from spel_spark.operators.multimodal import (
        IMAGE_FEATURES_SCHEMA,
        MEDIA_SCHEMA,
        decode_png,
    )

    media = synthetic_media(spark, n=36)
    png_ids = {r.media_id for r in media.filter("codec = 'png'").collect()}
    assert png_ids  # the fixture must actually exercise PNG
    feats = {r.media_id: r for r in image_features(media).collect()}
    assert png_ids <= set(feats)
    for mid in png_ids:
        assert len(feats[mid].feature) == 19
    # same pixels via PPM give identical features (codec-independence)
    rng = np.random.Generator(np.random.PCG64(5))
    img = rng.integers(0, 256, size=(10, 12, 3), dtype=np.uint8)
    from spel_spark.operators.multimodal import encode_png, encode_ppm

    both = spark.createDataFrame(
        [
            (1, "image", encode_ppm(img), 12, 10, 0, "ppm"),
            (2, "image", encode_png(img, filter_type=4), 12, 10, 0, "png"),
            (3, "image", encode_png(img)[:50], 12, 10, 0, "png"),  # truncated
        ],
        MEDIA_SCHEMA,
    )
    rows = {r.media_id: r for r in image_features(both).collect()}
    assert set(rows) == {1, 2}  # corrupt PNG isolated, job survives
    assert rows[1].feature == rows[2].feature
    assert (rows[2].width, rows[2].height) == (12, 10)


def test_png_gray_and_rgba_collapse():
    from spel_spark.operators.multimodal import (
        _image_feature_vec,
        _png_to_rgb,
        decode_png,
        encode_png,
    )

    rng = np.random.Generator(np.random.PCG64(6))
    gray = rng.integers(0, 256, size=(8, 8, 1), dtype=np.uint8)
    rgb3 = _png_to_rgb(decode_png(encode_png(gray)))
    assert rgb3.shape == (8, 8, 3)
    assert (rgb3[:, :, 0] == gray[:, :, 0]).all()
    assert (rgb3[:, :, 1] == rgb3[:, :, 2]).all()
    rgba = rng.integers(0, 256, size=(8, 8, 4), dtype=np.uint8)
    rgb = _png_to_rgb(decode_png(encode_png(rgba, filter_type=2)))
    assert (rgb == rgba[:, :, :3]).all()
    assert len(_image_feature_vec(rgb)) == 19


def test_wav_oversized_data_chunk_rejected():
    """ADVICE r4: a data chunk whose declared size extends past the
    payload must raise (silent truncation decoded fewer samples with a
    wrong duration)."""
    import struct

    import pytest

    from spel_spark.operators.multimodal import decode_wav, encode_wav

    good = encode_wav(0.5 * np.sin(np.arange(1600) / 8000.0 * 6.28), 8000)
    # chop an EVEN number of bytes off the tail: numpy frombuffer would
    # happily decode the shorter body — the size check must fire instead
    with pytest.raises(ValueError, match="truncated data"):
        decode_wav(good[:-10])


def test_zero_dimension_images_isolated(spark):
    """A CRC-valid PNG/PPM with h=0 or w=0 must be rejected as ValueError
    (not crash feature extraction with an IndexError that escapes the
    per-row isolation)."""
    import zlib

    import pytest

    from spel_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_png,
        decode_ppm,
        encode_ppm,
    )

    # hand-build a CRC-valid 0-height PNG (encode_png would need an array)
    def chunk(ctype, body):
        return (
            len(body).to_bytes(4, "big") + ctype + body
            + (zlib.crc32(ctype + body) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    ihdr = (3).to_bytes(4, "big") + (0).to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
    png0 = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"")) + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="degenerate"):
        decode_png(png0)
    with pytest.raises(ValueError, match="degenerate"):
        decode_ppm(b"P6\n0 0\n255\n")
    rng = np.random.Generator(np.random.PCG64(7))
    ok = encode_ppm(rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8))
    media = spark.createDataFrame(
        [(1, "image", png0, 3, 0, 0, "png"), (2, "image", ok, 4, 4, 0, "ppm")],
        MEDIA_SCHEMA,
    )
    rows = image_features(media).collect()
    assert [r.media_id for r in rows] == [2]  # bad row isolated, job survives
