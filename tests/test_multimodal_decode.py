"""Real PNG/BMP decode (operators/multimodal.py — stdlib zlib + numpy,
no codec dependency) and the JVM-expression PNG header parser."""

import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from csp_gateway_spark.operators.multimodal import (
    _decode_bmp_bytes,
    _decode_png_bytes,
    _nearest_resize,
    decode_image,
    png_meta,
)


# ---------------------------------------------------------------------------
# minimal encoders (test-side only) — filter-0 PNG and 24-bit BMP writers
# ---------------------------------------------------------------------------

def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def make_png(px: np.ndarray, color_type: int = 2, filter_type: int = 0) -> bytes:
    h, w = px.shape[:2]
    nch = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b""
    prev = np.zeros(w * nch, dtype=np.uint8)
    for y in range(h):
        line = px[y].reshape(-1)[: w * nch].astype(np.uint8)
        if filter_type == 0:
            enc = line
        elif filter_type == 2:  # Up
            enc = (line.astype(int) - prev.astype(int)) % 256
        else:
            raise NotImplementedError
        raw += bytes([filter_type]) + bytes(enc.astype(np.uint8))
        prev = line
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def make_bmp(px: np.ndarray) -> bytes:
    h, w = px.shape[:2]
    row_bytes = ((w * 3 + 3) // 4) * 4
    body = b""
    for y in range(h - 1, -1, -1):  # bottom-up
        row = px[y][:, ::-1].tobytes()  # RGB → BGR
        body += row + b"\x00" * (row_bytes - len(row))
    header = b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + info + body


@pytest.fixture()
def rgb():
    rng = np.random.default_rng(42)
    return rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)


def test_png_roundtrip_exact(rgb):
    assert np.array_equal(_decode_png_bytes(make_png(rgb)), rgb)


def test_png_up_filter_roundtrip(rgb):
    assert np.array_equal(_decode_png_bytes(make_png(rgb, filter_type=2)), rgb)


def test_png_rgba_drops_alpha(rgb):
    rgba = np.dstack([rgb, np.full(rgb.shape[:2], 128, dtype=np.uint8)])
    assert np.array_equal(_decode_png_bytes(make_png(rgba, color_type=6)), rgb)


def test_png_grayscale_replicates_channels(rgb):
    gray = rgb[:, :, 0]
    out = _decode_png_bytes(make_png(gray[..., None], color_type=0))
    assert np.array_equal(out[:, :, 0], gray)
    assert np.array_equal(out[:, :, 1], gray)


def test_bmp_roundtrip_exact(rgb):
    assert np.array_equal(_decode_bmp_bytes(make_bmp(rgb)), rgb)


def test_nearest_resize_shape(rgb):
    out = _nearest_resize(rgb, 3, 2)
    assert out.shape == (2, 3, 3)
    assert np.array_equal(out[0, 0], rgb[0, 0])


def test_decode_image_real_png_in_spark(spark, rgb):
    data = [(1, bytes(make_png(rgb))), (2, bytes(make_bmp(rgb)))]
    df = spark.createDataFrame(data, "media_id long, content binary")
    out = {
        r["media_id"]: r
        for r in decode_image(df, out_width=7, out_height=5).collect()
    }
    # identity-size resize → exact pixels back, for both formats
    assert out[1]["width"] == 7 and out[1]["height"] == 5
    assert np.array_equal(
        np.array(out[1]["pixels"], dtype=np.uint8).reshape(5, 7, 3), rgb
    )
    assert np.array_equal(
        np.array(out[2]["pixels"], dtype=np.uint8).reshape(5, 7, 3), rgb
    )


def test_decode_image_unknown_format_raises_without_fake(spark):
    df = spark.createDataFrame([(1, b"\xff\xd8\xff jpeg-ish")], "media_id long, content binary")
    with pytest.raises(Exception, match="codec"):
        decode_image(df).collect()
    # fake=True falls back to the deterministic stand-in
    rows = decode_image(df, out_width=4, out_height=4, fake=True).collect()
    assert len(rows[0]["pixels"]) == 4 * 4 * 3


def test_png_meta_jvm_expression_matches_decoder(spark, rgb):
    data = [(1, bytes(make_png(rgb))), (2, b"BM not a png")]
    df = spark.createDataFrame(data, "media_id long, content binary")
    rows = {r["media_id"]: r for r in png_meta(df).collect()}
    assert rows[1]["is_png"] and rows[1]["png_width"] == 7 and rows[1]["png_height"] == 5
    assert rows[1]["png_bit_depth"] == 8 and rows[1]["png_color_type"] == 2
    assert not rows[2]["is_png"] and rows[2]["png_width"] is None


# ---------------------------------------------------------------------------
# JPEG / WAV header metadata (real byte parsing, no codec)
# ---------------------------------------------------------------------------

def _tiny_jpeg(width, height, progressive=False):
    """Minimal well-formed JPEG prefix: SOI + APP0 + SOF segment."""
    sof_marker = b"\xff\xc2" if progressive else b"\xff\xc0"
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + bytes(9)
    sof = (
        sof_marker
        + (17).to_bytes(2, "big")
        + bytes([8])
        + height.to_bytes(2, "big")
        + width.to_bytes(2, "big")
        + bytes([3])
        + bytes(9)
    )
    return b"\xff\xd8" + app0 + sof + b"\xff\xd9"


def _tiny_wav(rate=16000, channels=2, bits=16, n_samples=100):
    data_len = n_samples * channels * (bits // 8)
    fmt = (
        b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * channels * bits // 8).to_bytes(4, "little")
        + (channels * bits // 8).to_bytes(2, "little")
        + bits.to_bytes(2, "little")
    )
    data = b"data" + data_len.to_bytes(4, "little") + bytes(data_len)
    body = b"WAVE" + fmt + data
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def test_jpeg_meta_parses_dimensions(spark):
    from csp_gateway_spark.operators.multimodal import jpeg_meta

    rows = [
        (1, _tiny_jpeg(640, 480)),
        (2, _tiny_jpeg(33, 17, progressive=True)),
        (3, b"not a jpeg"),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r["media_id"]: r for r in jpeg_meta(df).collect()}
    assert (got[1]["width"], got[1]["height"]) == (640, 480)
    assert got[1]["progressive"] is False and got[1]["components"] == 3
    assert (got[2]["width"], got[2]["height"]) == (33, 17)
    assert got[2]["progressive"] is True
    assert got[3]["width"] is None  # corrupt input -> NULLs, no crash


def test_wav_meta_parses_header(spark):
    from csp_gateway_spark.operators.multimodal import wav_meta

    rows = [
        (1, _tiny_wav(rate=44100, channels=2, bits=16, n_samples=44100)),
        (2, _tiny_wav(rate=8000, channels=1, bits=8, n_samples=4000)),
        (3, b"RIFFgarbage"),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r["media_id"]: r for r in wav_meta(df).collect()}
    assert got[1]["sample_rate"] == 44100 and got[1]["channels"] == 2
    assert got[1]["n_samples"] == 44100
    assert got[1]["duration_sec"] == 1.0
    assert got[2]["duration_sec"] == 0.5
    assert got[3]["sample_rate"] is None


def test_jpeg_meta_stops_at_scan_data(spark):
    """A JPEG whose SOS precedes any SOF must yield NULL dimensions:
    stray 0xFF 0xC0 byte pairs inside the entropy-coded scan are NOT
    frame headers and the marker walk must not misparse them."""
    from csp_gateway_spark.operators.multimodal import jpeg_meta

    # SOI + minimal SOS, then entropy bytes containing a fake SOF0 pair
    sos = b"\xff\xda" + (8).to_bytes(2, "big") + bytes([1, 1, 0, 0, 63, 0])
    fake_sof_in_scan = b"\x12\xff\xc0\x00\x11\x08\x01\x00\x01\x00\x03" + bytes(9)
    data = b"\xff\xd8" + sos + fake_sof_in_scan + b"\xff\xd9"
    df = spark.createDataFrame([(1, data)], "media_id long, content binary")
    row = jpeg_meta(df).collect()[0]
    assert row["width"] is None and row["height"] is None


# ---------------------------------------------------------------------------
# Perceptual image hashing (multimodal.py::image_dhash/dhash_pairs)
# ---------------------------------------------------------------------------


def _gradient_image(w=64, h=48, noise=None, seed=0):
    rng = np.random.RandomState(seed)
    x = np.linspace(0, 255, w, dtype="float64")
    px = np.tile(x, (h, 1))
    if noise:
        px = px + rng.uniform(-noise, noise, size=px.shape)
    px = np.clip(px, 0, 255).astype("uint8")
    return np.stack([px, px, px], axis=2)


def test_dhash_robust_to_noise_and_resize(spark):
    from csp_gateway_spark.operators.multimodal import dhash_pairs, image_dhash

    imgs = [
        (1, make_png(_gradient_image())),
        (2, make_png(_gradient_image(noise=6, seed=1))),        # same scene, noisy
        (3, make_png(_gradient_image(w=32, h=24))),             # same scene, smaller
        (4, make_png(_gradient_image()[:, ::-1].copy())),       # mirrored: different
    ]
    df = spark.createDataFrame(imgs, "media_id long, content binary")
    hashes = image_dhash(df)
    hs = {r["media_id"]: r["dhash"] for r in hashes.collect()}
    assert all(v is not None for v in hs.values())
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in dhash_pairs(hashes, max_hamming=10).collect()}
    assert (1, 2) in pairs and (1, 3) in pairs  # perceptual match survives noise+resize
    assert (1, 4) not in pairs  # mirror flips every gradient bit
    assert hs[1] == hs[3]  # pure resize of the same gradient: identical hash


def test_dhash_undecodable_yields_null(spark):
    from csp_gateway_spark.operators.multimodal import image_dhash

    df = spark.createDataFrame(
        [(1, b"\xff\xd8\xff not actually decodable")], "media_id long, content binary"
    )
    out = image_dhash(df).collect()
    assert out[0]["dhash"] is None


def _pcm_wav(rate=8000, freq=440, n=4000, channels=1, amp=0.5):
    """Real sine-wave PCM16 WAV bytes."""
    t = np.arange(n) / rate
    mono = (amp * np.sin(2 * np.pi * freq * t) * 32767).astype("<i2")
    if channels == 2:
        frames = np.stack([mono, mono], axis=1).tobytes()
    else:
        frames = mono.tobytes()
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(frames)
    return buf.getvalue()


def test_decode_audio_real_pcm(spark):
    from csp_gateway_spark.operators.multimodal import decode_audio

    df = spark.createDataFrame(
        [(1, _pcm_wav()), (2, _pcm_wav(channels=2))], "media_id long, content binary"
    )
    out = {r["media_id"]: r for r in decode_audio(df).collect()}
    assert out[1]["sample_rate"] == 8000
    assert len(out[1]["samples"]) == 4000
    # stereo averaged to mono: identical channels -> same waveform
    assert out[2]["samples"][:10] == pytest.approx(out[1]["samples"][:10], abs=1e-4)
    assert max(out[1]["samples"]) == pytest.approx(0.5, abs=0.01)


def test_audio_features_sine_statistics(spark):
    from csp_gateway_spark.operators.multimodal import audio_features

    df = spark.createDataFrame(
        [(1, _pcm_wav(rate=8000, freq=440, n=8000, amp=0.5)), (2, b"not audio at all")],
        "media_id long, content binary",
    )
    out = {r["media_id"]: r for r in audio_features(df).collect()}
    a = out[1]
    assert a["duration_s"] == pytest.approx(1.0)
    # sine RMS = amp/sqrt(2); ZCR = 2*freq/rate
    assert a["rms"] == pytest.approx(0.5 / np.sqrt(2), rel=0.01)
    assert a["zcr"] == pytest.approx(2 * 440 / 8000, rel=0.05)
    assert out[2]["rms"] is None and out[2]["n_samples"] == 0


def test_decode_audio_non_wav_raises_without_fake(spark):
    from csp_gateway_spark.operators.multimodal import decode_audio

    df = spark.createDataFrame([(1, b"ID3 mp3-ish")], "media_id long, content binary")
    import py4j

    with pytest.raises(Exception):
        decode_audio(df).collect()
    # fake path still deterministic
    out = decode_audio(df, fake=True).collect()
    assert len(out[0]["samples"]) == 64
