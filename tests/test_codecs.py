"""Stdlib media codecs (functions/codecs.py): PNG chunk/inflate/
unfilter and WAV PCM decode, round-tripped bit-exactly against the
module's own encoders AND against independently-constructed payloads
(every PNG filter type, hand-filtered in this test), then driven
through the Spark decode operators end-to-end."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from hunt_spark.functions.codecs import (
    PNG_MAGIC,
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
    sniff_format,
)


# ---- PNG ----------------------------------------------------------------


@given(
    arrays(
        np.uint8,
        st.tuples(
            st.integers(1, 12), st.integers(1, 12), st.sampled_from([1, 2, 3, 4])
        ),
    )
)
@settings(max_examples=60, deadline=None)
def test_png_roundtrip_all_channel_counts(img):
    out = decode_png(encode_png(img))
    assert out.shape == img.shape
    assert (out == img).all()


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data)) + ctype + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)


def _png_with_filter(img: np.ndarray, ftype: int) -> bytes:
    """Independent PNG writer applying one filter type to every row —
    the inverse transform the decoder must undo. Written from the PNG
    spec, NOT from codecs.py, so decoder bugs can't self-verify."""
    h, w, ch = img.shape
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int64)
    for y in range(h):
        cur = img[y].reshape(-1).astype(np.int64)
        raw.append(ftype)
        for x in range(w * ch):
            a = int(cur[x - ch]) if x >= ch else 0
            b = int(prev[x])
            c = int(prev[x - ch]) if x >= ch else 0
            pred = {0: 0, 1: a, 2: b, 3: (a + b) // 2, 4: _paeth(a, b, c)}[
                ftype
            ]
            raw.append((int(cur[x]) - pred) & 0xFF)
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, {3: 2}.get(ch, {1: 0, 2: 4, 3: 2, 4: 6}[ch]), 0, 0, 0)
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_decodes_every_filter_type(ftype):
    rng = np.random.default_rng(ftype + 7)
    img = rng.integers(0, 256, size=(9, 7, 3), dtype=np.uint8)
    out = decode_png(_png_with_filter(img, ftype))
    assert (out == img).all()


def test_png_rejects_garbage_and_truncation():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    good = encode_png(np.zeros((4, 4, 3), dtype=np.uint8))
    with pytest.raises(ValueError):
        decode_png(good[: len(good) // 2])  # cut mid-IDAT
    # losing only the IEND trailer is tolerated (the pixel data is
    # complete) — real-world truncated-at-the-tail files decode
    assert decode_png(good[:-12]).shape == (4, 4, 3)


# ---- WAV ----------------------------------------------------------------


@pytest.mark.parametrize("width,channels", [(1, 1), (2, 1), (2, 2), (4, 2)])
def test_wav_roundtrip(width, channels):
    t = np.linspace(0, 1, 800)
    x = np.stack([np.sin(2 * np.pi * (220 * (c + 1)) * t)
                  for c in range(channels)], axis=1)
    dec, rate = decode_wav(encode_wav(x, rate=8000, width=width))
    assert rate == 8000 and dec.shape == x.shape
    # quantization tolerance scales with sample width
    # tolerance = quantization step + the asymmetric (2^k - 1 encode vs
    # 2^k decode) scale + float32 output precision
    tol = {1: 1 / 64, 2: 1 / 10000, 4: 1e-6}[width]
    assert np.abs(dec - x).max() <= tol


def test_wav_rejects_garbage():
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxWAVEfmt corrupted")


def test_sniff_format():
    assert sniff_format(encode_png(np.zeros((2, 2), dtype=np.uint8))) == "png"
    assert sniff_format(encode_wav(np.zeros(16))) == "wav"
    assert sniff_format(b"\xff\xd8\xff jpeg-ish") == "unknown"


# ---- Spark decode operators over real payloads ---------------------------


def test_spark_decode_image_and_audio_real_path(spark):
    from hunt_spark.operators import multimodal as mm
    from hunt_spark.operators.multimodal import _audio_features, _image_features

    rng = np.random.default_rng(3)
    png1 = encode_png(rng.integers(0, 256, (16, 16, 3), dtype=np.uint8))
    png2 = encode_png(np.full((8, 24, 4), 200, dtype=np.uint8))
    wav = encode_wav(np.sin(np.linspace(0, 40, 2000)))
    rows = [(1, bytearray(png1)), (2, bytearray(png2)),
            (3, bytearray(b"corrupt blob")), (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r["features"]
           for r in mm.decode_image(df, dim=16).collect()}
    assert got[3] is None and got[4] is None
    for doc_id, payload in ((1, png1), (2, png2)):
        want = _image_features(payload, 16)
        assert np.allclose(got[doc_id], want, atol=1e-6)
    # pooled luma is a real image statistic: the uniform-200 RGBA image
    # pools to exactly 200/255 everywhere
    assert np.allclose(got[2], 200.0 / 255.0, atol=1e-6)

    adf = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(png1))],
        "doc_id long, payload binary",
    )
    agot = {r["doc_id"]: r["features"]
            for r in mm.decode_audio(adf, dim=8).collect()}
    assert np.allclose(agot[1], _audio_features(wav, 8), atol=1e-6)
    assert agot[2] is None  # a PNG is not decodable audio
    # RMS of a full-scale sine ~ 1/sqrt(2)
    assert abs(float(np.mean(agot[1])) - 1 / np.sqrt(2)) < 0.05


def test_decode_png_lying_ihdr_length_raises_valueerror():
    """An IHDR chunk declaring a length != 13 used to escape as
    struct.error, which multimodal._decode_op's ValueError-only catch
    would not contain — one corrupt blob would kill the whole job."""
    import struct as _struct
    import zlib as _zlib

    from hunt_spark.functions.codecs import PNG_MAGIC, decode_png

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            _struct.pack(">I", len(data)) + ctype + data
            + _struct.pack(">I", _zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    bad = (
        PNG_MAGIC
        + chunk(b"IHDR", _struct.pack(">IIBBBB", 1, 1, 8, 0, 0, 0))  # 12 bytes
        + chunk(b"IDAT", _zlib.compress(b"\x00\x00"))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_png(bad)
