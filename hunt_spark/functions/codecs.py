"""Pure-stdlib media codecs for the multimodal decode kernels.

The sandbox has no PIL/libvips/soundfile, but two real formats are
fully decodable with the standard library alone:

- **PNG** (non-interlaced, 8-bit gray/RGB/gray+alpha/RGBA): chunk
  parse + zlib inflate + scanline unfilter (the complete filter set
  None/Sub/Up/Average/Paeth per the PNG spec), vectorized per row
  with numpy.
- **WAV** (PCM 8/16/32-bit): stdlib ``wave`` header parse + numpy
  frombuffer, normalized to float32 in [-1, 1].

Encoders for both exist so tests can generate payloads and round-trip
them bit-exactly. Formats beyond these (JPEG, MP3, H.264, ...) need
external codec libraries and keep the declared NotImplementedError in
operators/multimodal.py — the boundary is now "exotic codec", not
"any decode at all".
"""

from __future__ import annotations

import struct
import wave
import zlib
from io import BytesIO

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
WAV_MAGIC = b"RIFF"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # PNG color_type -> samples/pixel


def sniff_format(payload: bytes) -> str:
    """'png' | 'wav' | 'unknown' by magic bytes (what a demuxer's
    container probe does)."""
    if payload[:8] == PNG_MAGIC:
        return "png"
    if payload[:4] == WAV_MAGIC and payload[8:12] == b"WAVE":
        return "wav"
    return "unknown"


# ---- PNG ----------------------------------------------------------------


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array of shape (height, width, channels).

    Supports bit depth 8, color types 0/2/4/6, interlace 0 — i.e.
    every PNG ``encode_png`` can produce plus the common baseline
    subset in the wild. Raises ValueError on anything else (a corrupt
    or exotic payload must be detectable, not mis-decoded)."""
    if payload[:8] != PNG_MAGIC:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            # a lying IHDR length passes the truncation check above but
            # would raise struct.error (NOT ValueError) from unpack,
            # escaping callers' documented corrupt-payload handling
            if length != 13:
                raise ValueError(f"bad PNG IHDR length {length}")
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG (depth={depth}, interlace={interlace})"
        )
    ch = _CHANNELS.get(color_type)
    if ch is None:
        raise ValueError(f"unsupported PNG color type {color_type}")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt PNG IDAT stream: {e}") from e
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline data has wrong length")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        row_off = y * (stride + 1)
        ftype = raw[row_off]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=row_off + 1
        ).copy()
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up
            cur = line + prev
        elif ftype in (1, 3, 4):
            # Sub/Average/Paeth depend on the just-reconstructed left
            # pixel -> sequential in x (vector in channels via `ch`
            # stride); rows stay O(stride) numpy ops for 0/2
            cur = line
            for x in range(stride):
                a = int(cur[x - ch]) if x >= ch else 0
                b = int(prev[x])
                if ftype == 1:
                    cur[x] = (int(line[x]) + a) & 0xFF
                elif ftype == 3:
                    cur[x] = (int(line[x]) + (a + b) // 2) & 0xFF
                else:
                    c = int(prev[x - ch]) if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (
                        b if pb <= pc else c
                    )
                    cur[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = cur
        prev = out[y]
    return out.reshape(h, w, ch)


def encode_png(img: np.ndarray) -> bytes:
    """uint8 (h, w) or (h, w, channels in {1,2,3,4}) -> PNG bytes
    (filter 0 rows, one zlib-compressed IDAT)."""
    a = np.asarray(img, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
    if color_type is None:
        raise ValueError(f"unsupported channel count {ch}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 9))
        + chunk(b"IEND", b"")
    )


# ---- WAV ----------------------------------------------------------------


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (float32 samples of shape (n_frames, n_channels)
    in [-1, 1], sample_rate). PCM widths 1/2/4 bytes."""
    try:
        with wave.open(BytesIO(payload), "rb") as f:
            n_ch = f.getnchannels()
            width = f.getsampwidth()
            rate = f.getframerate()
            frames = f.readframes(f.getnframes())
    except (wave.Error, EOFError) as e:
        raise ValueError(f"not a decodable WAV: {e}") from e
    if width == 1:  # unsigned 8-bit
        x = np.frombuffer(frames, dtype=np.uint8).astype(np.float32)
        x = (x - 128.0) / 128.0
    elif width == 2:
        x = np.frombuffer(frames, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(frames, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    return x.reshape(-1, n_ch), rate


def encode_wav(
    samples: np.ndarray, rate: int = 16000, width: int = 2
) -> bytes:
    """float samples in [-1, 1], shape (n,) or (n, channels) -> PCM
    WAV bytes."""
    a = np.asarray(samples, dtype=np.float64)
    if a.ndim == 1:
        a = a[:, None]
    if width == 2:
        pcm = np.clip(np.round(a * 32767.0), -32768, 32767).astype("<i2")
    elif width == 4:
        pcm = np.clip(
            np.round(a * 2147483647.0), -2147483648, 2147483647
        ).astype("<i4")
    elif width == 1:
        pcm = np.clip(np.round(a * 127.0) + 128, 0, 255).astype(np.uint8)
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    buf = BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(a.shape[1])
        f.setsampwidth(width)
        f.setframerate(rate)
        f.writeframes(pcm.tobytes())
    return buf.getvalue()
