"""Delta + varbyte (LEB128) posting compression.

The reference writes every posting integer as a 7-bit-continuation
varint and front-codes terms (hunt: Hunt/IO/Write.hs:87-103,
Hunt/SegmentIndex/Directory/TermInfos.hs:237-255,316-318). On Spark,
parquet's DELTA_BINARY_PACKED/RLE already compress doc-id-sorted
postings; this module provides the *explicit* delta/varbyte artifact
the north rule asks for — a ``binary`` column packed by a vectorized
numpy kernel (no per-row Python loops over postings).

Encoding of a sorted int64 list: delta (first value absolute) then
LEB128 per value, concatenated.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BinaryType


def _varbyte_pack_flat(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """LEB128-pack an array of non-negative uint64s, vectorized.

    Returns (flat uint8 buffer, per-value byte widths) so callers can
    slice per-group byte ranges out of one whole-batch pack (the
    Arrow-native blocks kernel packs every group of a batch in a single
    call and derives group boundaries from cumulative widths).
    """
    v = values.astype(np.uint64, copy=False)
    if len(v) == 0:
        return np.empty(0, dtype=np.uint8), np.empty(0, dtype=np.int64)
    nbits = np.zeros(len(v), dtype=np.int64)
    tmp = v.copy()
    while True:
        alive = tmp > 0
        if not alive.any():
            break
        nbits[alive] += 1
        tmp >>= np.uint64(7)
    widths = np.maximum(nbits, 1)
    offsets = np.concatenate(([0], np.cumsum(widths)))
    out = np.zeros(offsets[-1], dtype=np.uint8)
    max_w = int(widths.max())
    shifted = v.copy()
    for j in range(max_w):
        mask = widths > j
        idx = offsets[:-1][mask] + j
        byte = (shifted[mask] & np.uint64(0x7F)).astype(np.uint8)
        cont = (widths[mask] - 1 > j).astype(np.uint8) << 7
        out[idx] = byte | cont
        shifted >>= np.uint64(7)
    return out, widths


def _varbyte_pack(values: np.ndarray) -> bytes:
    """LEB128-pack an array of non-negative int64s, vectorized."""
    out, _widths = _varbyte_pack_flat(np.asarray(values))
    return out.tobytes()


def _varbyte_unpack(buf: bytes) -> np.ndarray:
    if not buf:
        return np.array([], dtype=np.int64)
    b = np.frombuffer(buf, dtype=np.uint8)
    is_last = (b & 0x80) == 0
    ends = np.flatnonzero(is_last)
    starts = np.concatenate(([0], ends[:-1] + 1))
    out = np.zeros(len(ends), dtype=np.uint64)
    widths = ends - starts + 1
    max_w = int(widths.max())
    for j in range(max_w):
        mask = widths > j
        idx = starts[mask] + j
        out[mask] |= (b[idx].astype(np.uint64) & np.uint64(0x7F)) << np.uint64(7 * j)
    return out.astype(np.int64)


def delta_varbyte_encode(sorted_values: list[int] | np.ndarray) -> bytes:
    """Delta-encode a sorted int64 list, then varbyte-pack.

    Deltas are computed in modular uint64 arithmetic: sorted int64
    values (xxhash64 doc ids span the full signed range) can differ by
    more than int64 max, but the true gap always fits in [0, 2^64), so
    wrap-around subtraction is exact. The first value is stored as its
    two's-complement uint64 image.
    """
    a = np.asarray(sorted_values, dtype=np.int64)
    if len(a) == 0:
        return b""
    if (a[1:] < a[:-1]).any():
        raise ValueError("delta_varbyte_encode requires sorted input")
    au = a.astype(np.uint64)
    deltas = np.empty(len(au), dtype=np.uint64)
    deltas[0] = au[0]
    np.subtract(au[1:], au[:-1], out=deltas[1:])  # mod-2^64 wrap is exact
    return _varbyte_pack(deltas)


def delta_varbyte_decode(buf: bytes) -> np.ndarray:
    deltas = _varbyte_unpack(buf).astype(np.uint64)
    if len(deltas) == 0:
        return deltas.astype(np.int64)
    with np.errstate(over="ignore"):
        return np.cumsum(deltas, dtype=np.uint64).astype(np.int64)

