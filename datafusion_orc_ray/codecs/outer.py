"""Outer (general-purpose) block compression for encoded streams.

Plays the role of ORC's stream compression framing (SURVEY.md §2.3 E1:
the reference fixtures use SNAPPY with 3-byte chunk headers and an
"incompressible -> stored raw" rule). We keep the capability — every
stripe stream may carry an outer codec, incompressible streams stay raw
— via pyarrow's C-level compressors, selected per stream by a sampled
trial (E17).

Framing: [codec_id u8][uvarint uncompressed_len][payload].
"""

from __future__ import annotations

import pyarrow as pa

from .bitpack import read_uvarint, write_uvarint

NONE = 0
ZSTD = 1
LZ4 = 2
SNAPPY = 3
GZIP = 4

_NAMES = {NONE: "none", ZSTD: "zstd", LZ4: "lz4", SNAPPY: "snappy", GZIP: "gzip"}
_PA_NAME = {ZSTD: "zstd", LZ4: "lz4", SNAPPY: "snappy", GZIP: "gzip"}

_SAMPLE = 65536
_MIN_GAIN = 0.95  # keep compression only if it saves >=5%


def outer_name(codec_id: int) -> str:
    return _NAMES[codec_id]


def compress(buf: bytes, codec_id: int) -> bytes:
    """Wrap ``buf`` with outer framing using ``codec_id`` (no trial)."""
    if codec_id == NONE:
        return bytes([NONE]) + write_uvarint(len(buf)) + buf
    payload = pa.Codec(_PA_NAME[codec_id]).compress(buf, asbytes=True)
    return bytes([codec_id]) + write_uvarint(len(buf)) + payload


def compress_auto(buf: bytes, codec_id: int = ZSTD) -> bytes:
    """Compress with ``codec_id`` unless a sampled trial shows it does not
    pay (incompressible streams are stored raw, as in the reference's
    isOriginal chunks)."""
    if len(buf) < 64:
        return compress(buf, NONE)
    if len(buf) > 4 * _SAMPLE:
        sample = buf[:_SAMPLE]
        trial = pa.Codec(_PA_NAME[codec_id]).compress(sample, asbytes=True)
        if len(trial) > _MIN_GAIN * len(sample):
            return compress(buf, NONE)
    out = compress(buf, codec_id)
    if len(out) >= len(buf) + 11:
        return compress(buf, NONE)
    return out


def decompress(buf: bytes) -> bytes:
    codec_id = buf[0]
    raw_len, pos = read_uvarint(buf, 1)
    payload = buf[pos:]
    if codec_id == NONE:
        return bytes(payload)
    return pa.Codec(_PA_NAME[codec_id]).decompress(payload, raw_len, asbytes=True)
