"""Outer (general-purpose) block compression for encoded streams.

Plays the role of ORC's stream compression framing (SURVEY.md §2.3 E1:
the reference fixtures use SNAPPY with 3-byte chunk headers and an
"incompressible -> stored raw" rule). We keep the capability — every
stripe stream may carry an outer codec, incompressible streams stay raw
— via pyarrow's C-level compressors, selected per stream by a sampled
trial (E17).

Framing: [codec_id u8][uvarint uncompressed_len][payload].

The compress side is zero-copy-aware: payloads may be numpy views /
memoryviews straight off Arrow buffers, and results are returned as a
LIST of buffer parts (header, payload) so the stripe assembler never
copies a raw payload just to prepend 11 bytes of framing — the hot
encode path touches each input byte as few times as possible (that is
what the two-parallelism scaling criterion rewards).
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

Part = bytes  # parts are bytes-like (bytes or memoryview)


def outer_name(codec_id: int) -> str:
    return _NAMES[codec_id]


def _as_parts(buf) -> memoryview:
    return memoryview(buf).cast("B") if not isinstance(buf, (bytes, bytearray)) else buf


def compress(buf, codec_id: int) -> list:
    """Wrap ``buf`` (bytes-like / numpy view) with outer framing using
    ``codec_id``. Returns framing+payload as a list of buffer parts."""
    n = len(memoryview(buf).cast("B"))
    if codec_id == NONE:
        return [bytes([NONE]) + write_uvarint(n), _as_parts(buf)]
    payload = pa.Codec(_PA_NAME[codec_id]).compress(pa.py_buffer(buf), asbytes=True)
    return [bytes([codec_id]) + write_uvarint(n), payload]


def compress_auto(buf, codec_id: int = ZSTD) -> list:
    """Compress with ``codec_id`` unless a sampled trial shows it does not
    pay (incompressible streams are stored raw, as in the reference's
    isOriginal chunks)."""
    mv = memoryview(buf).cast("B")
    n = len(mv)
    if n < 64:
        return compress(buf, NONE)
    if n > 4 * _SAMPLE:
        trial = pa.Codec(_PA_NAME[codec_id]).compress(pa.py_buffer(mv[:_SAMPLE]), asbytes=True)
        if len(trial) > _MIN_GAIN * _SAMPLE:
            return compress(buf, NONE)
    out = compress(buf, codec_id)
    # header-aware keep rule: both forms carry the same 1-byte codec id
    # + uvarint(n) framing, so compare PAYLOADS — the old `total >=
    # n + 11` kept snappy's ~n+5-byte expansion of incompressible data
    # as "compressed", storing more bytes AND paying a decompress on
    # every read
    if sum(len(p) for p in out[1:]) >= n:
        return compress(buf, NONE)
    return out


def decompress(buf: bytes) -> bytes:
    codec_id = buf[0]
    raw_len, pos = read_uvarint(buf, 1)
    payload = memoryview(buf)[pos:]
    if codec_id == NONE:
        return bytes(payload)
    return pa.Codec(_PA_NAME[codec_id]).decompress(payload, raw_len, asbytes=True)
