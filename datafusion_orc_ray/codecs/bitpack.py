"""Bit-level primitives: bit-packing, zigzag, varint.

Vectorized NumPy kernels used by every integer codec (SURVEY.md §2.3
E2-E5; reference semantics pinned by the ORC v1 spec streams observed in
/root/reference/tests/basic/data/*.orc stripe footers). No Ray
dependency — pure functions so they unit-test in microseconds.

All packing is MSB-first within a value and values are laid out
back-to-back in the bit stream (same convention as ORC bit-packed
DIRECT runs).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "bit_width",
    "pack_bits",
    "unpack_bits",
    "zigzag_encode",
    "zigzag_decode",
    "write_uvarint",
    "read_uvarint",
]


def bit_width(max_value: int) -> int:
    """Number of bits needed to represent ``max_value`` (an unsigned int)."""
    if max_value < 0:
        raise ValueError("bit_width takes an unsigned magnitude")
    return int(max_value).bit_length()


def pack_bits(values: np.ndarray, width: int) -> bytes:
    """Pack unsigned ``values`` (uint64) into ``width``-bit big-endian slots.

    width == 0 encodes an all-zeros array as zero bytes.
    """
    if width == 0:
        return b""
    if width > 64:
        raise ValueError(f"width {width} > 64")
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return b""
    # value -> low ceil(width/8) big-endian bytes -> keep low `width` bits
    nb = (width + 7) // 8
    lo_bytes = v.astype("<u8").view(np.uint8).reshape(n, 8)[:, nb - 1 :: -1]
    bits = np.unpackbits(np.ascontiguousarray(lo_bytes), axis=1)
    return np.packbits(bits[:, 8 * nb - width :].reshape(-1)).tobytes()


def unpack_bits(buf: bytes, width: int, n: int) -> np.ndarray:
    """Inverse of :func:`pack_bits`; returns uint64[n]."""
    if width == 0:
        return np.zeros(n, dtype=np.uint64)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    nb = (width + 7) // 8
    bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8), count=n * width)
    padded = np.zeros((n, 8 * nb), dtype=np.uint8)
    padded[:, 8 * nb - width :] = bits.reshape(n, width)
    be_bytes = np.packbits(padded, axis=1)  # n x nb, big-endian
    out = np.zeros((n, 8), dtype=np.uint8)
    out[:, :nb] = be_bytes[:, ::-1]  # little-endian placement
    return out.reshape(-1).view("<u8").astype(np.uint64)


def zigzag_encode(values: np.ndarray) -> np.ndarray:
    """int64 -> uint64 zigzag (0,-1,1,-2 -> 0,1,2,3). Wrap-safe."""
    v = np.ascontiguousarray(values, dtype=np.int64)
    u = v.view(np.uint64)
    sign = (v >> np.int64(63)).view(np.uint64)  # 0 or 0xFFFF...
    return (u << np.uint64(1)) ^ sign


def zigzag_decode(values: np.ndarray) -> np.ndarray:
    """uint64 zigzag -> int64."""
    u = np.ascontiguousarray(values, dtype=np.uint64)
    return ((u >> np.uint64(1)) ^ (np.uint64(0) - (u & np.uint64(1)))).view(np.int64)


def write_uvarint(value: int) -> bytes:
    """LEB128 unsigned varint (scalar — used only in headers)."""
    out = bytearray()
    v = int(value)
    if v < 0:
        raise ValueError("uvarint takes unsigned")
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def read_uvarint(buf: bytes, pos: int = 0) -> tuple[int, int]:
    """Returns (value, new_pos)."""
    shift = 0
    value = 0
    while True:
        b = buf[pos]
        pos += 1
        value |= (b & 0x7F) << shift
        if not b & 0x80:
            return value, pos
        shift += 7
