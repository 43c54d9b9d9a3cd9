"""Round-trip property tests for the codec kernels (SURVEY.md §5:
adversarial arrays — empty, single value, runs, monotonic, outliers,
2^63 boundaries)."""

import numpy as np
import pytest

from datafusion_orc_ray.codecs import integers as I
from datafusion_orc_ray.codecs.bitpack import (
    pack_bits,
    read_uvarint,
    unpack_bits,
    write_uvarint,
    zigzag_decode,
    zigzag_encode,
)

rng = np.random.default_rng(42)

INT_CASES = {
    "empty": np.empty(0, np.int64),
    "one": np.array([42], np.int64),
    "const": np.full(1000, -7, np.int64),
    "monotonic": np.cumsum(rng.integers(0, 120_000_000, 10_000)).astype(np.int64),
    "runs": np.repeat(rng.integers(-5, 5, 100), rng.integers(1, 50, 100)).astype(np.int64),
    "outliers": np.where(
        rng.random(5000) < 0.02,
        rng.integers(-(2**62), 2**62, 5000),
        rng.integers(0, 100, 5000),
    ).astype(np.int64),
    "extremes": np.array([-(2**63), 2**63 - 1, 0, -1, 1, -(2**63), 2**63 - 1], np.int64),
    "random_full_range": rng.integers(-(2**63), 2**63 - 1, 3000, dtype=np.int64),
    "neg_monotonic": -np.cumsum(rng.integers(0, 1000, 1000)).astype(np.int64),
    "alternating": np.tile([0, 2**40], 500).astype(np.int64),
}


@pytest.mark.parametrize("name", list(INT_CASES))
def test_int_roundtrip_every_codec(name):
    v = INT_CASES[name]
    for codec in I.estimate_sizes(v):
        buf = I.encode_ints_with(v, codec)
        assert np.array_equal(I.decode_ints(buf, v.size), v), I.codec_name(codec)


@pytest.mark.parametrize("name", list(INT_CASES))
def test_int_auto_select_roundtrip_and_estimates(name):
    v = INT_CASES[name]
    sizes = I.estimate_sizes(v)
    buf = I.encode_ints(v)
    assert np.array_equal(I.decode_ints(buf, v.size), v)
    # the selector's estimate for the chosen codec is byte-accurate (+/- varint slack)
    assert abs(sizes[buf[0]] - len(buf)) <= 4


@pytest.mark.parametrize("width", [0, 1, 3, 7, 8, 9, 13, 16, 24, 27, 33, 48, 63, 64])
def test_bitpack_widths(width):
    n = 1000
    hi = (1 << width) if width < 64 else (1 << 64)
    v = rng.integers(0, hi, n, dtype=np.uint64) if width else np.zeros(n, np.uint64)
    buf = pack_bits(v, width)
    assert len(buf) == (n * width + 7) // 8
    assert np.array_equal(unpack_bits(buf, width, n), v)


def test_zigzag():
    v = np.array([0, -1, 1, -2, 2, 2**62, -(2**63), 2**63 - 1], np.int64)
    zz = zigzag_encode(v)
    assert np.array_equal(zigzag_decode(zz), v)
    assert zz[0] == 0 and zz[1] == 1 and zz[2] == 2 and zz[3] == 3


def test_uvarint():
    for x in [0, 1, 127, 128, 300, 2**31, 2**63]:
        buf = write_uvarint(x)
        val, pos = read_uvarint(buf)
        assert val == x and pos == len(buf)
