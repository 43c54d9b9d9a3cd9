"""FSST round-trip tests (SURVEY.md §2.3 E16): symbol-table training,
escape handling, row-boundary independence, serialization."""

import numpy as np
import pytest

from datafusion_orc_ray.codecs import fsst

rng = np.random.default_rng(42)


def _concat(rows: list[bytes]):
    data = np.frombuffer(b"".join(rows), dtype=np.uint8)
    offs = np.concatenate([[0], np.cumsum([len(r) for r in rows])]).astype(np.int64)
    return data, offs


def _roundtrip(rows: list[bytes], table=None):
    data, offs = _concat(rows)
    if table is None:
        table = fsst.train(data[:32768].tobytes())
    enc, row_lens = fsst.encode(table, data, offs)
    assert int(row_lens.sum()) == len(enc)
    dec = fsst.decode(table, enc)
    assert np.array_equal(dec, data)
    return len(enc), data.size


VOCAB = ["the ", "quick ", "brown ", "fox ", "http", "://", "www.", ".com/"]


def test_text_roundtrip_and_compression():
    rows = ["".join(rng.choice(VOCAB, rng.integers(3, 40)).tolist()).encode() for _ in range(2000)]
    enc_size, raw_size = _roundtrip(rows)
    assert enc_size < raw_size / 2  # must actually compress structured text


def test_empty_rows_and_unicode():
    rows = [b"", b"a", "大熊和奏 🤔".encode(), b"", b"zz" * 300]
    _roundtrip(rows)


def test_all_256_bytes_and_random():
    rows = [bytes(range(256)), rng.integers(0, 256, 5000).astype(np.uint8).tobytes()]
    _roundtrip(rows)


def test_escape_heavy_sequences():
    table = fsst.SymbolTable([b"A"])
    for payload in [
        b"AB",
        b"ABBBA" + bytes([255, 255, 255, 65, 255]),
        bytes([255] * 7) + b"A",
        bytes([255, 65, 255]),
        b"BA" + bytes([255]),
        bytes([255]) * 2,
    ]:
        _roundtrip([payload], table)


def test_long_rows_parse_chunking():
    rows = [(" ".join(rng.choice(VOCAB, 3000).tolist())).encode() for _ in range(20)]
    _roundtrip(rows)


def test_symbol_table_serialization():
    rows = ["".join(rng.choice(VOCAB, 20).tolist()).encode() for _ in range(200)]
    data, offs = _concat(rows)
    table = fsst.train(data.tobytes())
    rt = fsst.SymbolTable.from_bytes(table.to_bytes())
    assert rt.symbols == table.symbols
    enc, _ = fsst.encode(table, data, offs)
    assert np.array_equal(fsst.decode(rt, enc), data)


def test_row_boundaries_never_crossed():
    # encoding [ab][cd] then decoding must split exactly at offset 2
    table = fsst.train(b"abcdabcdabcd")
    data, offs = _concat([b"ab", b"cd"])
    enc, row_lens = fsst.encode(table, data, offs)
    assert row_lens.size == 2
    # decode row 1 alone from its slice — row independence
    first = fsst.decode(table, enc[: int(row_lens[0])])
    assert first.tobytes() == b"ab"
