"""Value-bytes codecs for string/binary columns: RAW vs FSST.

The per-column-chunk choice (SURVEY.md §2.3 E8/E16/E17) between storing
the concatenated UTF-8/byte buffer raw (ORC DIRECT_V2 DATA stream
semantics, fixture evidence: alltypes cols 9,10) or FSST-compressed is
made here by a sampled trial; the outer general-purpose codec is layered
on top by the stripe writer either way.

Framing: [bytes_codec u8] + payload
  RAW : payload = the buffer
  FSST: payload = [uvarint symtab_len][symtab][codes]
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import fsst
from .bitpack import read_uvarint, write_uvarint

BYTES_RAW = 0
BYTES_FSST = 1

_NAMES = {BYTES_RAW: "raw", BYTES_FSST: "fsst"}

_TRAIN_SAMPLE = 32768
_TRIAL_SAMPLE = 65536


def bytes_codec_name(codec_id: int) -> str:
    return _NAMES[codec_id]


def choose(data: np.ndarray, row_offsets: np.ndarray, table: fsst.SymbolTable | None = None):
    """Sampled trial: returns (codec_id, trained_table_or_None, est_ratio).

    The decision compares FINAL stream sizes — i.e. after the outer
    general-purpose codec the stripe writer will apply — because FSST
    only earns its decode state when fsst+outer beats raw+outer (long
    documents: outer zstd alone usually wins; short repetitive strings
    like urls: FSST wins). A caller holding a cached per-partition table
    (the encoder actor) passes it in; it is re-validated on this chunk's
    sample before reuse, so drifting data retrains instead of bloating
    (E16)."""
    n = int(data.size)
    if n < 64:
        return BYTES_RAW, None, 1.0
    sample_end = int(np.searchsorted(row_offsets, min(n, _TRIAL_SAMPLE)))
    sample_end = max(1, min(sample_end, row_offsets.size - 1))
    s_data = data[: row_offsets[sample_end]]
    s_offsets = row_offsets[: sample_end + 1]
    if table is None:
        table = fsst.train(s_data[:_TRAIN_SAMPLE].tobytes())
    enc, _ = fsst.encode(table, s_data, s_offsets)
    zstd = pa.Codec("zstd")
    raw_final = len(zstd.compress(s_data.tobytes(), asbytes=True))
    fsst_final = len(zstd.compress(enc, asbytes=True)) + len(table.to_bytes())
    if fsst_final >= 0.98 * raw_final:
        return BYTES_RAW, None, s_data.size / max(raw_final, 1)
    return BYTES_FSST, table, s_data.size / max(fsst_final, 1)


def encode(
    data: np.ndarray,
    row_offsets: np.ndarray,
    codec_id: int,
    table: fsst.SymbolTable | None,
):
    """Returns the stream payload. RAW returns ``data`` itself (zero copy
    — the outer codec layer consumes buffer views); the codec id lives in
    the stream meta, not a payload prefix."""
    if codec_id == BYTES_RAW:
        return data
    assert table is not None
    enc, _ = fsst.encode(table, data, row_offsets)
    tab = table.to_bytes()
    return write_uvarint(len(tab)) + tab + enc


def decode(buf: bytes, codec_name: str) -> np.ndarray:
    if codec_name == "raw":
        return np.frombuffer(buf, dtype=np.uint8)
    if codec_name == "fsst":
        tab_len, pos = read_uvarint(buf, 0)
        table = fsst.SymbolTable.from_bytes(buf[pos : pos + tab_len])
        return fsst.decode(table, buf[pos + tab_len :])
    raise ValueError(f"unknown bytes codec {codec_name}")
