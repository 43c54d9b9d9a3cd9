"""Deterministic synthetic fixtures (FIXTURES.md F1-F3, seed=42).

F1 is the north-rule input table: Common-Crawl-style web pages
(url, warc_ts, html, text, lang) with Zipf-skewed hosts/langs and
html derived deterministically from text so the per-row invariant
"byte-identical extracted text per url" is checkable (BASELINE.json
input_hint). No external data.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SEED = 42
LANGS = ["en", "de", "fr", "es", "zh", "ja", "ru", "pt", "it", "nl"]
# fixed 500-word vocabulary (deterministic, no external data)
_CONSONANTS = list("bcdfghjklmnpqrstvwz")
_VOWELS = list("aeiou")


def _vocab(n_words: int = 500) -> list[str]:
    rng = np.random.default_rng(SEED + 1)
    words = []
    seen = set()
    while len(words) < n_words:
        syls = rng.integers(1, 4)
        w = "".join(
            _CONSONANTS[rng.integers(0, len(_CONSONANTS))] + _VOWELS[rng.integers(0, len(_VOWELS))]
            for _ in range(syls + 1)
        )
        if w not in seen:
            seen.add(w)
            words.append(w)
    return words


_CJK = ["大熊和奏", "斉藤朱夏", "鈴原希実", "🤔", "日本語テキスト", "中文文本"]


def webtext_table(n_rows: int, seed: int = SEED) -> pa.Table:
    """F1: (url, warc_ts, html, text, lang). Fully vectorized generation
    (pyarrow binary_join) so bench-scale tables (100k+ rows, ~1 GB)
    synthesize in seconds."""
    import pyarrow.compute as pc

    rng = np.random.default_rng(seed)
    vocab_pa = pa.array(_vocab(), pa.string())

    n_hosts = max(4, n_rows // 50)
    host_ids = np.minimum(rng.zipf(1.3, n_rows) - 1, n_hosts - 1)
    paths = [np.base_repr(i, 36).lower() for i in range(n_rows)]
    urls = [f"https://host{h}.example.org/{p}" for h, p in zip(host_ids.tolist(), paths)]

    base = np.datetime64("2026-01-01T00:00:00", "us").astype(np.int64)
    gaps = rng.integers(0, 120_000_000, n_rows)  # 0-120 s in micros
    warc_ts = (base + np.cumsum(gaps)).astype("datetime64[us]")

    lang_weights = np.array([0.55, 0.10, 0.08, 0.07, 0.05, 0.05, 0.04, 0.03, 0.02, 0.01])
    lang_idx = rng.choice(len(LANGS), n_rows, p=lang_weights)
    langs: list[str | None] = [LANGS[i] for i in lang_idx]
    for i in rng.choice(n_rows, max(1, n_rows // 100), replace=False):
        langs[i] = None

    # word-sampled text: flat word indices -> ListArray -> binary_join
    n_words_row = rng.integers(50, 2001, n_rows)
    offsets = np.concatenate([[0], np.cumsum(n_words_row)]).astype(np.int64)
    flat_idx = rng.integers(0, len(vocab_pa), int(offsets[-1]))
    words = vocab_pa.take(pa.array(flat_idx, pa.int64()))
    lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32() if offsets[-1] < 2**31 else pa.int64()), words)
    text = pc.binary_join(lists, " ")
    # multi-byte UTF-8 rows (mirrors reference fixture content)
    prefix = np.full(n_rows, "", dtype=object)
    for i in range(0, n_rows, 97):
        prefix[i] = _CJK[i % len(_CJK)] + " "
    text = pc.binary_join_element_wise(pa.array(prefix.tolist(), pa.string()), text, "")
    null_mask = np.zeros(n_rows, dtype=bool)
    null_mask[rng.choice(n_rows, max(1, n_rows // 50), replace=False)] = True
    text = pc.if_else(pa.array(null_mask), pa.scalar(None, pa.string()), text)

    html = pc.if_else(
        pa.array(null_mask),
        pa.scalar(None, pa.string()),
        pc.binary_join_element_wise("<html><body><p>", text, "</p></body></html>", ""),
    ).cast(pa.binary())

    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(warc_ts, type=pa.timestamp("us")),
            "html": html,
            "text": text,
            "lang": pa.array(langs, type=pa.string()),
        }
    )


def extract_text(html: bytes) -> bytes:
    """The (deterministic) inverse of F1's html derivation — used by the
    per-url byte-identity check."""
    return html[len(b"<html><body><p>") : -len(b"</p></body></html>")]


def alltypes_table() -> pa.Table:
    """F2: mirrors the reference alltypes fixture's adversarial content
    (/root/reference/tests/basic/data/alltypes.snappy.orc; golden values
    cited in the shim test src/lib.rs:194-207)."""
    import decimal

    D = decimal.Decimal
    rows = {
        "boolean": [None, True, False, True, False, True, False, None, True, False, None],
        "int8": [None, 0, 1, -1, 127, -128, 5, None, 7, -9, None],
        "int16": [None, 0, 1, -1, 32767, -32768, 5, None, 7, -9, None],
        "int32": [None, 0, 1, -1, 2147483647, -2147483648, 5, None, 7, -9, None],
        "int64": [None, 0, 1, -1, 9223372036854775807, -9223372036854775808, 5, None, 7, -9, None],
        "float32": [None, 0.0, 1.0, -1.0, float("inf"), float("-inf"), 3.1415927, None, 7.5, -9.25, None],
        "float64": [None, 0.0, 1.0, -1.0, float("inf"), float("-inf"), 3.141592653589793, None, 7.5, -9.25, None],
        "decimal": [None, D("0.00000"), D("1.00000"), D("-1.00000"), D("123456789.12345"), D("-999999999.99999"), D("5.00000"), None, D("7.00000"), D("-9.00000"), None],
        "binary": [None, b"", b"a", "大熊和奏".encode(), "🤔".encode(), b"\x00\x01\x02", b"x" * 100, None, b"bin", b"ary", None],
        "utf8": [None, "", "a", "大熊和奏", "斉藤朱夏", "鈴原希実", "🤔", None, "utf", "8", None],
        "date32": [None, "1970-01-01", "1969-12-31", "9999-12-31", "1582-10-15", "1582-10-16", "2000-01-01", None, "3000-12-31", "1900-01-01", None],
    }
    import datetime

    dates = [None if d is None else datetime.date.fromisoformat(d) for d in rows["date32"]]
    return pa.table(
        {
            "boolean": pa.array(rows["boolean"], pa.bool_()),
            "int8": pa.array(rows["int8"], pa.int8()),
            "int16": pa.array(rows["int16"], pa.int16()),
            "int32": pa.array(rows["int32"], pa.int32()),
            "int64": pa.array(rows["int64"], pa.int64()),
            "float32": pa.array(rows["float32"], pa.float32()),
            "float64": pa.array(rows["float64"], pa.float64()),
            "decimal": pa.array(rows["decimal"], pa.decimal128(15, 5)),
            "binary": pa.array(rows["binary"], pa.binary()),
            "utf8": pa.array(rows["utf8"], pa.string()),
            "date32": pa.array(dates, pa.date32()),
        }
    )


def nested_table(n_extra: int = 50) -> pa.Table:
    """F3: mirrors the reference map_list fixture row + generated variants
    (/root/reference/tests/basic/data/map_list.snappy.orc)."""
    rng = np.random.default_rng(SEED + 2)
    ids = [1]
    maps: list[list[tuple[str, str]] | None] = [[("zero", "0"), ("one", "1")]]
    lists: list[list[str | None] | None] = [["test", "blaze"]]
    strs: list[str | None] = ["blaze"]
    vocab = _vocab(50)
    for i in range(n_extra):
        ids.append(i + 2)
        if i % 11 == 3:
            maps.append(None)
        else:
            k = int(rng.integers(0, 5))
            maps.append([(f"k{j}", vocab[int(rng.integers(0, 50))]) for j in range(k)])
        if i % 7 == 2:
            lists.append(None)
        elif i % 5 == 1:
            lists.append([])
        else:
            ln = int(rng.integers(0, 20))
            lists.append([vocab[int(rng.integers(0, 50))] if j % 9 != 4 else None for j in range(ln)])
        strs.append(None if i % 13 == 5 else vocab[int(rng.integers(0, 50))])
    return pa.table(
        {
            "id": pa.array(ids, pa.int64()),
            "m": pa.array(maps, pa.map_(pa.string(), pa.string())),
            "l": pa.array(lists, pa.list_(pa.string())),
            "s": pa.array(strs, pa.string()),
        }
    )
