"""JSON field extraction over string columns — the web-data staple
(event props, API payloads) the reference's scan layer leaves to
DataFusion's json functions.

Fast path: FLAT scalar fields are pulled with ONE vectorized RE2 pass
per batch (`pc.extract_regex`), no per-row Python and no JSON parser in
the hot loop. This intentionally supports the overwhelmingly common
shape (`{"k": 1, "name": "x", ...}` — one level, scalar values) and
REJECTS loudly anything it cannot prove flat-scalar rather than
silently mis-parsing: a document where the field value is an object,
array, or contains an escaped quote falls back to Python ``json.loads``
for JUST those rows (mask-selected, so a clean corpus never pays it).
"""

from __future__ import annotations

import json as _json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_NUM = r"-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?"
# string values without escapes take the regex; escaped ones fall back
_STR = r'[^"\\]*'


def extract_json_field(
    ds: ray.data.Dataset,
    col: str,
    field: str,
    kind: str = "number",
    out_col: str | None = None,
) -> ray.data.Dataset:
    """Add ``out_col`` (default ``field``) extracted from the JSON text
    in ``col``. ``kind``: "number" (float64; integers parse exactly) or
    "string". Missing key / null JSON -> NULL. Rows whose value the
    flat-scalar regex cannot capture (escapes, nested values) are
    re-parsed with json.loads — correctness everywhere, vectorized
    speed on the common shape."""
    if kind not in ("number", "string"):
        raise ValueError(f"kind must be number|string, got {kind!r}")
    out_name = out_col or field
    import re as _re

    key = _re.escape(_json.dumps(field))
    if kind == "number":
        pattern = f"{key}\\s*:\\s*(?P<v>{_NUM})"
    else:
        pattern = f'{key}\\s*:\\s*"(?P<v>{_STR})"'
    # a row needs the slow path if the key exists but the fast regex
    # missed it (e.g. value is an object/array/escaped string)
    key_pattern = f"{key}\\s*:"

    def ex(batch: pa.Table) -> pa.Table:
        s = batch.column(col)
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        if pa.types.is_null(s.type):  # all-null block infers null type
            s = s.cast(pa.string())
        m = pc.extract_regex(s, pattern)
        vals = pc.struct_field(m, "v")
        has_key = pc.match_substring_regex(s, key_pattern)
        # the regex scans RAW text, so two shapes can make it match the
        # wrong occurrence even though it captured something: a nested
        # object carrying the same key ({"a": {"k": 1}, "k": 2} — the
        # nested "k": 1 matches first), and an escaped-quote string
        # value containing '"k":' text. Both are detectable cheaply
        # (>1 '{', or any backslash) and routed to json.loads; flat
        # escape-free documents — the common shape — never pay it.
        risky = pc.or_kleene(
            pc.greater(pc.count_substring(s, "{"), 1),
            pc.match_substring(s, "\\"),
        )
        missed = pc.and_kleene(has_key, pc.or_kleene(pc.is_null(vals), risky))
        if pc.any(missed).as_py():
            idx = np.flatnonzero(
                pc.fill_null(missed, False).to_numpy(zero_copy_only=False)
            )
            py = vals.to_pylist()
            for i in idx:
                try:
                    v = _json.loads(s[int(i)].as_py()).get(field)
                except (ValueError, TypeError):
                    v = None
                if kind == "number":
                    py[int(i)] = repr(v) if isinstance(v, (int, float)) and not isinstance(v, bool) else None
                else:
                    py[int(i)] = v if isinstance(v, str) else None
            vals = pa.array(py, pa.string())
        if kind == "number":
            out_vals = pc.cast(vals, pa.float64())
        else:
            out_vals = vals
        return batch.append_column(out_name, out_vals)

    return ds.map_batches(ex, batch_format="pyarrow")
