"""FSST — Fast Static Symbol Table compression for string/binary columns.

Re-implementation (from the published FSST idea: a table of <=255 symbols of
1-8 bytes, greedy longest-match substitution to 1-byte codes, escape byte
0xFF for uncovered bytes) targeted by the north rule for url/text/html
bytes (SURVEY.md §2.3 E16). This is NOT a port of any implementation:
training is a small iterative merge loop on a sample; encoding is
vectorized NumPy — per-position longest-match via rolling window keys +
searchsorted, then a row-parallel greedy scan (one numpy step per emitted
symbol across all rows of the batch, so the Python-level loop count is
max-symbols-per-row, not total bytes).

The symbol table is decode state: it is serialized into the stripe footer
(never kept only in actor memory) — see stripe.py.
"""

from __future__ import annotations

import numpy as np

ESCAPE = 255
MAX_SYMBOLS = 255  # codes 0..254; 255 reserved for escape
MAX_SYMBOL_LEN = 8
PARSE_CHUNK = 1024  # parse-unit size; bounds the sequential depth of the
                    # scan. Larger chunks = fewer symbol-breaking unit
                    # boundaries (ratio 3.97 vs 3.60 at 512 on urls) at
                    # the cost of more sequential rounds per chunk.


class SymbolTable:
    """Immutable FSST symbol table with precomputed lookup structures.

    Longest-prefix matching uses one predecessor binary search over the
    zero-padded 8-byte symbol keys plus a fallback chain: the longest
    symbol matching window w is always on the longest-proper-prefix chain
    of the table's predecessor of w (any table entry between a matching
    prefix s-padded and w itself must start with s), so a match resolves
    in <= 8 vectorized chain steps instead of one probe per length."""

    __slots__ = ("symbols", "sym_lens", "sym_bytes", "pk", "pcodes", "plens", "pfall")

    def __init__(self, symbols: list[bytes]):
        if len(symbols) > MAX_SYMBOLS:
            raise ValueError("too many symbols")
        self.symbols = list(symbols)
        self.sym_lens = np.zeros(256, dtype=np.uint8)
        self.sym_bytes = np.zeros((256, MAX_SYMBOL_LEN), dtype=np.uint8)
        for code, s in enumerate(symbols):
            if not 1 <= len(s) <= MAX_SYMBOL_LEN:
                raise ValueError(f"bad symbol length {len(s)}")
            self.sym_lens[code] = len(s)
            self.sym_bytes[code, : len(s)] = np.frombuffer(s, dtype=np.uint8)
        # sorted padded keys + fallback (longest proper prefix) pointers
        order = sorted(
            range(len(symbols)),
            key=lambda c: (int.from_bytes(symbols[c] + b"\x00" * (8 - len(symbols[c])), "big"), len(symbols[c])),
        )
        self.pk = np.array(
            [int.from_bytes(symbols[c] + b"\x00" * (8 - len(symbols[c])), "big") for c in order],
            dtype=np.uint64,
        )
        self.pcodes = np.array(order, dtype=np.uint8)
        self.plens = np.array([len(symbols[c]) for c in order], dtype=np.int64)
        pos_of = {symbols[c]: i for i, c in enumerate(order)}
        fall = np.full(len(order), -1, dtype=np.int64)
        for i, c in enumerate(order):
            s = symbols[c]
            for cut in range(len(s) - 1, 0, -1):
                j = pos_of.get(s[:cut])
                if j is not None:
                    fall[i] = j
                    break
        self.pfall = fall

    # -- serialization (decode state travels in the stripe footer) --
    def to_bytes(self) -> bytes:
        out = bytearray([len(self.symbols)])
        out.extend(len(s) for s in self.symbols)
        for s in self.symbols:
            out.extend(s)
        return bytes(out)

    @classmethod
    def from_bytes(cls, buf: bytes) -> "SymbolTable":
        n = buf[0]
        lens = buf[1 : 1 + n]
        symbols = []
        pos = 1 + n
        for ln in lens:
            symbols.append(bytes(buf[pos : pos + ln]))
            pos += ln
        return cls(symbols)


def _parse_sample(table: SymbolTable, data: np.ndarray, keys8: np.ndarray):
    """Greedy-parse ``data`` with ``table`` (chunked like encode(), so the
    Python loop count is symbols-per-chunk, not total symbols). Returns
    (positions, lengths) of the emitted symbols in text order; escapes
    emit length 1."""
    n = data.size
    starts = np.arange(0, n, PARSE_CHUNK, dtype=np.int64)
    ends = np.minimum(starts + PARSE_CHUNK, n)
    p, e = starts.copy(), ends.copy()
    pos_parts, len_parts = [], []
    while p.size:
        _, ln = _probe(table, keys8[p], e - p)
        ln = np.where(ln == 0, 1, ln)  # escape -> single byte
        pos_parts.append(p.copy())
        len_parts.append(ln)
        p = p + ln
        alive = p < e
        p, e = p[alive], e[alive]
    P = np.concatenate(pos_parts)
    L = np.concatenate(len_parts)
    o = np.argsort(P, kind="stable")
    return P[o], L[o]


def _count_gains(keys8: np.ndarray, pos: np.ndarray, length: np.ndarray, weight_fn):
    """Vectorized frequency counting of the (position, length) substrings
    via their masked 8-byte window keys. Returns (keys, lens, gains)."""
    shift = np.uint64(8) * (np.uint64(MAX_SYMBOL_LEN) - length.astype(np.uint64))
    skey = keys8[pos] >> shift
    order = np.lexsort((length, skey))
    sk, sl = skey[order], length[order]
    new = np.concatenate([[True], (sk[1:] != sk[:-1]) | (sl[1:] != sl[:-1])])
    starts = np.flatnonzero(new)
    counts = np.diff(np.append(starts, sk.size))
    return sk[starts], sl[starts], weight_fn(counts, sl[starts])


def train(sample: bytes, generations: int = 4, max_symbols: int = MAX_SYMBOLS) -> SymbolTable:
    """Train a symbol table on ``sample`` (keep it <= ~32 KiB).

    Iterative scheme (same as the original dict-based loop, now fully
    vectorized on the _probe matcher): parse the sample greedily with the
    current table, count symbol and adjacent-pair frequencies, promote
    the highest-gain concatenations (gain = saved bytes = freq*(len-1),
    singles compete on escape-avoidance gain = freq)."""
    if not sample:
        return SymbolTable([])
    data = np.frombuffer(sample, dtype=np.uint8)
    keys8 = _window_keys(data)
    table = SymbolTable([bytes([int(b)]) for b in np.unique(data)][:max_symbols])
    for _gen in range(generations):
        P, L = _parse_sample(table, data, keys8)
        sym_k, sym_l, sym_g = _count_gains(
            keys8, P, L, lambda c, ln: c * np.maximum(ln - 1, 1)
        )
        # adjacent-pair candidates: contiguous emissions whose merged
        # length fits a symbol
        comb = L[:-1] + L[1:]
        adj = (P[1:] == P[:-1] + L[:-1]) & (comb <= MAX_SYMBOL_LEN)
        if adj.any():
            pair_k, pair_l, pair_g = _count_gains(
                keys8, P[:-1][adj], comb[adj], lambda c, ln: c * (ln - 1)
            )
            all_k = np.concatenate([sym_k, pair_k])
            all_l = np.concatenate([sym_l, pair_l])
            all_g = np.concatenate([sym_g, pair_g])
        else:
            all_k, all_l, all_g = sym_k, sym_l, sym_g
        # dedupe (key,len) keeping max gain, then top max_symbols by gain
        order = np.lexsort((-all_g, all_l, all_k))
        k_s, l_s, g_s = all_k[order], all_l[order], all_g[order]
        first = np.concatenate([[True], (k_s[1:] != k_s[:-1]) | (l_s[1:] != l_s[:-1])])
        k_u, l_u, g_u = k_s[first], l_s[first], g_s[first]
        top = np.argsort(-g_u, kind="stable")[:max_symbols]
        symbols = [
            int(k).to_bytes(MAX_SYMBOL_LEN, "big")[MAX_SYMBOL_LEN - int(ln):]
            for k, ln in zip(k_u[top], l_u[top])
        ]
        table = SymbolTable(symbols)
    return table


def _window_keys(data: np.ndarray) -> np.ndarray:
    """uint64 big-endian 8-byte window key at every position (zero padded).
    One materializing copy (the window gather) + an in-place byteswap —
    the astype(uint64) here used to be a second full-size copy."""
    n = data.size
    padded = np.concatenate([data, np.zeros(MAX_SYMBOL_LEN - 1, dtype=np.uint8)])
    windows = np.lib.stride_tricks.sliding_window_view(padded, MAX_SYMBOL_LEN)[:n]
    k = np.ascontiguousarray(windows).view(np.uint64).ravel()
    if not k.flags.writeable:  # tiny inputs: no copy was made above
        k = k.copy()
    k.byteswap(inplace=True)  # owned by the copy
    return k


def _probe(
    table: SymbolTable, keys8: np.ndarray, limit: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Longest-match (code, length) for the window keys in ``keys8``
    (length 0 = no match -> escape). ``limit`` = bytes remaining in the
    position's row — matches never cross row boundaries so each row stays
    independently parseable.

    One predecessor binary search, then the fallback chain (see
    SymbolTable docstring) resolves the longest valid prefix in <= 8
    shrinking vectorized steps."""
    m = keys8.size
    code = np.zeros(m, dtype=np.uint8)
    length_out = np.zeros(m, dtype=np.int64)
    if table.pk.size == 0 or m == 0:
        return code, length_out
    cur = np.searchsorted(table.pk, keys8, side="right").astype(np.int64) - 1
    unm = np.flatnonzero(cur >= 0)
    cur = cur[unm]
    while unm.size:
        plen = table.plens[cur]
        shift = (np.uint64(8) * (np.uint64(MAX_SYMBOL_LEN) - plen.view(np.uint64)))
        hit = ((keys8[unm] >> shift) == (table.pk[cur] >> shift)) & (plen <= limit[unm])
        hit_idx = unm[hit]
        code[hit_idx] = table.pcodes[cur[hit]]
        length_out[hit_idx] = plen[hit]
        miss = ~hit
        cur = table.pfall[cur[miss]]
        unm = unm[miss]
        alive = cur >= 0
        if not alive.all():
            cur = cur[alive]
            unm = unm[alive]
    return code, length_out


def encode(
    table: SymbolTable, data: np.ndarray, row_offsets: np.ndarray
) -> tuple[bytes, np.ndarray]:
    """Encode concatenated row bytes.

    ``data``: uint8 array (all rows back to back); ``row_offsets``:
    int64[n_rows+1] boundaries. Symbols never span row boundaries, which
    keeps rows independently parseable and lets the greedy scan run one
    vectorized step per emitted symbol across all rows.

    Returns (code_bytes, encoded_len_per_row int64[n_rows]).
    """
    data = np.ascontiguousarray(data, dtype=np.uint8)
    n_rows = row_offsets.size - 1
    if data.size == 0:
        return b"", np.zeros(n_rows, dtype=np.int64)
    keys8 = _window_keys(data)
    # split long rows into <=PARSE_CHUNK-byte parse units so the greedy scan
    # stays wide (one numpy step per symbol ACROSS units); unit boundaries
    # are invisible to decode, which re-splits by original row lengths.
    row_starts = row_offsets[:-1].astype(np.int64)
    row_ends = row_offsets[1:].astype(np.int64)
    lens = row_ends - row_starts
    pieces = np.maximum((lens + PARSE_CHUNK - 1) // PARSE_CHUNK, 1)
    unit_row = np.repeat(np.arange(n_rows, dtype=np.int64), pieces)
    total_units = int(pieces.sum())
    first_unit = np.concatenate([[0], np.cumsum(pieces)[:-1]])
    within = np.arange(total_units, dtype=np.int64) - np.repeat(first_unit, pieces)
    p = row_starts[unit_row] + within * PARSE_CHUNK
    ends = np.minimum(p + PARSE_CHUNK, row_ends[unit_row])
    rid = np.arange(total_units, dtype=np.int64)  # unit id; maps to row via unit_row
    alive = p < ends
    p, ends, rid = p[alive], ends[alive], rid[alive]
    rows_parts: list[np.ndarray] = []
    codes_parts: list[np.ndarray] = []
    lits_parts: list[np.ndarray] = []
    while p.size:
        c, ln = _probe(table, keys8[p], ends - p)
        esc = ln == 0
        if esc.any():
            c[esc] = ESCAPE
            ln[esc] = 1
            lits_parts.append(np.where(esc, data[p], 0).astype(np.uint8))
        else:
            lits_parts.append(np.zeros(p.size, dtype=np.uint8))
        rows_parts.append(rid)
        codes_parts.append(c)
        p = p + ln
        alive = p < ends
        if not alive.all():
            p, ends, rid = p[alive], ends[alive], rid[alive]
    R = np.concatenate(rows_parts)
    C = np.concatenate(codes_parts)
    L = np.concatenate(lits_parts)
    # round-major -> emission order WITHOUT a sort: every alive unit emits
    # exactly one symbol per round, so the element for unit u in round i
    # lands at unit_start[u] + i — an O(n) counting placement (argsort
    # here was the encode bottleneck at MB-scale inputs)
    n_units = int(pieces.sum())
    counts = np.bincount(R, minlength=n_units)
    unit_start = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos = np.concatenate(
        [unit_start[r_i] + i for i, r_i in enumerate(rows_parts)]
    )
    C_s = np.empty_like(C)
    L_s = np.empty_like(L)
    C_s[pos] = C
    L_s[pos] = L
    unit_len = np.where(C_s == ESCAPE, 2, 1).astype(np.int64)
    out = np.empty(int(unit_len.sum()), dtype=np.uint8)
    off = np.concatenate([[0], np.cumsum(unit_len)[:-1]])
    out[off] = C_s
    esc_mask = C_s == ESCAPE
    out[off[esc_mask] + 1] = L_s[esc_mask]
    row_nbytes = np.bincount(
        unit_row[R], weights=np.where(C == ESCAPE, 2, 1), minlength=n_rows
    ).astype(np.int64)
    return out.tobytes(), row_nbytes


def decode(table: SymbolTable, buf: bytes) -> np.ndarray:
    """Decode a code stream back to the original concatenated bytes."""
    codes = np.frombuffer(buf, dtype=np.uint8)
    n = codes.size
    if n == 0:
        return np.empty(0, dtype=np.uint8)
    esc_positions = np.flatnonzero(codes == ESCAPE)
    if esc_positions.size == 0:
        return _expand(table, codes, None, None)
    # identify maximal runs of ESCAPE bytes; within a run starting at a unit
    # boundary, even offsets are escape markers, odd offsets are literals;
    # an odd-length run additionally escapes the byte right after the run.
    is_literal = np.zeros(n, dtype=bool)
    is_marker = np.zeros(n, dtype=bool)
    breaks = np.flatnonzero(np.diff(esc_positions) > 1)
    run_starts = np.concatenate([[0], breaks + 1])
    run_ends = np.concatenate([breaks, [esc_positions.size - 1]])
    for rs, re in zip(run_starts.tolist(), run_ends.tolist()):
        s = int(esc_positions[rs])
        length = int(esc_positions[re]) - s + 1
        markers = np.arange(s, s + length - (length % 2 == 1), 2)
        is_marker[markers] = True
        is_literal[markers + 1] = True
        if length % 2 == 1:
            is_marker[s + length - 1] = True
            if s + length < n:
                is_literal[s + length] = True
    normal = ~(is_marker | is_literal) & (codes != ESCAPE)
    # emit units in position order: markers emit their following literal byte
    unit_pos = np.flatnonzero(normal | is_marker)
    unit_is_marker = is_marker[unit_pos]
    unit_codes = codes[unit_pos]
    literal_bytes = np.zeros(unit_pos.size, dtype=np.uint8)
    marker_idx = np.flatnonzero(unit_is_marker)
    literal_bytes[marker_idx] = codes[np.minimum(unit_pos[marker_idx] + 1, n - 1)]
    return _expand(table, unit_codes, unit_is_marker, literal_bytes)


def _expand(
    table: SymbolTable,
    codes: np.ndarray,
    is_literal: np.ndarray | None,
    literal_bytes: np.ndarray | None,
) -> np.ndarray:
    lens = table.sym_lens[codes].astype(np.int64)
    if is_literal is not None:
        lens[is_literal] = 1
    total = int(lens.sum())
    out = np.empty(total, dtype=np.uint8)
    off = np.concatenate([[0], np.cumsum(lens)[:-1]])
    max_len = int(lens.max()) if lens.size else 0
    for length in range(1, max_len + 1):
        m = lens == length
        if is_literal is not None:
            m &= ~is_literal
        if not m.any():
            continue
        o = off[m]
        sb = table.sym_bytes[codes[m]]
        for k in range(length):
            out[o + k] = sb[:, k]
    if is_literal is not None and is_literal.any():
        out[off[is_literal]] = literal_bytes[is_literal]
    return out
