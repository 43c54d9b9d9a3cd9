"""Corpus-level analytics for training-data curation: n-gram frequency
top-k, per-language vocabulary size (exact and HyperLogLog), C4-style
rule filtering, and deterministic stratified sampling.

These are the "what's in my 100-TB corpus" operators a web-data pipeline
runs before/after dedup (reference scope: datafusion-orc serves scans to
such pipelines, src/lib.rs:107-169; the ops themselves are beyond it).
Shapes follow the repo's scale rules: per-batch VECTORIZED partials
(Arrow kernels + offset-segmented numpy), size-gated final reduces
(driver combine for tiny partial sets, distributed groupby / tree reduce
beyond), and zero whole-dataset materialization on the big side.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from . import tokhash as tk
from .relational import _SMALL_PARTIALS, _tree_or_driver, collect

# --------------------------------------------------------------- n-grams


def _gram_strings(texts: pa.Array | pa.ChunkedArray, n: int) -> pa.Array:
    """Flat space-joined n-gram strings over whitespace tokens, all docs
    of a batch at once. Docs with < n tokens contribute none. Pure Arrow
    take + binary_join_element_wise — no Python per row/gram."""
    flat, offs = tk.token_strings(texts)
    counts = np.diff(offs)
    g_counts = np.maximum(counts - n + 1, 0)
    total = int(g_counts.sum())
    if total == 0:
        return pa.array([], pa.string())
    gram_doc = np.repeat(np.arange(len(counts)), g_counts)
    gram_start = np.concatenate([[0], np.cumsum(g_counts)])[:-1]
    within = np.arange(total) - np.repeat(gram_start, g_counts)
    base = offs[:-1][gram_doc] + within
    parts = [flat.take(pa.array(base + j, pa.int64())) for j in range(n)]
    return pc.binary_join_element_wise(*parts, " ")


def ngram_topk(
    ds: ray.data.Dataset,
    n: int = 2,
    k: int = 20,
    text_col: str = "text",
    fanin: int = 8,
) -> pa.Table:
    """EXACT global top-k n-grams by count -> (gram, n) table, ties
    broken by gram ascending (deterministic cut).

    Per batch: one split kernel + vectorized gram assembly + an Arrow
    groupby — the combiner, so the shuffle moves one row per distinct
    gram per BATCH, not per occurrence. Small partial sets combine on
    the driver (size gate, see relational._tree_or_driver rationale);
    large ones go through a distributed groupby().aggregate() whose
    sort-based shuffle makes output blocks key-disjoint, so a per-block
    local top-k is globally complete and the driver merges only
    (blocks x k) rows — gram cardinality never bounds driver memory."""

    def partial(batch: pa.Table) -> pa.Table:
        grams = _gram_strings(batch.column(text_col), n)
        res = pa.TableGroupBy(pa.table({"gram": grams}), ["gram"]).aggregate(
            [("gram", "count")]
        )
        return res.rename_columns(["gram", "n"])

    def head(tbl: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            tbl, sort_keys=[("n", "descending"), ("gram", "ascending")]
        )
        return tbl.take(idx[:k]).combine_chunks()

    def combine(batch: pa.Table) -> pa.Table:
        res = pa.TableGroupBy(batch, ["gram"]).aggregate([("n", "sum")])
        return res.rename_columns(["gram", "n"])

    partials = ds.map_batches(partial, batch_format="pyarrow").materialize()
    if partials.count() <= _SMALL_PARTIALS:
        return head(combine(collect(partials)))
    from ray.data.aggregate import Sum

    gb = partials.groupby("gram").aggregate(Sum("n", alias_name="n"))
    local = gb.map_batches(head, batch_format="pyarrow")
    return head(collect(local))


# ------------------------------------------------------ vocabulary size


def _lang_token_hash_partial(lang_col: str, text_col: str):
    """Per-batch distinct (lang, h1, h2) token rows — two independent
    64-bit hashes form an effective 128-bit token key (collision-safe at
    10^12-doc vocab sizes, same rationale as dedup._h128_cols)."""

    def fn(batch: pa.Table) -> pa.Table:
        flat, offs = tk.token_strings(batch.column(text_col))
        flat_np = flat.to_numpy(zero_copy_only=False).astype(object)
        h1 = tk.hash_strings(flat_np) if len(flat_np) else np.zeros(0, np.uint64)
        h2 = (
            tk.hash_strings_secondary(flat_np)
            if len(flat_np)
            else np.zeros(0, np.uint64)
        )
        lang = batch.column(lang_col)
        if isinstance(lang, pa.ChunkedArray):
            lang = lang.combine_chunks()
        per_tok_lang = lang.take(
            pa.array(np.repeat(np.arange(len(offs) - 1), np.diff(offs)), pa.int64())
        )
        tbl = pa.table(
            {
                lang_col: per_tok_lang,
                "h1": pa.array(h1.view(np.int64)),
                "h2": pa.array(h2.view(np.int64)),
            }
        )
        gb = pa.TableGroupBy(tbl, [lang_col, "h1", "h2"]).aggregate([])
        return gb

    return fn


def vocab_per_lang(
    ds: ray.data.Dataset,
    lang_col: str = "lang",
    text_col: str = "text",
    fanin: int = 8,
) -> pa.Table:
    """EXACT count(DISTINCT token) per language -> (lang, n_vocab).

    Per batch: distinct (lang, token-hash128) rows (the combiner — one
    row per distinct token per batch enters the reduce, not one per
    occurrence). Final: size-gated — driver dedupe for small partial
    sets; distributed groupby over the 3-part key beyond, where the
    sort shuffle makes blocks key-disjoint so per-block counts sum to
    the exact answer."""
    partial = _lang_token_hash_partial(lang_col, text_col)

    def dedupe(batch: pa.Table) -> pa.Table:
        return pa.TableGroupBy(batch, [lang_col, "h1", "h2"]).aggregate([])

    def count_per_lang(tbl: pa.Table) -> pa.Table:
        res = pa.TableGroupBy(tbl, [lang_col]).aggregate([("h1", "count")])
        return res.rename_columns([lang_col, "n_vocab"])

    partials = ds.map_batches(partial, batch_format="pyarrow").materialize()
    if partials.count() <= _SMALL_PARTIALS:
        return count_per_lang(dedupe(collect(partials)))
    gb = partials.groupby([lang_col, "h1", "h2"]).count()
    local = gb.map_batches(count_per_lang, batch_format="pyarrow")
    out = pa.TableGroupBy(collect(local), [lang_col]).aggregate([("n_vocab", "sum")])
    return out.rename_columns([lang_col, "n_vocab"])


# ------------------------------------------------ HyperLogLog vocabulary

_HLL_P = 14  # 2^14 registers = 16 KiB/lang, ~0.8% standard error


def _hll_registers(h: np.ndarray, p: int = _HLL_P) -> np.ndarray:
    """uint8[2^p] HLL registers from uint64 hashes, fully vectorized.
    Register index = top p bits; rank = leading-zeros-in-remaining+1.
    The remaining 64-p <= 53 bits fit float64 exactly, so frexp gives an
    exact bit_length."""
    regs = np.zeros(1 << p, np.uint8)
    if h.size == 0:
        return regs
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = (h & np.uint64((1 << (64 - p)) - 1)).astype(np.float64)
    bit_len = np.frexp(w)[1]  # 0 for w == 0
    rank = ((64 - p) - bit_len + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def _hll_estimate(regs: np.ndarray) -> float:
    """Raw HLL estimator with linear counting for the small range (the
    classic Flajolet correction; no bias table — pytest bounds error)."""
    m = regs.size
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        return m * float(np.log(m / zeros))
    return float(est)


def hll_vocab_per_lang(
    ds: ray.data.Dataset,
    lang_col: str = "lang",
    text_col: str = "text",
    fanin: int = 8,
) -> pa.Table:
    """APPROXIMATE distinct-token count per language -> (lang, n_approx),
    ~0.8% standard error at p=14. The scale path for vocabulary stats:
    each batch emits one (lang, 16 KiB register blob) row regardless of
    token volume, merges are byte-wise max — constant-size partials make
    the reduce O(langs) no matter the corpus size (vs vocab_per_lang's
    exact path whose shuffle carries every distinct token once)."""

    def partial(batch: pa.Table) -> pa.Table:
        h, offs = tk.token_hashes(batch.column(text_col))
        lang = batch.column(lang_col)
        if isinstance(lang, pa.ChunkedArray):
            lang = lang.combine_chunks()
        per_tok_lang = lang.take(
            pa.array(np.repeat(np.arange(len(offs) - 1), np.diff(offs)), pa.int64())
        )
        langs, blobs = [], []
        lang_np = per_tok_lang.to_numpy(zero_copy_only=False)
        for lv in pa.compute.unique(per_tok_lang).to_pylist():
            mask = lang_np == lv
            langs.append(lv)
            blobs.append(_hll_registers(h[mask]).tobytes())
        return pa.table({lang_col: pa.array(langs, pa.string()), "regs": pa.array(blobs, pa.binary())})

    def merge(batch: pa.Table) -> pa.Table:
        langs, blobs = [], []
        lang_np = batch.column(lang_col).to_numpy(zero_copy_only=False)
        regs_col = batch.column("regs")
        # dict grouping, not np.unique: a NULL lang (None in the object
        # array) makes np.unique raise TypeError on the None<str sort
        groups: dict = {}
        for i, lv in enumerate(lang_np):
            groups.setdefault(lv, []).append(i)
        for lv in sorted(groups, key=lambda x: (x is None, x or "")):
            rows = groups[lv]
            acc = np.zeros(1 << _HLL_P, np.uint8)
            for r in rows:
                np.maximum(acc, np.frombuffer(regs_col[r].as_py(), np.uint8), out=acc)
            langs.append(lv)
            blobs.append(acc.tobytes())
        return pa.table({lang_col: pa.array(langs, pa.string()), "regs": pa.array(blobs, pa.binary())})

    merged = _tree_or_driver(
        ds.map_batches(partial, batch_format="pyarrow"), merge, fanin
    )
    ests = [
        round(_hll_estimate(np.frombuffer(b.as_py(), np.uint8)))
        for b in merged.column("regs")
    ]
    idx = pc.sort_indices(merged.column(lang_col))
    return pa.table(
        {
            lang_col: merged.column(lang_col).take(idx),
            "n_approx": pa.array(np.asarray(ests, np.int64)[idx.to_numpy()]),
        }
    )


# ----------------------------------------------------- C4-style filter


def c4_quality_filter(
    ds: ray.data.Dataset,
    text_col: str = "text",
    min_tokens: int = 20,
    mean_len_range: tuple[float, float] = (4.0, 4.6),
) -> ray.data.Dataset:
    """C4-style rule filter (Raffel et al. 2020 §2.2 shape, rules
    adapted to this corpus): keep docs with >= min_tokens whitespace
    tokens and mean non-space token length inside ``mean_len_range``.
    Emits (other cols...) + n_tok + mean_tok_len for kept docs. One
    streaming map_batches — three Arrow kernels + one numpy division per
    batch, no shuffle, no Python rows."""
    lo, hi = mean_len_range

    def fn(batch: pa.Table) -> pa.Table:
        # trim first: split_whitespace emits empty tokens at padded edges
        # (interior runs are fine); blank docs still split to [""], so
        # zero them explicitly — together this equals the SQL mirror's
        # len(regexp_extract_all(text, '\S+')).
        raw = pc.fill_null(batch.column(text_col), "")
        txt = pc.utf8_trim_whitespace(raw)
        n_tok = pc.list_value_length(pc.utf8_split_whitespace(txt)).to_numpy().astype(np.int64)
        is_blank = pc.equal(txt, "").to_numpy(zero_copy_only=False)
        n_tok = np.where(is_blank, 0, n_tok)
        # total non-whitespace chars (== SQL length(regexp_replace(text,
        # '\s', '', 'g'))) — one RE2 pass, whitespace class identical
        nonspace = (
            pc.utf8_length(pc.replace_substring_regex(raw, r"\s", ""))
            .to_numpy()
            .astype(np.int64)
        )
        mean_len = np.divide(
            nonspace, n_tok, out=np.zeros(len(n_tok), np.float64), where=n_tok > 0
        )
        keep = (n_tok >= min_tokens) & (mean_len >= lo) & (mean_len <= hi)
        out = batch.append_column("n_tok", pa.array(n_tok))
        # half-away-from-zero to match SQL round() (numpy's half-even
        # diverges on exact .xxxx5 ties like 137/32)
        out = out.append_column(
            "mean_tok_len",
            pc.round(pa.array(mean_len), 4, round_mode="half_towards_infinity"),
        )
        return out.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow")


# ------------------------------------------------- stratified sampling

_KNUTH = 2654435761  # Knuth multiplicative hash constant
_MOD = 1 << 32


# distinct odd multipliers per DECISION FAMILY: two coins that are
# affine shifts of each other (same multiplier, different seed) are
# interval-correlated — composing stratified_sample with
# mixture_resample would give P(extra replica | kept) = 0 or 1, not the
# fractional weight. Different multipliers equidistribute the pair.
_MULT_MIXTURE = 3266489909  # NOT K+8 etc: near multipliers stay correlated (measured)
_MULT_NPG = 2246822519


def _knuth_coin(
    ids: np.ndarray, seed: int = 0, mult: int = _KNUTH
) -> np.ndarray:
    """The corpus-wide deterministic coin: ``((id + seed) * mult) mod
    2^32`` over uint64 (overflow wraps identically to the HUGEINT SQL
    mirror). Every sampling / sharding / epoch decision in this module
    derives from this ONE function so the loader-facing contract lives
    in one place. ``seed`` must be >= 0 (numpy uint64 would wrap a
    negative seed differently from SQL); ops making INDEPENDENT
    decisions must use different ``mult`` constants, not different
    seeds (see above)."""
    if seed < 0:
        raise ValueError(f"seed must be >= 0, got {seed}")
    with np.errstate(over="ignore"):
        return ((ids.astype(np.uint64) + np.uint64(seed)) * np.uint64(mult)) % np.uint64(_MOD)


def stratified_sample(
    ds: ray.data.Dataset,
    rates: dict[str, float],
    id_col: str = "doc_id",
    strata_col: str = "lang",
    default_rate: float = 0.0,
) -> ray.data.Dataset:
    """Deterministic per-stratum subsample: keep a row iff
    (id * 2654435761) mod 2^32 < rate[stratum] * 2^32 — the standard
    multiplicative-hash coin flip, so the SAME rows are kept on every
    run / cluster size / partitioning (resumable sampling), and the
    decision is SQL-expressible for oracle parity. Pure streaming
    map_batches; rates ship inside the task closure (a few bytes)."""
    langs = list(rates)
    thresholds = pa.array(
        [min(_MOD, int(rates[l] * _MOD)) for l in langs], pa.int64()
    )
    lang_arr = pa.array(langs, pa.string())
    default_thr = min(_MOD, int(default_rate * _MOD))

    def fn(batch: pa.Table) -> pa.Table:
        # uint64 wraparound is exact mod-2^64 arithmetic and 2^32 | 2^64,
        # so (id * K) % 2^32 is overflow-safe for any int64 id (the SQL
        # mirror needs HUGEINT for the same reason)
        ids = batch.column(id_col).to_numpy().astype(np.uint64)
        coin = _knuth_coin(ids)
        pos = pc.index_in(batch.column(strata_col), value_set=lang_arr)
        thr = pc.fill_null(thresholds.take(pos), default_thr).to_numpy(
            zero_copy_only=False
        ).astype(np.uint64)
        return batch.filter(pa.array(coin < thr))

    return ds.map_batches(fn, batch_format="pyarrow")


# ----------------------------------- per-lang quantile quality gate


def quantile_length_filter(
    ds: ray.data.Dataset, q: float = 0.25
) -> ray.data.Dataset:
    """Keep documents whose char length is >= their language's q-quantile
    — the per-group percentile gate pattern (drop the shortest tail of
    each language rather than one global cutoff, which would wipe out
    naturally-terse languages). Returns (doc_id, lang, n_chars) rows.

    Composition, all existing scale-safe parts: one vectorized length
    pass -> grouped_quantile (exact, one key-bucket shuffle over (lang,
    n_chars) pairs only) -> thresholds are ONE ROW PER LANGUAGE, so they
    broadcast via ray.put and the corpus filters in-stream — the second
    pass over the documents never shuffles. SQL mirror:
    quantile_cont(length(text), q) OVER (PARTITION BY lang). NULL text
    never passes (NULL comparison); a NULL lang forms its own partition."""
    from .relational import grouped_quantile

    def lengths(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang": batch.column("lang"),
                "n_chars": pc.cast(pc.utf8_length(batch.column("text")), pa.int64()),
            }
        )

    sized = ds.map_batches(lengths, batch_format="pyarrow")
    thr_tbl = collect(
        grouped_quantile(sized, ["lang"], "n_chars", q=q, out_col="thr")
    )
    langs = thr_tbl.column("lang").combine_chunks()
    thrs = thr_tbl.column("thr").to_numpy(zero_copy_only=False)
    null_thr = next(
        (t for l, t in zip(langs.to_pylist(), thrs) if l is None), None
    )
    thr_ref = ray.put((langs, thrs, null_thr))

    def keep(batch: pa.Table) -> pa.Table:
        langs_b, thrs_b, null_thr_b = ray.get(thr_ref)
        idx = pc.index_in(batch.column("lang"), value_set=langs_b)
        idx_np = idx.to_numpy(zero_copy_only=False)
        thr_row = np.full(batch.num_rows, np.inf)
        have = pc.is_valid(idx).to_numpy(zero_copy_only=False)
        thr_row[have] = thrs_b[idx_np[have].astype(np.int64)]
        if null_thr_b is not None:
            lang_null = pc.is_null(batch.column("lang")).to_numpy(zero_copy_only=False)
            thr_row[lang_null] = null_thr_b
        nc = batch.column("n_chars").to_numpy(zero_copy_only=False).astype(np.float64)
        ok = nc >= thr_row  # NaN (null text) compares False, like SQL NULL
        return batch.filter(pa.array(ok))

    return sized.map_batches(keep, batch_format="pyarrow")


# ------------------------------- bounded-error top-k (SpaceSaving merge)


def approx_ngram_topk(
    ds: ray.data.Dataset,
    n: int = 2,
    k: int = 20,
    text_col: str = "text",
    m: int = 1 << 16,
) -> pa.Table:
    """Bounded-error global top-k n-grams — the 100-TB path for
    ``ngram_topk``: each batch ships its exact gram counts TRUNCATED to
    its heaviest ``m`` rows, so shuffle volume is <= m rows per batch
    REGARDLESS of gram cardinality (the exact op's combiner still moves
    every distinct gram per batch, which on web text is ~every gram).

    Truncated-exact partials merge associatively (the SpaceSaving-merge
    bound, Berinde et al. 2010): summed counts where a gram was kept are
    a LOWER bound; adding each batch's residual (its largest dropped
    count) where the gram was missing gives an UPPER bound. Returns
    (gram, n, n_high, exact): rows ranked by lower bound, ``exact=True``
    iff the top-k CUT is proven (k-th lower bound >= (k+1)-th upper
    bound). When no batch truncates (m exceeds per-batch cardinality)
    n == the exact count and the result equals ``ngram_topk``."""

    def partial(batch: pa.Table) -> pa.Table:
        grams = _gram_strings(batch.column(text_col), n)
        res = pa.TableGroupBy(pa.table({"gram": grams}), ["gram"]).aggregate(
            [("gram", "count")]
        )
        res = res.rename_columns(["gram", "n"])
        err = 0
        if res.num_rows > m:
            idx = pc.sort_indices(
                res, sort_keys=[("n", "descending"), ("gram", "ascending")]
            )
            err = res.column("n").take(idx[m : m + 1])[0].as_py()
            res = res.take(idx[:m])
        # marker row (NULL gram) carries this batch's residual so the
        # merge can form SUM(err) over ALL batches
        marker = pa.table(
            {
                "gram": pa.array([None], res.column("gram").type),
                "n": pa.array([0], pa.int64()),
                "err": pa.array([err], pa.int64()),
            }
        )
        body = res.append_column(
            "err", pa.array(np.full(res.num_rows, err, np.int64))
        )
        return pa.concat_tables([body, marker])

    partials = ds.map_batches(partial, batch_format="pyarrow").materialize()
    dropped_core_max = None  # max (n_low - err_present) over rows the
    # distributed path pruned; their n_high = that + total_err
    if partials.count() <= _SMALL_PARTIALS:
        merged = collect(partials)
        markers = merged.filter(pc.is_null(merged.column("gram")))
        body = merged.filter(pc.is_valid(merged.column("gram")))
        g = pa.TableGroupBy(body, ["gram"]).aggregate([("n", "sum"), ("err", "sum")])
    else:
        # distributed merge: the sort-based groupby makes blocks
        # key-disjoint, so a per-block top-(k+1) by lower bound is
        # globally complete for the CUT; each block also reports the max
        # (n_low - err_present) over the rows it prunes, because a
        # pruned row's UPPER bound (n_low - err_present + total_err) can
        # exceed a kept row's and must stay in the exactness proof.
        from ray.data.aggregate import Sum

        gb = partials.groupby("gram").aggregate(
            Sum("n", alias_name="n_sum"), Sum("err", alias_name="err_sum")
        )

        def local_head(b: pa.Table) -> pa.Table:
            null_rows = b.filter(pc.is_null(b.column("gram")))
            live = b.filter(pc.is_valid(b.column("gram")))
            idx = pc.sort_indices(
                live, sort_keys=[("n_sum", "descending"), ("gram", "ascending")]
            )
            kept, rest = live.take(idx[: k + 1]), live.take(idx[k + 1 :])
            parts = [kept, null_rows]
            if rest.num_rows:
                core = pc.max(
                    pc.subtract(rest.column("n_sum"), rest.column("err_sum"))
                ).as_py()
                parts.append(
                    pa.table(
                        {
                            "gram": pa.array([None], b.column("gram").type),
                            "n_sum": pa.array([core], pa.int64()),
                            "err_sum": pa.array([-1], pa.int64()),  # bound tag
                        }
                    )
                )
            return pa.concat_tables(parts)

        merged = collect(gb.map_batches(local_head, batch_format="pyarrow"))
        nulls = merged.filter(pc.is_null(merged.column("gram")))
        bound_rows = nulls.filter(pc.equal(nulls.column("err_sum"), -1))
        if bound_rows.num_rows:
            dropped_core_max = pc.max(bound_rows.column("n_sum")).as_py()
        markers = nulls.filter(pc.not_equal(nulls.column("err_sum"), -1))
        markers = markers.rename_columns(["gram", "n", "err"])
        g = merged.filter(pc.is_valid(merged.column("gram"))).rename_columns(
            ["gram", "n_sum", "err_sum"]
        )
    total_err = (pc.sum(markers.column("err")).as_py() or 0) if markers.num_rows else 0
    n_low = g.column("n_sum")
    n_high = pc.add(n_low, pc.subtract(pa.scalar(total_err), g.column("err_sum")))
    out = pa.table({"gram": g.column("gram"), "n": n_low, "n_high": n_high})
    idx = pc.sort_indices(out, sort_keys=[("n", "descending"), ("gram", "ascending")])
    top = out.take(idx[:k])
    rest = out.take(idx[k:])
    # highest possible true count OUTSIDE the reported top-k: the best
    # seen-but-not-top row, any distributed-path pruned row, or a gram
    # never kept by any batch (n_high <= total_err)
    outside_high = total_err
    if rest.num_rows:
        outside_high = max(outside_high, pc.max(rest.column("n_high")).as_py())
    if dropped_core_max is not None:
        outside_high = max(outside_high, dropped_core_max + total_err)
    if top.num_rows < k:
        # fewer grams than k reported: exact iff nothing was ever
        # truncated or pruned (an unseen gram could hide otherwise)
        exact = total_err == 0 and dropped_core_max is None
    else:
        exact = bool(top.column("n")[k - 1].as_py() >= outside_high)
    return top.append_column("exact", pa.array(np.full(top.num_rows, exact)))


# ---------------------- mergeable approximate grouped quantile (summary)


def _key_segments(tb: pa.Table, keys: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Group segment (starts, ends) of a table ALREADY sorted by
    ``keys``: dictionary-encode each key column (null -> -1 code, its
    own group, matching pandas ``dropna=False``), mark rows where any
    code changes. O(n) numpy, no hashing, no Python per group."""
    n = tb.num_rows
    change = np.zeros(n, dtype=bool)
    change[0] = True
    for k in keys:
        codes = pc.dictionary_encode(
            tb.column(k).combine_chunks()
        ).indices.fill_null(-1).to_numpy()
        change[1:] |= codes[1:] != codes[:-1]
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], n)
    return starts, ends


def _weighted_picks(
    v: np.ndarray,
    w: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
    ranks01: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """For each segment of (v, w) — v sorted within segments — pick the
    value at each relative rank in ``ranks01`` (midpoint rule:
    searchsorted over cumweight - w/2, the standard weighted-summary
    query). Returns (flat pick indices segment-major, segment totals).
    One global searchsorted: cw - w/2 is globally nondecreasing, and
    per-segment ranks are clipped back into their segment."""
    cw = np.cumsum(w)
    base = cw[starts] - w[starts]
    totals = cw[ends - 1] - base
    targets = base[:, None] + ranks01[None, :] * totals[:, None]
    pick = np.searchsorted(cw - w / 2, targets.ravel())
    b = ranks01.size
    return (
        np.clip(pick, np.repeat(starts, b), np.repeat(ends - 1, b)),
        totals,
    )


def approx_grouped_quantile(
    ds: ray.data.Dataset,
    keys: list[str],
    val_col: str,
    q: float = 0.5,
    out_col: str = "qv",
    bins: int = 256,
) -> pa.Table:
    """Approximate per-group quantile via mergeable equi-depth summaries
    — the 100-TB path for ``grouped_quantile``, whose EXACT answer needs
    full per-key co-location. Each (batch, group) ships ``bins`` weighted
    points (the batch-group's own equi-depth quantiles, weight
    count/bins), so the exchange moves bins rows per group per batch
    independent of row count; the merge sorts each group's points and
    interpolates the target rank. Per-summary rank error <= 1/(2*bins)
    of that batch-group's mass, so the merged estimate's rank error is
    <= 1/(2*bins) of the group total (weighted-summary bound; B=256 ->
    0.2%). Nulls are ignored as in SQL. Intended for lang-like key
    cardinality (the per-batch group loop is per DISTINCT group in that
    batch); huge key spaces co-locate fine too, but prefer the exact op
    when you already pay its shuffle."""

    ranks01 = (np.arange(bins) + 0.5) / bins

    def partial(batch: pa.Table) -> pa.Table:
        vf = pc.cast(batch.column(val_col), pa.float64())
        keep = pc.fill_null(pc.invert(pc.is_nan(vf)), False)
        tb = pa.table(
            {**{k: batch.column(k) for k in keys}, "v": vf}
        ).filter(keep)
        empty = pa.table(
            {
                **{kn: pa.array([], batch.schema.field(kn).type) for kn in keys},
                "v": pa.array([], pa.float64()),
                "w": pa.array([], pa.float64()),
            }
        )
        if tb.num_rows == 0:
            return empty
        tb = tb.sort_by([(k, "ascending") for k in keys] + [("v", "ascending")])
        starts, ends = _key_segments(tb, keys)
        sizes = ends - starts
        # equi-depth picks at floor((j+.5)/bins * size) — segment-major
        rel = np.minimum(
            (ranks01[None, :] * sizes[:, None]).astype(np.int64),
            (sizes - 1)[:, None],
        )
        idx = (starts[:, None] + rel).ravel()
        v = tb.column("v").to_numpy()
        kt = tb.select(keys).take(pa.array(np.repeat(starts, bins)))
        return pa.table(
            {
                **{kn: kt.column(kn) for kn in keys},
                "v": pa.array(v[idx]),
                "w": pa.array(np.repeat(sizes / bins, bins)),
            }
        )

    def recompress(b: pa.Table) -> pa.Table:
        """Re-summarize weighted points to <= bins rows per group —
        summaries are associative, so a tree level keeps the driver's
        merge input at fanin x groups x bins rows regardless of batch
        count (adds <= 1/(2*bins) rank error per level)."""
        if b.num_rows == 0:
            return b.slice(0, 0)
        tb = b.sort_by([(k, "ascending") for k in keys] + [("v", "ascending")])
        starts, ends = _key_segments(tb, keys)
        v = tb.column("v").to_numpy()
        w = tb.column("w").to_numpy()
        pick, totals = _weighted_picks(v, w, starts, ends, ranks01)
        kt = tb.select(keys).take(pa.array(np.repeat(starts, bins)))
        return pa.table(
            {
                **{kn: kt.column(kn) for kn in keys},
                "v": pa.array(v[pick]),
                "w": pa.array(np.repeat(totals / bins, bins)),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow").materialize()
    if partials.count() > _SMALL_PARTIALS:
        partials = partials.repartition(8).map_batches(
            recompress, batch_format="pyarrow"
        )
    merged = collect(partials)
    if merged.num_rows == 0:
        return pa.table(
            {
                **{kn: merged.column(kn) for kn in keys},
                out_col: pa.array([], pa.float64()),
            }
        )
    tb = merged.sort_by([(k, "ascending") for k in keys] + [("v", "ascending")])
    starts, ends = _key_segments(tb, keys)
    v = tb.column("v").to_numpy()
    w = tb.column("w").to_numpy()
    pick, _ = _weighted_picks(v, w, starts, ends, np.array([q]))
    kt = tb.select(keys).take(pa.array(starts))
    return pa.table(
        {
            **{kn: kt.column(kn) for kn in keys},
            out_col: pa.array(v[pick], pa.float64()),
        }
    )


# ------------------------------------- boilerplate line removal (CCNet)


def remove_boilerplate_lines(
    ds: ray.data.Dataset,
    text_col: str = "text",
    min_docs: int = 5,
    delimiter: str = "\n",
) -> ray.data.Dataset:
    """CCNet/RefinedWeb-style boilerplate stripping: drop every line
    (``delimiter``-separated; newline by default) that appears in
    >= ``min_docs`` DISTINCT
    documents, reassemble the survivors, and drop docs whose text
    becomes empty (all lines boilerplate).

    Two passes, both vectorized:

    1. **Hot-line census.** Per batch: explode lines (`split_pattern` +
       `list_flatten`), dedupe (line, doc) pairs with one Arrow groupby
       (a doc is a single row, so per-batch pair dedup is globally
       exact), emit per-line partial doc counts. Final reduce through
       the size-gated `_tree_or_driver` — the distinct-line space is
       bounded by content, not corpus size.
    2. **Streaming strip.** The hot-line set ships once via `ray.put`
       (broadcast, not per-batch capture). Per batch: one `pc.is_in`
       over the flat line array, `np.bincount` over
       `list_parent_indices` to rebuild per-doc offsets, `binary_join`
       to reassemble — no Python rows.

    Scale note: the broadcast hot set holds only lines crossing the
    ``min_docs`` threshold. At web scale that set is the classic CCNet
    shared-line table — millions of short strings, well inside a
    worker heap; raise ``min_docs`` (it is a per-corpus knob) if a
    pathological corpus explodes it. The census shuffle carries one
    (line, count) row per distinct line per batch, never the corpus.
    """

    def _lines(batch_text: pa.ChunkedArray | pa.Array):
        txt = pc.fill_null(batch_text, "")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        return pc.split_pattern(txt, delimiter)

    def census(batch: pa.Table) -> pa.Table:
        # NULL docs have no lines — fill_null would count an "" line
        # for them and skew the blank-line census
        batch = batch.filter(pc.is_valid(batch.column(text_col)))
        lists = _lines(batch.column(text_col))
        flat = pc.list_flatten(lists)
        doc = pc.list_parent_indices(lists)
        pairs = pa.TableGroupBy(
            pa.table({"line": flat, "__doc": doc}), ["line", "__doc"]
        ).aggregate([])
        out = pa.TableGroupBy(pairs, ["line"]).aggregate([("__doc", "count")])
        return out.rename_columns(["line", "n_docs"])

    def combine(tbl: pa.Table) -> pa.Table:
        out = pa.TableGroupBy(tbl, ["line"]).aggregate([("n_docs", "sum")])
        return out.rename_columns(["line", "n_docs"])

    counts = ds.map_batches(census, batch_format="pyarrow")
    merged = _tree_or_driver(counts, combine, fanin=32)
    hot = merged.filter(
        pc.greater_equal(merged.column("n_docs"), min_docs)
    ).column("line")
    if isinstance(hot, pa.ChunkedArray):
        hot = hot.combine_chunks()
    hot_ref = ray.put(hot)

    def strip(batch: pa.Table) -> pa.Table:
        hot_lines = ray.get(hot_ref)
        lists = _lines(batch.column(text_col))
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists)
        keep = pc.invert(pc.is_in(flat, value_set=hot_lines))
        kept_flat = flat.filter(keep)
        kept_parent = parent.filter(keep).to_numpy(zero_copy_only=False)
        n = batch.num_rows
        per_doc = np.bincount(kept_parent, minlength=n)
        offsets = np.concatenate([[0], np.cumsum(per_doc)])
        new_lists = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int64()), kept_flat
        )
        new_text = pc.binary_join(new_lists, delimiter)
        # NULL passthrough (module convention): a null-text doc is not
        # "all boilerplate" — it keeps its NULL and its row
        vcol = batch.column(text_col)
        if isinstance(vcol, pa.ChunkedArray):
            vcol = vcol.combine_chunks()
        valid = pc.is_valid(vcol)
        new_text = pc.if_else(valid, new_text, pa.scalar(None, pa.string()))
        i = batch.schema.get_field_index(text_col)
        out = batch.set_column(i, text_col, new_text)
        return out.filter(
            pa.array((per_doc > 0) | ~valid.to_numpy(zero_copy_only=False))
        )

    return ds.map_batches(strip, batch_format="pyarrow")


# -------------------------------------- mixture resampling (source epochs)


def mixture_resample(
    ds: ray.data.Dataset,
    weights: dict[str, float],
    id_col: str = "doc_id",
    source_col: str = "source",
    default_weight: float = 1.0,
) -> ray.data.Dataset:
    """Dolma/Pile-style mixture weighting: emit each document
    ``floor(w)`` times plus one more with probability ``frac(w)``, where
    ``w = weights[source]`` (sources absent from the map use
    ``default_weight``). Upweighting (w > 1) repeats documents — the
    "epochs per source" knob of a pre-training mixture; downweighting
    (w < 1) subsamples. The fractional coin is the same deterministic
    multiplicative hash as ``stratified_sample``, so the SAME replicas
    come out on every run / cluster size / partitioning (resumable) and
    the decision is SQL-expressible. Output adds a ``replica`` column
    (0-based copy index).

    One streaming map_batches: weight lookup via ``pc.index_in``,
    row expansion via one ``np.repeat``-built take-index — no shuffle,
    no Python rows, output size = sum(n_i) exactly.
    """
    srcs = list(weights)
    if any(weights[s] < 0 for s in srcs) or default_weight < 0:
        raise ValueError("mixture weights must be >= 0")
    src_arr = pa.array(srcs, pa.string())
    floors = pa.array([int(weights[s]) for s in srcs], pa.int64())
    fracs = pa.array(
        [min(_MOD, int((weights[s] - int(weights[s])) * _MOD)) for s in srcs],
        pa.int64(),
    )
    d_floor = int(default_weight)
    d_frac = min(_MOD, int((default_weight - d_floor) * _MOD))

    def fn(batch: pa.Table) -> pa.Table:
        pos = pc.index_in(batch.column(source_col), value_set=src_arr)
        base = pc.fill_null(floors.take(pos), d_floor).to_numpy(zero_copy_only=False)
        thr = pc.fill_null(fracs.take(pos), d_frac).to_numpy(zero_copy_only=False)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        coin = _knuth_coin(ids, mult=_MULT_MIXTURE)
        n = base + (coin < thr.astype(np.uint64))
        take = np.repeat(np.arange(batch.num_rows), n)
        starts = np.concatenate([[0], np.cumsum(n)])[:-1]
        replica = np.arange(int(n.sum())) - np.repeat(starts, n)
        out = batch.take(pa.array(take, pa.int64()))
        return out.append_column("replica", pa.array(replica, pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------- TF-IDF distinctive terms


def tfidf_top_terms(
    ds: ray.data.Dataset,
    k: int = 5,
    lang_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """Top-``k`` distinctive terms per language by TF-IDF:
    ``score = tf(lang, term) * ln(N_docs / df(term))`` with whitespace
    terms, ranked by (round(score, 4) DESC, term ASC).

    One pass over the corpus: per batch, explode tokens (vectorized),
    one Arrow groupby yields BOTH partials — term frequency per
    (lang, term) and distinct-doc count per (lang, term) (each doc has
    exactly one lang, so per-term df is the sum of its per-lang df —
    no second corpus pass). Partials are (lang, term) rows, bounded by
    vocabulary x langs per batch, through the size-gated reduce; the
    final scoring table is vocabulary-sized, not corpus-sized. Scores
    are rounded to 4 decimals BEFORE ranking so a double-precision SQL
    oracle ranks identically."""

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col)
        flat, offs = tk.token_strings(texts)
        counts = np.diff(offs)
        doc_idx = np.repeat(np.arange(len(counts)), counts)
        langs = batch.column(lang_col)
        if isinstance(langs, pa.ChunkedArray):
            langs = langs.combine_chunks()
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        t = pa.table(
            {
                "lang": langs.take(pa.array(doc_idx, pa.int64())),
                "term": flat,
                "__doc": ids.take(pa.array(doc_idx, pa.int64())),
            }
        )
        # tf + within-batch distinct docs in one grouped pass each; the
        # (lang, term, doc) dedup is globally exact (a doc is one row)
        tf = pa.TableGroupBy(t, ["lang", "term"]).aggregate([("__doc", "count")])
        dd = pa.TableGroupBy(t, ["lang", "term", "__doc"]).aggregate([])
        df = pa.TableGroupBy(dd, ["lang", "term"]).aggregate([("__doc", "count")])
        out = tf.rename_columns(["lang", "term", "tf"]).join(
            df.rename_columns(["lang", "term", "df"]), keys=["lang", "term"]
        )
        return out

    def combine(tbl: pa.Table) -> pa.Table:
        out = pa.TableGroupBy(tbl, ["lang", "term"]).aggregate(
            [("tf", "sum"), ("df", "sum")]
        )
        return out.rename_columns(["lang", "term", "tf", "df"])

    n_docs = ds.count()
    partials = ds.map_batches(partial, batch_format="pyarrow")
    merged = _tree_or_driver(partials, combine, fanin=32)

    # per-term df across langs (vocabulary-sized — driver math from here)
    df_tot = pa.TableGroupBy(merged, ["term"]).aggregate([("df", "sum")])
    df_tot = df_tot.rename_columns(["term", "df_total"])
    scored = merged.join(df_tot, keys=["term"])
    tf = scored.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
    dfv = scored.column("df_total").to_numpy(zero_copy_only=False).astype(np.float64)
    raw = tf * np.log(float(n_docs) / dfv)
    # half-away-from-zero like SQL round() — np.round is half-to-even
    # and an exact .xxxx5 tie would flip the (score DESC, term ASC)
    # rank vs the DuckDB oracle
    score = np.floor(np.abs(raw) * 1e4 + 0.5) / 1e4 * np.sign(raw)
    scored = pa.table(
        {
            "lang": scored.column("lang"),
            "term": scored.column("term"),
            "score": pa.array(score, pa.float64()),
        }
    ).sort_by(
        [("lang", "ascending"), ("score", "descending"), ("term", "ascending")]
    )
    langs = scored.column("lang").to_numpy(zero_copy_only=False)
    new_lang = np.concatenate([[True], langs[1:] != langs[:-1]])
    seg = np.cumsum(new_lang) - 1
    starts = np.flatnonzero(new_lang)
    rank = np.arange(len(langs)) - starts[seg]
    return scored.filter(pa.array(rank < k))


def sample_n_per_group(
    ds: ray.data.Dataset,
    n: int,
    group_col: str,
    id_col: str = "doc_id",
    columns: list[str] | None = None,
) -> pa.Table:
    """Deterministic n-per-group sample: rank rows inside each group by
    the multiplicative-hash coin of their id (ties by id) and keep the
    n smallest — the same rows at any partitioning, run, or cluster
    size (resumable inspection samples; same coin as stratified_sample,
    so the SQL oracle mirrors it with HUGEINT arithmetic). Rides
    grouped_topk's combiner + tree reduce: driver holds at most
    fanin x |groups| x n rows, the corpus never shuffles."""
    from .relational import grouped_topk

    cols = columns or [group_col, id_col]

    def coin(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy().astype(np.uint64)
        c = _knuth_coin(ids, mult=_MULT_NPG)
        # grouped_topk keeps the LARGEST order values; negate to rank
        # the smallest coins first
        return batch.append_column("__negcoin", pa.array(-c.astype(np.int64)))

    tagged = ds.map_batches(coin, batch_format="pyarrow")
    out = grouped_topk(
        tagged, [group_col], "__negcoin", n, cols + ["__negcoin"], tiebreak=id_col
    )
    return out.drop_columns(["__negcoin"])


# ------------------------------------------ training-shard writer


def make_training_shards(
    ds: ray.data.Dataset,
    out_dir: str,
    n_shards: int = 64,
    seed: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pa.Table:
    """Final-mile training-shard writer: deterministic epoch shuffle +
    shard assignment + partitioned parquet output, returning per-shard
    stats computed by READING THE OUTPUT BACK (the sink is part of what
    the oracle checks). The loader-facing contract:

      h     = ((doc_id + seed) * 2654435761) mod 2^32   (Knuth coin,
              the corpus-wide convention — SQL-mirrorable in HUGEINT)
      shard = h mod n_shards
      order = h (within-shard pseudo-random read order)

    Every run / parallelism / partitioning produces the SAME assignment
    (reproducibility); a new seed is a new epoch permutation. Output
    layout is one hive directory per shard (``shard=<i>/``); a trainer
    reads shard i with ``read_parquet(out/shard=<i>)``. Rows inside each
    written block are sorted by (h, doc_id); a loader wanting exact
    global within-shard order sorts its shard by ``__order`` — kept as
    a column for that purpose (per-shard global sort here would be an
    avoidable all-to-all; trainer shuffle buffers make it unnecessary).

    Resume/overwrite contract: a COMPLETED run leaves a ``_DONE`` marker
    and a re-invocation skips straight to the stats pass (idempotent
    restart); an INTERRUPTED run (our ``_IN_PROGRESS`` marker present)
    is discarded and rewritten — determinism makes the rewrite
    bit-identical; a non-empty ``out_dir`` this function did NOT write
    raises instead of being deleted.

    One streaming pass writes; one column-pruned pass aggregates stats
    (shard, n_docs, n_tokens) via the size-gated reduce.
    """
    import os
    import shutil

    from .relational import grouped_agg
    from .text import TOKEN_RE

    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    if seed < 0:
        raise ValueError(f"seed must be >= 0, got {seed}")

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        h = _knuth_coin(ids, seed)
        out = batch.append_column("shard", pa.array((h % n_shards).astype(np.int64)))
        out = out.append_column("__order", pa.array(h.astype(np.int64)))
        o = np.lexsort((ids, h))
        return out.take(pa.array(o, pa.int64()))

    done_marker = os.path.join(out_dir, "_DONE")
    wip_marker = os.path.join(out_dir, "_IN_PROGRESS")
    if not os.path.exists(done_marker):
        if os.path.isdir(out_dir) and os.listdir(out_dir) and not os.path.exists(
            wip_marker
        ):
            raise FileExistsError(
                f"{out_dir} is non-empty and was not written by "
                "make_training_shards; refusing to delete it"
            )
        shutil.rmtree(out_dir, ignore_errors=True)
        os.makedirs(out_dir, exist_ok=True)
        open(wip_marker, "w").close()
        ds.map_batches(assign, batch_format="pyarrow").write_parquet(
            out_dir, partition_cols=["shard"]
        )
        os.replace(wip_marker, done_marker)

    back = ray.data.read_parquet(out_dir, columns=["shard", text_col])

    def stat_rows(batch: pa.Table) -> pa.Table:
        n = pc.cast(
            pc.count_substring_regex(batch.column(text_col), TOKEN_RE), pa.int64()
        )
        return pa.table(
            {
                "shard": pc.cast(batch.column("shard"), pa.int64()),
                "n_tok": n,
            }
        )

    return grouped_agg(
        back.map_batches(stat_rows, batch_format="pyarrow"),
        ["shard"],
        {"n_docs": ("count", "shard"), "n_tokens": ("sum", "n_tok")},
    )


def pack_blocks(
    ds: ray.data.Dataset,
    block_tokens: int = 512,
    n_shards: int = 16,
    seed: int = 0,
    eod: str = "<eod>",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """GPT-style concat-and-chunk: per shard, concatenate every
    document's whitespace tokens (each non-null doc followed by one
    ``eod`` separator token, even when empty) in the deterministic
    epoch order (Knuth h, doc_id), then cut the stream into fixed
    ``block_tokens``-token blocks — sequences CROSS document boundaries,
    the standard pretraining data format (``text.pack_sequences`` is the
    no-split variant). Output rows: (shard, block_id, block_text,
    n_tok); every block has exactly ``block_tokens`` tokens except each
    shard's last. NULL-text docs contribute nothing.

    Scale shape: ONE shard exchange (groupby shard) — inherent, since a
    block interleaves tokens from many docs; within a shard everything
    is one sort + two Arrow gathers. Shard count bounds per-group
    memory: size n_shards so corpus_tokens/n_shards fits a worker
    (at 100 TB that is ~10k shards, far above any skew concern since
    shard hash is uniform by construction)."""
    if block_tokens < 1:
        raise ValueError(f"block_tokens must be >= 1, got {block_tokens}")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    if seed < 0:
        raise ValueError(f"seed must be >= 0, got {seed}")

    def assign(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_valid(batch.column(text_col)))
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        h = _knuth_coin(ids, seed)
        return pa.table(
            {
                "shard": pa.array((h % n_shards).astype(np.int64)),
                "__h": pa.array(h.astype(np.int64)),
                id_col: t.column(id_col),
                text_col: t.column(text_col),
            }
        )

    def chunk_shard(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            g, sort_keys=[("__h", "ascending"), (id_col, "ascending")]
        )
        g = g.take(order)
        flat, offs = tk.token_strings(g.column(text_col))
        n_docs = len(offs) - 1
        counts = np.diff(offs)
        # interleave one eod after each doc: output slot -> source index,
        # where index len(flat) is the eod sentinel appended to the pool
        new_counts = counts + 1
        new_offs = np.concatenate([[0], np.cumsum(new_counts)])
        total = int(new_offs[-1])
        gather = np.empty(total, np.int64)
        doc_of = np.repeat(np.arange(n_docs), new_counts)
        within = np.arange(total) - new_offs[:-1][doc_of]
        is_eod = within == counts[doc_of]
        gather[~is_eod] = (offs[:-1][doc_of] + within)[~is_eod]
        gather[is_eod] = len(flat)
        # large_* throughout: a shard's concatenated text routinely
        # exceeds the 2 GiB int32 offset cap long before its token
        # COUNT does (e.g. ~10 GB/shard at the docstring's 100-TB
        # sizing), and take/binary_join overflow on string BYTES first
        pool = pa.concat_arrays(
            [flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat,
             pa.array([eod], pa.string())]
        ).cast(pa.large_string())
        stream = pool.take(pa.array(gather, pa.int64()))
        n_blocks = -(-total // block_tokens)
        cuts = np.minimum(np.arange(n_blocks + 1) * block_tokens, total)
        la = pa.LargeListArray.from_arrays(pa.array(cuts, pa.int64()), stream)
        shard = g.column("shard")[0].as_py() if g.num_rows else 0
        return pa.table(
            {
                "shard": pa.array(np.full(n_blocks, shard, np.int64)),
                "block_id": pa.array(np.arange(n_blocks, dtype=np.int64)),
                # stays large_string: a group's output text is as big as
                # its input text, so casting back to string would just
                # reintroduce the 2 GiB cap at the table boundary
                "block_text": pc.binary_join(la, pa.scalar(" ", pa.large_string())),
                "n_tok": pa.array(np.diff(cuts).astype(np.int64)),
            }
        )

    return (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(chunk_shard, batch_format="pyarrow")
    )


_MULT_WEIGHTED = 2484345263  # weighted_sample's own decision family


def weighted_sample(
    ds: ray.data.Dataset,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    columns: list[str] | None = None,
    fanin: int = 8,
) -> pa.Table:
    """Deterministic weight-biased top-k sample: rank every row by the
    integer priority ``(coin(id) << 20) // weight`` ascending (ties by
    id) and keep the k smallest — rows with larger ``weight_col`` draw
    systematically smaller priorities, so selection probability grows
    with weight (the priority-sampling heuristic behind quality-weighted
    corpus subsampling; exact A-ES needs float u^(1/w) draws, whose
    libm differences would break the cross-engine oracle — integer
    division is bit-identical everywhere). Same rows at any
    parallelism / run / cluster size. Rows with NULL or non-positive
    weight never qualify (SQL: the division predicate is NULL/rejected).

    One streaming pass: per-batch top-k combiner + tree reduce via
    relational.topk — the corpus never shuffles and the driver holds
    fanin x k rows."""
    from .relational import topk

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    cols = columns or [id_col, weight_col]

    def prio(batch: pa.Table) -> pa.Table:
        w = batch.column(weight_col)
        keep = pc.and_kleene(pc.is_valid(w), pc.greater(w, 0))
        t = batch.filter(pc.fill_null(keep, False))
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        c = _knuth_coin(ids, mult=_MULT_WEIGHTED)
        wcol = t.column(weight_col)
        if pa.types.is_floating(wcol.type):
            # fixed-point: a raw uint64 cast truncates 2.7 -> 2 and sends
            # weights in (0,1) to 0 (uint64 floor-div by 0 yields 0 — the
            # HIGHEST priority, the inverse of the documented bias).
            # Scaling every weight by the same 2^20 constant preserves the
            # c/w priority ORDER; sub-2^-21 weights clamp to 1 ulp.
            wf = wcol.to_numpy(zero_copy_only=False)
            wv = np.maximum(np.round(wf * float(1 << 20)), 1.0).astype(np.uint64)
        else:
            wv = wcol.to_numpy(zero_copy_only=False).astype(np.uint64)
        p = (c << np.uint64(20)) // wv
        # topk keeps the LARGEST values; negate for ascending priority
        return t.select(cols).append_column(
            "__negprio", pa.array((-p.astype(np.int64)))
        )

    tagged = ds.map_batches(prio, batch_format="pyarrow")
    out = topk(tagged, "__negprio", k, cols + ["__negprio"], tiebreak=id_col)
    return out.drop_columns(["__negprio"])
