"""Bigram language-model quality scoring (the CCNet / Wenzek et al.
2020 shape: score each document by average negative log-likelihood
under a corpus LM; low-perplexity = fluent text, high = gibberish).

Ray-Data-first: training is ONE streaming pass — each batch emits
packed (key, count) partials for unigrams AND bigrams together
(vocabulary-sized, never corpus-sized) through the size-gated tree
reduce; scoring broadcasts the finished model once (``ray.put``) and
labels every batch with two ``pc.index_in`` lookups + segmented numpy,
zero shuffle. The reference engine only scans columns
(src/lib.rs:107-169); this is a north-rule addition.

Smoothing is add-alpha on the bigram numerator with an alpha*V
denominator guard — chosen because it is EXACTLY SQL-expressible, so
the whole pipeline (train on corpus, score corpus) has a hard DuckDB
oracle, unlike Kneser-Ney.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from . import tokhash as tk
from .relational import _tree_or_driver

_SEP = "\x1f"
_UNI = "1" + _SEP
_BIG = "2" + _SEP


def _bigram_key(w1: pa.Array, w2: pa.Array) -> pa.Array:
    """Equality-unique packed bigram key: ``len(w1) SEP w1 SEP w2``.
    The length prefix makes (w1, w2) -> key injective even when a token
    itself contains the separator byte (utf8_split_whitespace does NOT
    split on \x1f, so plain w1+SEP+w2 conflated ('a\x1fb','c') with
    ('a','b\x1fc'))."""
    ln = pc.cast(pc.binary_length(w1), pa.string())
    return pc.binary_join_element_wise(ln, w1, w2, _SEP)


def _transition_arrays(
    texts, pre: tuple | None = None
) -> tuple[pa.Array, pa.Array, np.ndarray]:
    """(w1, w2, doc_offsets) for adjacent within-document token pairs.
    doc_offsets has len n_docs+1 over the TRANSITION array (docs with
    < 2 tokens span zero transitions). ``pre`` passes an already-computed
    (flat, offs) pair so callers that tokenized the batch for unigrams
    don't pay the split kernel twice."""
    flat, offs = pre if pre is not None else tk.token_strings(texts)
    n = len(flat)
    if n < 2:
        return pa.array([], pa.string()), pa.array([], pa.string()), np.zeros(len(offs), np.int64)
    keep = np.ones(n - 1, dtype=bool)
    ends = offs[1:-1]  # end position of each non-final doc
    ends = ends[(ends > 0) & (ends <= n - 1)]
    keep[ends - 1] = False
    # also mask nothing for empty docs (handled by offsets arithmetic)
    idx = np.flatnonzero(keep)
    w1 = pc.take(flat, pa.array(idx))
    w2 = pc.take(flat, pa.array(idx + 1))
    # transitions per doc = max(len-1, 0); cumulated -> offsets
    lens = np.diff(offs)
    toffs = np.concatenate([[0], np.cumsum(np.maximum(lens - 1, 0))])
    return w1, w2, toffs


def train_bigram_lm(
    ds: ray.data.Dataset, text_col: str = "text", fanin: int = 8
) -> dict:
    """One pass over the corpus -> {"uni_words", "uni_counts",
    "big_keys", "big_counts", "vocab": V}. Unigram and bigram partials
    ride one keyed table (prefix-packed keys) so the text is read once."""

    def partial(batch: pa.Table) -> pa.Table:
        flat, offs = tk.token_strings(batch.column(text_col))
        w1, w2, _ = _transition_arrays(batch.column(text_col), pre=(flat, offs))
        ukeys = pc.binary_join_element_wise(pa.scalar("1"), flat, _SEP)
        bkeys = pc.binary_join_element_wise(pa.scalar("2"), _bigram_key(w1, w2), _SEP)
        keys = pa.concat_arrays(
            [ukeys.combine_chunks() if isinstance(ukeys, pa.ChunkedArray) else ukeys,
             bkeys.combine_chunks() if isinstance(bkeys, pa.ChunkedArray) else bkeys]
        )
        t = pa.table({"key": keys})
        out = pa.TableGroupBy(t, ["key"]).aggregate([([], "count_all")])
        return out.rename_columns(["key", "c"])

    def combine(tbl: pa.Table) -> pa.Table:
        out = pa.TableGroupBy(tbl, ["key"]).aggregate([("c", "sum")])
        return out.rename_columns(["key", "c"])

    merged = _tree_or_driver(
        ds.map_batches(partial, batch_format="pyarrow"), combine, fanin
    )
    merged = merged.sort_by([("key", "ascending")])
    keys = merged.column("key")
    counts = merged.column("c").to_numpy(zero_copy_only=False)
    is_uni = pc.starts_with(keys, _UNI).to_numpy(zero_copy_only=False)
    uni_keys = keys.filter(pa.array(is_uni))
    big_keys = keys.filter(pa.array(~is_uni))
    strip = pc.utf8_replace_slice(uni_keys, 0, 2, "")
    stripb = pc.utf8_replace_slice(big_keys, 0, 2, "")
    return {
        "uni_words": strip.combine_chunks() if isinstance(strip, pa.ChunkedArray) else strip,
        "uni_counts": counts[is_uni].astype(np.float64),
        "big_keys": stripb.combine_chunks() if isinstance(stripb, pa.ChunkedArray) else stripb,
        "big_counts": counts[~is_uni].astype(np.float64),
        "vocab": int(is_uni.sum()),
    }


def score_avg_nll(
    ds: ray.data.Dataset,
    lm: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.4,
    ndigits: int = 4,
) -> ray.data.Dataset:
    """Per-document average negative log-likelihood of bigram
    transitions, add-alpha smoothed:

        nll(doc) = -(1/T) * sum_i ln( (c(w_i-1, w_i) + a) / (c(w_i-1) + a*V) )

    Docs with < 2 tokens score NULL (no transitions). Model broadcast
    once; per batch: two index_in lookups + one reduceat. Rounded to
    ``ndigits`` half-away-from-zero for the SQL-oracle contract."""
    ref = ray.put(lm)
    v = float(lm["vocab"])

    def score(batch: pa.Table) -> pa.Table:
        model = ray.get(ref)
        w1, w2, toffs = _transition_arrays(batch.column(text_col))
        out = batch.select([id_col])
        nt = np.diff(toffs).astype(np.int64)
        if len(w1) == 0:
            out = out.append_column("n_trans", pa.array(np.zeros(batch.num_rows, np.int64)))
            return out.append_column(
                "avg_nll", pa.array([None] * batch.num_rows, pa.float64())
            )
        bkey = _bigram_key(w1, w2)
        bidx = pc.index_in(bkey, value_set=model["big_keys"])
        uidx = pc.index_in(w1, value_set=model["uni_words"])
        bi = bidx.to_numpy(zero_copy_only=False)
        ui = uidx.to_numpy(zero_copy_only=False)
        # guarded gathers: np.where evaluates the fancy-index branch
        # EAGERLY, so an empty count array (model trained on a corpus
        # with no transitions) would IndexError even though every
        # element is masked
        def _gather(counts: np.ndarray, idx: np.ndarray) -> np.ndarray:
            if counts.size == 0:
                return np.zeros(idx.shape, np.float64)
            miss = np.isnan(idx.astype(np.float64))
            return np.where(miss, 0.0, counts[np.nan_to_num(idx).astype(np.int64)])

        cb = _gather(model["big_counts"], bi)
        cu = _gather(model["uni_counts"], ui)
        lp = np.log((cb + alpha) / (cu + alpha * v))
        # reduceat over NON-EMPTY segments only: zero-length docs would
        # need index clamping, and a clamped mid-array index silently
        # truncates the PRECEDING doc's segment. Non-empty starts are
        # strictly increasing and each segment ends exactly at the next
        # non-empty start (empty docs span nothing), so this is the
        # plain sequential per-doc sum — bit-identical at any batching.
        sums = np.zeros(len(nt), np.float64)
        nz = nt > 0
        if nz.any():
            sums[nz] = np.add.reduceat(lp, toffs[:-1][nz])
        with np.errstate(divide="ignore", invalid="ignore"):
            avg = -sums / nt
        rd = np.floor(np.abs(avg) * 10.0**ndigits + 0.5) / 10.0**ndigits * np.sign(avg)
        vals = pa.array(rd, pa.float64(), mask=(nt == 0))
        out = out.append_column("n_trans", pa.array(nt))
        return out.append_column("avg_nll", vals)

    return ds.map_batches(score, batch_format="pyarrow")


# ------------------------------- Naive-Bayes token quality classifier


def train_token_classifier(
    ds: ray.data.Dataset,
    label_col: str = "label",
    text_col: str = "text",
    fanin: int = 8,
) -> dict:
    """Multinomial-NB training for the fasttext/CCNet-style quality
    filter: ONE streaming pass emits per-batch (token, pos_count,
    neg_count) partials (vocabulary-sized) through the size-gated tree
    reduce; the driver keeps the vocabulary-sized model. ``label_col``
    is a boolean column (True = positive class, e.g. curated sources).
    NULL-text docs contribute nothing; NULL labels count as negative
    (cast semantics) — pre-filter if that is not wanted."""

    def partial(batch: pa.Table) -> pa.Table:
        flat, offs = tk.token_strings(batch.column(text_col))
        lab = (
            pc.fill_null(batch.column(label_col), False)
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        rep = np.repeat(lab, np.diff(offs))
        t = pa.table(
            {
                "w": flat,
                "cp": pa.array(rep),
                "cn": pa.array(1 - rep),
            }
        )
        out = pa.TableGroupBy(t, ["w"]).aggregate([("cp", "sum"), ("cn", "sum")])
        return out.rename_columns(["w", "cp", "cn"])

    def combine(tbl: pa.Table) -> pa.Table:
        out = pa.TableGroupBy(tbl, ["w"]).aggregate([("cp", "sum"), ("cn", "sum")])
        return out.rename_columns(["w", "cp", "cn"])

    merged = _tree_or_driver(
        ds.map_batches(partial, batch_format="pyarrow"), combine, fanin
    ).sort_by([("w", "ascending")])
    cp = merged.column("cp").to_numpy(zero_copy_only=False).astype(np.float64)
    cn = merged.column("cn").to_numpy(zero_copy_only=False).astype(np.float64)
    w = merged.column("w")
    return {
        "words": w.combine_chunks() if isinstance(w, pa.ChunkedArray) else w,
        "cp": cp,
        "cn": cn,
        "P": float(cp.sum()),
        "N": float(cn.sum()),
        "V": int(len(cp)),
    }


def score_log_odds(
    ds: ray.data.Dataset,
    model: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    ndigits: int = 4,
) -> ray.data.Dataset:
    """Per-document NB log-odds quality score:

        score(doc) = sum_t [ ln((cp_t+a)/(P+aV)) - ln((cn_t+a)/(N+aV)) ]

    (> 0: looks like the positive class). Tokens unseen at train time
    get the cp=cn=0 smoothed weight. Docs with zero tokens (empty or
    NULL text) score NULL. Model broadcast once (ray.put); per batch one
    ``pc.index_in`` + one weight gather + one segmented reduceat — zero
    shuffle. Rounded half-away to ``ndigits`` (the SQL-oracle rounding
    contract, same as score_avg_nll)."""
    v = float(model["V"])
    weights = np.log((model["cp"] + alpha) / (model["P"] + alpha * v)) - np.log(
        (model["cn"] + alpha) / (model["N"] + alpha * v)
    )
    w_unseen = float(
        np.log(alpha / (model["P"] + alpha * v))
        - np.log(alpha / (model["N"] + alpha * v))
    )
    ref = ray.put({"words": model["words"], "weights": weights})

    def score(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)
        flat, offs = tk.token_strings(batch.column(text_col))
        nt = np.diff(offs).astype(np.int64)
        out = batch.select([id_col])
        if len(flat) == 0:
            out = out.append_column("n_tok", pa.array(nt))
            return out.append_column(
                "score", pa.array([None] * batch.num_rows, pa.float64())
            )
        idx = pc.index_in(flat, value_set=m["words"]).to_numpy(zero_copy_only=False)
        miss = np.isnan(idx.astype(np.float64))
        if m["weights"].size == 0:
            # empty model (all-empty training text): everything is unseen
            lw = np.full(idx.shape, w_unseen)
        else:
            lw = np.where(
                miss, w_unseen, m["weights"][np.nan_to_num(idx).astype(np.int64)]
            )
        sums = np.zeros(len(nt), np.float64)
        nz = nt > 0
        if nz.any():
            sums[nz] = np.add.reduceat(lw, offs[:-1][nz])
        rd = (
            np.floor(np.abs(sums) * 10.0**ndigits + 0.5)
            / 10.0**ndigits
            * np.sign(sums)
        )
        out = out.append_column("n_tok", pa.array(nt))
        return out.append_column("score", pa.array(rd, pa.float64(), mask=(nt == 0)))

    return ds.map_batches(score, batch_format="pyarrow")
