"""Byte-pair-encoding tokenizer: distributed training statistics +
cached vectorized-amortized application.

The reference engine only scans columns for such pipelines
(src/lib.rs:107-169); a training-data stack needs the tokenizer itself,
so this is a north-rule addition. Shape follows Sennrich et al. 2016
(the original BPE-for-NMT formulation, public): merge learning runs on
the WORD-FREQUENCY TABLE, not the corpus — so the distributed part is
one grouped count (vocabulary-sized result through the size-gated
reduce) and the driver-side merge loop is bounded by |vocab| x
|merges|, independent of corpus bytes. Application is the 100-TB-scale
path: an actor pool whose per-batch cost is proportional to NEW
distinct words (per-actor memo cache; word frequencies are Zipfian, so
steady-state hit rate is ~99%+), with all per-token expansion done by
Arrow take/list assembly, never Python-per-token.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from . import tokhash as tk
from .relational import _SMALL_PARTIALS, _tree_or_driver, collect


def word_frequencies(
    ds: ray.data.Dataset, text_col: str = "text", max_words: int | None = None
) -> pa.Table:
    """Distributed (word, freq) table: per-batch Arrow groupby partials,
    size-gated final reduce. ``max_words`` keeps only the most frequent
    words (deterministic freq-desc, word-asc order) — merge learning on
    a truncated Zipf head is standard and bounds driver memory."""

    def partial(batch: pa.Table) -> pa.Table:
        flat, _ = tk.token_strings(batch.column(text_col))
        t = pa.table({"word": flat})
        out = pa.TableGroupBy(t, ["word"]).aggregate([([], "count_all")])
        return out.rename_columns(["word", "freq"])

    def combine(tbl: pa.Table) -> pa.Table:
        out = pa.TableGroupBy(tbl, ["word"]).aggregate([("freq", "sum")])
        return out.rename_columns(["word", "freq"])

    merged = _tree_or_driver(
        ds.map_batches(partial, batch_format="pyarrow"), combine, fanin=32
    )
    merged = merged.sort_by([("freq", "descending"), ("word", "ascending")])
    if max_words is not None and merged.num_rows > max_words:
        merged = merged.slice(0, max_words)
    return merged


def learn_merges(
    word_freq: pa.Table, n_merges: int = 200, end_of_word: str | None = None
) -> list[tuple[str, str]]:
    """Sennrich-style merge learning over the word-frequency table.
    Deterministic: the best pair is (max total freq, then lexicographic
    smallest), so the same corpus always yields the same merge list.
    Cost is |vocab| x n_merges driver-side — vocabulary-sized, never
    corpus-sized (the distributed work already happened in
    ``word_frequencies``). ``end_of_word`` appends the canonical
    Sennrich word-final marker symbol to every word before learning
    (enables lossless detokenization; off by default to keep the
    legacy char-only alphabet)."""
    words = [
        (tuple(w), f)
        for w, f in zip(
            word_freq.column("word").to_pylist(),
            word_freq.column("freq").to_pylist(),
        )
    ]
    if end_of_word:
        words = [(syms + (end_of_word,), f) for syms, f in words]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in words:
            for i in range(len(syms) - 1):
                pair = (syms[i], syms[i + 1])
                counts[pair] = counts.get(pair, 0) + f
        if not counts:
            break
        # max freq; ties -> lexicographically smallest pair
        pair, freq = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if freq < 2:
            break  # nothing left that repeats — further merges are noise
        merges.append(pair)
        a, b = pair
        ab = a + b
        new_words = []
        for syms, f in words:
            if len(syms) > 1:
                out = []
                i = 0
                n = len(syms)
                while i < n:
                    if i < n - 1 and syms[i] == a and syms[i + 1] == b:
                        out.append(ab)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = tuple(out)
            new_words.append((syms, f))
        words = new_words
    return merges


def train_bpe(
    ds: ray.data.Dataset,
    n_merges: int = 200,
    text_col: str = "text",
    max_words: int = 100_000,
    end_of_word: str | None = None,
) -> dict:
    """End-to-end training: distributed word counts -> driver merge
    learning. Returns {"merges": [...], "vocab": [...], "end_of_word":
    ...} where vocab is every base character (plus the end-of-word
    marker when set) plus each merged symbol, id = position. Training
    with ``end_of_word`` (e.g. "</w>") makes token-id streams losslessly
    detokenizable via ``detokenize`` — word boundaries live in the
    symbols themselves."""
    wf = word_frequencies(ds, text_col=text_col, max_words=max_words)
    if end_of_word:
        import pyarrow.compute as pc

        if pc.any(
            pc.match_substring(wf.column("word"), end_of_word)
        ).as_py():
            # a literal occurrence of the marker in the corpus would be
            # indistinguishable from a word boundary at detokenize time
            # — refuse loudly rather than round-trip lossily
            raise ValueError(
                f"end_of_word marker {end_of_word!r} occurs literally in "
                "the corpus; pick an unused marker (e.g. '\x1e')"
            )
    merges = learn_merges(wf, n_merges=n_merges, end_of_word=end_of_word)
    chars = sorted({c for w in wf.column("word").to_pylist() for c in w})
    if end_of_word:
        chars.append(end_of_word)
    vocab = chars + [a + b for a, b in merges]
    return {"merges": merges, "vocab": vocab, "end_of_word": end_of_word}


def _encode_word(
    word: str, ranks: dict[tuple[str, str], int], end_of_word: str | None = None
) -> list[str]:
    """Greedy lowest-rank-first merge application (the canonical BPE
    inference loop). Runs once per DISTINCT word per actor — the memo
    cache in BpeTokenizer amortizes it to ~zero on Zipfian text."""
    syms = list(word) + ([end_of_word] if end_of_word and word else [])
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i < 0:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


class BpeTokenizer:
    """Actor-pool stage: text -> BPE token ids (list<int32>) + count.

    ``__init__`` (once per actor) builds the rank table and the
    word->ids memo; ``__call__`` tokenizes only the batch's distinct
    UNCACHED words in Python (vocabulary-paced, not token-paced) and
    assembles per-doc id lists with numpy repeat/concatenate. Unknown
    characters (absent from training) map to id -1, documented as the
    UNK convention."""

    MAX_CACHE = 2_000_000  # ~a few hundred MB worst case per actor

    def __init__(self, model: dict) -> None:
        self.ranks = {tuple(p): i for i, p in enumerate(model["merges"])}
        self.ids = {s: i for i, s in enumerate(model["vocab"])}
        self.eow = model.get("end_of_word")
        self.cache: dict[str, np.ndarray] = {}

    def _word_ids(self, word: str) -> np.ndarray:
        got = self.cache.get(word)
        if got is None:
            got = np.array(
                [
                    self.ids.get(s, -1)
                    for s in _encode_word(word, self.ranks, self.eow)
                ],
                dtype=np.int32,
            )
            if len(self.cache) >= self.MAX_CACHE:
                # web text has an OPEN vocabulary (urls, hex ids): an
                # unbounded memo grows until the actor OOMs on a long
                # run. Clearing wholesale keeps amortization for the
                # Zipf head (it re-fills in one batch) without tracking
                # LRU order per token.
                self.cache.clear()
            self.cache[word] = got
        return got

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        flat, offs = tk.token_strings(batch.column("text"))
        if len(flat):
            # Python runs once per DISTINCT word (memoized across
            # batches); everything per-token below is numpy gathers
            enc = pc.dictionary_encode(flat)
            uniq_words = enc.dictionary.to_pylist()
            word_idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            uniq_ids = [self._word_ids(w) for w in uniq_words]
            uniq_lens = np.fromiter(
                (len(u) for u in uniq_ids), dtype=np.int64, count=len(uniq_ids)
            )
            flat_uniq = (
                np.concatenate(uniq_ids) if uniq_ids else np.zeros(0, np.int32)
            )
            uniq_starts = np.concatenate([[0], np.cumsum(uniq_lens)])[:-1]
            tok_counts = uniq_lens[word_idx]
            total = int(tok_counts.sum())
            out_starts = np.concatenate([[0], np.cumsum(tok_counts)])[:-1]
            gather = (
                np.repeat(uniq_starts[word_idx], tok_counts)
                + np.arange(total)
                - np.repeat(out_starts, tok_counts)
            )
            all_ids = flat_uniq[gather]
            cum = np.concatenate([[0], np.cumsum(tok_counts)])
        else:
            all_ids = np.zeros(0, np.int32)
            cum = np.zeros(1, np.int64)
        doc_offsets = cum[offs]
        if doc_offsets[-1] >= 2**31:
            raise ValueError("batch token volume overflows int32 list offsets; lower batch_size")
        ids_list = pa.ListArray.from_arrays(
            pa.array(doc_offsets, pa.int32()), pa.array(all_ids, pa.int32())
        )
        out = batch.append_column("token_ids", ids_list)
        return out.append_column(
            "n_bpe", pa.array(np.diff(doc_offsets), pa.int64())
        )


def tokenize(
    ds: ray.data.Dataset, model: dict, concurrency=None
) -> ray.data.Dataset:
    """Apply a trained model corpus-wide: actor pool, model shipped once
    per actor via constructor kwargs (Ray serializes it into the actor,
    not per batch). Pool autoscales below cluster width so producer
    read tasks keep CPUs (a fixed pool == num_cpus starves upstream)."""
    from ..util import default_concurrency

    return ds.map_batches(
        BpeTokenizer,
        fn_constructor_kwargs={"model": model},
        batch_format="pyarrow",
        concurrency=concurrency or default_concurrency(),
    )


def detokenize(
    ds: ray.data.Dataset,
    model: dict,
    ids_col: str = "token_ids",
    out_col: str = "text_detok",
    unk: str = "�",
) -> ray.data.Dataset:
    """token_ids -> text, the exact inverse of ``tokenize`` for models
    trained with ``end_of_word`` (word boundaries live in the marker
    symbol, so the output is the whitespace-normalized original text;
    UNK ids (-1) render as ``unk``). Raises for marker-less models —
    their id streams do not carry word boundaries.

    Vectorized per batch: ONE vocab-table take over the flattened id
    stream (UNK ids redirected to an appended slot), one list
    ``binary_join`` with the empty separator, one ``replace_substring``
    turning markers into spaces + trailing-space trim. No shuffle."""
    eow = model.get("end_of_word")
    if not eow:
        raise ValueError(
            "detokenize requires a model trained with end_of_word= (the "
            "marker is what makes word boundaries recoverable)"
        )
    vocab = pa.array(list(model["vocab"]) + [unk], pa.large_string())
    unk_slot = len(model["vocab"])

    def fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        la = batch.column(ids_col)
        if isinstance(la, pa.ChunkedArray):
            la = la.combine_chunks()
        flat = la.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        flat = np.where((flat < 0) | (flat >= unk_slot), unk_slot, flat)
        syms = vocab.take(pa.array(flat, pa.int64()))
        offs = la.offsets
        if isinstance(offs, pa.ChunkedArray):
            offs = offs.combine_chunks()
        offs_np = offs.to_numpy(zero_copy_only=False).astype(np.int64)
        out_la = pa.LargeListArray.from_arrays(
            pa.array(offs_np - offs_np[0], pa.int64()), syms
        )
        joined = pc.binary_join(out_la, pa.scalar("", pa.large_string()))
        text = pc.utf8_rtrim(
            pc.replace_substring(joined, pattern=eow, replacement=" "), " "
        )
        return pa.table({c: batch.column(c) for c in batch.column_names if c != ids_col}).append_column(
            out_col, text
        )

    return ds.map_batches(fn, batch_format="pyarrow")
