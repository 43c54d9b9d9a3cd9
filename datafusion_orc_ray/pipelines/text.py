"""Text-analysis stages for large-scale training-data pipelines:
token counting, quality scoring, n-gram language ID, document
fingerprinting. All vectorized map_batches over the ``documents`` table
(pyarrow.compute / numpy in the hot path; compiled state lives in actor
``__init__``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

TOKEN_RE = r"\S+"


def token_counts(ds: ray.data.Dataset) -> ray.data.Dataset:
    """doc_id, n_tokens (whitespace tokenization, vectorized)."""

    def fn(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(batch.column("text"), TOKEN_RE)
        return pa.table({"doc_id": batch.column("doc_id"), "n_tokens": pc.cast(n, pa.int64())})

    return ds.map_batches(fn, batch_format="pyarrow")


BPE_ISH_RE = (
    r"'(?:[sdmt]|ll|ve|re)| ?[[:alpha:]]+| ?[[:digit:]]+"
    r"| ?[^\s[:alpha:][:digit:]]+|\s+"
)


def bpe_token_counts(ds: ray.data.Dataset) -> ray.data.Dataset:
    """doc_id, n_bpe_tokens — GPT2-style pre-tokenizer segment count
    (contraction suffixes / letter runs / digit runs / punctuation runs /
    whitespace), one vectorized RE2 pass per batch. The same pattern runs
    in DuckDB's regexp_extract_all (also RE2), giving an exact oracle."""

    def fn(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(batch.column("text"), BPE_ISH_RE)
        return pa.table({"doc_id": batch.column("doc_id"), "n_bpe_tokens": pc.cast(n, pa.int64())})

    return ds.map_batches(fn, batch_format="pyarrow")


def quality_scores(ds: ray.data.Dataset) -> ray.data.Dataset:
    """doc_id, n_chars_m, n_spaces — the SQL-checkable core of a quality
    scorer (length + whitespace density)."""

    def fn(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        n_chars = pc.cast(pc.utf8_length(text), pa.int64())
        n_spaces = pc.cast(pc.count_substring(text, " "), pa.int64())
        return pa.table(
            {"doc_id": batch.column("doc_id"), "n_chars_m": n_chars, "n_spaces": n_spaces}
        )

    return ds.map_batches(fn, batch_format="pyarrow")


class QualityScorer:
    """Full quality scorer (actor pool: compiled regex + stopword set in
    __init__). Emits stopword/alpha/upper ratios — not SQL-oracle'd, but
    deterministic and covered by unit tests."""

    def __init__(self) -> None:
        import re

        self.word = re.compile(r"[A-Za-z]+")
        self.stop = {"the", "and", "of", "a", "to", "in", "is", "it", "for", "on"}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        stop_ratio, alpha_ratio = [], []
        for t in texts:
            if not t:
                stop_ratio.append(None)
                alpha_ratio.append(None)
                continue
            words = self.word.findall(t.lower())
            stop_ratio.append(sum(w in self.stop for w in words) / max(len(words), 1))
            alpha = sum(c.isalpha() for c in t[:2000])
            alpha_ratio.append(alpha / max(len(t[:2000]), 1))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "stop_ratio": pa.array(stop_ratio, pa.float64()),
                "alpha_ratio": pa.array(alpha_ratio, pa.float64()),
            }
        )


class LangId:
    """Character-n-gram language-ID heuristic (actor pool; profile built
    once in __init__ — no external models). Scores each doc against
    per-language character-class/frequency signatures."""

    SIGS = {
        "en": " the and ing ion to of",
        "de": " der die und sch ein ich",
        "fr": " le les de la et des que",
        "es": " el la los de que cion y",
        "pt": " de que nao os uma com",
        "it": " di che il la per non",
        "nl": " de het een van en niet",
        "ru": "оеаинтсрвл",
        "zh": "的一是不了人我在有他",
        "ja": "のにはをたがでてとし",
    }

    def __init__(self) -> None:
        self.trigram_sets = {
            lang: {sig[i : i + 3] for i in range(len(sig) - 2)} if lang not in ("ru", "zh", "ja")
            else set(sig)
            for lang, sig in self.SIGS.items()
        }

    def _score(self, text: str) -> str:
        sample = text[:500].lower()
        best, best_score = "en", -1.0
        for lang, grams in self.trigram_sets.items():
            if lang in ("ru", "zh", "ja"):
                hits = sum(c in grams for c in sample)
            else:
                hits = sum(sample[i : i + 3] in grams for i in range(max(len(sample) - 2, 0)))
            score = hits / max(len(sample), 1)
            if score > best_score:
                best, best_score = lang, score
        return best

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = [None if t is None else self._score(t) for t in batch.column("text").to_pylist()]
        return pa.table({"doc_id": batch.column("doc_id"), "lang_pred": pa.array(preds, pa.string())})


def langid(ds: ray.data.Dataset, concurrency: int | None = None) -> ray.data.Dataset:
    from ..util import default_concurrency

    return ds.map_batches(
        LangId, batch_format="pyarrow", concurrency=concurrency or default_concurrency()
    )


_FP_BASE = np.uint64(1099511628211)  # FNV-ish multiplier for the rolling hash


def fingerprints(ds: ray.data.Dataset) -> ray.data.Dataset:
    """doc_id, fingerprint — order-sensitive polynomial rolling hash over
    the UTF-8 bytes (fp = sum b[i] * BASE^(len-1-i) mod 2^64), fully
    vectorized across the batch: one flat byte buffer, per-position power
    exponents from the row offsets, one segmented reduceat."""

    def fn(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        valid = text.is_valid().to_numpy(zero_copy_only=False)
        from ..stripe import _binary_parts

        n_valid = int(valid.sum())
        if n_valid == 0:
            fps_valid = np.empty(0, dtype=np.uint64)
        else:
            data_u8, offs = _binary_parts(text)
            data = data_u8.astype(np.uint64)
            lens = np.diff(offs)
            n_bytes = data.size
            if n_bytes:
                # exponent of byte i = (row_end - 1 - i); build via repeat
                row_end_at = np.repeat(offs[1:], lens)
                exp = row_end_at - 1 - np.arange(n_bytes, dtype=np.int64)
                max_len = int(lens.max())
                pow_table = np.empty(max_len + 1, dtype=np.uint64)
                pow_table[0] = 1
                np.multiply.accumulate(
                    np.full(max_len, _FP_BASE, np.uint64), out=pow_table[1:]
                )
                terms = data * pow_table[exp]
                starts = offs[:-1]
                # reduceat needs strictly valid indices; empty rows -> 0
                nonempty = lens > 0
                fps_valid = np.zeros(n_valid, dtype=np.uint64)
                if nonempty.any():
                    seg = np.add.reduceat(terms, starts[nonempty])
                    fps_valid[nonempty] = seg
            else:
                fps_valid = np.zeros(n_valid, dtype=np.uint64)
        full = np.zeros(len(text), dtype=np.int64)
        full[valid] = fps_valid.view(np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "fingerprint": pa.array(full, pa.int64(), mask=~valid),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")
