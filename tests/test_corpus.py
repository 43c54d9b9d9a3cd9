"""Corpus-analytics operators (pipelines/corpus.py): n-gram top-k,
per-lang vocabulary (exact + HLL), C4-style filtering, stratified
sampling, and the star-schema broadcast aggregate."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data

from datafusion_orc_ray.pipelines import corpus
from datafusion_orc_ray.pipelines import relational as rel


def _docs_table() -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array(range(8), pa.int64()),
            "lang": ["en", "en", "de", "de", "en", "de", "en", "en"],
            "text": [
                "the cat sat",          # grams: "the cat", "cat sat"
                "the cat ran",          # "the cat", "cat ran"
                "the cat sat",          # dup of 0
                "  padded   text  ",    # edge: padded whitespace
                "one",                  # 1 token -> no bigram
                "",                     # blank -> 0 tokens
                None,                   # null -> 0 tokens
                "the cat",              # "the cat"
            ],
        }
    )


def test_ngram_topk_counts(ray_session):
    ds = ray.data.from_arrow(_docs_table())
    out = corpus.ngram_topk(ds, n=2, k=3)
    got = dict(zip(out.column("gram").to_pylist(), out.column("n").to_pylist()))
    assert got == {"the cat": 4, "cat sat": 2, "cat ran": 1}
    # deterministic tie-break: n desc then gram asc
    assert out.column("gram").to_pylist() == ["the cat", "cat sat", "cat ran"]


def test_ngram_topk_distributed_path_matches(ray_session, monkeypatch):
    """Force the distributed groupby + per-block-top-k path (gate=0) and
    check it returns the identical table."""
    ds = ray.data.from_arrow(_docs_table())
    small = corpus.ngram_topk(ds, n=2, k=3)
    monkeypatch.setattr(corpus, "_SMALL_PARTIALS", 0)
    big = corpus.ngram_topk(ds, n=2, k=3)
    assert big.equals(small)


def test_vocab_per_lang_exact(ray_session, monkeypatch):
    ds = ray.data.from_arrow(_docs_table())
    out = corpus.vocab_per_lang(ds)
    got = dict(zip(out.column("lang").to_pylist(), out.column("n_vocab").to_pylist()))
    # en: the cat sat ran one -> 5; de: the cat sat padded text -> 5
    assert got == {"en": 5, "de": 5}
    monkeypatch.setattr(corpus, "_SMALL_PARTIALS", 0)
    big = corpus.vocab_per_lang(ds)
    got2 = dict(zip(big.column("lang").to_pylist(), big.column("n_vocab").to_pylist()))
    assert got2 == got


def test_hll_accuracy_large_vocab(ray_session):
    """50k distinct tokens, two langs: HLL estimate within 3% (p=14 ->
    ~0.8% std error; 3% ≈ 3.7 sigma) while each partial stays 16 KiB."""
    rng = np.random.default_rng(7)
    texts, langs = [], []
    for lang, n_tok in (("en", 50_000), ("de", 20_000)):
        toks = [f"{lang}tok{i}" for i in range(n_tok)]
        # spread tokens over many docs, with repeats
        for d in range(200):
            idx = rng.integers(0, n_tok, 400)
            texts.append(" ".join(toks[i] for i in idx))
            langs.append(lang)
    tbl = pa.table({"lang": langs, "text": texts})
    ds = ray.data.from_arrow(tbl)
    out = corpus.hll_vocab_per_lang(ds)
    got = dict(zip(out.column("lang").to_pylist(), out.column("n_approx").to_pylist()))
    exact_tbl = corpus.vocab_per_lang(ds)
    exact = dict(
        zip(exact_tbl.column("lang").to_pylist(), exact_tbl.column("n_vocab").to_pylist())
    )
    for lang in exact:
        rel_err = abs(got[lang] - exact[lang]) / exact[lang]
        assert rel_err < 0.03, (lang, got[lang], exact[lang])


def test_c4_filter_rules(ray_session):
    tbl = pa.table(
        {
            "doc_id": pa.array(range(5), pa.int64()),
            "text": [
                " ".join(["word"] * 25),   # 25 tokens, mean len 4 -> keep
                " ".join(["word"] * 10),   # too few tokens
                " ".join(["a"] * 30),      # mean len 1 -> drop
                None,                       # null -> drop
                "  " + " ".join(["word"] * 25) + "  ",  # padded -> keep
            ],
        }
    )
    out = rel.collect(corpus.c4_quality_filter(ray.data.from_arrow(tbl)))
    assert out.column("doc_id").to_pylist() == [0, 4]
    assert out.column("n_tok").to_pylist() == [25, 25]
    assert out.column("mean_tok_len").to_pylist() == [4.0, 4.0]


def test_stratified_sample_deterministic_and_rated(ray_session):
    n = 20_000
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "lang": pa.array(["en" if i % 2 else "de" for i in range(n)]),
        }
    )
    ds = ray.data.from_arrow(tbl)
    rates = {"en": 0.5, "de": 0.1}
    a = rel.collect(corpus.stratified_sample(ds, rates)).sort_by("doc_id")
    b = rel.collect(corpus.stratified_sample(ds, rates)).sort_by("doc_id")
    assert a.equals(b)  # same rows every run
    langs = a.column("lang").to_pylist()
    n_en = sum(1 for l in langs if l == "en")
    n_de = len(langs) - n_en
    assert abs(n_en / 10_000 - 0.5) < 0.02
    assert abs(n_de / 10_000 - 0.1) < 0.02
    # unknown stratum drops under default_rate=0
    tbl2 = pa.table({"doc_id": pa.array([1, 2], pa.int64()), "lang": ["xx", "en"]})
    out2 = rel.collect(corpus.stratified_sample(ray.data.from_arrow(tbl2), rates))
    assert "xx" not in out2.column("lang").to_pylist()


def test_broadcast_star_agg(ray_session):
    fact = pa.table(
        {
            "fk": pa.array([1, 1, 2, 3, 99], pa.int64()),  # 99 unmatched
            "amount": pa.array([10.0, 20.0, 5.0, 7.0, 1000.0]),
        }
    )
    dim = pa.table(
        {
            "pk": pa.array([1, 2, 3], pa.int64()),
            "grp": ["a", "a", "b"],
        }
    )
    out = rel.broadcast_star_agg(
        ray.data.from_arrow(fact),
        dim,
        "fk",
        "pk",
        ["grp"],
        lambda b: b.column("amount"),
    ).sort_by("grp")
    assert out.column("grp").to_pylist() == ["a", "b"]
    assert out.column("total").to_pylist() == [35.0, 7.0]
    assert out.column("n").to_pylist() == [3, 1]


def test_fnv1a_strings_matches_reference():
    """tokhash.fnv1a_strings == byte-wise FNV-1a + fmix64 (the contract
    the simhash DuckDB oracle reproduces in SQL)."""
    import numpy as np
    import pyarrow as pa

    from datafusion_orc_ray.pipelines import tokhash as tk

    def ref(s: str) -> int:
        h = 0xCBF29CE484222325
        for b in s.encode():
            h = ((h ^ b) * 0x100000001B3) & (2**64 - 1)
        h ^= h >> 33
        h = (h * 0xFF51AFD7ED558CCD) & (2**64 - 1)
        h ^= h >> 33
        h = (h * 0xC4CEB9FE1A85EC53) & (2**64 - 1)
        h ^= h >> 33
        return h

    toks = ["hello", "", "a", "the", "zebra42", "x" * 30, "Ünïcödé"]
    got = tk.fnv1a_strings(pa.array(toks)).tolist()
    assert got == [ref(t) for t in toks]
    # uniform bits (SimHash needs this; raw FNV fails it on short tokens)
    h = tk.fnv1a_strings(pa.array([f"tok{i}" for i in range(20000)]))
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).mean(axis=0)
    assert abs(bits - 0.5).max() < 0.02


def test_repetition_signals_edges(ray_session):
    """Gopher repetition signals: exact fractions on planted docs, nulls
    and degenerate docs handled (mirrors the DuckDB oracle semantics)."""
    import ray.data

    from datafusion_orc_ray.pipelines import text as tx
    from datafusion_orc_ray.pipelines.relational import collect

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": pa.array(
                [
                    "one\none\ntwo\n\none",  # 4 non-empty lines: one x3, two x1
                    "a b a b a b c",  # bigrams: ab x3, ba x2, bc x1
                    None,
                    "",
                    "solo",
                ]
            ),
        }
    )
    out = collect(tx.repetition_signals(ray.data.from_arrow(t))).sort_by("doc_id")
    d = out.to_pydict()
    assert d["dup_line_frac"] == [2 / 4, 0.0, None, 0.0, 0.0]
    assert d["dup_char_frac"] == [6 / 12, 0.0, None, 0.0, 0.0]
    # doc 1 tokens [one one two one] -> 3 distinct bigrams, each x1 -> 1/3
    assert d["top_bigram_frac"] == [1 / 3, 3 / 6, None, 0.0, 0.0]


def test_quantile_length_filter_per_lang_gate(ray_session):
    """Each language drops its own short tail; NULL text never passes;
    NULL lang forms its own partition (SQL PARTITION BY semantics)."""
    import duckdb
    import ray.data

    import pyarrow as pa

    from datafusion_orc_ray.pipelines import corpus
    from datafusion_orc_ray.pipelines.relational import collect

    rows = []
    for i, lang, n in [
        (0, "en", 10), (1, "en", 100), (2, "en", 200), (3, "en", 300),
        (4, "de", 1), (5, "de", 2), (6, "de", 3),
        (7, None, 50), (8, None, 5),
    ]:
        rows.append((i, lang, "x" * n))
    rows.append((9, "en", None))
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "lang": pa.array([r[1] for r in rows]),
        "text": pa.array([r[2] for r in rows]),
    })
    got = collect(
        corpus.quantile_length_filter(ray.data.from_arrow(t), q=0.25)
    ).sort_by([("doc_id", "ascending")])
    con = duckdb.connect()
    con.register("documents", t)
    exp = con.sql(
        "SELECT doc_id, lang, n_chars FROM (SELECT doc_id, lang, "
        "length(text) AS n_chars, quantile_cont(length(text), 0.25) "
        "OVER (PARTITION BY lang) AS thr FROM documents) t "
        "WHERE n_chars >= thr ORDER BY doc_id"
    ).arrow()
    assert got.cast(exp.schema).equals(exp)
    assert 9 not in got.column("doc_id").to_pylist()  # null text dropped


def test_approx_ngram_topk_matches_exact_when_untruncated(ray_session):
    """With m above per-batch cardinality no batch truncates: counts are
    exact, the cut is proven, and the result equals ngram_topk."""
    import ray.data

    import pyarrow as pa

    from datafusion_orc_ray.pipelines import corpus

    docs = pq_docs = None
    t = _docs_table()
    ds = ray.data.from_arrow(t)
    exact = corpus.ngram_topk(ds, n=2, k=10)
    approx = corpus.approx_ngram_topk(ray.data.from_arrow(t), n=2, k=10, m=1 << 20)
    assert approx.column("exact").to_pylist() == [True] * approx.num_rows
    assert approx.column("gram").to_pylist() == exact.column("gram").to_pylist()
    assert approx.column("n").to_pylist() == exact.column("n").to_pylist()


def test_approx_ngram_topk_bounds_hold_under_truncation(ray_session):
    """With aggressive truncation the [n, n_high] interval still brackets
    every reported gram's true count."""
    import ray.data

    from datafusion_orc_ray.pipelines import corpus

    t = _docs_table()
    # many small blocks -> many truncating partials
    ds = ray.data.from_arrow(t).repartition(16)
    exact = corpus.ngram_topk(ray.data.from_arrow(t), n=2, k=10_000)
    truth = dict(zip(exact.column("gram").to_pylist(), exact.column("n").to_pylist()))
    approx = corpus.approx_ngram_topk(ds, n=2, k=10, m=8)
    for g, lo, hi in zip(
        approx.column("gram").to_pylist(),
        approx.column("n").to_pylist(),
        approx.column("n_high").to_pylist(),
    ):
        assert lo <= truth[g] <= hi, (g, lo, truth[g], hi)


def test_approx_ngram_topk_distributed_path(ray_session, monkeypatch):
    """Force the distributed merge (gate at 0) and require the same
    proven-exact result as the driver path."""
    import ray.data

    from datafusion_orc_ray.pipelines import corpus

    t = _docs_table()
    monkeypatch.setattr(corpus, "_SMALL_PARTIALS", 0)
    approx = corpus.approx_ngram_topk(ray.data.from_arrow(t), n=2, k=10, m=1 << 20)
    exact = corpus.ngram_topk(ray.data.from_arrow(t), n=2, k=10)
    assert approx.column("exact").to_pylist() == [True] * approx.num_rows
    assert approx.column("gram").to_pylist() == exact.column("gram").to_pylist()
    assert approx.column("n").to_pylist() == exact.column("n").to_pylist()


def test_approx_grouped_quantile_rank_error(ray_session):
    """The approx p50/p90 lands within 2/bins rank error of the true
    rank per group, on skewed lognormal data split over many batches."""
    import numpy as np
    import ray.data

    import pyarrow as pa

    from datafusion_orc_ray.pipelines import corpus

    rng = np.random.default_rng(11)
    n = 40_000
    langs = rng.choice(["en", "de", "fr"], n)
    vals = np.exp(rng.normal(0, 2, n))  # heavy tail
    t = pa.table({"lang": pa.array(langs), "val": pa.array(vals)})
    ds = ray.data.from_arrow(t).repartition(12)
    for q in (0.5, 0.9):
        got = corpus.approx_grouped_quantile(ds, ["lang"], "val", q=q, bins=128)
        for lang, qv in zip(got.column("lang").to_pylist(), got.column("qv").to_pylist()):
            grp = np.sort(vals[langs == lang])
            rank = np.searchsorted(grp, qv) / grp.size
            assert abs(rank - q) <= 2 / 128 + 1e-9, (lang, q, rank)


def test_remove_boilerplate_lines_newline(ray_session):
    """Planted multi-line docs: the shared footer/banner lines cross the
    min_docs threshold and vanish; unique lines survive in order; a doc
    made entirely of hot lines is dropped; a NULL doc passes through as
    NULL (it has no lines — it is not boilerplate evidence and not
    strippable); ''-docs carry one empty line that here stays under the
    threshold, so they survive unchanged."""
    docs, ids = [], []
    for i in range(10):
        lines = [f"unique {i}", "SHARED FOOTER", f"body {i}"]
        if i % 2 == 0:
            lines.insert(0, "COOKIE BANNER")
        docs.append("\n".join(lines))
        ids.append(i)
    docs += ["COOKIE BANNER\nSHARED FOOTER", None, "", ""]
    ids += [10, 11, 12, 13]
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": docs})

    out = rel.collect(
        corpus.remove_boilerplate_lines(
            ray.data.from_arrow(tbl).repartition(3), min_docs=3
        )
    ).sort_by("doc_id")
    assert out.column("doc_id").to_pylist() == list(range(10)) + [11, 12, 13]
    assert out.column("text").to_pylist() == [
        f"unique {i}\nbody {i}" for i in range(10)
    ] + [None, "", ""]


def test_remove_boilerplate_counts_distinct_docs(ray_session):
    """A line repeated many times INSIDE one doc counts once toward the
    threshold (distinct-document frequency, not raw frequency)."""
    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": ["spam\nspam\nspam\nspam\nkeep", "other"],
        }
    )
    out = rel.collect(
        corpus.remove_boilerplate_lines(ray.data.from_arrow(tbl), min_docs=2)
    ).sort_by("doc_id")
    # "spam" appears in only 1 distinct doc -> below threshold -> kept
    assert out.column("text").to_pylist() == [
        "spam\nspam\nspam\nspam\nkeep",
        "other",
    ]


def test_mixture_resample(ray_session):
    """floor(w) repeats + deterministic fractional coin; w=0 drops the
    source; replica indexes are 0..n-1 per doc; unknown sources use the
    default weight; expansion is partitioning-invariant."""
    n = 4000
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "source": pa.array(
                ["a", "b", "zero", "other"][0:4] * (n // 4), pa.string()
            ),
        }
    )
    w = {"a": 2.5, "b": 0.5, "zero": 0.0}
    out = rel.collect(
        corpus.mixture_resample(ray.data.from_arrow(tbl).repartition(5), w)
    ).sort_by([("doc_id", "ascending"), ("replica", "ascending")])

    import collections

    per_doc = collections.Counter(out.column("doc_id").to_pylist())
    srcs = dict(zip(tbl.column("doc_id").to_pylist(), tbl.column("source").to_pylist()))
    for d, c in per_doc.items():
        s = srcs[d]
        if s == "a":
            assert c in (2, 3)
        elif s == "b":
            assert c == 1
        elif s == "other":
            assert c == 1  # default weight 1.0, frac 0
    assert not any(srcs[d] == "zero" for d in per_doc)  # w=0 -> dropped
    # fractional part realized at ~the expected rate
    a_counts = [per_doc[d] for d in per_doc if srcs[d] == "a"]
    frac3 = sum(1 for c in a_counts if c == 3) / len(a_counts)
    assert 0.4 < frac3 < 0.6
    # replica indices are contiguous from 0
    got = {}
    for d, r in zip(out.column("doc_id").to_pylist(), out.column("replica").to_pylist()):
        got.setdefault(d, []).append(r)
    assert all(rs == list(range(len(rs))) for rs in got.values())
    # determinism across a different partitioning
    out2 = rel.collect(
        corpus.mixture_resample(ray.data.from_arrow(tbl).repartition(2), w)
    ).sort_by([("doc_id", "ascending"), ("replica", "ascending")])
    assert out.equals(out2)


def test_tfidf_top_terms(ray_session):
    """A term concentrated in one lang outranks corpus-wide terms there;
    ubiquitous terms score ln(N/N)=0; ranking is deterministic on ties."""
    tbl = pa.table(
        {
            "doc_id": pa.array(range(6), pa.int64()),
            "lang": ["en", "en", "en", "de", "de", "de"],
            "text": [
                "shared kitten kitten",
                "shared kitten",
                "shared",
                "shared hund",
                "shared hund",
                "shared",
            ],
        }
    )
    out = corpus.tfidf_top_terms(
        ray.data.from_arrow(tbl).repartition(3), k=2
    )
    rows = list(
        zip(
            out.column("lang").to_pylist(),
            out.column("term").to_pylist(),
            out.column("score").to_pylist(),
        )
    )
    en = [r for r in rows if r[0] == "en"]
    de = [r for r in rows if r[0] == "de"]
    assert en[0][1] == "kitten" and en[0][2] == pytest.approx(
        3 * np.log(6 / 2), abs=1e-4
    )
    assert de[0][1] == "hund" and de[0][2] == pytest.approx(
        2 * np.log(6 / 2), abs=1e-4
    )
    # "shared" is in every doc -> idf 0 -> score 0, still rank 2
    assert en[1][1] == "shared" and en[1][2] == 0.0


def test_url_features_kernel(ray_session):
    """host/tld/path_depth/is_https extraction: malformed and NULL urls
    yield NULL features; query/fragment never count toward the path."""
    import ray.data as rdata

    from datafusion_orc_ray.pipelines import text as tx

    urls = [
        "https://A.Example.COM/x/y?q=/1#/f",
        "http://foo.org",
        "ftp://nope.com/x",
        "garbage",
        None,
        "https://one.two.three.net/a/b/c",
    ]
    out = rel.collect(
        tx.url_features(rdata.from_arrow(pa.table({"url": pa.array(urls)})))
    )
    assert out.column("host").to_pylist() == [
        "a.example.com", "foo.org", None, None, None, "one.two.three.net"]
    assert out.column("tld").to_pylist() == ["com", "org", None, None, None, "net"]
    assert out.column("path_depth").to_pylist() == [2, 0, None, None, None, 3]
    assert out.column("is_https").to_pylist() == [True, False, None, None, None, True]
