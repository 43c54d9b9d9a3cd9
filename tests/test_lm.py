"""Bigram LM (pipelines/lm.py): hand-computed smoothing math, edge
docs (null/empty/one-token), partitioning invariance."""

import math

import numpy as np
import pyarrow as pa
import ray.data

from datafusion_orc_ray.pipelines import lm
from datafusion_orc_ray.pipelines.relational import collect


def _score_table(texts, nparts=2, alpha=0.4):
    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
    )
    ds = ray.data.from_arrow(tbl).repartition(nparts)
    model = lm.train_bigram_lm(ds)
    out = collect(lm.score_avg_nll(ds, model, alpha=alpha)).sort_by("doc_id")
    return model, out


def test_counts_and_smoothed_score_by_hand(ray_session):
    # corpus: "a b" x2 and "a c": uni a=3,b=2? no: tokens a,b,a,b,a,c
    model, out = _score_table(["a b", "a b", "a c"], nparts=1)
    assert model["vocab"] == 3
    uni = dict(zip(model["uni_words"].to_pylist(), model["uni_counts"].tolist()))
    assert uni == {"a": 3.0, "b": 2.0, "c": 1.0}
    big = dict(zip(model["big_keys"].to_pylist(), model["big_counts"].tolist()))
    # keys carry a len(w1) prefix (injective packing even for tokens
    # containing the separator byte)
    assert big == {"1\x1fa\x1fb": 2.0, "1\x1fa\x1fc": 1.0}
    a = 0.4
    nll_ab = -math.log((2 + a) / (3 + a * 3))
    nll_ac = -math.log((1 + a) / (3 + a * 3))
    got = out.column("avg_nll").to_pylist()
    assert got[0] == round(nll_ab, 4) == got[1]
    assert got[2] == round(nll_ac, 4)
    assert out.column("n_trans").to_pylist() == [1, 1, 1]


def test_edge_docs_score_null(ray_session):
    _, out = _score_table(["x y z", "", None, "solo"])
    nt = out.column("n_trans").to_pylist()
    nll = out.column("avg_nll").to_pylist()
    assert nt == [2, 0, 0, 0]
    assert nll[1] is None and nll[2] is None and nll[3] is None
    assert nll[0] is not None and nll[0] > 0


def test_unseen_bigram_smoothing(ray_session):
    # score a doc whose transition never occurs in training: count 0
    tbl = pa.table({"doc_id": pa.array([0], pa.int64()), "text": ["c a"]})
    train = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([0], pa.int64()), "text": ["a b c"]})
    )
    model = lm.train_bigram_lm(train)
    out = collect(lm.score_avg_nll(ray.data.from_arrow(tbl), model, alpha=0.4))
    a = 0.4
    expect = -math.log((0 + a) / (1 + a * 3))  # c(c)=1, V=3, c(c,a)=0
    assert out.column("avg_nll").to_pylist()[0] == round(expect, 4)


def test_partitioning_invariance(ray_session):
    rng = np.random.default_rng(4)
    words = ["alpha", "beta", "gamma", "delta", "eps"]
    texts = [" ".join(rng.choice(words, rng.integers(0, 12))) for _ in range(400)]
    m1, o1 = _score_table(texts, nparts=1)
    m9, o9 = _score_table(texts, nparts=9)
    assert m1["vocab"] == m9["vocab"]
    assert np.allclose(m1["big_counts"], m9["big_counts"])
    assert o1.equals(o9)


# -------------------------- Naive-Bayes token quality classifier


def test_nb_classifier_hand_math(ray_session):
    """2-doc corpus, hand-computed log-odds: pos doc 'a a b', neg doc
    'a c'. cp: a=2,b=1,c=0; cn: a=1,b=0,c=1; P=3, N=2, V=3."""
    import math

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "label": [True, False],
            "text": ["a a b", "a c"],
        }
    )
    ds = ray.data.from_arrow(tbl)
    model = lm.train_token_classifier(ds)
    assert model["P"] == 3.0 and model["N"] == 2.0 and model["V"] == 3
    out = collect(lm.score_log_odds(ds, model)).sort_by("doc_id")
    a = 0.5

    def w(cp, cn):
        return math.log((cp + a) / (3 + a * 3)) - math.log((cn + a) / (2 + a * 3))

    want0 = round(2 * w(2, 1) + w(1, 0), 4)
    want1 = round(w(2, 1) + w(0, 1), 4)
    got = out.column("score").to_pylist()
    assert abs(got[0] - want0) < 1e-9 and abs(got[1] - want1) < 1e-9
    # the positive doc scores higher than the negative one
    assert got[0] > 0 > got[1]


def test_nb_classifier_unseen_null_empty(ray_session):
    train = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "label": [True, False],
                "text": ["good words", "bad stuff"],
            }
        )
    )
    model = lm.train_token_classifier(train)
    test = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": ["never seen tokens", None, ""],
            }
        )
    )
    out = collect(lm.score_log_odds(test, model)).sort_by("doc_id")
    rows = out.to_pylist()
    # unseen tokens get the cp=cn=0 smoothed weight (finite, not NaN)
    assert rows[0]["score"] is not None
    assert rows[1]["score"] is None and rows[1]["n_tok"] == 0
    assert rows[2]["score"] is None and rows[2]["n_tok"] == 0


def test_nb_classifier_partitioning_invariant(ray_session):
    rng = np.random.default_rng(3)
    words = ["alpha", "beta", "gamma", "delta"]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(100), pa.int64()),
            "label": [bool(i % 2) for i in range(100)],
            "text": [" ".join(rng.choice(words, 6)) for _ in range(100)],
        }
    )
    a = None
    for parts in (1, 9):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        model = lm.train_token_classifier(ds)
        out = collect(lm.score_log_odds(ds, model)).sort_by("doc_id")
        if a is None:
            a = out
        else:
            assert a.equals(out)
