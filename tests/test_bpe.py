"""BPE tokenizer (pipelines/bpe.py): merge learning on the word-freq
table, greedy rank application, Ray train/apply round trip."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from datafusion_orc_ray.pipelines import bpe
from datafusion_orc_ray.pipelines.relational import collect


def test_learn_merges_classic_example():
    """Sennrich's low/lower/newest family: first merge is the highest
    total-frequency pair, ties break lexicographically, merges stop when
    no pair repeats."""
    wf = pa.table(
        {"word": ["low", "lower", "lowest", "newer", "newest"],
         "freq": [5, 2, 2, 6, 3]}
    )
    merges = bpe.learn_merges(wf, n_merges=3)
    # ('w','e') freq 2+6+3=11 beats ('l','o') 9
    assert merges[0] == ("w", "e")
    # after w+e: ('e','we') 6+3=9 ties ('l','o') 9 -> lexicographic
    assert merges[1] == ("e", "we")
    assert merges[2] == ("l", "o")


def test_encode_word_greedy_rank_order():
    ranks = {("w", "e"): 0, ("l", "o"): 1, ("lo", "we"): 2}
    assert bpe._encode_word("lowe", ranks) == ["lowe"]
    assert bpe._encode_word("low", ranks) == ["lo", "w"]
    assert bpe._encode_word("xyz", ranks) == ["x", "y", "z"]
    assert bpe._encode_word("", ranks) == []


def test_train_and_tokenize_roundtrip(ray_session):
    """Token ids reconstruct the original characters exactly; empty and
    null docs yield zero tokens; unknown chars map to -1."""
    tbl = pa.table(
        {
            "doc_id": pa.array(range(4), pa.int64()),
            "text": ["low low lower", "newer newest", "", None],
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(2)
    model = bpe.train_bpe(ds, n_merges=10)
    out = collect(bpe.tokenize(ds, model)).sort_by("doc_id")
    vocab = model["vocab"]
    ids = out.column("token_ids").to_pylist()
    assert "".join(vocab[i] for i in ids[0]) == "lowlowlower"
    assert "".join(vocab[i] for i in ids[1]) == "newernewest"
    assert out.column("n_bpe").to_pylist()[2:] == [0, 0]

    # unknown character at apply time -> -1 (UNK), not a crash
    unk = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([0], pa.int64()), "text": ["low?"]})
    )
    u = collect(bpe.tokenize(unk, model))
    assert -1 in u.column("token_ids").to_pylist()[0]


def test_tokenize_partitioning_invariant(ray_session):
    """Same model + same docs -> identical ids at any partitioning
    (actor caches are per-actor but the function is pure)."""
    rng = np.random.default_rng(7)
    words = ["alpha", "beta", "gamma", "delta", "alphabet", "betamax"]
    texts = [" ".join(rng.choice(words, 8)) for _ in range(300)]
    tbl = pa.table(
        {"doc_id": pa.array(range(300), pa.int64()), "text": texts}
    )
    model = bpe.train_bpe(ray.data.from_arrow(tbl), n_merges=30)
    a = collect(bpe.tokenize(ray.data.from_arrow(tbl).repartition(1), model)).sort_by("doc_id")
    b = collect(bpe.tokenize(ray.data.from_arrow(tbl).repartition(7), model)).sort_by("doc_id")
    assert a.column("token_ids").to_pylist() == b.column("token_ids").to_pylist()
    # merged symbols actually compress: fewer tokens than characters
    n_chars = sum(len(t.replace(" ", "")) for t in texts)
    assert sum(a.column("n_bpe").to_pylist()) < n_chars


def test_word_frequencies_truncation(ray_session):
    tbl = pa.table(
        {"text": ["a a a b b c", "a b x"]}
    )
    wf = bpe.word_frequencies(ray.data.from_arrow(tbl), max_words=2)
    assert wf.column("word").to_pylist() == ["a", "b"]
    assert wf.column("freq").to_pylist() == [4, 3]


def test_eow_roundtrip_detokenize(ray_session):
    """Models trained with end_of_word= are losslessly detokenizable
    (modulo whitespace normalization); marker-less models refuse."""
    tbl = pa.table(
        {
            "doc_id": pa.array(range(4), pa.int64()),
            "text": ["low low lower", "newer  newest\tnew", "", None],
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(2)
    model = bpe.train_bpe(ds, n_merges=10, end_of_word="</w>")
    assert "</w>" in model["vocab"]
    out = collect(bpe.detokenize(bpe.tokenize(ds, model), model)).sort_by("doc_id")
    got = out.column("text_detok").to_pylist()
    assert got[0] == "low low lower"
    assert got[1] == "newer newest new"  # whitespace-normalized
    assert got[2] == "" and got[3] == ""  # empty/null -> zero tokens
    with pytest.raises(ValueError):
        bpe.detokenize(bpe.tokenize(ds, model), bpe.train_bpe(ds, n_merges=2))


def test_eow_unknown_char_renders_unk(ray_session):
    base = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([0], pa.int64()), "text": ["low"]})
    )
    model = bpe.train_bpe(base, n_merges=5, end_of_word="</w>")
    unk_ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([0], pa.int64()), "text": ["law"]})
    )
    out = collect(bpe.detokenize(bpe.tokenize(unk_ds, model), model))
    assert out.column("text_detok").to_pylist() == ["l\N{REPLACEMENT CHARACTER}w"]
