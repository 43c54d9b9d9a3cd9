"""Hypothesis property tests: any int64 array and any byte-string list
must round-trip bit-identically through every codec and the stripe
format (SURVEY.md §5 round-trip contract, mechanized)."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from datafusion_orc_ray import stripe
from datafusion_orc_ray.codecs import fsst
from datafusion_orc_ray.codecs import integers as I

int64s = arrays(
    np.int64,
    st.integers(0, 300),
    elements=st.integers(-(2**63), 2**63 - 1),
)


@settings(max_examples=60, deadline=None)
@given(int64s)
def test_int_codecs_roundtrip(v):
    for codec in I.estimate_sizes(v):
        buf = I.encode_ints_with(v, codec)
        assert np.array_equal(I.decode_ints(buf, v.size), v), I.codec_name(codec)
    auto = I.encode_ints(v)
    assert np.array_equal(I.decode_ints(auto, v.size), v)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.binary(max_size=600), max_size=40))
def test_fsst_roundtrip(rows):
    data = np.frombuffer(b"".join(rows), dtype=np.uint8)
    offs = np.concatenate([[0], np.cumsum([len(r) for r in rows])]).astype(np.int64)
    table = fsst.train(data.tobytes()[:4096])
    enc, row_lens = fsst.encode(table, data, offs)
    assert int(row_lens.sum()) == len(enc)
    assert np.array_equal(fsst.decode(table, enc), data)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.one_of(st.none(), st.text(max_size=80)), max_size=60),
    st.lists(st.one_of(st.none(), st.integers(-(2**63), 2**63 - 1)), max_size=60),
)
def test_stripe_roundtrip_property(texts, ints):
    n = max(len(texts), len(ints), 1)
    texts = (texts + [None] * n)[:n]
    ints = (ints + [None] * n)[:n]
    t = pa.table(
        {"s": pa.array(texts, pa.string()), "i": pa.array(ints, pa.int64())}
    )
    out = stripe.decode_table(stripe.encode_table(t))
    assert out.equals(t)


@given(
    st.lists(
        st.one_of(st.none(), st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40)),
        min_size=0, max_size=20,
    )
)
@settings(max_examples=100, deadline=None)
def test_tokhash_matches_python_reference(texts):
    """Vectorized tokenization+shingling == a plain-Python reference."""
    import numpy as np
    import pyarrow as pa

    from datafusion_orc_ray.pipelines import tokhash as tk

    th, offs = tk.token_hashes(pa.array(texts, pa.string()))
    counts = np.diff(offs).tolist()
    expected = [len((t or "").split()) for t in texts]
    assert counts == expected
    # shingles: count per doc matches the window rule
    s = 3
    sh, soffs = tk.rolling_shingles(th, offs, s)
    got = np.diff(soffs).tolist()
    exp = [0 if c == 0 else max(c - s + 1, 1) for c in counts]
    assert got == exp
    # determinism & per-doc independence: same text alone hashes the same
    for i, t in enumerate(texts):
        if t and counts[i] > 0:
            th1, o1 = tk.token_hashes(pa.array([t], pa.string()))
            assert (th1 == th[offs[i]:offs[i+1]]).all()
            break
