"""JSON field extraction (fast-regex + loads fallback), ROLLUP levels,
pivot layout."""

import pyarrow as pa
import ray.data

from datafusion_orc_ray.pipelines import jsonx
from datafusion_orc_ray.pipelines import relational as rel


def _ds(tbl, nparts=2):
    return ray.data.from_arrow(tbl).repartition(nparts)


def test_json_number_and_fallback_rows(ray_session):
    props = [
        '{"k": 69, "s": "hi"}',
        '{"k": -1.5e2}',
        '{"s": "no k"}',
        None,
        '{"k": {"nested": 1}}',  # fast path misses -> loads -> non-scalar -> NULL
        '{"k": 7, "junk": "\\""}',
    ]
    tbl = pa.table({"i": pa.array(range(6), pa.int64()), "props": props})
    out = rel.collect(
        jsonx.extract_json_field(_ds(tbl), "props", "k", kind="number")
    ).sort_by("i")
    assert out.column("k").to_pylist() == [69.0, -150.0, None, None, None, 7.0]


def test_json_string_with_escape_fallback(ray_session):
    props = ['{"name": "alice"}', '{"name": "a\\"b"}', '{"name": 5}', "{}"]
    tbl = pa.table({"i": pa.array(range(4), pa.int64()), "props": props})
    out = rel.collect(
        jsonx.extract_json_field(_ds(tbl), "props", "name", kind="string")
    ).sort_by("i")
    # escaped quote row falls back to json.loads and gets the true value
    assert out.column("name").to_pylist() == ["alice", 'a"b', None, None]


def test_rollup_levels_and_totals(ray_session):
    tbl = pa.table(
        {
            "a": ["x", "x", "y", "y"],
            "b": ["p", "q", "p", "p"],
            "v": pa.array([1, 2, 3, 4], pa.int64()),
        }
    )
    out = rel.rollup_agg(
        _ds(tbl), ["a", "b"], {"n": ("count", "a"), "s": ("sum", "v")}
    )
    rows = {
        (r["a"], r["b"]): (r["n"], r["s"]) for r in out.to_pylist()
    }
    assert rows[("x", "p")] == (1, 1) and rows[("y", "p")] == (2, 7)
    assert rows[("x", None)] == (2, 3) and rows[("y", None)] == (2, 7)
    assert rows[(None, None)] == (4, 10)
    assert len(rows) == 6  # 3 leaf + 2 subtotal + 1 grand total


def test_pivot_counts_and_missing_combos(ray_session):
    tbl = pa.table(
        {"src": ["s1", "s1", "s2"], "lang": ["en", "de", "en"]}
    )
    out = rel.pivot_agg(_ds(tbl), "src", "lang", ("count", "lang"), prefix="n_")
    assert out.column_names == ["src", "n_de", "n_en"]
    d = {r["src"]: (r["n_de"], r["n_en"]) for r in out.to_pylist()}
    assert d == {"s1": (1, 1), "s2": (0, 1)}


def test_pivot_min_missing_is_null(ray_session):
    tbl = pa.table(
        {"src": ["s1", "s2"], "lang": ["en", "de"], "v": pa.array([5.0, 7.0])}
    )
    out = rel.pivot_agg(_ds(tbl, 1), "src", "lang", ("min", "v"))
    d = {r["src"]: (r["de"], r["en"]) for r in out.to_pylist()}
    assert d == {"s1": (None, 5.0), "s2": (7.0, None)}


def test_chunk_documents_windows_and_edges(ray_session):
    from datafusion_orc_ray.pipelines import text as tx

    docs = [
        " ".join(f"t{i}" for i in range(10)),  # 10 tokens -> chunks of 4/step 3
        "one",
        "",
        None,
    ]
    tbl = pa.table({"doc_id": pa.array(range(4), pa.int64()), "text": docs})
    out = rel.collect(
        tx.chunk_documents(_ds(tbl, 2), max_tokens=4, overlap=1)
    ).sort_by([("doc_id", "ascending"), ("chunk_id", "ascending")])
    rows = out.to_pylist()
    d0 = [r for r in rows if r["doc_id"] == 0]
    # starts 0,3,6 -> lengths 4,4,4; the window at 6 reaches the doc
    # end, so no degenerate suffix chunk at start 9 is emitted
    assert [r["n_tok"] for r in d0] == [4, 4, 4]
    assert d0[0]["chunk_text"] == "t0 t1 t2 t3"
    assert d0[1]["chunk_text"] == "t3 t4 t5 t6"
    assert d0[2]["chunk_text"] == "t6 t7 t8 t9"
    d1 = [r for r in rows if r["doc_id"] == 1]
    assert len(d1) == 1 and d1[0]["chunk_text"] == "one"
    assert not any(r["doc_id"] in (2, 3) for r in rows)


def test_chunk_documents_validation(ray_session):
    import pytest as _pytest

    from datafusion_orc_ray.pipelines import text as tx

    with _pytest.raises(ValueError):
        tx.chunk_documents(_ds(pa.table({"doc_id": [1], "text": ["x"]})), 4, overlap=4)


def test_cube_all_subsets(ray_session):
    """CUBE = all 2^k grouping sets from one leaf pass; the (b)-only
    margin exists (which ROLLUP lacks) and totals agree across levels."""
    tbl = pa.table(
        {
            "a": ["x", "x", "y", "y"],
            "b": ["p", "q", "p", "p"],
            "v": pa.array([1, 2, 3, 4], pa.int64()),
        }
    )
    out = rel.cube_agg(_ds(tbl), ["a", "b"], {"n": ("count", "a"), "s": ("sum", "v")})
    rows = {(r["a"], r["b"]): (r["n"], r["s"]) for r in out.to_pylist()}
    # leaf + a-margin + b-margin + grand total = 3 + 2 + 2 + 1
    assert len(rows) == 8
    assert rows[(None, "p")] == (3, 8) and rows[(None, "q")] == (1, 2)
    assert rows[("x", None)] == (2, 3) and rows[(None, None)] == (4, 10)


def test_grouping_sets_explicit_and_validation(ray_session):
    import pytest

    tbl = pa.table(
        {
            "a": ["x", "x", "y"],
            "b": ["p", "q", "p"],
            "v": pa.array([1, 2, 3], pa.int64()),
        }
    )
    out = rel.grouping_sets_agg(
        _ds(tbl), ["a", "b"], [["b"], []], {"s": ("sum", "v")}
    )
    rows = {(r["a"], r["b"]): r["s"] for r in out.to_pylist()}
    # only the requested sets appear: b-margins + grand total, no leaf
    assert rows == {(None, "p"): 4, (None, "q"): 2, (None, None): 6}
    # duplicate sets duplicate rows (SQL semantics)
    dup = rel.grouping_sets_agg(_ds(tbl), ["a"], [[], []], {"s": ("sum", "v")})
    assert dup.column("s").to_pylist() == [6, 6]
    with pytest.raises(ValueError, match="not in"):
        rel.grouping_sets_agg(_ds(tbl), ["a"], [["zz"]], {"s": ("sum", "v")})
