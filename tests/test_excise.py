"""Shared-span excision (dedup.excise_shared_spans): planted-duplicate
fixtures pin the ownership, overlap-union, short-doc, and null
semantics on BOTH the broadcast and the bucket-join paths; the sf0.01
corpus semantics are pinned by the `excise_spans_documents` DuckDB
oracle (driver gate)."""

import pyarrow as pa
import ray.data

from datafusion_orc_ray.pipelines.dedup import excise_shared_spans
from datafusion_orc_ray.pipelines.relational import collect

SPAN = "w1 w2 w3 w4 w5 w6 w7 w8"


def _run(docs: pa.Table, **kw):
    out = collect(
        excise_shared_spans(ray.data.from_arrow(docs).repartition(3), k=8, **kw)
    ).sort_by("doc_id")
    return {r["doc_id"]: (r["text_excised"], r["n_removed"]) for r in out.to_pylist()}


def _docs(texts):
    return pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
    )


def test_owner_keeps_others_lose(ray_session):
    docs = _docs(
        [
            f"alpha {SPAN} beta",  # owner (min doc_id)
            f"gamma {SPAN} delta",
            "totally unique text here",
            None,
            "short doc",  # <k tokens: normalized, never excised
        ]
    )
    for gate in (None, 0):  # broadcast path, then bucket-join path
        got = _run(docs, broadcast_gate=gate)
        assert got[0] == (f"alpha {SPAN} beta", 0)
        assert got[1] == ("gamma delta", 8)
        assert got[2] == ("totally unique text here", 0)
        assert got[3] == (None, 0)
        assert got[4] == ("short doc", 0)


def test_overlapping_windows_union_coverage(ray_session):
    # doc1 shares a 9-token run with doc0 -> two overlapping shared
    # 8-windows in doc1; coverage is their union (9 tokens), not 16
    run = SPAN + " w9"
    docs = _docs([f"{run} tail0", f"{run} tail1"])
    for gate in (None, 0):
        got = _run(docs, broadcast_gate=gate)
        assert got[0] == (f"{run} tail0", 0)
        assert got[1] == ("tail1", 9)


def test_owner_keeps_all_its_occurrences(ray_session):
    # the owner repeats the span twice; both its occurrences stay, the
    # non-owner loses its one
    docs = _docs([f"{SPAN} mid {SPAN}", f"x {SPAN} y"])
    for gate in (None, 0):
        got = _run(docs, broadcast_gate=gate)
        assert got[0] == (f"{SPAN} mid {SPAN}", 0)
        assert got[1] == ("x y", 8)


def test_whitespace_normalization_only(ray_session):
    # no shared spans: output is the token stream rejoined with single
    # spaces (tabs/newlines collapse), n_removed == 0 everywhere
    docs = _docs(["a\tb\n  c", "", "   "])
    for gate in (None, 0):
        got = _run(docs, broadcast_gate=gate)
        assert got[0] == ("a b c", 0)
        assert got[1] == ("", 0)
        assert got[2] == ("", 0)


def test_idempotent(ray_session):
    docs = _docs([f"alpha {SPAN} beta", f"gamma {SPAN} delta"])
    once = _run(docs)
    again = _run(
        pa.table(
            {
                "doc_id": pa.array(sorted(once), pa.int64()),
                "text": [once[d][0] for d in sorted(once)],
            }
        )
    )
    assert all(again[d] == (once[d][0], 0) for d in again)


def test_three_docs_one_owner(ray_session):
    docs = _docs([f"p {SPAN}", f"q {SPAN}", f"r {SPAN}"])
    for gate in (None, 0):
        got = _run(docs, broadcast_gate=gate)
        assert got[0] == (f"p {SPAN}", 0)
        assert got[1] == ("q", 8)
        assert got[2] == ("r", 8)
