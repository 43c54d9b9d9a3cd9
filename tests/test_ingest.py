"""JSONL / CSV ingest -> stripes -> decode round trip."""

import json
import os

import pyarrow as pa
import pytest

from datafusion_orc_ray.pipelines.relational import collect
from datafusion_orc_ray.sources import ingest
from datafusion_orc_ray.sources.stripes import read_stripes


@pytest.fixture()
def dump_dir(tmp_path):
    rows = [
        {"doc_id": i, "text": f"doc {i} text", "score": i / 4}
        for i in range(200)
    ]
    a = tmp_path / "part0.jsonl"
    b = tmp_path / "part1.jsonl"
    a.write_text("\n".join(json.dumps(r) for r in rows[:120]))
    # second shard omits 'score' on some rows (real dumps drift)
    drift = [
        {k: v for k, v in r.items() if not (k == "score" and r["doc_id"] % 3)}
        for r in rows[120:]
    ]
    b.write_text("\n".join(json.dumps(r) for r in drift))
    return str(tmp_path), rows


SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("text", pa.string()), ("score", pa.float64())]
)


def test_jsonl_roundtrip_with_schema_drift(ray_session, dump_dir, tmp_path):
    d, rows = dump_dir
    ds = ingest.read_jsonl([f"{d}/part0.jsonl", f"{d}/part1.jsonl"], schema=SCHEMA)
    out = str(tmp_path / "stripes")
    man = ingest.ingest_to_stripes(ds, out, rows_per_stripe=64)
    assert man.num_rows >= 2  # multiple stripes written
    back = collect(read_stripes(out)).sort_by("doc_id")
    assert back.num_rows == 200
    assert back.schema.names == ["doc_id", "text", "score"]
    # drifted rows decoded as NULL score; intact rows exact
    got = back.to_pylist()
    for r in got[:120]:
        assert r["score"] == rows[r["doc_id"]]["score"]
    for r in got[120:]:
        if r["doc_id"] % 3:
            assert r["score"] is None


def test_csv_ingest(ray_session, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("a,b\n1,x\n2,y\n")
    ds = ingest.read_csv(str(p), schema=pa.schema([("a", pa.int64()), ("b", pa.string())]))
    out = str(tmp_path / "s")
    ingest.ingest_to_stripes(ds, out)
    back = collect(read_stripes(out)).sort_by("a")
    assert back.to_pylist() == [{"a": 1, "b": "x"}, {"a": 2, "b": "y"}]
