"""External-ORC interop conformance: read the REFERENCE's own golden ORC
fixture (tests/basic/data/alltypes.snappy.orc) through the Ray source,
and round-trip it through RSTP stripes bit-identically."""

import pytest

pa_orc = pytest.importorskip("pyarrow.orc")

import pyarrow as pa

from datafusion_orc_ray.pipelines import encode as ep
from datafusion_orc_ray.pipelines.relational import collect
from datafusion_orc_ray.sources.orc import ingest_orc, read_orc

FIXTURE = "/root/reference/tests/basic/data/alltypes.snappy.orc"


def test_read_orc_matches_pyarrow(ray_session):
    ref = pa_orc.read_table(FIXTURE)
    got = collect(read_orc(FIXTURE))
    assert got.equals(ref)


def test_read_orc_projection(ray_session):
    ref = pa_orc.read_table(FIXTURE)
    cols = ref.column_names[:2]
    got = collect(read_orc(FIXTURE, columns=cols))
    assert got.equals(ref.select(cols))


def test_ingest_orc_roundtrip(ray_session, tmp_path):
    out = str(tmp_path / "enc")
    mf = ingest_orc(FIXTURE, out)
    assert mf.count() >= 1
    ref = pa_orc.read_table(FIXTURE)
    got = collect(ep.decode_stripes(out))
    # row order is stripe order = file order for a single file
    assert got.equals(ref)


def test_write_orc_external_reader_roundtrip(ray_session, tmp_path):
    """VERDICT r4 #4 (write half of the interop loop): stripes decoded by
    our engine, exported with write_orc, must be consumable by a plain
    external ORC reader (pyarrow.orc) with identical values."""
    import ray.data

    from datafusion_orc_ray import fixtures
    from datafusion_orc_ray.sources.orc import write_orc

    wt = fixtures.webtext_table(400)
    out = str(tmp_path / "orc_out")
    mf = collect(write_orc(ray.data.from_arrow(wt).repartition(3), out))
    assert mf.num_rows >= 1
    assert sum(mf.column("rows").to_pylist()) == wt.num_rows
    parts = [pa_orc.read_table(p) for p in sorted(mf.column("path").to_pylist())]
    # ORC's native timestamp precision is ns: external readers hand back
    # timestamp[ns]; values are identical after the documented cast
    got = pa.concat_tables(parts).cast(wt.schema)
    key = "url"
    assert got.sort_by(key).equals(wt.sort_by(key))


def test_write_orc_golden_fixture_cross_check(ray_session, tmp_path):
    """Export the REFERENCE's golden alltypes fixture through write_orc
    and read it back with the external reader: schema and values match
    the original fixture (the type surface the reference ecosystem
    exchanges)."""
    from datafusion_orc_ray.sources.orc import read_orc, write_orc

    ref = pa_orc.read_table(FIXTURE)
    out = str(tmp_path / "golden_out")
    mf = collect(write_orc(read_orc(FIXTURE), out))
    got = pa.concat_tables(
        [pa_orc.read_table(p) for p in sorted(mf.column("path").to_pylist())]
    )
    assert got.schema.equals(ref.schema), f"{got.schema}\nvs\n{ref.schema}"
    first = ref.column_names[0]
    assert got.sort_by(first).equals(ref.sort_by(first))
