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
