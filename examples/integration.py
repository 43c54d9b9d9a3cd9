"""End-to-end integration example — the Ray-Data-native mirror of the
reference's examples/datafusion_integration.rs (register a table, query
projected + nested columns, count, DataFrame-style reads).

Run: python examples/integration.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    import ray.data as rdata

    rdata.DataContext.get_current().enable_progress_bars = False

    from datafusion_orc_ray import fixtures
    from datafusion_orc_ray.pipelines import encode as ep
    from datafusion_orc_ray.pipelines import relational as rel
    from datafusion_orc_ray.sources.stripes import Catalog

    work = tempfile.mkdtemp(prefix="dfor_example_")
    try:
        # 1. write an input corpus (webtext) and a nested table
        os.makedirs(f"{work}/in")
        pq.write_table(fixtures.webtext_table(2000), f"{work}/in/web.parquet", row_group_size=500)
        pq.write_table(fixtures.nested_table(), f"{work}/nested.parquet")

        # 2. encode -> stripes + manifests (resumable fragment pipeline)
        ep.encode_parquet(f"{work}/in", f"{work}/enc").materialize()
        ep.encode_parquet(f"{work}/nested.parquet", f"{work}/enc_nested").materialize()

        # 3. register + query (register_orc / read_orc parity)
        cat = Catalog()
        cat.register_stripes("web", f"{work}/enc")
        cat.register_stripes("nested", f"{work}/enc_nested")
        print("tables:", cat.names())
        print("schema(web):", cat.schema("web"))

        # projected read (only url/lang streams are decoded)
        ds = cat.table("web", columns=["url", "lang"])
        print("select url, lang limit 5:")
        for row in ds.take(5):
            print("  ", row)

        # count(*)
        print("count(*):", cat.table("web").count())

        # nested map/list columns round-trip through the stripe format
        nested = rel.collect(cat.table("nested"))
        print("nested row:", nested.slice(0, 1).to_pylist())

        # aggregate: docs per lang (partial-per-batch -> tiny final)
        agg = rel.grouped_agg(cat.table("web", columns=["lang"]), ["lang"], {"n": ("count", "lang")})
        print("docs per lang:", sorted(agg.to_pylist(), key=lambda r: -r["n"])[:5])

        # SQL over registered stripe tables (streams decode into DuckDB)
        sql = cat.sql("SELECT lang, count(*) AS n FROM web GROUP BY lang ORDER BY n DESC LIMIT 3")
        print("SQL top langs:", sql.to_pylist())

        # external-ORC ingest (any ORC writer -> stripes)
        try:
            import pyarrow.orc as pa_orc

            from datafusion_orc_ray.sources.orc import ingest_orc

            pa_orc.write_table(fixtures.nested_table(), f"{work}/legacy.orc")
            ingest_orc(f"{work}/legacy.orc", f"{work}/enc_from_orc").materialize()
            print("ORC ingest rows:", ep.decode_stripes(f"{work}/enc_from_orc").count())
        except ImportError:
            print("pyarrow.orc not available; skipping ORC ingest demo")

        # compaction: merge small stripes (crash-safe tombstones)
        merged = ep.compact_stripes(f"{work}/enc", target_bytes=8 << 20)
        print("compaction merged-stripe count:", merged)

        # decode to Parquet (streaming sink)
        ep.decode_to_parquet(f"{work}/enc", f"{work}/decoded")
        print("decoded parquet files:", len(os.listdir(f"{work}/decoded")))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        ray.shutdown()


if __name__ == "__main__":
    main()
