"""Training-shard writer (corpus.make_training_shards): deterministic
assignment across parallelism, hive layout as the resume unit, epoch
reshuffle via seed, and the read-back stats contract (the sf0.01-scale
assignment+stats math is pinned by the `training_shards_documents`
DuckDB oracle)."""

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from datafusion_orc_ray.pipelines.corpus import _KNUTH, _MOD, make_training_shards


def _docs(n=200):
    rng = np.random.default_rng(7)
    texts = [" ".join(f"t{v}" for v in rng.integers(0, 50, rng.integers(1, 12))) for _ in range(n)]
    if n > 5:
        texts[5] = None
    return pa.table({"doc_id": pa.array(range(n), pa.int64()), "text": texts})


def test_assignment_matches_contract_and_layout(ray_session, tmp_path):
    docs = _docs()
    out = str(tmp_path / "shards")
    stats = make_training_shards(
        ray.data.from_arrow(docs).repartition(4), out, n_shards=8, seed=0
    )
    # hive layout: one dir per shard present in the stats
    dirs = sorted(glob.glob(os.path.join(out, "shard=*")))
    assert len(dirs) == stats.num_rows
    # every written row obeys the published hash contract
    back = pq.read_table(out, columns=["doc_id", "shard", "__order"])
    ids = back.column("doc_id").to_numpy().astype(np.uint64)
    h = (ids * np.uint64(_KNUTH)) % np.uint64(_MOD)
    assert (back.column("shard").to_numpy().astype(np.int64) == (h % 8).astype(np.int64)).all()
    assert (back.column("__order").to_numpy() == h.astype(np.int64)).all()
    # stats cover every doc exactly once
    assert int(pa.compute.sum(stats.column("n_docs")).as_py()) == docs.num_rows


def test_deterministic_across_parallelism(ray_session, tmp_path):
    docs = _docs()
    outs = []
    for i, parts in enumerate((1, 7)):
        out = str(tmp_path / f"s{i}")
        stats = make_training_shards(
            ray.data.from_arrow(docs).repartition(parts), out, n_shards=8, seed=3
        )
        outs.append(stats.sort_by("shard"))
    assert outs[0].equals(outs[1])


def test_seed_changes_epoch_permutation(ray_session, tmp_path):
    docs = _docs()
    a = make_training_shards(
        ray.data.from_arrow(docs), str(tmp_path / "a"), n_shards=8, seed=0
    ).sort_by("shard")
    b = make_training_shards(
        ray.data.from_arrow(docs), str(tmp_path / "b"), n_shards=8, seed=1
    ).sort_by("shard")
    assert not a.equals(b)  # different epoch -> different assignment
    # but both partitions cover the full corpus
    for t in (a, b):
        assert int(pa.compute.sum(t.column("n_docs")).as_py()) == docs.num_rows


def test_validation(ray_session, tmp_path):
    with pytest.raises(ValueError):
        make_training_shards(ray.data.from_arrow(_docs(4)), str(tmp_path / "x"), n_shards=0)
    with pytest.raises(ValueError):
        make_training_shards(ray.data.from_arrow(_docs(4)), str(tmp_path / "y"), seed=-1)


# ----------------------------------------------- concat-and-chunk blocks


def test_pack_blocks_stream_and_boundaries(ray_session):
    from datafusion_orc_ray.pipelines.corpus import pack_blocks
    from datafusion_orc_ray.pipelines.relational import collect

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": ["a b c", "d e", None, ""],
        }
    )
    out = collect(
        pack_blocks(
            ray.data.from_arrow(docs).repartition(2), block_tokens=4, n_shards=1
        )
    ).sort_by("block_id")
    rows = out.to_pylist()
    # epoch order is (knuth h, doc_id): 0 < 1 < 3 here; null doc 2 skipped
    ids = [0, 1, 3]
    h = (np.array(ids, np.uint64) * np.uint64(_KNUTH)) % np.uint64(_MOD)
    order = [ids[i] for i in np.lexsort((ids, h))]
    stream = []
    texts = {0: "a b c", 1: "d e", 3: ""}
    for d in order:
        stream += texts[d].split() + ["<eod>"]
    want = [" ".join(stream[i : i + 4]) for i in range(0, len(stream), 4)]
    assert [r["block_text"] for r in rows] == want
    assert [r["n_tok"] for r in rows] == [min(4, len(stream) - 4 * i) for i in range(len(want))]


def test_pack_blocks_parallelism_invariant(ray_session):
    from datafusion_orc_ray.pipelines.corpus import pack_blocks
    from datafusion_orc_ray.pipelines.relational import collect

    docs = _docs(150)
    outs = []
    for parts in (1, 8):
        outs.append(
            collect(
                pack_blocks(
                    ray.data.from_arrow(docs).repartition(parts),
                    block_tokens=32,
                    n_shards=4,
                )
            ).sort_by([("shard", "ascending"), ("block_id", "ascending")])
        )
    assert outs[0].equals(outs[1])


def test_pack_blocks_validation(ray_session):
    from datafusion_orc_ray.pipelines.corpus import pack_blocks

    with pytest.raises(ValueError):
        pack_blocks(ray.data.from_arrow(_docs(4)), block_tokens=0)
    with pytest.raises(ValueError):
        pack_blocks(ray.data.from_arrow(_docs(4)), n_shards=0)


def test_resume_contract(ray_session, tmp_path):
    from datafusion_orc_ray.pipelines.corpus import make_training_shards

    docs = _docs(60)
    out = str(tmp_path / "shards")
    a = make_training_shards(ray.data.from_arrow(docs), out, n_shards=4).sort_by("shard")
    assert os.path.exists(os.path.join(out, "_DONE"))
    # completed run: re-invocation skips the write (mtimes untouched)
    mtimes = {p: os.path.getmtime(p) for p in glob.glob(os.path.join(out, "shard=*/*"))}
    b = make_training_shards(ray.data.from_arrow(docs), out, n_shards=4).sort_by("shard")
    assert a.equals(b)
    assert mtimes == {
        p: os.path.getmtime(p) for p in glob.glob(os.path.join(out, "shard=*/*"))
    }
    # interrupted run (wip marker, no done): discarded and rewritten
    os.remove(os.path.join(out, "_DONE"))
    open(os.path.join(out, "_IN_PROGRESS"), "w").close()
    c = make_training_shards(ray.data.from_arrow(docs), out, n_shards=4).sort_by("shard")
    assert a.equals(c)
    assert os.path.exists(os.path.join(out, "_DONE"))
    # foreign non-empty dir: refused, contents intact
    foreign = tmp_path / "foreign"
    foreign.mkdir()
    (foreign / "precious.txt").write_text("do not delete")
    with pytest.raises(FileExistsError):
        make_training_shards(ray.data.from_arrow(docs), str(foreign), n_shards=4)
    assert (foreign / "precious.txt").read_text() == "do not delete"


def test_pack_blocks_negative_seed(ray_session):
    from datafusion_orc_ray.pipelines.corpus import pack_blocks

    with pytest.raises(ValueError):
        pack_blocks(ray.data.from_arrow(_docs(4)), seed=-1)


# ------------------------------------------------ weighted sampling


def test_weighted_sample_bias_and_determinism(ray_session):
    from datafusion_orc_ray.pipelines.corpus import weighted_sample

    n = 4000
    # half the docs weight 1, half weight 20: the heavy half should
    # dominate the sample
    w = [1 if i % 2 == 0 else 20 for i in range(n)]
    tbl = pa.table(
        {"doc_id": pa.array(range(n), pa.int64()), "n_chars": pa.array(w, pa.int64())}
    )
    outs = []
    for parts in (1, 8):
        t = weighted_sample(
            ray.data.from_arrow(tbl).repartition(parts), k=200, weight_col="n_chars"
        ).sort_by("doc_id")
        outs.append(t)
    assert outs[0].equals(outs[1])  # parallelism-invariant
    heavy = sum(1 for v in outs[0].column("n_chars").to_pylist() if v == 20)
    assert heavy > 150  # weight-20 docs dominate a 200-sample


def test_weighted_sample_rejects_bad_weights(ray_session):
    from datafusion_orc_ray.pipelines.corpus import weighted_sample

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "n_chars": pa.array([None, 0, -5, 10], pa.int64()),
        }
    )
    t = weighted_sample(ray.data.from_arrow(tbl), k=10, weight_col="n_chars")
    assert t.column("doc_id").to_pylist() == [3]  # only the positive weight
    with pytest.raises(ValueError):
        weighted_sample(ray.data.from_arrow(tbl), k=0, weight_col="n_chars")
