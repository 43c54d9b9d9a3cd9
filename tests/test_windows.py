"""Event-time operators: sessionization, sliding windows, as-of join."""

import datetime

import numpy as np
import pytest
import pyarrow as pa

from datafusion_orc_ray.pipelines import relational as rel, windows as w

US = 1_000_000


def _ts(mins):
    return datetime.datetime(2026, 1, 1) + datetime.timedelta(minutes=mins)


def test_sessionize_gap_boundaries(ray_session):
    import ray.data

    t = pa.table(
        {
            "user_id": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
            # user 1: 0, 10, 50 (gap 40 > 30 -> new session), 55
            # user 2: 0, 31 (gap 31 > 30 -> new session)
            "ts": pa.array([_ts(0), _ts(10), _ts(50), _ts(55), _ts(0), _ts(31)], pa.timestamp("us")),
        }
    )
    out = rel.collect(w.sessionize(ray.data.from_arrow(t))).sort_by(
        [("user_id", "ascending"), ("sid", "ascending")]
    )
    rows = out.to_pylist()
    assert [(r["user_id"], r["sid"], r["n_events"]) for r in rows] == [
        (1, 1, 2), (1, 2, 2), (2, 1, 1), (2, 2, 1),
    ]
    assert rows[1]["session_start"] == _ts(50)


def test_asof_join_broadcast(ray_session):
    import ray.data

    left = pa.table(
        {"id": pa.array([1, 2, 3], pa.int64()),
         "ts": pa.array([_ts(5), _ts(0), _ts(61)], pa.timestamp("us"))}
    )
    right = pa.table(
        {"mts": pa.array([_ts(1), _ts(60)], pa.timestamp("us")),
         "mark": pa.array(["a", "b"])}
    )
    out = rel.collect(
        w.asof_join_broadcast(ray.data.from_arrow(left), right, "ts", "mts")
    ).sort_by("id")
    # id=2 (ts before first mark) drops; 1 -> a, 3 -> b
    assert out.column("id").to_pylist() == [1, 3]
    assert out.column("mark").to_pylist() == ["a", "b"]


def test_sliding_window_membership(ray_session):
    import ray.data

    t = pa.table(
        {
            "ts": pa.array([_ts(0), _ts(90)], pa.timestamp("us")),  # hours 0 and 1
            "k": pa.array(["x", "x"]),
            "v": pa.array([1.0, 2.0]),
        }
    )
    out = w.sliding_window_agg(
        ray.data.from_arrow(t), "ts", "k", "v",
        window_us=2 * 3600 * US, slide_us=3600 * US,
    ).sort_by("w")
    d = {r["w"]: (r["total"], r["n"]) for r in out.to_pylist()}
    base = int(_ts(0).timestamp() * US) // (3600 * US)
    # window starting base-1 holds row0; base holds both; base+1 holds row1
    assert d[base - 1] == (1.0, 1)
    assert d[base] == (3.0, 2)
    assert d[base + 1] == (2.0, 1)


def test_running_total_segments(ray_session):
    import ray.data

    from datafusion_orc_ray.pipelines import windows as w

    t = pa.table(
        {
            "u": pa.array([1, 1, 1, 2, 2], pa.int64()),
            "ts": pa.array([_ts(0), _ts(1), _ts(2), _ts(0), _ts(1)], pa.timestamp("us")),
            "v": pa.array([1.0, 2.0, 3.0, 10.0, 20.0]),
            "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        }
    )
    out = rel.collect(
        w.running_total(ray.data.from_arrow(t), "u", "ts", "v", tiebreak="id")
    ).sort_by("id")
    assert out.column("running").to_pylist() == [1.0, 3.0, 6.0, 10.0, 30.0]


def test_running_total_hot_key_split(ray_session):
    """hot_keys='auto' splits a mega-key across ts-range sub-partitions
    with exact carry-over bases: results match the hash-bucket path
    (modulo float summation order), the hot key IS detected and split
    into multiple bins, every bin is a strict subset of the key's rows,
    null ts rows land in the last bin (NULLS LAST), and null values
    keep SQL empty-frame semantics across bin boundaries."""
    import ray.data

    rng = np.random.default_rng(7)
    n_hot, n_cold = 20_000, 500
    u = np.concatenate([np.full(n_hot, 777), rng.integers(0, 50, n_cold)])
    ts = np.concatenate(
        [rng.permutation(n_hot), 10**7 + np.arange(n_cold)]
    ).astype(np.int64)
    v = rng.normal(size=n_hot + n_cold)
    null_v = np.zeros(n_hot + n_cold, bool)
    null_v[rng.choice(n_hot, 200, replace=False)] = True
    null_ts = np.zeros(n_hot + n_cold, bool)
    null_ts[rng.choice(n_hot, 50, replace=False)] = True
    t = pa.table(
        {
            "u": pa.array(u, pa.int64()),
            "ts": pa.array(ts, mask=null_ts),
            "v": pa.array(v, mask=null_v),
            "id": pa.array(np.arange(n_hot + n_cold), pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(8)
    plan = w._plan_hot_split(ds, "u", "ts", "v", n_buckets=4, hot_bytes=50_000)
    assert plan is not None and 777 in plan.keys
    i = plan.keys.index(777)
    n_bins = plan.n_parts(i)
    assert n_bins >= 2
    # no bin holds the whole key (the point of the split)
    tsv, tnull = w._ts_np(t.column("ts"))
    hot_rows = u == 777
    bins = plan.bin_of(i, tsv[hot_rows], tnull[hot_rows])
    counts = np.bincount(bins, minlength=n_bins)
    assert counts.max() < n_hot
    assert bins[tnull[hot_rows]].min() == n_bins - 1  # NULLS LAST bin
    out = rel.collect(
        w.running_total(
            ds, "u", "ts", "v", tiebreak="id", hot_keys="auto", hot_bytes=50_000
        )
    ).sort_by("id")
    ref = rel.collect(
        w.running_total(ds, "u", "ts", "v", tiebreak="id")
    ).sort_by("id")
    a = out.column("running").to_numpy(zero_copy_only=False)
    b = ref.column("running").to_numpy(zero_copy_only=False)
    assert np.array_equal(np.isnan(a), np.isnan(b))
    assert np.allclose(a[~np.isnan(a)], b[~np.isnan(b)], rtol=1e-9, atol=1e-9)


def test_lag_lead_hot_key_split_phantom_rows(ray_session):
    """lag/lead across ts-bin boundaries are exact (phantom boundary
    rows): the hot path returns bit-identical values to the hash path
    for n=1 and n=2, including ties (duplicate ts under a tiebreak),
    null values, null ts (NULLS LAST bin), and tiny bins that must
    borrow phantoms from two bins back."""
    import ray.data

    rng = np.random.default_rng(13)
    n_hot, n_cold = 12_000, 400
    u = np.concatenate([np.full(n_hot, 42), rng.integers(0, 40, n_cold)])
    # duplicate every 3rd ts so ties exercise the tiebreak ordering
    base_ts = np.arange(n_hot) // 3
    ts = np.concatenate([rng.permutation(base_ts), 10**7 + np.arange(n_cold)])
    v = rng.normal(size=n_hot + n_cold)
    null_v = np.zeros(n_hot + n_cold, bool)
    null_v[rng.choice(n_hot, 150, replace=False)] = True
    null_ts = np.zeros(n_hot + n_cold, bool)
    null_ts[rng.choice(n_hot, 40, replace=False)] = True
    t = pa.table(
        {
            "u": pa.array(u, pa.int64()),
            "ts": pa.array(ts.astype(np.int64), mask=null_ts),
            "v": pa.array(v, mask=null_v),
            "id": pa.array(np.arange(n_hot + n_cold), pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(6)
    for n in (1, 2):
        hot = rel.collect(
            w.lag_lead(
                ds, "u", "ts", "v", n=n, tiebreak="id",
                hot_keys="auto", hot_bytes=40_000,
            )
        ).sort_by("id")
        ref = rel.collect(
            w.lag_lead(ds, "u", "ts", "v", n=n, tiebreak="id")
        ).sort_by("id")
        assert hot.num_rows == ref.num_rows == t.num_rows
        for c in ("lag", "lead"):
            assert hot.column(c).to_pylist() == ref.column(c).to_pylist(), (n, c)


def test_moving_avg_hot_key_split(ray_session):
    """ROWS-frame moving average across ts-bin boundaries via phantom
    prev-bin tails: matches the hash path (modulo float summation
    order) for preceding=3, incl. null values and an all-null frame."""
    import ray.data

    rng = np.random.default_rng(23)
    n_hot = 9_000
    t = pa.table(
        {
            "u": pa.array(np.full(n_hot, 7), pa.int64()),
            "ts": pa.array(rng.permutation(n_hot).astype(np.int64)),
            "v": pa.array(
                rng.normal(size=n_hot),
                mask=(rng.random(n_hot) < 0.05),
            ),
            "id": pa.array(np.arange(n_hot), pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(5)
    hot = rel.collect(
        w.moving_avg(
            ds, "u", "ts", "v", preceding=3, tiebreak="id",
            hot_keys="auto", hot_bytes=30_000,
        )
    ).sort_by("id")
    ref = rel.collect(
        w.moving_avg(ds, "u", "ts", "v", preceding=3, tiebreak="id")
    ).sort_by("id")
    a = hot.column("moving_avg").to_numpy(zero_copy_only=False)
    b = ref.column("moving_avg").to_numpy(zero_copy_only=False)
    assert hot.num_rows == ref.num_rows == n_hot
    assert np.array_equal(np.isnan(a), np.isnan(b))
    assert np.allclose(a[~np.isnan(a)], b[~np.isnan(b)], rtol=1e-9, atol=1e-12)


def test_sessionize_hot_key_split_boundary_sessions(ray_session):
    """A mega-user split across ts bins: sessions spanning bin
    boundaries recombine (sum n_events, min start), sid numbering stays
    globally 1..K in ts order, and the result equals the single-bucket
    path exactly. Dense ts (gap < timeout) makes nearly every bin
    boundary a spanning session."""
    import ray.data

    rng = np.random.default_rng(31)
    n = 8_000
    # mostly 1-min gaps with occasional 45-min breaks -> long sessions
    # that MUST span the ~8 ts bins the tiny hot_bytes forces
    gaps = np.where(rng.random(n) < 0.01, 45 * 60, 60) * 1_000_000
    ts = np.cumsum(gaps)
    t = pa.table(
        {
            "user_id": pa.array(
                np.concatenate([np.full(n, 9), np.array([1, 1, 2])]), pa.int64()
            ),
            "ts": pa.array(
                np.concatenate([ts, [10, 20, 30]]).astype("datetime64[us]"),
                pa.timestamp("us"),
            ),
        }
    )
    ds = ray.data.from_arrow(t).repartition(5)
    hot = rel.collect(
        w.sessionize(ds, hot_keys="auto", hot_bytes=20_000)
    ).sort_by([("user_id", "ascending"), ("sid", "ascending")])
    ref = rel.collect(w.sessionize(ds)).sort_by(
        [("user_id", "ascending"), ("sid", "ascending")]
    )
    assert hot.num_rows == ref.num_rows
    for c in ("user_id", "sid", "n_events", "session_start"):
        assert hot.column(c).to_pylist() == ref.column(c).to_pylist(), c
    # the plan really split the mega-user
    plan = w._plan_hot_split(ds, "user_id", "ts", "ts", 4, 20_000, with_bases=False)
    assert plan is not None and 9 in plan.keys and plan.n_parts(plan.keys.index(9)) >= 2


def test_hot_split_multiple_hot_keys(ray_session):
    """Three simultaneous hot keys: part-id blocks are disjoint and
    dense, and running_total + lag_lead match the hash path across all
    of them (catches offset-allocation bugs _HotPlan.add could hide
    with a single key)."""
    import ray.data

    rng = np.random.default_rng(17)
    sizes = {101: 6000, 202: 5000, 303: 4000}
    u = np.concatenate([np.full(n, k) for k, n in sizes.items()])
    ts = np.concatenate([rng.permutation(n) for n in sizes.values()])
    v = rng.normal(size=u.size)
    t = pa.table(
        {
            "u": pa.array(u, pa.int64()),
            "ts": pa.array(ts.astype(np.int64)),
            "v": pa.array(v),
            "id": pa.array(np.arange(u.size), pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(6)
    plan = w._plan_hot_split(ds, "u", "ts", "v", 4, 30_000)
    assert plan is not None and len(plan.keys) == 3
    spans = [
        range(4 + plan.offsets[i], 4 + plan.offsets[i] + plan.n_parts(i))
        for i in range(3)
    ]
    flat = [p for s in spans for p in s]
    assert len(flat) == len(set(flat))  # disjoint
    assert flat == list(range(4, 4 + len(flat)))  # dense block layout
    hot = rel.collect(
        w.running_total(ds, "u", "ts", "v", tiebreak="id",
                        hot_keys="auto", hot_bytes=30_000)
    ).sort_by("id")
    ref = rel.collect(
        w.running_total(ds, "u", "ts", "v", tiebreak="id")
    ).sort_by("id")
    assert np.allclose(
        hot.column("running").to_numpy(), ref.column("running").to_numpy(),
        rtol=1e-9, atol=1e-9,
    )
    hot2 = rel.collect(
        w.lag_lead(ds, "u", "ts", "v", n=1, tiebreak="id",
                   hot_keys="auto", hot_bytes=30_000)
    ).sort_by("id")
    ref2 = rel.collect(w.lag_lead(ds, "u", "ts", "v", n=1, tiebreak="id")).sort_by("id")
    for c in ("lag", "lead"):
        assert hot2.column(c).to_pylist() == ref2.column(c).to_pylist(), c


def test_hot_split_randomized_equivalence(ray_session):
    """Randomized adversarial sweep: for several seeded shapes (tie
    density, null-ts/null-value fractions, bin-unfriendly clustered ts,
    partition counts), every hot-split op must match its hash-path twin
    — exactly for lag/lead, to 1e-9 for float accumulations."""
    import ray.data

    for seed in (3, 11, 29):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(3000, 7000))
        u = np.where(rng.random(n) < 0.8, 55, rng.integers(0, 20, n))
        # clustered ts: heavy duplication + occasional bursts
        ts = np.sort(rng.integers(0, n // int(rng.integers(2, 9)), n))[
            rng.permutation(n)
        ]
        v = rng.normal(size=n)
        null_v = rng.random(n) < float(rng.uniform(0, 0.15))
        null_ts = rng.random(n) < float(rng.uniform(0, 0.05))
        t = pa.table(
            {
                "u": pa.array(u, pa.int64()),
                "ts": pa.array(ts.astype(np.int64), mask=null_ts),
                "v": pa.array(v, mask=null_v),
                "id": pa.array(np.arange(n), pa.int64()),
            }
        )
        ds = ray.data.from_arrow(t).repartition(int(rng.integers(2, 9)))
        kw = dict(hot_keys="auto", hot_bytes=25_000)
        a = rel.collect(
            w.running_total(ds, "u", "ts", "v", tiebreak="id", **kw)
        ).sort_by("id").column("running").to_numpy(zero_copy_only=False)
        b = rel.collect(
            w.running_total(ds, "u", "ts", "v", tiebreak="id")
        ).sort_by("id").column("running").to_numpy(zero_copy_only=False)
        assert np.array_equal(np.isnan(a), np.isnan(b)), seed
        assert np.allclose(a[~np.isnan(a)], b[~np.isnan(b)], rtol=1e-9, atol=1e-9), seed
        ll_a = rel.collect(
            w.lag_lead(ds, "u", "ts", "v", n=2, tiebreak="id", **kw)
        ).sort_by("id")
        ll_b = rel.collect(
            w.lag_lead(ds, "u", "ts", "v", n=2, tiebreak="id")
        ).sort_by("id")
        for c in ("lag", "lead"):
            assert ll_a.column(c).to_pylist() == ll_b.column(c).to_pylist(), (seed, c)
        ma_a = rel.collect(
            w.moving_avg(ds, "u", "ts", "v", preceding=4, tiebreak="id", **kw)
        ).sort_by("id").column("moving_avg").to_numpy(zero_copy_only=False)
        ma_b = rel.collect(
            w.moving_avg(ds, "u", "ts", "v", preceding=4, tiebreak="id")
        ).sort_by("id").column("moving_avg").to_numpy(zero_copy_only=False)
        assert np.array_equal(np.isnan(ma_a), np.isnan(ma_b)), seed
        assert np.allclose(
            ma_a[~np.isnan(ma_a)], ma_b[~np.isnan(ma_b)], rtol=1e-9, atol=1e-12
        ), seed


def test_asof_partitioned_hot_key_split(ray_session):
    """Large-large ASOF with a mega-key split across ts bins: exact
    equality with the single-bucket path, including left rows whose
    as-of match lives bins back (right rows only in the early ts range,
    so later bins' phantoms are borrowed across empty bins) and left
    rows before any right row (NULL payload)."""
    import ray.data

    rng = np.random.default_rng(53)
    n = 10_000
    lts = rng.permutation(n).astype(np.int64)
    left = pa.table(
        {
            "k": pa.array(np.where(np.arange(n) % 50 == 0, 2, 7), pa.int64()),
            "lts": pa.array(lts),
            "lid": pa.array(np.arange(n), pa.int64()),
        }
    )
    # right marks exist only in ts [500, 2500): every left row later than
    # that matches across MANY empty bins via the borrowed phantom
    rts = np.arange(500, 2500, 7).astype(np.int64)
    right = pa.table(
        {
            "k": pa.array(np.full(rts.size, 7), pa.int64()),
            "rts": pa.array(rts),
            "mark": pa.array(rts * 10),
        }
    )
    lds = ray.data.from_arrow(left).repartition(5)
    rds = ray.data.from_arrow(right).repartition(3)
    kw = dict(payload={"mark": "mark"})
    hot = rel.collect(
        w.asof_join_partitioned(
            lds, rds, "k", "lts", "rts", **kw, hot_keys="auto", hot_bytes=20_000
        )
    ).sort_by("lid")
    ref = rel.collect(
        w.asof_join_partitioned(lds, rds, "k", "lts", "rts", **kw)
    ).sort_by("lid")
    assert hot.num_rows == ref.num_rows == n
    assert hot.column("mark").to_pylist() == ref.column("mark").to_pylist()
    # sanity: early rows null, late rows match the last mark
    got = dict(zip(hot.column("lts").to_pylist(), hot.column("mark").to_pylist()))
    assert got[0] is None and got[499] is None
    assert got[n - 1] == (rts.max()) * 10


def test_running_total_hot_split_no_hot_keys(ray_session):
    """auto mode with nothing hot returns the plain path (plan None)."""
    import ray.data

    t = pa.table(
        {
            "u": pa.array(np.arange(1000) % 500, pa.int64()),
            "ts": pa.array(np.arange(1000), pa.int64()),
            "v": pa.array(np.ones(1000)),
        }
    )
    ds = ray.data.from_arrow(t)
    assert w._plan_hot_split(ds, "u", "ts", "v", 4, 1 << 30) is None
    out = rel.collect(
        w.running_total(ds, "u", "ts", "v", hot_keys="auto", hot_bytes=1 << 30)
    )
    assert out.num_rows == 1000


def test_range_join_broadcast(ray_session):
    """Interval join: boundary inclusivity ([lo, hi)), gap drops, NULL
    drops, overlap rejection."""
    import numpy as np
    import ray.data

    from datafusion_orc_ray.pipelines import windows as w

    tiers = pa.table(
        {
            "tier_id": pa.array([0, 1, 2], pa.int64()),
            "lo": pa.array([0.0, 10.0, 30.0]),  # gap [20, 30)
            "hi": pa.array([10.0, 20.0, 40.0]),
        }
    )
    left = pa.table(
        {
            "k": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
            "v": pa.array([0.0, 9.999, 10.0, 25.0, 39.9, 40.0, None]),
        }
    )
    out = (
        rel.collect(
            w.range_join_broadcast(ray.data.from_arrow(left), tiers, "v", "lo", "hi")
        )
        .sort_by("k")
        .to_pydict()
    )
    # v=25 (gap), v=40 (right-open), NULL all drop
    assert out["k"] == [1, 2, 3, 5]
    assert out["tier_id"] == [0, 0, 1, 2]
    bad = tiers.set_column(1, "lo", pa.array([0.0, 5.0, 30.0]))  # overlap
    with pytest.raises(ValueError, match="non-overlapping"):
        w.range_join_broadcast(ray.data.from_arrow(left), bad, "v", "lo", "hi")


def test_sessionize_hot_split_int64_ns_exact(ray_session):
    """ADVICE r4: the hot-split stitch once carried bin boundary ts as
    float64, rounding >2^53 int64 order values by ~256 units — enough to
    flip a cross-bin merge decision when a boundary gap sits within one
    rounding step of gap_us. Order values near 2^60 with gaps of exactly
    gap_us-1 / gap_us / gap_us+1 make any float rounding observable: the
    hot-split result must equal the cold single-pass result exactly."""
    import ray.data

    rng = np.random.default_rng(5)
    n = 6_000
    gap_us = 1_000
    gaps = rng.choice([gap_us - 1, gap_us, gap_us + 1], n)
    ts = (1 << 60) + np.cumsum(gaps.astype(np.int64))
    t = pa.table(
        {
            "user_id": pa.array(np.full(n, 7), pa.int64()),
            "ts": pa.array(ts, pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(5)
    hot = rel.collect(
        w.sessionize(ds, gap_us=gap_us, hot_keys="auto", hot_bytes=15_000)
    ).sort_by([("user_id", "ascending"), ("sid", "ascending")])
    ref = rel.collect(w.sessionize(ds, gap_us=gap_us)).sort_by(
        [("user_id", "ascending"), ("sid", "ascending")]
    )
    assert hot.num_rows == ref.num_rows
    for c in ("user_id", "sid", "n_events", "session_start"):
        assert hot.column(c).to_pylist() == ref.column(c).to_pylist(), c
    plan = w._plan_hot_split(ds, "user_id", "ts", "ts", 4, 15_000, with_bases=False)
    assert plan is not None and plan.n_parts(0) >= 2
