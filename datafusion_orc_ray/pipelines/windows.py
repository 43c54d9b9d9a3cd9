"""Event-time operators Ray Data lacks natively, built per the brief's
custom-operator ladder: composition of map_batches + groupby/map_groups
first, broadcast state second — never driver loops.

* tumbling windows      — see __ray_entry__ window_agg_events (grouped_agg)
* sliding windows       — each row fans out to the windows containing it
                          (vectorized flat-map), then the same partial ->
                          tree-reduce aggregate; no extra shuffle beyond
                          the aggregate itself
* sessionization        — gap-based sessions per user: users co-locate by
                          hash bucket (ONE groupby shuffle), then a fully
                          vectorized per-bucket pass (sort, boundary diff,
                          cumsum session ids, Arrow groupby)
* as-of join            — broadcast variant: the right side (sorted event
                          marks / checkpoints) is ray.put once; each batch
                          resolves its as-of row with one searchsorted.
                          Partitioning assumption: right side fits memory
                          (marks/dimensions); a range-bucketed variant is
                          the path for large rights.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .relational import _stable_hash64, collect, grouped_agg


def sliding_window_agg(
    ds: ray.data.Dataset,
    ts_col: str,
    key_col: str,
    val_col: str,
    window_us: int,
    slide_us: int,
) -> pa.Table:
    """Aggregate over sliding event-time windows (window length
    ``window_us``, advancing every ``slide_us``; window id = start/slide
    index). A row at time t belongs to windows
    floor(t/slide)-window/slide+1 .. floor(t/slide). Requires slide to
    divide window (hopping windows); otherwise membership counts vary per
    row and the fan-out below would silently drop windows."""
    if window_us <= 0 or slide_us <= 0 or window_us % slide_us != 0:
        raise ValueError(
            f"slide_us must divide window_us (got window={window_us}, slide={slide_us})"
        )
    n_per = window_us // slide_us

    def fan_out(batch: pa.Table) -> pa.Table:
        us = batch.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        base = us // slide_us
        parts = []
        for i in range(n_per):
            parts.append(
                pa.table(
                    {
                        key_col: batch.column(key_col),
                        "w": pa.array(base - i),
                        val_col: batch.column(val_col),
                    }
                )
            )
        return pa.concat_tables(parts)

    fanned = ds.map_batches(fan_out, batch_format="pyarrow")
    return grouped_agg(
        fanned, [key_col, "w"], {"total": ("sum", val_col), "n": ("count", val_col)}
    )


def _session_offsets(
    ds: ray.data.Dataset,
    plan: _HotPlan,
    user_col: str,
    ts_col: str,
    gap_us: int,
    n_buckets: int,
) -> dict[int, int]:
    """Stitch pass for hot-split sessionize: a THIN (part, ts) shuffle
    over hot-user rows only, yielding per (hot user, bin) the local
    session count and boundary ts. The driver walks bins in ts order
    turning them into global sid offsets — two boundary sessions merge
    exactly when the cold path's gap rule would NOT start a new session
    (NaN-safe: comparisons with null ts are False, so null-ts rows glue
    to the previous session just like the single-bucket path)."""

    def thin(batch: pa.Table) -> pa.Table:
        sel = pc.is_in(
            batch.column(user_col),
            value_set=pa.array(plan.keys, batch.schema.field(user_col).type),
        )
        sub = batch.filter(pc.fill_null(sel, False))
        if sub.num_rows == 0:
            return pa.table(
                {
                    "__part": pa.array([], pa.int32()),
                    ts_col: pa.array([], batch.schema.field(ts_col).type),
                }
            )
        kv = sub.column(user_col).to_numpy(zero_copy_only=False)
        tsv, tnull = _ts_np(sub.column(ts_col))
        part = np.zeros(sub.num_rows, np.int32)
        for i, k in enumerate(plan.keys):
            pos = np.flatnonzero(kv == k)
            if pos.size:
                bins = plan.bin_of(i, tsv[pos], tnull[pos])
                part[pos] = n_buckets + plan.offsets[i] + bins
        return pa.table({"__part": pa.array(part), ts_col: sub.column(ts_col)})

    def summarize(group: pa.Table) -> pa.Table:
        part = int(group.column("__part")[0].as_py())
        # first/last stay EXACT int64 (ADVICE r4: float64 rounds >2^53
        # ns timestamps by ~hundreds of ns, which can flip the cross-bin
        # merge decision when a boundary gap lies within ~1µs of
        # gap_us). Null ts rows glue to the previous session (NaN-safe
        # cold-path comparisons), so sessions are counted among the
        # NON-null values; an all-null bin is one session and carries
        # has_ts=False instead of NaN — the stitch always merges it.
        iv = pc.drop_null(group.column(ts_col).cast(pa.int64()))
        us = np.sort(iv.to_numpy(zero_copy_only=False).astype(np.int64))
        k = 1 + int((np.diff(us) > gap_us).sum()) if us.size else 1
        return pa.table(
            {
                "part": pa.array([part], pa.int64()),
                "k": pa.array([k], pa.int64()),
                "first": pa.array([int(us[0]) if us.size else 0], pa.int64()),
                "last": pa.array([int(us[-1]) if us.size else 0], pa.int64()),
                "has_ts": pa.array([bool(us.size)], pa.bool_()),
            }
        )

    summ = collect(
        ds.map_batches(thin, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(summarize, batch_format="pyarrow")
    ).sort_by("part")
    offsets: dict[int, int] = {}
    parts = summ.column("part").to_numpy(zero_copy_only=False)
    ks = summ.column("k").to_numpy(zero_copy_only=False)
    firsts = summ.column("first").to_numpy(zero_copy_only=False)
    lasts = summ.column("last").to_numpy(zero_copy_only=False)
    has = summ.column("has_ts").to_numpy(zero_copy_only=False)
    for i in range(len(plan.keys)):
        lo = plan.n_buckets + plan.offsets[i]
        hi = lo + plan.n_parts(i)
        base, prev_k, prev_last, prev_has = 0, None, None, True
        for j in np.flatnonzero((parts >= lo) & (parts < hi)):
            if prev_k is not None:
                # a missing boundary ts on EITHER side means the cold
                # path's gap comparison is False -> no new session: merge
                merged = (
                    not prev_has
                    or not has[j]
                    or not (int(firsts[j]) - int(prev_last) > gap_us)
                )
                base += prev_k - (1 if merged else 0)
            offsets[int(parts[j])] = base
            prev_k, prev_last, prev_has = int(ks[j]), lasts[j], bool(has[j])
    return offsets


def sessionize(
    ds: ray.data.Dataset,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_us: int = 30 * 60 * 1_000_000,
    n_buckets: int | None = None,
    hot_keys: str | None = None,
    hot_bytes: int | None = None,
) -> ray.data.Dataset:
    """Gap-based sessions: a new session starts when a user's inter-event
    gap exceeds ``gap_us``. Returns one row per (user, session):
    (user_col, sid, n_events, session_start). One shuffle (user-hash
    bucket groupby); everything inside a bucket is vectorized numpy.

    ``hot_keys="auto"``: a mega-user (the classic bot account) splits
    across ts-range bins. A thin stitch pass (``_session_offsets``)
    turns per-bin local session counts + boundary ts into global sid
    offsets; sessions spanning a bin boundary emit one partial row per
    bin under the SAME (user, sid) and a final DISTRIBUTED commutative
    re-aggregate (sum n_events, min session_start) recombines them —
    no task ever holds the mega-user's full event set."""
    from ..util import TARGET_BUCKET_BYTES, bytes_scaled_buckets

    if n_buckets is None:
        n_buckets = bytes_scaled_buckets(ds)
    plan = (
        _plan_hot_split(
            ds, user_col, ts_col, ts_col, n_buckets,
            hot_bytes or TARGET_BUCKET_BYTES, with_bases=False,
        )
        if hot_keys == "auto"
        else None
    )
    offsets: dict[int, int] = {}
    if plan is not None:
        offsets = _session_offsets(ds, plan, user_col, ts_col, gap_us, n_buckets)

    def tag(batch: pa.Table) -> pa.Table:
        b = (_stable_hash64(batch.column(user_col)) % n_buckets).astype(np.int32)
        if plan is not None:
            kv = batch.column(user_col).to_numpy(zero_copy_only=False)
            tsv, tnull = _ts_np(batch.column(ts_col))
            for i, k in enumerate(plan.keys):
                pos = np.flatnonzero(kv == k)
                if pos.size:
                    bins = plan.bin_of(i, tsv[pos], tnull[pos])
                    b[pos] = n_buckets + plan.offsets[i] + bins
        return pa.table(
            {
                user_col: batch.column(user_col),
                ts_col: batch.column(ts_col),
                "__bucket": pa.array(b),
            }
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow")

    def bucket_sessions(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            # derive key/ts types from the group schema: hardcoded
            # int64/timestamp[us] would give this block a schema that
            # conflicts with non-empty groups for other key types
            return pa.table(
                {
                    user_col: pa.array([], group.schema.field(user_col).type),
                    "sid": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "session_start": pa.array([], group.schema.field(ts_col).type),
                }
            )
        off = 0
        if plan is not None:
            off = offsets.get(int(group.column("__bucket")[0].as_py()), 0)
        g = group.sort_by([(user_col, "ascending"), (ts_col, "ascending")])
        users = g.column(user_col).to_numpy(zero_copy_only=False)
        us = g.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        new_user = np.concatenate([[True], users[1:] != users[:-1]])
        gap = np.concatenate([[True], (us[1:] - us[:-1]) > gap_us])
        new_session = new_user | gap
        # session id restarts at 1 per user (cumsum of starts, offset by
        # the user's first session index - 1); hot sub-partitions (one
        # user, one ts bin) add their driver-stitched global offset
        sess_cum = np.cumsum(new_session)
        user_base = np.zeros(len(users), dtype=np.int64)
        first_idx = np.flatnonzero(new_user)
        user_base[first_idx] = sess_cum[first_idx] - 1
        user_base = np.maximum.accumulate(user_base)
        sid = sess_cum - user_base + off
        tbl = pa.table(
            {
                user_col: g.column(user_col),
                "sid": pa.array(sid),
                "__ts": g.column(ts_col),
            }
        )
        out = pa.TableGroupBy(tbl, [user_col, "sid"]).aggregate(
            [("__ts", "count"), ("__ts", "min")]
        )
        return out.rename_columns([user_col, "sid", "n_events", "session_start"])

    out = tagged.groupby("__bucket").map_groups(
        bucket_sessions, batch_format="pyarrow"
    )
    if plan is None:
        return out
    # sessions spanning a bin boundary exist as one partial row per bin
    # under the same (user, sid); recombine with the distributed
    # partial->final aggregate (commutative, no co-location). Cold rows
    # have unique (user, sid) and pass through unchanged.
    from .relational import grouped_agg_ds

    return grouped_agg_ds(
        out,
        [user_col, "sid"],
        {"n_events": ("sum", "n_events"), "session_start": ("min", "session_start")},
    )


def asof_join_broadcast(
    left: ray.data.Dataset,
    right_tbl: pa.Table,
    left_on: str,
    right_on: str,
    right_cols: list[str] | None = None,
) -> ray.data.Dataset:
    """For each left row, attach the right row with the greatest
    ``right_on`` <= ``left_on`` (classic as-of). The right side is sorted
    once, ray.put once, and every batch resolves with one vectorized
    searchsorted — no shuffle. Left rows before the first right key drop
    (inner as-of)."""
    rt = right_tbl.schema.field(right_on).type
    if not (pa.types.is_temporal(rt) or pa.types.is_integer(rt)):
        # casting float keys through int64 would silently truncate
        raise TypeError(f"asof key must be temporal or integer, got {rt}")
    lschema = left.schema()
    lt = getattr(lschema, "base_schema", lschema).field(left_on).type
    if pa.types.is_temporal(rt):
        # timestamp[us] vs timestamp[ms] would compare raw values in
        # different units — require identical temporal types
        if lt != rt:
            raise TypeError(f"asof key type mismatch: left {lt} vs right {rt}")
    elif not pa.types.is_integer(lt):
        raise TypeError(f"asof left key must be integer like right, got {lt}")
    # a NULL right key never matches (SQL) — and any null would widen
    # the int64 key array to float64, rounding values above 2^53
    right_tbl = right_tbl.filter(pc.is_valid(right_tbl.column(right_on)))
    right_tbl = right_tbl.sort_by(right_on)
    keys = right_tbl.column(right_on).cast(pa.int64()).to_numpy(zero_copy_only=False)
    take_cols = right_cols or [c for c in right_tbl.column_names]
    lcols = set(getattr(lschema, "base_schema", lschema).names)
    clash = sorted(set(take_cols) & lcols)
    if clash:
        # silently skipping a clashing right column would let the caller
        # read the LEFT column believing it is the joined as-of value
        raise ValueError(f"ambiguous as-of join columns: {clash}")
    rt_ref = ray.put((keys, right_tbl.select(take_cols)))

    def join(batch: pa.Table) -> pa.Table:
        rkeys, rtbl = ray.get(rt_ref)
        col = batch.column(left_on)
        # fill nulls BEFORE to_numpy: any null in the batch would widen
        # the whole int64 column to float64 and round valid probes above
        # 2^53 (boundary misassignment); the 0-filled rows are masked out
        # below via is_valid
        lv = pc.fill_null(col.cast(pa.int64()), 0).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(rkeys, lv, side="right") - 1
        keep = idx >= 0
        if col.null_count:
            # NULL keys never match (SQL); their filled-0 probes above
            # would otherwise join to whatever row 0 sorts under
            keep &= pc.is_valid(col).to_numpy(zero_copy_only=False)
        batch = batch.filter(pa.array(keep))
        picked = rtbl.take(pa.array(idx[keep].astype(np.int64), pa.int64()))
        out = batch
        for c in picked.column_names:
            out = out.append_column(c, picked.column(c))
        return out

    return left.map_batches(join, batch_format="pyarrow")


def range_join_broadcast(
    left: ray.data.Dataset,
    right_tbl: pa.Table,
    left_on: str,
    lo_col: str,
    hi_col: str,
    right_cols: list[str] | None = None,
) -> ray.data.Dataset:
    """Interval (range) join: attach to each left row the right row whose
    half-open interval [lo, hi) contains ``left_on`` — tier/bucket/ip-range
    lookups (SQL ``JOIN ON l.v >= r.lo AND l.v < r.hi``). Inner semantics:
    left rows in no interval (or with NULL keys) drop.

    Partitioning assumption (validated eagerly): the right intervals are
    NON-OVERLAPPING — then containment is a single vectorized searchsorted
    against the sorted lo edges per batch, and the right side broadcasts
    once via ray.put, so the fact side never shuffles (the same
    small-side-broadcast shape as asof_join_broadcast above; overlapping
    intervals need a banded expansion and are rejected loudly)."""
    right_tbl = right_tbl.sort_by(lo_col)
    # integer edges keep an EXACT int64 path: casting 64-bit ids or
    # nanosecond epochs through float64 rounds above 2^53 and silently
    # misassigns probes near interval boundaries
    int_mode = pa.types.is_integer(
        right_tbl.schema.field(lo_col).type
    ) and pa.types.is_integer(right_tbl.schema.field(hi_col).type)
    edge_np = np.int64 if int_mode else np.float64
    lo_c = right_tbl.column(lo_col)
    hi_c = right_tbl.column(hi_col)
    if lo_c.null_count or hi_c.null_count:
        raise ValueError("range_join: NULL interval edges")
    lo = lo_c.to_numpy(zero_copy_only=False).astype(edge_np)
    hi = hi_c.to_numpy(zero_copy_only=False).astype(edge_np)
    if not int_mode and (np.isnan(lo).any() or np.isnan(hi).any()):
        raise ValueError("range_join: NaN interval edges")
    if (hi < lo).any():
        raise ValueError("range_join: interval with hi < lo")
    if len(lo) > 1 and (lo[1:] < hi[:-1]).any():
        raise ValueError(
            "range_join_broadcast requires non-overlapping intervals "
            "(banded expansion for overlapping ranges is not implemented)"
        )
    take_cols = right_cols or list(right_tbl.column_names)
    lschema = left.schema()
    clash = sorted(
        set(take_cols) & set(getattr(lschema, "base_schema", lschema).names)
    )
    if clash:
        raise ValueError(f"ambiguous range join columns: {clash}")
    rt_ref = ray.put((lo, hi, right_tbl.select(take_cols)))

    def join(batch: pa.Table) -> pa.Table:
        rlo, rhi, rtbl = ray.get(rt_ref)
        col = batch.column(left_on)
        valid = (
            pc.is_valid(col).to_numpy(zero_copy_only=False)
            if col.null_count
            else np.ones(len(col), bool)
        )
        if int_mode and pa.types.is_integer(col.type):
            # fill nulls in Arrow BEFORE to_numpy: a null-bearing int64
            # column otherwise widens to float64 and rounds valid probes
            # above 2^53 — exactly the misassignment int_mode exists to
            # prevent; the filled rows drop via the `valid` mask
            lv = pc.fill_null(col.cast(pa.int64()), 0).to_numpy(
                zero_copy_only=False
            )
        else:
            lv = col.to_numpy(zero_copy_only=False).astype(np.float64)
            with np.errstate(invalid="ignore"):
                valid &= ~np.isnan(lv)
            lv = np.nan_to_num(lv)
        idx = np.searchsorted(rlo, lv, side="right") - 1
        keep = (idx >= 0) & valid
        keep[keep] &= lv[keep] < rhi[idx[keep]]
        batch = batch.filter(pa.array(keep))
        picked = rtbl.take(pa.array(idx[keep], pa.int64()))
        out = batch
        for c in picked.column_names:
            out = out.append_column(c, picked.column(c))
        return out

    return left.map_batches(join, batch_format="pyarrow")


# -------- hot-key ts-range splitting (skew-proof decomposable windows)
#
# Hash co-location sends a key's EVERY row to one map_groups task, so a
# single mega-key (one bot user with 1% of a 100-TB event log) is a task
# OOM no matter how many buckets exist. For windows that decompose along
# the ORDER axis (running_total: cumsum = local cumsum + prefix base),
# a hot key can instead split across ts-RANGE sub-partitions whose exact
# carry-over bases come from a cheap commutative pre-aggregate — no task
# ever holds more than ~hot_bytes of the key.


class _HotPlan:
    """Driver-side plan for splitting hot keys by ts range: per hot key
    an edges array (S-1 sorted ts cut points -> S bins, assignment via
    searchsorted side='right' so equal ts never split), a dense part-id
    block [n_buckets + offset, n_buckets + offset + S), and per-part
    (base_sum, base_cnt) prefix bases filled by the bases pass.

    ``null_own=True`` gives null order-values their OWN trailing bin
    (rank-style ops: nulls order LAST regardless of ASC/DESC, so they
    cannot share a bin with the largest values — under DESC those rank
    first while nulls rank last, and one per-part offset could not
    serve both)."""

    def __init__(self, n_buckets: int, null_own: bool = False) -> None:
        self.n_buckets = n_buckets
        self.null_own = null_own
        self.keys: list = []
        self.edges: list[np.ndarray] = []
        self.offsets: list[int] = []
        self.bases: dict[int, tuple[float, int]] = {}
        self.raw_counts: dict[int, int] = {}
        self.valid_counts: dict[int, int] = {}  # non-null val rows per bin

    def add(self, key, edges: np.ndarray) -> None:
        prev = self.offsets[-1] + self.n_parts(len(self.keys) - 1) if self.keys else 0
        self.keys.append(key)
        self.edges.append(edges)
        self.offsets.append(prev)

    def n_parts(self, i: int) -> int:
        return len(self.edges[i]) + 1 + (1 if self.null_own else 0)

    def bin_of(self, i: int, ts: np.ndarray, null_mask: np.ndarray) -> np.ndarray:
        b = np.searchsorted(self.edges[i], ts, side="right")
        if null_mask.any():
            b[null_mask] = self.n_parts(i) - 1  # ORDER BY ... NULLS LAST
        return b.astype(np.int64)


def _ts_np(col: pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """(values, null_mask) for the order column as numpy — datetime64 /
    numeric; null slots carry NaT/NaN and are overridden via the mask."""
    nulls = pc.is_null(col).to_numpy(zero_copy_only=False)
    return col.to_numpy(zero_copy_only=False), nulls


def _plan_hot_split(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    val_col: str,
    n_buckets: int,
    hot_bytes: int,
    with_bases: bool = True,
    null_own: bool = False,
) -> _HotPlan | None:
    """Three cheap column-pruned passes (census -> ts sample -> bases)
    that produce a _HotPlan, or None when no key is hot enough to split.

    * census: per batch, top-64 key counts + batch row/byte totals — a
      key is hot when its estimated global bytes exceed ``hot_bytes``.
      Partials are O(64) rows per batch; nulls never qualify (they stay
      on the cold hash path).
    * ts sample: <= 16 evenly spaced order-values per hot key per batch;
      the driver cuts S = ceil(est_bytes / hot_bytes) bins (<= 64) at
      sample quantiles.
    * bases: per (hot key, bin) exact sum/valid-count of ``val`` — a
      COMMUTATIVE aggregate, so it needs no co-location; the driver
      prefixes bins into carry-over bases keyed by final part id.

    DETERMINISM REQUIREMENT (ADVICE r4): every pre-pass and the main
    pass re-execute the upstream pipeline independently, so ``ds`` must
    re-execute deterministically (sources, maps, filters are; random
    sampling or wall-clock-dependent transforms are NOT). A
    nondeterministic upstream makes carry-over bases / fetched bins
    disagree with the tagged rows — wrong results or a KeyError, not
    just extra cost. Materialize such an input first
    (``ds.materialize()``) before passing ``hot_keys="auto"``.
    """

    def census(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch.column(key_col))
        counts = vc.field("counts").to_numpy(zero_copy_only=False)
        order = np.argsort(counts)[::-1][:64]
        rows = np.zeros(len(order), np.int64)
        nbytes = np.zeros(len(order), np.int64)
        if len(order):
            rows[0], nbytes[0] = batch.num_rows, batch.nbytes
        return pa.table(
            {
                "k": vc.field("values").take(pa.array(order)),
                "n": pa.array(counts[order]),
                "rows": pa.array(rows),
                "bytes": pa.array(nbytes),
            }
        )

    parts = collect(
        ds.select_columns([key_col]).map_batches(census, batch_format="pyarrow")
    )
    total_rows = int(pc.sum(parts.column("rows")).as_py() or 0)
    total_bytes = int(pc.sum(parts.column("bytes")).as_py() or 0)
    if total_rows == 0:
        return None
    # the census pass reads ONLY the key column, so its byte totals are
    # key-column bytes — a key carrying 256 MB of text behind 2 MB of
    # keys would slip the threshold. Scale shares by the FULL-ROW byte
    # estimate when source metadata offers one (free for reads); thin
    # bytes remain the fallback for post-transform inputs (then the
    # threshold is key-bytes-proportional — pass hot_bytes accordingly).
    from ..util import estimate_size_bytes

    full = estimate_size_bytes(ds)
    if full is not None and full > total_bytes:
        total_bytes = int(full)
    agg = parts.group_by("k").aggregate([("n", "sum")])
    cnt = agg.column("n_sum").to_numpy(zero_copy_only=False)
    est_bytes = cnt / total_rows * total_bytes
    hot_idx = np.flatnonzero(est_bytes > hot_bytes)
    hot_pairs = [
        (agg.column("k")[int(i)].as_py(), float(est_bytes[int(i)]))
        for i in hot_idx
    ]
    hot_pairs = [(k, b) for k, b in hot_pairs if k is not None]
    if not hot_pairs:
        return None
    hot_pairs = sorted(hot_pairs, key=lambda kb: -kb[1])[:64]
    hot_keys = [k for k, _ in hot_pairs]
    key_type = parts.schema.field("k").type

    def sample_ts(batch: pa.Table) -> pa.Table:
        sel = pc.is_in(batch.column(key_col), value_set=pa.array(hot_keys, key_type))
        sub = batch.filter(pc.fill_null(sel, False)).select([key_col, ts_col])
        sub = sub.filter(pc.is_valid(sub.column(ts_col)))
        if sub.num_rows == 0:
            return pa.table(
                {
                    "k": pa.array([], key_type),
                    "t": pa.array([], batch.schema.field(ts_col).type),
                }
            )
        keep: list[int] = []
        kv = sub.column(key_col).to_numpy(zero_copy_only=False)
        for k in hot_keys:
            pos = np.flatnonzero(kv == k)
            if pos.size:
                keep.extend(pos[np.linspace(0, pos.size - 1, min(16, pos.size)).astype(np.int64)])
        picked = sub.take(pa.array(np.array(sorted(keep), np.int64)))
        return pa.table(
            {"k": picked.column(key_col), "t": picked.column(ts_col)}
        )

    samples = collect(
        ds.select_columns([key_col, ts_col]).map_batches(
            sample_ts, batch_format="pyarrow"
        )
    )
    plan = _HotPlan(n_buckets, null_own=null_own)
    est = dict(hot_pairs)
    sk = samples.column("k").to_numpy(zero_copy_only=False)
    st = samples.column("t").to_numpy(zero_copy_only=False)
    for k in hot_keys:
        tsv = np.sort(st[sk == k])
        s = int(np.clip(-(-est[k] // hot_bytes), 2, 64))
        if tsv.size < 2:
            continue  # no usable order samples: leave the key on the cold path
        cuts = tsv[np.linspace(0, tsv.size - 1, s + 1)[1:-1].astype(np.int64)]
        plan.add(k, cuts)
    if not plan.keys:
        return None
    if not with_bases:
        return plan  # lag/lead-style ops carry boundary ROWS, not sums
    kindex = {k: i for i, k in enumerate(plan.keys)}

    def base_partial(batch: pa.Table) -> pa.Table:
        sel = pc.is_in(batch.column(key_col), value_set=pa.array(plan.keys, key_type))
        sub = batch.filter(pc.fill_null(sel, False))
        ki, bi, bs, bc, br = [], [], [], [], []
        if sub.num_rows:
            kv = sub.column(key_col).to_numpy(zero_copy_only=False)
            tsv, tnull = _ts_np(sub.column(ts_col))
            vcol = sub.column(val_col)
            valid = pc.is_valid(vcol).to_numpy(zero_copy_only=False)
            v = vcol.to_numpy(zero_copy_only=False).astype(np.float64)
            v = np.where(valid, v, 0.0)
            for k, i in kindex.items():
                pos = np.flatnonzero(kv == k)
                if not pos.size:
                    continue
                nb = plan.n_parts(i)
                bins = plan.bin_of(i, tsv[pos], tnull[pos])
                ki.extend([i] * nb)
                bi.extend(range(nb))
                bs.extend(np.bincount(bins, weights=v[pos], minlength=nb))
                bc.extend(np.bincount(bins, weights=valid[pos], minlength=nb))
                br.extend(np.bincount(bins, minlength=nb))
        return pa.table(
            {
                "ki": pa.array(ki, pa.int64()),
                "bin": pa.array(bi, pa.int64()),
                "s": pa.array(bs, pa.float64()),
                "c": pa.array(bc, pa.float64()),
                "r": pa.array(br, pa.float64()),
            }
        )

    bt = collect(
        ds.select_columns(list(dict.fromkeys([key_col, ts_col, val_col]))).map_batches(
            base_partial, batch_format="pyarrow"
        )
    )
    bagg = bt.group_by(["ki", "bin"]).aggregate(
        [("s", "sum"), ("c", "sum"), ("r", "sum")]
    )
    ks = bagg.column("ki").to_numpy(zero_copy_only=False)
    bs_ = bagg.column("bin").to_numpy(zero_copy_only=False)
    ss = bagg.column("s_sum").to_numpy(zero_copy_only=False)
    cs = bagg.column("c_sum").to_numpy(zero_copy_only=False)
    rs = bagg.column("r_sum").to_numpy(zero_copy_only=False)
    for i in range(len(plan.keys)):
        mask = ks == i
        nb = plan.n_parts(i)
        sums = np.zeros(nb)
        cnts = np.zeros(nb)
        raws = np.zeros(nb)
        sums[bs_[mask]] = ss[mask]
        cnts[bs_[mask]] = cs[mask]
        raws[bs_[mask]] = rs[mask]
        pre_s = np.concatenate([[0.0], np.cumsum(sums)[:-1]])
        pre_c = np.concatenate([[0.0], np.cumsum(cnts)[:-1]])
        for b in range(nb):
            part = n_buckets + plan.offsets[i] + b
            plan.bases[part] = (float(pre_s[b]), int(pre_c[b]))
            plan.raw_counts[part] = int(raws[b])
            plan.valid_counts[part] = int(cnts[b])
    return plan


def _hot_boundary_rows(
    ds: ray.data.Dataset,
    plan: _HotPlan,
    key_col: str,
    ts_col: str,
    carry_cols: list[str],
    tiebreak: str | None,
    n: int,
) -> tuple[dict[int, pa.Table], dict[int, pa.Table]]:
    """For ops that need boundary VALUES (lag/lead, moving windows):
    one cheap pass collecting, per (hot key, ts bin), the first/last
    ``n`` rows by (ts [, tiebreak]) — per-batch top-n partials, so the
    exchange moves <= 2n rows per (key, bin) per batch. The driver
    stitches bins cumulatively (a bin with < n rows borrows from the
    bin before/after), returning {part_id: phantom-row table} for the
    previous-tail and next-head sides."""
    order = [(ts_col, "ascending")] + ([(tiebreak, "ascending")] if tiebreak else [])
    cols = [ts_col] + ([tiebreak] if tiebreak else []) + carry_cols

    def partial(batch: pa.Table) -> pa.Table:
        sel = pc.is_in(
            batch.column(key_col),
            value_set=pa.array(plan.keys, batch.schema.field(key_col).type),
        )
        sub = batch.filter(pc.fill_null(sel, False))
        outs = []
        empty = pa.table(
            {
                "ki": pa.array([], pa.int64()),
                "bin": pa.array([], pa.int64()),
                "side": pa.array([], pa.int8()),
                **{c: pa.array([], batch.schema.field(c).type) for c in cols},
            }
        )
        if sub.num_rows == 0:
            return empty
        kv = sub.column(key_col).to_numpy(zero_copy_only=False)
        tsv, tnull = _ts_np(sub.column(ts_col))
        for i, k in enumerate(plan.keys):
            pos = np.flatnonzero(kv == k)
            if not pos.size:
                continue
            bins = plan.bin_of(i, tsv[pos], tnull[pos])
            kt = (
                sub.take(pa.array(pos))
                .select(cols)
                .append_column("bin", pa.array(bins))
                .sort_by([("bin", "ascending")] + order)
            )
            bsorted = kt.column("bin").to_numpy(zero_copy_only=False)
            starts = np.flatnonzero(
                np.concatenate([[True], bsorted[1:] != bsorted[:-1]])
            )
            ends = np.append(starts[1:], len(bsorted))
            for s, e in zip(starts, ends):
                for side, seg in ((0, kt.slice(s, min(n, e - s))),
                                  (1, kt.slice(max(s, e - n), min(n, e - s)))):
                    outs.append(
                        pa.table(
                            {
                                "ki": pa.array([i] * seg.num_rows, pa.int64()),
                                "bin": pa.array(
                                    [int(bsorted[s])] * seg.num_rows, pa.int64()
                                ),
                                "side": pa.array([side] * seg.num_rows, pa.int8()),
                                **{c: seg.column(c) for c in cols},
                            }
                        )
                    )
        return pa.concat_tables(outs) if outs else empty

    bt = collect(
        ds.select_columns(sorted({key_col, *cols})).map_batches(
            partial, batch_format="pyarrow"
        )
    )
    prev_tails: dict[int, pa.Table] = {}
    next_heads: dict[int, pa.Table] = {}
    for i in range(len(plan.keys)):
        nb = plan.n_parts(i)
        kt = bt.filter(pc.equal(bt.column("ki"), i))
        tails = kt.filter(pc.equal(kt.column("side"), 1)).sort_by(
            [("bin", "ascending")] + order
        )
        heads = kt.filter(pc.equal(kt.column("side"), 0)).sort_by(
            [("bin", "ascending")] + order
        )
        cum = tails.slice(0, 0).select(cols)
        for b in range(nb):
            part = plan.n_buckets + plan.offsets[i] + b
            if cum.num_rows:
                prev_tails[part] = cum
            seg = tails.filter(pc.equal(tails.column("bin"), b)).select(cols)
            cum = pa.concat_tables([cum, seg])
            cum = cum.slice(max(0, cum.num_rows - n), min(n, cum.num_rows))
        cum = heads.slice(0, 0).select(cols)
        for b in range(nb - 1, -1, -1):
            part = plan.n_buckets + plan.offsets[i] + b
            if cum.num_rows:
                next_heads[part] = cum
            seg = heads.filter(pc.equal(heads.column("bin"), b)).select(cols)
            cum = pa.concat_tables([seg, cum]).slice(0, n)
    return prev_tails, next_heads


def _hot_tag_fn(key_col: str, ts_col: str, n_buckets: int, plan: _HotPlan | None):
    """Shared co-location tagger: key-hash bucket for every row, then
    hot keys (when a plan exists) overridden to their ts-range part."""

    def tag(batch: pa.Table) -> pa.Table:
        b = (_stable_hash64(batch.column(key_col)) % n_buckets).astype(np.int32)
        if plan is not None:
            kv = batch.column(key_col).to_numpy(zero_copy_only=False)
            tsv, tnull = _ts_np(batch.column(ts_col))
            for i, k in enumerate(plan.keys):
                pos = np.flatnonzero(kv == k)
                if pos.size:
                    bins = plan.bin_of(i, tsv[pos], tnull[pos])
                    b[pos] = n_buckets + plan.offsets[i] + bins
        return batch.append_column("__bucket", pa.array(b))

    return tag


def _phantom_sorted(
    group: pa.Table,
    plan: _HotPlan | None,
    n_buckets: int,
    prev_tails: dict[int, pa.Table],
    next_heads: dict[int, pa.Table],
    key_col: str,
    sort_keys: list[tuple[str, str]],
) -> tuple[pa.Table, np.ndarray | None]:
    """map_groups front end shared by the phantom-row window ops: drop
    the bucket column, splice in this sub-partition's boundary rows
    (prev-bin tails / next-bin heads; missing phantom columns
    null-filled, key filled so segmenting stays one segment), sort, and
    return (table, real-row mask) — mask None when no phantoms apply
    (cold bucket, boundary-less bin, or no hot plan)."""
    part = None
    if plan is not None and group.num_rows:
        part = group.column("__bucket")[0].as_py()
    pt_ = prev_tails.get(part) if part is not None else None
    nh_ = next_heads.get(part) if part is not None else None
    group = group.drop_columns(["__bucket"])
    if part is None or part < n_buckets or (pt_ is None and nh_ is None):
        return group.sort_by(sort_keys), None
    kval = group.column(key_col)[0].as_py()
    tbls, real = [], []
    for ph, is_real in ((pt_, False), (group, True), (nh_, False)):
        if is_real:
            tbls.append(group)
            real.append(np.ones(group.num_rows, bool))
            continue
        if ph is None:  # no phantom on this side (first/last bin)
            continue
        cols = {}
        for f in group.schema:
            if f.name in ph.column_names:
                cols[f.name] = ph.column(f.name).cast(f.type)
            elif f.name == key_col:
                cols[f.name] = pa.array([kval] * ph.num_rows, f.type)
            else:
                cols[f.name] = pa.nulls(ph.num_rows, f.type)
        tbls.append(pa.table(cols).select(group.column_names))
        real.append(np.zeros(ph.num_rows, bool))
    combined = pa.concat_tables(tbls)
    order = np.asarray(pc.sort_indices(combined, sort_keys=sort_keys))
    return combined.take(pa.array(order)), np.concatenate(real)[order]


def running_total(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    val_col: str,
    tiebreak: str | None = None,
    out_col: str = "running",
    n_buckets: int | None = None,
    hot_keys: str | None = None,
    hot_bytes: int | None = None,
) -> ray.data.Dataset:
    """sum(val) OVER (PARTITION BY key ORDER BY ts [, tiebreak] ROWS
    UNBOUNDED PRECEDING): key-hash co-location (one shuffle), then a
    vectorized per-bucket segmented cumsum.

    ``hot_keys="auto"`` additionally splits keys whose estimated bytes
    exceed ``hot_bytes`` (default: the 256 MB bucket target) across
    ts-range sub-partitions with exact carry-over bases — the 100-TB
    skew path: a mega-key is otherwise ONE task's memory however many
    hash buckets exist. Costs three cheap column-pruned pre-passes, so
    it re-executes upstream transforms; keep the default for inputs
    where no key can exceed a task's heap."""
    from ..util import TARGET_BUCKET_BYTES, bytes_scaled_buckets

    if n_buckets is None:
        n_buckets = bytes_scaled_buckets(ds)
    plan = (
        _plan_hot_split(
            ds, key_col, ts_col, val_col, n_buckets,
            hot_bytes or TARGET_BUCKET_BYTES,
        )
        if hot_keys == "auto"
        else None
    )

    tag = _hot_tag_fn(key_col, ts_col, n_buckets, plan)

    sort_keys = [(key_col, "ascending"), (ts_col, "ascending")] + (
        [(tiebreak, "ascending")] if tiebreak else []
    )

    def bucket_cumsum(group: pa.Table) -> pa.Table:
        base_sum, base_cnt = 0.0, 0
        if plan is not None and group.num_rows:
            part = group.column("__bucket")[0].as_py()
            base_sum, base_cnt = plan.bases.get(part, (0.0, 0))
        g = group.drop_columns(["__bucket"]).sort_by(sort_keys)
        if g.num_rows == 0:
            return g.append_column(out_col, pa.array([], pa.float64()))
        keys = g.column(key_col).to_numpy(zero_copy_only=False)
        vcol = g.column(val_col)
        valid = (
            pc.is_valid(vcol).to_numpy(zero_copy_only=False)
            if vcol.null_count
            else None
        )
        v = vcol.to_numpy(zero_copy_only=False).astype(np.float64)
        if valid is not None:
            # SQL SUM() OVER ignores NULL values; an un-filled NaN would
            # poison every later row's cumsum (and later SEGMENTS via the
            # base subtraction)
            v = np.where(valid, v, 0.0)
        cs = np.cumsum(v)
        new_key = np.concatenate([[True], keys[1:] != keys[:-1]])
        # subtract the cumsum just before each segment start; propagate the
        # base by segment index (a max-accumulate forward-fill is wrong once
        # values go negative and a later base undershoots an earlier one)
        starts = np.flatnonzero(new_key)
        seg = np.cumsum(new_key) - 1
        base = (cs[starts] - v[starts])[seg]
        running = cs - base + base_sum  # hot sub-partitions hold ONE key,
        # so the carry-over base applies to every (single-segment) row;
        # cold buckets get base_sum == 0
        if valid is None:
            return g.append_column(out_col, pa.array(running, pa.float64()))
        # rows before their segment's first NON-NULL value: SQL sum over
        # an empty window frame is NULL, not 0 (carry-over valid rows in
        # earlier ts bins count toward the frame)
        cnt = np.cumsum(valid.astype(np.int64))
        cbase = (cnt[starts] - valid[starts].astype(np.int64))[seg]
        return g.append_column(
            out_col,
            pa.array(running, pa.float64(), mask=(cnt - cbase + base_cnt) == 0),
        )

    return ds.map_batches(tag, batch_format="pyarrow").groupby("__bucket").map_groups(
        bucket_cumsum, batch_format="pyarrow"
    )


def lag_lead(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    val_col: str,
    n: int = 1,
    tiebreak: str | None = None,
    lag_col: str = "lag",
    lead_col: str = "lead",
    n_buckets: int | None = None,
    hot_keys: str | None = None,
    hot_bytes: int | None = None,
) -> ray.data.Dataset:
    """lag(val, n) / lead(val, n) OVER (PARTITION BY key ORDER BY ts
    [, tiebreak]): the same ONE key-hash co-location shuffle as
    ``running_total``, then a vectorized per-bucket pass — sort, segment
    boundaries, and an index-shift ``take`` whose out-of-segment indices
    are null, so values of ANY Arrow type (floats, strings, timestamps)
    shift without a cast. SQL semantics: the first/last n rows of each
    partition get NULL.

    ``hot_keys="auto"``: mega-keys split across ts-range sub-partitions
    (same plan machinery as ``running_total``); cross-bin shifts are
    exact via PHANTOM boundary rows — each sub-partition prepends the
    previous bin's last n rows and appends the next bin's first n
    (``_hot_boundary_rows``), computes shifts, then drops the phantoms.
    Bin edges never split equal ts, so phantoms sort strictly outside
    the bin's real rows."""
    from ..util import TARGET_BUCKET_BYTES, bytes_scaled_buckets

    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if n_buckets is None:
        n_buckets = bytes_scaled_buckets(ds)
    plan = (
        _plan_hot_split(
            ds, key_col, ts_col, val_col, n_buckets,
            hot_bytes or TARGET_BUCKET_BYTES, with_bases=False,
        )
        if hot_keys == "auto"
        else None
    )
    prev_tails: dict[int, pa.Table] = {}
    next_heads: dict[int, pa.Table] = {}
    if plan is not None:
        carry = [val_col] if val_col != ts_col else []
        prev_tails, next_heads = _hot_boundary_rows(
            ds, plan, key_col, ts_col, carry, tiebreak, n
        )

    tag = _hot_tag_fn(key_col, ts_col, n_buckets, plan)

    sort_keys = [(key_col, "ascending"), (ts_col, "ascending")] + (
        [(tiebreak, "ascending")] if tiebreak else []
    )

    def bucket_shift(group: pa.Table) -> pa.Table:
        group, real_mask = _phantom_sorted(
            group, plan, n_buckets, prev_tails, next_heads, key_col, sort_keys
        )
        g = group
        vals = g.column(val_col)
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        if g.num_rows == 0:
            empty = pa.array([], vals.type)
            return g.append_column(lag_col, empty).append_column(lead_col, empty)
        keys = g.column(key_col).to_numpy(zero_copy_only=False)
        new_key = np.concatenate([[True], keys[1:] != keys[:-1]])
        seg = np.cumsum(new_key) - 1
        idx = np.arange(g.num_rows, dtype=np.int64)

        def shifted(offset: int) -> pa.Array:
            src = idx + offset
            ok = (src >= 0) & (src < g.num_rows)
            ok &= seg[np.clip(src, 0, g.num_rows - 1)] == seg
            return vals.take(pa.array(np.where(ok, src, 0), pa.int64(), mask=~ok))

        out = g.append_column(lag_col, shifted(-n)).append_column(lead_col, shifted(n))
        if real_mask is not None:
            out = out.filter(pa.array(real_mask))
        return out

    return ds.map_batches(tag, batch_format="pyarrow").groupby("__bucket").map_groups(
        bucket_shift, batch_format="pyarrow"
    )


def moving_avg(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    val_col: str,
    preceding: int,
    tiebreak: str | None = None,
    out_col: str = "moving_avg",
    n_buckets: int | None = None,
    hot_keys: str | None = None,
    hot_bytes: int | None = None,
) -> ray.data.Dataset:
    """avg(val) OVER (PARTITION BY key ORDER BY ts [, tiebreak] ROWS
    BETWEEN ``preceding`` PRECEDING AND CURRENT ROW): one key-hash
    co-location shuffle, then a per-bucket vectorized pass — sort,
    prefix sums, and each row's frame sum/count read as two prefix
    differences clamped at its segment start. SQL NULL semantics: null
    values contribute to neither sum nor count; an all-null frame yields
    NULL.

    ``hot_keys="auto"``: mega-keys split across ts-range sub-partitions;
    each sub-partition prepends the previous bin's last ``preceding``
    rows as phantoms (``_hot_boundary_rows``) so every frame is exact,
    then drops them — the ROWS-frame analogue of lag's boundary fix."""
    from ..util import TARGET_BUCKET_BYTES, bytes_scaled_buckets

    if preceding < 0:
        raise ValueError(f"preceding must be >= 0, got {preceding}")
    if n_buckets is None:
        n_buckets = bytes_scaled_buckets(ds)
    plan = (
        _plan_hot_split(
            ds, key_col, ts_col, val_col, n_buckets,
            hot_bytes or TARGET_BUCKET_BYTES, with_bases=False,
        )
        if hot_keys == "auto" and preceding > 0
        else None
    )
    prev_tails: dict[int, pa.Table] = {}
    if plan is not None:
        carry = [val_col] if val_col != ts_col else []
        prev_tails, _ = _hot_boundary_rows(
            ds, plan, key_col, ts_col, carry, tiebreak, preceding
        )

    tag = _hot_tag_fn(key_col, ts_col, n_buckets, plan)

    sort_keys = [(key_col, "ascending"), (ts_col, "ascending")] + (
        [(tiebreak, "ascending")] if tiebreak else []
    )

    def bucket_moving(group: pa.Table) -> pa.Table:
        g, real_mask = _phantom_sorted(
            group, plan, n_buckets, prev_tails, {}, key_col, sort_keys
        )
        if g.num_rows == 0:
            return g.append_column(out_col, pa.array([], pa.float64()))
        keys = g.column(key_col).to_numpy(zero_copy_only=False)
        vals = g.column(val_col)
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        valid = pc.is_valid(vals).to_numpy(zero_copy_only=False)
        v = np.where(valid, vals.to_numpy(zero_copy_only=False), 0).astype(np.float64)
        new_key = np.concatenate([[True], keys[1:] != keys[:-1]])
        starts = np.flatnonzero(new_key)
        seg = np.cumsum(new_key) - 1
        idx = np.arange(g.num_rows, dtype=np.int64)
        lo = np.maximum(starts[seg], idx - preceding)  # frame start (inclusive)
        cs = np.concatenate([[0.0], np.cumsum(v)])
        cn = np.concatenate([[0], np.cumsum(valid.astype(np.int64))])
        s = cs[idx + 1] - cs[lo]
        n = cn[idx + 1] - cn[lo]
        with np.errstate(invalid="ignore", divide="ignore"):
            avg = s / n
        out = g.append_column(out_col, pa.array(avg, pa.float64(), mask=n == 0))
        if real_mask is not None:
            out = out.filter(pa.array(real_mask))
        return out

    return ds.map_batches(tag, batch_format="pyarrow").groupby("__bucket").map_groups(
        bucket_moving, batch_format="pyarrow"
    )


def grouped_string_agg(
    ds: ray.data.Dataset,
    key_col: str,
    order_col: str,
    val_col: str,
    sep: str = ",",
    tiebreak: str | None = None,
    out_col: str = "vals",
    n_buckets: int | None = None,
    chunk_values: int | None = None,
    chunk_col: str = "chunk_idx",
    hot_keys: str | None = None,
    hot_bytes: int | None = None,
) -> ray.data.Dataset:
    """string_agg(val, sep ORDER BY order [, tiebreak]) GROUP BY key:
    one key-hash co-location shuffle, then a vectorized per-bucket pass
    — sort, segment boundaries, ONE ListArray + ``pc.binary_join`` for
    the whole bucket (no per-group Python). SQL semantics: NULL values
    are skipped; a key whose values are all NULL still appears, with a
    NULL aggregate.

    Whole-key mode is the ONE grouped op where hot-key splitting cannot
    help: the OUTPUT itself (one concatenated string per key) is
    key-sized, so a mega-key's result would not fit a task regardless
    of input partitioning. The scale escape hatch (VERDICT r4 #2) is
    CHUNKED emission: ``chunk_values=N`` switches the output to
    (key, chunk_idx, vals) rows of at most N non-null values each, in
    order — the full aggregate is ``sep``-join of a key's non-null
    chunks by ascending chunk_idx (NULL iff every chunk is NULL). With
    ``hot_keys="auto"`` a mega-key additionally splits across
    order-range bins (``_plan_hot_split``; chunks never span bins, so
    no phantom rows are needed) and NO task ever holds the mega-key's
    full value set OR its full output. chunk_idx is ordered but not
    dense across bins (bin index rides the high 32 bits); without hot
    splitting it is dense per key (0, 1, ...). If even one chunk row
    must not exceed the task budget, keep chunk_values modest — a chunk
    is at most chunk_values * max_value_len bytes."""
    from ..util import TARGET_BUCKET_BYTES, bytes_scaled_buckets

    if n_buckets is None:
        n_buckets = bytes_scaled_buckets(ds)
    if hot_keys is not None and chunk_values is None:
        raise ValueError(
            "hot_keys requires chunk_values: without chunking, the whole-key "
            "output is key-sized and splitting the input cannot bound the task"
        )
    if chunk_values is not None:
        if chunk_values < 1:
            raise ValueError("chunk_values must be >= 1")
        plan = (
            _plan_hot_split(
                ds, key_col, order_col, order_col, n_buckets,
                hot_bytes or TARGET_BUCKET_BYTES, with_bases=False,
            )
            if hot_keys == "auto"
            else None
        )
        return _grouped_string_agg_chunked(
            ds, key_col, order_col, val_col, sep, tiebreak, out_col,
            n_buckets, chunk_values, chunk_col, plan,
        )

    def tag(batch: pa.Table) -> pa.Table:
        cols = [key_col, order_col, val_col] + ([tiebreak] if tiebreak else [])
        batch = batch.select(cols)
        b = (_stable_hash64(batch.column(key_col)) % n_buckets).astype(np.int32)
        return batch.append_column("__bucket", pa.array(b))

    sort_keys = [(key_col, "ascending"), (order_col, "ascending")] + (
        [(tiebreak, "ascending")] if tiebreak else []
    )

    def bucket_agg(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["__bucket"]).sort_by(sort_keys)
        key_type = g.column(key_col).type
        if g.num_rows == 0:
            return pa.table(
                {key_col: pa.array([], key_type), out_col: pa.array([], pa.string())}
            )
        keys = g.column(key_col).to_numpy(zero_copy_only=False)
        # nulls group together (None != None is False on object arrays),
        # matching SQL GROUP BY null handling
        all_first = np.concatenate([[True], keys[1:] != keys[:-1]])
        all_keys = g.column(key_col).take(pa.array(np.flatnonzero(all_first)))
        seg = np.cumsum(all_first) - 1
        valid = pc.is_valid(g.column(val_col)).to_numpy(zero_copy_only=False)
        # each segment's valid values are contiguous in the filtered view
        # (filter preserves sort order) — map counts positionally, no
        # key re-lookup, so NULL-key groups aggregate correctly too
        counts = np.bincount(seg[valid], minlength=len(all_keys))
        sv = g.filter(pa.array(valid))
        vals = pc.cast(sv.column(val_col), pa.string())
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        offsets = pa.array(np.concatenate([[0], np.cumsum(counts)]), pa.int32())
        agg = pc.binary_join(pa.ListArray.from_arrays(offsets, vals), sep)
        # SQL string_agg over zero non-null values is NULL, not ""
        out_vals = pc.if_else(pa.array(counts > 0), agg, pa.scalar(None, pa.string()))
        return pa.table({key_col: all_keys, out_col: out_vals})

    return ds.map_batches(tag, batch_format="pyarrow").groupby("__bucket").map_groups(
        bucket_agg, batch_format="pyarrow"
    )


def _grouped_string_agg_chunked(
    ds: ray.data.Dataset,
    key_col: str,
    order_col: str,
    val_col: str,
    sep: str,
    tiebreak: str | None,
    out_col: str,
    n_buckets: int,
    chunk_values: int,
    chunk_col: str,
    plan: _HotPlan | None,
) -> ray.data.Dataset:
    """Chunked string_agg backend (see grouped_string_agg). Each output
    row holds <= chunk_values consecutive non-null values of one key;
    chunk_idx = bin_index * 2^32 + local_chunk so ordering across a hot
    key's order-range bins follows the global sort order (bin edges are
    searchsorted(side='right'), so equal order values never split and
    null order values land in the LAST bin, matching sort nulls-last)."""
    cols = [key_col, order_col, val_col] + ([tiebreak] if tiebreak else [])
    cols = list(dict.fromkeys(cols))
    ds = ds.select_columns(cols)
    tag = _hot_tag_fn(key_col, order_col, n_buckets, plan)
    # driver-side (part -> bin index) map: hot parts only, tiny
    part_bin: dict[int, int] = {}
    if plan is not None:
        for i in range(len(plan.keys)):
            for b in range(plan.n_parts(i)):
                part_bin[n_buckets + plan.offsets[i] + b] = b

    sort_keys = [(key_col, "ascending"), (order_col, "ascending")] + (
        [(tiebreak, "ascending")] if tiebreak else []
    )

    def bucket_chunks(group: pa.Table) -> pa.Table:
        part = int(group.column("__bucket")[0].as_py())
        bin_idx = part_bin.get(part, 0)
        g = group.drop_columns(["__bucket"]).sort_by(sort_keys)
        key_type = g.column(key_col).type
        empty = pa.table(
            {
                key_col: pa.array([], key_type),
                chunk_col: pa.array([], pa.int64()),
                out_col: pa.array([], pa.string()),
            }
        )
        if g.num_rows == 0:
            return empty
        keys = g.column(key_col).to_numpy(zero_copy_only=False)
        all_first = np.concatenate([[True], keys[1:] != keys[:-1]])
        all_keys = g.column(key_col).take(pa.array(np.flatnonzero(all_first)))
        seg = np.cumsum(all_first) - 1
        valid = pc.is_valid(g.column(val_col)).to_numpy(zero_copy_only=False)
        counts = np.bincount(seg[valid], minlength=len(all_keys))
        sv = g.filter(pa.array(valid))
        vals = pc.cast(sv.column(val_col), pa.string())
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        segv = seg[valid]
        # position of each valid value within its key segment
        seg_starts = np.cumsum(counts) - counts  # first filtered idx per seg
        pos = np.arange(len(segv), dtype=np.int64) - seg_starts[segv]
        chunk_local = pos // chunk_values
        if len(chunk_local) and int(chunk_local.max()) >= 1 << 32:
            raise ValueError(
                "over 2^32 chunks for one key in one bin — raise chunk_values"
            )
        if len(segv):
            cb = np.flatnonzero(
                np.concatenate(
                    [
                        [True],
                        (segv[1:] != segv[:-1]) | (chunk_local[1:] != chunk_local[:-1]),
                    ]
                )
            )
            offsets = pa.array(
                np.append(cb, len(segv)).astype(np.int32), pa.int32()
            )
            agg = pc.binary_join(pa.ListArray.from_arrays(offsets, vals), sep)
            chunk_keys = all_keys.take(pa.array(segv[cb]))
            chunk_ids = (np.int64(bin_idx) << 32) + chunk_local[cb]
            parts = [
                pa.table(
                    {
                        key_col: chunk_keys,
                        chunk_col: pa.array(chunk_ids, pa.int64()),
                        out_col: agg,
                    }
                )
            ]
        else:
            parts = [empty]
        # SQL: a key whose values are ALL NULL still appears, with a
        # NULL aggregate — one NULL chunk row per such key in this bin
        zmask = counts == 0
        if zmask.any():
            zk = all_keys.filter(pa.array(zmask))
            parts.append(
                pa.table(
                    {
                        key_col: zk,
                        chunk_col: pa.array(
                            np.full(len(zk), np.int64(bin_idx) << 32), pa.int64()
                        ),
                        out_col: pa.nulls(len(zk), pa.string()),
                    }
                )
            )
        return pa.concat_tables(parts)

    return ds.map_batches(tag, batch_format="pyarrow").groupby("__bucket").map_groups(
        bucket_chunks, batch_format="pyarrow"
    )


def asof_join_partitioned(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key_col: str,
    left_ts: str,
    right_ts: str,
    payload: dict[str, str],
    n_buckets: int | None = None,
    hot_keys: str | None = None,
    hot_bytes: int | None = None,
) -> ray.data.Dataset:
    """LEFT ASOF join for two LARGE sides (the broadcast variant's
    scale-out sibling): for every left row, the LATEST right row of the
    same key with right_ts <= left_ts, null-padded when none exists.
    ``payload`` maps output names to right columns (names must not
    clash with left's — self-joins rename here).

    One shared key-hash exchange co-locates both sides (union + tagged
    sides, same shape as hash_join's bucket path); each bucket then
    resolves every left row with ONE composite searchsorted — key codes
    and time offsets packed into int64, so there is no per-key Python
    loop. Guarded: the packing raises loudly if |keys/bucket| x
    time-span overflows int64 (raise n_buckets). Left rows with NULL
    key or ts match nothing (SQL ASOF LEFT JOIN); right rows with NULL
    key or ts are ignored.

    ``hot_keys="auto"``: a mega-key splits across ts-range bins (edges
    from a thin (key, ts) union of BOTH sides, so left probes and right
    marks bin identically); each bin's right side gains ONE phantom —
    the latest right row from any earlier bin (boundary pass, which
    borrows across empty bins) — making every as-of resolution exact.
    Phantoms are right-side rows, so no output masking is needed.
    Detection is row-proportional (the census sees the thin
    projection), not byte-proportional."""
    from ..util import TARGET_BUCKET_BYTES, bytes_scaled_buckets

    if n_buckets is None:
        n_buckets = bytes_scaled_buckets(left, right)
    l_schema = getattr(left.schema(), "base_schema", left.schema())
    r_schema = getattr(right.schema(), "base_schema", right.schema())
    l_cols = list(l_schema.names)
    clash = set(payload) & set(l_cols)
    if clash:
        raise ValueError(f"payload output names clash with left columns: {sorted(clash)}")
    ltt, rtt = l_schema.field(left_ts).type, r_schema.field(right_ts).type
    if pa.types.is_temporal(ltt) or pa.types.is_temporal(rtt):
        if ltt != rtt:  # unit mismatch would compare raw int64 wrongly
            raise TypeError(f"asof ts type mismatch: left {ltt} vs right {rtt}")
    elif not (pa.types.is_integer(ltt) and pa.types.is_integer(rtt)):
        raise TypeError(f"asof ts must be temporal or integer, got {ltt}/{rtt}")
    r_proj = list(dict.fromkeys([key_col, right_ts, *payload.values()]))

    out_key, out_rts = "__rk", "__rts"

    plan = None
    right_phantoms: dict[int, pa.Table] = {}
    part_key: dict[int, object] = {}
    if hot_keys == "auto":

        def thin_side(ts_name: str):
            def fn(batch: pa.Table) -> pa.Table:
                return pa.table(
                    {
                        key_col: batch.column(key_col),
                        "__t": pc.cast(batch.column(ts_name), pa.int64()),
                    }
                )

            return fn

        combined = left.map_batches(thin_side(left_ts), batch_format="pyarrow").union(
            right.map_batches(thin_side(right_ts), batch_format="pyarrow")
        )
        plan = _plan_hot_split(
            combined, key_col, "__t", "__t", n_buckets,
            hot_bytes or TARGET_BUCKET_BYTES, with_bases=False,
        )
    if plan is not None:
        carry = list(dict.fromkeys([right_ts, *payload.values()]))

        def thin_right(batch: pa.Table) -> pa.Table:
            batch = batch.select(r_proj)
            keep = pc.and_(
                pc.is_valid(batch.column(key_col)), pc.is_valid(batch.column(right_ts))
            )
            batch = batch.filter(keep)
            return batch.append_column(
                "__t64", pc.cast(batch.column(right_ts), pa.int64())
            )

        right_phantoms, _ = _hot_boundary_rows(
            right.map_batches(thin_right, batch_format="pyarrow"),
            plan, key_col, "__t64", carry, None, 1,
        )
        for i, k in enumerate(plan.keys):
            for b in range(plan.n_parts(i)):
                part_key[n_buckets + plan.offsets[i] + b] = k

    def _hot_override(batch: pa.Table, b: np.ndarray, ts_name: str) -> np.ndarray:
        kv = batch.column(key_col).to_numpy(zero_copy_only=False)
        t64 = pc.cast(batch.column(ts_name), pa.int64())
        tnull = pc.is_null(t64).to_numpy(zero_copy_only=False)
        tsv = t64.to_numpy(zero_copy_only=False)
        for i, k in enumerate(plan.keys):
            pos = np.flatnonzero(kv == k)
            if pos.size:
                bins = plan.bin_of(i, tsv[pos], tnull[pos])
                b[pos] = n_buckets + plan.offsets[i] + bins
        return b

    def tag_left(batch: pa.Table) -> pa.Table:
        b = (_stable_hash64(batch.column(key_col)) % n_buckets).astype(np.int32)
        if plan is not None:
            b = _hot_override(batch, b, left_ts)
        batch = batch.append_column("__bucket", pa.array(b))
        return batch.append_column("__side", pa.array(np.zeros(batch.num_rows, np.int8)))

    def tag_right(batch: pa.Table) -> pa.Table:
        batch = batch.select(r_proj)
        keep = pc.and_(
            pc.is_valid(batch.column(key_col)), pc.is_valid(batch.column(right_ts))
        )
        batch = batch.filter(keep)
        b = (_stable_hash64(batch.column(key_col)) % n_buckets).astype(np.int32)
        if plan is not None:
            b = _hot_override(batch, b, right_ts)
        cols = {out_key: batch.column(key_col), out_rts: batch.column(right_ts)}
        for out, src in payload.items():
            cols[out] = batch.column(src)
        t = pa.table(cols)
        t = t.append_column("__bucket", pa.array(b))
        return t.append_column("__side", pa.array(np.ones(t.num_rows, np.int8)))

    # union needs one schema: null-pad each side's missing columns
    def widen(to_schema: pa.Schema):
        def fn(batch: pa.Table) -> pa.Table:
            cols = []
            for f in to_schema:
                if f.name in batch.column_names:
                    cols.append(batch.column(f.name).cast(f.type))
                else:
                    cols.append(pa.nulls(batch.num_rows, f.type))
            return pa.Table.from_arrays(cols, schema=to_schema)

        return fn

    lt_tagged = left.map_batches(tag_left, batch_format="pyarrow")
    rt_tagged = right.map_batches(tag_right, batch_format="pyarrow")
    l_tag_schema = getattr(lt_tagged.schema(), "base_schema", lt_tagged.schema())
    r_tag_schema = getattr(rt_tagged.schema(), "base_schema", rt_tagged.schema())
    merged = pa.unify_schemas([l_tag_schema, r_tag_schema])
    both = lt_tagged.map_batches(widen(merged), batch_format="pyarrow").union(
        rt_tagged.map_batches(widen(merged), batch_format="pyarrow")
    )
    out_names = l_cols + list(payload)

    def bucket_asof(g: pa.Table) -> pa.Table:
        side = g.column("__side")
        lt = g.filter(pc.equal(side, 0))
        rt = g.filter(pc.equal(side, 1)).select([out_key, out_rts, *payload])
        if plan is not None and g.num_rows:
            part = g.column("__bucket")[0].as_py()
            ph = right_phantoms.get(part)
            if ph is not None and ph.num_rows:
                # the latest right row from any earlier ts bin joins this
                # bin's right side (a right row adds no output rows, so
                # no masking is needed)
                extra = pa.table(
                    {
                        out_key: pa.array(
                            [part_key[part]] * ph.num_rows,
                            merged.field(out_key).type,
                        ),
                        out_rts: ph.column(right_ts).cast(merged.field(out_rts).type),
                        **{
                            o: ph.column(src).cast(merged.field(o).type)
                            for o, src in payload.items()
                        },
                    }
                )
                rt = pa.concat_tables([extra, rt])
        lt = lt.select(l_cols)
        if lt.num_rows == 0:
            cols = {c: pa.array([], merged.field(c).type) for c in l_cols}
            cols.update({o: pa.array([], merged.field(o).type) for o in payload})
            return pa.table(cols)
        if rt.num_rows == 0:
            out = lt
            for o in payload:
                out = out.append_column(o, pa.nulls(lt.num_rows, merged.field(o).type))
            return out
        rt = rt.sort_by([(out_key, "ascending"), (out_rts, "ascending")])
        rkeys = rt.column(out_key)
        rts_i = pc.cast(rt.column(out_rts), pa.int64()).to_numpy(zero_copy_only=False)
        rk_np = rkeys.to_numpy(zero_copy_only=False)
        new_k = np.concatenate([[True], rk_np[1:] != rk_np[:-1]])
        rcode = np.cumsum(new_k) - 1
        uniq_keys = rkeys.take(pa.array(np.flatnonzero(new_k)))
        lts_col = lt.column(left_ts)
        l_valid = pc.and_(
            pc.is_valid(lt.column(key_col)), pc.is_valid(lts_col)
        ).to_numpy(zero_copy_only=False)
        lcode_arr = pc.index_in(lt.column(key_col), value_set=uniq_keys)
        lcode = lcode_arr.to_numpy(zero_copy_only=False).astype(np.float64)
        lts_i = pc.cast(pc.fill_null(lts_col, 0), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        rmin = int(rts_i.min())
        span = int(rts_i.max()) - rmin + 2
        n_codes = int(rcode[-1]) + 1
        if n_codes * span >= 2**62:
            raise ValueError(
                "asof composite key overflows int64; raise n_buckets to "
                "shrink keys-per-bucket or normalize timestamps"
            )
        rcomp = rcode * span + (rts_i - rmin)
        has_code = ~np.isnan(lcode) & l_valid
        lc = np.nan_to_num(lcode).astype(np.int64)
        l_off = np.clip(lts_i - rmin, 0, span - 1)
        lcomp = lc * span + l_off
        pos = np.searchsorted(rcomp, lcomp, side="right") - 1
        pos_c = np.clip(pos, 0, len(rcomp) - 1)
        matched = (
            has_code
            & (pos >= 0)
            & (rcode[pos_c] == lc)
            & (rts_i[pos_c] <= lts_i)
        )
        take_idx = pa.array(
            np.where(matched, pos_c, -1), pa.int64()
        )
        take_idx = pc.if_else(pa.array(matched), take_idx, pa.scalar(None, pa.int64()))
        out = lt
        for o in payload:
            out = out.append_column(o, rt.column(o).take(take_idx))
        return out.select(out_names)

    return both.groupby("__bucket").map_groups(bucket_asof, batch_format="pyarrow")
