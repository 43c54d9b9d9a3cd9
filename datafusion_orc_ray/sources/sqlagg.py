"""Distributed execution planners for ``Catalog.sql`` (S9).

Five rewrites, tried in this order by the catalog (every one falls back
to the streaming path on any gate failure, so a pushdown can never
change a result):

* ``plan_stats_answer`` — no-WHERE count/min/max answered from manifest
  STATS alone (zero stripes decoded).
* ``plan_aggregate_pushdown`` — single-table decomposable aggregates
  (incl. HAVING): per-batch partials on the workers, driver merges.
* ``plan_topk_pushdown`` — single-table ORDER BY ... LIMIT n: per-batch
  local top-n, driver re-sorts <= n rows per block.
* ``plan_join_aggregate`` / ``plan_join_topk`` — two-table inner
  equi-join feeding either shape: broadcast small side, per-batch
  Acero join + partial (or local top-n) in ONE worker stage.
* ``plan_join_prefilter`` — remaining inner equi-joins: the small
  side's distinct keys filter the big scan worker-side (semi-join
  reduction) before batches stream to the query node.

The streaming SQL surface funnels every (projected, filtered) row through
the node running the query. For the single most common analytic shape —

    SELECT <exprs over group cols + count/sum/min/max/avg calls>
    FROM <one table> [WHERE row-local] [GROUP BY cols]
    [HAVING <agg predicate>] [ORDER BY select aliases] [LIMIT n]

— the aggregation is decomposable, so this planner rewrites it into a
PARTIAL query that runs inside ``map_batches`` on every decoded batch
(per-worker DuckDB over the Arrow batch: full SQL expression semantics,
no row ever leaves its worker unaggregated) and a FINAL merge query the
driver runs over the partial stream only:

    count(*)/count(e) ->  partial count,        final CAST(sum(p) AS BIGINT)
    sum(e)            ->  partial sum,          final sum(p)
    min(e)/max(e)     ->  partial min/max,      final min/max(p)
    avg(e)            ->  partial sum+count,    final sum(ps)/sum(pc)

Scalar wrappers around aggregate calls (round(sum(x), 2), arithmetic,
CASE inside the argument) stay where SQL evaluates them anyway: row-local
argument expressions run in the partial, post-aggregate wrappers in the
final. Group-key volume is the only data that reaches the driver, so a
low-cardinality GROUP BY over a trillion rows ships kilobytes. (A
high-cardinality GROUP BY degrades to today's behavior — partials about
as large as the input — never worse.)

Soundness gates (any failure -> ``None`` -> the caller falls back to the
streaming path, so pushdown can never change a result):
* single registered table, plain ``FROM name``; no JOIN / subquery /
  DISTINCT / window / set ops (keyword + ``(select`` scan); HAVING is
  supported since r5 — it filters GROUPS, so it rewrites onto the
  FINAL merge (aggregate calls become merge expressions over extra
  partial columns) while every group still reaches the merge
* only whitelisted aggregate functions; aggregate select items must be
  aliased (``AS x``) so output names match the unpushed execution
* GROUP BY lists bare columns of the table; ORDER BY references only
  select aliases, group columns, or positions
* both rewritten queries must BIND in DuckDB (partial against the real
  table schema, final against the partial schema) — catches qualified
  names, unknown identifiers, and anything the scanner missed
* float caveat: partial sums re-associate floating-point addition, so
  sum/avg over non-integer-valued doubles can differ from single-node
  execution in the last ulp (exact for integers and integer-valued
  doubles under 2^53).

The reference's SQL layer inherits DataFusion's own partial/final
aggregate split (datafusion-orc delegates to DataFusion physical plans);
this is the Ray-Data-native equivalent of that split.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_FORBIDDEN = re.compile(
    r"(?i)\b(join|distinct|over|union|except|intersect|with|exists|"
    r"qualify|sample|using|natural|cross|values|unnest|lateral)\b"
)
_SUBQUERY = re.compile(r"(?i)\(\s*select\b")
_AGG_CALL = re.compile(r"(?i)\b(count|sum|min|max|avg)\s*\(")
_ORDER_KEYWORDS = {"asc", "desc", "nulls", "first", "last"}


@dataclass
class AggPlan:
    table: str
    partial_sql: str  # FROM __batch
    final_sql: str  # FROM __partials


def _find_clauses(q: str) -> list[tuple[str, int, int]] | None:
    """Top-level (keyword, kw_start, text_start) spans, scanning outside
    string literals and parentheses. Returns None on unbalanced input."""
    spans: list[tuple[str, int, int]] = []
    depth = 0
    in_str = False
    i, n = 0, len(q)
    while i < n:
        ch = q[i]
        if in_str:
            if ch == "'":
                in_str = False
            i += 1
            continue
        if ch == "'":
            in_str = True
            i += 1
            continue
        if ch == "(":
            depth += 1
            i += 1
            continue
        if ch == ")":
            depth -= 1
            if depth < 0:
                return None
            i += 1
            continue
        if depth == 0 and (ch.isalpha() or ch == "_"):
            j = i
            while j < n and (q[j].isalnum() or q[j] == "_"):
                j += 1
            word = q[i:j].lower()
            if word in ("group", "order"):
                m = re.match(r"(?i)\s+by\b", q[j:])
                if m:
                    spans.append((word + " by", i, j + m.end()))
                    i = j + m.end()
                    continue
            elif word in ("from", "where", "having", "limit"):
                spans.append((word, i, j))
            i = j
            continue
        i += 1
    if depth != 0 or in_str:
        return None
    return spans


def _split_top_commas(s: str) -> list[str]:
    parts: list[str] = []
    depth = 0
    in_str = False
    cur = 0
    for i, ch in enumerate(s):
        if in_str:
            if ch == "'":
                in_str = False
        elif ch == "'":
            in_str = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(s[cur:i])
            cur = i + 1
    parts.append(s[cur:])
    return parts


def _balanced_close(s: str, open_idx: int) -> int | None:
    """Index of the ')' matching the '(' at open_idx, string-aware."""
    depth = 0
    in_str = False
    for i in range(open_idx, len(s)):
        ch = s[i]
        if in_str:
            if ch == "'":
                in_str = False
        elif ch == "'":
            in_str = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return i
    return None


def _rewrite_item(item: str, state: dict) -> str | None:
    """Replace every outermost aggregate call in ``item`` with its merge
    expression, appending the matching partial expressions to
    ``state['partials']``. Returns the rewritten item or None (unsupported
    aggregate shape)."""
    out: list[str] = []
    i = 0

    def _in_string(pos: int) -> bool:
        # odd number of quotes before pos = inside a '...' literal
        # ('' escapes count as two quotes and keep the parity correct)
        return item.count("'", 0, pos) % 2 == 1

    while True:
        m = _AGG_CALL.search(item, i)
        if not m:
            out.append(item[i:])
            break
        if _in_string(m.start()):
            # aggregate-LOOKING text inside a string literal ('sum(x)'):
            # rewriting it would silently corrupt the selected value
            out.append(item[i : m.end()])
            i = m.end()
            continue
        open_idx = m.end() - 1
        close = _balanced_close(item, open_idx)
        if close is None:
            return None
        fn = m.group(1).lower()
        # nested aggregates inside ``arg`` are invalid SQL; the partial
        # query would carry them verbatim and fail the binder check
        arg = item[open_idx + 1 : close]
        k = state["n"]
        state["n"] += 1
        p = f"__p{k}"
        if fn == "count":
            state["partials"].append(f"count({arg}) AS {p}")
            # COALESCE: zero partial batches (fully pruned / empty scan)
            # must merge to count's 0, not sum's NULL
            merge = f"COALESCE(CAST(sum({p}) AS BIGINT), 0)"
        elif fn in ("sum", "min", "max"):
            state["partials"].append(f"{fn}({arg}) AS {p}")
            merge = f"{fn}({p})"
        else:  # avg
            if arg.strip() == "*":
                return None
            state["partials"].append(f"sum({arg}) AS {p}_s")
            state["partials"].append(f"count({arg}) AS {p}_c")
            merge = f"(CAST(sum({p}_s) AS DOUBLE) / sum({p}_c))"
        out.append(item[i : m.start()])
        out.append(merge)
        i = close + 1
    return "".join(out)


def plan_aggregate_pushdown(query: str, table: str, schema) -> AggPlan | None:
    """Build the partial/final rewrite for ``query`` over ``table`` with
    Arrow ``schema``, or None when the shape is unsupported. Includes the
    DuckDB binder validation of both rewritten queries."""
    q = query.strip().rstrip(";").strip()
    if _FORBIDDEN.search(q) or _SUBQUERY.search(q):
        return None
    m = re.match(r"(?is)^select\s+(.*)$", q)
    if not m:
        return None
    body_start = len(q) - len(m.group(1))
    spans = _find_clauses(q)
    if spans is None:
        return None
    spans = [s for s in spans if s[1] >= body_start]
    order = [s[0] for s in spans]
    expected = [
        k
        for k in ("from", "where", "group by", "having", "order by", "limit")
        if k in order
    ]
    if order != expected or "from" not in order:
        return None
    ends = [s[1] for s in spans] + [len(q)]
    texts: dict[str, str] = {}
    for idx, (kw, kw_start, text_start) in enumerate(spans):
        texts[kw] = q[text_start : ends[idx + 1]].strip()
    select_text = q[body_start : spans[0][1]].strip()
    fm = re.match(r"^(\w+)$", texts["from"])
    if not fm or fm.group(1) != table:
        return None
    group_cols: list[str] = []
    if "group by" in texts:
        for g in _split_top_commas(texts["group by"]):
            g = g.strip()
            if not re.match(r"^\w+$", g) or g not in schema.names:
                return None
            group_cols.append(g)
    state: dict = {"n": 0, "partials": []}
    final_items: list[str] = []
    aliases: list[str] = []
    shadowing: set[str] = set()  # alias == a real column, item != that column
    saw_agg = False
    for item in _split_top_commas(select_text):
        item = item.strip()
        if not item or "*" in re.sub(r"(?i)count\s*\(\s*\*\s*\)", "count()", item):
            return None
        has_agg = bool(_AGG_CALL.search(item))
        am = re.search(r"(?is)\s+as\s+(\w+)\s*$", item)
        if am and am.group(1) in schema.names and item[: am.start()].strip() != am.group(1):
            shadowing.add(am.group(1).lower())
        if has_agg:
            saw_agg = True
            if not am:
                return None  # output name must survive the rewrite
            aliases.append(am.group(1))
            rewritten = _rewrite_item(item, state)
            if rewritten is None:
                return None
            final_items.append(rewritten)
        else:
            aliases.append(am.group(1) if am else item)
            final_items.append(item)
    if not saw_agg:
        return None  # plain projection: the streaming path is already right
    having_merged: str | None = None
    if "having" in texts:
        # HAVING filters GROUPS, so it belongs entirely to the FINAL
        # merge: rewrite its aggregate calls to merge expressions over
        # partial columns (extending state BEFORE partial_sql is built),
        # leave group-col references as-is. The partial stays a plain
        # pre-aggregation — every group must reach the merge or a
        # batch-local HAVING would drop groups that pass globally.
        # alias-shadowing veto (r5 review #4): when an aggregate alias
        # shadows a real column, a bare reference in HAVING is a binder
        # ERROR on the streaming path but would bind to the alias over
        # __partials — the pushdown must not turn an error into rows
        if shadowing and any(
            tok.lower() in shadowing
            for tok in re.findall(r"[A-Za-z_]\w*", texts["having"])
        ):
            return None
        having_merged = _rewrite_item(texts["having"], state)
        if having_merged is None:
            return None
    partial_sql = (
        "SELECT "
        + ", ".join(group_cols + state["partials"])
        + " FROM __batch"
        + (f" WHERE {texts['where']}" if "where" in texts else "")
        + (" GROUP BY " + ", ".join(group_cols) if group_cols else "")
    )
    final_sql = "SELECT " + ", ".join(final_items) + " FROM __partials"
    if group_cols:
        final_sql += " GROUP BY " + ", ".join(group_cols)
    if having_merged is not None:
        final_sql += " HAVING " + having_merged
    if "order by" in texts:
        ident_ok = set(a.lower() for a in aliases) | set(c.lower() for c in group_cols)
        for tok in re.findall(r"[A-Za-z_]\w*", texts["order by"]):
            if tok.lower() not in ident_ok | _ORDER_KEYWORDS:
                return None
        final_sql += " ORDER BY " + texts["order by"]
    if "limit" in texts:
        if not re.match(r"^\d+$", texts["limit"]):
            return None
        final_sql += " LIMIT " + texts["limit"]
    if not _binds(partial_sql, "__batch", schema, final_sql):
        return None
    return AggPlan(table=table, partial_sql=partial_sql, final_sql=final_sql)


_TICKS_PER_DAY = {
    "date32": 1,
    "s": 86_400,
    "ms": 86_400_000,
    "date64": 86_400_000,  # date64 stores epoch milliseconds
    "us": 86_400_000_000,
    "ns": 86_400_000_000_000,
}


def _epoch_convert(v: int, src_unit: str, dst_unit: str) -> int | None:
    """Exact epoch-int unit conversion; None when the value does not
    divide evenly (a lossy downcast would move the instant)."""
    a = _TICKS_PER_DAY.get(src_unit)
    b = _TICKS_PER_DAY.get(dst_unit)
    if a is None or b is None:
        return None
    if a == b:
        return v
    q, r = divmod(v * b, a)
    return q if r == 0 else None


def stats_answer_may_match(query: str) -> bool:
    """Cheap textual pre-check for plan_stats_answer's shape, so callers
    can skip the manifest load entirely for queries that can never be
    stats-answered (r5 review finding #4: Catalog.sql paid a full
    100k-entry manifest parse on every filtered query just to have the
    planner's regex reject it)."""
    q = query.strip().rstrip(";").strip()
    return (
        re.match(r"(?is)^select\s+.*?\s+from\s+\w+\s*$", q) is not None
        and not _FORBIDDEN.search(q)
        and not _SUBQUERY.search(q)
        and re.search(r"(?i)\b(where|group\s+by|order\s+by|limit)\b", q) is None
        and re.search(r"(?i)\b(count|min|max)\s*\(", q) is not None
    )


def plan_stats_answer(query: str, table: str, schema, entries: list[dict]):
    """Answer ``SELECT count(*)/count(col)/min(col)/max(col) [AS a], ...
    FROM t`` (no WHERE / GROUP BY / anything else) from MANIFEST STATS
    alone — zero stripes decoded, zero tasks launched; at 100-TB corpus
    sizes this is the difference between a metadata lookup and a full
    scan. Returns the one-row pyarrow.Table or None (shape unsupported /
    stats insufficient — caller falls back, so this can never change a
    result).

    Soundness: manifest min/max are EXACT when stored under ``min``/
    ``max`` (``*_bound`` keys are truncation bounds — refused);
    null_count/n are always exact. min/max are answered only for
    integer, exact-string and temporal stats — floats are refused
    because NaN ordering in Arrow's min_max need not match SQL's.
    Every stripe must carry the column's stats; all-null stripes
    contribute nothing (SQL min/max ignore NULL); an all-null column
    yields NULL. Output types are pinned by binding the original query
    against an empty table, so count is BIGINT and min/max keep the
    column's exact type."""
    import duckdb
    import pyarrow as pa

    q = query.strip().rstrip(";").strip()
    if _FORBIDDEN.search(q) or _SUBQUERY.search(q):
        return None
    m = re.match(r"(?is)^select\s+(.*?)\s+from\s+(\w+)\s*$", q)
    if not m or m.group(2) != table:
        return None
    calls: list[tuple[str, str, str]] = []  # (fn, col_or_*, alias)
    for item in _split_top_commas(m.group(1)):
        im = re.match(
            r"(?is)^\s*(count|min|max)\s*\(\s*(\*|\w+)\s*\)\s+as\s+(\w+)\s*$",
            item,
        )
        if not im:
            return None
        fn, col, alias = im.group(1).lower(), im.group(2), im.group(3)
        if col != "*" and col not in schema.names:
            return None
        if fn in ("min", "max") and col == "*":
            return None
        calls.append((fn, col, alias))
    if not calls or not entries:
        return None
    if len({a for _, _, a in calls}) != len(calls):
        return None  # duplicate output names: the values map would conflate them

    import json

    per_stripe = []  # {col -> stats} per stripe
    for e in entries:
        per_stripe.append(
            {c["path"]: c.get("stats", {}) for c in json.loads(e.get("columns_json", "[]"))}
        )

    def col_type_ok(col: str) -> bool:
        t = schema.field(col).type
        return (
            pa.types.is_integer(t)
            or pa.types.is_string(t)
            or pa.types.is_large_string(t)
            or pa.types.is_timestamp(t)
            or pa.types.is_date(t)
        )

    try:
        values: dict[str, object] = {}
        for fn, col, alias in calls:
            if fn == "count" and col == "*":
                values[alias] = sum(int(e.get("n_rows", e.get("rows"))) for e in entries)
                continue
            stats = [s.get(col) for s in per_stripe]
            if any(st is None or "n" not in st or "null_count" not in st for st in stats):
                return None
            if fn == "count":
                values[alias] = sum(int(st["n"]) - int(st["null_count"]) for st in stats)
                continue
            if not col_type_ok(col):
                return None
            t = schema.field(col).type
            if pa.types.is_timestamp(t) or pa.types.is_date(t):
                # temporal stats are raw epoch ints in the STRIPE's own
                # unit: a unit drifting from the merged schema's would
                # cast to a wrong instant — require exact agreement
                from .. import stripe as stripe_mod

                want_unit = stripe_mod._temporal_unit(t)
                if any(st.get("temporal_unit") != want_unit for st in stats):
                    return None
            vals = []
            for st in stats:
                if int(st["null_count"]) == int(st["n"]):
                    continue  # all-null stripe: contributes nothing
                if fn not in st or st[fn] is None:
                    return None  # exact stat missing (e.g. truncated bound)
                vals.append(st[fn])
            values[alias] = (min(vals) if fn == "min" else max(vals)) if vals else None

        # pin output names AND types by binding the original query empty
        con = duckdb.connect()
        try:
            con.register(table, schema.empty_table())
            out_schema = con.sql(q).fetch_arrow_table().schema
        finally:
            con.close()
        from .. import stripe as stripe_mod

        alias_col = {alias: col for _, col, alias in calls}
        cols = []
        for field in out_schema:
            v = values[field.name]
            if isinstance(v, int) and (
                pa.types.is_timestamp(field.type) or pa.types.is_date(field.type)
            ):
                # epoch ints are in the COLUMN's unit; DuckDB may bind
                # the OUTPUT in a different one (ms timestamp -> us,
                # date64 -> date32). Convert exactly or refuse — casting
                # the raw int into the wrong unit silently shifts the
                # instant (r5 review finding #1).
                src_unit = stripe_mod._temporal_unit(
                    schema.field(alias_col[field.name]).type
                )
                v = _epoch_convert(v, src_unit, stripe_mod._temporal_unit(field.type))
                if v is None:
                    return None
            if isinstance(v, int):
                # date32 only casts from int32; everything else from int64
                src = pa.int32() if pa.types.is_date32(field.type) else pa.int64()
            else:
                src = None
            cols.append(pa.array([v], src).cast(field.type))
        return pa.table(cols, schema=out_schema)
    except Exception:
        return None  # any conversion surprise -> decode path answers it


_TOPK_MAX_LIMIT = 100_000  # beyond this, n rows/batch of partials stop being "small"


def plan_topk_pushdown(query: str, table: str, schema) -> AggPlan | None:
    """Distributed ORDER BY ... LIMIT n pushdown (top-k): rewrite

        SELECT <plain items> FROM t [WHERE row-local] ORDER BY <keys> LIMIT n

    into a partial that keeps only each batch's local top-n (every order
    expression aliased ``__ob{i}`` so the merge can re-sort partials
    that don't select their order keys) and a final that re-sorts the
    <= n * n_batches partial rows. Only k rows per block reach the
    driver instead of every decoded row — the Ray-native analogue of
    DataFusion's SortExec fetch pushdown (the reference inherits
    TopK/limit pushdown through DataFusion physical plans).

    Soundness gates mirror plan_aggregate_pushdown (single plain table,
    no JOIN/DISTINCT/window/subquery, both rewrites must bind); plus:
    no aggregate calls (that's the aggregate planner's shape), ORDER BY
    and LIMIT both present, LIMIT <= 100k, non-aliased select items must
    be bare columns (output names must survive the rewrite), integer
    ORDER BY positions resolve to the matching select item. Ties beyond
    position n are broken by which batch reached the merge — the same
    unspecified-order freedom single-node SQL has; use a unique
    tie-break key for fully deterministic results."""
    q = query.strip().rstrip(";").strip()
    if _FORBIDDEN.search(q) or _SUBQUERY.search(q):
        return None
    m = re.match(r"(?is)^select\s+(.*)$", q)
    if not m:
        return None
    body_start = len(q) - len(m.group(1))
    spans = _find_clauses(q)
    if spans is None:
        return None
    spans = [s for s in spans if s[1] >= body_start]
    order = [s[0] for s in spans]
    expected = [k for k in ("from", "where", "order by", "limit") if k in order]
    if order != expected or not {"from", "order by", "limit"} <= set(order):
        return None
    ends = [s[1] for s in spans] + [len(q)]
    texts: dict[str, str] = {}
    for idx, (kw, kw_start, text_start) in enumerate(spans):
        texts[kw] = q[text_start : ends[idx + 1]].strip()
    select_text = q[body_start : spans[0][1]].strip()
    fm = re.match(r"^(\w+)$", texts["from"])
    if not fm or fm.group(1) != table:
        return None
    if not re.match(r"^\d+$", texts["limit"]) or int(texts["limit"]) > _TOPK_MAX_LIMIT:
        return None

    # output column names (the final projects these out of __partials)
    shadowing: set[str] = set()  # alias == a real column, item != that column
    if select_text == "*":
        out_names = list(schema.names)
    else:
        out_names = []
        for item in _split_top_commas(select_text):
            item = item.strip()
            if not item or "*" in item or _AGG_CALL.search(item):
                return None
            am = re.search(r"(?is)\s+as\s+(\w+)\s*$", item)
            if am:
                out_names.append(am.group(1))
                if am.group(1) in schema.names and item[: am.start()].strip() != am.group(1):
                    shadowing.add(am.group(1).lower())
            elif re.match(r"^\w+$", item):
                out_names.append(item)
            else:
                return None  # unaliased expression: output name wouldn't survive

    # ORDER BY items -> (expr, suffix); positions resolve to select items
    ob_exprs: list[tuple[str, str]] = []
    for item in _split_top_commas(texts["order by"]):
        im = re.match(
            r"(?is)^\s*(.*?)(\s+(?:asc|desc))?(\s+nulls\s+(?:first|last))?\s*$", item
        )
        expr = im.group(1).strip()
        suffix = (im.group(2) or "") + (im.group(3) or "")
        if not expr or _AGG_CALL.search(expr):
            return None
        if re.match(r"^\d+$", expr):  # positional: ORDER BY 2
            pos = int(expr)
            if not 1 <= pos <= len(out_names):
                return None
            expr = out_names[pos - 1]
        # an identifier naming BOTH a select alias (of a non-trivial
        # expression) and a real column is ambiguous: ORDER BY prefers
        # the alias but the partial's select-list reference may bind the
        # base column — silently different sort keys. Veto.
        if shadowing and any(
            tok.lower() in shadowing for tok in re.findall(r"[A-Za-z_]\w*", expr)
        ):
            return None
        ob_exprs.append((expr, suffix))

    limit = texts["limit"]
    partial_sql = (
        "SELECT "
        + select_text
        + ", "
        + ", ".join(f"{e} AS __ob{i}" for i, (e, _) in enumerate(ob_exprs))
        + " FROM __batch"
        + (f" WHERE {texts['where']}" if "where" in texts else "")
        + " ORDER BY "
        + ", ".join(f"__ob{i}{sfx}" for i, (_, sfx) in enumerate(ob_exprs))
        + f" LIMIT {limit}"
    )
    final_sql = (
        "SELECT "
        + ", ".join(out_names)
        + " FROM __partials ORDER BY "
        + ", ".join(f"__ob{i}{sfx}" for i, (_, sfx) in enumerate(ob_exprs))
        + f" LIMIT {limit}"
    )
    if any(n.lower().startswith("__ob") for n in out_names):
        return None  # collision with the synthetic order-key aliases
    if not _binds(partial_sql, "__batch", schema, final_sql):
        return None
    return AggPlan(table=table, partial_sql=partial_sql, final_sql=final_sql)


_JOIN_FORBIDDEN = re.compile(
    r"(?i)\b(left|right|full|outer|cross|natural|semi|anti|lateral|with|"
    r"union|except|intersect|values|unnest|exists|qualify|sample)\b"
)


def plan_join_prefilter(query: str, schemas: dict) -> tuple[str, str, str, str] | None:
    """Semi-join reduction for the two-table INNER equi-join shape
    (DataFusion's sideways information passing / dynamic filters):

        SELECT ... FROM t1 [AS a] JOIN t2 [AS b]
        ON <ref> = <ref> | USING (k)  [WHERE/GROUP BY/ORDER BY/LIMIT ...]

    Returns (t1, key1, t2, key2) — the caller picks the small side,
    collects its DISTINCT keys, and pre-filters the big side's scan
    with an is_in mask BEFORE batches stream to the query node. Sound
    for any downstream clauses: rows dropped by the prefilter cannot
    appear in the inner-join result, so WHERE/aggregates/windows over
    the join see an identical input. None when the shape has anything
    other than one plain inner equi-join of two distinct registered
    tables (outer variants would resurrect dropped rows; subqueries /
    set ops could reference the tables a second time)."""
    q = query.strip().rstrip(";").strip()
    if _JOIN_FORBIDDEN.search(q) or _SUBQUERY.search(q):
        return None
    if len(re.findall(r"(?i)\bjoin\b", q)) != 1:
        return None
    spans = _find_clauses(q)
    if spans is None:
        return None
    from_spans = [s for s in spans if s[0] == "from"]
    if len(from_spans) != 1:
        return None
    idx = spans.index(from_spans[0])
    end = spans[idx + 1][1] if idx + 1 < len(spans) else len(q)
    from_text = q[from_spans[0][2] : end].strip()

    m = re.match(
        r"(?is)^(\w+)(?:\s+(?:as\s+)?(?!join\b)(\w+))?\s+join\s+"
        r"(\w+)(?:\s+(?:as\s+)?(?!on\b|using\b)(\w+))?\s+"
        r"(?:on\s+([\w.]+)\s*=\s*([\w.]+)|using\s*\(\s*(\w+)\s*\))\s*$",
        from_text,
    )
    if not m:
        return None
    t1, a1, t2, a2, lref, rref, using = m.groups()
    if t1 not in schemas or t2 not in schemas or t1 == t2:
        return None
    names = {t1: t1, t2: t2}
    if a1:
        names[a1] = t1
    if a2:
        names[a2] = t2

    def resolve(ref: str) -> tuple[str, str] | None:
        if "." in ref:
            owner, _, col = ref.partition(".")
            table = names.get(owner)
            if table is None or col not in schemas[table].names:
                return None
            return table, col
        hits = [t for t in (t1, t2) if ref in schemas[t].names]
        return (hits[0], ref) if len(hits) == 1 else None

    if using:
        if using not in schemas[t1].names or using not in schemas[t2].names:
            return None
        sides = [(t1, using), (t2, using)]
    else:
        s1, s2 = resolve(lref), resolve(rref)
        if s1 is None or s2 is None or s1[0] == s2[0]:
            return None
        sides = [s1, s2]
    (ta, ka), (tb, kb) = sides
    # the mask compares the two key columns directly: types must agree
    if not schemas[ta].field(ka).type.equals(schemas[tb].field(kb).type):
        return None
    return ta, ka, tb, kb


@dataclass
class JoinAggPlan:
    t1: str
    k1: str
    t2: str
    k2: str
    agg: AggPlan  # partial runs over the JOINED batch


def plan_join_aggregate(query: str, schemas: dict) -> JoinAggPlan | None:
    """Distributed aggregate over a two-table INNER equi-join: when the
    join shape passes plan_join_prefilter's gates AND the query is an
    aggregate plan_aggregate_pushdown can decompose, rewrite it to run
    the partial over each WORKER-side joined batch (broadcast small
    side + per-batch Acero join + DuckDB partial) with the driver
    merging partials only — no joined row ever leaves its worker.
    DataFusion's partial-aggregate-above-HashJoinExec analogue.

    Extra gates beyond the prefilter shape: no non-key column name may
    appear in both schemas (bare references after qualifier stripping
    must be unambiguous), and the qualifier-stripped rewrite must pass
    the aggregate planner's own binder validation against the joined
    schema."""
    rewritten = _join_rewrite(query, schemas)
    if rewritten is None:
        return None
    t1, k1, t2, k2, q2, joined_schema = rewritten
    agg = plan_aggregate_pushdown(q2, "__joined", joined_schema)
    if agg is None:
        return None
    return JoinAggPlan(t1=t1, k1=k1, t2=t2, k2=k2, agg=agg)


def _join_rewrite(query: str, schemas: dict):
    """Shared front half of the join pushdowns: gate the join shape via
    plan_join_prefilter, veto shared non-key column names, build the
    joined-batch schema (key coalesced when names match — mirrors
    pa.Table.join(coalesce_keys=True)) and rewrite the query to
    ``FROM __joined`` with table/alias qualifiers stripped. Returns
    (t1, k1, t2, k2, q2, joined_schema) or None."""
    import pyarrow as pa

    pj = plan_join_prefilter(query, schemas)
    if pj is None:
        return None
    t1, k1, t2, k2 = pj
    s1, s2 = schemas[t1], schemas[t2]
    shared = set(s1.names) & set(s2.names)
    same_key = k1 == k2
    if shared - ({k1} if same_key else set()):
        return None  # ambiguous bare refs after stripping qualifiers

    fields = list(s1)
    for f in s2:
        if same_key and f.name == k2:
            continue
        fields.append(f)
    joined_schema = pa.schema(fields)

    q = query.strip().rstrip(";").strip()
    spans = _find_clauses(q)
    from_span = [s for s in spans if s[0] == "from"][0]
    idx = spans.index(from_span)
    end = spans[idx + 1][1] if idx + 1 < len(spans) else len(q)
    from_text = q[from_span[2] : end]
    if same_key and not re.search(r"(?i)\busing\s*\(", from_text):
        # ON t1.k = t2.k with SAME-named keys: DuckDB's un-pushed
        # SELECT * keeps BOTH key columns while the joined batch
        # coalesces them — a star select would silently change the
        # result schema (r5 review #2). USING coalesces in both.
        q_norm = re.sub(r"(?i)count\s*\(\s*\*\s*\)", "count()", q)
        if "*" in q_norm:
            return None
    m = re.match(
        r"(?is)^\s*(\w+)(?:\s+(?:as\s+)?(?!join\b)(\w+))?\s+join\s+"
        r"(\w+)(?:\s+(?:as\s+)?(?!on\b|using\b)(\w+))?\s+",
        from_text,
    )
    owners = {t1, t2}
    if m:
        owners |= {g for g in (m.group(2), m.group(4)) if g}
    q2 = q[: from_span[2]] + " __joined " + q[end:]
    for owner in owners:
        # string-aware: a literal containing '<owner>.<word>' must not
        # be rewritten (r5 review #1 — re.sub over the whole text
        # corrupted WHERE tag = 'o.k.' into 'k.')
        q2 = _sub_outside_strings(
            rf"\b{re.escape(owner)}\s*\.\s*(\w+)", r"\1", q2
        )
    return t1, k1, t2, k2, q2, joined_schema


def _sub_outside_strings(pattern: str, repl: str, text: str) -> str:
    """re.sub applied only OUTSIDE single-quoted SQL string literals
    ('' escapes parse as two adjacent literals, which keeps the parity
    correct)."""
    parts: list[str] = []
    i = 0
    while i < len(text):
        j = text.find("'", i)
        if j < 0:
            parts.append(re.sub(pattern, repl, text[i:]))
            break
        parts.append(re.sub(pattern, repl, text[i:j]))
        k = text.find("'", j + 1)
        if k < 0:  # unbalanced: leave the tail untouched (binder vetoes)
            parts.append(text[j:])
            break
        parts.append(text[j : k + 1])
        i = k + 1
    return "".join(parts)


def plan_join_topk(query: str, schemas: dict) -> JoinAggPlan | None:
    """ORDER BY ... LIMIT n over a two-table INNER equi-join: the same
    qualifier-stripped rewrite as plan_join_aggregate, but fed to the
    TOP-K planner — each worker joins its batch against the broadcast
    small side and keeps only its local top-n, the driver re-sorts
    <= n rows per block. (Aggregate shapes take plan_join_aggregate
    first; this covers the projection + ORDER BY + LIMIT join.)"""
    rewritten = _join_rewrite(query, schemas)
    if rewritten is None:
        return None
    t1, k1, t2, k2, q2, joined_schema = rewritten
    topk = plan_topk_pushdown(q2, "__joined", joined_schema)
    if topk is None:
        return None
    return JoinAggPlan(t1=t1, k1=k1, t2=t2, k2=k2, agg=topk)


def _binds(partial_sql: str, batch_name: str, schema, final_sql: str) -> bool:
    """Both rewritten queries must bind in DuckDB: the partial against an
    empty table with the real schema, the final against the partial's
    OUTPUT schema. Any error (qualified names, type mismatches, agg
    shapes the scanner missed) vetoes the pushdown."""
    import duckdb

    try:
        con = duckdb.connect()
        try:
            con.register(batch_name, schema.empty_table())
            partial_schema = con.sql(partial_sql).fetch_arrow_table().schema
            con.register("__partials", partial_schema.empty_table())
            con.sql(final_sql).fetch_arrow_table()
        finally:
            con.close()
    except Exception:
        return False
    return True


def run_partial(partial_sql: str):
    """map_batches fn: evaluate the partial aggregate over one Arrow batch
    with per-worker DuckDB (task-based: connection setup is ~ms)."""

    def fn(batch):
        import duckdb

        con = duckdb.connect()
        try:
            con.register("__batch", batch)
            return con.sql(partial_sql).fetch_arrow_table()
        except Exception as exc:  # annotate for remote-traceback debugging
            raise RuntimeError(
                f"partial aggregate failed: sql={partial_sql!r} "
                f"batch_rows={batch.num_rows} schema={batch.schema!r}"
            ) from exc
        finally:
            con.close()

    return fn
