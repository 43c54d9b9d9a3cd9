"""read_stripes: our table-of-stripes equivalent of the reference's
``read_orc`` DataFrame API (SURVEY.md S10, src/lib.rs:122-156).

A stripe directory (blobs + manifests) becomes a ``ray.data.Dataset``:
the manifest list is the file listing, one decode task per stripe, with
column pruning pushed into the decoder (S5). Schema comes from the
manifests' serialized Arrow schema — deterministic merge across stripes
sorted by path, mirroring infer_schema's sort-for-determinism
(src/file_format.rs:90-103).
"""

from __future__ import annotations

import ray.data

from ..state import manifest


# (stripe-path fingerprint, merged schema) per out_dir: one Catalog.sql
# call otherwise re-derives the schema 3x (projection resolution, filter
# pushdown, StripeDatasource.__init__) — each a TAIL-RANGED FOOTER READ
# PER STRIPE, i.e. ~3N metadata GETs per interactive query at N stripes.
# The fingerprint is the sorted stripe path list (one manifest listing,
# no footer IO), so appends/compactions invalidate correctly.
_SCHEMA_CACHE: dict[str, tuple[tuple, object]] = {}


def stripes_schema(out_dir: str):
    """Merged Arrow schema across all stripes (S3: deterministic — footers
    read in sorted-path order, merged with pa.unify_schemas, mirroring
    the reference's sort-for-determinism + Schema::try_merge at
    src/file_format.rs:90-103). Cached per out_dir against the stripe
    path list, so repeated metadata calls in one process do footer IO
    once."""
    import base64

    import pyarrow as pa

    from .. import stripe as stripe_mod

    entries = sorted(manifest.load_manifest(out_dir), key=lambda e: e["path"])
    fp = tuple(e["path"] for e in entries)
    got = _SCHEMA_CACHE.get(out_dir)
    if got is not None and got[0] == fp:
        return got[1]
    schemas = []
    seen: set[str] = set()
    for e in entries:
        # manifests carry schema_b64 since round 4: metadata-only schema
        # derivation, no per-stripe footer GET (millions of tail reads
        # at 100-TB stripe counts). Pre-upgrade entries fall back to the
        # footer's tail read.
        b64 = e.get("schema_b64")
        if b64 is None:
            b64 = stripe_mod.read_footer_from_file(e["path"])["schema_b64"]
        if b64 not in seen:
            seen.add(b64)
            schemas.append(pa.ipc.read_schema(pa.py_buffer(base64.b64decode(b64))))
    if not schemas:
        raise FileNotFoundError(f"no manifest entries under {out_dir}")
    merged = pa.unify_schemas(schemas)
    _SCHEMA_CACHE[out_dir] = (fp, merged)
    return merged


class Catalog:
    """Named-table registration over stripe directories (S9/S10 parity:
    the reference's register_orc / read_orc surface, src/lib.rs:107-169).
    Registered names resolve to Datasets; schemas come from the stripe
    footers."""

    def __init__(self) -> None:
        self._tables: dict[str, str] = {}
        self.last_plan: str | None = None  # 'aggregate_pushdown' | 'stream'
        # EXPLAIN-lite: per-table pushed projections + predicate
        # conjuncts of the LAST sql() call (None = full width / nothing)
        self.last_pushdown: dict | None = None

    def register_stripes(self, name: str, out_dir: str) -> None:
        stripes_schema(out_dir)  # validates the directory eagerly
        self._tables[name] = out_dir

    def schema(self, name: str):
        return stripes_schema(self._tables[name])

    def table(
        self,
        name: str,
        columns: list[str] | None = None,
        predicate: tuple[str, str, object] | list | None = None,
    ) -> ray.data.Dataset:
        return read_stripes(self._tables[name], columns=columns, predicate=predicate)

    def names(self) -> list[str]:
        return sorted(self._tables)

    def _resolve_projections(self, query: str, referenced: list[str]):
        """Columns each referenced table must decode for ``query``
        (S5 through the SQL surface — the reference pushes projections
        into the scan, src/file_source.rs:95-102; round 2 decoded full
        width for every SQL query, VERDICT r2 missing #2).

        Conservative word-boundary regex over the query text picks the
        candidate set (never under-approximates for plain identifiers),
        then a DuckDB BINDER pre-check against empty tables with exactly
        those columns catches anything the regex missed (quoted/exotic
        identifiers, star expansions) — on any bind error every table
        falls back to full width, so pruning can never change results."""
        import re

        import duckdb
        import pyarrow as pa

        schemas = {name: stripes_schema(self._tables[name]) for name in referenced}
        # star expansion / COLUMNS() pseudo-functions read everything;
        # count(*) does not (normalize it away before the '*' check)
        q_norm = re.sub(r"(?i)count\s*\(\s*\*\s*\)", "count()", query)
        if "*" in q_norm or re.search(r"(?i)\bcolumns\s*\(", query):
            return {name: None for name in referenced}
        cols: dict[str, list[str] | None] = {}
        for name, schema in schemas.items():
            used = [
                c
                for c in schema.names
                # plain/quoted identifiers appear verbatim in the query
                # text (quoting chars are word boundaries); names with
                # EMBEDDED double quotes appear in their doubled form
                # ("we""ird") and need the explicit quoted candidate
                if re.search(rf"(?<!\w){re.escape(c)}(?!\w)", query)
                or '"' + c.replace('"', '""') + '"' in query
            ]
            # a query touching no column of this table (count(*)-style)
            # still needs one stream to produce rows — pick the first
            cols[name] = used or [schema.names[0]]
        try:
            vcon = duckdb.connect()
            try:
                for name, schema in schemas.items():
                    sub = pa.schema([schema.field(c) for c in cols[name]])
                    vcon.register(name, sub.empty_table())
                vcon.sql(query).fetch_arrow_table()
            finally:
                vcon.close()
        except Exception:
            return {name: None for name in referenced}
        return cols

    _PUSHABLE_CONJUNCT = (
        r"^\s*(?:(\w+)\.)?(\w+)\s*(<=|>=|==|=|<|>)\s*"
        r"('(?:[^']*)'|-?\d+(?:\.\d+)?)\s*$"
    )

    def _resolve_filter_pushdown(self, query: str, referenced, schemas):
        """ALL pushable (col, op, literal) conjuncts per table extracted
        from the query's WHERE clause (AND semantics) for stats-driven
        stripe/chunk pruning.

        Pushing a conjunct below the scan is only sound when that
        conjunct provably applies to EVERY use of the table, so this is
        deliberately conservative — all of the following must hold, else
        nothing is pushed for anything:
        * exactly one WHERE in the whole query (no subquery/HAVING WHEREs)
        * no NOT / UNION / EXCEPT / INTERSECT and no outer joins (a
          pushed filter under a LEFT JOIN's null-supplied side changes
          results); OR is supported as ("or", [conj_list, ...]) groups —
          a stripe is pruned only when NO disjunct may match — and a
          BETWEEN rewrites to its range conjuncts
        * each table referenced exactly once
        * a conjunct is pushed only when its column belongs to exactly
          ONE referenced table, and the literal's kind matches the column
          type (numbers -> numeric columns, strings -> string columns;
          temporal columns are never pushed)
        The pruning itself is conservative too (superset of matching
        stripes/chunks + a residual row filter), and DuckDB re-applies
        the full WHERE — so a pushed conjunct can only reduce IO, never
        change the answer."""
        import re

        none = {name: None for name in referenced}
        q = query
        # neutralize IS [NOT] NULL before the NOT guard below (its 'not'
        # would otherwise disable pushdown for the whole query); the
        # markers are matched as whole conjuncts later
        q = re.sub(r"(?i)\b((?:\w+\.)?\w+)\s+is\s+not\s+null\b", r"\1 __notnull__", q)
        q = re.sub(r"(?i)\b((?:\w+\.)?\w+)\s+is\s+null\b", r"\1 __isnull__", q)
        wheres = re.findall(r"(?i)\bwhere\b", q)
        if len(wheres) != 1:
            return none
        # exactly one SELECT: with a derived table / CTE the single WHERE
        # can sit ABOVE an aggregate (SELECT * FROM (SELECT sum(x) AS x
        # FROM t) WHERE x > 5) — pushing it below the aggregation changes
        # the answer, violating the reduce-IO-only contract
        if len(re.findall(r"(?i)\bselect\b", q)) != 1:
            return none
        if re.search(
            r"(?i)\b(not|union|except|intersect|left|right|full|outer)\b", q
        ):
            return none
        # rewrite simple literal BETWEENs to range conjuncts BEFORE the
        # AND split (the BETWEEN's own AND would otherwise cut it in
        # half); any BETWEEN that survives the strict rewrite (column
        # bounds, expressions) disables pushdown entirely. NOT BETWEEN
        # never reaches here (the NOT guard above).
        _lit = r"(?:'[^']*'|-?\d+(?:\.\d+)?)"
        q = re.sub(
            rf"(?i)((?:\w+\.)?\w+)\s+between\s+({_lit})\s+and\s+({_lit})",
            r"\1 >= \2 AND \1 <= \3",
            q,
        )
        if re.search(r"(?i)\bbetween\b", q):
            return none
        for name in referenced:
            if len(re.findall(rf"\b{re.escape(name)}\b", q)) != 1:
                return none
        m = re.search(
            r"(?is)\bwhere\b(.*?)(\bgroup\b|\border\b|\blimit\b|\bhaving\b|\bwindow\b|$)",
            q,
        )
        if not m:
            return none

        # ---- quote- and paren-aware boolean structure over the WHERE
        # body: top-level OR binds looser than AND (SQL precedence), so
        # split on OR first; parenthesized groups recurse. An OR is
        # pushed as ("or", [conj_list, ...]) — the scan prunes a stripe
        # only when NO disjunct may match, so a disjunct that loses an
        # unanalyzable conjunct merely WEAKENS (sound), while a disjunct
        # with no analyzable conjunct at all kills the whole group.
        def _split0(s: str, word: str) -> list[str]:
            parts, depth, i, last = [], 0, 0, 0
            low, wl, n = s.lower(), len(word), len(s)
            while i < n:
                ch = s[i]
                if ch == "'":
                    i += 1
                    while i < n and s[i] != "'":
                        i += 1
                elif ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                elif (
                    depth == 0
                    and low.startswith(word, i)
                    and (i == 0 or not (low[i - 1].isalnum() or low[i - 1] == "_"))
                    and (
                        i + wl >= n
                        or not (low[i + wl].isalnum() or low[i + wl] == "_")
                    )
                ):
                    parts.append(s[last:i])
                    last = i + wl
                    i = last
                    continue
                i += 1
            parts.append(s[last:])
            return parts

        def _strip(s: str) -> str:
            s = s.strip()
            while s.startswith("(") and s.endswith(")"):
                depth, i, n, close = 0, 0, len(s), -1
                while i < n:
                    ch = s[i]
                    if ch == "'":
                        i += 1
                        while i < n and s[i] != "'":
                            i += 1
                    elif ch == "(":
                        depth += 1
                    elif ch == ")":
                        depth -= 1
                        if depth == 0:
                            close = i
                            break
                    i += 1
                if close != n - 1:
                    break
                s = s[1:-1].strip()
            return s

        def parse_atoms(s: str) -> list | None:
            """One comparison / IS-NULL marker / literal IN atom -> raw
            (qual, col, op, lit) candidates (IN yields its [min, max]
            envelope pair — implied by membership, so pruning is sound
            and DuckDB still applies the exact IN); None if unparsable."""
            cm = re.match(self._PUSHABLE_CONJUNCT, s)
            if cm:
                return [cm.groups()]
            nm = re.match(r"^\s*(?:(\w+)\.)?(\w+)\s+(__isnull__|__notnull__)\s*$", s)
            if nm:
                return [
                    (nm.group(1), nm.group(2),
                     "isnull" if nm.group(3) == "__isnull__" else "notnull", None)
                ]
            im = re.match(
                rf"^\s*(?:(\w+)\.)?(\w+)\s+in\s*\(\s*({_lit}(?:\s*,\s*{_lit})*)\s*\)\s*$",
                s,
                re.IGNORECASE,
            )
            if not im:
                return None
            qual_i, col_i, items = im.groups()
            lits = [x.strip() for x in re.findall(_lit, items)]
            if all(x.startswith("'") for x in lits):
                svals = sorted(x[1:-1] for x in lits)
                lo, hi = f"'{svals[0]}'", f"'{svals[-1]}'"
            elif any(x.startswith("'") for x in lits):
                return None  # mixed kinds: give up on this atom
            else:
                # keep the ORIGINAL literal text (it already matches the
                # lit grammar; repr() could produce 1e+20-style forms)
                pairs = sorted((float(x), x) for x in lits)
                lo, hi = pairs[0][1], pairs[-1][1]
            return [(qual_i, col_i, ">=", lo), (qual_i, col_i, "<=", hi)]

        def parse_bool(s: str, depth: int):
            """-> list of items (AND semantics): raw cand 4-tuples and
            ("or", [[cand, ...], ...]) groups; None = unanalyzable."""
            if depth > 8:
                return None
            s = _strip(s)
            ors = _split0(s, "or")
            if len(ors) > 1:
                djs = []
                for d in ors:
                    sub = parse_bool(d, depth + 1)
                    if sub is None or not sub:
                        return None  # unconstrained disjunct: group dead
                    if any(isinstance(it, tuple) and len(it) == 2 for it in sub):
                        return None  # nested or-group: stay conservative
                    djs.append(sub)
                return [("or", djs)]
            ands = _split0(s, "and")
            if len(ands) > 1:
                items = []
                for a in ands:
                    sub = parse_bool(a, depth + 1)
                    if sub is None:
                        continue  # dropping an AND element is sound
                    items.extend(sub)
                return items
            return parse_atoms(s)

        items = parse_bool(m.group(1), 0)
        if not items:
            return none
        out = dict(none)
        import pyarrow as pa

        def typed(cand):
            """Raw cand -> (table, (col, op, val)) or None when the
            column doesn't bind to exactly one table / literal kind
            mismatches the column type."""
            qual, col, op, lit = cand
            owners = [n for n in referenced if col in schemas[n].names]
            if len(owners) != 1:
                return None
            name = owners[0]
            if qual is not None and qual != name:
                return None  # alias-qualified: can't verify the binding
            ctype = schemas[name].field(col).type
            if op in ("isnull", "notnull"):  # no literal: any column type
                return name, (col, op, None)
            if lit.startswith("'"):
                if not (pa.types.is_string(ctype) or pa.types.is_large_string(ctype)):
                    return None
                return name, (col, "==" if op in ("=", "==") else op, lit[1:-1])
            if not (pa.types.is_integer(ctype) or pa.types.is_floating(ctype)):
                return None
            val = float(lit) if "." in lit else int(lit)
            return name, (col, "==" if op in ("=", "==") else op, val)

        def add(name: str, elem) -> None:
            out[name] = [elem] if out[name] is None else [*out[name], elem]

        for item in items:
            if isinstance(item, tuple) and len(item) == 2 and item[0] == "or":
                # an or-group pushes only when every disjunct keeps at
                # least one typed conjunct and ALL bind the same table
                tables: set[str] = set()
                typed_djs, ok = [], True
                for d in item[1]:
                    td = []
                    for cand in d:
                        tc = typed(cand)
                        if tc is None:
                            continue  # weaken this disjunct: sound
                        tables.add(tc[0])
                        td.append(tc[1])
                    if not td:
                        ok = False
                        break
                    typed_djs.append(td)
                if ok and len(tables) == 1:
                    add(tables.pop(), ("or", typed_djs))
            else:
                tc = typed(item)
                if tc is not None:
                    add(tc[0], tc[1])
        return out

    def explain(self, query: str) -> str:
        """Plan summary WITHOUT executing: per referenced table the
        pushed projection and predicate conjuncts, surviving/total
        stripes after stats pruning, and whether the distributed
        aggregate-pushdown path would run. The text mirrors exactly
        what ``sql()`` will do (same resolution code paths)."""
        import re

        referenced = [
            name for name in self._tables if re.search(rf"\b{re.escape(name)}\b", query)
        ]
        projections = self._resolve_projections(query, referenced)
        schemas = {name: stripes_schema(self._tables[name]) for name in referenced}
        predicates = self._resolve_filter_pushdown(query, referenced, schemas)
        agg = topk = join_agg = join_topk = None
        stats_ans = None
        if len(referenced) == 2:
            from . import sqlagg as _sa2

            join_agg = _sa2.plan_join_aggregate(query, schemas)
            if join_agg is None:
                join_topk = _sa2.plan_join_topk(query, schemas)
        if len(referenced) == 1:
            from . import sqlagg

            stats_ans = (
                sqlagg.plan_stats_answer(
                    query,
                    referenced[0],
                    schemas[referenced[0]],
                    manifest.load_manifest(self._tables[referenced[0]]),
                )
                if sqlagg.stats_answer_may_match(query)
                else None
            )
            if stats_ans is None:
                agg = sqlagg.plan_aggregate_pushdown(
                    query, referenced[0], schemas[referenced[0]]
                )
            if stats_ans is None and agg is None:
                topk = sqlagg.plan_topk_pushdown(
                    query, referenced[0], schemas[referenced[0]]
                )
        lines = [
            "plan: "
            + (
                "metadata-only stats answer (zero stripes decoded)"
                if stats_ans is not None
                else "distributed aggregate pushdown"
                if agg is not None
                else "distributed top-k pushdown"
                if topk is not None
                else "distributed join-aggregate pushdown (broadcast small side, "
                "per-batch join + partial agg on workers; subject to the "
                "small-side byte gate)"
                if join_agg is not None
                else "distributed join top-k pushdown (broadcast small side, "
                "per-batch join + local top-n on workers; subject to the "
                "small-side byte gate)"
                if join_topk is not None
                else "stream"
            )
        ]
        for name in referenced:
            entries = manifest.load_manifest(self._tables[name])
            preds = predicates[name]
            kept = len(entries)
            if preds:
                kept = sum(
                    1
                    for e in entries
                    if all(_stats_may_match(e, p) for p in preds)
                )
            cols = projections[name]
            lines.append(
                f"scan {name}: columns="
                + ("ALL" if cols is None else f"[{', '.join(cols)}]")
                + ", predicate="
                + (" AND ".join(_pred_str(p) for p in preds) if preds else "none")
                + f", stripes={kept}/{len(entries)} after stats pruning"
            )
        if (
            len(referenced) == 2
            and stats_ans is None
            and agg is None
            and topk is None
            and join_agg is None
            and join_topk is None
        ):
            from . import sqlagg as _sa

            pj = _sa.plan_join_prefilter(query, schemas)
            if pj is not None:
                ta, ka, tb, kb = pj
                lines.append(
                    f"semi-join prefilter candidate: {ta}.{ka} = {tb}.{kb} "
                    "(small side's distinct keys filter the big scan "
                    "worker-side, subject to the byte/asymmetry gates)"
                )
        return "\n".join(lines)

    # small side must fit comfortably on the query node, and the big
    # side must be meaningfully bigger for the extra key pass to pay
    _PREFILTER_SMALL_BYTES = 256 << 20
    _PREFILTER_ASYMMETRY = 4

    def _raw_bytes(self, name: str) -> int:
        """Decoded-bytes estimate for a registered table from its
        manifest rows (metadata only)."""
        return sum(
            e.get("raw_bytes", 0) for e in manifest.load_manifest(self._tables[name])
        )

    def _collect_capped(self, name: str, columns: list[str] | None):
        """Stream a registered table onto the driver under the
        prefilter byte cap; None when the cap is exceeded (the byte
        estimate lied — caller stays on its plain path). An empty table
        keeps the projected schema."""
        import pyarrow as pa

        batches: list[pa.Table] = []
        got = 0
        for t in self.table(name, columns=columns).iter_batches(
            batch_size=None, batch_format="pyarrow"
        ):
            batches.append(t)
            got += t.nbytes
            if got > self._PREFILTER_SMALL_BYTES:
                return None
        if batches:
            return pa.concat_tables(batches).combine_chunks()
        schema = stripes_schema(self._tables[name])
        if columns is not None:
            schema = pa.schema([schema.field(c) for c in columns])
        return schema.empty_table()

    def _plan_semijoin_prefilter(self, query, referenced, schemas):
        """Semi-join reduction for streamed two-table INNER equi-joins
        (sqlagg.plan_join_prefilter gates the shape): collect the small
        side's DISTINCT join keys (one key-column scan, byte-capped),
        broadcast them via ray.put, and return a batch filter for the
        BIG side's scan — batches shed non-joining rows on the workers
        instead of streaming them to the query node. Sound for any
        downstream clauses: prefiltered rows cannot appear in the
        inner-join output. Returns {"big", "fn", ...} or None."""
        if len(referenced) != 2:
            return None
        import pyarrow as pa
        import pyarrow.compute as pc

        from . import sqlagg

        pj = sqlagg.plan_join_prefilter(query, schemas)
        if pj is None:
            return None
        ta, ka, tb, kb = pj
        ba, bb = self._raw_bytes(ta), self._raw_bytes(tb)
        (small, skey, big, bkey) = (ta, ka, tb, kb) if ba <= bb else (tb, kb, ta, ka)
        if min(ba, bb) > self._PREFILTER_SMALL_BYTES:
            return None
        if max(ba, bb) < self._PREFILTER_ASYMMETRY * min(ba, bb):
            return None  # near-symmetric: the key pass wouldn't pay

        key_tbl = self._collect_capped(small, [skey])
        if key_tbl is None:
            return None  # byte estimate lied: stay on the plain path
        keys = pc.unique(key_tbl.column(skey).combine_chunks()).drop_null()
        keys_ref = ray.put(keys)

        def prefilter(batch: pa.Table, _ref=keys_ref, _col=bkey) -> pa.Table:
            import pyarrow.compute as _pc

            return batch.filter(
                _pc.is_in(batch.column(_col), value_set=ray.get(_ref))
            )

        self.last_pushdown["semijoin_prefilter"] = {
            "big": big,
            "big_key": bkey,
            "small": small,
            "small_key": skey,
            "n_keys": len(keys),
        }
        return {"big": big, "fn": prefilter}

    def _prepare_join_aggregate(self, query, schemas, projections):
        """Gate + setup for the join-aggregate / join-topk pushdowns:
        shape-plan via sqlagg, pick the small side by manifest raw
        bytes, and collect it — projected to the caller's resolved
        columns plus the join key (r5 review #3: resolving projections
        here with only the small table registered always fell back to
        full width) — under the prefilter byte cap. Returns
        (kind, plan, small, skey, big, bkey, small_table) or None — on
        None the caller falls through to the prefilter/stream paths, so
        the pushdown can never change a result."""
        from . import sqlagg

        kind = "join_aggregate_pushdown"
        jp = sqlagg.plan_join_aggregate(query, schemas)
        if jp is None:
            # projection + ORDER BY + LIMIT joins: per-batch join +
            # local top-n on the workers instead of streaming every
            # joined row to the query node
            jp = sqlagg.plan_join_topk(query, schemas)
            kind = "join_topk_pushdown"
        if jp is None:
            return None
        b1, b2 = self._raw_bytes(jp.t1), self._raw_bytes(jp.t2)
        small, skey, big, bkey = (
            (jp.t1, jp.k1, jp.t2, jp.k2) if b1 <= b2 else (jp.t2, jp.k2, jp.t1, jp.k1)
        )
        if min(b1, b2) > self._PREFILTER_SMALL_BYTES:
            return None
        proj = projections.get(small)
        cols = None if proj is None else sorted({*proj, skey})
        small_tbl = self._collect_capped(small, cols)
        if small_tbl is None:
            return None  # byte estimate lied: don't broadcast it
        return kind, jp, small, skey, big, bkey, small_tbl

    def sql(self, query: str):
        """SQL over registered stripe tables (the reference's headline UX:
        ``register_orc`` -> DataFusion SQL, src/lib.rs:107-169). Tables
        referenced by the query are exposed to DuckDB as STREAMING Arrow
        record-batch readers fed by the Ray decode pipeline — stripes
        decode in parallel on the cluster with backpressure, with the
        query's referenced columns pushed into the stripe scan (S5) so a
        single-column query touches only that column's streams; only the
        batches DuckDB pulls (and the final result) materialize on the
        node running the query. Use the native operators for wide
        all-to-all work; this layer is for interactive SQL parity.

        Single-table aggregate queries additionally get DISTRIBUTED
        partial aggregation (sqlagg.plan_aggregate_pushdown): each batch
        is pre-aggregated on its worker and only the partials stream to
        the driver's merge query — the Ray-native analogue of the
        partial/final split datafusion-orc inherits from DataFusion's
        physical plans. Single-table ORDER BY ... LIMIT n queries get
        DISTRIBUTED top-k the same way (per-batch local top-n, driver
        re-sorts partials — DataFusion's SortExec fetch pushdown
        analogue). ``self.last_plan`` records which path ran
        ('aggregate_pushdown', 'topk_pushdown' or 'stream').

        Returns a pyarrow.Table."""
        import re

        import duckdb

        referenced = [
            name for name in self._tables if re.search(rf"\b{re.escape(name)}\b", query)
        ]
        projections = self._resolve_projections(query, referenced)
        schemas = {name: stripes_schema(self._tables[name]) for name in referenced}
        predicates = self._resolve_filter_pushdown(query, referenced, schemas)
        # observability: what this query actually pushed into each scan
        # (EXPLAIN-lite; last_plan records which execution path ran)
        self.last_pushdown = {
            "projections": dict(projections),
            "predicates": dict(predicates),
        }
        plan = None
        plan_kind = "aggregate_pushdown"
        if len(referenced) == 1:
            from . import sqlagg

            # metadata-only answer first: count/min/max with no WHERE
            # resolve from manifest stats without decoding one stripe.
            # The textual pre-check keeps the manifest load off every
            # query that can never match the shape.
            name = referenced[0]
            if sqlagg.stats_answer_may_match(query):
                stats_result = sqlagg.plan_stats_answer(
                    query,
                    name,
                    schemas[name],
                    manifest.load_manifest(self._tables[name]),
                )
                if stats_result is not None:
                    self.last_plan = "stats_answer"
                    return stats_result
            plan = sqlagg.plan_aggregate_pushdown(
                query, referenced[0], schemas[referenced[0]]
            )
            if plan is None:
                # ORDER BY ... LIMIT n over one table: per-batch local
                # top-n on the workers, the driver re-sorts <= n rows
                # per block instead of receiving every decoded row
                plan = sqlagg.plan_topk_pushdown(
                    query, referenced[0], schemas[referenced[0]]
                )
                plan_kind = "topk_pushdown"
        join_agg = None
        if len(referenced) == 2:
            join_agg = self._prepare_join_aggregate(query, schemas, projections)
        con = duckdb.connect()
        readers = []  # keep referenced readers alive until fetch
        try:
            import pyarrow as pa

            def proj_schema(name: str):
                cols = projections[name]
                if cols is None:
                    return schemas[name]
                return pa.schema([schemas[name].field(c) for c in cols])

            if plan is not None:
                from . import sqlagg

                name = referenced[0]
                partials = self.table(
                    name, columns=projections[name], predicate=predicates[name]
                ).map_batches(sqlagg.run_partial(plan.partial_sql), batch_format="pyarrow")
                # fully-pruned scans have no blocks and ds.schema() is
                # None — derive the partial schema by binding the partial
                # SQL against an empty projected table so a point lookup
                # of an absent value returns its 0-row answer, not a crash
                vcon = duckdb.connect()
                try:
                    vcon.register("__batch", proj_schema(name).empty_table())
                    fallback = vcon.sql(plan.partial_sql).fetch_arrow_table().schema
                finally:
                    vcon.close()
                reader = _dataset_reader(partials, fallback_schema=fallback)
                readers.append(reader)
                con.register("__partials", reader)
                self.last_plan = plan_kind
                return con.sql(plan.final_sql).fetch_arrow_table()
            if join_agg is not None:
                from . import sqlagg

                join_kind, jp, small, skey, big, bkey, small_tbl = join_agg
                same = jp.k1 == jp.k2
                small_ref = ray.put(small_tbl)
                partial_fn = sqlagg.run_partial(jp.agg.partial_sql)

                def join_partial(
                    batch, _ref=small_ref, _bk=bkey, _sk=skey, _same=same
                ):
                    j = batch.join(
                        ray.get(_ref),
                        keys=[_bk],
                        right_keys=[_sk],
                        join_type="inner",
                        coalesce_keys=_same,
                    )
                    return partial_fn(j)

                big_cols = projections[big]
                if big_cols is not None and bkey not in big_cols:
                    big_cols = [*big_cols, bkey]
                partials = self.table(
                    big, columns=big_cols, predicate=predicates[big]
                ).map_batches(join_partial, batch_format="pyarrow")
                # partial-schema fallback: bind the partial against an
                # empty JOINED table so a fully-pruned big scan still
                # yields the right 0-row/identity answer
                big_schema = (
                    schemas[big]
                    if big_cols is None
                    else pa.schema([schemas[big].field(c) for c in big_cols])
                )
                vcon = duckdb.connect()
                try:
                    empty_join = big_schema.empty_table().join(
                        small_tbl.schema.empty_table(),
                        keys=[bkey],
                        right_keys=[skey],
                        join_type="inner",
                        coalesce_keys=same,
                    )
                    vcon.register("__batch", empty_join)
                    fallback = vcon.sql(jp.agg.partial_sql).fetch_arrow_table().schema
                finally:
                    vcon.close()
                reader = _dataset_reader(partials, fallback_schema=fallback)
                readers.append(reader)
                con.register("__partials", reader)
                self.last_plan = join_kind
                return con.sql(jp.agg.final_sql).fetch_arrow_table()
            prefilter = self._plan_semijoin_prefilter(query, referenced, schemas)
            for name in referenced:
                ds = self.table(
                    name, columns=projections[name], predicate=predicates[name]
                )
                if prefilter is not None and name == prefilter["big"]:
                    ds = ds.map_batches(
                        prefilter["fn"], batch_format="pyarrow"
                    )
                reader = _dataset_reader(ds, fallback_schema=proj_schema(name))
                readers.append(reader)
                con.register(name, reader)
            self.last_plan = (
                "stream+semijoin_prefilter" if prefilter is not None else "stream"
            )
            return con.sql(query).fetch_arrow_table()
        finally:
            con.close()


def _dataset_reader(ds: ray.data.Dataset, fallback_schema=None):
    """ray.data.Dataset -> streaming pyarrow.RecordBatchReader.
    ``fallback_schema`` covers zero-block datasets (e.g. a fully pruned
    scan), whose ``schema()`` is None."""
    import pyarrow as pa

    schema = ds.schema()
    schema = getattr(schema, "base_schema", schema)
    if schema is None:
        schema = fallback_schema

    def gen():
        for tbl in ds.iter_batches(batch_format="pyarrow"):
            yield from tbl.to_batches()

    return pa.RecordBatchReader.from_batches(schema, gen())


def read_stripes(
    out_dir: str,
    columns: list[str] | None = None,
    concurrency: int | None = None,
    predicate: tuple[str, str, object] | list | None = None,
) -> ray.data.Dataset:
    """Stripe scan via ``StripeDatasource`` (a first-class
    ray.data.Datasource: one read task per stripe carrying row/byte
    metadata from the manifests, so the executor schedules with real
    size estimates). ``predicate`` = (column, op, value) with op in
    <, <=, >, >=, == enables stats-driven scan pruning (E13/S4: the
    per-stripe min/max recorded in the manifests — which the reference
    stubs entirely — skip whole stripes before any IO) plus a vectorized
    residual filter inside the decode stage, mirroring ORC's row-index
    skipping at stripe granularity."""
    from .datasource import StripeDatasource

    src = StripeDatasource(out_dir, columns=columns, predicate=predicate)
    return ray.data.read_datasource(src, concurrency=concurrency)


def _stats_may_match(entry: dict, predicate) -> bool:
    """False only when the stripe PROVABLY has no matching row. min/max are
    exact; min_bound/max_bound are safe outer bounds for truncated string
    stats (a truncated max is never a plain prefix — see stripe._inc_prefix).
    Any conversion/comparison failure means 'cannot prune'. ``predicate``
    is one plain conjunct or an ``("or", [conj_list, ...])`` group — the
    group prunes only when NO disjunct may match (union of per-disjunct
    may-match). The same core (stripe.stats_may_match) also prunes
    per-ROW-CHUNK inside the decoder."""
    import json

    from .. import stripe as stripe_mod

    cols = {c["path"]: c for c in json.loads(entry.get("columns_json", "[]"))}

    def conj_ok(col: str, op: str, val) -> bool:
        c = cols.get(col)
        if c is None:
            return True  # unknown column/stats -> cannot prune
        return stripe_mod.stats_may_match(c.get("stats", {}), op, val)

    return stripe_mod.pred_may_match(predicate, conj_ok)


def _pred_str(p) -> str:
    """Human-readable predicate element for explain()/logs."""
    if isinstance(p, tuple) and len(p) == 2 and p[0] == "or":
        return (
            "("
            + " OR ".join(
                "(" + " AND ".join(f"{c} {op} {v!r}" for c, op, v in d) + ")"
                for d in p[1]
            )
            + ")"
        )
    c, op, v = p
    return f"{c} {op} {v!r}"


def validate_stripes(out_dir: str, concurrency: int | None = None) -> ray.data.Dataset:
    """Distributed integrity audit ("fsck for the corpus"): one Ray task
    per stripe recomputes every stream's CRC-32 against the footer
    records (stripe.validate_blob) and cross-checks the manifest's row
    count against the footer's. Returns a Dataset of
    (path, ok, n_streams, n_checked, n_rows, bad) — filter ``ok ==
    False`` to get the re-encode worklist. Pure map over the manifest
    list: no shuffle, cost is one sequential read + crc pass per stripe,
    so auditing 100 TB is IO-bound and embarrassingly parallel."""
    import pyarrow as pa

    from .. import stripe as stripe_mod

    entries = [
        {"path": e["path"], "n_rows": int(e.get("n_rows", -1))}
        for e in sorted(manifest.load_manifest(out_dir), key=lambda e: e["path"])
    ]
    if not entries:
        raise FileNotFoundError(f"no manifest entries under {out_dir}")

    def audit(batch: pa.Table) -> pa.Table:
        paths = batch.column("path").to_pylist()
        want_rows = batch.column("n_rows").to_pylist()
        oks, n_streams, n_checked, n_rows, bads = [], [], [], [], []
        for p, wr in zip(paths, want_rows):
            r = stripe_mod.validate_file(p)
            # validate_file already parsed the footer from the full read
            # — re-opening the file for a tail footer read would double
            # the metadata IO of a 100-TB audit
            rows = int(r.get("n_rows", -1))
            if r["ok"]:
                if rows != wr and wr >= 0 and rows >= 0:
                    r = {
                        **r,
                        "ok": False,
                        "bad": r["bad"] + [f"rows: manifest {wr} != footer {rows}"],
                    }
            oks.append(r["ok"])
            n_streams.append(r["n_streams"])
            n_checked.append(r["n_checked"])
            n_rows.append(rows)
            bads.append("; ".join(r["bad"]))
        return pa.table(
            {
                "path": pa.array(paths, pa.string()),
                "ok": pa.array(oks, pa.bool_()),
                "n_streams": pa.array(n_streams, pa.int64()),
                "n_checked": pa.array(n_checked, pa.int64()),
                "n_rows": pa.array(n_rows, pa.int64()),
                "bad": pa.array(bads, pa.string()),
            }
        )

    return ray.data.from_items(entries).map_batches(
        audit, batch_format="pyarrow", concurrency=concurrency
    )
