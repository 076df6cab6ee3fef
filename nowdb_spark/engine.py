"""Engine — the statement dispatcher (reference: query/stmt.c
nowdb_stmt_handle) and session surface (ifc/nowdb.c sessions).

    eng = Engine(spark, base_dir)
    eng.execute("create scope retail")
    eng.execute("use retail")
    eng.execute("create type product (prod_key uint pk, prod_desc text, "
                "prod_price float)")
    eng.execute("insert into product (prod_key, prod_desc, prod_price) "
                "values (1, 'thing', 9.99)")
    cur = eng.execute("select prod_key, prod_price from product "
                      "where prod_price > 5")
    for r in cur: print(r.field(0), r.field(1))

Statement classes (nowdbsql.y:215-223): DDL → catalog mutations,
DLL (load) → distributed CSV scan into parquet, DML (insert) →
parquet append, DQL (select) → DataFrame cursor, misc (use/show/
desc/exec/lock).

The executor also reproduces the reference's *time-period pruning*
(fun/expr.c:1578-1607 + reader/reader.c:1089-1094): stamp-range
conjuncts in WHERE are extracted and re-expressed as partition-bucket
predicates so Spark prunes whole day-partitions of stamped contexts.
"""

from __future__ import annotations

import importlib.util
import os
import time
from pathlib import Path
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nowdb_spark import timeutil as TU
from nowdb_spark.catalog import (
    CatalogError,
    IndexDef,
    Prop,
    ProcDef,
    Scope,
    TypeDef,
)
from nowdb_spark.results import (
    CursorResult,
    ErrorResult,
    ReportResult,
    Result,
    RowResult,
    StatusResult,
)
from nowdb_spark.sources.csv_loader import load_csv, write_context
from nowdb_spark.sql import ast as A
from nowdb_spark.sql.binder import BindError, ExprBinder, SelectBinder
from nowdb_spark.sql.parser import ParseError, parse

class EngineError(RuntimeError):
    pass


class Engine:
    def __init__(self, spark: SparkSession, base_dir: str | os.PathLike,
                 strict: bool = False):
        self.spark = spark
        self.base = Path(base_dir)
        self.base.mkdir(parents=True, exist_ok=True)
        self.scope: Optional[Scope] = None
        self.strict = strict
        self._lock_fds: dict[str, int] = {}
        self.proc_registry: dict[str, callable] = {}
        self._cursors: dict[str, CursorResult] = {}
        self._next_cursor = 0
        # (scope, context, prop) → next value of an INC sequence
        self._inc_counters: dict[tuple[str, str, str], int] = {}
        self._view_stack: set[str] = set()   # cycle guard for views
        # mount-path DataFrame cache: external mounts are static files,
        # but spark.read.format(...).load() costs a footer/schema read
        # (~0.1s py4j round-trip) per table reference per statement —
        # half of a dialect query's warm latency was plan BUILD. Keyed
        # by the full mount definition, so a re-mount naturally misses.
        # Contexts (INSERT/LOAD targets) are NEVER cached: their file
        # sets change. A mount whose directory gains files mid-session
        # can opt out via mount option {"refresh": true}.
        self._mount_df_cache: dict = {}
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from nowdb_spark.procs import register_builtin_procs
        register_builtin_procs(self)

    # --- public API (pynow Connection parity) ---------------------
    def execute(self, sql: str) -> Result:
        """Execute one statement; never raises on user errors —
        returns an ErrorResult (pynow: r.ok() / r.details())."""
        try:
            return self._dispatch(parse(sql))
        except (ParseError, BindError, CatalogError, EngineError) as e:
            return ErrorResult(1, str(e))
        except Exception as e:  # Spark analysis/runtime errors → NOK
            name = type(e).__name__
            return ErrorResult(2, f"{name}: {e}")

    def rexecute(self, sql: str) -> Result:
        """Raising variant (pynow Connection.rexecute)."""
        r = self.execute(sql)
        if not r.ok():
            raise EngineError(r.details())
        return r

    def one_row(self, sql: str) -> Optional[tuple]:
        r = self.rexecute(sql)
        if isinstance(r, CursorResult):
            rows = r.fetch(1)
            return rows[0] if rows else None
        if isinstance(r, RowResult):
            return r.row()
        return None

    def one_value(self, sql: str):
        row = self.one_row(sql)
        return row[0] if row else None

    def execute_script(self, script: str) -> list[Result]:
        """Execute a ';'-separated script (test/sql/*.sql scenario
        style); stops at the first error and returns all results."""
        from nowdb_spark.sql.parser import _split_statements
        out: list[Result] = []
        for chunk in _split_statements(script):
            if not chunk.strip():
                continue
            r = self.execute(chunk)
            out.append(r)
            if not r.ok():
                break
        return out

    def sql(self, sql: str) -> DataFrame:
        """SELECT → DataFrame (the engine as a library)."""
        node = parse(sql)
        if not isinstance(node, (A.Select, A.SetOp)):
            raise EngineError("sql() takes a SELECT")
        return self._bind_select(node)

    # --- dispatch --------------------------------------------------
    def _dispatch(self, node) -> Result:
        h = self._HANDLERS.get(type(node))
        if h is None:
            raise EngineError(f"unsupported statement {type(node).__name__}")
        return h(self, node)

    def _need_scope(self) -> Scope:
        if self.scope is None:
            raise EngineError("no scope in use (USE <scope> first)")
        return self.scope

    # sizing preset → (target sorted-file bytes, default codec):
    # the reference's storage.c:261-302 largesize/comp table. TINY is
    # COMP_FLAT (uncompressed); every other preset defaults to zstd.
    _SIZING = {
        "tiny": (1 << 20, "uncompressed"),
        "small": (8 << 20, "zstd"),
        "medium": (64 << 20, "zstd"),
        "big": (128 << 20, "zstd"),
        "large": (256 << 20, "zstd"),
        "huge": (1 << 30, "zstd"),
    }

    def _storage_opts(self, tdef: TypeDef) -> dict:
        if tdef.storage is None:
            return {}
        return self._need_scope().meta.storages.get(tdef.storage, {})

    def _codec(self, tdef: TypeDef) -> Optional[str]:
        """Context's parquet codec from its storage options (CREATE
        STORAGE ... SET compression='zstd' parity); an explicit
        compression option wins over the sizing preset's default."""
        opts = self._storage_opts(tdef)
        comp = opts.get("compression")
        if isinstance(comp, str):
            return comp.strip("'\"")
        size = opts.get("size")
        if isinstance(size, str) and size.strip("'\"") in self._SIZING:
            return self._SIZING[size.strip("'\"")][1]
        return None

    # --- DDL -------------------------------------------------------
    def _create_scope(self, n: A.CreateScope) -> Result:
        path = self.base / n.name
        if path.exists():
            if n.if_not_exists:
                return StatusResult()
            raise EngineError(f"scope {n.name!r} already exists")
        Scope(self.base, n.name).save()
        return StatusResult()

    def _drop_scope(self, n: A.DropScope) -> Result:
        path = self.base / n.name
        if not path.exists():
            if n.if_exists:
                return StatusResult()
            raise EngineError(f"no such scope {n.name!r}")
        Scope.load(self.base, n.name).destroy()
        if self.scope and self.scope.name == n.name:
            self.scope = None
        return StatusResult()

    def _use(self, n: A.UseScope) -> Result:
        if not (self.base / n.name).exists():
            raise EngineError(f"no such scope {n.name!r}")
        self.scope = Scope.load(self.base, n.name)
        return StatusResult()

    def _create_type(self, n: A.CreateType) -> Result:
        sc = self._need_scope()
        props = [Prop(p.name, p.type, p.pk, p.inc, p.stamp, None)
                 for p in n.props]
        sc.add_type(TypeDef(n.name, "vertex", props, n.storage),
                    n.if_not_exists)
        return StatusResult()

    def _create_edge(self, n: A.CreateEdge) -> Result:
        sc = self._need_scope()
        # an edge must carry exactly one origin and one destin role,
        # each referencing an existing VERTEX type (model/model.c:1850-
        # 1859 "no origin/destin in edge"; endpoint type resolution
        # rejects non-vertex names — pysmoke bugs.py createInvalidEdge)
        roles = [p.role for p in n.props if p.role]
        for role in ("origin", "destin"):
            if roles.count(role) == 0:
                raise EngineError(f"no {role} in edge")
            if roles.count(role) > 1:
                raise EngineError(f"duplicate {role} in edge")
        props = []
        for p in n.props:
            ptype = p.type
            if p.role in ("origin", "destin"):
                # endpoint declared with its vertex type name → the
                # stored value is that vertex's PK type (model/types.h:60-70)
                ref = sc.meta.types.get(p.type)
                if ref is None or ref.kind != "vertex":
                    raise EngineError(
                        f"{p.role} {p.type!r} is not a vertex type")
                if ref.pk is not None:
                    ptype = ref.prop_types()[ref.pk]
                else:
                    ptype = "uint"
            props.append(Prop(p.name, ptype, False, False, p.stamp, p.role))
        sc.add_type(TypeDef(n.name, "edge", props, n.storage),
                    n.if_not_exists)
        return StatusResult()

    def _create_index(self, n: A.CreateIndex) -> Result:
        # metadata only: Parquet stats/partitioning replace B-trees
        # (SURVEY §4); kept for SHOW/strict-mode parity
        sc = self._need_scope()
        sc.meta.indexes[n.name] = IndexDef(n.name, n.target, n.fields)
        sc.save()
        return StatusResult()

    def _create_storage(self, n: A.CreateStorage) -> Result:
        sc = self._need_scope()
        sc.meta.storages[n.name] = n.options
        sc.save()
        return StatusResult()

    def _create_proc(self, n: A.CreateProcedure) -> Result:
        sc = self._need_scope()
        if n.language not in ("python", "lua"):
            raise EngineError(
                f"language {n.language!r} not supported "
                "(python and lua, like the reference)")
        key = f"{n.module}.{n.name}" if n.module else n.name
        sc.meta.procs[key] = ProcDef(n.module, n.name, n.language, n.args)
        sc.save()
        return StatusResult()

    def _create_type_as(self, n: A.CreateTypeAs) -> Result:
        """CTAS extension: infer the context's props from the bound
        select's schema (scalar columns only) and materialize the
        rows — one distributed write, no driver-side row handling."""
        if self.strict:
            raise EngineError(
                "strict mode: CREATE TYPE AS SELECT is an extension "
                "the reference grammar does not accept (SURVEY §2.1)")
        sc = self._need_scope()
        if n.name in sc.meta.types:
            if n.if_not_exists:
                return StatusResult()
            raise CatalogError(f"type {n.name!r} already exists")
        if n.name in sc.meta.views or n.name in sc.mounts:
            raise EngineError(f"{n.name!r} already names a context")
        df = self._bind_select(n.select)
        _SPARK_TO_NOWDB = {"string": "text", "double": "float",
                           "bigint": "int", "int": "int",
                           "boolean": "bool"}
        props = []
        for f in df.schema.fields:
            t = _SPARK_TO_NOWDB.get(f.dataType.simpleString())
            if t is None:
                raise EngineError(
                    f"CREATE TYPE AS: column {f.name!r} has "
                    f"non-scalar type {f.dataType.simpleString()!r}")
            props.append(Prop(f.name, t))
        tdef = TypeDef(n.name, "vertex", props)
        sc.add_type(tdef)
        # widen int columns to the model's i64 before writing
        df = df.select(*[
            F.col(p.name).cast("long").alias(p.name)
            if p.type in ("int", "uint") else F.col(p.name)
            for p in props])
        write_context(df, sc.context_dir(n.name), tdef,
                      codec=self._codec(tdef))
        return StatusResult()

    def _create_view(self, n: A.CreateView) -> Result:
        """CREATE VIEW (extension) — validate by binding now, persist
        the select text; re-bound on every read so views compose."""
        if self.strict:
            raise EngineError(
                "strict mode: views are an extension the reference "
                "grammar does not accept (SURVEY §2.1)")
        sc = self._need_scope()
        if n.name in sc.meta.views:
            if n.if_not_exists:
                return StatusResult()
            raise EngineError(f"view {n.name!r} already exists")
        if n.name in sc.meta.types or n.name in sc.mounts:
            raise EngineError(f"{n.name!r} already names a context")
        self._bind_select(n.select)      # validates targets/expressions
        sc.meta.views[n.name] = n.text
        sc.save()
        return StatusResult()

    def _create_lock(self, n: A.CreateLock) -> Result:
        sc = self._need_scope()
        if n.name not in sc.meta.locks:
            sc.meta.locks.append(n.name)
            (sc.path / "locks").mkdir(parents=True, exist_ok=True)
            sc.save()
        return StatusResult()

    def _drop_object(self, n: A.DropObject) -> Result:
        sc = self._need_scope()
        if n.kind in ("type", "edge"):
            sc.drop_type(n.name, n.if_exists)
            # a re-created context restarts its INC sequences
            for key in [k for k in self._inc_counters
                        if k[:2] == (sc.name, n.name)]:
                del self._inc_counters[key]
        elif n.kind == "index":
            if n.name in sc.meta.indexes:
                del sc.meta.indexes[n.name]
                sc.save()
            elif not n.if_exists:
                raise EngineError(f"no such index {n.name!r}")
        elif n.kind == "storage":
            sc.meta.storages.pop(n.name, None)
            sc.save()
        elif n.kind in ("procedure", "proc"):
            sc.meta.procs.pop(n.name, None)
            sc.save()
        elif n.kind == "lock":
            if n.name in sc.meta.locks:
                sc.meta.locks.remove(n.name)
                sc.save()
        elif n.kind == "view":
            if n.name in sc.meta.views:
                del sc.meta.views[n.name]
                sc.save()
            elif not n.if_exists:
                raise EngineError(f"no such view {n.name!r}")
        else:
            raise EngineError(f"cannot DROP {n.kind!r}")
        return StatusResult()

    def _show(self, n: A.Show) -> Result:
        what = n.what
        if what in ("scopes", "schemas", "databases"):
            rows = sorted((p.name,) for p in self.base.iterdir()
                          if (p / "catalog.json").exists())
            return RowResult(["name"], rows)
        sc = self._need_scope()
        if what in ("types", "edges"):
            kind = "vertex" if what == "types" else "edge"
            rows = [(t.name,) for t in sc.meta.types.values()
                    if t.kind == kind]
            return RowResult(["name"], rows)
        if what in ("procedures", "procs"):
            return RowResult(["name"], [(k,) for k in sc.meta.procs])
        if what in ("indexes", "indices"):
            return RowResult(["name"], [(k,) for k in sc.meta.indexes])
        if what in ("storages",):
            return RowResult(["name"], [(k,) for k in sc.meta.storages])
        if what in ("locks",):
            return RowResult(["name"], [(k,) for k in sc.meta.locks])
        if what in ("views",):
            return RowResult(["name"], [(k,) for k in sc.meta.views])
        raise EngineError(f"cannot SHOW {what!r}")

    def _desc(self, n: A.Desc) -> Result:
        sc = self._need_scope()
        if n.name in sc.meta.views or n.name in sc.mounts:
            # views/mounts have no declared model — describe the
            # inferred schema (extension; reference DESC covers types)
            kind = "view" if n.name in sc.meta.views else "mount"
            df, types, _ = self._read_context(n.name)
            return RowResult(["name", "type", "role"],
                             [(c, types.get(c, ""), kind)
                              for c in df.columns])
        t = sc.get_type(n.name)
        rows = [(p.name, p.type,
                 "pk" if p.pk else (p.role or ("stamp" if p.stamp else "")))
                for p in t.props]
        return RowResult(["name", "type", "role"], rows)

    # --- DML / DLL -------------------------------------------------
    def _insert(self, n: A.Insert) -> Result:
        sc = self._need_scope()
        tdef = sc.get_type(n.target)
        schema = tdef.spark_schema()
        if n.select is not None:
            return self._insert_select(sc, n, tdef)
        fields = n.fields or [p.name for p in tdef.props]
        all_rows = [n.values, *(n.more or [])]
        types = tdef.prop_types()
        if tdef.kind == "edge":
            # edge rows must supply origin, destin and (when the edge
            # is stamped) the stamp — NULL endpoints are not edges
            # (pysmoke bugs.py invalidEdgeInserts)
            required = [p.name for p in tdef.props
                        if p.role in ("origin", "destin") or p.stamp]
            missing = [f for f in required if f not in fields]
            if missing:
                raise EngineError(
                    "edge insert requires " + ", ".join(missing))
        eb = ExprBinder({})
        # INC prop omitted → assign the next value(s) of the context's
        # auto-increasing sequence (the reference's "promise to keep
        # increasing pk", model/types.h:51); counter cached per
        # context, seeded once from the stored max. Multi-row inserts
        # reserve a dense block up front.
        inc_props = [p for p in tdef.props
                     if p.inc and p.name not in fields]
        inc_start = {p.name: self._reserve_inc(sc, n.target, p.name,
                                               len(all_rows))
                     for p in inc_props}
        frames = []
        for ridx, vals in enumerate(all_rows):
            if len(fields) != len(vals):
                raise EngineError("INSERT: field/value count mismatch")
            cols = []
            for fname, vexpr in zip(fields, vals):
                if fname not in types:
                    raise EngineError(f"unknown field {fname!r}")
                cols.append(self._insert_value(vexpr, types[fname], eb)
                            .alias(fname))
            for p in inc_props:
                cols.append(F.lit(inc_start[p.name] + ridx)
                            .cast(schema[p.name].dataType).alias(p.name))
            # missing fields → NULL (`is null`, sql.tex:311-333)
            present = set(fields) | {p.name for p in inc_props}
            for p in tdef.props:
                if p.name not in present:
                    cols.append(F.lit(None).cast(schema[p.name].dataType)
                                .alias(p.name))
            frames.append(self.spark.range(1).select(*cols))
        row = frames[0]
        for f in frames[1:]:
            row = row.unionByName(f)
        row = row.select(
            *[F.col(p.name).cast(schema[p.name].dataType).alias(p.name)
              for p in tdef.props])
        write_context(row, sc.context_dir(n.target), tdef,
                      n=len(all_rows), codec=self._codec(tdef))
        return ReportResult(affected=len(all_rows))

    def _insert_select(self, sc: Scope, n: A.Insert,
                       tdef: TypeDef) -> Result:
        """INSERT INTO t [(fields)] SELECT ... — extension (the
        reference only has VALUES). The select's columns map
        positionally onto the field list (or the leading props);
        missing props become NULL, an omitted INC prop receives the
        next dense block of the sequence (the block assignment uses a
        global row_number — single-task; bulk loads that need a
        distributed sequence should carry their own key)."""
        df = self._bind_select(n.select)
        fields = n.fields or [p.name for p in tdef.props][:len(df.columns)]
        if len(df.columns) != len(fields):
            raise EngineError(
                f"INSERT SELECT: {len(fields)} fields but select "
                f"produces {len(df.columns)} columns")
        types = tdef.prop_types()
        for f in fields:
            if f not in types:
                raise EngineError(f"unknown field {f!r}")
        schema = tdef.spark_schema()
        out = df.select(*[F.col(c).alias(f)
                          for c, f in zip(df.columns, fields)])
        affected = out.count()
        for p in tdef.props:
            if p.name in fields:
                continue
            if p.inc and affected:
                from pyspark.sql import Window as _W
                start = self._reserve_inc(sc, n.target, p.name, affected)
                seq = (F.row_number().over(
                    _W.orderBy(F.monotonically_increasing_id()))
                    + F.lit(start - 1))
                out = out.withColumn(p.name, seq)
            else:
                out = out.withColumn(p.name, F.lit(None))
        out = out.select(
            *[F.col(p.name).cast(schema[p.name].dataType).alias(p.name)
              for p in tdef.props])
        write_context(out, sc.context_dir(n.target), tdef, n=affected,
                      codec=self._codec(tdef))
        return ReportResult(affected=affected)

    def _reserve_inc(self, sc, target: str, prop: str, count: int) -> int:
        """Reserve a dense block of `count` INC values; returns the
        first."""
        start = self._next_inc(sc, target, prop)
        self._inc_counters[(sc.name, target, prop)] = start + count
        return start

    def _next_inc(self, sc, target: str, prop: str) -> int:
        """Next value of a context's INC sequence — dense from 1.
        Seeded from the stored column max (a stats-only parquet scan)
        the first time the sequence is used in this engine."""
        key = (sc.name, target, prop)
        if key not in self._inc_counters:
            ctx = sc.context_dir(target)
            mx = None
            if ctx.exists():
                mx = (self.spark.read.parquet(str(ctx))
                      .agg(F.max(prop)).first()[0])
            self._inc_counters[key] = (mx or 0) + 1
        nxt = self._inc_counters[key]
        self._inc_counters[key] = nxt + 1
        return nxt

    @staticmethod
    def _insert_value(vexpr, nowdb_type: str, eb: ExprBinder):
        if isinstance(vexpr, A.Const) and vexpr.type == "string" \
                and nowdb_type in ("time", "date"):
            return F.lit(TU.parse_time_literal(vexpr.value))
        if nowdb_type == "uint" and isinstance(vexpr, A.Const) \
                and vexpr.type == "int":
            # uint64 policy (SURVEY §7 hard parts): LongType is i64 —
            # negatives rejected; >2^63-1 cannot be represented → reject
            if vexpr.value < 0:
                raise EngineError(f"uint value out of range: {vexpr.value}")
            if vexpr.value > 2**63 - 1:
                raise EngineError(
                    f"uint value {vexpr.value} exceeds engine range "
                    "(i64; reference stores uint64 — documented gap)")
        return eb.bind(vexpr)

    def _rewrite_context(self, name: str, transform) -> int:
        """Copy-on-write rewrite of a context: read → transform →
        write to a temp dir → atomic swap. UPDATE/DELETE are absent
        from the reference executor (stubs, sql.tex:1987-2035); on
        immutable parquet this rewrite is the distributed equivalent
        (at 100 TB: rewrite only partitions whose predicate can match;
        Delta/Iceberg would make this file-level).
        """
        import shutil
        sc = self._need_scope()
        tdef = sc.get_type(name)
        df, col_types, _ = self._read_context(name)
        out, affected = transform(df, col_types, tdef)
        ctx = sc.context_dir(name)
        tmp = ctx.with_suffix(".rewrite-tmp")
        shutil.rmtree(tmp, ignore_errors=True)
        write_context(out, tmp, tdef, mode="overwrite",
                      codec=self._codec(tdef))
        old = ctx.with_suffix(".rewrite-old")
        shutil.rmtree(old, ignore_errors=True)
        if ctx.exists():
            ctx.rename(old)
        tmp.rename(ctx)
        shutil.rmtree(old, ignore_errors=True)
        return affected

    def _update(self, n: A.Update) -> Result:
        def transform(df, col_types, tdef):
            eb = ExprBinder(col_types)
            cond = eb.bind(n.where) if n.where is not None else F.lit(True)
            n_match = df.filter(cond).count()
            types = tdef.prop_types()
            out = df
            for fname, vexpr in n.assignments:
                if fname not in types:
                    raise EngineError(f"unknown field {fname!r}")
                newval = self._insert_value(vexpr, types[fname], eb)
                out = out.withColumn(
                    fname, F.when(cond, newval).otherwise(F.col(fname))
                    .cast(tdef.spark_schema()[fname].dataType))
            return out, n_match

        return ReportResult(affected=self._rewrite_context(n.target,
                                                           transform))

    def _delete(self, n: A.Delete) -> Result:
        def transform(df, col_types, tdef):
            if n.where is None:
                return df.limit(0), df.count()
            eb = ExprBinder(col_types)
            cond = eb.bind(n.where)
            n_match = df.filter(cond).count()
            return df.filter(~cond | cond.isNull()), n_match

        return ReportResult(affected=self._rewrite_context(n.target,
                                                           transform))

    def _merge(self, n: A.Merge) -> Result:
        """MERGE INTO target USING source ON key — extension upsert.

        Delta-style join rewrite over immutable parquet: one left join
        decides matched/unmatched target rows, one anti join builds the
        inserts; the rewritten context swaps in atomically
        (_rewrite_context). Assignment expressions resolve against the
        SOURCE row (so `set v = v` takes the source value, and
        computed updates like `set v = v * 2` read source fields).
        The source must be unique on the key — a duplicate-key source
        makes the merge ambiguous and errors (same rule as Delta).
        """
        src_df, src_types, _ = self._read_context(n.source)
        if n.key not in src_types:
            raise EngineError(f"source {n.source!r} has no key {n.key!r}")
        dup = (src_df.groupBy(n.key)
               .agg(F.count(F.lit(1)).alias("__n"))
               .filter(F.col("__n") > 1))
        if not dup.isEmpty():
            raise EngineError(
                f"MERGE source {n.source!r} is not unique on {n.key!r}")

        def transform(df, col_types, tdef):
            if n.key not in col_types:
                raise EngineError(
                    f"target {n.target!r} has no key {n.key!r}")
            types = tdef.prop_types()
            schema = tdef.spark_schema()
            s = src_df.select(
                *[F.col(c).alias(f"__s_{c}") for c in src_df.columns])
            joined = df.join(
                s, df[n.key] == s[f"__s_{n.key}"], "left")
            matched = F.col(f"__s_{n.key}").isNotNull()
            affected = joined.filter(matched).count() \
                if n.matched_action else 0

            if n.matched_action == "delete":
                out = joined.filter(~matched)
                out = out.select(*[p.name for p in tdef.props])
            elif n.matched_action == "update":
                eb = ExprBinder(
                    src_types,
                    resolver=lambda q, name: F.col(f"__s_{name}"))
                assigned = {}
                for fname, vexpr in n.assignments:
                    if fname not in types:
                        raise EngineError(f"unknown field {fname!r}")
                    if isinstance(vexpr, A.Const) and vexpr.type == "string" \
                            and types[fname] in ("date", "time"):
                        newval = F.lit(TU.parse_time_literal(vexpr.value))
                    else:
                        newval = eb.bind(vexpr)
                    assigned[fname] = newval
                out = joined.select(*[
                    (F.when(matched, assigned[p.name])
                     .otherwise(F.col(p.name))
                     if p.name in assigned else F.col(p.name))
                    .cast(schema[p.name].dataType).alias(p.name)
                    for p in tdef.props])
            else:
                out = joined.select(*[p.name for p in tdef.props])

            if n.insert_unmatched:
                ins = src_df.join(df.select(n.key), n.key, "left_anti")
                affected += ins.count()
                ins = ins.select(*[
                    (F.col(p.name) if p.name in src_df.columns
                     else F.lit(None))
                    .cast(schema[p.name].dataType).alias(p.name)
                    for p in tdef.props])
                out = out.unionByName(ins)
            return out, affected

        return ReportResult(affected=self._rewrite_context(n.target,
                                                           transform))

    def _copy(self, n: A.CopyStmt) -> Result:
        """COPY ... TO 'path' (export extension): one distributed
        write, format by extension — parquet (default) / csv with
        header / json lines."""
        t0 = time.perf_counter()
        if isinstance(n.source, A.Select):
            df = self._bind_select(n.source)
        else:
            df, _, _ = self._read_context(n.source)
        ext = Path(n.path).suffix.lower()
        count = df.count()
        if ext == ".csv":
            df.write.mode("overwrite").option("header", "true") \
                .csv(n.path)
        elif ext in (".json", ".jsonl", ".ndjson"):
            df.write.mode("overwrite").json(n.path)
        else:
            df.write.mode("overwrite").parquet(n.path)
        us = int((time.perf_counter() - t0) * 1e6)
        return ReportResult(affected=count, errors=0, runtime_us=us)

    def _load(self, n: A.Load) -> Result:
        sc = self._need_scope()
        t0 = time.perf_counter()
        type_name = n.as_type or n.target
        tdef = sc.get_type(type_name)
        ext = Path(n.path).suffix.lower()
        if ext in (".parquet", ".orc", ".json", ".jsonl", ".ndjson"):
            # LOAD format extension (reference loader is csv-only,
            # scope/loader.c); format picked by file extension
            from nowdb_spark.sources.csv_loader import load_structured
            fmt = {".parquet": "parquet", ".orc": "orc"}.get(ext, "json")
            good, n_bad = load_structured(self.spark, n.path, tdef,
                                          fmt, n.errors)
        else:
            good, n_bad = load_csv(self.spark, n.path, tdef, n.header,
                                   n.errors)
        # uint64 ingest policy: negatives are diverted like malformed
        # rows (reference corrects/rejects out-of-range literals,
        # doc/manual/sql.tex:190-203)
        for p in tdef.props:
            if p.type == "uint":
                ok_c = F.col(p.name).isNull() | (F.col(p.name) >= 0)
                n_neg = good.filter(~ok_c).count()
                if n_neg:
                    n_bad += n_neg
                    good = good.filter(ok_c)
        target_ctx = n.target if n.target in sc.meta.types else type_name
        affected = write_context(good, sc.context_dir(target_ctx), tdef,
                                 codec=self._codec(tdef))
        us = int((time.perf_counter() - t0) * 1e6)
        return ReportResult(affected=affected, errors=n_bad, runtime_us=us)

    # --- DQL -------------------------------------------------------
    def _read_context(self, name: str):
        sc = self._need_scope()
        if name in sc.mounts:
            m = sc.mounts[name]
            if isinstance(m, dict):
                path, overrides = m["path"], m.get("types", {})
                fmt, opts = m.get("format", "parquet"), m.get("options", {})
                refresh = bool(m.get("refresh", False))
            else:
                path, overrides, fmt, opts = m, {}, "parquet", {}
                refresh = False
            # cache identity = mount definition + data mtime: a
            # cached DataFrame snapshots the file listing, so a
            # re-mount or an external rewrite of the same path must
            # miss (the dir mtime changes when files are added or
            # replaced). One entry per (scope, context) — a changed
            # stamp REPLACES the stale entry rather than leaking it.
            try:
                stamp = os.stat(path).st_mtime_ns
            except OSError:
                stamp = 0
            ck = (sc.name, name)
            ident = (repr(m), stamp)
            hit = None if refresh else self._mount_df_cache.get(ck)
            if hit is not None and hit[0] == ident:
                _, df, types = hit
                return df, dict(types), None
            reader = self.spark.read.format(fmt)
            for k, v in opts.items():
                reader = reader.option(k, v)
            df = reader.load(path)
            # mount stamp policy: physically timestamp-typed columns
            # (parquet timestamp[us]/TIMESTAMP_NTZ etc.) become Long ns
            # stamps, independent of file encoding and session tz.
            ts_cols = [f.name for f in df.schema.fields
                       if f.dataType.typeName().startswith("timestamp")]
            df = TU.normalize_stamps(df)
            types = _infer_nowdb_types(df)
            for c in ts_cols:
                types[c] = "time"
            types.update(overrides)
            if not refresh:
                self._mount_df_cache[ck] = (ident, df, dict(types))
            return df, types, None
        if name in sc.meta.views:
            if name in self._view_stack:
                raise EngineError(f"view cycle through {name!r}")
            self._view_stack.add(name)
            try:
                sel = parse(sc.meta.views[name])
                df = self._bind_select(sel)
            finally:
                self._view_stack.discard(name)
            return df, _infer_nowdb_types(df), None
        tdef = sc.get_type(name)
        ctx = sc.context_dir(name)
        if ctx.exists():
            df = self.spark.read.parquet(str(ctx))
            if "__tb" in df.columns:
                df = df.drop("__tb")
            # parquet partition discovery can reorder; restore model order
            df = df.select(*[p.name for p in tdef.props])
        else:
            df = self.spark.createDataFrame([], tdef.spark_schema())
        return df, tdef.prop_types(), tdef

    def _load_context_pruned(self, name: str, where):
        """Context read + time-period partition pruning: stamp-range
        conjuncts become __tb bucket predicates before the partition
        column is dropped (reference period pruning, SURVEY §4)."""
        sc = self._need_scope()
        if name in sc.mounts or name in sc.meta.views or where is None:
            return self._read_context(name)
        tdef = sc.get_type(name)
        stamp = tdef.stamp_prop
        ctx = sc.context_dir(name)
        if stamp is None or not ctx.exists():
            return self._read_context(name)
        lo, hi = _extract_period(where, stamp)
        df = self.spark.read.parquet(str(ctx))
        if "__tb" in df.columns:
            if lo is not None:
                df = df.filter(F.col("__tb") >= lo // TU.units_per_day())
            if hi is not None:
                df = df.filter(F.col("__tb") <= hi // TU.units_per_day())
            df = df.drop("__tb")
        df = df.select(*[p.name for p in tdef.props])
        return df, tdef.prop_types(), tdef

    def _bind_select(self, n: A.Select,
                     type_sink: dict | None = None) -> DataFrame:
        # Period-prune ONLY the select target: the WHERE clause's stamp
        # conjuncts constrain the target's stamp, not a joined vertex's
        # same-named stamp prop — pruning a joined context with them
        # would silently drop inner-join rows.
        def loader(name: str):
            # SetOp chains carry no target/where of their own — each
            # arm is a Select bound recursively; pruning then applies
            # only to single-select statements (arms read unpruned,
            # a lost optimization, never lost rows)
            where = n.where if (isinstance(n, A.Select)
                                and name == n.target) else None
            res = self._load_context_pruned(name, where)
            if type_sink is not None:
                # record the DECLARED nowdb type of every source
                # column so the wire layer can label stamps TIME by
                # metadata instead of guessing from column names
                type_sink.update(res[1])
            return res
        return SelectBinder(self.spark, loader, None,
                            strict=self.strict).bind(n)

    def _explain(self, n: A.Explain) -> Result:
        """EXPLAIN <select> → the optimized physical plan (extension;
        exposes what Catalyst did with the dialect query)."""
        from nowdb_spark.plans.inspect import plan_string
        df = self._bind_select(n.select)
        lines = plan_string(df, "formatted").splitlines()
        return RowResult(["plan"], [(ln,) for ln in lines])

    def _validate_strict_indexes(self, n: A.Select) -> None:
        """Strict mode: grouping/ordering require an existing index on
        exactly those keys in order (reference qplan/plan.c:1489-1504,
        sql.tex:2718-2725,2765-2768). Obsolete on Spark — kept behind
        the flag for bug-compatible error behavior."""
        sc = self._need_scope()
        # derived-table targets (non-str) are rejected by the binder's
        # strict validation with a precise message — skip here
        if (n.target is None or not isinstance(n.target, str)
                or n.target in sc.mounts):
            return
        for keys, what in ((n.group_by, "GROUP BY"),
                           (n.order_by, "ORDER BY")):
            # expression keys (extension) are rejected by the binder's
            # strict validation with a precise message — skip here
            keys = [k for k in keys if isinstance(k, A.Field)]
            if not keys:
                continue
            names = [k.name for k in keys]
            ok = any(ix.target == n.target and ix.fields[:len(names)] == names
                     for ix in sc.meta.indexes.values())
            if not ok:
                raise EngineError(
                    f"strict mode: {what} on {names} requires an index "
                    f"on {n.target} with those keys "
                    "(sql.tex:2718-2725)")

    def _select(self, n: A.Select) -> Result:
        if self.strict and isinstance(n, A.Select):
            self._validate_strict_indexes(n)
        stmt_types: dict = {}
        cur = CursorResult(self._bind_select(n, stmt_types))
        cur.source_types = stmt_types
        # register for FETCH/CLOSE paging (server-side cursor ids,
        # ifc/nowdb.c:1206 openCursor)
        cid = str(self._next_cursor)
        self._next_cursor += 1
        cur.cursor_id = cid
        self._cursors[cid] = cur
        return cur

    def _fetch(self, n: A.FetchStmt) -> Result:
        cur = self._cursors.get(n.cursor_id)
        if cur is None:
            raise EngineError(f"no such cursor {n.cursor_id!r}")
        rows = cur.fetch(n.n or 1000)
        return RowResult(cur.columns, rows)

    def _close(self, n: A.CloseStmt) -> Result:
        cur = self._cursors.pop(n.cursor_id, None)
        if cur is not None:
            cur.release()
        return StatusResult()

    # --- maintenance ----------------------------------------------
    def compact(self, context: str) -> dict:
        """Compact a context's parquet files (the background-sorter
        analogue; sources/compact.py)."""
        from nowdb_spark.sources.compact import (TARGET_FILE_BYTES,
                                                 compact_context)
        sc = self._need_scope()
        tdef = sc.get_type(context)
        size = self._storage_opts(tdef).get("size", "")
        target, _ = self._SIZING.get(
            size.strip("'\"") if isinstance(size, str) else "",
            (TARGET_FILE_BYTES, None))
        return compact_context(self.spark, sc.context_dir(context), tdef,
                               target_file_bytes=target,
                               codec=self._codec(tdef))

    def insert_rows(self, context: str, rows: list[tuple]) -> Result:
        """Bulk insert (library API; the SQL surface is row-at-a-time
        like the reference, scope/dml.c:365)."""
        sc = self._need_scope()
        tdef = sc.get_type(context)
        df = self.spark.createDataFrame(rows, tdef.spark_schema())
        n = write_context(df, sc.context_dir(context), tdef, n=len(rows),
                          codec=self._codec(tdef))
        return ReportResult(affected=n)

    # --- misc ------------------------------------------------------
    def register_procedure(self, name: str, fn) -> None:
        """Register a python callable as `exec <name>(...)` target."""
        self.proc_registry[name] = fn

    def _exec(self, n: A.ExecProc) -> Result:
        sc = self._need_scope()
        fn = self.proc_registry.get(n.name)
        if fn is None:
            pd = sc.meta.procs.get(n.name)
            if pd is None:
                raise EngineError(f"no such procedure {n.name!r}")
            fn = self._load_proc(sc, pd)
        eb = ExprBinder({})
        args = []
        for a in n.args:
            if isinstance(a, A.Const):
                args.append(a.value)
            else:
                raise EngineError("EXEC arguments must be constants")
        out = fn(ProcSession(self), *args)
        if hasattr(out, "to_result"):        # lua makerow/makeresult
            return out.to_result()
        if isinstance(out, Result):
            return out
        if isinstance(out, DataFrame):
            return CursorResult(out)
        if out is None:
            return StatusResult()
        if isinstance(out, (list, tuple)):
            return RowResult([f"c{i}" for i in range(len(out))],
                             [tuple(out)])
        return RowResult(["value"], [(out,)])

    def _load_proc(self, sc: Scope, pd: ProcDef):
        if pd.language == "lua":
            return self._load_lua_proc(sc, pd)
        mod_file = sc.path / "procs" / f"{pd.module or pd.name}.py"
        if not mod_file.exists():
            raise EngineError(f"procedure module {mod_file} not found")
        spec = importlib.util.spec_from_file_location(
            f"nowdb_procs_{pd.module or pd.name}", mod_file)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        try:
            return getattr(mod, pd.name)
        except AttributeError:
            raise EngineError(
                f"module {pd.module!r} has no function {pd.name!r}") from None

    @staticmethod
    def _lua_api(session) -> dict:
        """The server-side `nowdb` Lua API table (reference
        ifc/luaproc.c + manual luaemb.tex:134-600, constants
        lua/nowdb.lua:61-66): execute (raises on NOK), pexecute
        (returns code, result-or-details), execute_ (discard result),
        onerow / onevalue (cursor boilerplate helpers), eval (single
        expression), the result-kind constants, success, and raise.
        Result objects flow into Lua as host objects — `r.field(0)`,
        `r:resulttype()`, `for row in r do`, `r.release()` all hit the
        Python Result methods directly."""
        from nowdb_spark import results as R

        def _execute(sql):
            r = session.execute(sql)
            if not r.ok():
                raise EngineError(r.details())
            return r

        def _pexecute(sql):
            r = session.execute(sql)
            if not r.ok():
                return (r.code(), r.details())
            return (R.OK, r)

        def _eval(expr):
            return session.onevalue(f"select {expr}")

        def _raise(code, msg=None):
            raise EngineError(f"lua error {code}: {msg or ''}")

        class _RowBuilder:
            """nowdb.makerow() row under construction
            (lua/nowdb.lua:294-447): add2row(type, value) appends a
            typed field, closerow() seals it; the builder IS a
            RowResult-compatible return value once closed."""

            def __init__(self):
                self._vals = []
                self._closed = False

            def add2row(self, typ, value):
                if self._closed:
                    raise EngineError("add2row on a closed row")
                self._vals.append(value)

            def closerow(self):
                self._closed = True

            def countfields(self):
                return len(self._vals)

            def field(self, i):
                return self._vals[i]

            def release(self):
                pass

            def to_result(self):
                return RowResult(
                    [f"c{i}" for i in range(len(self._vals))],
                    [tuple(self._vals)])

        def _makerow():
            return _RowBuilder()

        def _makeresult(typ, value):
            rb = _RowBuilder()
            rb.add2row(typ, value)
            rb.closerow()
            return rb

        def _array2row(typs, vals):
            # luamini passes LuaTables; lupa passes its own tables —
            # both expose 1-based integer access via [] / .get
            def arr(t):
                if hasattr(t, "length"):         # luamini LuaTable
                    return [t.get(i + 1) for i in range(t.length())]
                return [t[i + 1] for i in range(len(t))]
            ts, vs = arr(typs), arr(vals)
            if len(ts) != len(vs):
                raise EngineError("types and values do not match")
            rb = _RowBuilder()
            for t, v in zip(ts, vs):
                rb.add2row(t, v)
            rb.closerow()
            return rb

        return {
            "execute": _execute,
            "execute_": lambda sql: _execute(sql) and None,
            "pexecute": _pexecute,
            "onerow": session.onerow,
            "onevalue": session.onevalue,
            "eval": _eval,
            # result kinds (lua/nowdb.lua:61-65)
            "NOTHING": R.NOTHING, "STATUS": R.STATUS,
            "REPORT": R.REPORT, "ROW": R.ROW, "CURSOR": R.CURSOR,
            # static types (types/types.h:89-98)
            "TEXT": 1, "DATE": 2, "TIME": 3, "FLOAT": 4,
            "INT": 5, "UINT": 6, "BOOL": 9, "EOR": 10,
            # time constants in ns (lua/nowdb.lua:84-88)
            "second": 1_000_000_000,
            "minute": 60_000_000_000,
            "hour": 3_600_000_000_000,
            "day": 86_400_000_000_000,
            "year": 365 * 86_400_000_000_000,
            "OK": R.OK, "EOF": 8,   # nowdb_err_eof (error.h)
            "success": lambda: None,
            "raise": _raise,
            "raise_": _raise,
            "makerow": _makerow,
            "makeresult": _makeresult,
            "array2row": _array2row,
        }

    def _load_lua_proc(self, sc: Scope, pd: ProcDef):
        """LANGUAGE lua adapter (reference ifc/luaproc.c, manual
        luaemb.tex:134-600): runs <scope>/procs/<module>.lua through
        lupa when installed (full Lua 5.x), else through the bundled
        pure-Python interpreter (nowdb_spark.luamini — the Lua subset
        stored procedures use). Either way the procedure executes for
        real; `nowdb.*` is the same API surface."""
        mod_file = sc.path / "procs" / f"{pd.module or pd.name}.lua"
        if not mod_file.exists():
            raise EngineError(f"procedure module {mod_file} not found")
        try:
            import lupa
        except ImportError:
            lupa = None

        if lupa is not None:
            rt = lupa.LuaRuntime(unpack_returned_tuples=True)

            def fn(session, *args):
                rt.globals()["nowdb"] = rt.table_from(
                    self._lua_api(session))
                rt.execute(mod_file.read_text())
                lua_fn = rt.globals()[pd.name]
                if lua_fn is None:
                    raise EngineError(
                        f"{mod_file} defines no function {pd.name!r}")
                return lua_fn(*args)
            return fn

        from nowdb_spark.luamini import Interpreter, LuaError, LuaTable

        def fn(session, *args):
            it = Interpreter(
                globals_extra={"nowdb": self._lua_api(session)})
            try:
                it.run(mod_file.read_text())
                lua_fn = it.global_(pd.name)
                if lua_fn is None:
                    raise EngineError(
                        f"{mod_file} defines no function {pd.name!r}")
                out = it.call(lua_fn, list(args))
            except LuaError as e:
                raise EngineError(f"lua error: {e.value}") from None
            vals = [tuple(v.hash.get(i + 1) for i in range(v.length()))
                    if isinstance(v, LuaTable) else v for v in out]
            if not vals:
                return None
            return vals[0] if len(vals) == 1 else tuple(vals)
        return fn

    def _lock(self, n: A.LockStmt) -> Result:
        sc = self._need_scope()
        if n.name not in sc.meta.locks:
            raise EngineError(f"no such lock {n.name!r}")
        import fcntl
        lock_file = sc.path / "locks" / f"{n.name}.lock"
        lock_file.parent.mkdir(parents=True, exist_ok=True)
        fd = os.open(lock_file, os.O_CREAT | os.O_RDWR)
        flag = fcntl.LOCK_SH if n.mode == "reading" else fcntl.LOCK_EX
        deadline = time.monotonic() + (n.timeout_ms or 10_000) / 1000.0
        while True:
            try:
                fcntl.flock(fd, flag | fcntl.LOCK_NB)
                break
            except BlockingIOError:
                if time.monotonic() >= deadline:
                    os.close(fd)
                    raise EngineError(f"lock {n.name!r} timeout") from None
                time.sleep(0.01)
        self._lock_fds[n.name] = fd
        return StatusResult()

    def _unlock(self, n: A.UnlockStmt) -> Result:
        fd = self._lock_fds.pop(n.name, None)
        if fd is not None:
            import fcntl
            fcntl.flock(fd, fcntl.LOCK_UN)
            os.close(fd)
        return StatusResult()

    _HANDLERS = {
        A.CreateScope: _create_scope,
        A.DropScope: _drop_scope,
        A.UseScope: _use,
        A.CreateType: _create_type,
        A.CreateTypeAs: _create_type_as,
        A.CreateEdge: _create_edge,
        A.CreateIndex: _create_index,
        A.CreateView: _create_view,
        A.CreateStorage: _create_storage,
        A.CreateProcedure: _create_proc,
        A.CreateLock: _create_lock,
        A.DropObject: _drop_object,
        A.Show: _show,
        A.Desc: _desc,
        A.Insert: _insert,
        A.Update: _update,
        A.Delete: _delete,
        A.Merge: _merge,
        A.CopyStmt: _copy,
        A.Load: _load,
        A.Select: _select,
        A.SetOp: _select,
        A.Explain: _explain,
        A.ExecProc: _exec,
        A.LockStmt: _lock,
        A.UnlockStmt: _unlock,
        A.FetchStmt: _fetch,
        A.CloseStmt: _close,
    }


class ProcSession:
    """The handle passed to python procedures — mirrors the server-side
    API of the reference's embedded interpreters (nowdb.execute /
    onerow / onevalue, doc/manual/luaemb.tex:134-600)."""

    def __init__(self, engine: Engine):
        self.engine = engine
        self.spark = engine.spark

    def execute(self, sql: str) -> Result:
        return self.engine.execute(sql)

    def pexecute(self, sql: str) -> Result:
        return self.engine.rexecute(sql)

    def onerow(self, sql: str):
        return self.engine.one_row(sql)

    def onevalue(self, sql: str):
        return self.engine.one_value(sql)

    def dataframe(self, name: str):
        """The DataFrame behind a context/mount/view — the bridge
        that lets builtin pipeline procedures (procs.py) run the
        operator library over engine-managed data."""
        return self.engine._read_context(name)[0]


def _infer_nowdb_types(df: DataFrame) -> dict[str, str]:
    out = {}
    for f in df.schema.fields:
        t = f.dataType.simpleString()
        out[f.name] = {"string": "text", "double": "float", "bigint": "int",
                       "boolean": "bool"}.get(t, "int")
    return out


def _extract_period(where, stamp: str):
    """Extract [lo, hi] ns bounds for the stamp from AND-conjoined
    comparisons (reference nowdb_expr_period, fun/expr.c:1578-1607)."""
    lo = hi = None

    def visit(node):
        nonlocal lo, hi
        if isinstance(node, A.Op) and node.name == "and":
            visit(node.args[0])
            visit(node.args[1])
            return
        if isinstance(node, A.Op) and node.name in ("=", "<", ">", "<=", ">="):
            le, re = node.args
            col, lit, flip = None, None, False
            if isinstance(le, A.Field) and isinstance(re, A.Const):
                col, lit = le, re
            elif isinstance(re, A.Field) and isinstance(le, A.Const):
                col, lit, flip = re, le, True
            # qualified fields (a.stamp) always refer to a joined
            # vertex, never the pruned target — only unqualified
            # references to the target's stamp prop constrain __tb
            if col is None or col.name != stamp or col.qualifier is not None:
                return
            v = lit.value
            if lit.type == "string":
                v = TU.parse_time_literal(v)
            if not isinstance(v, int):
                return
            op = node.name
            if flip:
                op = {"<": ">", ">": "<", "<=": ">=", ">=": "<="}.get(op, op)
            if op == "=":
                lo = v if lo is None else max(lo, v)
                hi = v if hi is None else min(hi, v)
            elif op in (">", ">="):
                lo = v if lo is None else max(lo, v)
            elif op in ("<", "<="):
                hi = v if hi is None else min(hi, v)

    visit(where)
    return lo, hi
