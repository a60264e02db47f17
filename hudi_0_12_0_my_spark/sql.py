"""Mini SQL front-end for Hudi-specific DML.

The reference injects an ANTLR grammar + Catalyst rules for CALL / COMPACTION
/ MERGE / UPDATE / DELETE (HoodieSqlCommon.g4:48-63, HoodieAnalysis.scala:
44-120, MergeIntoHoodieTableCommand.scala:147). PySpark cannot inject parser
extensions, so this module pattern-matches the same small statement set and
dispatches to the Python API; every other statement goes straight to
``spark.sql`` (the reference delegates identically — SURVEY.md §2.10).

Table names resolve through the Engine catalog (create_table/load_table with
``name=``, or engine.register_table). MERGE sources resolve as Spark
temp views / catalog tables.
"""

from __future__ import annotations

import re

_WS = r"\s+"


def _ident(s: str) -> str:
    return s.strip().strip("`\"")


def _parse_call_args(argstr: str) -> dict:
    """k => v, k2 => v2  (values: quoted strings, numbers, booleans)."""
    out = {}
    if not argstr.strip():
        return out
    for part in re.split(r",(?=(?:[^']*'[^']*')*[^']*$)", argstr):
        m = re.match(r"\s*(\w+)\s*=>\s*(.+?)\s*$", part)
        if not m:
            raise ValueError(f"cannot parse CALL argument {part!r}; "
                             "use name => value")
        k, v = m.group(1), m.group(2).strip()
        if v.startswith("'") and v.endswith("'"):
            out[k] = v[1:-1]
        elif v.lower() in ("true", "false"):
            out[k] = v.lower() == "true"
        else:
            try:
                out[k] = int(v)
            except ValueError:
                try:
                    out[k] = float(v)
                except ValueError:
                    out[k] = v
    return out


def _split_assignments(s: str) -> dict:
    """a = expr, b = expr  (commas inside parens/quotes respected)."""
    parts, depth, quote, cur = [], 0, None, []
    for ch in s:
        if quote:
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
            continue
        cur.append(ch)
    if cur:
        parts.append("".join(cur))
    out = {}
    for p in parts:
        col, expr = p.split("=", 1)
        col = _ident(col)
        # strip a target-alias prefix ("t.col = ..." -> "col")
        col = col.split(".")[-1]
        out[col] = expr.strip()
    return out


_MERGE_RE = re.compile(
    r"^MERGE\s+INTO\s+(?P<target>[\w.`\"]+)(?:\s+AS)?(?:\s+(?P<talias>\w+))?"
    r"\s+USING\s+(?:(?P<source>[\w.`\"]+)|\((?P<subq>.+)\))"
    r"(?:\s+AS)?(?:\s+(?P<salias>\w+))?"
    r"\s+ON\s+(?P<on>.+?)"
    r"(?P<clauses>\s+WHEN\s+.+)$",
    re.IGNORECASE | re.DOTALL)

_WHEN_RE = re.compile(
    r"WHEN\s+(?P<not>NOT\s+)?MATCHED(?:\s+AND\s+(?P<cond>.+?))?\s+THEN\s+"
    r"(?P<action>UPDATE\s+SET\s+.+?|DELETE|INSERT\s+.+?)"
    r"(?=\s+WHEN\s+|\s*$)",
    re.IGNORECASE | re.DOTALL)


def _refresh_view(engine, t) -> None:
    """Keep the table's snapshot temp view current after DML so plain
    `SELECT ... FROM name` (delegated to spark.sql) sees the new state —
    the catalog-sync the reference gets for free from its V2 catalog."""
    try:
        t.reload().register(t.cfg.name)
    except Exception:  # noqa: BLE001 — e.g. empty table with no schema yet
        pass


def dispatch(engine, text: str):
    sql = text.strip().rstrip(";")
    up = sql.upper()

    m = re.match(r"^CALL\s+(\w+)\s*\((.*)\)\s*$", sql, re.IGNORECASE | re.DOTALL)
    if m:
        return engine.call(m.group(1).lower(), **_parse_call_args(m.group(2)))

    # CREATE TABLE t [(col type, ...)] USING hudi with clauses in ANY order:
    #   LOCATION 'p' | OPTIONS(k='v',...) | PARTITIONED BY (c,...)
    #   [AS SELECT ...]
    # Option spellings: recordKey/primaryKey, preCombine(Field), tableType/
    # type — both the engine's names and the reference's SQL option names
    # (HoodieOptionConfig.scala:38-77 maps primaryKey/preCombineField/type).
    m = re.match(r"^CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?([\w.`\"]+)\s*"
                 r"(?:\(([^)]+)\)\s*)?"
                 r"USING\s+hudi\b(?P<tail>.*)$",
                 sql, re.IGNORECASE | re.DOTALL)
    if m:
        from pyspark.sql import types as T
        name, coldefs, tail = _ident(m.group(1)), m.group(2), m.group("tail")
        select = None
        am = re.search(r"\bAS\s+(SELECT\s.+)$", tail,
                       re.IGNORECASE | re.DOTALL)
        if am:
            select, tail = am.group(1), tail[:am.start()]
        loc_m = re.search(r"\bLOCATION\s+'([^']+)'", tail, re.IGNORECASE)
        if not loc_m:
            raise ValueError("CREATE TABLE ... USING hudi requires LOCATION")
        part_m = re.search(r"\bPARTITIONED\s+BY\s*\(([^)]*)\)", tail,
                           re.IGNORECASE)
        opt_m = re.search(r"\bOPTIONS\s*\((.*?)\)", tail,
                          re.IGNORECASE | re.DOTALL)
        loc = loc_m.group(1)
        opts = {}
        for part in re.split(r",(?=(?:[^']*'[^']*')*[^']*$)",
                             opt_m.group(1) if opt_m else ""):
            if "=" in part:
                k, v = part.split("=", 1)
                opts[k.strip().strip("'\"")] = v.strip().strip("'\"")
        get = {k.lower(): v for k, v in opts.items()}
        kw = {}
        primary = get.get("recordkey") or get.get("primarykey")
        if primary:
            kw["record_key_fields"] = [c.strip() for c in primary.split(",")]
        precombine = get.get("precombine") or get.get("precombinefield")
        if precombine:
            kw["precombine_field"] = precombine
        ttype = get.get("tabletype") or get.get("type")
        if ttype:
            kw["table_type"] = ttype
        if get.get("payload"):
            kw["payload"] = get["payload"]
        pf = get.get("partitionfield") or \
            (part_m.group(1).strip() if part_m and part_m.group(1).strip()
             else None)
        if pf:
            parts = [c.strip() for c in pf.split(",")]
            kw["partition_field"] = parts[0] if len(parts) == 1 else parts
        if coldefs:
            kw["schema_json"] = T._parse_datatype_string(
                f"struct<{coldefs}>").json()
        df = engine.spark.sql(select) if select else None
        t = engine.create_table(loc, name=name, df=df, **kw)
        _refresh_view(engine, t)
        return engine.spark.createDataFrame([(t.cfg.name, loc)],
                                            "table string, location string")

    m = re.match(r"^INSERT\s+(INTO|OVERWRITE)\s+(?:TABLE\s+)?([\w.`\"]+)\s*"
                 r"(?:PARTITION\s*\(([^)]*)\)\s*)?"
                 r"(SELECT\b.+|VALUES\b.+)$", sql, re.IGNORECASE | re.DOTALL)
    if m and engine.has_table(_ident(m.group(2))):
        from pyspark.sql import functions as F
        t = engine.table(_ident(m.group(2)))
        static = {}          # static-partition columns (k = 'v')
        for part in (m.group(3) or "").split(","):
            if "=" in part:
                k, v = part.split("=", 1)
                static[_ident(k)] = v.strip().strip("'\"")
        body = m.group(4)
        schema_fields = __import__("hudi_0_12_0_my_spark.writer",
                                   fromlist=["business_schema"]) \
            .business_schema(t.cfg).fields
        if body.upper().startswith("VALUES"):
            cols = ", ".join(f.name for f in schema_fields
                             if f.name not in static)
            df = engine.spark.sql(f"SELECT * FROM ({body}) AS v({cols})")
        else:
            df = engine.spark.sql(body)
        for k, v in static.items():     # static partition values as literals
            typ = next((f.dataType for f in schema_fields if f.name == k),
                       None)
            col = F.lit(v).cast(typ) if typ is not None else F.lit(v)
            df = df.withColumn(k, col)
        if m.group(1).upper() == "OVERWRITE":
            if static and df.isEmpty():
                # Spark semantics: a static-partition OVERWRITE clears the
                # partition even when the query yields no rows
                vals = [f"{k}={v}" if t.cfg.hive_style_partitioning else v
                        for k, v in static.items()]
                instant = t.delete_partition(vals)
            else:
                instant = t.insert_overwrite(df)
        else:
            instant = t.insert(df)
        _refresh_view(engine, t)
        return engine.spark.createDataFrame([(instant,)], "instant string")

    m = re.match(r"^(RUN|SCHEDULE)\s+COMPACTION\s+ON\s+([\w.`\"]+)\s*$",
                 sql, re.IGNORECASE)
    if m:
        t = engine.table(_ident(m.group(2)))
        if m.group(1).upper() == "RUN":
            instant = t.compact()
            return engine.spark.createDataFrame(
                [(instant, instant is not None)],
                "compaction_instant string, executed boolean")
        from .services.compaction import schedule_compaction
        plan = schedule_compaction(t)
        return engine.spark.createDataFrame(
            [((plan or {}).get("instant"), plan is not None)],
            "compaction_instant string, scheduled boolean")

    m = re.match(r"^RUN\s+CLUSTERING\s+ON\s+([\w.`\"]+)"
                 r"(?:\s+ORDER\s+BY\s+(.+))?$", sql, re.IGNORECASE)
    if m:
        t = engine.table(_ident(m.group(1)))
        cols = [c.strip() for c in m.group(2).split(",")] if m.group(2) else None
        instant = t.cluster(sort_cols=cols)
        return engine.spark.createDataFrame(
            [(instant, instant is not None)],
            "clustering_instant string, executed boolean")

    # CREATE INDEX idx ON t [USING column_stats] (c1, c2) — scopes the
    # column-stats manifest (HoodieSqlCommon.g4:51-56 index commands)
    m = re.match(r"^CREATE\s+INDEX\s+(?:IF\s+NOT\s+EXISTS\s+)?\w+\s+ON\s+"
                 r"([\w.`\"]+)\s*(?:USING\s+(\w+)\s*)?\(\s*(.+?)\s*\)\s*$",
                 sql, re.IGNORECASE)
    if m and engine.has_table(_ident(m.group(1))):
        t = engine.table(_ident(m.group(1)))
        from . import config as cfgmod
        using = (m.group(2) or "").lower()
        if using in ("bloom_filters", "bloom"):
            # CREATE INDEX ... USING bloom_filters: enable the bloom probe
            # and backfill bitsets for existing files (IndexCommands.scala /
            # RunIndexActionExecutor)
            from .services.indexing import run_index
            t.cfg.bloom_index_enabled = True
            cfgmod.save_config(t.base_path, t.cfg)
            r = run_index(t)
            return engine.spark.createDataFrame(
                [("bloom_filters", r["files_indexed"])],
                "index_type string, files_indexed long")
        t.cfg.stats_columns = [_ident(c) for c in m.group(3).split(",")]
        cfgmod.save_config(t.base_path, t.cfg)
        return engine.spark.createDataFrame(
            [(c,) for c in t.cfg.stats_columns], "indexed_column string")

    m = re.match(r"^DROP\s+INDEX\s+(?:IF\s+EXISTS\s+)?\w+\s+ON\s+([\w.`\"]+)\s*$",
                 sql, re.IGNORECASE)
    if m and engine.has_table(_ident(m.group(1))):
        t = engine.table(_ident(m.group(1)))
        t.cfg.stats_columns = []
        from . import config as cfgmod
        cfgmod.save_config(t.base_path, t.cfg)
        if t.cfg.bloom_index_enabled:
            from .services.indexing import drop_index
            drop_index(t)
        return engine.spark.createDataFrame([(True,)], "dropped boolean")

    m = re.match(r"^SHOW\s+INDEX(?:ES)?\s+(?:ON|FROM)\s+([\w.`\"]+)\s*$",
                 sql, re.IGNORECASE)
    if m and engine.has_table(_ident(m.group(1))):
        t = engine.table(_ident(m.group(1)))
        cols = t.cfg.stats_columns
        rows = [(c, "column_stats") for c in cols] if cols else \
            ([] if cols == [] else [("*", "column_stats")])
        if t.cfg.bloom_index_enabled:
            rows = rows + [("_hoodie_record_key", "bloom_filters")]
        return engine.spark.createDataFrame(
            rows, "indexed_column string, index_type string")

    m = re.match(r"^SHOW\s+PARTITIONS\s+([\w.`\"]+)\s*$", sql, re.IGNORECASE)
    if m and engine.has_table(_ident(m.group(1))):
        t = engine.table(_ident(m.group(1)))
        return engine.spark.createDataFrame(
            [(p,) for p in t.partitions()], "partition string")

    if up.startswith("MERGE"):
        return _merge(engine, sql)

    m = re.match(r"^UPDATE\s+([\w.`\"]+)\s+SET\s+(.+?)(?:\s+WHERE\s+(.+))?$",
                 sql, re.IGNORECASE | re.DOTALL)
    if m and engine.has_table(_ident(m.group(1))):
        t = engine.table(_ident(m.group(1)))
        instant = t.update(set=_split_assignments(m.group(2)), where=m.group(3))
        _refresh_view(engine, t)
        return engine.spark.createDataFrame([(instant,)], "instant string")

    m = re.match(r"^DELETE\s+FROM\s+([\w.`\"]+)(?:\s+WHERE\s+(.+))?$",
                 sql, re.IGNORECASE | re.DOTALL)
    if m and engine.has_table(_ident(m.group(1))):
        t = engine.table(_ident(m.group(1)))
        if m.group(2):
            instant = t.delete(where=m.group(2))
        else:
            instant = t.writer.insert_overwrite(
                t.snapshot().limit(0), whole_table=True)  # TRUNCATE semantics
        _refresh_view(engine, t)
        return engine.spark.createDataFrame([(instant,)], "instant string")

    m = re.match(r"^ALTER\s+TABLE\s+([\w.`\"]+)\s+ADD\s+COLUMNS?\s*"
                 r"\(\s*(\w+)\s+([\w(),\s]+?)\s*\)\s*$", sql, re.IGNORECASE)
    if m and engine.has_table(_ident(m.group(1))):
        engine.table(_ident(m.group(1))).add_column(m.group(2), m.group(3))
        return engine.spark.createDataFrame([(True,)], "ok boolean")

    m = re.match(r"^ALTER\s+TABLE\s+([\w.`\"]+)\s+RENAME\s+COLUMN\s+"
                 r"(\w+)\s+TO\s+(\w+)\s*$", sql, re.IGNORECASE)
    if m and engine.has_table(_ident(m.group(1))):
        engine.table(_ident(m.group(1))).rename_column(m.group(2), m.group(3))
        return engine.spark.createDataFrame([(True,)], "ok boolean")

    # ALTER TABLE t CHANGE [COLUMN] c c TYPE  (Spark-2 style the reference
    # parses into AlterHoodieTableChangeColumnCommand; the name must not
    # change — columnEqual in the command enforces the same)
    m = re.match(r"^ALTER\s+TABLE\s+([\w.`\"]+)\s+CHANGE\s+(?:COLUMN\s+)?"
                 r"(\w+)\s+(\w+)\s+([\w(),\s]+?)\s*$", sql, re.IGNORECASE)
    if m and engine.has_table(_ident(m.group(1))):
        if m.group(2).lower() != m.group(3).lower():
            raise ValueError(
                "ALTER TABLE CHANGE COLUMN cannot rename; use ALTER TABLE "
                "... RENAME COLUMN (reference "
                "AlterHoodieTableChangeColumnCommand rejects name changes)")
        engine.table(_ident(m.group(1))).change_column(m.group(2), m.group(4))
        return engine.spark.createDataFrame([(True,)], "ok boolean")

    # ALTER TABLE t ALTER [COLUMN] c TYPE bigint  (Spark-3 native syntax)
    m = re.match(r"^ALTER\s+TABLE\s+([\w.`\"]+)\s+ALTER\s+(?:COLUMN\s+)?"
                 r"(\w+)\s+TYPE\s+([\w(),\s]+?)\s*$", sql, re.IGNORECASE)
    if m and engine.has_table(_ident(m.group(1))):
        engine.table(_ident(m.group(1))).change_column(m.group(2), m.group(3))
        return engine.spark.createDataFrame([(True,)], "ok boolean")

    # ALTER TABLE t DROP COLUMN[S] c  (TableChanges delete action)
    m = re.match(r"^ALTER\s+TABLE\s+([\w.`\"]+)\s+DROP\s+COLUMNS?\s*"
                 r"\(?\s*(\w+)\s*\)?\s*$", sql, re.IGNORECASE)
    if m and engine.has_table(_ident(m.group(1))):
        engine.table(_ident(m.group(1))).drop_column(m.group(2))
        return engine.spark.createDataFrame([(True,)], "ok boolean")

    # ALTER TABLE t ALTER [COLUMN] c FIRST | AFTER other  (column reorder,
    # TableChanges ColumnPositionChange)
    m = re.match(r"^ALTER\s+TABLE\s+([\w.`\"]+)\s+ALTER\s+(?:COLUMN\s+)?"
                 r"(\w+)\s+(?:(FIRST)|AFTER\s+(\w+))\s*$", sql, re.IGNORECASE)
    if m and engine.has_table(_ident(m.group(1))):
        engine.table(_ident(m.group(1))).move_column(
            m.group(2), first=bool(m.group(3)), after=m.group(4))
        return engine.spark.createDataFrame([(True,)], "ok boolean")

    m = re.match(r"^ALTER\s+TABLE\s+([\w.`\"]+)\s+DROP\s+PARTITION\s*"
                 r"\(\s*(.+?)\s*\)\s*$", sql, re.IGNORECASE)
    if m and engine.has_table(_ident(m.group(1))):
        # PARTITION (field='value') -> delete_partition([path])
        t = engine.table(_ident(m.group(1)))
        vals = []
        for part in m.group(2).split(","):
            k, v = part.split("=", 1)
            v = v.strip().strip("'\"")
            vals.append(f"{k.strip()}={v}" if t.cfg.hive_style_partitioning else v)
        instant = t.delete_partition(vals)
        return engine.spark.createDataFrame([(instant,)], "instant string")

    m = re.match(r"^TRUNCATE\s+TABLE\s+([\w.`\"]+)\s*$", sql, re.IGNORECASE)
    if m and engine.has_table(_ident(m.group(1))):
        t = engine.table(_ident(m.group(1)))
        instant = t.writer.insert_overwrite(t.snapshot().limit(0),
                                            whole_table=True)
        _refresh_view(engine, t)
        return engine.spark.createDataFrame([(instant,)], "instant string")

    # table rename AFTER the rename-COLUMN pattern so the two never collide
    m = re.match(r"^ALTER\s+TABLE\s+([\w.`\"]+)\s+RENAME\s+TO\s+"
                 r"([\w.`\"]+)\s*$", sql, re.IGNORECASE)
    if m and engine.has_table(_ident(m.group(1))):
        engine.rename_table(_ident(m.group(1)), _ident(m.group(2)))
        _refresh_view(engine, engine.table(_ident(m.group(2))))
        return engine.spark.createDataFrame([(True,)], "ok boolean")

    m = re.match(r"^DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?([\w.`\"]+)"
                 r"(?:\s+PURGE)?\s*$", sql, re.IGNORECASE)
    if m and engine.has_table(_ident(m.group(1))):
        engine.drop_table(_ident(m.group(1)))
        return engine.spark.createDataFrame([(True,)], "ok boolean")

    # everything relational -> Catalyst, as in the reference
    return engine.spark.sql(sql)


def _merge(engine, sql: str):
    m = _MERGE_RE.match(sql)
    if not m:
        raise ValueError("cannot parse MERGE statement; expected "
                         "MERGE INTO t USING s ON ... WHEN ...")
    target = _ident(m.group("target"))
    if not engine.has_table(target):
        raise ValueError(f"unknown hudi table '{target}' in MERGE")
    t = engine.table(target)
    if m.group("subq"):
        source_df = engine.spark.sql(m.group("subq"))
        source_name = None
    else:
        source_df = engine.spark.table(_ident(m.group("source")))
        source_name = _ident(m.group("source"))
    salias = m.group("salias") or "s"
    talias = m.group("talias") or "t"

    def _norm(expr: str | None) -> str | None:
        """Rewrite user aliases (or bare table/source names used as
        qualifiers) to the canonical t/s used by merge_into."""
        if expr is None:
            return None
        out = re.sub(rf"\b{re.escape(salias)}\.", "s.", expr)
        out = re.sub(rf"\b{re.escape(talias)}\.", "t.", out)
        if source_name:
            out = re.sub(rf"\b{re.escape(source_name)}\.", "s.", out)
        out = re.sub(rf"\b{re.escape(target)}\.", "t.", out)
        return out.strip()

    branches = []   # WHEN-clause statement order is preserved (MERGE semantics)
    for wm in _WHEN_RE.finditer(m.group("clauses")):
        action = wm.group("action").strip()
        cond = _norm(wm.group("cond"))
        if wm.group("not"):
            if not action.upper().startswith("INSERT"):
                raise ValueError("WHEN NOT MATCHED supports only INSERT")
            body = action[len("INSERT"):].strip()
            if body == "*" or body == "":
                assigns = "*"
            else:
                vm = re.match(r"^\((?P<cols>.+?)\)\s*VALUES\s*\((?P<vals>.+)\)$",
                              body, re.IGNORECASE | re.DOTALL)
                if not vm:
                    raise ValueError(f"cannot parse INSERT clause: {body}")
                cols = [_ident(c).split(".")[-1]
                        for c in vm.group("cols").split(",")]
                vals = re.split(r",(?=(?:[^(]*\([^)]*\))*[^)]*$)",
                                vm.group("vals"))
                assigns = {c: _norm(v) for c, v in zip(cols, vals)}
            branches.append({"type": "insert", "condition": cond,
                             "assignments": assigns})
        elif action.upper() == "DELETE":
            branches.append({"type": "delete", "condition": cond,
                             "assignments": None})
        else:
            assigns = action[len("UPDATE SET"):].strip()
            branches.append({"type": "update", "condition": cond,
                             "assignments": "*" if assigns == "*" else {
                                 c: _norm(e)
                                 for c, e in _split_assignments(assigns).items()}})

    instant = t.merge(source_df, on=_norm(m.group("on")),
                      ordered_branches=branches)
    _refresh_view(engine, t)
    return engine.spark.createDataFrame([(instant,)], "instant string")
