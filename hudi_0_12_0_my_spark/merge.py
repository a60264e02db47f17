"""MERGE INTO: conditional matched-update / matched-delete / not-matched-insert.

Re-expression of MergeIntoHoodieTableCommand.scala:147,258,326 (513 LoC).
Where Hudi serializes the branch conditions/assignments into an
ExpressionPayload evaluated per record with runtime codegen
(command/payload/ExpressionPayload.scala:51 + ExpressionCodeGen.scala), here
the branches are plain `when/otherwise` column expressions — Catalyst
whole-stage-codegens them natively, so no custom codegen exists.

Scale shape (the 100 TB plan):

  matched rows  -> target INNER JOIN source        (broadcast-able)
  insert rows   -> source LEFT ANTI JOIN target    (broadcast-able)

A target row with no source match can never satisfy any MERGE branch, so —
unlike a full-outer join of the whole snapshot, which forces a sort-merge
shuffle of the entire table — untouched rows never enter any exchange. On COW
tables the target scan itself is key-range pruned first: only base files whose
record-key ranges intersect the source keys are read (reader.snapshot
key_probe -> writer._candidate_base_files, the bloom-parity index), so a MERGE
touching 0.1% of keys reads a few file groups, not the table.

Aliases: the target table is `t`, the source DataFrame is `s`; every condition
and assignment is a SQL string over those aliases (mirroring Hudi's
MERGE INTO ... USING src s ON t.id = s.id syntax). Only CHANGED rows are fed
to the upsert — unchanged target rows are never rewritten unnecessarily
(matched rows with no satisfied branch are skipped, as in the reference).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

from . import meta
from .keygen import record_key_expr


def _source_key_probe(table, source: DataFrame, on: str) -> DataFrame | None:
    """Derive a `_hoodie_record_key` probe from the ON condition.

    MERGE ON conditions are key-aligned equality conjuncts
    (MergeIntoHoodieTableCommand validates this); when every record-key field
    of the target appears as `t.<key> = s.<col>` (either side order), the
    source columns are renamed to the key fields and run through the keygen
    expression — yielding the exact key strings the stored files carry, so
    file key ranges can prune the target scan. Returns None when the ON
    condition is not fully key-covering (fall back to an unpruned scan)."""
    mapping = {}
    for conj in re.split(r"(?i)\s+and\s+", on.strip()):
        m = re.match(r"^\s*t\.(\w+)\s*=\s*s\.(\w+)\s*$", conj) \
            or re.match(r"^\s*s\.(\w+)\s*=\s*t\.(\w+)\s*$", conj)
        if not m:
            return None
        a, b = m.groups()
        tcol, scol = (a, b) if conj.lstrip().lower().startswith("t.") else (b, a)
        mapping[tcol] = scol
    keys = table.cfg.record_key_fields
    if not keys or not all(k in mapping for k in keys):
        return None
    probe = source.select(*[F.col(mapping[k]).alias(k) for k in keys])
    return probe.select(record_key_expr(table.cfg).alias(meta.RECORD_KEY))


def merge_changes(table, source: DataFrame, on: str,
                  when_matched_update: dict | str | None = None,
                  matched_update_condition: str | None = None,
                  when_matched_delete: bool = False,
                  matched_delete_condition: str | None = None,
                  when_not_matched_insert: dict | str | None = "*",
                  not_matched_insert_condition: str | None = None,
                  ordered_branches: list | None = None) -> DataFrame | None:
    """Build the changed-rows DataFrame of a MERGE (exposed separately so plan
    tests can assert the scan shape without committing a write)."""
    probe = _source_key_probe(table, source, on)
    snap = table.reader.snapshot(keep_meta=True, key_probe=probe)
    business = [f for f in snap.columns if f not in meta.META_COLS]

    t = snap.alias("t")
    s = source.alias("s")

    def _assign(spec, default_side: str):
        """column -> expression for the output row."""
        out = {}
        for col in business:
            if isinstance(spec, dict) and col in spec:
                out[col] = F.expr(spec[col])
            elif spec == "*" and col in source.columns:
                out[col] = F.col(f"s.{col}")
            elif default_side == "s" and col not in source.columns:
                out[col] = F.lit(None)
            else:
                out[col] = F.col(f"{default_side}.{col}")
        return out

    if ordered_branches is None:
        ordered_branches = []
        if when_matched_update is not None:
            ordered_branches.append({"type": "update",
                                     "condition": matched_update_condition,
                                     "assignments": when_matched_update})
        if when_matched_delete:
            ordered_branches.append({"type": "delete",
                                     "condition": matched_delete_condition,
                                     "assignments": None})
        if when_not_matched_insert is not None:
            ordered_branches.append({"type": "insert",
                                     "condition": not_matched_insert_condition,
                                     "assignments": when_not_matched_insert})

    matched_branches = []   # (condition, assignments, is_delete) in clause order
    insert_branches = []
    for b in ordered_branches:
        cond = F.expr(b["condition"]) if b.get("condition") else F.lit(True)
        if b["type"] == "update":
            matched_branches.append((cond, _assign(b["assignments"], "t"), False))
        elif b["type"] == "delete":
            # keep target values: key and partition are re-derived from them
            # for the tombstone
            matched_branches.append((cond, _assign({}, "t"), True))
        else:
            insert_branches.append((cond, _assign(b["assignments"], "s")))
    if not matched_branches and not insert_branches:
        return None

    def _first_wins(df, branches, with_delete: bool):
        """first satisfied branch wins (MERGE statement-order semantics)."""
        idx = F.lit(None).cast("int")
        for i in range(len(branches) - 1, -1, -1):
            idx = F.when(branches[i][0], F.lit(i)).otherwise(idx)
        cols = []
        for col in business:
            if col == meta.DELETE_MARKER:
                continue
            expr = F.lit(None)
            for i, b in enumerate(branches):
                expr = F.when(idx == i, b[1][col]).otherwise(expr)
            cols.append(expr.alias(col))
        is_delete = F.lit(False)
        if with_delete:
            for i, (_, _a, isdel) in enumerate(branches):
                if isdel:
                    is_delete = is_delete | (idx == i)
        return (df.filter(idx.isNotNull())
                  .select(*cols, is_delete.alias(meta.DELETE_MARKER)))

    parts = []
    if matched_branches:
        parts.append(_first_wins(t.join(s, F.expr(on), "inner"),
                                 matched_branches, with_delete=True))
    if insert_branches:
        not_matched = s.join(t, F.expr(on), "left_anti").alias("s")
        parts.append(_first_wins(not_matched,
                                 [(c, a, False) for c, a in insert_branches],
                                 with_delete=False))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def merge_into(table, source: DataFrame, on: str, **kwargs) -> str | None:
    out = merge_changes(table, source, on, **kwargs)
    if out is None:
        return None
    return table.upsert(out)
