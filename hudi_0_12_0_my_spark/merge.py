"""MERGE INTO: conditional matched-update / matched-delete / not-matched-insert.

Re-expression of MergeIntoHoodieTableCommand.scala:147,258,326 (513 LoC).
Where Hudi serializes the branch conditions/assignments into an
ExpressionPayload evaluated per record with runtime codegen
(command/payload/ExpressionPayload.scala:51 + ExpressionCodeGen.scala), here
the branches are plain `when/otherwise` column expressions over one join —
Catalyst whole-stage-codegens them natively, so no custom codegen exists.

Aliases: the target table is `t`, the source DataFrame is `s`; every condition
and assignment is a SQL string over those aliases (mirroring Hudi's
MERGE INTO ... USING src s ON t.id = s.id syntax). Only CHANGED rows are fed
to the upsert — unchanged target rows are never rewritten unnecessarily
(matched rows with no satisfied branch are skipped, as in the reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from . import meta


def merge_into(table, source: DataFrame, on: str,
               when_matched_update: dict | str | None = None,
               matched_update_condition: str | None = None,
               when_matched_delete: bool = False,
               matched_delete_condition: str | None = None,
               when_not_matched_insert: dict | str | None = "*",
               not_matched_insert_condition: str | None = None,
               ordered_branches: list | None = None) -> str | None:
    """``on`` e.g. "t.id = s.id"; assignments e.g. {"price": "s.price * 2"} or
    "*" (take all same-named source columns).

    ``ordered_branches`` (used by the SQL front-end) preserves WHEN-clause
    order — MERGE semantics are first-satisfied-branch-wins in *statement*
    order (MergeIntoHoodieTableCommand.scala evaluates clauses in order).
    Each entry: {"type": "update"|"delete"|"insert",
                 "condition": str|None, "assignments": dict|"*"|None}.
    When omitted, the keyword form builds branches in update, delete, insert
    order.
    """
    cfg = table.cfg
    snap = table.snapshot(keep_meta=True)
    business = [f for f in snap.columns if f not in meta.META_COLS]

    t = snap.alias("t")
    s = source.alias("s")
    joined = t.join(s, F.expr(on), "full_outer")
    # presence flags: a side is present iff one of its columns is non-null
    tgt_present = F.col(f"t.{meta.RECORD_KEY}").isNotNull()
    src_present = F.col(f"s.{source.columns[0]}").isNotNull()
    for c in source.columns[1:]:
        src_present = src_present | F.col(f"s.{c}").isNotNull()

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

    branches = []   # (condition, assignments, is_delete)
    for b in ordered_branches:
        if b["type"] == "insert":
            cond = src_present & ~tgt_present
        else:
            cond = tgt_present & src_present
        if b.get("condition"):
            cond = cond & F.expr(b["condition"])
        if b["type"] == "update":
            branches.append((cond, _assign(b["assignments"], "t"), False))
        elif b["type"] == "delete":
            # keep target values: key and partition are re-derived from them
            # for the tombstone
            branches.append((cond, _assign({}, "t"), True))
        else:
            branches.append((cond, _assign(b["assignments"], "s"), False))
    if not branches:
        return None

    # first satisfied branch wins (MERGE branch order semantics)
    branch_idx = F.lit(None).cast("int")
    for i in range(len(branches) - 1, -1, -1):
        branch_idx = F.when(branches[i][0], F.lit(i)).otherwise(branch_idx)

    cols = []
    for col in business:
        if col == meta.DELETE_MARKER:
            continue
        expr = F.lit(None)
        for i, (_, assigns, _isdel) in enumerate(branches):
            expr = F.when(branch_idx == i, assigns[col]).otherwise(expr)
        cols.append(expr.alias(col))
    is_delete = F.lit(False)
    for i, (_, _a, isdel) in enumerate(branches):
        if isdel:
            is_delete = is_delete | (branch_idx == i)
    out = (joined.filter(branch_idx.isNotNull())
                 .select(*cols, is_delete.alias(meta.DELETE_MARKER)))
    return table.upsert(out)
