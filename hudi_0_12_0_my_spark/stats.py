"""Column-stats data skipping: prune files before the scan.

Re-expression of Hudi's column-stats index + data-skipping filter algebra
(DataSkippingUtils.scala:43,100-286 — min/max interval truth table for
=, <, >, <=, >=, IN, STARTS_WITH under AND; ColumnStatsIndexSupport.scala:109;
HoodieFileIndex.scala:111-214). Catalyst cannot skip across files on its own —
this runs on the driver over commit-metadata stats BEFORE the scan, so the
resulting plan reads only candidate files (the same altitude where Hudi does
it, SURVEY.md §4).

Pruning is strictly conservative: a file is dropped only when its [min, max]
interval PROVES no row can match; unparseable or OR/NOT predicates disable
pruning (the row-level filter still applies afterwards, so results are
identical either way — skipping is purely a scan-size optimization).
"""

from __future__ import annotations

import re

_PRED_RE = re.compile(
    r"^\s*`?(\w+)`?\s*(>=|<=|!=|<>|=|==|<|>)\s*(.+?)\s*$")


def _parse_literal(s: str):
    s = s.strip()
    if (s.startswith("'") and s.endswith("'")) or (s.startswith('"') and s.endswith('"')):
        return s[1:-1]
    try:
        return int(s)
    except ValueError:
        pass
    try:
        return float(s)
    except ValueError:
        return None


def parse_predicates(filters):
    """-> list[(col, op, value)] for a conjunction, or None (no pruning).

    Accepts a SQL-ish string of AND-ed simple comparisons, or an explicit list
    of (col, op, value) tuples. Anything richer (OR, NOT, functions, Columns)
    -> None: correctness is preserved by the row filter; only skipping is lost.
    """
    if filters is None:
        return None
    if isinstance(filters, list):
        return filters
    if not isinstance(filters, str):
        return None
    if re.search(r"\bor\b|\bnot\b", filters, re.IGNORECASE):
        return None
    preds = []
    for clause in re.split(r"\band\b", filters, flags=re.IGNORECASE):
        inm = re.match(r"^\s*`?(\w+)`?\s+in\s*\(([^()]*)\)\s*$",
                       clause, re.IGNORECASE)
        if inm:
            vals = [_parse_literal(v) for v in inm.group(2).split(",")]
            if any(v is None for v in vals):
                return None
            preds.append((inm.group(1), "in", vals))
            continue
        if "(" in clause:       # function calls etc: no pruning, row filter
            return None         # still applies
        m = _PRED_RE.match(clause)
        if not m:
            return None
        col, op, lit = m.group(1), m.group(2), _parse_literal(m.group(3))
        if lit is None:
            return None
        preds.append((col, op, lit))
    return preds


def _comparable(a, b):
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool)
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return True
    return type(a) is type(b)


def _excludes(stat: dict, op: str, val) -> bool:
    """True iff [min, max] proves no row in the file satisfies `col op val`.
    (DataSkippingUtils.scala:100-286 interval algebra, AND branch.)"""
    mn, mx = stat.get("min"), stat.get("max")
    if mn is None or mx is None:
        return False
    if isinstance(val, str) and not isinstance(mn, str):
        # timestamp/date stats serialize to ISO strings; compare lexically
        mn, mx = str(mn), str(mx)
    if not (_comparable(mn, val) and _comparable(mx, val)):
        return False
    try:
        if op in ("=", "=="):
            return val < mn or val > mx
        if op == "<":
            return mn >= val
        if op == "<=":
            return mn > val
        if op == ">":
            return mx <= val
        if op == ">=":
            return mx < val
        if op == "in":
            return all(v < mn or v > mx for v in val)
        if op == "startswith":
            return mx < val or (isinstance(mn, str) and mn[:len(val)] > val)
    except TypeError:
        return False
    return False


def prune_files(view, slices, preds) -> list[str]:
    """Candidate base-file paths for a snapshot scan under `preds`."""
    out = []
    for g, s in slices:
        if s.base_file is None:
            continue
        keep = True
        if preds:
            cs = s.base_file.col_stats or {}
            for col, op, val in preds:
                st = cs.get(col)
                if st and _excludes(st, op, val):
                    keep = False
                    break
        if keep:
            out.append(view.abs(s.base_file.path))
    return out


def skipping_effectiveness(view, filters) -> dict:
    """Diagnostic: how many live files a predicate set would skip."""
    preds = parse_predicates(filters)
    slices = view.live_slices()
    kept = prune_files(view, slices, preds)
    return {"total_files": len(slices), "candidate_files": len(kept),
            "skipped": len(slices) - len(kept)}
