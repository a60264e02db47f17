"""Column-stats data skipping: prune files before the scan.

Re-expression of Hudi's column-stats index + data-skipping filter algebra
(DataSkippingUtils.scala:43,100-286 — min/max/null-count truth table for
=, !=, <, >, <=, >=, IN, NOT IN, IS NULL, IS NOT NULL, STARTS_WITH under
AND and OR; ColumnStatsIndexSupport.scala:109; HoodieFileIndex.scala:111-214).
Catalyst cannot skip across files on its own — this runs on the driver over
commit-metadata stats BEFORE the scan, so the resulting plan reads only
candidate files (the same altitude where Hudi does it, SURVEY.md §4).

Predicates normalize to DNF (OR of AND-groups, one paren level — the shape
`a AND b`, `a OR b`, `(a AND b) OR (c AND d)`): a file is skipped only when
EVERY disjunct is provably unsatisfiable over its [min, max, null-count]
stats — the same conservative semantics as the reference's recursive
translation (an OR prunes only if both branches prune).

Pruning is strictly conservative: a file is dropped only when its stats
PROVE no row can match; unparseable clauses disable pruning (the row-level
filter still applies afterwards, so results are identical either way —
skipping is purely a scan-size optimization).
"""

from __future__ import annotations

import re

_PRED_RE = re.compile(
    r"^\s*`?(\w+)`?\s*(>=|<=|!=|<>|=|==|<|>)\s*(.+?)\s*$")
_NULL_RE = re.compile(r"^\s*`?(\w+)`?\s+is\s+(not\s+)?null\s*$", re.IGNORECASE)
_IN_RE = re.compile(r"^\s*`?(\w+)`?\s+(not\s+)?in\s*\(([^()]*)\)\s*$",
                    re.IGNORECASE)


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


def _split_depth0(s: str, kw: str) -> list[str]:
    """Split on keyword `kw` at paren depth 0, outside quoted literals."""
    out, last, depth, i, n, k = [], 0, 0, 0, len(s), len(kw)
    low = s.lower()
    quote = None
    while i < n:
        c = s[i]
        if quote:
            if c == quote:
                quote = None
        elif c in ("'", '"'):
            quote = c
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif (depth == 0 and low.startswith(kw, i)
              and (i == 0 or not (low[i - 1].isalnum() or low[i - 1] == "_"))
              and (i + k >= n or not (low[i + k].isalnum() or low[i + k] == "_"))):
            out.append(s[last:i])
            last = i + k
            i += k
            continue
        i += 1
    out.append(s[last:])
    return out


def _strip_parens(s: str) -> str:
    s = s.strip()
    while s.startswith("(") and s.endswith(")"):
        depth = 0
        wraps = True
        for i, c in enumerate(s):
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0 and i < len(s) - 1:
                    wraps = False
                    break
        if not wraps:
            break
        s = s[1:-1].strip()
    return s


def _parse_clause(clause: str):
    """-> (col, op, value) or None. op ∈ {comparisons, in, notin, isnull,
    isnotnull, startswith}."""
    clause = _strip_parens(clause)
    nm = _NULL_RE.match(clause)
    if nm:
        return (nm.group(1), "isnotnull" if nm.group(2) else "isnull", None)
    inm = _IN_RE.match(clause)
    if inm:
        vals = [_parse_literal(v) for v in inm.group(3).split(",")]
        if any(v is None for v in vals):
            return None
        return (inm.group(1), "notin" if inm.group(2) else "in", vals)
    if re.search(r"\bnot\b", clause, re.IGNORECASE):
        return None              # general NOT: row filter only
    if "(" in clause:            # function calls etc: no pruning
        return None
    m = _PRED_RE.match(clause)
    if not m:
        return None
    lit = _parse_literal(m.group(3))
    if lit is None:
        return None
    return (m.group(1), m.group(2), lit)


def parse_predicates(filters):
    """-> DNF list[list[(col, op, value)]], or None (no pruning).

    Accepts a SQL-ish string — AND-ed simple comparisons, optionally OR-ed
    at the top level with one paren grouping level (`(a AND b) OR (c)`) —
    or an explicit list of (col, op, value) tuples (one conjunction).
    Anything richer (nested NOT, functions, subqueries) -> None:
    correctness is preserved by the row filter; only skipping is lost.
    """
    if filters is None:
        return None
    if isinstance(filters, list):
        return [filters] if filters and isinstance(filters[0], tuple) \
            else (filters or None)
    if not isinstance(filters, str):
        return None
    # BETWEEN contains a bare AND, which would confuse the conjunction
    # split — rewrite `col between X and Y` to the two comparisons first
    # (literal operands only: quoted-without-spaces or unspaced scalars)
    filters = re.sub(
        r"`?(\w+)`?\s+between\s+('[^']*'|\"[^\"]*\"|\S+)\s+and\s+"
        r"('[^']*'|\"[^\"]*\"|\S+)",
        r"(\1 >= \2 and \1 <= \3)", filters, flags=re.IGNORECASE)
    if re.search(r"\bbetween\b", filters, re.IGNORECASE):
        return None                       # NOT BETWEEN / unparsed operands
    dnf = []
    for disjunct in _split_depth0(filters, "or"):
        conj = _parse_conj(disjunct)
        if not conj:
            return None
        dnf.append(conj)
    return dnf or None


def _parse_conj(s: str):
    """Flatten a (possibly parenthesized, possibly nested) conjunction into
    [(col, op, value)] — e.g. the groups a BETWEEN rewrite produces."""
    parts = _split_depth0(_strip_parens(s), "and")
    if len(parts) == 1:
        p = _parse_clause(parts[0])
        return None if p is None else [p]
    out = []
    for part in parts:
        sub = _parse_conj(part)
        if sub is None:
            return None
        out.extend(sub)
    return out


def _comparable(a, b):
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool)
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return True
    return type(a) is type(b)


def _excludes(stat: dict, op: str, val, records: int | None = None) -> bool:
    """True iff (min, max, nulls) proves no row in the file satisfies
    `col op val` (DataSkippingUtils.scala:100-286 interval algebra)."""
    nulls = stat.get("nulls")
    if op == "isnull":
        return nulls == 0
    if op == "isnotnull":
        return (records is not None and records > 0
                and nulls is not None and nulls >= records)
    mn, mx = stat.get("min"), stat.get("max")
    if mn is None or mx is None:
        return False
    probe = val[0] if op in ("in", "notin") else val
    if isinstance(probe, str) and not isinstance(mn, str):
        # timestamp/date stats serialize to ISO strings; compare lexically
        mn, mx = str(mn), str(mx)
    if op in ("in", "notin"):
        if not all(_comparable(mn, v) and _comparable(mx, v) for v in val):
            return False
    elif not (_comparable(mn, val) and _comparable(mx, val)):
        return False
    try:
        if op in ("=", "=="):
            return val < mn or val > mx
        if op in ("!=", "<>"):
            # every row equals val -> none satisfies != (NULL rows fail
            # either way, so they cannot rescue the predicate)
            return mn == mx == val and not nulls
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
        if op == "notin":
            return mn == mx and mn in val and not nulls
        if op == "startswith":
            return mx < val or (isinstance(mn, str) and mn[:len(val)] > val)
    except TypeError:
        return False
    return False


def _conj_excludes(stats: dict, conj, records) -> bool:
    for col, op, val in conj:
        st = stats.get(col)
        if st and _excludes(st, op, val, records):
            return True
    return False


def prune_files(view, slices, preds) -> list[str]:
    """Candidate base-file paths for a snapshot scan under `preds`.

    `preds` is the DNF from parse_predicates (or a bare conjunction list for
    backward compatibility). A file survives when ANY disjunct might match."""
    if preds and isinstance(preds[0], tuple):
        preds = [preds]                      # legacy single conjunction
    out = []
    for g, s in slices:
        if s.base_file is None:
            continue
        keep = True
        if preds:
            cs = s.base_file.col_stats or {}
            rec = s.base_file.records or None
            keep = any(not _conj_excludes(cs, conj, rec) for conj in preds)
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
