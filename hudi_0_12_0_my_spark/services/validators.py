"""Pre-commit validators: SQL assertions gating every write commit.

Re-expression of the reference's validator family:
  hudi-client/hudi-spark-client/.../client/validator/SparkPreCommitValidator.java:48-57
    (validate(instant, writeResult, before, after) over affected partitions)
  SqlQueryPreCommitValidator.java:52-76 (temp views per staged table,
    ``<TABLE_NAME>`` substitution, queries split on ';')
  SqlQueryEqualityPreCommitValidator.java:64-85
    (``prev.intersect(new).count() == prev.count()`` must HOLD)
  SqlQueryInequalityPreCommitValidator.java (same computation must NOT hold)
  SqlQuerySingleResultPreCommitValidator.java (``query#expected`` run on the
    new state only; single row/column; string compare)
  Config keys: hudi-client-common/.../config/HoodiePreCommitValidatorConfig.java:43-71.

Spark-first twist: the reference materializes before/after DataFrames inside
the commit action executor. Here the "after" state is a FileSystemView with
the inflight commit's metadata folded in (fsview fold accepts pre-supplied
metadata), so validation reads the exact post-commit plan — pruned scans,
MOR merge and all — while the timeline still shows nothing. A failure aborts
the staged write (marker-based undo); the commit never becomes visible.

Configured per table via ``cfg.precommit_validators``, a list of
``{"kind": "equality"|"inequality"|"single_value", "queries": "sql[;sql]"}``
dicts (JSON-safe, persisted in table config), or registered in-process with
``table.add_precommit_validator(fn)`` where ``fn(spark, before_df, after_df)``
raises to reject the commit.
"""

from __future__ import annotations

import itertools

from .. import timeline as tl

TABLE_VARIABLE = "<TABLE_NAME>"
_counter = itertools.count(1)


class PreCommitValidationError(Exception):
    """A configured validator rejected the inflight commit."""


def _split_queries(spec: dict) -> list[str]:
    qs = [q.strip() for q in str(spec.get("queries", "")).split(";")]
    qs = [q for q in qs if q]
    if not qs:
        raise PreCommitValidationError(
            f"validator configured incorrectly, expected at least one query: "
            f"{spec!r}")
    return qs


def _check_equality(spark, query: str, before_name: str, after_name: str,
                    want_equal: bool) -> None:
    prev = spark.sql(query.replace(TABLE_VARIABLE, before_name))
    new = spark.sql(query.replace(TABLE_VARIABLE, after_name))
    # reference equality test verbatim: every (distinct) prev row must appear
    # in new (SqlQueryEqualityPreCommitValidator.java:78)
    equal = prev.intersect(new).count() == prev.count()
    if want_equal and not equal:
        raise PreCommitValidationError(
            f"equality validation failed for {query!r}: new state lost rows "
            f"the previous state had")
    if not want_equal and equal:
        raise PreCommitValidationError(
            f"inequality validation failed for {query!r}: expected results "
            f"to differ, but they are the same")


def _check_single_value(spark, query: str, after_name: str) -> None:
    q, sep, expected = query.partition("#")
    if not sep:
        raise PreCommitValidationError(
            f"invalid single_value query format {query!r}; expected "
            f"'sql#expected'")
    rows = spark.sql(q.replace(TABLE_VARIABLE, after_name)).collect()
    if len(rows) != 1 or len(rows[0]) != 1:
        raise PreCommitValidationError(
            f"single_value validation for {q!r} returned "
            f"{len(rows)} rows; expected exactly one row with one column")
    got = rows[0][0]
    if str(got) != expected.strip():
        raise PreCommitValidationError(
            f"single_value validation failed for {q!r}: expected "
            f"{expected.strip()!r}, got {got!r}")


def run_precommit(table, instant: str, action: str, md: dict) -> None:
    """Run all configured validators against the before/after states of the
    partitions this write touches. Raises PreCommitValidationError to make
    the writer abort the staged files; a no-op when nothing is configured."""
    specs = list(getattr(table.cfg, "precommit_validators", None) or ())
    specs += list(getattr(table, "_precommit_validators", ()))
    if not specs:
        return
    touched = set(md.get("partition_to_write_stats") or {})
    touched |= set(md.get("replaced_file_groups") or {})
    partitions = sorted(touched) or None

    before_view = table.view()
    after_view = table.view()
    after_view._fold(table.timeline, [(tl.Instant(instant, action), md)])
    reader = table.reader
    before_df = reader.snapshot_of_view(before_view, partitions=partitions)
    after_df = reader.snapshot_of_view(after_view, partitions=partitions)

    n = next(_counter)
    before_name = f"staged_table_{n}_before"
    after_name = f"staged_table_{n}_after"
    spark = table.spark
    before_df.createOrReplaceTempView(before_name)
    after_df.createOrReplaceTempView(after_name)
    try:
        for spec in specs:
            if callable(spec):
                spec(spark, before_df, after_df)
                continue
            kind = spec.get("kind")
            if kind == "equality":
                for q in _split_queries(spec):
                    _check_equality(spark, q, before_name, after_name,
                                    want_equal=True)
            elif kind == "inequality":
                for q in _split_queries(spec):
                    _check_equality(spark, q, before_name, after_name,
                                    want_equal=False)
            elif kind == "single_value":
                for q in _split_queries(spec):
                    _check_single_value(spark, q, after_name)
            else:
                raise PreCommitValidationError(
                    f"unknown validator kind {kind!r}; expected equality | "
                    f"inequality | single_value")
    finally:
        spark.catalog.dropTempView(before_name)
        spark.catalog.dropTempView(after_name)
