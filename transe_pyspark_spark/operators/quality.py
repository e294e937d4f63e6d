"""Declarative data-quality constraint audit.

The warehouse-maintenance counterpart the reference's pipeline assumes
but never checks (the reference loads triples with no validation at
all — `utils.py:5-59` trusts its TSV): a small constraint vocabulary
(not-null, unique, accepted-values, range, referential integrity)
evaluated as ONE report DataFrame, dbt-test / Great-Expectations
style.

Scale posture: every check is a single aggregate or one key equi-join
over exactly the columns it names (column pruning reaches the scan),
and each produces a literal 1-row frame — the unioned report is
|checks| rows. Nothing collects; violation COUNTS come back, never
violating rows (callers wanting rows re-run the check's predicate as
a filter). Uniqueness and FK checks shuffle on the checked key only.

All counts are exact BIGINTs, so the report hash-checks against a
plain SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _report(name: str, checked: Column, violations: Column, agg_src: DataFrame) -> DataFrame:
    return agg_src.agg(
        checked.cast("long").alias("n_checked"),
        violations.cast("long").alias("n_violations"),
    ).select(F.lit(name).alias("check_name"), "n_checked", "n_violations")


def check_not_null(df: DataFrame, col: str, name: str | None = None) -> DataFrame:
    """Rows checked = all rows; violation = NULL in ``col``."""
    return _report(
        name or f"not_null:{col}",
        F.count(F.lit(1)),
        F.count(F.lit(1)) - F.count(F.col(col)),
        df.select(col),
    )


def check_unique(df: DataFrame, col: str, name: str | None = None) -> DataFrame:
    """Rows checked = non-NULL rows; violations = rows beyond the first
    in each duplicate key group (``count - count(distinct)``) — 0 iff
    the column is a key. One hash agg on the checked column; the
    distinct rides the same shuffle as a partial aggregate."""
    return _report(
        name or f"unique:{col}",
        F.count(F.col(col)),
        F.count(F.col(col)) - F.count_distinct(F.col(col)),
        df.select(col),
    )


def check_accepted_values(
    df: DataFrame, col: str, values: list, name: str | None = None
) -> DataFrame:
    """Violations = non-NULL values outside the accepted list (NULLs are
    not-null's business, not this check's)."""
    c = F.col(col)
    return _report(
        name or f"accepted:{col}",
        F.count(c),
        F.coalesce(F.sum(F.when(c.isNotNull() & ~c.isin(values), 1).otherwise(0)), F.lit(0)),
        df.select(col),
    )


def check_range(
    df: DataFrame,
    col: str,
    lo=None,
    hi=None,
    name: str | None = None,
) -> DataFrame:
    """Violations = non-NULL values < ``lo`` or > ``hi`` (either bound
    optional, both inclusive)."""
    if lo is None and hi is None:
        raise ValueError("check_range needs at least one bound")
    c = F.col(col)
    bad = F.lit(False)
    if lo is not None:
        bad = bad | (c < F.lit(lo))
    if hi is not None:
        bad = bad | (c > F.lit(hi))
    return _report(
        name or f"range:{col}",
        F.count(c),
        F.coalesce(F.sum(F.when(c.isNotNull() & bad, 1).otherwise(0)), F.lit(0)),
        df.select(col),
    )


def check_foreign_key(
    child: DataFrame,
    child_col: str,
    parent: DataFrame,
    parent_col: str,
    name: str | None = None,
) -> DataFrame:
    """Referential integrity: violations = non-NULL child keys with no
    parent row (orphans). Planned as a LEFT ANTI equi-join on the key —
    the child shuffles once on the checked column, the parent side is
    its distinct key set (Catalyst prunes every other parent column);
    no row multiplication at any fan-out."""
    kids = child.select(F.col(child_col).alias("__k")).filter(F.col("__k").isNotNull())
    orphans = kids.join(
        parent.select(F.col(parent_col).alias("__k")),
        "__k",
        "left_anti",
    )
    n_checked = kids.agg(F.count(F.lit(1)).cast("long").alias("n_checked"))
    n_bad = orphans.agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
    return (
        n_checked.crossJoin(n_bad)
        .select(
            F.lit(name or f"fk:{child_col}->{parent_col}").alias("check_name"),
            "n_checked",
            "n_violations",
        )
    )


def constraint_audit(checks: list[DataFrame]) -> DataFrame:
    """Union the per-check 1-row reports into one
    (check_name, n_checked, n_violations) frame. Order is the caller's
    list order semantically, but the output carries no order column —
    consumers sort by check_name (the oracle harness does)."""
    if not checks:
        raise ValueError("constraint_audit needs at least one check")
    out = checks[0]
    for c in checks[1:]:
        out = out.unionAll(c)
    return out
