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

from pyspark.sql import Column, DataFrame, Window
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
    parent row (orphans). ONE job: the child's non-NULL keys LEFT-join
    the parent's distinct key set and a single aggregate counts rows
    and parent-misses together — the child's scan+filter subtree
    executes once, where the earlier anti-join + separate n_checked
    aggregate scanned it twice (r08 advisory fix). The parent side is
    its distinct key column (every other parent column prunes away);
    distinct keys mean the left join cannot multiply rows."""
    kids = child.select(F.col(child_col).alias("__k")).filter(F.col("__k").isNotNull())
    pkeys = (
        parent.select(F.col(parent_col).alias("__k"))
        .filter(F.col("__k").isNotNull())
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    return (
        kids.join(pkeys, "__k", "left")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_checked"),
            F.coalesce(
                F.sum(F.when(F.col("__hit").isNull(), 1).otherwise(0)), F.lit(0)
            ).cast("long").alias("n_violations"),
        )
        .select(
            F.lit(name or f"fk:{child_col}->{parent_col}").alias("check_name"),
            "n_checked",
            "n_violations",
        )
    )


#: spec tuples for ``audit_table``: (kind, col, *args); kind is one of
#: "not_null" | "unique" | "accepted" (args: values list) |
#: "range" (args: lo, hi — either may be None)
AuditSpec = tuple


def audit_table(df: DataFrame, specs: list[AuditSpec]) -> DataFrame:
    """Compile EVERY non-join check on one table into ONE aggregate
    over one scan (r08 advisory: an audit with five checks on orders
    ran five jobs, each rescanning the table). All checked/violation
    pairs compute in a single ``agg`` — ``count_distinct`` for unique
    checks rides the same pass via Expand — and a ``stack`` unpivot
    reshapes the 1×2n row to the (check_name, n_checked, n_violations)
    report. The scan reads only the union of named columns.

    Spec kinds mirror the standalone checks: ``("not_null", col)``,
    ``("unique", col)``, ``("accepted", col, values)``,
    ``("range", col, lo, hi)``. Row values are IDENTICAL to the
    standalone checks' (pytest-pinned), so the two forms interchange
    under the oracle hash.
    """
    if not specs:
        raise ValueError("audit_table needs at least one spec")
    aggs: list[Column] = []
    names: list[str] = []
    for i, spec in enumerate(specs):
        kind, col = spec[0], spec[1]
        c = F.col(col)
        if kind == "not_null":
            name = f"not_null:{col}"
            checked, viol = F.count(F.lit(1)), F.count(F.lit(1)) - F.count(c)
        elif kind == "unique":
            name = f"unique:{col}"
            checked, viol = F.count(c), F.count(c) - F.count_distinct(c)
        elif kind == "accepted":
            values = spec[2]
            name = f"accepted:{col}"
            checked = F.count(c)
            viol = F.coalesce(
                F.sum(F.when(c.isNotNull() & ~c.isin(values), 1).otherwise(0)),
                F.lit(0),
            )
        elif kind == "range":
            lo, hi = spec[2], spec[3]
            if lo is None and hi is None:
                raise ValueError(f"range spec on {col} needs at least one bound")
            name = f"range:{col}"
            bad = F.lit(False)
            if lo is not None:
                bad = bad | (c < F.lit(lo))
            if hi is not None:
                bad = bad | (c > F.lit(hi))
            checked = F.count(c)
            viol = F.coalesce(
                F.sum(F.when(c.isNotNull() & bad, 1).otherwise(0)), F.lit(0)
            )
        else:
            raise ValueError(f"unknown audit spec kind: {kind!r}")
        names.append(name)
        aggs += [
            checked.cast("long").alias(f"__c{i}"),
            viol.cast("long").alias(f"__v{i}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        "'{}', __c{}, __v{}".format(n.replace("'", "\\'"), i, i)
        for i, n in enumerate(names)
    )
    return one.selectExpr(
        f"stack({len(names)}, {stack_args}) AS (check_name, n_checked, n_violations)"
    )


def constraint_audit(checks: list[DataFrame]) -> DataFrame:
    """Union the per-check report frames (1-row standalone checks
    and/or n-row ``audit_table`` batches) into one
    (check_name, n_checked, n_violations) frame. Order is the caller's
    list order semantically, but the output carries no order column —
    consumers sort by check_name (the oracle harness does). Batch
    same-table checks through ``audit_table`` so each table is scanned
    once per audit."""
    if not checks:
        raise ValueError("constraint_audit needs at least one check")
    out = checks[0]
    for c in checks[1:]:
        out = out.unionAll(c)
    return out


def fd_violations(
    df: DataFrame,
    det_col: str,
    dep_col: str,
) -> DataFrame:
    """Functional-dependency audit ``det_col → dep_col`` — the
    schema-discovery / data-contract check ("does source determine
    language?", "does order status determine priority?") profilers run
    before trusting a column as a lookup key: for every determinant
    value that maps to MORE THAN ONE dependent value, report the
    conflict and its repair cost.

    Per violating determinant: ``n_rows`` (its row count), ``n_dep``
    (distinct dependents observed), ``mode_n`` (rows agreeing with the
    most common dependent), and ``n_violating = n_rows − mode_n`` —
    the MINIMUM number of rows whose dependent must change for the FD
    to hold (the standard g3-style repair cost, exact). A determinant
    satisfies the FD iff ``n_rows == mode_n``; only violators are
    returned, so the output is violation-sized.

    Plan: one (det, dep) count aggregate over the corpus (the only
    corpus-sized shuffle; map-side partials reduce it to the cell
    cardinality), then one cell-sized re-aggregate per determinant —
    ``max(cnt)`` IS the mode count and needs no window or sort. NULL
    dependents count as a value (a NULL-dep group conflicts with a
    non-NULL one — the profiler wants to see that).

    Returns (det, n_rows, n_dep, mode_n, n_violating), violators only.
    """
    cells = df.groupBy(
        F.col(det_col).alias("det"), F.col(dep_col).alias("__dep")
    ).agg(F.count(F.lit(1)).cast("long").alias("__cnt"))
    per_det = cells.groupBy("det").agg(
        F.sum("__cnt").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_dep"),
        F.max("__cnt").cast("long").alias("mode_n"),
    )
    return per_det.filter(F.col("n_rows") > F.col("mode_n")).select(
        "det",
        "n_rows",
        "n_dep",
        "mode_n",
        (F.col("n_rows") - F.col("mode_n")).cast("long").alias("n_violating"),
    )


def benford_screen(
    df: DataFrame,
    value_cents,
) -> DataFrame:
    """Benford's-law first-digit screen — the numeric-forensics check
    (fabricated or unit-mangled figures rarely follow the log curve
    naturally arising in multiplicative data): the observed first
    SIGNIFICANT digit distribution of a positive integer column
    against the Benford expectation ``log10(1 + 1/d)``.

    Exactness: the first digit comes from the decimal string of the
    exact BIGINT (``substring(cast(v AS string), 1, 1)``) — engine-
    identical with no float log anywhere near the digit extraction;
    counts are exact BIGINTs; the two shares are single IEEE divisions
    / a literal ``log10`` per digit, rounded to the 6-dp contract, and
    ``excess_nano = round((share − benford)·1e9)`` gives the signed
    per-digit deviation as BIGINT. Non-positive values are excluded
    (Benford is defined on positive magnitudes) but reported via
    ``n_total`` on every row so the screen can't silently shrink.

    Plan: one 9-group hash aggregate over the corpus (map-side
    partials reduce it to ≤9 rows per task) + one 1-row total
    broadcast. Returns (digit, n_obs, n_total, share, benford,
    excess_nano), one row per observed digit 1..9.
    """
    v = (F.col(value_cents) if isinstance(value_cents, str) else value_cents).cast(
        "long"
    )
    base = df.select(v.alias("__v")).filter(F.col("__v") > 0)
    digits = (
        base.select(F.substring(F.col("__v").cast("string"), 1, 1).cast("long").alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    )
    # the total rides a window over the ≤9-row digit aggregate — ONE
    # consumer of `digits` (r14 guard class: the earlier 1-row agg +
    # crossJoin re-executed the corpus digit agg per consumer). The
    # pid-less window is safe here BY CONSTRUCTION: it runs over the
    # post-aggregate ≤9-row frame, never the corpus.
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    share = F.round(F.col("n_obs").cast("double") / F.col("n_total").cast("double"), 6)
    benford = F.round(F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double")), 6)
    return (
        digits.withColumn("n_total", F.sum("n_obs").over(w_all).cast("long"))
        .select(
            "digit",
            "n_obs",
            "n_total",
            share.alias("share"),
            benford.alias("benford"),
            F.round((share - benford) * 1e9, 0).cast("long").alias("excess_nano"),
        )
    )
