"""General as-of join — the time-series operator Spark lacks natively,
composed from union + window so it scales as ONE partitioned sort (no
range-join explosion).

Generalizes the declared ``events_asof_join`` query
(plans/analytics.py) into a reusable operator with the pandas
``merge_asof`` surface: ``direction`` backward/forward, optional
``tolerance``, group keys ``by``. Semantics follow merge_asof:
inclusive match at equal timestamps, one matched right row per left row
(the nearest; ties within the right side resolve to its LAST row in
(time, tie_col) order for backward and FIRST for forward — pass a
pre-deduped right side for full determinism, as merge_asof itself
requires).

100 TB shape: both sides shuffle once on ``by``; the union-window scan
carries the nearest right payload through a running ``last(ignorenulls)``
— linear in rows, state bounded by one payload struct per partition
row. The naive alternative (equi+range join, then per-left argmin) is
quadratic in co-keyed density.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    time_col: str,
    by: list[str],
    direction: str = "backward",
    tolerance=None,
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join: every ``left`` row gains the payload columns of
    the nearest ``right`` row in the same ``by`` group with
    ``right.time <= left.time`` (backward) or ``>=`` (forward); no
    match (or a match beyond ``tolerance``) yields NULLs.

    ``tolerance`` is a Column-compatible bound on the absolute time
    gap: for timestamp columns pass ``F.expr("INTERVAL 5 MINUTES")``,
    for numerics a literal. Right payload columns land suffixed."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = list(by) + [time_col]
    lcols = [c for c in left.columns if c not in keys]
    rcols = [c for c in right.columns if c not in keys]
    if not rcols:
        raise ValueError("asof_join: right side has no payload columns")
    rv = F.struct(
        F.col(time_col).alias("_rt"), *[F.col(c) for c in rcols]
    ).alias("_rv")
    r2 = right.select(*by, time_col, rv)
    rv_type = r2.schema["_rv"].dataType
    l2 = left.select(
        *by,
        time_col,
        *lcols,
        F.lit(None).cast(rv_type).alias("_rv"),
        F.lit(0).alias("_isr"),
    )
    r3 = r2.select(
        *by,
        time_col,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        "_rv",
        F.lit(1).alias("_isr"),
    )
    # backward: scan time ascending, right rows first at equal ts so an
    # exact-timestamp match is visible (inclusive); forward mirrors it
    # on a descending scan
    t_order = F.col(time_col).asc() if direction == "backward" else F.col(time_col).desc()
    w = (
        Window.partitionBy(*by)
        .orderBy(t_order, F.col("_isr").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l2.unionByName(r3)
        .withColumn("_m", F.last("_rv", ignorenulls=True).over(w))
        .filter(F.col("_isr") == 0)
    )
    if tolerance is not None:
        gap = (
            F.col(time_col) - F.col("_m._rt")
            if direction == "backward"
            else F.col("_m._rt") - F.col(time_col)
        )
        matched = matched.withColumn(
            "_m", F.when(gap <= tolerance, F.col("_m"))
        )
    out_cols = (
        [F.col(c) for c in by]
        + [F.col(time_col)]
        + [F.col(c) for c in lcols]
        + [F.col(f"_m.{c}").alias(f"{c}{suffix}") for c in rcols]
    )
    return matched.select(*out_cols)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    time_col: str,
    start_col: str,
    end_col: str,
    inclusive: str = "both",
    suffix: str = "_r",
) -> DataFrame:
    """Equi+range join: every ``left`` row pairs with the ``right``
    rows of the same ``by`` group whose [start, end] interval contains
    ``left.time`` — the generic form of the declared
    ``events_session_attribution`` shape.

    The plan is a hash/sort-merge join on ``by`` with the range
    predicate evaluated inline: both sides co-partition on the group
    key, so there is no quadratic interval explosion — per-group cost is
    (left rows x overlapping intervals), the output size itself. For
    non-overlapping intervals per group (sessions), that is one match
    per left row. ``inclusive``: both|left|right|neither (interval
    endpoint semantics)."""
    bounds = {
        "both": lambda t, s, e: (t >= s) & (t <= e),
        "left": lambda t, s, e: (t >= s) & (t < e),
        "right": lambda t, s, e: (t > s) & (t <= e),
        "neither": lambda t, s, e: (t > s) & (t < e),
    }
    if inclusive not in bounds:
        raise ValueError(f"inclusive must be one of {sorted(bounds)}")
    l = left.alias("l")
    r = right.alias("r")
    cond = None
    for c in by:
        eq = F.col(f"l.{c}") == F.col(f"r.{c}")
        cond = eq if cond is None else (cond & eq)
    cond = cond & bounds[inclusive](
        F.col(f"l.{time_col}"), F.col(f"r.{start_col}"), F.col(f"r.{end_col}")
    )
    rpay = [c for c in right.columns if c not in by]
    return l.join(r, cond, "left").select(
        *[F.col(f"l.{c}") for c in left.columns],
        *[F.col(f"r.{c}").alias(f"{c}{suffix}") for c in rpay],
    )
