"""2-D skyline (Pareto frontier) in one sorted window pass.

Dominance (minimize ``cost``, maximize ``gain``): q dominates p iff
q.cost <= p.cost AND q.gain >= p.gain AND strictly better on at least
one. The definitional formulation is a quadratic NOT EXISTS self-join;
the scan form used here is O(n log n): order by cost, a point survives
iff its gain strictly exceeds the running MAX gain over all
STRICTLY-cheaper points (RANGE frame excludes cost ties) and it carries
the max gain within its own cost tie-group — equal (cost, gain)
duplicates are mutually non-dominating and all survive.

Scale: the global-ordered window is a one-task funnel (fine at
dimension-table cardinality). Running-MAX-over-cost is an associative
scan, so past one task's capacity the two-phase range-partitioned form
(functions/prefix.py: per-range local scans + O(partitions) carry-in
maxima) applies verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def skyline_2d(df: DataFrame, cost_col: str, gain_col: str) -> DataFrame:
    """Rows of ``df`` on the Pareto frontier (min cost, max gain).

    ``cost_col`` MUST be an integral type: the strictly-cheaper frame is
    ``RANGE BETWEEN UNBOUNDED PRECEDING AND -1``, whose -1 offset means
    "cost - 1" — exactly the strictly-cheaper set only when costs are
    integers. A fractional cost in (cost-1, cost) would be silently
    excluded and dominated points would survive. Callers with
    double/decimal costs must pre-scale to integer units (cents,
    micro-units) — as every call site in queries/ does.
    """
    cost_type = df.schema[cost_col].dataType
    if not isinstance(cost_type, _INTEGRAL):
        raise TypeError(
            f"skyline_2d requires an integral cost column; {cost_col} is "
            f"{cost_type.simpleString()}. Pre-scale to integer units "
            "(e.g. cents) before calling."
        )
    cheaper = Window.orderBy(cost_col).rangeBetween(
        Window.unboundedPreceding, -1
    )
    tie = Window.partitionBy(cost_col)
    return (
        df.withColumn("_sk_cheaper", F.max(gain_col).over(cheaper))
        .withColumn("_sk_tie", F.max(gain_col).over(tie))
        .filter(
            (
                F.col("_sk_cheaper").isNull()
                | (F.col(gain_col) > F.col("_sk_cheaper"))
            )
            & (F.col(gain_col) == F.col("_sk_tie"))
        )
        .drop("_sk_cheaper", "_sk_tie")
    )


def largest_remainder(
    df: DataFrame, key_col: str, count_col: str, total: int
) -> DataFrame:
    """Integer quotas per key, proportional to ``count_col``, summing
    EXACTLY to ``total`` (largest-remainder apportionment; remainder
    ties broken by key ascending). Pure integer arithmetic end to end.

    Degenerate cases: an empty ``df`` returns no rows; when
    SUM(count_col) is 0 (all-zero counts) proportionality is undefined,
    so the budget is split EVENLY — base = total DIV n_keys with the
    first total % n_keys keys (ascending) taking one extra unit — which
    preserves the exact-sum contract for any total (integer DIV/% by
    the zero sum would otherwise yield NULL and silently break it).
    ``count_col`` is re-aliased internally, so arbitrary column names
    (including ones needing quoting) are safe — no name is interpolated
    into SQL text.
    """
    if not isinstance(total, int) or total < 0:
        raise ValueError(f"total must be a non-negative int, got {total!r}")
    tot = df.agg(
        F.sum(count_col).cast("long").alias("_n"),
        F.count(F.lit(1)).cast("long").alias("_nk"),
    )
    base = (
        df.select(key_col, F.col(count_col).alias("_cnt"))
        .crossJoin(F.broadcast(tot))
        .select(
            key_col,
            F.col("_cnt").alias(count_col),
            # conditional, NOT coalesce-over-division: under ANSI mode
            # (the session default) DIV/% by the zero sum THROW rather
            # than yield NULL, so the degenerate branch must be taken
            # before the division is evaluated. total is a validated
            # int literal, _cnt/_n/_nk internal aliases — nothing
            # user-supplied reaches the SQL text.
            F.when(F.col("_n") == 0, F.expr(f"{total} DIV _nk"))
            .otherwise(F.expr(f"({total} * _cnt) DIV _n"))
            .alias("_base"),
            F.when(F.col("_n") == 0, F.lit(0))
            .otherwise(F.lit(total) * F.col("_cnt") % F.col("_n"))
            .alias("_rem"),
        )
    )
    short = base.agg(
        (F.lit(total) - F.sum("_base").cast("long")).alias("_k")
    )
    rn = F.row_number().over(Window.orderBy(F.col("_rem").desc(), key_col))
    return (
        base.withColumn("_rn", rn)
        .crossJoin(F.broadcast(short))
        .select(
            key_col,
            count_col,
            (F.col("_base") + F.when(F.col("_rn") <= F.col("_k"), 1).otherwise(0))
            .cast("long")
            .alias("quota"),
        )
    )
