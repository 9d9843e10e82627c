"""Maximal-interval merge: collapse transitively-overlapping [start, end]
spans per key into their union of disjoint islands.

This is the SPAN cousin of point-gap sessionization (operators in
queries/events.py): sessionization islands points by inter-arrival gap;
this operator islands explicit intervals by overlap. The correctness
subtlety is the contained-interval case — comparing each start against
only the PREVIOUS row's end wrongly splits `[0,100] ⊇ [10,20], [30,40]`
at the third span (30 > 20), so the island test must compare against the
running MAX of all previous ends.

Scale shape: one shuffle on the key column, shared by both window
passes (running max, running island sum) and the island aggregate; the
per-row window state is a single BIGINT running max, so the operator is
watermark-friendly and linear at any key cardinality. Skewed keys (one
user with millions of spans) serialize within the key's partition like
any ordered window — at 100 TB, keys needing intra-key parallelism
should pre-split on a coarse time bucket whose boundaries are later
re-merged (two islands can only straddle a bucket edge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_maximal_intervals(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Return one row per maximal island: (key, island, start, end,
    n_spans), where `island` numbers islands 1..n in start order.

    Interval semantics are CLOSED on both ends and merging is
    overlap-or-touch: a span whose start equals the running max end
    joins the island (new island iff start > max of previous ends).
    `tiebreak_col` must make (start, tiebreak) unique per key so both
    window passes see one deterministic total order.
    """
    w = Window.partitionBy(key_col).orderBy(start_col, tiebreak_col)
    prev_max_end = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = df.withColumn(
        "_iv_new",
        F.when(
            prev_max_end.isNull() | (F.col(start_col) > prev_max_end), 1
        ).otherwise(0),
    )
    return (
        flagged.withColumn(
            "island",
            F.sum("_iv_new")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long"),
        )
        .groupBy(key_col, "island")
        .agg(
            F.min(start_col).alias("start"),
            F.max(end_col).alias("end"),
            F.count(F.lit(1)).alias("n_spans"),
        )
    )
