"""As-of join — "latest right row at or before each left row's time" —
the canonical time-series enrichment operator (quote-at-trade-time,
state-at-event-time). Spark has no native ASOF JOIN; the naive
range-condition join explodes into a broadcast-nested-loop or an
O(n·m) per-key comparison.

Spark-first implementation (the scalable merge-asof pattern): tag both
sides, UNION them, and run ONE window pass per key ordered by
(time, side) with ``last(value, ignorenulls=True)`` — every left row
picks up the most recent right payload. Cost: a single shuffle on the
key, linear scan within each key partition, no join blow-up. At 100 TB
this is the same shape as a sort-merge join the engine would need
anyway, minus the pairwise matching.

Semantics (backward as-of, inclusive): for each left row, the right row
with the greatest ``right_time <= left_time`` for the same key; NULL
payload when no such row. The right side must be unique per
(key, time) — enforce upstream (``dedup_keep_latest``) for
deterministic results, as any as-of semantics requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "_asof_side"  # 0 = right (sorts first at equal times), 1 = left


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
    payload_prefix: str = "asof_",
) -> DataFrame:
    """Backward inclusive as-of join.

    Returns every ``left`` row plus ``payload_prefix + c`` for each
    payload column of the matching right row (NULL when no right row is
    at or before the left time).
    """
    left_cols = [c for c in left.columns]
    tagged_left = left.select(
        F.col(key).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias(_SIDE),
        *[F.col(c).alias(f"_l_{c}") for c in left_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in payload_cols],
    )
    tagged_right = right.select(
        F.col(key).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias(_SIDE),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in left_cols],
        *[F.col(c).alias(f"_r_{c}") for c in payload_cols],
    )
    combined = tagged_left.unionByName(tagged_right)
    # right rows sort before left rows at equal time → inclusive (<=)
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", _SIDE)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = combined.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_f_{c}")
            for c in payload_cols
        ],
    )
    return filled.filter(F.col(_SIDE) == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in left_cols],
        *[F.col(f"_f_{c}").alias(f"{payload_prefix}{c}") for c in payload_cols],
    )


def range_join_buckets(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
) -> DataFrame:
    """Interval-containment join (point ∈ [start, end)) without the
    cartesian trap: both sides are expanded to fixed-width buckets and
    equi-joined on the bucket id, so only co-bucketed rows are compared.

    The naive ``points JOIN intervals ON p >= s AND p < e`` has no equi
    condition — Spark plans a broadcast-nested-loop (O(n·m)). Bucketing
    turns it into a hash join with per-bucket fan-out
    ``ceil(interval_len / bucket_width) + 1``; choose ``bucket_width``
    near the typical interval length. Equivalent output, verified by the
    oracle's plain range-predicate join.
    """
    p_b = points.withColumn("_b", (F.col(point_col) / bucket_width).cast("long"))
    iv = intervals.withColumn(
        "_bs",
        F.sequence(
            (F.col(start_col) / bucket_width).cast("long"),
            (F.col(end_col) / bucket_width).cast("long"),
        ),
    ).withColumn("_b", F.explode("_bs")).drop("_bs")
    return (
        p_b.join(iv, "_b")
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) < F.col(end_col))
        )
        .drop("_b")
    )
