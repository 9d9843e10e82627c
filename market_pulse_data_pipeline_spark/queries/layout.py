"""Data-layout evidence queries: Z-order vs single-key clustering.

Registers the relational core of operators/layout.py as a hash-checked
row: bucket lineitem rows by (a) the Morton interleave of two key
dimensions and (b) a lexical single-key range, and emit each bucket's
bounding box over both dimensions. The z-order buckets bound BOTH
dimensions (~sqrt coverage each); the lexical buckets bound only their
sort key and span the full range of the other — which is exactly why a
second-dimension filter prunes z-ordered files but not single-sorted
ones. tests/test_layout.py turns the boxes into a measured pruning
ratio for a fixed y-band filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from market_pulse_data_pipeline_spark.operators.layout import (
    morton_code,
    sql_morton_code,
)
from market_pulse_data_pipeline_spark.queries.common import register, t

_BITS = 8  # 256x256 grid
_ZSHIFT = 11  # 2^16 codes / 2^11 = 32 z-buckets
_LEXSHIFT = 3  # 256 x-values / 2^3 = 32 lexical buckets


@register(
    "zorder_locality_boxes",
    f"""
    WITH grid AS (
      SELECT (l_partkey % 256) AS x, (l_suppkey % 256) AS y
      FROM lineitem
    ),
    coded AS (
      SELECT x, y,
             ({sql_morton_code('x', 'y', _BITS)} >> {_ZSHIFT}) AS zbucket,
             (x >> {_LEXSHIFT}) AS lexbucket
      FROM grid
    )
    SELECT 'zorder' AS scheme, zbucket AS bucket, COUNT(*) AS n,
           MIN(x) AS min_x, MAX(x) AS max_x,
           MIN(y) AS min_y, MAX(y) AS max_y
    FROM coded GROUP BY zbucket
    UNION ALL
    SELECT 'lexical' AS scheme, lexbucket AS bucket, COUNT(*) AS n,
           MIN(x) AS min_x, MAX(x) AS max_x,
           MIN(y) AS min_y, MAX(y) AS max_y
    FROM coded GROUP BY lexbucket
    """,
    doc="per-bucket (min,max) bounding boxes over two key dimensions "
    "under Z-order vs lexical clustering of lineitem (l_partkey, "
    "l_suppkey mod 256). Pure integer shift/mask arithmetic, one "
    "aggregate per scheme. operators/layout.py holds the write-side "
    "(repartitionByRange on the code + sortWithinPartitions).",
)
def zorder_locality_boxes(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    grid = li.select(
        (F.col("l_partkey") % 256).alias("x"),
        (F.col("l_suppkey") % 256).alias("y"),
    )
    coded = grid.select(
        "x",
        "y",
        F.shiftright(morton_code(F.col("x"), F.col("y"), _BITS), _ZSHIFT).alias(
            "zbucket"
        ),
        F.shiftright(F.col("x"), _LEXSHIFT).alias("lexbucket"),
    )

    def boxes(bucket_col: str, scheme: str) -> DataFrame:
        return coded.groupBy(bucket_col).agg(
            F.count(F.lit(1)).alias("n"),
            F.min("x").alias("min_x"),
            F.max("x").alias("max_x"),
            F.min("y").alias("min_y"),
            F.max("y").alias("max_y"),
        ).select(
            F.lit(scheme).alias("scheme"),
            F.col(bucket_col).alias("bucket"),
            "n",
            "min_x",
            "max_x",
            "min_y",
            "max_y",
        )

    return boxes("zbucket", "zorder").unionByName(boxes("lexbucket", "lexical"))
