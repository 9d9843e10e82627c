"""Z-order layout (operators/layout.py, queries/layout.py): the
bounding boxes must translate into real two-dimensional pruning.

Runs at sf0.01: sf0.001 has only 10 suppliers, which degenerates the
y dimension of the (l_partkey, l_suppkey) grid.
"""

import tempfile

from pyspark.sql import functions as F

from market_pulse_data_pipeline_spark.operators.layout import (
    write_zorder_sorted,
)
from market_pulse_data_pipeline_spark.queries.layout import (
    zorder_locality_boxes,
)

SF = "/root/testdata/sf0.01"


def test_zorder_buckets_prune_second_dimension(spark):
    rows = zorder_locality_boxes(spark, SF).collect()
    lo, hi = 32, 63  # probe filter: a 32-wide band on y (l_suppkey side)

    def overlapping(scheme):
        byscheme = [r for r in rows if r["scheme"] == scheme]
        hit = [r for r in byscheme if r["max_y"] >= lo and r["min_y"] <= hi]
        return len(hit), len(byscheme)

    z_hit, z_all = overlapping("zorder")
    lex_hit, lex_all = overlapping("lexical")
    # lexical buckets are clustered on x only: every bucket spans the
    # full y range, so a y filter prunes nothing
    assert lex_hit == lex_all
    # z-order buckets bound y too: most miss the band entirely
    assert z_hit < z_all
    assert z_hit / z_all <= 0.75


def test_write_zorder_sorted_bounds_both_dims_per_file(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_partkey", "l_suppkey"
    )
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/zsorted"
        write_zorder_sorted(li, path, "l_partkey", "l_suppkey", n_files=16)
        back = spark.read.parquet(path).withColumn("f", F.input_file_name())
        grid = back.select(
            "f",
            (F.col("l_partkey") % 256).alias("x"),
            (F.col("l_suppkey") % 256).alias("y"),
        )
        gx, gy = grid.agg(
            (F.max("x") - F.min("x")).alias("gx"),
            (F.max("y") - F.min("y")).alias("gy"),
        ).first()
        spans = (
            grid.groupBy("f")
            .agg(
                (F.max("x") - F.min("x")).alias("x_span"),
                (F.max("y") - F.min("y")).alias("y_span"),
            )
            .collect()
        )
        assert len(spans) > 4
        # per-file spans must be materially tighter than the global range
        # on BOTH dimensions — single-key sorting can only achieve one.
        avg_x = sum(r["x_span"] for r in spans) / len(spans)
        avg_y = sum(r["y_span"] for r in spans) / len(spans)
        assert avg_x < gx * 0.6
        assert avg_y < gy * 0.6
        # row counts preserved
        assert back.count() == li.count()
