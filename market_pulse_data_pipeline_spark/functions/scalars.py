"""Scalar expression helpers — the reference's complete scalar surface.

SURVEY.md §2.2: casts, CASE/IN, arithmetic, ROUND, NULLIF, DATE_TRUNC,
CURRENT_TIMESTAMP, JSON path access, plus the ingest-time symbol
normalization map. Everything is a Column→Column function built from
``pyspark.sql.functions`` so it stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# The reference's normalization map (get_stock.py:30-32): provider form of
# BRK.B is BRK-B; identity for everything else.
SYMBOL_NORMALIZATION = {"BRK.B": "BRK-B"}


def normalize_symbol_col(col: Column) -> Column:
    """P11 — dict lookup with identity default, as a CASE chain (the map is
    tiny and literal, so a broadcast join would be overkill)."""
    expr = col
    for src, dst in SYMBOL_NORMALIZATION.items():
        expr = F.when(col == F.lit(src), F.lit(dst)).otherwise(expr)
    return expr


def nullif_zero(col: Column) -> Column:
    """P9 — NULLIF(x, 0) divide-by-zero guard (fact_stock_prices.sql:21)."""
    return F.nullif(col, F.lit(0))


def pct_change(close: Column, open_: Column) -> Column:
    """P7/P8/P9 — ROUND(((close-open)/NULLIF(open,0))*100, 2)
    (fact_stock_prices.sql:21)."""
    return F.round((close - open_) / nullif_zero(open_) * 100.0, 2)


def week_start(date_col: Column) -> Column:
    """A3 — DATE_TRUNC('week', d) with Snowflake-default Monday start,
    returned as DATE (Spark's date_trunc returns TIMESTAMP; SURVEY §2.7-e)."""
    return F.date_trunc("week", date_col).cast("date")


def longest_run_count(array_sql: str) -> Column:
    """Mode COUNT of an array, computed map-side: array_sort then one
    aggregate() fold tracking the longest equal run. Per-row arrays are
    per-document by definition for every consumer (token mode, n-gram
    mode), so this replaces an explode + groupBy(doc, value) shuffle
    with zero exchanges; memory is bounded by the longest row's array.
    ``array_sql`` is a Spark-SQL expression string yielding
    array<string>; returns NULL on an empty/NULL array (callers guard
    with CASE where that can occur)."""
    return F.expr(
        f"""
        aggregate(
          array_sort({array_sql}),
          named_struct('prev', CAST(NULL AS STRING), 'run', 0, 'best', 0),
          (acc, x) -> named_struct(
            'prev', x,
            'run', IF(x <=> acc.prev, acc.run + 1, 1),
            'best', GREATEST(acc.best, IF(x <=> acc.prev, acc.run + 1, 1))),
          acc -> acc.best)
        """
    )
