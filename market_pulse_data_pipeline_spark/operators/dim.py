"""dim_stock — DISTINCT + CASE mappings (reference operators J4, P5, P6).

Reference: ``dbt_finance/models/marts/dim_stock.sql:3-30``. The CASE
chains are reproduced *as written*, including the §2.7-a quirk: the
``WHEN symbol = 'BRK.B'`` branch can never match post-load data (the
loaded form is ``BRK-B``), so Berkshire rows get 'Unknown Company' /
'Other'. That is the reference's actual behavior and it is preserved.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# dim_stock.sql:10-22 — 10 branches + ELSE 'Unknown Company', verbatim
# (branch order, exact strings incl. commas).
COMPANY_NAME_CASES = [
    ("AAPL", "Apple Inc."),
    ("MSFT", "Microsoft Corporation"),
    ("GOOGL", "Alphabet Inc."),
    ("AMZN", "Amazon.com, Inc."),
    ("META", "Meta Platforms, Inc."),
    ("NVDA", "NVIDIA Corporation"),
    ("TSLA", "Tesla, Inc."),
    ("NFLX", "Netflix, Inc."),
    ("BRK.B", "Berkshire Hathaway Inc."),  # dead branch, preserved (§2.7-a)
    ("JPM", "JPMorgan Chase & Co."),
]

# dim_stock.sql:24-29 — IN-list sector mapping + ELSE 'Other', verbatim.
SECTOR_CASES = [
    (["AAPL", "MSFT", "GOOGL", "META", "NVDA", "TSLA", "NFLX"], "Technology"),
    (["BRK.B", "JPM"], "Financials"),  # BRK.B dead branch, preserved (§2.7-a)
    (["AMZN"], "Consumer Discretionary"),
]


def company_name_col(symbol: Column) -> Column:
    expr = F.lit("Unknown Company")
    for sym, name in reversed(COMPANY_NAME_CASES):
        expr = F.when(symbol == sym, name).otherwise(expr)
    return expr


def sector_col(symbol: Column) -> Column:
    expr = F.lit("Other")
    for syms, sector in reversed(SECTOR_CASES):
        expr = F.when(symbol.isin(syms), sector).otherwise(expr)
    return expr


def build_dim_stock(stg: DataFrame) -> DataFrame:
    """DISTINCT symbols seed the dimension (dim_stock.sql:3-6), then the
    two CASE mappings. The distinct is a hash aggregate over a tiny key
    domain — map-side partial aggregation makes it cheap at any scale."""
    symbols = stg.select("symbol").distinct()
    return symbols.select(
        "symbol",
        company_name_col(F.col("symbol")).alias("company_name"),
        sector_col(F.col("symbol")).alias("sector"),
    )
