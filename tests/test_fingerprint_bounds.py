"""table_fingerprint_orders overflow audit.

The oracle's ``sum_fp`` is CAST to BIGINT so DuckDB's pandas path
(`.df()`, the driver's canonicalizer input) carries int64 — but the sum
must ALSO stay below 2^53 so that any float64 round-trip (a pandas
canonicalizer that coerces, a JSON serializer, ...) cannot silently
lose precision. Each term is ``h % 1_000_000_007 <= 1e9+6``, so the sum
is bounded by ``n_rows * (1e9 + 6)``: safe through sf1 (~1.5M orders →
~1.5e15 < 2^53 ≈ 9.0e15) and checked here both analytically and
empirically at sf0.1.
"""

import os

import pytest

TWO_53 = 1 << 53
MOD = 1_000_000_007
SF01 = "/root/testdata/sf0.1"


@pytest.mark.skipif(not os.path.isdir(SF01), reason="sf0.1 data absent")
def test_sum_fp_below_2_53_at_sf01(spark):
    from market_pulse_data_pipeline_spark.queries.incremental import (
        table_fingerprint_orders,
    )

    row = table_fingerprint_orders(spark, SF01).collect()[0]
    assert 0 < row.sum_fp < TWO_53
    # analytic headroom: worst-case sum for this rowcount is still exact
    # in float64, with >50x margin at this scale factor
    assert row.n_rows * (MOD - 1) < TWO_53


def test_analytic_bound_through_sf1():
    # sf1 TPC-H has 1.5M orders; the worst-case modular sum stays exact
    # in float64 through that scale (and through ~9M rows in general)
    assert 1_500_000 * (MOD - 1) < TWO_53
