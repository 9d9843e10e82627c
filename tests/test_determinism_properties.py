"""Property-based tests (hypothesis) for the cross-engine numeric-
determinism helpers every hash-checked oracle rests on (queries/common):

- round_div: Spark's decimal-routed quotient must equal DuckDB's
  byte-for-byte — including the power-of-two-denominator rounding-tie
  hazard the helper exists to defuse, negatives, and NULL on /0.
- exact_sum / round_sum: the decimal-snapped sum must be partition-
  order-independent (repartitioning can never change the hash) and
  equal DuckDB's.
- interval merge: islands must partition the spans with correct
  coverage vs a pure-Python sweep (fuzzed spans incl. containment and
  touching boundaries).
- skyline: windowed form ≡ brute-force dominance on fuzzed point sets.
- largest-remainder: exact-total + within-1-slot proportionality on
  fuzzed count vectors.
- as-of join: ≡ pandas merge_asof(direction='backward') on fuzzed
  multi-key event sets.
"""

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from market_pulse_data_pipeline_spark.operators.intervals import (
    merge_maximal_intervals,
)
from market_pulse_data_pipeline_spark.queries.common import (
    exact_sum,
    round_div,
    round_sum,
    sql_round_div,
    sql_round_sum,
)

# 2-decimal fixed-point values scaled to ints (the fixture's money/
# quantity shape), plus power-of-two denominators to force the decimal
# rounding-tie path round_div exists for.
CENTS = st.integers(min_value=-10_000_000, max_value=10_000_000)
POW2 = st.sampled_from([1, 2, 4, 8, 16, 32, 64, 128, 256, 1024])
# zero denominators excluded: under ANSI mode Spark RAISES on /0 (even
# for doubles) while DuckDB yields inf — which is why every registered
# round_div caller guards zero with NULLIF; pinned explicitly below.
DENOM = st.one_of(
    CENTS.filter(lambda c: c != 0), POW2.map(lambda p: p * 100)
)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pairs=st.lists(st.tuples(CENTS, DENOM), min_size=1, max_size=50))
def test_round_div_matches_duckdb(spark, pairs):
    rows = [(i, n, d) for i, (n, d) in enumerate(pairs)]
    sdf = spark.createDataFrame(rows, "id int, nc long, dc long")
    numer = F.col("nc").cast("decimal(18,2)") / 100
    denom = F.col("dc").cast("decimal(18,2)") / 100
    got = (
        sdf.select(
            "id",
            round_div(numer.cast("double"), denom.cast("double"), 4).alias("q"),
        )
        .toPandas()
        .set_index("id")["q"]
        .sort_index()
    )
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["id", "nc", "dc"]))
    expr = sql_round_div(
        "CAST(CAST(nc AS DECIMAL(18,2)) / 100 AS DOUBLE)",
        "CAST(CAST(dc AS DECIMAL(18,2)) / 100 AS DOUBLE)",
        4,
    )
    want = (
        con.execute(f"SELECT id, {expr} AS q FROM t ORDER BY id")
        .df()
        .set_index("id")["q"]
    )
    for i in got.index:
        assert got[i] == want[i], (i, rows[i], got[i], want[i])


def test_round_div_zero_denominator_raises_ansi(spark):
    # the contract every caller guards with NULLIF: ANSI Spark raises
    # on /0 rather than silently diverging from DuckDB's IEEE inf
    import pytest
    from pyspark.errors.exceptions.captured import ArithmeticException

    df = spark.createDataFrame([(1.0, 0.0)], "n double, d double")
    with pytest.raises(ArithmeticException):
        df.select(round_div(F.col("n"), F.col("d"), 4)).collect()


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=st.lists(CENTS, min_size=1, max_size=200),
       nparts=st.sampled_from([1, 3, 8]))
def test_exact_sum_partition_order_independent(spark, vals, nparts):
    rows = [(i, v) for i, v in enumerate(vals)]
    sdf = spark.createDataFrame(rows, "id int, vc long")
    col = (F.col("vc").cast("decimal(18,2)") / 100).cast("double")
    a = sdf.agg(exact_sum(col, 6).alias("s"),
                round_sum(col, 6, 2).alias("r")).collect()[0]
    b = (
        sdf.repartition(nparts, "id")
        .agg(exact_sum(col, 6).alias("s"), round_sum(col, 6, 2).alias("r"))
        .collect()[0]
    )
    assert (a.s, a.r) == (b.s, b.r)
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["id", "vc"]))
    expr = "CAST(CAST(vc AS DECIMAL(18,2)) / 100 AS DOUBLE)"
    w = con.execute(
        f"SELECT CAST(SUM(CAST({expr} AS DECIMAL(20,6))) AS DOUBLE) AS s,"
        f" {sql_round_sum(expr, 6, 2)} AS r FROM t"
    ).fetchone()
    assert (a.s, a.r) == w


SPANS = st.lists(
    st.tuples(st.integers(0, 100), st.integers(0, 40)),  # (start, length)
    min_size=1,
    max_size=40,
)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(spans=SPANS)
def test_interval_merge_matches_python_sweep(spark, spans):
    rows = [(1, s, s + ln, i) for i, (s, ln) in enumerate(spans)]
    df = spark.createDataFrame(rows, "k bigint, s bigint, e bigint, id bigint")
    got = sorted(
        (r.start, r.end, r.n_spans)
        for r in merge_maximal_intervals(df, "k", "s", "e", "id").collect()
    )
    # pure-Python sweep: sort by start, merge overlap-or-touch
    want = []
    for s, e in sorted((s, s + ln) for s, ln in spans):
        if want and s <= want[-1][1]:
            want[-1][1] = max(want[-1][1], e)
            want[-1][2] += 1
        else:
            want.append([s, e, 1])
    assert got == sorted((s, e, n) for s, e, n in want)


PTS = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)),  # (cost, gain)
    min_size=1,
    max_size=40,
)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pts=PTS)
def test_skyline_matches_bruteforce(spark, pts):
    from market_pulse_data_pipeline_spark.operators.pareto import skyline_2d

    rows = [(i, c, g) for i, (c, g) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id bigint, cost bigint, gain bigint")
    got = sorted(r.id for r in skyline_2d(df, "cost", "gain").collect())
    want = sorted(
        i
        for i, (c, g) in enumerate(pts)
        if not any(
            (c2 <= c and g2 >= g and (c2 < c or g2 > g))
            for (c2, g2) in pts
        )
    )
    assert got == want, (pts, got, want)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    counts=st.lists(st.integers(1, 10_000), min_size=1, max_size=12),
    total=st.integers(1, 5_000),
)
def test_largest_remainder_invariants(spark, counts, total):
    from market_pulse_data_pipeline_spark.operators.pareto import (
        largest_remainder,
    )

    rows = [(f"k{i:02d}", n) for i, n in enumerate(counts)]
    df = spark.createDataFrame(rows, "k string, n bigint")
    out = {r.k: r.quota for r in largest_remainder(df, "k", "n", total).collect()}
    assert sum(out.values()) == total
    n_tot = sum(counts)
    for k, n in rows:
        assert abs(out[k] - total * n / n_tot) < 1, (counts, total, out)


EVENTS = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 50)),  # (key, time)
    min_size=1,
    max_size=30,
)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(left=EVENTS, right=EVENTS)
def test_asof_join_matches_pandas_merge_asof(spark, left, right):
    from market_pulse_data_pipeline_spark.operators.asof import asof_join

    lrows = [(k, t, i) for i, (k, t) in enumerate(left)]
    # asof requires the right side unique per (key, time) — dedup the
    # generated rows the way callers must (dedup_keep_latest)
    rmap = {}
    for i, (k, t) in enumerate(right):
        rmap[(k, t)] = float(i)
    rrows = [(k, t, v) for (k, t), v in rmap.items()]
    ldf = spark.createDataFrame(lrows, "k bigint, t bigint, lid bigint")
    rdf = spark.createDataFrame(rrows, "k bigint, t bigint, v double")
    got = {
        r.lid: r.asof_v
        for r in asof_join(
            ldf, rdf, key="k", left_time="t", right_time="t",
            payload_cols=["v"],
        ).collect()
    }
    lpd = pd.DataFrame(lrows, columns=["k", "t", "lid"]).sort_values("t")
    rpd = pd.DataFrame(rrows, columns=["k", "t", "v"]).sort_values("t")
    m = pd.merge_asof(lpd, rpd, on="t", by="k", direction="backward")
    want = {
        int(r.lid): (None if pd.isna(r.v) else r.v) for r in m.itertuples()
    }
    assert got == want, (lrows, rrows, got, want)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=st.lists(CENTS, min_size=1, max_size=120),
       nranges=st.sampled_from([1, 3, 8]))
def test_two_phase_prefix_sum_matches_serial(spark, vals, nranges):
    from pyspark.sql import Window

    from market_pulse_data_pipeline_spark.functions.prefix import (
        partitioned_prefix_sum,
    )

    rows = [(i, v) for i, v in enumerate(vals)]
    sdf = spark.createDataFrame(rows, "event_id int, vc long")
    col = (F.col("vc").cast("decimal(18,2)") / 100).cast("double")
    sdf = sdf.withColumn("value", col)
    got = {
        r.event_id: r.running_total
        for r in partitioned_prefix_sum(
            sdf, ["event_id"], F.col("value"), n_ranges=nranges
        ).collect()
    }
    w = Window.orderBy("event_id").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r.event_id: r.rt
        for r in sdf.select(
            "event_id",
            F.sum(F.col("value").cast("decimal(38,6)"))
            .over(w)
            .alias("rt"),
        ).collect()
    }
    # both sides are exact decimal accumulations → must agree exactly
    assert {k: float(v) for k, v in got.items()} == {
        k: float(v) for k, v in want.items()
    }, (vals, nranges)
