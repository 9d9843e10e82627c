"""Edge semantics for the round-4 session-3 operators on handcrafted
frames (the registered queries carry the DuckDB oracles at scale):
2-D skyline dominance ties, largest-remainder exactness, GD replay
against a pure-numpy twin, and BFS layers against a pure-Python BFS."""

import numpy as np
from pyspark.sql import functions as F

from market_pulse_data_pipeline_spark.operators.pareto import (
    largest_remainder,
    skyline_2d,
)


def _sky(spark, rows):
    df = spark.createDataFrame(rows, "id bigint, cost bigint, gain bigint")
    return sorted(r.id for r in skyline_2d(df, "cost", "gain").collect())


def test_skyline_basic_dominance(spark):
    # (1) cheapest+biggest dominates everything comparable; (3) is
    # cheaper-but-smaller than (1) → survives; (2) strictly worse → out
    assert _sky(
        spark, [(1, 10, 50), (2, 20, 40), (3, 5, 30)]
    ) == [1, 3]


def test_skyline_equal_cost_tie(spark):
    # same cost: only the max-gain row survives; exact duplicates are
    # mutually non-dominating and BOTH survive
    assert _sky(
        spark, [(1, 10, 50), (2, 10, 40), (3, 10, 50)]
    ) == [1, 3]


def test_skyline_equal_gain_cheaper_wins(spark):
    # equal gain, strictly cheaper → dominates (strict in cost)
    assert _sky(spark, [(1, 5, 50), (2, 10, 50)]) == [1]


def test_skyline_nan_gain_carries_across_ranges(spark):
    # ADVICE r12: Spark orders NaN above every double, so a NaN gain in
    # an early range must propagate through the driver-side carry fold
    # and dominate later-range rows. With n_ranges high enough that the
    # NaN row and its victims land in different ranges, a Python `>`
    # fold (NaN incomparable → never becomes the carry) would let rows
    # 2..4 survive.
    nan = float("nan")
    df = spark.createDataFrame(
        [(1, 1, nan), (2, 10, 5.0), (3, 20, 6.0), (4, 30, 1e300)],
        "id bigint, cost bigint, gain double",
    )
    got = sorted(r.id for r in skyline_2d(df, "cost", "gain", n_ranges=4).collect())
    assert got == [1]


def test_skyline_timestamp_gain_typed_carry(spark):
    # ADVICE r12: carry-in maxima must round-trip in the gain column's
    # actual DataType — a str()/cast round-trip can NULL out timestamp
    # carries (str(datetime) formatting vs Spark's cast-from-string) and
    # silently drop the carry. Row 1's late timestamp must dominate the
    # later-range rows 2 and 3.
    import datetime as dt

    rows = [
        (1, 1, dt.datetime(2026, 1, 1, 12, 0, 0, 123456)),
        (2, 10, dt.datetime(2025, 6, 1)),
        (3, 20, dt.datetime(2025, 7, 1)),
        (4, 30, dt.datetime(2026, 2, 1)),
    ]
    df = spark.createDataFrame(rows, "id bigint, cost bigint, gain timestamp")
    got = sorted(r.id for r in skyline_2d(df, "cost", "gain", n_ranges=4).collect())
    assert got == [1, 4]


def test_largest_remainder_sums_exactly(spark):
    for counts, total in [
        ([("a", 1), ("b", 1), ("c", 1)], 100),  # equal remainders → ties
        ([("a", 218), ("b", 70), ("c", 75), ("d", 64), ("e", 73)], 1000),
        ([("a", 1), ("b", 999999)], 7),  # extreme skew, tiny budget
        ([("a", 3)], 10),  # single stratum takes everything
    ]:
        df = spark.createDataFrame(counts, "k string, n bigint")
        out = largest_remainder(df, "k", "n", total).collect()
        assert sum(r.quota for r in out) == total, (counts, total)
        # proportionality within 1 slot (the largest-remainder bound)
        n_tot = sum(n for _, n in counts)
        for r in out:
            exact = total * dict(counts)[r.k] / n_tot
            assert abs(r.quota - exact) < 1, (r, exact)


def test_gd_matches_numpy_replay(spark, sf_dir):
    from market_pulse_data_pipeline_spark.queries.ml import (
        _GD_ITERS,
        _GD_LR,
        linear_regression_gd,
    )

    row = linear_regression_gd(spark, sf_dir).collect()[0]
    pdf = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select(
            F.col("l_quantity").cast("double").alias("x"),
            F.col("l_extendedprice").cast("double").alias("y"),
        )
        .toPandas()
    )
    x, y = pdf["x"].to_numpy(), pdf["y"].to_numpy()
    w0 = w1 = 0.0
    for _ in range(_GD_ITERS):
        resid = (w0 + w1 * x) - y
        # replicate the decimal snapping: addends to 6dp, avg to 6dp,
        # weights to 6dp (numpy sum order differs, but the snapped
        # decimal sum is order-independent by construction — float64
        # round-off on <1e7 6dp-snapped addends stays far below the
        # final 6dp snap)
        g0 = round(np.sum(np.round(resid, 6)) / len(x), 6)
        g1 = round(np.sum(np.round(resid * x, 6)) / len(x), 6)
        w0 = round(w0 - _GD_LR * g0, 6)
        w1 = round(w1 - _GD_LR * g1, 6)
    assert abs(row.w0 - w0) < 1e-4, (row.w0, w0)
    assert abs(row.w1 - w1) < 1e-4, (row.w1, w1)
    assert row.mse_final < row.mse_initial


def test_bfs_matches_python_replay(spark, sf_dir):
    from collections import deque

    from market_pulse_data_pipeline_spark.queries.mining import (
        _BFS_HOPS,
        _BFS_MIN_W,
        _BFS_SEED,
        _TRI_MOD,
        graph_bfs_k_hop,
    )

    got = {
        r.node: r.dist for r in graph_bfs_k_hop(spark, sf_dir).collect()
    }
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", (F.col("l_partkey") % _TRI_MOD).alias("node"))
        .distinct()
        .toPandas()
    )
    from collections import defaultdict

    baskets = defaultdict(set)
    for r in li.itertuples():
        baskets[r.l_orderkey].add(r.node)
    w = defaultdict(int)
    for nodes in baskets.values():
        ns = sorted(nodes)
        for i, u in enumerate(ns):
            for v in ns[i + 1 :]:
                w[(u, v)] += 1
    adj = defaultdict(set)
    for (u, v), c in w.items():
        if c >= _BFS_MIN_W:
            adj[u].add(v)
            adj[v].add(u)
    dist = {_BFS_SEED: 0}
    dq = deque([_BFS_SEED])
    while dq:
        u = dq.popleft()
        if dist[u] >= _BFS_HOPS:
            continue
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                dq.append(v)
    assert got == dist


def test_largest_remainder_all_zero_counts_splits_evenly(spark):
    # degenerate all-zero counts: proportionality undefined, so the
    # budget splits evenly — total DIV n_keys each, first total % n_keys
    # keys (ascending) take the extra unit; exact-sum contract holds
    # for totals larger than the key count (the case the old
    # remainder-only fallback silently violated)
    from pyspark.sql import Row

    df = spark.createDataFrame([Row(k=c, n=0) for c in "abc"])
    out = {r.k: r.quota for r in largest_remainder(df, "k", "n", 100).collect()}
    assert out == {"a": 34, "b": 33, "c": 33}
    assert sum(out.values()) == 100
    out2 = {r.k: r.quota for r in largest_remainder(df, "k", "n", 2).collect()}
    assert out2 == {"a": 1, "b": 1, "c": 0}
