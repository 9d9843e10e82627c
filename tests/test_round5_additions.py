"""Round-5 additions: Misra-Gries heavy hitters (sketch-propose,
exact-verify), top-p vocabulary coverage, and reciprocal-rank fusion.

Each test pins the operator's defining contract on contrived inputs
where the expected answer is computable by hand — the sf-data oracle
equivalence is covered separately by tools/check_oracle.py.
"""

from collections import Counter

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from market_pulse_data_pipeline_spark.functions.heavyhitters import (
    misra_gries_candidates,
)


# ---------------------------------------------------------------- MG --
def _stream(spark, values, partitions):
    return spark.createDataFrame(
        [Row(token=v) for v in values]
    ).repartition(partitions)


@pytest.mark.parametrize("partitions", [1, 3, 8])
def test_mg_candidates_contain_every_heavy_hitter(spark, partitions):
    # 1000 items: 'a' x 400, 'b' x 300, tail of 300 distinct singletons.
    # With k = 5 the threshold is n/k = 200: {a, b} are heavy.
    values = ["a"] * 400 + ["b"] * 300 + [f"t{i}" for i in range(300)]
    cand = set(
        r.token
        for r in misra_gries_candidates(
            _stream(spark, values, partitions), "token", 5
        ).collect()
    )
    assert {"a", "b"} <= cand
    # |summary| <= (k-1) per partition
    assert len(cand) <= 4 * partitions


@pytest.mark.parametrize("partitions", [1, 4])
def test_mg_verified_result_is_partitioning_independent(spark, partitions):
    values = ["x"] * 50 + ["y"] * 30 + ["z"] * 15 + list("abcde")
    k = 4  # threshold 100/4 = 25: {x, y} qualify, z (15) does not
    tok = _stream(spark, values, partitions)
    cand = misra_gries_candidates(tok, "token", k)
    n_total = len(values)
    got = {
        r.token: r.n
        for r in (
            tok.join(F.broadcast(cand), "token", "left_semi")
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") * k > n_total)
            .collect()
        )
    }
    exact = {
        t: c for t, c in Counter(values).items() if c * k > n_total
    }
    assert got == exact == {"x": 50, "y": 30}


def test_mg_rejects_degenerate_k(spark):
    with pytest.raises(ValueError):
        misra_gries_candidates(_stream(spark, ["a"], 1), "token", 1)


# ------------------------------------------------------------- top-p --
def test_top_p_first_crossing_row_is_included(spark, sf_dir):
    # Re-run the registered query's window logic on a contrived
    # frequency profile: counts 50/30/15/5 (total 100), p = 90 keeps
    # exactly the prefix {50, 30, 15}: before-mass 0, 50, 80 < 90 but
    # the fourth row's before-mass 95 is not.
    from market_pulse_data_pipeline_spark.queries.corpus import (
        vocab_top_p_coverage,
    )

    docs = spark.createDataFrame(
        [
            Row(
                doc_id=0,
                lang="xx",
                text=" ".join(
                    ["w1"] * 50 + ["w2"] * 30 + ["w3"] * 15 + ["w4"] * 5
                ),
            )
        ]
    )
    tok = docs.select(
        "lang", F.explode(F.split("text", " ")).alias("token")
    ).filter(F.col("token") != "")
    from pyspark.sql import Window

    c = tok.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), "token")
    cum_before = F.coalesce(
        F.sum("n").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    tot = F.sum("n").over(Window.partitionBy("lang"))
    kept = (
        c.select("token", cum_before.alias("cb"), tot.alias("tot"))
        .filter(F.lit(100) * F.col("cb") < 90 * F.col("tot"))
        .collect()
    )
    assert sorted(r.token for r in kept) == ["w1", "w2", "w3"]
    # the registered query itself runs green on the fixture tables
    out = vocab_top_p_coverage(spark, sf_dir)
    assert out.columns == ["lang", "token", "n", "rnk"]
    rows = out.collect()
    assert len(rows) > 0
    # per lang, kept ranks are a contiguous prefix 1..m
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r.rnk)
    for lang, rnks in by_lang.items():
        assert sorted(rnks) == list(range(1, len(rnks) + 1)), lang


# --------------------------------------------------------------- RRF --
def test_rrf_fusion_rewards_agreement(spark, sf_dir):
    from market_pulse_data_pipeline_spark.queries.relevance import (
        _RRF_K,
        _RRF_SCALE,
        rrf_hybrid_fusion,
    )

    out = rrf_hybrid_fusion(spark, sf_dir)
    rows = out.collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        expected = 0
        if r.rank_uni > 0:
            expected += _RRF_SCALE // (_RRF_K + r.rank_uni)
        if r.rank_bi > 0:
            expected += _RRF_SCALE // (_RRF_K + r.rank_bi)
        # contribution formula holds row by row (absent list -> 0)
        assert r.rrf_scaled == expected
        assert r.doc_id != 0  # the query doc never retrieves itself
    # descending by fused score with doc_id tiebreak
    key = [(-r.rrf_scaled, r.doc_id) for r in rows]
    assert key == sorted(key)


# ------------------------------------------------- MG fold property --
from hypothesis import given, settings
from hypothesis import strategies as st

from market_pulse_data_pipeline_spark.functions.heavyhitters import mg_fold

_ITEMS = st.integers(min_value=0, max_value=30).map(lambda i: f"i{i}")


@settings(max_examples=150, deadline=None)
@given(
    stream=st.lists(_ITEMS, min_size=1, max_size=400),
    k=st.integers(min_value=2, max_value=12),
    n_batches=st.integers(min_value=1, max_value=7),
)
def test_mg_fold_superset_and_size_invariants(stream, k, n_batches):
    # split the stream into arbitrary contiguous batches and fold
    counters = Counter()
    step = max(1, len(stream) // n_batches)
    for i in range(0, len(stream), step):
        batch = Counter(stream[i : i + step])
        counters = mg_fold(counters, dict(batch), k)
    exact = Counter(stream)
    n = len(stream)
    # summary never exceeds k-1 counters
    assert len(counters) <= k - 1
    # every true heavy hitter (count > n/k) survives the fold
    heavy = {t for t, c in exact.items() if c * k > n}
    assert heavy <= set(counters)
    # estimates never overcount and undercount by at most n/k
    for t, c in counters.items():
        assert c <= exact[t]
        assert exact[t] - c <= n / k


# ------------------------------------- quantization parity (fuzzed) --
import duckdb

from market_pulse_data_pipeline_spark.functions.clustering import (
    SNAP_SCALE,
    quantize_vec_py,
)

_PARITY_CON = duckdb.connect()


@settings(max_examples=60, deadline=None)
@given(
    xs=st.lists(
        st.one_of(
            st.floats(
                min_value=-10.0,
                max_value=10.0,
                allow_nan=False,
                allow_infinity=False,
            ),
            # exact decimal-half boundary values: k.5 / SCALE —
            # the HALF_UP-vs-float-path divergence candidates
            st.integers(min_value=-2 * SNAP_SCALE, max_value=2 * SNAP_SCALE).map(
                lambda k: (k + 0.5) / SNAP_SCALE
            ),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_quantize_vec_py_matches_duckdb_round(xs):
    # every new oracle (LSH sigs, IVF probe, PQ/ADC tables) hinges on
    # the driver-side Decimal HALF_UP quantization agreeing with the
    # oracle-side round(x * scale) — fuzz that pair directly, one
    # vectorized query per example, including exact halfway points
    # where rounding modes diverge
    got = quantize_vec_py(xs)
    exp = [
        r[0]
        for r in _PARITY_CON.execute(
            f"SELECT CAST(round(CAST(t.x AS DOUBLE) * {SNAP_SCALE}) AS BIGINT)"
            " FROM (SELECT UNNEST(?) AS x, UNNEST(range(len(?))) AS i) t"
            " ORDER BY t.i",
            [xs, xs],
        ).fetchall()
    ]
    assert got == exp, f"first divergence: {next((x, g, e) for x, g, e in zip(xs, got, exp) if g != e)}"


def test_quantize_vec_py_matches_spark_round(spark):
    # third leg of the parity triangle: executor-side F.round
    # quantization on an adversarial batch (exact decimal halves,
    # negatives, subnormal-ish magnitudes) equals the driver-side
    # Decimal HALF_UP twin
    vals = (
        [(k + 0.5) / SNAP_SCALE for k in range(-5, 6)]
        + [0.0, -0.0, 1e-9, -1e-9, 3.1415926535, -2.7182818284]
        + [(k + 0.5) / SNAP_SCALE for k in (999_999, -999_999, 123_456)]
    )
    df = spark.createDataFrame([Row(embedding=vals)])
    got = quantize_vec_py(vals)
    row = df.select(
        F.transform(
            "embedding",
            lambda x: F.round(x.cast("double") * SNAP_SCALE).cast("long"),
        ).alias("q")
    ).head()
    assert list(row.q) == got
