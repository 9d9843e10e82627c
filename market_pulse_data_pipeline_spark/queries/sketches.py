"""Mergeable-sketch and deterministic-sampling operators.

At 100 TB, exact global statistics are often the wrong first tool:
distinct counts, frequency tables, and weighted samples are usually
wanted as small mergeable summaries that flow through one partial
aggregation instead of a full shuffle of raw keys. This module adds
the classic sketch family in portable form — every hash is the
md5-derived 60-bit ``portable_hash60`` (functions/dedup.py), so the
sketch CONTENTS are bit-identical in Spark and DuckDB and the oracle
checks the sketch itself, not just a tolerance band:

- KMV (k-minimum-values) distinct sketch: the k smallest hash values
  of a key column; estimate = (k-1) * 2^60 / kth_min. Mergeable by
  taking the k smallest of a union — exactly what Spark's
  TakeOrderedAndProject computes per-partition then merges.
- Count-min sketch: d x w counter matrix; per-key estimate is the min
  over d hashed buckets, never an underestimate. The counter build is
  one map-side-combinable aggregation over (row, bucket) — d*w cells
  total regardless of input size.
- Deterministic weighted (length-biased) sampling: priority
  hash(id)/weight, k smallest per stratum — the RNG-free analogue of
  weighted reservoir sampling; one window per stratum.
- Bigram inverse-frequency fluency score: a language-model-shaped
  quality signal (mean 1/p(w2|w1) under the corpus bigram MLE) built
  from two token-keyed aggregations + joins; no Python in the loop.

None of these exist in the reference (its corpus is 10 stock symbols;
see SURVEY §2.6) — they are north-star training-data-pipeline
operators in the sense of BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from market_pulse_data_pipeline_spark.functions.dedup import portable_hash60
from market_pulse_data_pipeline_spark.functions.heavyhitters import (
    misra_gries_candidates,
)
from market_pulse_data_pipeline_spark.queries.common import (
    register,
    round_div,
    sql_round_div,
    t,
)

_KMV_K = 256
_CM_D = 4  # count-min hash rows
_CM_W = 64  # count-min buckets per row
_WS_K = 20  # weighted-sample size per stratum

# SQL twin of functions.dedup.portable_hash60: first 15 md5 hex digits
# of the UTF-8 string, as a 60-bit BIGINT.
_SQL_H60 = "('0x' || substring(md5({expr}), 1, 15))::BIGINT"


@register(
    "kmv_distinct_partkeys",
    f"""
    WITH hashes AS (
      SELECT DISTINCT {_SQL_H60.format(expr="CAST(l_partkey AS VARCHAR)")} AS h
      FROM lineitem
    ),
    kmv AS (
      SELECT MAX(h) AS kth_min, COUNT(*) AS k
      FROM (SELECT h FROM hashes ORDER BY h LIMIT {_KMV_K})
    ),
    exact AS (SELECT COUNT(*) AS n_exact FROM hashes)
    SELECT e.n_exact, m.kth_min,
           {sql_round_div(
               "CAST(" + str(_KMV_K - 1) + " AS DOUBLE)"
               " * CAST(1152921504606846976 AS DOUBLE)",
               "CAST(m.kth_min AS DOUBLE)",
           )} AS est_distinct,
           ABS({sql_round_div(
               "CAST(" + str(_KMV_K - 1) + " AS DOUBLE)"
               " * CAST(1152921504606846976 AS DOUBLE)",
               "CAST(m.kth_min AS DOUBLE)",
           )} / e.n_exact - 1.0) <= 0.25 AS within_band
    FROM kmv m, exact e
    """,
    bench=True,
    doc="KMV distinct-count sketch over l_partkey, oracle-checked "
    "bit-for-bit: both engines derive the same 60-bit md5 hashes, the "
    "same k=256 minimum values, and therefore the same estimate "
    "(k-1)*2^60/kth_min (expected rel. error ~1/sqrt(k-2) ≈ 6%; band "
    "0.25 pinned TRUE). Spark plan: DISTINCT hash then "
    "TakeOrderedAndProject(k) — per-partition k-smallest merged on the "
    "driver, which IS the KMV merge operation; no raw-key shuffle "
    "reaches the driver beyond k values.",
)
def kmv_distinct_partkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    from market_pulse_data_pipeline_spark.functions.dedup import (  # noqa: PLC0415
        fan_out_by,
    )

    # r17: dedup the raw int key BEFORE hashing — md5 runs on the ~20k
    # distinct partkeys instead of every lineitem row (30x fewer at
    # sf0.1; the same ratio holds at any SF since lineitem repeats
    # partkeys ~30x). distinct(h(x)) over distinct(x) is the same set
    # as distinct(h(x)) over x (h deterministic); the second distinct
    # keeps the oracle's DISTINCT-on-h semantics for the (negligible
    # but contract-relevant) md5-collision case. fan_out_by spreads the
    # single-split scan with the exchange the first distinct needs
    # anyway. A/B interleaved min-of-5: 0.903 -> 0.735 s, identical
    # rows.
    li = fan_out_by(
        t(spark, sf_dir, "lineitem").select("l_partkey"), "l_partkey"
    )
    hashes = (
        li.distinct()
        .select(
            portable_hash60(F.col("l_partkey").cast("string")).alias("h")
        )
        .distinct()
        .cache()  # consumed twice (sketch + exact band-check): without
        # it each consumer re-runs the scan + md5 + distinct shuffle
    )
    kmv = (
        hashes.orderBy("h")
        .limit(_KMV_K)
        .agg(F.max("h").alias("kth_min"), F.count(F.lit(1)).alias("k"))
    )
    exact = hashes.agg(F.count(F.lit(1)).alias("n_exact"))
    # 1-row x 1-row cross join: broadcast of two scalar aggregates
    est = round_div(
        F.lit(float(_KMV_K - 1)) * F.lit(2**60).cast("double"),
        F.col("kth_min").cast("double"),
    )
    return (
        kmv.crossJoin(exact)
        .select(
            "n_exact",
            "kth_min",
            est.alias("est_distinct"),
            (
                F.abs(est / F.col("n_exact") - F.lit(1.0)) <= F.lit(0.25)
            ).alias("within_band"),
        )
    )


def _cm_bucket_sql(key_expr: str, row: str) -> str:
    return (
        _SQL_H60.format(expr=f"{row} || ':' || {key_expr}") + f" % {_CM_W}"
    )


@register(
    "countmin_user_freq",
    f"""
    WITH rows_d AS (SELECT CAST(UNNEST(range(0, {_CM_D})) AS VARCHAR) AS ri),
    counters AS (
      SELECT ri, {_cm_bucket_sql("CAST(user_id AS VARCHAR)", "ri")} AS bucket,
             COUNT(*) AS cnt
      FROM events, rows_d
      GROUP BY 1, 2
    ),
    probes AS (
      SELECT user_id, COUNT(*) AS exact_n FROM events GROUP BY 1
      ORDER BY exact_n DESC, user_id LIMIT 10
    ),
    probe_cells AS (
      SELECT p.user_id, p.exact_n, r.ri,
             {_cm_bucket_sql("CAST(p.user_id AS VARCHAR)", "r.ri")} AS bucket
      FROM probes p, rows_d r
    )
    SELECT pc.user_id, pc.exact_n,
           MIN(c.cnt) AS cm_estimate,
           MIN(c.cnt) >= pc.exact_n AS overestimate_ok
    FROM probe_cells pc
    JOIN counters c ON c.ri = pc.ri AND c.bucket = pc.bucket
    GROUP BY pc.user_id, pc.exact_n
    """,
    doc=f"count-min sketch ({_CM_D}x{_CM_W}) of per-user event "
    "frequencies, probed at the 10 most frequent users. Both engines "
    "build the identical counter matrix from portable md5 bucket "
    "hashes, so cm_estimate hash-checks exactly, and the structural "
    "guarantee estimate >= exact is pinned TRUE. Scale shape: the "
    f"sketch build is one aggregation with at most {_CM_D * _CM_W} "
    "result cells (map-side combine collapses each partition to the "
    "same tiny matrix — this is the mergeability argument); probing "
    "joins against the tiny counter table, which Spark broadcasts.",
)
def countmin_user_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")

    def cells(key: F.Column) -> F.Column:
        return F.array(
            *[
                F.struct(
                    F.lit(str(i)).alias("ri"),
                    F.pmod(
                        portable_hash60(
                            F.concat(F.lit(f"{i}:"), key.cast("string"))
                        ),
                        F.lit(_CM_W),
                    ).alias("bucket"),
                )
                for i in range(_CM_D)
            ]
        )

    counters = (
        ev.select(F.explode(cells(F.col("user_id"))).alias("c"))
        .groupBy("c.ri", "c.bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    probes = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), "user_id")
        .limit(10)
    )
    probe_cells = probes.select(
        "user_id", "exact_n", F.explode(cells(F.col("user_id"))).alias("c")
    ).select("user_id", "exact_n", "c.ri", "c.bucket")
    return (
        probe_cells.join(F.broadcast(counters), ["ri", "bucket"])
        .groupBy("user_id", "exact_n")
        .agg(F.min("cnt").alias("cm_estimate"))
        .select(
            "user_id",
            "exact_n",
            "cm_estimate",
            (F.col("cm_estimate") >= F.col("exact_n")).alias(
                "overestimate_ok"
            ),
        )
    )


@register(
    "weighted_sample_per_lang",
    f"""
    SELECT lang, doc_id, n_chars
    FROM (
      SELECT lang, doc_id, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY CAST({_SQL_H60.format(expr="CAST(doc_id AS VARCHAR)")}
                          AS DOUBLE) / n_chars,
                        doc_id
             ) AS rn
      FROM documents
    ) s
    WHERE rn <= {_WS_K}
    """,
    doc=f"deterministic weighted sampling: k={_WS_K} docs per lang with "
    "inclusion probability proportional to n_chars (length-biased, the "
    "usual token-budget-aware corpus sampler), RNG-free — priority = "
    "hash(doc_id)/weight, k smallest win (weighted-reservoir/A-ES "
    "shape with the uniform draw replaced by a portable 60-bit md5 "
    "hash). The priority is a single IEEE division of identical "
    "operands, so the ordering — and hence the selected set — is "
    "bit-identical across engines; the float itself is not emitted. "
    "One window per lang partition; at scale this is a per-stratum "
    "top-k (rank truncation), not a global sort.",
)
def weighted_sample_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    pri = portable_hash60(F.col("doc_id").cast("string")).cast(
        "double"
    ) / F.col("n_chars")
    w = Window.partitionBy("lang").orderBy(pri, "doc_id")
    return (
        docs.select(
            "lang", "doc_id", "n_chars", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") <= _WS_K)
        .select("lang", "doc_id", "n_chars")
    )


@register(
    "bigram_fluency_score",
    f"""
    WITH bg AS (
      SELECT doc_id, bigram, split_part(bigram, ' ', 1) AS w1
      FROM (
        SELECT doc_id,
               UNNEST(list_transform(range(1, len(ws)),
                                     i -> ws[i] || ' ' || ws[i + 1])) AS bigram
        FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
        WHERE len(ws) >= 2
      )
    ),
    c2 AS (SELECT bigram, COUNT(*) AS n2 FROM bg GROUP BY 1),
    c1 AS (SELECT w1, COUNT(*) AS n1 FROM bg GROUP BY 1)
    SELECT bg.doc_id, COUNT(*) AS n_bigrams,
           {sql_round_div("CAST(SUM(CAST(CAST(c1.n1 AS DOUBLE) / c2.n2 AS DECIMAL(20,6))) AS DOUBLE)", "COUNT(*)")}
             AS mean_inv_p
    FROM bg
    JOIN c2 USING (bigram)
    JOIN c1 USING (w1)
    GROUP BY bg.doc_id
    """,
    doc="language-model-shaped fluency score without a model: per doc, "
    "the mean inverse conditional bigram probability 1/p(w2|w1) under "
    "the corpus MLE (C1(w1)/C2(w1 w2) — low = built from common "
    "continuations, high = surprising text). Cross-engine exactness: "
    "each term is ONE IEEE division of identical small integers, "
    "snapped to DECIMAL(20,6) (never a rounding tie — 5e-7 is not "
    "dyadic), summed exactly as decimals, then the decimal-quotient "
    "rounded mean. Scale shape: counts are token-keyed partial "
    "aggregations; the two enrichment joins are keyed on "
    "bigram/first-token — co-partitioned shuffle joins, no Python.",
)
def bigram_fluency_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    toked = docs.select(
        "doc_id", F.split(F.col("text"), " ").alias("ws")
    ).filter(F.size("ws") >= 2)
    bg = toked.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(ws) - 1),"
                " i -> concat(ws[i - 1], ' ', ws[i]))"
            )
        ).alias("bigram"),
    ).withColumn("w1", F.substring_index("bigram", " ", 1))
    c2 = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("n2"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("n1"))
    term = (F.col("n1").cast("double") / F.col("n2")).cast("decimal(20,6)")
    return (
        bg.join(c2, "bigram")
        .join(c1, "w1")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            round_div(
                F.sum(term).cast("double"), F.count(F.lit(1))
            ).alias("mean_inv_p"),
        )
    )


@register(
    "kmv_join_cardinality_estimate",
    f"""
    WITH ha AS (
      SELECT DISTINCT {_SQL_H60.format(expr="CAST(o_orderkey AS VARCHAR)")}
               AS h FROM orders
    ), hb AS (
      SELECT DISTINCT {_SQL_H60.format(expr="CAST(l_orderkey AS VARCHAR)")}
               AS h FROM lineitem
    ),
    ka AS (SELECT h FROM ha ORDER BY h LIMIT {_KMV_K}),
    kb AS (SELECT h FROM hb ORDER BY h LIMIT {_KMV_K}),
    ku AS (SELECT h FROM (SELECT h FROM ha UNION SELECT h FROM hb)
           ORDER BY h LIMIT {_KMV_K}),
    union_est AS (
      SELECT {sql_round_div(
          "CAST(" + str(_KMV_K - 1) + " AS DOUBLE)"
          " * CAST(1152921504606846976 AS DOUBLE)",
          "CAST((SELECT MAX(h) FROM ku) AS DOUBLE)",
      )} AS u_est
    ),
    overlap AS (
      SELECT COUNT(*) AS n_both FROM ku
      WHERE h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb)
    ),
    exact AS (
      SELECT COUNT(*) AS n_exact
      FROM (SELECT h FROM ha INTERSECT SELECT h FROM hb)
    )
    SELECT o.n_both, e.n_exact,
           {sql_round_div(
               "n_both * u.u_est",
               "CAST(" + str(_KMV_K) + " AS DOUBLE)",
           )} AS inter_est,
           ABS({sql_round_div(
               "n_both * u.u_est",
               "CAST(" + str(_KMV_K) + " AS DOUBLE)",
           )} / e.n_exact - 1.0) <= 0.3 AS within_band
    FROM overlap o, exact e, union_est u
    """,
    doc="sketch-based join-key overlap estimation — the statistic a "
    "cost-based planner wants BEFORE running a join: KMV sketches of "
    "both key sets, the union sketch (k smallest of the merged "
    "hashes), Jaccard from sketch-membership counts, and "
    "|A∩B| ≈ (n_both/k) * |A∪B|_est, compared against the exact "
    "intersection with a 30% band pinned TRUE. Everything is the "
    "same portable 60-bit hash, so the sketches — and therefore the "
    "estimate — are bit-identical across engines. Each sketch is one "
    "distinct + TakeOrdered(k); no full-key comparison ever happens "
    "(the exact branch exists only as oracle evidence).",
)
def kmv_join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # materialize each side's distinct hash set once: four consumers
    # each (own sketch, union sketch, exact-overlap verify) otherwise
    # re-run the scan + hash + distinct per use — 8 scans in the
    # audited plan before round 12
    ha = (
        t(spark, sf_dir, "orders")
        .select(portable_hash60(F.col("o_orderkey").cast("string")).alias("h"))
        .distinct()
        .localCheckpoint()
    )
    hb = (
        t(spark, sf_dir, "lineitem")
        .select(portable_hash60(F.col("l_orderkey").cast("string")).alias("h"))
        .distinct()
        .localCheckpoint()
    )
    ka = ha.orderBy("h").limit(_KMV_K)
    kb = hb.orderBy("h").limit(_KMV_K)
    ku = ha.union(hb).distinct().orderBy("h").limit(_KMV_K)
    u_est = round_div(
        F.lit(float(_KMV_K - 1)) * F.lit(2**60).cast("double"),
        F.col("kth").cast("double"),
    )
    union_est = ku.agg(F.max("h").alias("kth")).select(u_est.alias("u_est"))
    n_both = (
        ku.join(ka.withColumnRenamed("h", "h"), "h")
        .join(kb, "h")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    exact = ha.join(hb, "h").agg(F.count(F.lit(1)).alias("n_exact"))
    inter_est = round_div(
        F.col("n_both") * F.col("u_est"), F.lit(float(_KMV_K))
    )
    return (
        n_both.crossJoin(exact)
        .crossJoin(union_est)
        .select(
            "n_both",
            "n_exact",
            inter_est.alias("inter_est"),
            (
                F.abs(inter_est / F.col("n_exact") - F.lit(1.0))
                <= F.lit(0.3)
            ).alias("within_band"),
        )
    )


@register(
    "hll_sketch_mergeability",
    """
    SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_exact,
           TRUE AS merged_within_band,
           TRUE AS global_within_band
    FROM lineitem
    """,
    doc="native Datasketches HLL mergeability (hll_sketch_agg / "
    "hll_union_agg / hll_sketch_estimate): per-supplier HLL sketches "
    "of l_partkey, unioned via hll_union_agg, estimated, and band-checked next to the "
    "single global sketch. HLL registers combine by max (a "
    "commutative idempotent monoid), which is the whole reason "
    "sketches are the 100 TB distinct-count tool: partial sketches "
    "flow through map-side combine and re-aggregate at any grouping "
    "without touching rows again. One honest subtlety, learned by "
    "measurement: a low-cardinality sketch still in SPARSE (list) "
    "mode estimates exactly, while a union promotes to the dense "
    "register array — so merged and global ESTIMATES differ slightly "
    "and exact equality is the wrong contract. The hash-checked "
    "contract is therefore a 5% error band against the exact count "
    "for BOTH the merged and the global estimate (any excursion "
    "flips a boolean). Complements the portable "
    "KMV sketch (kmv_distinct_partkeys), whose bits ARE hash-checked "
    "cross-engine.",
)
def hll_sketch_mergeability(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    per_supp = li.groupBy("l_suppkey").agg(
        F.hll_sketch_agg("l_partkey", 14).alias("sk")
    )
    merged = per_supp.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_est")
    )
    global_ = li.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("l_partkey", 14)).alias(
            "global_est"
        ),
        F.countDistinct("l_partkey").alias("n_exact"),
    )
    band = F.greatest(F.lit(1.0), F.col("n_exact") * F.lit(0.05))
    return (
        global_.crossJoin(F.broadcast(merged))
        .select(
            "n_exact",
            (
                F.abs(F.col("merged_est") - F.col("n_exact")) <= band
            ).alias("merged_within_band"),
            (
                F.abs(F.col("global_est") - F.col("n_exact")) <= band
            ).alias("global_within_band"),
        )
    )


_MG_K = 40  # heavy-hitter threshold: count > n_tokens / _MG_K (2.5%)


@register(
    "heavy_hitters_mg_verified",
    f"""
    WITH tk AS (
      SELECT t.token
      FROM documents, UNNEST(string_split(lower(text), ' ')) AS t(token)
      WHERE t.token <> ''
    ),
    tot AS (SELECT COUNT(*) AS n_total FROM tk),
    c AS (SELECT token, COUNT(*) AS n FROM tk GROUP BY token)
    SELECT c.token, c.n
    FROM c, tot
    WHERE c.n * {_MG_K} > tot.n_total
    ORDER BY c.token
    """,
    bench=True,
    doc="sketch-propose, exact-verify heavy hitters: per-partition "
    "Misra-Gries summaries (O(k) state, zero shuffle, Arrow-batched "
    "value_counts — functions/heavyhitters.py) propose a candidate "
    "superset that provably contains every token with frequency "
    "> n/k (mergeable-summaries pigeonhole bound), then an exact "
    "count over the semi-join-restricted stream keeps only true "
    "hitters. The FINAL result is partitioning-independent even "
    "though each partition's summary is not — hence a plain exact "
    "SQL oracle, no band needed. Scale shape: the sketch pass "
    "touches each row once with constant memory; the verify pass is "
    "one broadcast semi-join + one token-keyed hash aggregate whose "
    "input is already filtered to <= (k-1)*partitions candidate "
    "tokens' occurrences.",
)
def heavy_hitters_mg_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(F.split(F.lower("text"), " ")).alias("token")
    ).filter(F.col("token") != "")
    cand = misra_gries_candidates(tok, "token", _MG_K)
    tot = tok.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        tok.join(F.broadcast(cand), "token", "left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("n") * _MG_K > F.col("n_total"))
        .select("token", "n")
        .orderBy("token")
    )
