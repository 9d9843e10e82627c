"""Similarity search over the `embeddings` table (north-star extension).

Brute-force cosine top-k as the correctness baseline: dot products via
zip_with + aggregate (JVM-side, sequential fold → deterministic and
identical to the oracle's in-order list_sum). The LSH-bucketed scale
path lives in functions.similarity (engine-specific hashing → rows-only
check).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from market_pulse_data_pipeline_spark.queries.common import (
    register,
    round_div,
    sql_round_div,
    t,
)

_QUERY_VEC_ID = 0
_TOP_K = 10


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


@register(
    "similarity_topk_cosine",
    f"""
    WITH q AS (
      SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
      WHERE vec_id = {_QUERY_VEC_ID}
    ), scored AS (
      SELECT vec_id, label,
             list_sum(list_transform(range(1, len(v) + 1), i -> v[i] * qv[i]))
               / (sqrt(list_sum(list_transform(range(1, len(v) + 1), i -> v[i] * v[i])))
                  * sqrt(list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i] * qv[i]))))
               AS cos_raw
      FROM (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), q
    )
    SELECT vec_id, label, ROUND(cos_raw, 6) AS cosine
    FROM scored WHERE vec_id <> {_QUERY_VEC_ID}
    ORDER BY ROUND(cos_raw, 6) DESC, vec_id
    LIMIT {_TOP_K}
    """,
    bench=True,
    doc="brute-force cosine top-k against one query vector; deterministic "
    "tie-break on vec_id",
)
def similarity_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    qrow = (
        emb.filter(F.col("vec_id") == _QUERY_VEC_ID)
        .select(F.col("embedding").cast("array<double>").alias("q"))
        .head()
    )
    qlit = F.array(*[F.lit(float(x)) for x in qrow["q"]])
    v = F.col("embedding").cast("array<double>")
    cos = _dot(v, qlit) / (F.sqrt(_dot(v, v)) * F.sqrt(_dot(qlit, qlit)))
    return (
        emb.filter(F.col("vec_id") != _QUERY_VEC_ID)
        .select("vec_id", "label", F.round(cos, 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(_TOP_K)
    )


@register(
    "embedding_label_centroid_norm",
    f"""
    SELECT label, COUNT(*) AS n_vectors,
           {sql_round_div(
               "CAST(SUM(CAST(list_sum(list_transform("
               "CAST(embedding AS DOUBLE[]), x -> x * x)) "
               "AS DECIMAL(18,6))) AS DOUBLE)",
               "COUNT(*)",
               4,
           )} AS avg_sq_norm
    FROM embeddings GROUP BY label
    """,
    doc="per-label embedding stats (avg squared L2 norm) — array aggregate "
    "pushed through a relational groupBy",
)
def embedding_label_centroid_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    sq = F.aggregate(
        F.transform(v, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
    )
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        round_div(
            F.sum(sq.cast("decimal(18,6)")).cast("double"), F.count(F.lit(1)), 4
        ).alias("avg_sq_norm"),
    )


@register(
    "embedding_int8_quantize",
    """
    WITH prep AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
             list_max(list_transform(embedding,
                      x -> abs(CAST(x AS DOUBLE)))) AS max_abs
      FROM embeddings
    )
    SELECT vec_id,
           CAST(ROUND(CAST(max_abs / 127 AS DECIMAL(28,12)), 9) AS DOUBLE)
             AS scale,
           array_to_string(list_transform(v,
                 x -> CAST(FLOOR(x * 127 / max_abs + 0.5) AS INTEGER)), ',')
             AS q_csv,
           CAST(list_sum(list_transform(v,
                 x -> CAST(FLOOR(x * 127 / max_abs + 0.5) AS INTEGER)))
                AS BIGINT) AS q_sum
    FROM prep
    """,
    doc="int8 symmetric quantization of the embedding column (per-vector "
    "absmax scale) — the storage-compression step of a vector pipeline "
    "(4x smaller than float32 at 100 TB, re-rank on dequantized values). "
    "Quantized codes use floor(x+0.5) instead of double-path ROUND: "
    "floor on doubles is exact and bit-identical across engines, so the "
    "full int8 code arrays hash-match the oracle; the scale is rounded "
    "on exact decimals. The codes are emitted as a comma-joined string "
    "(q_csv) rather than a raw array<int> column: the harness "
    "canonicalizes results through pandas sort_values, which cannot "
    "factorize Python lists — top-level result columns must be scalar. "
    "Map-only — no shuffle at any size.",
)
def embedding_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    max_abs = F.array_max(F.transform(v, lambda x: F.abs(x)))
    q = F.transform(
        v, lambda x: F.floor(x * 127 / max_abs + F.lit(0.5)).cast("int")
    )
    return emb.select(
        "vec_id",
        F.round((max_abs / 127).cast("decimal(28,12)"), 9)
        .cast("double")
        .alias("scale"),
        F.concat_ws(",", q.cast("array<string>")).alias("q_csv"),
        F.aggregate(q, F.lit(0).cast("bigint"), lambda acc, x: acc + x).alias(
            "q_sum"
        ),
    )


@register(
    "embedding_quantization_error",
    """
    WITH prep AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
             list_max(list_transform(embedding,
                      x -> abs(CAST(x AS DOUBLE)))) AS max_abs
      FROM embeddings
    ), deq AS (
      SELECT vec_id, v, max_abs / 127 AS scale,
             list_transform(v, x -> CAST(FLOOR(x * 127 / max_abs + 0.5)
                                         AS INTEGER)) AS q
      FROM prep
    )
    SELECT vec_id,
           CAST(ROUND(CAST(list_max(
             list_transform(list_zip(v, q),
               p -> abs(p[1] - p[2] * scale))) AS DECIMAL(28,12)), 9)
             AS DOUBLE) AS max_abs_err,
           list_max(list_transform(list_zip(v, q),
             p -> abs(p[1] - p[2] * scale))) <= scale * 0.5 + 1e-12
             AS within_half_step
    FROM deq
    """,
    doc="reconstruction error of the int8 quantization: per vector, the "
    "max |x - dequantized(x)| and a proof bit that every component sits "
    "within half a quantization step (the correctness bound of "
    "round-to-nearest). Same exact-arithmetic discipline as the "
    "quantizer (floor-based codes, identical double ops both engines), "
    "so even the error values hash-match. Map-only.",
)
def embedding_quantization_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    max_abs = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = max_abs / 127
    q = F.transform(
        v, lambda x: F.floor(x * 127 / max_abs + F.lit(0.5)).cast("int")
    )
    err = F.array_max(
        F.zip_with(v, q, lambda x, qi: F.abs(x - qi * scale))
    )
    return emb.select(
        "vec_id",
        F.round(err.cast("decimal(28,12)"), 9).cast("double").alias("max_abs_err"),
        (err <= scale * 0.5 + F.lit(1e-12)).alias("within_half_step"),
    )


@register(
    "label_centroid_pairwise_cosine",
    """
    WITH xs AS (
      SELECT label, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS x
      FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS g(i)
    ), sums AS (
      SELECT label, pos,
             CAST(SUM(CAST(x AS DECIMAL(20,12))) AS DOUBLE) AS m
      FROM xs GROUP BY label, pos
    ), dots AS (
      SELECT a.label AS label_a, b.label AS label_b,
             CAST(SUM(CAST(a.m * b.m AS DECIMAL(38,24))) AS DOUBLE) AS dot
      FROM sums a JOIN sums b ON a.pos = b.pos AND a.label < b.label
      GROUP BY a.label, b.label
    ), norms AS (
      SELECT label, CAST(SUM(CAST(m * m AS DECIMAL(38,24))) AS DOUBLE) AS sq
      FROM sums GROUP BY label
    )
    SELECT label_a, label_b,
           CAST(ROUND(CAST(dot / (sqrt(na.sq) * sqrt(nb.sq))
                           AS DECIMAL(28,10)), 6) AS DOUBLE) AS cosine
    FROM dots
    JOIN norms na ON label_a = na.label
    JOIN norms nb ON label_b = nb.label
    ORDER BY label_a, label_b
    """,
    doc="pairwise cosine between label centroids, fully relational (no "
    "driver collect): positional explode -> per-(label, pos) exact "
    "decimal SUM (cosine is scale-invariant, so sums replace means and "
    "no division happens until the end) -> self-join on pos for dots. "
    "The decimal-summed components are exactly double-representable, "
    "products re-enter decimals for order-independent summation, and "
    "the final quotient rounds through a decimal — bit-identical "
    "across engines. At 100 TB the sums table is labels x dim rows "
    "(tiny) regardless of corpus size.",
)
def label_centroid_pairwise_cosine(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    pos_x = F.posexplode(F.col("embedding").cast("array<double>"))
    xs = emb.select("label", pos_x.alias("pos", "x"))
    sums = xs.groupBy("label", "pos").agg(
        F.sum(F.col("x").cast("decimal(20,12)")).cast("double").alias("m")
    )
    a, b = sums.alias("a"), sums.alias("b")
    dots = (
        a.join(
            b,
            (F.col("a.pos") == F.col("b.pos"))
            & (F.col("a.label") < F.col("b.label")),
        )
        .groupBy(
            F.col("a.label").alias("label_a"),
            F.col("b.label").alias("label_b"),
        )
        .agg(
            F.sum((F.col("a.m") * F.col("b.m")).cast("decimal(38,24)"))
            .cast("double")
            .alias("dot")
        )
    )
    norms = sums.groupBy("label").agg(
        F.sum((F.col("m") * F.col("m")).cast("decimal(38,24)"))
        .cast("double")
        .alias("sq")
    )
    na, nb = norms.alias("na"), norms.alias("nb")
    cos = F.round(
        (
            F.col("dot")
            / (F.sqrt(F.col("na.sq")) * F.sqrt(F.col("nb.sq")))
        ).cast("decimal(28,10)"),
        6,
    ).cast("double")
    return (
        dots.join(na, F.col("label_a") == F.col("na.label"))
        .join(nb, F.col("label_b") == F.col("nb.label"))
        .select("label_a", "label_b", cos.alias("cosine"))
        .orderBy("label_a", "label_b")
    )


_MAT_DIM = 16  # truncated (Matryoshka) prefix dimensions


@register(
    "matryoshka_truncation_quality",
    f"""
    WITH q AS (
      SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
      WHERE vec_id = {_QUERY_VEC_ID}
    ), scored AS (
      SELECT vec_id,
             ROUND(
               list_sum(list_transform(range(1, len(v) + 1),
                        i -> v[i] * qv[i]))
               / (sqrt(list_sum(list_transform(range(1, len(v) + 1),
                         i -> v[i] * v[i])))
                  * sqrt(list_sum(list_transform(range(1, len(qv) + 1),
                           i -> qv[i] * qv[i])))), 6) AS cos_full,
             ROUND(
               list_sum(list_transform(range(1, {_MAT_DIM} + 1),
                        i -> v[i] * qv[i]))
               / (sqrt(list_sum(list_transform(range(1, {_MAT_DIM} + 1),
                         i -> v[i] * v[i])))
                  * sqrt(list_sum(list_transform(range(1, {_MAT_DIM} + 1),
                           i -> qv[i] * qv[i])))), 6) AS cos_trunc
      FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings), q
      WHERE vec_id <> {_QUERY_VEC_ID}
    )
    SELECT vec_id, cos_full, cos_trunc,
           ROUND(ABS(cos_full - cos_trunc), 6) AS trunc_err
    FROM scored
    ORDER BY cos_full DESC, vec_id LIMIT 50
    """,
    doc=f"Matryoshka-style truncation audit: cosine against the query "
    f"vector computed at full dimension AND on the first {_MAT_DIM} "
    "dims only, with the per-vector error — the measurement that "
    "decides how far an embedding store can truncate for cheap "
    "first-stage retrieval (truncated vectors are 4x smaller; "
    "re-rank uses full). Same JVM zip_with/aggregate fold as "
    "similarity_topk_cosine, identical IEEE ops both engines; "
    "map-only + TakeOrdered(50).",
)
def matryoshka_truncation_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    qrow = (
        emb.filter(F.col("vec_id") == _QUERY_VEC_ID)
        .select(F.col("embedding").cast("array<double>").alias("q"))
        .head()
    )
    qfull = F.array(*[F.lit(float(x)) for x in qrow["q"]])
    qtr = F.array(*[F.lit(float(x)) for x in qrow["q"][:_MAT_DIM]])
    v = F.col("embedding").cast("array<double>")
    vtr = F.slice(v, 1, _MAT_DIM)

    def cos(a, b):
        return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))

    cf = F.round(cos(v, qfull), 6)
    ct = F.round(cos(vtr, qtr), 6)
    return (
        emb.filter(F.col("vec_id") != _QUERY_VEC_ID)
        .select(
            "vec_id",
            cf.alias("cos_full"),
            ct.alias("cos_trunc"),
            F.round(F.abs(cf - ct), 6).alias("trunc_err"),
        )
        .orderBy(F.col("cos_full").desc(), "vec_id")
        .limit(50)
    )


@register(
    "contrastive_negative_sampling",
    """
    SELECT anchor_id, neg_id, neg_label FROM (
      SELECT a.vec_id AS anchor_id, n.vec_id AS neg_id,
             n.label AS neg_label,
             ROW_NUMBER() OVER (
               PARTITION BY a.vec_id
               ORDER BY md5(CAST(a.vec_id AS VARCHAR) || ':'
                            || CAST(n.vec_id AS VARCHAR)),
                        n.vec_id) AS rn
      FROM (SELECT vec_id, label FROM embeddings WHERE vec_id < 25) a
      JOIN embeddings n
        ON n.label <> a.label
    ) WHERE rn <= 5
    """,
    doc="deterministic contrastive negative sampling: for each of 25 "
    "anchors, 5 RNG-free pseudo-random negatives drawn from the "
    "different-label pool via md5(anchor:candidate) ordering — the "
    "training-pair builder for contrastive embedding fine-tuning. "
    "Shape: the anchor set is tiny (broadcast) so the label-inequality "
    "join is map-side, then one window per anchor; per-anchor "
    "candidate ordering is uniform and reproducible across runs and "
    "engines.",
)
def contrastive_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window  # noqa: PLC0415

    emb = t(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") < 25).select(
        F.col("vec_id").alias("anchor_id"), F.col("label").alias("a_label")
    )
    negs = emb.select(
        F.col("vec_id").alias("neg_id"), F.col("label").alias("neg_label")
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.md5(
            F.concat(
                F.col("anchor_id").cast("string"),
                F.lit(":"),
                F.col("neg_id").cast("string"),
            )
        ),
        "neg_id",
    )
    return (
        F.broadcast(anchors)
        .join(negs, F.col("neg_label") != F.col("a_label"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("anchor_id", "neg_id", "neg_label")
    )
