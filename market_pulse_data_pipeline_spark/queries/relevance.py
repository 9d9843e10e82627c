"""Relevance scoring over the `documents` table: TF-IDF term extraction
and BM25 query scoring (north-star extension, SURVEY §7 phase 6 — the
retrieval/ranking end of a training-data pipeline: term importance for
keyword extraction, BM25 for query-driven corpus selection).

Determinism note: both queries use the RATIONAL idf form
``(N - df + 0.5) / (df + 0.5)`` (the argument of BM25's log) instead of
``log(...)``. ``log`` routes through libm and the JVM's Math.log, which
are not guaranteed bit-identical across engines; a fixed expression tree
of IEEE +,-,*,/ over identical inputs IS. Rankings are monotone in the
rational form (log is monotone), so top-k sets are unchanged; scores are
emitted through the exact-decimal rounding route (queries.common).

Scale shape: tokenize with JVM-side split/explode (no Python), tf via
one (doc_id, term) hash-aggregate, df via one (term) hash-aggregate over
the already-tiny tf relation, then a term-keyed join — the inverted-
index build is two shuffles total, both on bounded-cardinality keys.
BM25's per-query-term df row is a 1-row broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from market_pulse_data_pipeline_spark.queries.common import (
    register,
    round_div,
    sql_round_div,
    t,
)

# Fixed BM25 constants (Robertson/Sparck Jones defaults) and a fixed
# 3-term query drawn from the fixture vocabulary.
_K1 = 1.2
_B = 0.75
_QUERY_TERMS = ("spark", "join", "vector")
_TOP_TERMS = 3
_TOP_DOCS = 20


def _tokens(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("term")
    ).filter(F.col("term") != "")


_SQL_TOK = """
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
      FROM documents
"""


@register(
    "tfidf_top_terms",
    f"""
    WITH tok AS ({_SQL_TOK}),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM tok WHERE term <> '' GROUP BY doc_id, term
    ),
    idf AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, idf.df,
             tf.tf * ((n.n_docs - idf.df + 0.5) / (idf.df + 0.5)) AS raw
      FROM tf JOIN idf USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tf, df,
           CAST(ROUND(CAST(raw AS DECIMAL(28,8)), 4) AS DOUBLE) AS tfidf
    FROM (SELECT *, ROW_NUMBER() OVER (
            PARTITION BY doc_id ORDER BY raw DESC, term) AS rn
          FROM scored)
    WHERE rn <= {_TOP_TERMS}
    """,
    doc="TF-IDF keyword extraction: top-3 terms per document by "
    "tf x rational-idf (N-df+0.5)/(df+0.5). Inverted index = two "
    "hash-aggregates (doc_id,term) then (term); the doc count is a "
    "1-row broadcast. Deterministic tie-break on term.",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    tf = (
        _tokens(docs)
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    raw = F.col("tf") * (
        (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n))
        .withColumn("raw", raw)
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("raw").desc(), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOP_TERMS)
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(F.col("raw").cast("decimal(28,8)"), 4)
            .cast("double")
            .alias("tfidf"),
        )
    )


def _sql_bm25_term(q: str) -> str:
    """Per-term BM25 addend; parenthesization mirrored exactly in the
    Spark build below so both engines evaluate the identical IEEE tree."""
    return (
        f"(((n_docs - df_{q} + 0.5) / (df_{q} + 0.5)) * "
        f"((tf_{q} * {_K1 + 1}) / "
        f"(tf_{q} + {_K1} * ({1 - _B} + {_B} * (dl / avgdl)))))"
    )


@register(
    "bm25_score_query",
    f"""
    WITH tok AS ({_SQL_TOK}),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM tok WHERE term <> '' GROUP BY doc_id, term
    ),
    idf AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    qdf AS (
      SELECT {', '.join(
        f"MAX(CASE WHEN term = '{q}' THEN df END) AS df_{q}"
        for q in _QUERY_TERMS)}
      FROM idf WHERE term IN {_QUERY_TERMS!r}
    ),
    dl AS (
      SELECT doc_id,
             CAST(len(string_split(lower(text), ' ')) AS DOUBLE) AS dl
      FROM documents
    ),
    stats AS (
      SELECT COUNT(*) AS n_docs,
             {sql_round_div('CAST(SUM(CAST(len(string_split(lower(text), '
                            "' ')) AS BIGINT)) AS DOUBLE)", 'COUNT(*)', 6)}
               AS avgdl
      FROM documents
    ),
    qtf AS (
      SELECT doc_id,
             {', '.join(
        f"CAST(COALESCE(MAX(CASE WHEN term = '{q}' THEN tf END), 0) "
        f"AS DOUBLE) AS tf_{q}"
        for q in _QUERY_TERMS)}
      FROM tf WHERE term IN {_QUERY_TERMS!r} GROUP BY doc_id
    ),
    scored AS (
      SELECT dl.doc_id,
             {', '.join(f"qtf.tf_{q}" for q in _QUERY_TERMS)},
             {' + '.join(_sql_bm25_term(q) for q in _QUERY_TERMS)} AS raw
      FROM dl JOIN qtf USING (doc_id) CROSS JOIN qdf CROSS JOIN stats
    )
    SELECT doc_id,
           {', '.join(
        f"CAST(tf_{q} AS BIGINT) AS tf_{q}" for q in _QUERY_TERMS)},
           CAST(ROUND(CAST(raw AS DECIMAL(28,8)), 4) AS DOUBLE) AS bm25
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY raw DESC, doc_id) AS rn
          FROM scored)
    WHERE rn <= {_TOP_DOCS}
    """,
    doc=f"BM25 top-{_TOP_DOCS} retrieval for the fixed query "
    f"{_QUERY_TERMS} (k1={_K1}, b={_B}), rational-idf variant. "
    "Query-term dfs collapse to a 1-row broadcast; per-doc term "
    "frequencies pivot to fixed columns so the 3-term score is a fixed "
    "scalar expression (no reassociating SUM) — bit-identical across "
    "engines. Docs containing no query term are skipped by the inner "
    "join (score 0 < any match).",
)
def bm25_score_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    tf = (
        _tokens(docs)
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qdf = (
        df_.filter(F.col("term").isin(*_QUERY_TERMS))
        .groupBy()
        .agg(
            *[
                F.max(F.when(F.col("term") == q, F.col("df"))).alias(f"df_{q}")
                for q in _QUERY_TERMS
            ]
        )
    )
    dl = docs.select(
        "doc_id",
        F.size(F.split(F.lower("text"), " ")).cast("double").alias("dl"),
    )
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        round_div(
            F.sum(F.size(F.split(F.lower("text"), " ")).cast("bigint")).cast(
                "double"
            ),
            F.count(F.lit(1)),
            6,
        ).alias("avgdl"),
    )
    qtf = (
        tf.filter(F.col("term").isin(*_QUERY_TERMS))
        .groupBy("doc_id")
        .agg(
            *[
                F.coalesce(
                    F.max(F.when(F.col("term") == q, F.col("tf"))), F.lit(0)
                )
                .cast("double")
                .alias(f"tf_{q}")
                for q in _QUERY_TERMS
            ]
        )
    )

    def term_score(q: str):
        idf = (F.col("n_docs") - F.col(f"df_{q}") + F.lit(0.5)) / (
            F.col(f"df_{q}") + F.lit(0.5)
        )
        sat = (F.col(f"tf_{q}") * F.lit(_K1 + 1)) / (
            F.col(f"tf_{q}")
            + F.lit(_K1) * (F.lit(1 - _B) + F.lit(_B) * (F.col("dl") / F.col("avgdl")))
        )
        return idf * sat

    raw = (
        term_score(_QUERY_TERMS[0])
        + term_score(_QUERY_TERMS[1])
        + term_score(_QUERY_TERMS[2])
    )
    scored = (
        dl.join(qtf, "doc_id")
        .crossJoin(F.broadcast(qdf))
        .crossJoin(F.broadcast(stats))
        .withColumn("raw", raw)
    )
    # global top-k via sort+limit, NOT a row_number over an unpartitioned
    # window: Spark plans this as TakeOrderedAndProject (per-partition
    # heap + driver merge of k rows), whereas the window form funnels
    # every row through one partition.
    return (
        scored.orderBy(F.col("raw").desc(), "doc_id")
        .limit(_TOP_DOCS)
        .select(
            "doc_id",
            *[
                F.col(f"tf_{q}").cast("bigint").alias(f"tf_{q}")
                for q in _QUERY_TERMS
            ],
            F.round(F.col("raw").cast("decimal(28,8)"), 4)
            .cast("double")
            .alias("bm25"),
        )
    )
