"""Text-analysis operators over the `documents` table (north-star
extension, SURVEY §7 phase 6): token counting, quality scoring,
language-ID heuristic, document fingerprinting. All built from JVM-side
collection functions (split / size / filter / posexplode) — no Python
UDFs in the hot path.
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

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]
_SW_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)
_FP_MOD = 1_000_000_007
_NTOK = "len(string_split(text, ' '))"
_NSTOP = f"len(list_filter(string_split(text, ' '), w -> w IN ({_SW_SQL})))"


@register(
    "text_token_count",
    """
    SELECT doc_id, CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens
    FROM documents
    """,
    doc="token counting (whitespace tokenizer) — F.size(F.split(...))",
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return docs.select("doc_id", F.size(F.split("text", " ")).alias("n_tokens"))


@register(
    "text_quality_score",
    f"""
    SELECT doc_id,
           CAST({_NTOK} AS INTEGER) AS n_tokens,
           {sql_round_div(f"(length(text) - {_NTOK} + 1) * 1.0", _NTOK, 4)}
             AS avg_token_len,
           {sql_round_div(f"{_NSTOP} * 1.0", _NTOK, 4)} AS stopword_ratio,
           CASE WHEN {_NTOK} >= 20
                 AND {_NSTOP} * 1.0 / {_NTOK} >= 0.01
                THEN 'keep' ELSE 'filter' END AS quality_label
    FROM documents
    """,
    doc="quality scoring: length / avg token length / stopword ratio + "
    "keep-filter label, all computed JVM-side",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda w: w.isin(STOPWORDS)))
    avg_len = round_div((F.length("text") - n_tokens + 1) * F.lit(1.0), n_tokens, 4)
    stop_ratio = round_div(n_stop * F.lit(1.0), n_tokens, 4)
    label = F.when(
        (n_tokens >= 20) & (n_stop * F.lit(1.0) / n_tokens >= 0.01), "keep"
    ).otherwise("filter")
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        avg_len.alias("avg_token_len"),
        stop_ratio.alias("stopword_ratio"),
        label.alias("quality_label"),
    )


@register(
    "text_lang_stats",
    f"""
    SELECT lang, COUNT(*) AS n_docs,
           {sql_round_div('CAST(SUM(n_chars) AS DOUBLE)', 'COUNT(*)', 4)}
             AS avg_chars
    FROM documents GROUP BY lang
    """,
    doc="per-language corpus stats (exact integer sums → deterministic avg)",
)
def text_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        round_div(F.sum("n_chars").cast("double"), F.count(F.lit(1)), 4).alias(
            "avg_chars"
        ),
    )


@register(
    "lang_id_heuristic",
    f"""
    SELECT doc_id, lang,
           CASE WHEN len(list_filter(string_split(text, ' '),
                                     w -> w IN ({_SW_SQL}))) * 1.0
                     / len(string_split(text, ' ')) >= 0.05
                THEN 'en' ELSE 'other' END AS lang_pred
    FROM documents
    """,
    doc="language-ID heuristic (stopword-marker ratio) — content-based, "
    "independent of the stored lang label",
)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    ratio = F.size(F.filter(toks, lambda w: w.isin(STOPWORDS))) * F.lit(1.0) / F.size(toks)
    return docs.select(
        "doc_id",
        "lang",
        F.when(ratio >= 0.05, "en").otherwise("other").alias("lang_pred"),
    )


@register(
    "doc_fingerprint",
    f"""
    SELECT doc_id,
           CAST(SUM(ord * length(word)) % {_FP_MOD} AS BIGINT) AS fingerprint
    FROM (
      SELECT doc_id,
             UNNEST(string_split(text, ' ')) AS word,
             generate_subscripts(string_split(text, ' '), 1) AS ord
      FROM documents) u
    GROUP BY doc_id
    """,
    doc="position-weighted document fingerprint (rolling-hash flavor) via "
    "posexplode — order-sensitive, exact integer arithmetic",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
    )
    return toks.groupBy("doc_id").agg(
        (F.sum((F.col("pos") + 1) * F.length("word")) % _FP_MOD)
        .cast("long")
        .alias("fingerprint")
    )


_BPE_PATTERN = r"[a-z]+|[A-Z][a-z]*|[0-9]{1,3}|[^A-Za-z0-9\s]"


@register(
    "text_bpe_token_estimate",
    f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_BPE_PATTERN}')) AS INTEGER)
             AS bpe_tokens,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS ws_tokens
    FROM documents
    """,
    doc="BPE-ish token estimation via a subword regex (word pieces, "
    "number chunks, punctuation) next to the whitespace count — pattern "
    "kept in the RE2∩Java common subset",
)
def text_bpe_token_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    # pattern passed as a Column literal, NOT through F.expr — Spark SQL
    # string literals process backslash escapes ('\s' → 's'), silently
    # corrupting the regex; DuckDB literals don't
    return docs.select(
        "doc_id",
        F.size(
            F.regexp_extract_all("text", F.lit(_BPE_PATTERN), 0)
        ).alias("bpe_tokens"),
        F.size(F.split("text", " ")).alias("ws_tokens"),
    )


@register(
    "multimodal_meta",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
           sha256(text) AS content_sha
    FROM documents
    """,
    doc="multimodal plumbing: opaque binary column + typed metadata "
    "(byte length, content hash); the decode path lives in "
    "functions.multimodal as a mapInPandas stub",
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    binary = F.encode("text", "utf-8")
    return docs.select(
        "doc_id",
        F.octet_length(binary).alias("n_bytes"),
        F.sha2(binary, 256).alias("content_sha"),
    )
