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
    doc="position-weighted document fingerprint (rolling-hash flavor) — "
    "order-sensitive, exact integer arithmetic; map-only since the "
    "round-9 rewrite (a 2-arg transform (element, index) + one "
    "aggregate() fold replaces the posexplode + doc-keyed sum).",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    # per-document position-weighted sum — map-side fold over the
    # 2-arg transform (element, index), no explode/groupBy exchange
    # (round-9 rewrite; oracle hashes unchanged). The raw sum is
    # bounded by n_tokens^2 * max_word_len, far inside int64 even for
    # million-token documents.
    weighted = (
        "aggregate(transform(split(text, ' '),"
        " (w, i) -> (CAST(i AS BIGINT) + 1) * length(w)),"
        " CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )
    return docs.select(
        "doc_id",
        (F.expr(weighted) % _FP_MOD).cast("long").alias("fingerprint"),
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


# --- repetition / contamination / PII (LLM-pipeline quality operators) --------


@register(
    "text_repetition_stats",
    f"""
    WITH toks AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS w FROM documents
    ), freq AS (
      SELECT doc_id, w, COUNT(*) AS c FROM toks GROUP BY doc_id, w
    ), agg AS (
      SELECT doc_id, MAX(c) AS top_freq, COUNT(*) AS n_distinct,
             SUM(c) AS n_tokens
      FROM freq GROUP BY doc_id
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_distinct AS BIGINT) AS n_distinct,
           {sql_round_div('top_freq * 1.0', 'n_tokens', 4)} AS top_token_ratio,
           {sql_round_div('n_distinct * 1.0', 'n_tokens', 4)} AS distinct_ratio,
           CASE WHEN top_freq * 1.0 / n_tokens > 0.2
                  OR n_distinct * 1.0 / n_tokens < 0.3
                THEN 'repetitive' ELSE 'ok' END AS repetition_label
    FROM agg
    """,
    doc="repetition-based quality scoring (the Gopher-rule family): "
    "most-frequent-token ratio and distinct-token ratio per document, "
    "with a keep/filter label. ZERO shuffle since the round-9 rewrite: "
    "every stat is per-document, so the mode count is a per-doc "
    "array_sort + longest-equal-run aggregate() fold and the distinct "
    "count is array_distinct — one map-side projection end to end "
    "(previously an explode + two doc-keyed hash aggregates).",
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from market_pulse_data_pipeline_spark.functions.scalars import (  # noqa: PLC0415
        longest_run_count,
    )

    docs = t(spark, sf_dir, "documents")
    # all three stats are per-document, so the whole operator is ONE
    # map-side projection (round-9 rewrite; previously an explode +
    # two doc-keyed hash aggregates): token count and distinct count
    # are array expressions, and the mode count is the sorted-run fold
    # — zero exchanges, same bytes (oracle hashes unchanged)
    agg = docs.select(
        "doc_id",
        F.split("text", " ").alias("ws"),
    ).select(
        "doc_id",
        longest_run_count("ws").alias("top_freq"),
        F.size(F.array_distinct("ws")).alias("n_distinct"),
        F.size("ws").alias("n_tokens"),
    )
    rep = (F.col("top_freq") * 1.0 / F.col("n_tokens") > 0.2) | (
        F.col("n_distinct") * 1.0 / F.col("n_tokens") < 0.3
    )
    return agg.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        round_div(F.col("top_freq") * 1.0, F.col("n_tokens"), 4).alias(
            "top_token_ratio"
        ),
        round_div(F.col("n_distinct") * 1.0, F.col("n_tokens"), 4).alias(
            "distinct_ratio"
        ),
        F.when(rep, "repetitive").otherwise("ok").alias("repetition_label"),
    )


_PII_EMAIL = "[a-z0-9._]+@[a-z0-9.]+[a-z]"
_PII_ID = "[0-9]{6,}"


@register(
    "text_pii_scan",
    f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS INTEGER)
             AS n_email_like,
           CAST(len(regexp_extract_all(text, '{_PII_ID}')) AS INTEGER)
             AS n_long_digit_runs,
           (len(regexp_extract_all(text, '{_PII_EMAIL}')) > 0
             OR len(regexp_extract_all(text, '{_PII_ID}')) > 0) AS pii_flag
    FROM documents
    """,
    doc="PII-pattern scan (email-like tokens, long digit runs) — the "
    "redaction-candidate pre-filter of a training-data pipeline. "
    "Patterns restricted to syntax with identical semantics in Java "
    "regex and RE2 so the oracle matches byte-for-byte; counts per "
    "document, map-only.",
)
def text_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    n_email = F.size(F.regexp_extract_all("text", F.lit(_PII_EMAIL), F.lit(0)))
    n_digits = F.size(F.regexp_extract_all("text", F.lit(_PII_ID), F.lit(0)))
    return docs.select(
        "doc_id",
        n_email.alias("n_email_like"),
        n_digits.alias("n_long_digit_runs"),
        ((n_email > 0) | (n_digits > 0)).alias("pii_flag"),
    )


_CONTAM_N = 5  # n-gram order for decontamination
_BENCH_MOD = 17  # doc_id % 17 == 0 plays the "held-out benchmark" role


@register(
    "contamination_ngram_overlap",
    f"""
    WITH corpus AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
      WHERE doc_id % {_BENCH_MOD} <> 0
    ), bench AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
      WHERE doc_id % {_BENCH_MOD} = 0
    ), corpus_grams AS (
      SELECT DISTINCT doc_id,
             UNNEST(list_transform(range(1, len(ws) - {_CONTAM_N - 2}),
               i -> list_aggregate(list_slice(ws, i, i + {_CONTAM_N - 1}),
                                   'string_agg', ' '))) AS g
      FROM corpus WHERE len(ws) >= {_CONTAM_N}
    ), bench_grams AS (
      SELECT DISTINCT doc_id, g FROM (
        SELECT doc_id,
               UNNEST(list_transform(range(1, len(ws) - {_CONTAM_N - 2}),
                 i -> list_aggregate(list_slice(ws, i, i + {_CONTAM_N - 1}),
                                     'string_agg', ' '))) AS g
        FROM bench WHERE len(ws) >= {_CONTAM_N})
    )
    SELECT c.doc_id AS corpus_doc_id, b.doc_id AS bench_doc_id,
           COUNT(*) AS shared_ngrams
    FROM corpus_grams c JOIN bench_grams b ON c.g = b.g
    GROUP BY 1, 2
    """,
    doc="train/test contamination detection: corpus documents sharing "
    "any 5-gram with a held-out benchmark set (doc_id % 17 == 0 plays "
    "the benchmark role), with the shared-gram count per (corpus, bench) "
    "pair. Inverted-index equi-join on the n-gram — at 100 TB the "
    "benchmark gram set is small and broadcast, so the corpus-side scan "
    "is map-only; the same df-cap guard as near-dup applies if benchmark "
    "grams are stop-phrases.",
)
def contamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    n = _CONTAM_N

    def grams(df: DataFrame) -> DataFrame:
        toks = df.select("doc_id", F.split("text", " ").alias("ws")).filter(
            F.size("ws") >= n
        )
        g = F.transform(
            F.sequence(F.lit(0), F.size("ws") - n),
            lambda i: F.concat_ws(" ", *[F.col("ws")[i + j] for j in range(n)]),
        )
        return toks.select("doc_id", F.explode(g).alias("g")).distinct()

    corpus = grams(docs.filter(F.col("doc_id") % _BENCH_MOD != 0))
    bench = grams(docs.filter(F.col("doc_id") % _BENCH_MOD == 0))
    return (
        corpus.alias("c")
        .join(F.broadcast(bench.alias("b")), F.col("c.g") == F.col("b.g"))
        .groupBy(
            F.col("c.doc_id").alias("corpus_doc_id"),
            F.col("b.doc_id").alias("bench_doc_id"),
        )
        .agg(F.count(F.lit(1)).alias("shared_ngrams"))
    )


_STRATUM_K = 40  # docs kept per language class
_PACK_BUDGET = 512  # token budget per packed sequence


@register(
    "stratified_sample_per_lang",
    f"""
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn
      FROM documents)
    WHERE rn <= {_STRATUM_K}
    """,
    doc="deterministic stratified sampling (class balancing for training "
    "mixes): keep K documents per language, ordered by a content-free "
    "md5 of the id so the sample is pseudo-random yet reproducible on "
    "any engine — no RNG state, no sampleBy fraction drift. One window "
    "per class partition; at scale this is a single shuffle on lang "
    "(salt the window key if one class dominates).",
)
def stratified_sample_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window  # noqa: PLC0415

    docs = t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select("doc_id", "lang", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= _STRATUM_K)
        .select("doc_id", "lang")
    )


@register(
    "token_budget_packing",
    f"""
    SELECT doc_id, lang, n_tokens,
           CAST(FLOOR((cum_tokens - n_tokens) / {_PACK_BUDGET}) AS BIGINT)
             AS pack_id
    FROM (
      SELECT doc_id, lang,
             len(string_split(text, ' ')) AS n_tokens,
             SUM(len(string_split(text, ' '))) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) AS cum_tokens
      FROM documents)
    """,
    doc="token-budget sequence packing (assembling training examples "
    "into fixed context windows): per language, documents in id order "
    "receive a running token count and pack_id = floor(preceding-"
    "tokens / budget) — the deterministic relational form of greedy "
    "packing. One window shuffle on the class key; the pack assignment "
    "itself is a pure projection of the running sum.",
)
def token_budget_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window  # noqa: PLC0415

    docs = t(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " "))
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return docs.select(
        "doc_id",
        "lang",
        n_tok.alias("n_tokens"),
        F.floor((F.sum(n_tok).over(w) - n_tok) / _PACK_BUDGET)
        .cast("long")
        .alias("pack_id"),
    )


_KWIC_TERM = "the"
_KWIC_CTX = 3


@register(
    "kwic_concordance",
    f"""
    SELECT doc_id, pos,
           COALESCE(array_to_string(
             list_slice(tk, GREATEST(1, pos - {_KWIC_CTX}), pos - 1),
             ' '), '') AS left_ctx,
           tk[pos] AS term,
           COALESCE(array_to_string(
             list_slice(tk, pos + 1, LEAST(len(tk), pos + {_KWIC_CTX})),
             ' '), '') AS right_ctx
    FROM (
      SELECT doc_id, string_split(text, ' ') AS tk FROM documents
      WHERE doc_id < 50
    ), UNNEST(range(1, len(tk) + 1)) AS u(pos)
    WHERE tk[pos] = '{_KWIC_TERM}'
    """,
    doc="keyword-in-context (KWIC) concordance: every occurrence of a "
    f"term with ±{_KWIC_CTX} tokens of context — the corpus-inspection "
    "view behind data auditing and contamination spot checks. "
    "posexplode over the token array + two slices, all JVM "
    "collection functions; output rows ∝ term frequency, never "
    "tokens, and the term predicate prunes before any slicing.",
)
def kwic_concordance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    tokd = docs.select("doc_id", F.split("text", " ").alias("tk"))
    hits = tokd.select(
        "doc_id",
        "tk",
        F.posexplode("tk").alias("pos0", "term"),
    ).filter(F.col("term") == _KWIC_TERM)
    pos = F.col("pos0") + 1  # 1-based to mirror the SQL slices
    left_start = F.greatest(F.lit(1), pos - _KWIC_CTX)
    return hits.select(
        "doc_id",
        pos.alias("pos"),
        F.array_join(
            F.slice(F.col("tk"), left_start, pos - left_start), " "
        ).alias("left_ctx"),
        F.col("term"),
        F.array_join(
            F.slice(
                F.col("tk"),
                pos + 1,
                F.least(F.size("tk"), pos + _KWIC_CTX) - pos,
            ),
            " ",
        ).alias("right_ctx"),
    )
