"""Round-13 staged queries — implemented, oracle-paired, NOT registered.

Fourth pre-staged batch (single operator so far — future rounds top
it up toward the ≤3 budget if gaps emerge). ``staging_candidates()``
already merges this module into the --staging sweeps.

- ``corpus_yield_funnel`` — the end-to-end YIELD REPORT a training-
  data pipeline team actually ships: per source domain, how many
  documents enter, how many survive exact dedup, how many also pass
  the quality gate, how many additionally clear eval-set
  decontamination, and how many tokens the surviving set contributes.
  Composes the registry's own stage semantics (dedup_exact's
  min-doc_id survivor, text_quality_score's length+stopword gate in
  integer form, eval_decontaminate_exact_ngrams' 13-gram broadcast
  rule) into one funnel — the number that decides whether a crawl
  snapshot is worth training on.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from market_pulse_data_pipeline_spark.queries.common import QueryDef, t
from market_pulse_data_pipeline_spark.queries.text import _SW_SQL, STOPWORDS

STAGED: dict[str, QueryDef] = {}


def stage(name: str, oracle: str | None, bench: bool = False, doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        STAGED[name] = QueryDef(name, fn, oracle, bench, doc)
        return fn

    return deco


# --------------------------------------------------------------------
# corpus_yield_funnel
# --------------------------------------------------------------------

_YF_N = 13  # decontamination n-gram order (eval_decontaminate's)
_YF_EVAL_MOD = 53  # doc_id % 53 == 0 plays the held-out eval set
_YF_MIN_TOKENS = 20  # text_quality_score's length gate
_YF_STOP_PCT = 1  # stopword gate: n_stop * 100 >= n_tokens * 1


def _yield_oracle() -> str:
    from market_pulse_data_pipeline_spark.functions.dedup import (  # noqa: PLC0415
        _MERSENNE,
    )

    h60 = (
        "(('0x' || substring(md5(array_to_string("
        f"list_slice(ws, i, i + {_YF_N - 1}), ' ')), 1, 15))::BIGINT"
        f" % {_MERSENNE})"
    )
    return f"""
    WITH train AS (
      SELECT doc_id, source, text,
             len(string_split(text, ' ')) AS n_tokens,
             len(list_filter(string_split(text, ' '),
                             w -> w IN ({_SW_SQL}))) AS n_stop
      FROM documents WHERE doc_id % {_YF_EVAL_MOD} <> 0
    ),
    survivors AS (
      SELECT md5(text) AS h, MIN(doc_id) AS keep_id
      FROM train GROUP BY 1
    ),
    eg AS (
      SELECT DISTINCT UNNEST(
        list_transform(range(1, len(ws) - {_YF_N - 1} + 1), i -> {h60})
      ) AS g
      FROM (SELECT string_split(text, ' ') AS ws FROM documents
            WHERE doc_id % {_YF_EVAL_MOD} = 0)
      WHERE len(ws) >= {_YF_N}
    ),
    hits AS (
      SELECT DISTINCT doc_id
      FROM (
        SELECT doc_id, UNNEST(
          list_transform(range(1, len(ws) - {_YF_N - 1} + 1), i -> {h60})
        ) AS g
        FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM train)
        WHERE len(ws) >= {_YF_N}
      ) tg JOIN eg USING (g)
    ),
    flagged AS (
      SELECT tr.source, tr.n_tokens,
             (tr.doc_id = s.keep_id) AS survives_dedup,
             (tr.n_tokens >= {_YF_MIN_TOKENS}
              AND tr.n_stop * 100 >= tr.n_tokens * {_YF_STOP_PCT})
               AS passes_quality,
             (h.doc_id IS NULL) AS clean
      FROM train tr
      JOIN survivors s ON md5(tr.text) = s.h
      LEFT JOIN hits h USING (doc_id)
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_raw,
           CAST(SUM(CASE WHEN survives_dedup THEN 1 ELSE 0 END) AS BIGINT)
             AS n_after_dedup,
           CAST(SUM(CASE WHEN survives_dedup AND passes_quality
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_after_quality,
           CAST(SUM(CASE WHEN survives_dedup AND passes_quality AND clean
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_after_decontam,
           CAST(SUM(CASE WHEN survives_dedup AND passes_quality AND clean
                         THEN n_tokens ELSE 0 END) AS BIGINT) AS tokens_out
    FROM flagged
    GROUP BY source
    ORDER BY source
    """


@stage(
    "corpus_yield_funnel",
    _yield_oracle(),
    doc="end-to-end corpus yield funnel — the per-domain report a "
    "training-data pipeline publishes for every crawl snapshot: "
    "documents in, after exact dedup (dedup_exact's min-doc_id "
    "survivor rule), after the quality gate (text_quality_score's "
    "length+stopword predicate in cross-multiplied INTEGER form — "
    "n_stop*100 >= n_tokens, no float boundary), after eval-set "
    "decontamination (eval_decontaminate_exact_ngrams' 13-gram "
    "broadcast rule, doc_id % 53 == 0 playing the eval set), and the "
    "token count the surviving set contributes. Stages are "
    "SEQUENTIAL (each counts the docs passing it AND every earlier "
    "gate), so each row is a monotone funnel — the drop between "
    "columns is each stage's cost, the last column is what you train "
    "on. 100 TB shape: the dedup flag is one digest-keyed aggregate "
    "+ join-back (32-byte shuffle width), the quality flag is "
    "map-only, the decontam flag reuses the broadcast-gram semijoin "
    "(corpus text never shuffles), and the funnel itself is ONE "
    "|domains|-bounded aggregate.",
)
def corpus_yield_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from market_pulse_data_pipeline_spark.functions.dedup import (  # noqa: PLC0415
        _MERSENNE,
        portable_hash60,
    )

    docs = t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    train = docs.filter(F.col("doc_id") % _YF_EVAL_MOD != 0).select(
        "doc_id",
        "source",
        "text",
        F.size(toks).alias("n_tokens"),
        F.size(F.filter(toks, lambda w: w.isin(STOPWORDS))).alias("n_stop"),
        F.md5(F.encode("text", "utf-8")).alias("h"),
    )
    survivors = train.groupBy("h").agg(F.min("doc_id").alias("keep_id"))

    def grams(df: DataFrame) -> DataFrame:
        tk = df.select("doc_id", F.split("text", " ").alias("ws")).filter(
            F.size("ws") >= _YF_N
        )
        g = lambda i: F.pmod(  # noqa: E731
            portable_hash60(F.concat_ws(" ", F.slice(F.col("ws"), i, _YF_N))),
            F.lit(_MERSENNE),
        )
        return tk.select(
            "doc_id",
            F.explode(
                F.transform(F.sequence(F.lit(1), F.size("ws") - (_YF_N - 1)), g)
            ).alias("g"),
        )

    eval_grams = (
        grams(docs.filter(F.col("doc_id") % _YF_EVAL_MOD == 0))
        .select("g")
        .distinct()
    )
    hits = (
        grams(train.select("doc_id", "text"))
        .join(F.broadcast(eval_grams), "g")
        .select("doc_id")
        .distinct()
        .withColumn("hit", F.lit(True))
    )
    flagged = (
        train.join(survivors, "h")
        .join(hits, "doc_id", "left")
        .select(
            "source",
            "n_tokens",
            (F.col("doc_id") == F.col("keep_id")).alias("survives_dedup"),
            (
                (F.col("n_tokens") >= _YF_MIN_TOKENS)
                & (F.col("n_stop") * 100 >= F.col("n_tokens") * _YF_STOP_PCT)
            ).alias("passes_quality"),
            F.col("hit").isNull().alias("clean"),
        )
    )
    keep2 = F.col("survives_dedup") & F.col("passes_quality")
    keep3 = keep2 & F.col("clean")
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_raw"),
            F.sum(F.when(F.col("survives_dedup"), 1).otherwise(0))
            .cast("long")
            .alias("n_after_dedup"),
            F.sum(F.when(keep2, 1).otherwise(0))
            .cast("long")
            .alias("n_after_quality"),
            F.sum(F.when(keep3, 1).otherwise(0))
            .cast("long")
            .alias("n_after_decontam"),
            F.sum(F.when(keep3, F.col("n_tokens")).otherwise(0))
            .cast("long")
            .alias("tokens_out"),
        )
        .orderBy("source")
    )
