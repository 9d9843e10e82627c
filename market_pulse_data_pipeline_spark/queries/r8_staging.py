"""Round-8 registrations — staged and triple-gated in round 7
(implementations, DuckDB value-hash oracles, and pytest semantic pins
landed then; registration deferred so the round-7 addition budget
stayed at ≤3), registered here per VERDICT round-7 item 2. The names
head the round-9 window (``_R9_FIRST_WITNESS``, queries/__init__.py),
taking their first driver witness without having displaced a verified
window slot in round 8.

All extend the LLM-training-data surface with famous pipeline steps
the registry did not yet cover:

- ``ccnet_perplexity_buckets`` — CCNet's quality partitioning (Wenzek
  et al., LREC 2020): score every document with a language-model
  signal, split EACH LANGUAGE into head/middle/tail terciles by that
  score, and keep head+middle. The per-language split is the point —
  an absolute threshold would throw away low-resource languages
  wholesale. The LM stands in as the registry's model-free
  ``bigram_fluency_score`` (mean inverse conditional bigram
  probability under the corpus MLE — low = fluent), and the terciles
  are NTILE(3) under a total order (score, doc_id), so bucket
  membership is integer-exact cross-engine: no float percentile
  boundary anywhere.
- ``mixture_temperature_weights`` — temperature-based mixture
  re-weighting (the multilingual sampling recipe of mBERT / XLM-R,
  Devlin et al. 2019 appendix, Conneau et al. 2020: sample languages
  ∝ p^α to up-weight low-resource ones). α = 0.5, so the re-weight is
  ``sqrt`` — correctly-rounded IEEE, bit-identical across engines —
  and the normalization runs through the exact-decimal sum + decimal
  quotient route, so every emitted weight hash-matches. Emits per
  language: document count, raw share p, temperature weight, and the
  up/down-sampling factor weight/p.
- ``winnowing_fingerprint_pairs`` — winnowing fingerprints (Schleimer,
  Wilkerson & Aiken, SIGMOD 2003; the MOSS plagiarism detector):
  min-of-window selection over k-gram hashes gives a fingerprint set
  with a GUARANTEE — any shared run of ≥ w+k-1 tokens shares a
  fingerprint — where MinHash only offers probability. Docs sharing
  ≥ T selected fingerprints pair as candidates; planted tail-extended
  copies witness the guarantee (a suffix edit only perturbs trailing
  windows).
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


# --------------------------------------------------------------------
# ccnet_perplexity_buckets
# --------------------------------------------------------------------

# the registered bigram_fluency_score shape (queries/sketches.py),
# with lang carried through for the per-language tercile split
_CCNET_SCORE_SQL = f"""
    WITH bg AS (
      SELECT doc_id, lang, bigram, split_part(bigram, ' ', 1) AS w1
      FROM (
        SELECT doc_id, lang,
               UNNEST(list_transform(range(1, len(ws)),
                                     i -> ws[i] || ' ' || ws[i + 1])) AS bigram
        FROM (SELECT doc_id, lang, string_split(text, ' ') AS ws
              FROM documents)
        WHERE len(ws) >= 2
      )
    ),
    c2 AS (SELECT bigram, COUNT(*) AS n2 FROM bg GROUP BY 1),
    c1 AS (SELECT w1, COUNT(*) AS n1 FROM bg GROUP BY 1),
    scored AS (
      SELECT bg.doc_id, bg.lang,
             {sql_round_div(
        "CAST(SUM(CAST(CAST(c1.n1 AS DOUBLE) / c2.n2 AS DECIMAL(20,6)))"
        " AS DOUBLE)",
        "COUNT(*)",
    )} AS mean_inv_p
      FROM bg
      JOIN c2 USING (bigram)
      JOIN c1 USING (w1)
      GROUP BY bg.doc_id, bg.lang
    )"""


@register(
    "ccnet_perplexity_buckets",
    _CCNET_SCORE_SQL
    + """
    SELECT lang, doc_id, mean_inv_p,
           CASE tile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                     ELSE 'tail' END AS bucket,
           (tile <= 2) AS keep
    FROM (
      SELECT lang, doc_id, mean_inv_p,
             NTILE(3) OVER (PARTITION BY lang
                            ORDER BY mean_inv_p, doc_id) AS tile
      FROM scored
    )
    ORDER BY lang, doc_id
    """,
    doc="CCNet quality partitioning (Wenzek et al., LREC 2020): per "
    "LANGUAGE, split documents into head/middle/tail terciles by an "
    "LM fluency signal and keep head+middle — the per-lang split is "
    "what keeps low-resource languages alive where an absolute "
    "threshold would drop them wholesale. The LM is the registered "
    "model-free bigram fluency score (mean inverse conditional bigram "
    "probability, corpus MLE); buckets are NTILE(3) under the total "
    "order (score, doc_id), so membership is integer-exact on both "
    "engines — no float percentile boundary. 100 TB shape: the score "
    "is two token-keyed count aggregates + co-partitioned joins (the "
    "driver-green fluency plan), then ONE window partitioned by lang "
    "— the skew unit is a language, the classic case for AQE skew "
    "handling, and the rank never needs a global sort.",
)
def ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    toked = docs.select(
        "doc_id", "lang", F.split(F.col("text"), " ").alias("ws")
    ).filter(F.size("ws") >= 2)
    bg = toked.select(
        "doc_id",
        "lang",
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
    scored = (
        bg.join(c2, "bigram")
        .join(c1, "w1")
        .groupBy("doc_id", "lang")
        .agg(
            round_div(
                F.sum(term).cast("double"), F.count(F.lit(1))
            ).alias("mean_inv_p"),
        )
    )
    w = Window.partitionBy("lang").orderBy("mean_inv_p", "doc_id")
    tiled = scored.select(
        "lang", "doc_id", "mean_inv_p", F.ntile(3).over(w).alias("tile")
    )
    return tiled.select(
        "lang",
        "doc_id",
        "mean_inv_p",
        F.when(F.col("tile") == 1, "head")
        .when(F.col("tile") == 2, "middle")
        .otherwise("tail")
        .alias("bucket"),
        (F.col("tile") <= 2).alias("keep"),
    ).orderBy("lang", "doc_id")


# --------------------------------------------------------------------
# mixture_temperature_weights
# --------------------------------------------------------------------

# α = 0.5 exactly so the re-weight is sqrt — correctly-rounded IEEE,
# hence bit-identical across engines (a general pow(x, 0.3) is NOT
# correctly rounded everywhere and could diverge in the last ulp)


@register(
    "mixture_temperature_weights",
    f"""
    WITH counts AS (
      SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
    ),
    shares AS (
      SELECT lang, n,
             CAST(n AS DOUBLE) / (SELECT SUM(n) FROM counts) AS p,
             CAST(sqrt(CAST(n AS DOUBLE) / (SELECT SUM(n) FROM counts))
                  AS DECIMAL(28,12)) AS sq
      FROM counts
    )
    SELECT lang,
           CAST(n AS BIGINT) AS n_docs,
           {sql_round_div("p", "1")} AS p_raw,
           {sql_round_div(
        "CAST(sq AS DOUBLE)",
        "CAST((SELECT SUM(sq) FROM shares) AS DOUBLE)",
        6,
    )} AS weight,
           {sql_round_div(
        "CAST(sq AS DOUBLE)"
        " / CAST((SELECT SUM(sq) FROM shares) AS DOUBLE)",
        "p",
        6,
    )} AS boost
    FROM shares
    ORDER BY lang
    """,
    doc="temperature-based mixture re-weighting (the multilingual "
    "sampling recipe of mBERT/XLM-R: sample languages proportional to "
    "p^alpha, alpha=0.5, to up-weight low-resource languages without "
    "drowning high-resource ones). alpha=0.5 makes the re-weight "
    "sqrt — correctly-rounded IEEE, bit-identical on both engines — "
    "and the normalization runs each sqrt through DECIMAL(28,12) "
    "snapping so the cross-language sum is order-independent and "
    "exact. Emits per language: doc count, raw share p, temperature "
    "weight, and the up/down-sampling factor weight/p (the number a "
    "sampler multiplies into per-language inclusion probabilities). "
    "100 TB shape: one count aggregate on the |langs|-bounded key; "
    "everything after is arithmetic on a handful of rows.",
)
def mixture_temperature_weights(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    # the unpartitioned window runs over the |langs|-bounded counts
    # table (a handful of rows by construction), not the corpus — the
    # WindowExec single-partition warning is expected and scale-safe
    tot = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    shares = counts.select(
        "lang",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(tot)).alias("p"),
    ).withColumn("sq", F.sqrt(F.col("p")).cast("decimal(28,12)"))
    denom = F.sum("sq").over(tot).cast("double")
    return shares.select(
        "lang",
        F.col("n").cast("long").alias("n_docs"),
        round_div(F.col("p"), F.lit(1)).alias("p_raw"),
        round_div(F.col("sq").cast("double"), denom, 6).alias("weight"),
        round_div(
            F.col("sq").cast("double") / denom, F.col("p"), 6
        ).alias("boost"),
    ).orderBy("lang")


# --------------------------------------------------------------------
# winnowing_fingerprint_pairs
# --------------------------------------------------------------------

_WN_K = 4  # k-gram width (tokens)
_WN_W = 5  # winnowing window (hashes per window)
_WN_T = 3  # candidate gate: docs sharing >= T selected fingerprints
_WN_PLANT_OFFSET = 1_000_000_000


def _winnow_ctes() -> str:
    """The shared fingerprint CTE chain (planted corpus → k-gram
    hashes → min-of-window selection → candidate pairs) — the pair
    query and the cluster composition both build on it."""
    from market_pulse_data_pipeline_spark.functions.dedup import (  # noqa: PLC0415
        _MERSENNE,
    )

    h60 = (
        "(('0x' || substring(md5(array_to_string("
        f"list_slice(ws, i, i + {_WN_K - 1}), ' ')), 1, 15))::BIGINT"
        f" % {_MERSENNE})"
    )
    return f"""src AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + {_WN_PLANT_OFFSET}, text || ' winnow planted tail'
      FROM documents WHERE doc_id % 31 = 0
    ),
    toks AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM src
      WHERE len(string_split(text, ' ')) >= {_WN_K + _WN_W - 1}
    ),
    kg AS (
      SELECT doc_id,
             list_transform(range(1, len(ws) - {_WN_K - 1} + 1),
                            i -> {h60}) AS hs
      FROM toks
    ),
    fp AS (
      SELECT DISTINCT doc_id, UNNEST(
        list_transform(range(1, len(hs) - {_WN_W - 1} + 1),
                       j -> list_min(list_slice(hs, j, j + {_WN_W - 1})))
      ) AS fp
      FROM kg
    ),
    wpairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id > b.doc_id
      GROUP BY 1, 2
      HAVING COUNT(*) >= {_WN_T}
    )"""


def _winnow_oracle() -> str:
    return f"""
    WITH {_winnow_ctes()}
    SELECT doc_a, doc_b, n_shared FROM wpairs
    ORDER BY doc_a, doc_b
    """


@register(
    "winnowing_fingerprint_pairs",
    _winnow_oracle(),
    doc="winnowing document fingerprints (Schleimer, Wilkerson & Aiken, "
    "SIGMOD 2003 — the MOSS algorithm): hash every 4-token k-gram "
    "(portable 60-bit md5), slide a 5-hash window, select each "
    "window's minimum, and the distinct selected hashes are the doc's "
    "fingerprint set — any shared substring of at least w+k-1 tokens "
    "is GUARANTEED to share a fingerprint (the winnowing guarantee, "
    "which MinHash can only provide probabilistically). Docs sharing "
    ">= 3 fingerprints pair as plagiarism/near-dup candidates; "
    "planted tail-extended copies witness the contract (a suffix edit "
    "only perturbs the trailing windows). 100 TB shape: selection is "
    "JVM higher-order transforms per doc (map-only), the pair join is "
    "keyed on the fingerprint — density ~2/(w+1) of k-gram count, so "
    "the inverted index is a fraction of shingle-join size — and the "
    "gate aggregates per pair. All-integer arithmetic, bit-identical "
    "cross-engine.",
)
def winnowing_fingerprint_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _winnow_pairs(spark, sf_dir).orderBy("doc_a", "doc_b")


def _winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_a, doc_b, n_shared) winnowing candidate pairs over the
    planted corpus — shared by the pair query and the cluster
    composition below."""
    from market_pulse_data_pipeline_spark.functions.dedup import (  # noqa: PLC0415
        _MERSENNE,
        portable_hash60,
    )

    docs = t(spark, sf_dir, "documents")
    src = docs.select("doc_id", "text").unionByName(
        docs.filter(F.col("doc_id") % 31 == 0).select(
            (F.col("doc_id") + _WN_PLANT_OFFSET).alias("doc_id"),
            F.concat("text", F.lit(" winnow planted tail")).alias("text"),
        )
    )
    toks = src.select(
        "doc_id", F.split("text", " ").alias("ws")
    ).filter(F.size("ws") >= _WN_K + _WN_W - 1)
    kgram_hash = lambda i: F.pmod(  # noqa: E731
        portable_hash60(F.concat_ws(" ", F.slice(F.col("ws"), i, _WN_K))),
        F.lit(_MERSENNE),
    )
    kg = toks.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(1), F.size("ws") - (_WN_K - 1)), kgram_hash
        ).alias("hs"),
    )
    fp = (
        kg.select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("hs") - (_WN_W - 1)),
                    lambda j: F.array_min(F.slice(F.col("hs"), j, _WN_W)),
                )
            ).alias("fp"),
        )
        .distinct()
        # materialize once: both self-join sides consume the
        # fingerprint set, and the lazy form re-ran the whole
        # scan -> k-gram -> window-min pipeline per side (8 document
        # scans in the audited winnowing_cluster_dedup plan)
        .localCheckpoint()
    )
    a = fp.select(F.col("doc_id").alias("doc_a"), "fp")
    b = fp.select(F.col("doc_id").alias("doc_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("doc_a") > F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= _WN_T)
    )


# --------------------------------------------------------------------
# winnowing_cluster_dedup (round-8 addition, VERDICT r7 item 6c)
# --------------------------------------------------------------------


def _winnow_cluster_oracle() -> str:
    """Winnowing pairs composed into connected components — the same
    WITH RECURSIVE transitive-closure pattern proven by
    dedup_cluster_assignment (queries/scale_paths.py)."""
    return f"""
    WITH RECURSIVE {_winnow_ctes()},
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM wpairs
      UNION ALL
      SELECT doc_b, doc_a FROM wpairs
    ),
    reach(id, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, reach.r FROM edges e JOIN reach ON reach.id = e.dst
    ),
    comp AS (
      SELECT id, MIN(r) AS component FROM reach GROUP BY id
    ),
    csizes AS (
      SELECT component, COUNT(*) AS cluster_size FROM comp GROUP BY component
    )
    SELECT comp.id AS doc_id, comp.component AS cluster_id,
           csizes.cluster_size, comp.id = comp.component AS is_kept
    FROM comp JOIN csizes USING (component)
    ORDER BY doc_id
    """


@register(
    "winnowing_cluster_dedup",
    _winnow_cluster_oracle(),
    doc="winnowing-based cluster dedup (VERDICT r7 item 6c): the MOSS "
    "fingerprint candidate pairs composed into connected components "
    "with min-id representatives — (doc, cluster, size, kept), the "
    "cluster-and-keep step of a fingerprint-guaranteed dedup pipeline. "
    "Reuses winnowing_fingerprint_pairs' pair machinery verbatim and "
    "the driver-green min-label-propagation operator "
    "(functions/graph.py::dedup_clusters, per-round lineage "
    "truncation); oracle is the DuckDB WITH RECURSIVE transitive "
    "closure proven by dedup_cluster_assignment. 100 TB shape: the "
    "edge set is candidate-bounded by the winnowing gate (never "
    "all-pairs), propagation shuffles only the frontier per round, "
    "and rounds are logarithmic in cluster diameter — near-dup "
    "clusters are shallow (planted tails give diameter 1).",
)
def winnowing_cluster_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from market_pulse_data_pipeline_spark.functions.graph import (  # noqa: PLC0415
        dedup_clusters,
    )

    pairs = _winnow_pairs(spark, sf_dir)
    return dedup_clusters(pairs.select("doc_a", "doc_b")).orderBy("doc_id")


# --------------------------------------------------------------------
# eval_decontaminate_exact_ngrams (round-8 addition, VERDICT r7 item 6a)
# --------------------------------------------------------------------

_DC_N = 13  # the GPT-3/PaLM decontamination n-gram order
_DC_EVAL_MOD = 53  # doc_id % 53 == 0 plays the held-out eval set
_DC_LEAK_MOD = 2 * _DC_EVAL_MOD  # every 2nd eval doc leaks verbatim
_DC_PLANT_OFFSET = 1_000_000_000  # same fixture-guard regime as LSH


def _decontam_oracle() -> str:
    from market_pulse_data_pipeline_spark.functions.dedup import (  # noqa: PLC0415
        _MERSENNE,
    )

    h60 = (
        "(('0x' || substring(md5(array_to_string("
        f"list_slice(ws, i, i + {_DC_N - 1}), ' ')), 1, 15))::BIGINT"
        f" % {_MERSENNE})"
    )
    return f"""
    WITH train AS (
      SELECT doc_id, text FROM documents WHERE doc_id % {_DC_EVAL_MOD} <> 0
      UNION ALL
      SELECT doc_id + {_DC_PLANT_OFFSET}, text FROM documents
      WHERE doc_id % {_DC_LEAK_MOD} = 0
    ),
    eg AS (
      SELECT DISTINCT UNNEST(
        list_transform(range(1, len(ws) - {_DC_N - 1} + 1), i -> {h60})
      ) AS g
      FROM (SELECT string_split(text, ' ') AS ws FROM documents
            WHERE doc_id % {_DC_EVAL_MOD} = 0)
      WHERE len(ws) >= {_DC_N}
    ),
    tg AS (
      SELECT DISTINCT doc_id, UNNEST(
        list_transform(range(1, len(ws) - {_DC_N - 1} + 1), i -> {h60})
      ) AS g
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM train)
      WHERE len(ws) >= {_DC_N}
    ),
    hits AS (
      SELECT tg.doc_id, CAST(COUNT(*) AS BIGINT) AS n
      FROM tg JOIN eg USING (g) GROUP BY 1
    )
    SELECT train.doc_id,
           COALESCE(hits.n, 0) AS n_eval_ngrams,
           COALESCE(hits.n, 0) > 0 AS contaminated
    FROM train LEFT JOIN hits USING (doc_id)
    ORDER BY doc_id
    """


@register(
    "eval_decontaminate_exact_ngrams",
    _decontam_oracle(),
    doc="eval-set decontamination as an asymmetric broadcast join "
    "(VERDICT r7 item 6a — the GPT-3 appendix-C / PaLM production "
    "shape): drop every training document sharing ANY 13-gram with "
    "the held-out eval set (doc_id % 53 == 0 plays the eval role). "
    "Emits the full per-document decision — distinct-13-gram hit "
    "count and the contaminated flag — for every training doc, "
    "including the <13-token ones that can't collide (n=0, kept: "
    "faithful to the real algorithm). Planted verbatim leaks (every "
    "2nd eval doc re-keyed past 1e9 into the training side) witness "
    "the contract: a >=13-token leak MUST flag. Shingles are the "
    "proven portable 60-bit md5 hashes, so the eval side collapses "
    "to a DISTINCT int64 set. 100 TB shape: eval sets are tiny "
    "relative to the corpus (~1e7 grams = tens of MB hashed), so the "
    "gram set broadcasts and the corpus-side scan is map-only with "
    "one doc-keyed count — no corpus shuffle on text; swap in "
    "bloom_filter_prejoin's sketch if the eval set ever outgrows the "
    "broadcast threshold. Differs from contamination_ngram_overlap "
    "(the per-PAIR diagnostic): this is the per-doc KEEP/DROP "
    "decision a pipeline actually executes.",
)
def eval_decontaminate_exact_ngrams(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from market_pulse_data_pipeline_spark.functions.dedup import (  # noqa: PLC0415
        _MERSENNE,
        portable_hash60,
    )

    docs = t(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % _DC_EVAL_MOD != 0).select(
        "doc_id", "text"
    ).unionByName(
        # planted verbatim leaks: the eval texts the decontaminator
        # MUST catch (tests pin leaked >=13-token docs all flag)
        docs.filter(F.col("doc_id") % _DC_LEAK_MOD == 0).select(
            (F.col("doc_id") + _DC_PLANT_OFFSET).alias("doc_id"), "text"
        )
    )

    def grams(df: DataFrame) -> DataFrame:
        toks = df.select("doc_id", F.split("text", " ").alias("ws")).filter(
            F.size("ws") >= _DC_N
        )
        h = lambda i: F.pmod(  # noqa: E731
            portable_hash60(
                F.concat_ws(" ", F.slice(F.col("ws"), i, _DC_N))
            ),
            F.lit(_MERSENNE),
        )
        return toks.select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("ws") - (_DC_N - 1)), h
                )
            ).alias("g"),
        )

    eval_grams = (
        grams(docs.filter(F.col("doc_id") % _DC_EVAL_MOD == 0))
        .select("g")
        .distinct()
    )
    # join FIRST, dedup AFTER: the broadcast join filters corpus grams
    # map-side down to the (tiny) hit set, so the per-doc distinct
    # count shuffles only survivors — a pre-join distinct() would
    # shuffle the FULL corpus gram set, the one cost this shape exists
    # to avoid at 100 TB
    hits = (
        grams(train)
        .join(F.broadcast(eval_grams), "g")
        .groupBy("doc_id")
        .agg(F.count_distinct("g").alias("n"))
    )
    return (
        train.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias(
                "n_eval_ngrams"
            ),
            (F.coalesce(F.col("n"), F.lit(0)) > 0).alias("contaminated"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------
# boilerplate_sentence_removal (round-8 addition #3)
# --------------------------------------------------------------------

_BP_W = 10  # tokens per pseudo-sentence (sentence_dedup_profile's unit)
_BP_DF = 5  # boilerplate gate: sentence in > 5 DISTINCT documents
_BP_MOD = 7  # doc_id % 7 == 0 carries the planted site banner
# exactly 10 tokens, so the planted banner IS pseudo-sentence 0 of
# every planted doc and the original text's window grid shifts intact
_BP_BANNER = (
    "subscribe now terms of service privacy policy applies all rights"
)


@register(
    "boilerplate_sentence_removal",
    f"""
    WITH src AS (
      SELECT doc_id,
             CASE WHEN doc_id % {_BP_MOD} = 0
                  THEN '{_BP_BANNER} ' || text ELSE text END AS text
      FROM documents
    ),
    sents AS (
      SELECT doc_id,
             CAST((g.start - 1) / {_BP_W} AS INTEGER) AS sent_id,
             array_to_string(list_slice(ws, g.start,
                                        g.start + {_BP_W} - 1), ' ')
               AS sent_text
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM src),
           UNNEST(generate_series(1, len(ws), {_BP_W})) AS g(start)
    ),
    dfc AS (
      SELECT md5(sent_text) AS h, COUNT(DISTINCT doc_id) AS df
      FROM sents GROUP BY 1
    ),
    flagged AS (
      SELECT s.doc_id, s.sent_id, s.sent_text,
             d.df > {_BP_DF} AS is_bp,
             len(string_split(s.sent_text, ' ')) AS n_toks
      FROM sents s JOIN dfc d ON md5(s.sent_text) = d.h
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_sents,
           CAST(SUM(CASE WHEN is_bp THEN 1 ELSE 0 END) AS BIGINT)
             AS n_removed,
           CAST(SUM(CASE WHEN is_bp THEN 0 ELSE n_toks END) AS BIGINT)
             AS n_tokens_clean,
           md5(COALESCE(string_agg(CASE WHEN is_bp THEN NULL
                                        ELSE sent_text END,
                                   ' ' ORDER BY sent_id), ''))
             AS clean_md5
    FROM flagged
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    doc="boilerplate sentence removal — the cleanup ACTION "
    "sentence_dedup_profile only diagnoses (CCNet/C4 strip repeated "
    "site furniture before dedup and quality scoring): any 10-token "
    "pseudo-sentence appearing in > 5 DISTINCT documents is "
    "boilerplate; strip it everywhere and reassemble each document "
    "from its surviving sentences in order. A planted 10-token site "
    "banner prefixed onto every doc_id % 7 == 0 doc witnesses the "
    "contract (banner df >> gate, so every planted doc MUST lose "
    "sentence 0 and unplanted text passes through byte-identical — "
    "both pinned in tests). Emits per doc: sentence count, removed "
    "count, surviving token count, and md5 of the reassembled text "
    "(hash-comparable without shipping full text through the "
    "harness). 100 TB shape: one aggregate keyed on the 16-byte "
    "sentence digest (uniformly distributed, no skew) finds the "
    "boilerplate set, which is TINY by construction (df > 5 means "
    "|set| <= corpus_sentences / 5) and broadcasts; the flag join is "
    "then map-only and the reassembly is ONE doc-keyed aggregate — "
    "two shuffles total, text shuffled once.",
)
def boilerplate_sentence_removal(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    src = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % _BP_MOD == 0,
            F.concat(F.lit(_BP_BANNER + " "), F.col("text")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    toks = F.split("text", " ")
    sents = src.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(1), F.size(toks), F.lit(_BP_W))
        ).alias("start"),
        toks.alias("tk"),
    ).select(
        "doc_id",
        ((F.col("start") - 1) / _BP_W).cast("int").alias("sent_id"),
        F.array_join(
            F.slice(F.col("tk"), F.col("start"), _BP_W), " "
        ).alias("sent_text"),
    ).withColumn("h", F.md5(F.col("sent_text").cast("binary")))
    # the boilerplate set is small by construction (each member needs
    # > _BP_DF distinct docs), so it broadcasts and the flag join on
    # the full sentence stream stays map-only
    bp = (
        sents.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter(F.col("df") > _BP_DF)
        .select("h", F.lit(True).alias("is_bp"))
    )
    flagged = sents.join(F.broadcast(bp), "h", "left").select(
        "doc_id",
        "sent_id",
        "sent_text",
        F.coalesce(F.col("is_bp"), F.lit(False)).alias("is_bp"),
        F.size(F.split("sent_text", " ")).alias("n_toks"),
    )
    # collect_list skips the NULLs when() leaves on boilerplate rows,
    # so the sort+join reassembles exactly the surviving sentences
    kept_sent = F.when(
        ~F.col("is_bp"), F.struct("sent_id", "sent_text")
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sents"),
            F.sum(F.when(F.col("is_bp"), 1).otherwise(0))
            .cast("long")
            .alias("n_removed"),
            F.sum(F.when(F.col("is_bp"), 0).otherwise(F.col("n_toks")))
            .cast("long")
            .alias("n_tokens_clean"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(kept_sent)),
                        lambda s: s["sent_text"],
                    ),
                    " ",
                ).cast("binary")
            ).alias("clean_md5"),
        )
        .orderBy("doc_id")
    )
