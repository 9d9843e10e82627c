"""Deduplication operators over `documents` (north-star extension).

- exact dedup: hash-groupBy on content digest — one shuffle on the
  digest, scales linearly.
- n-gram Jaccard near-dup: shingle → inverted-index self-join → count
  intersections. The self-join is bucketed by shingle, which is how the
  candidate set stays bounded at scale (only docs sharing a shingle are
  compared); a deterministic doc sample keeps the oracle cheap at sf0.01.
- MinHash/LSH and SimHash live in functions.dedup (bench/scale path;
  signature hashing is engine-specific so those register rows-only).
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

_JACCARD_THRESHOLD = 0.02
_SAMPLE_MOD = 7  # deterministic doc sample: doc_id % 7 == 0
_MAX_SHINGLE_DF = 20  # stop-phrase cap: shingles in > N docs leave the index


@register(
    "dedup_exact",
    """
    SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
    bench=True,
    doc="exact dedup via content-hash groupBy (keep lowest doc_id)",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return (
        docs.select(F.md5(F.encode("text", "utf-8")).alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def _shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per doc, built with JVM-side
    collection functions (transform over a sequence of start offsets)."""
    toks = docs.select("doc_id", F.split("text", " ").alias("ws")).filter(
        F.size("ws") >= n
    )
    shingle_expr = F.transform(
        F.sequence(F.lit(0), F.size("ws") - n),
        lambda i: F.concat_ws(
            " ", F.col("ws")[i], F.col("ws")[i + 1], F.col("ws")[i + 2]
        ),
    )
    return toks.select("doc_id", F.explode(shingle_expr).alias("sh")).distinct()


def ngram_jaccard_pairs(
    docs: DataFrame, threshold: float, max_df: int = 20
) -> DataFrame:
    """(doc_a, doc_b, intersection, jaccard) for every doc pair sharing a
    3-word shingle with Jaccard ≥ threshold — the exact (non-approximate)
    near-dup pair builder. The inverted-index self-join is bucketed by
    shingle; at 100 TB the approximate MinHash-LSH path replaces this.

    ``max_df`` drops shingles appearing in more than that many documents
    BEFORE the self-join (standard stop-phrase removal): a shingle shared
    by k docs emits k² candidate rows, so one hot stop-phrase is a
    quadratic scale-killer. Jaccard is computed over the df-capped
    shingle universe (sizes and intersections consistently), keeping the
    operator exactly oracle-expressible. See SCALING.md."""
    # materialize the shingle set ONCE: four consumers (the hot-shingle
    # df aggregate, the per-doc sizes, and both sides of the candidate
    # self-join) otherwise each re-run the scan -> split -> shingle
    # pipeline (8 document scans in the audited plan before round 12).
    # The later consumers redo only the cheap broadcast anti-join over
    # the materialized rows.
    sh = _shingles(docs).localCheckpoint()
    # hot shingles are few by definition → broadcast the anti-join side
    hot = (
        sh.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > max_df)
        .select("sh")
    )
    sh = sh.join(F.broadcast(hot), "sh", "left_anti")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("intersection"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("intersection") * F.lit(1.0) / (
        F.col("sa.n") + F.col("sb.n") - F.col("intersection")
    )
    return (
        pairs.join(F.broadcast(sa), F.col("doc_a") == F.col("sa.doc_id"))
        .join(F.broadcast(sb), F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= threshold)
        .select(
            "doc_a",
            "doc_b",
            "intersection",
            round_div(
                F.col("intersection") * F.lit(1.0),
                F.col("sa.n") + F.col("sb.n") - F.col("intersection"),
                6,
            ).alias("jaccard"),
        )
    )


@register(
    "dedup_ngram_jaccard",
    f"""
    WITH docs AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
      WHERE doc_id % {_SAMPLE_MOD} = 0
    ), sh0 AS (
      SELECT DISTINCT doc_id,
             UNNEST(list_transform(range(1, len(ws) - 1),
                    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS sh
      FROM docs WHERE len(ws) >= 3
    ), sh AS (
      SELECT * FROM sh0 WHERE sh NOT IN (
        SELECT sh FROM sh0 GROUP BY sh HAVING COUNT(*) > {_MAX_SHINGLE_DF})
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS intersection
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, intersection,
           {sql_round_div('intersection * 1.0',
                          'sa.n + sb.n - intersection', 6)} AS jaccard
    FROM pairs
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE intersection * 1.0 / (sa.n + sb.n - intersection) >= {_JACCARD_THRESHOLD}
    """,
    doc="n-gram Jaccard near-dup: 3-word shingles, df-capped inverted-"
    "index self-join (stop-phrase shingles with df > 20 dropped on both "
    "sides — the k² hot-shingle guard), |A∩B| / |A∪B| ≥ threshold; "
    "deterministic doc sample",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").filter(
        F.col("doc_id") % _SAMPLE_MOD == 0
    )
    return ngram_jaccard_pairs(docs, _JACCARD_THRESHOLD, _MAX_SHINGLE_DF)


_SPAN_W = 16  # exact-substring window (tokens)


@register(
    "exact_substring_spans",
    f"""
    WITH tokd AS (
      SELECT doc_id, string_split(lower(text), ' ') AS toks
      FROM documents
    ),
    sh AS (
      SELECT doc_id, u.i,
             md5(array_to_string(
               list_slice(toks, u.i + 1, u.i + {_SPAN_W}), ' ')) AS h
      FROM tokd, UNNEST(range(len(toks) - {_SPAN_W - 1})) AS u(i)
      WHERE len(toks) >= {_SPAN_W}
    ),
    dup AS (
      SELECT h FROM sh GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    hits AS (SELECT s.doc_id, s.i FROM sh s JOIN dup USING (h)),
    isl AS (
      SELECT doc_id, i,
             i - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS grp
      FROM hits
    )
    SELECT doc_id, MIN(i) AS start_tok,
           MAX(i) + {_SPAN_W - 1} AS end_tok,
           COUNT(*) AS n_shingles
    FROM isl GROUP BY doc_id, grp
    """,
    doc=f"exact-substring duplicate spans: every maximal token range "
    f"covered by {_SPAN_W}-token shingles that appear verbatim in >= 2 "
    "documents — the cut-list an exact-substring dedup pass removes "
    "from a training corpus. Shape: shingle+md5 (map-only, the hash "
    "caps shuffle width at 32 bytes/shingle), ONE groupBy(h) with a "
    "distinct-doc HAVING — duplicated spans are found without ever "
    "forming document PAIRS, so cost is linear in total shingles even "
    "when a boilerplate shingle occurs in thousands of docs; span "
    "merge is a per-doc gaps-and-islands window.",
)
def exact_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window  # noqa: PLC0415

    docs = t(spark, sf_dir, "documents")
    tokd = docs.select(
        "doc_id", F.split(F.lower("text"), " ").alias("toks")
    ).filter(F.size("toks") >= _SPAN_W)
    sh = tokd.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("toks") - _SPAN_W),
                lambda i: F.md5(
                    F.concat_ws(" ", F.slice("toks", i + 1, _SPAN_W))
                ),
            )
        ).alias("i", "h"),
    )
    dup = (
        sh.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    hits = sh.join(dup, "h").select("doc_id", "i")
    w = Window.partitionBy("doc_id").orderBy("i")
    isl = hits.withColumn("grp", F.col("i") - F.row_number().over(w))
    return (
        isl.groupBy("doc_id", "grp")
        .agg(
            F.min("i").alias("start_tok"),
            (F.max("i") + F.lit(_SPAN_W - 1)).alias("end_tok"),
            F.count(F.lit(1)).alias("n_shingles"),
        )
        .drop("grp")
    )


@register(
    "dedup_survivor_policy",
    """
    SELECT text_hash, keep_doc_id, n_copies FROM (
      SELECT md5(text) AS text_hash, doc_id AS keep_doc_id,
             COUNT(*) OVER (PARTITION BY md5(text)) AS n_copies,
             ROW_NUMBER() OVER (
               PARTITION BY md5(text)
               ORDER BY n_chars DESC,
                        CASE lang WHEN 'en' THEN 0 ELSE 1 END,
                        doc_id
             ) AS rn
      FROM documents
    ) WHERE rn = 1
    """,
    doc="dedup survivor SELECTION POLICY: where dedup_exact keeps "
    "min(doc_id), real pipelines keep the BEST copy per duplicate "
    "group — here longest text first, then preferred language, then "
    "id as the deterministic tiebreak. One window per content-hash "
    "partition (content hashes are uniform, zero skew); the policy is "
    "an ORDER BY expression, so swapping in a quality score column "
    "changes one line. Returns one survivor row per distinct content.",
)
def dedup_survivor_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window  # noqa: PLC0415

    docs = t(spark, sf_dir, "documents")
    hashed = docs.select(
        F.md5(F.encode("text", "utf-8")).alias("text_hash"),
        "doc_id",
        "n_chars",
        "lang",
    )
    w = Window.partitionBy("text_hash")
    w_rank = w.orderBy(
        F.col("n_chars").desc(),
        F.when(F.col("lang") == "en", 0).otherwise(1),
        "doc_id",
    )
    return (
        hashed.select(
            "text_hash",
            F.col("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).over(w).alias("n_copies"),
            F.row_number().over(w_rank).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select("text_hash", "keep_doc_id", "n_copies")
    )


_PF_T = 0.4  # prefix-filter Jaccard threshold


@register(
    "dedup_prefix_filter_join",
    f"""
    WITH docs AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id,
             UNNEST(list_transform(range(1, len(ws) - 1),
                    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS sh
      FROM docs WHERE len(ws) >= 3
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS intersection
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, intersection,
           {sql_round_div('intersection * 1.0',
                          'sa.n + sb.n - intersection', 6)} AS jaccard
    FROM pairs
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE intersection * 1.0 / (sa.n + sb.n - intersection) >= {_PF_T}
    """,
    doc="prefix-filtered exact similarity join (SSJoin/all-pairs "
    f"prefix principle): for Jaccard >= {_PF_T}, rank each doc's "
    "shingles by a global (df, shingle) order and index only the "
    "first |S| - ceil(t|S|) + 1 — any qualifying pair must collide "
    "inside both prefixes, so the self-join touches the RAREST "
    "shingles only and hot boilerplate never fans out. Candidates "
    "are then verified with exact intersection counts. THE ORACLE IS "
    "THE UNOPTIMIZED BRUTE-FORCE JOIN over the full inverted index — "
    "the hash match is a machine-checked completeness proof that the "
    "prefix filter loses no pair. Complements the df-capped "
    "dedup_ngram_jaccard (which trades recall for a hard fan-out cap) "
    "and MinHash-LSH (probabilistic): this path is exact AND "
    "skew-proof, the right tool when the threshold is high. Ordering "
    "contract (measured in SCALING.md): run AFTER exact dedup — "
    "byte-identical docs share their whole prefix, which no "
    "similarity filter can bound.",
)
def dedup_prefix_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window  # noqa: PLC0415

    docs = t(spark, sf_dir, "documents")
    # five consumers (sizes, df, rank, verify x2) — materialize once
    sh = _shingles(docs, 3).cache()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    df_counts = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    ranked = (
        sh.join(df_counts, "sh")
        .withColumn(
            "pos",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("df", "sh")
            ),
        )
        .join(sizes, "doc_id")
    )
    # prefix length |S| - ceil(t|S|) + 1, per doc
    prefix = ranked.filter(
        F.col("pos") <= F.col("n") - F.ceil(F.lit(_PF_T) * F.col("n")) + 1
    ).select("doc_id", "sh")
    cand = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    # verify candidates with exact intersection counts (candidate set is
    # collision-bounded, so these joins are small)
    inter = (
        cand.join(sh.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(
            sh.alias("sb"),
            (F.col("doc_b") == F.col("sb.doc_id"))
            & (F.col("sa.sh") == F.col("sb.sh")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("intersection"))
    )
    jac = round_div(
        F.col("intersection") * F.lit(1.0),
        F.col("sa.n") + F.col("sb.n") - F.col("intersection"),
        6,
    )
    raw_j = (F.col("intersection") * 1.0) / (
        F.col("sa.n") + F.col("sb.n") - F.col("intersection")
    )
    return (
        inter.join(sizes.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sizes.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .filter(raw_j >= _PF_T)
        .select("doc_a", "doc_b", "intersection", jac.alias("jaccard"))
    )
