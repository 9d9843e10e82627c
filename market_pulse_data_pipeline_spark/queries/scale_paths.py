"""Scale-path operators as driver-contract queries.

MinHash-LSH / SimHash / LSH-ANN signatures hash with engine-specific
functions (xxhash64), so DuckDB cannot reproduce them — these register
as rows-only checks (the driver records the weaker gate; pytest verifies
their semantics against exact baselines).

Near-duplicate queries plant their own duplicates (a mutated copy of
each sampled document) so the result is provably non-empty and the
detector's output is a deterministic, judgeable set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from market_pulse_data_pipeline_spark.functions.dedup import (
    minhash_near_duplicates,
    simhash_near_duplicates,
)
from market_pulse_data_pipeline_spark.functions.multimodal import (
    decode_media,
    documents_to_media,
    frame_sample,
)
from market_pulse_data_pipeline_spark.functions.similarity import (
    embedding_near_duplicates,
    lsh_ann_topk,
)
from market_pulse_data_pipeline_spark.queries.common import register, t

_PLANT_OFFSET = 1_000_000


def _docs_with_planted_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ mutated copies (sampled): copy keeps the text except one
    appended token — near-identical shingle sets, Jaccard ≈ 1."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    mutated = docs.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + _PLANT_OFFSET).alias("doc_id"),
        F.concat("text", F.lit(" planted")).alias("text"),
    )
    return docs.unionByName(mutated)


@register(
    "minhash_lsh_near_dups",
    None,
    bench=True,
    doc="MinHash(64 perms)+LSH(16 bands) near-dup pairs on planted "
    "duplicates; est. Jaccard ≥ 0.5 — rows-only (engine-specific hashing); "
    "semantics pytest-verified against exact n-gram Jaccard",
)
def minhash_lsh_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_with_planted_dups(spark, sf_dir)
    return minhash_near_duplicates(docs, threshold=0.5).orderBy("doc_a", "doc_b")


@register(
    "simhash_near_dups",
    None,
    doc="64-bit SimHash near-dup pairs (Hamming ≤ 3, pigeonhole chunk "
    "candidates) on planted duplicates — rows-only",
)
def simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_with_planted_dups(spark, sf_dir)
    return simhash_near_duplicates(docs, max_hamming=3).orderBy("doc_a", "doc_b")


@register(
    "ann_lsh_topk",
    None,
    bench=True,
    doc="LSH-ANN top-10 (16 hyperplanes, Hamming-probe ≤ 6) against the "
    "vec_id=0 query vector — approximate twin of similarity_topk_cosine; "
    "recall pytest-verified against brute force",
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").head()
    q = [float(x) for x in qrow["embedding"]]
    return lsh_ann_topk(
        emb.filter(F.col("vec_id") != 0), q, dim=len(q), k=10
    )


@register(
    "embedding_near_dups",
    None,
    doc="embedding-cosine near-dup pairs (cos ≥ 0.98) via LSH chunk "
    "bucketing, on planted perturbed copies — rows-only",
)
def embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = emb.filter(F.col("vec_id") % 13 == 0).select(
        (F.col("vec_id") + _PLANT_OFFSET).alias("vec_id"),
        F.transform(
            F.col("embedding"), lambda x: (x * 1.001).cast("float")
        ).alias("embedding"),
    )
    both = emb.unionByName(planted)
    dim = len(emb.select("embedding").head()["embedding"])
    return embedding_near_duplicates(both, dim=dim, threshold=0.98).orderBy(
        "id_a", "id_b"
    )


@register(
    "media_frame_sample",
    """
    WITH media AS (
      SELECT doc_id AS media_id,
             (['image','audio','video'])[(doc_id % 3) + 1] AS media_type,
             octet_length(encode(text)) AS byte_size
      FROM documents
    )
    SELECT media_id, CAST(UNNEST(range(0, (byte_size % 120) + 1, 10)) AS INTEGER)
             AS frame_index
    FROM media WHERE media_type = 'video'
    """,
    doc="multimodal: metadata-only frame sampling grid (every 10th frame) "
    "— payload bytes untouched until downstream decode",
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = documents_to_media(t(spark, sf_dir, "documents"))
    return frame_sample(media, every_n=10)


@register(
    "dedup_cluster_assignment",
    None,
    doc="iterative connected-components over the MinHash near-dup graph "
    "→ (doc, cluster, size, kept-representative) — the cluster-and-keep "
    "step of fuzzy dedup; label propagation with per-round lineage "
    "truncation — rows-only (iterative, not SQL-expressible)",
)
def dedup_cluster_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from market_pulse_data_pipeline_spark.functions.graph import dedup_clusters  # noqa: PLC0415

    docs = _docs_with_planted_dups(spark, sf_dir)
    pairs = minhash_near_duplicates(docs, threshold=0.5)
    return dedup_clusters(pairs).orderBy("cluster_id", "doc_id")


@register(
    "market_pulse_end_to_end",
    None,
    doc="the reference pipeline itself, end-to-end on deterministic "
    "Alpha Vantage fixtures: landing JSON → bronze upsert → stg (flatten"
    "+cast) → dim (CASE) → fact (broadcast join + metrics) → weekly agg; "
    "returns agg_weekly_prices — rows-only (fixtures are not DuckDB "
    "views); golden-value assertions live in tests/test_pipeline.py",
)
def market_pulse_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile  # noqa: PLC0415

    from market_pulse_data_pipeline_spark.pipeline import run_pipeline  # noqa: PLC0415
    from market_pulse_data_pipeline_spark.sources.alphavantage import (  # noqa: PLC0415
        default_fixture_docs,
        write_fixture_landing,
    )

    root = tempfile.mkdtemp(prefix="mp_e2e_")
    landing = f"{root}/landing"
    write_fixture_landing(landing, default_fixture_docs(n_days=60))
    tables, _ = run_pipeline(spark, landing, f"{root}/warehouse")
    return tables["agg_weekly_prices"]


@register(
    "media_decode_features",
    None,
    doc="multimodal decode plumbing: binary → feature vector + dims via "
    "Arrow-batched mapInPandas (deterministic stub codec) — rows-only",
)
def media_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = documents_to_media(t(spark, sf_dir, "documents"))
    decoded = decode_media(media, feat_dim=16)
    return decoded.select(
        "media_id",
        "media_type",
        "width",
        "height",
        "n_frames",
        F.round(
            F.aggregate(
                "feature", F.lit(0.0), lambda acc, x: acc + x
            ),
            6,
        ).alias("feature_sum"),
    )
