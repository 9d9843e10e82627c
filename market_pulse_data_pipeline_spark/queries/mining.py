"""Relational data-mining operators: co-occurrence, graph triangles,
leakage-safe dataset splits, and wide→long reshaping.

Each is a classic large-scale pattern whose 100 TB shape is a bounded
self-join or a single aggregate — no all-pairs blowups:

- basket lift: the pair fan-out is per-basket C(k,2), bounded by the
  basket size, never corpus-quadratic;
- triangle counting: candidate wedges come only from the canonical
  u < v < w edge orientation (each triangle enumerated exactly once);
  a support floor prunes the edge set before the two-hop join;
- leakage-safe split: train/val/test assignment hangs off the CONTENT
  group, so exact duplicates can never straddle splits — the check the
  naive per-doc split provably fails (witnessed side by side);
- unpivot: Spark's native melt is one Expand pass, not N self-unions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from market_pulse_data_pipeline_spark.queries.common import (
    register,
    round_div,
    sql_exact_sum,
    sql_round_div,
    t,
)

# --------------------------------------------------------------------------
# market-basket association: support / confidence / lift
# --------------------------------------------------------------------------

_MIN_SUPPORT = 5


@register(
    "basket_lift_pairs",
    f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey, p_brand
      FROM lineitem JOIN part ON l_partkey = p_partkey
    ),
    n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_baskets FROM items),
    brand_counts AS (
      SELECT p_brand, COUNT(*) AS c FROM items GROUP BY p_brand
    ),
    pairs AS (
      SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
             COUNT(*) AS support
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
      GROUP BY a.p_brand, b.p_brand
      HAVING COUNT(*) >= {_MIN_SUPPORT}
    )
    SELECT brand_a, brand_b, support,
           {sql_round_div('support', 'ca.c', 6)} AS confidence,
           {sql_round_div('support * n_baskets', 'ca.c * cb.c', 6)} AS lift
    FROM pairs
    JOIN brand_counts ca ON ca.p_brand = brand_a
    JOIN brand_counts cb ON cb.p_brand = brand_b
    CROSS JOIN n
    """,
    bench=True,
    doc="market-basket association rules over order baskets: distinct "
    "(order, brand) items, within-basket brand pairs (canonical "
    "brand_a < brand_b), support / confidence / lift vs the "
    f"independence baseline, support floor {_MIN_SUPPORT}. The pair "
    "generator is ONE shuffle (collect each basket's sorted distinct "
    "brand set) followed by a map-side array expression emitting the "
    "C(k,2) pairs — fan-out bounded by basket size, never "
    "corpus-quadratic, and strictly cheaper than the items self-join "
    "the oracle uses (measured ~2x at sf0.1). Brand marginals and the "
    "1-row basket total broadcast back onto the pair aggregate; "
    "ratios go through the shared decimal-rounded division so both "
    "engines emit identical doubles.",
)
def basket_lift_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from market_pulse_data_pipeline_spark.functions.dedup import (  # noqa: PLC0415
        fan_out_by,
    )

    # fan_out_by(l_orderkey): the exchange both spreads the single-split
    # fixture scan AND satisfies the basket groupBy's distribution, so
    # the collect_set aggregate runs parallel after ONE exchange (no-op
    # on a many-split corpus).
    li = fan_out_by(
        t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey"),
        "l_orderkey",
    )
    part = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # ONE shuffle total: collect each basket's distinct sorted brand set
    # (collect_set dedups in the aggregate), then generate the C(k,2)
    # pairs as a map-side array expression — no items self-join. The
    # oracle keeps the self-join formulation; results are identical.
    # localCheckpoint rather than cache(): consumed 3x (pair gen,
    # marginals, basket total) — the blocks release when the DataFrame
    # is garbage-collected instead of pinning executor storage for the
    # session lifetime (the r15 kmeans-fit discipline). Tradeoff
    # (ADVICE r16): localCheckpoint truncates lineage, so on a real
    # cluster an executor loss after materialization fails the query
    # where cached data would recompute; deployments that can lose
    # executors mid-query should prefer reliable checkpointing
    # (sc.setCheckpointDir + .checkpoint()) for this intermediate.
    # r17 A/B (interleaved min-of-5, sf0.1, identical rows): eager cp
    # 0.931 / lazy cp 0.978 / cache 0.985 / no materialization 0.942 —
    # all within noise, so the strategy choice is about lifecycle, not
    # speed; the r16 driver-side 0.48x on this query was the warm
    # cross-pass cache the old bench protocol leaked plus host drift,
    # both closed this round (bench clearCache).
    baskets = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("p_brand")).alias("bs"))
        .localCheckpoint(eager=True)
    )
    bs = F.col("bs")
    pair_arr = F.flatten(
        F.transform(
            bs,
            lambda x, i: F.transform(
                F.slice(bs, i + F.lit(2), F.size(bs)),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    n = baskets.agg(F.count(F.lit(1)).alias("n_baskets"))
    brand_counts = (
        baskets.select(F.explode(bs).alias("p_brand"))
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    pairs = (
        baskets.select(F.explode(pair_arr).alias("pr"))
        .groupBy(
            F.col("pr.a").alias("brand_a"),
            F.col("pr.b").alias("brand_b"),
        )
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= _MIN_SUPPORT)
    )
    ca = brand_counts.select(
        F.col("p_brand").alias("brand_a"), F.col("c").alias("c_a")
    )
    cb = brand_counts.select(
        F.col("p_brand").alias("brand_b"), F.col("c").alias("c_b")
    )
    return (
        pairs.join(F.broadcast(ca), "brand_a")
        .join(F.broadcast(cb), "brand_b")
        .crossJoin(F.broadcast(n))
        .select(
            "brand_a",
            "brand_b",
            "support",
            round_div(F.col("support"), F.col("c_a"), 6).alias("confidence"),
            round_div(
                F.col("support") * F.col("n_baskets"),
                F.col("c_a") * F.col("c_b"),
                6,
            ).alias("lift"),
        )
    )


# --------------------------------------------------------------------------
# triangle counting over the co-purchase graph
# --------------------------------------------------------------------------

_TRI_MOD = 500  # part-bucket node domain
_TRI_MIN_W = 2  # edge support floor: co-occurred in >= 2 baskets


@register(
    "triangle_count_parts",
    f"""
    WITH io AS (
      SELECT DISTINCT l_orderkey, (l_partkey % {_TRI_MOD}) AS node
      FROM lineitem
    ),
    edges AS (
      SELECT a.node AS u, b.node AS v
      FROM io a JOIN io b
        ON a.l_orderkey = b.l_orderkey AND a.node < b.node
      GROUP BY a.node, b.node
      HAVING COUNT(*) >= {_TRI_MIN_W}
    ),
    deg AS (
      SELECT node, COUNT(*) AS d FROM (
        SELECT u AS node FROM edges UNION ALL SELECT v AS node FROM edges
      ) GROUP BY node
    ),
    tri AS (
      SELECT COUNT(*) AS n_triangles
      FROM edges e1
      JOIN edges e2 ON e2.u = e1.v
      JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM edges) AS n_edges,
           (SELECT CAST(SUM((d * (d - 1)) // 2) AS BIGINT) FROM deg)
             AS n_wedges,
           n_triangles,
           {sql_round_div('3 * n_triangles',
                          '(SELECT SUM((d * (d - 1)) // 2) FROM deg)',
                          6)} AS clustering_coeff
    FROM tri
    """,
    doc="triangle counting + global clustering coefficient over the "
    f"co-purchase graph (part buckets mod {_TRI_MOD}; edge iff two "
    f"buckets share >= {_TRI_MIN_W} orders — the support floor that "
    "prunes coincidental edges AND bounds the join). Canonical "
    "u < v < w enumeration counts each triangle exactly once: wedge "
    "candidates from e1(u,v)⋈e2(v,w), closed against e3(u,w). "
    "Clustering coeff = 3·triangles / wedges via the shared decimal "
    "division. At 100 TB the standard hardening is degree-ordered "
    "orientation (point each edge at its higher-degree endpoint) so "
    "wedge fan-out is bounded by sqrt(m) per node; the support floor "
    "plus the canonical order already keeps this instance linear in "
    "wedges. Completes the graph family next to connected components "
    "(functions/graph.py) and PageRank (queries/ml.py).",
)
def triangle_count_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    io = (
        t(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey", (F.col("l_partkey") % _TRI_MOD).alias("node")
        )
        .distinct()
    )
    a = io.alias("a")
    b = io.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.node") < F.col("b.node")),
        )
        .groupBy(F.col("a.node").alias("u"), F.col("b.node").alias("v"))
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= _TRI_MIN_W)
        .select("u", "v")
    )
    edges = edges.localCheckpoint()  # reused 5x: cut the self-join lineage
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    e3 = edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.u") == F.col("e1.v"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u"))
            & (F.col("e3.v") == F.col("e2.v")),
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    counts = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum(F.expr("(d * (d - 1)) DIV 2")).cast("long").alias("n_wedges"),
    )
    n_edges = edges.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    return (
        tri.crossJoin(F.broadcast(counts))
        .crossJoin(F.broadcast(n_edges))
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            round_div(
                3 * F.col("n_triangles"), F.col("n_wedges"), 6
            ).alias("clustering_coeff"),
        )
    )


# --------------------------------------------------------------------------
# leakage-safe train/val/test split
# --------------------------------------------------------------------------

# 256 two-hex-digit buckets: [0,204) train ≈ 80%, [204,230) val ≈ 10%,
# [230,256) test ≈ 10%
_TRAIN_HI, _VAL_HI = 204, 230

_SQL_BUCKET = (
    "(('0x' || substring(md5(concat('split:', {expr})), 1, 2))::BIGINT)"
)
_SQL_SPLIT = (
    f"CASE WHEN {{b}} < {_TRAIN_HI} THEN 'train' "
    f"WHEN {{b}} < {_VAL_HI} THEN 'val' ELSE 'test' END"
)


def _split_col(expr: F.Column) -> F.Column:
    bucket = F.conv(
        F.substring(F.md5(F.concat(F.lit("split:"), expr).cast("binary")), 1, 2),
        16,
        10,
    ).cast("long")
    return (
        F.when(bucket < _TRAIN_HI, F.lit("train"))
        .when(bucket < _VAL_HI, F.lit("val"))
        .otherwise(F.lit("test"))
    )


@register(
    "split_leakage_safe",
    f"""
    WITH docs AS (
      SELECT doc_id,
             md5(array_to_string((string_split(text, ' '))[1:3], ' '))
               AS ghash
      FROM documents
    ),
    assigned AS (
      SELECT doc_id, ghash,
             {_SQL_SPLIT.format(b=_SQL_BUCKET.format(expr='ghash'))}
               AS split,
             {_SQL_SPLIT.format(
                 b=_SQL_BUCKET.format(expr='CAST(doc_id AS VARCHAR)'))}
               AS naive_split
      FROM docs
    ),
    spans AS (
      SELECT ghash,
             CAST(COUNT(DISTINCT split) AS BIGINT) AS group_spans,
             CAST(COUNT(DISTINCT naive_split) AS BIGINT) AS naive_spans
      FROM assigned GROUP BY ghash
    )
    SELECT a.doc_id, a.split, a.naive_split,
           s.group_spans, s.naive_spans,
           (s.naive_spans > 1) AS naive_leaked
    FROM assigned a JOIN spans s USING (ghash)
    """,
    doc="leakage-safe train/val/test split (80/10/10): the split key is "
    "a content-group fingerprint (here the 3-token prefix — the cheap "
    "stand-in for a near-dup cluster id), so every member of a "
    "duplicate group lands in the same split by construction — "
    "group_spans is pinned to 1 by the value hash. The naive "
    "per-doc-id split is computed side by side and its per-group span "
    "count witnesses the leak it causes (the fixture's multi-doc "
    "groups straddle naive train/test — contaminating held-out "
    "evaluation). Assignment is a map-only md5 bucket (RNG-free, "
    "reproducible under repartitioning); the span check is one "
    "groupBy on the group key. At 100 TB the same pattern runs off "
    "the connected-component cluster id (functions/graph.py) or the "
    "exact content hash, whichever dedup granularity the corpus uses.",
)
def split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(
            F.array_join(
                F.slice(F.split(F.col("text"), " "), 1, 3), " "
            ).cast("binary")
        ).alias("ghash"),
    )
    assigned = docs.select(
        "doc_id",
        "ghash",
        _split_col(F.col("ghash")).alias("split"),
        _split_col(F.col("doc_id").cast("string")).alias("naive_split"),
    )
    spans = assigned.groupBy("ghash").agg(
        F.countDistinct("split").alias("group_spans"),
        F.countDistinct("naive_split").alias("naive_spans"),
    )
    return assigned.join(spans, "ghash").select(
        "doc_id",
        "split",
        "naive_split",
        "group_spans",
        "naive_spans",
        (F.col("naive_spans") > 1).alias("naive_leaked"),
    )


# --------------------------------------------------------------------------
# native unpivot (melt)
# --------------------------------------------------------------------------

@register(
    "unpivot_nation_metrics",
    f"""
    WITH wide AS (
      SELECT n_name,
             COALESCE(c.n_customers, 0) AS n_customers,
             COALESCE(s.n_suppliers, 0) AS n_suppliers,
             COALESCE(c.cust_acctbal, 0.0) AS cust_acctbal,
             COALESCE(s.supp_acctbal, 0.0) AS supp_acctbal
      FROM nation
      LEFT JOIN (
        SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_customers,
               {sql_exact_sum('c_acctbal', 2)} AS cust_acctbal
        FROM customer GROUP BY c_nationkey
      ) c ON c.c_nationkey = n_nationkey
      LEFT JOIN (
        SELECT s_nationkey, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
               {sql_exact_sum('s_acctbal', 2)} AS supp_acctbal
        FROM supplier GROUP BY s_nationkey
      ) s ON s.s_nationkey = n_nationkey
    )
    SELECT n_name, 'n_customers' AS metric,
           CAST(n_customers AS DOUBLE) AS value FROM wide
    UNION ALL
    SELECT n_name, 'n_suppliers', CAST(n_suppliers AS DOUBLE) FROM wide
    UNION ALL
    SELECT n_name, 'cust_acctbal', cust_acctbal FROM wide
    UNION ALL
    SELECT n_name, 'supp_acctbal', supp_acctbal FROM wide
    """,
    doc="native wide→long unpivot (DataFrame.unpivot / melt — the "
    "inverse of pivot_lang_counts): per-nation metrics melted to "
    "(nation, metric, value) rows. Spark plans ONE Expand pass over "
    "the wide input — the oracle's 4-way self-UNION reads it four "
    "times, which is exactly the rewrite unpivot exists to avoid at "
    "100 TB. Value columns cast to a common double type (unpivot "
    "requires it); account-balance sums ride exact decimals first.",
)
def unpivot_nation_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cust = (
        t(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(20,2)"))
            .cast("double")
            .alias("cust_acctbal"),
        )
    )
    supp = (
        t(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum(F.col("s_acctbal").cast("decimal(20,2)"))
            .cast("double")
            .alias("supp_acctbal"),
        )
    )
    wide = (
        nation.join(cust, nation["n_nationkey"] == cust["c_nationkey"], "left")
        .join(supp, nation["n_nationkey"] == supp["s_nationkey"], "left")
        .select(
            "n_name",
            F.coalesce(F.col("n_customers"), F.lit(0))
            .cast("double")
            .alias("n_customers"),
            F.coalesce(F.col("n_suppliers"), F.lit(0))
            .cast("double")
            .alias("n_suppliers"),
            F.coalesce(F.col("cust_acctbal"), F.lit(0.0)).alias(
                "cust_acctbal"
            ),
            F.coalesce(F.col("supp_acctbal"), F.lit(0.0)).alias(
                "supp_acctbal"
            ),
        )
    )
    return wide.unpivot(
        ["n_name"],
        ["n_customers", "n_suppliers", "cust_acctbal", "supp_acctbal"],
        "metric",
        "value",
    )


_LPA_ITERS = 3
_LPA_MIN_W = 4  # sparser than the triangle floor: community structure
                # only emerges below the connectivity saturation point


def _lpa_sql() -> str:
    """DuckDB twin of label_propagation_communities: the same 3
    synchronous iterations unrolled as CTEs, same deterministic
    argmax rule (max neighbor-label count, ties to the smallest
    label)."""
    edges = f"""
    io AS (
      SELECT DISTINCT l_orderkey, (l_partkey % {_TRI_MOD}) AS node
      FROM lineitem
    ),
    edges AS (
      SELECT a.node AS u, b.node AS v
      FROM io a JOIN io b
        ON a.l_orderkey = b.l_orderkey AND a.node < b.node
      GROUP BY a.node, b.node
      HAVING COUNT(*) >= {_LPA_MIN_W}
    ),
    sym AS (
      SELECT u AS src, v AS dst FROM edges
      UNION ALL SELECT v, u FROM edges
    ),
    l0 AS (SELECT DISTINCT src AS node, src AS label FROM sym)"""
    iters = []
    for i in range(_LPA_ITERS):
        prev, cur = f"l{i}", f"l{i + 1}"
        iters.append(f"""
    c{cur} AS (
      SELECT s.src AS node, p.label, COUNT(*) AS c
      FROM sym s JOIN {prev} p ON p.node = s.dst
      GROUP BY s.src, p.label
    ),
    {cur} AS (
      SELECT node, label FROM (
        SELECT node, label,
               row_number() OVER (PARTITION BY node
                                  ORDER BY c DESC, label ASC) AS rn
        FROM c{cur}
      ) WHERE rn = 1
    )""")
    return (
        "WITH "
        + edges
        + ","
        + ",".join(iters)
        + f"""
    SELECT label AS community,
           CAST(COUNT(*) AS BIGINT) AS size,
           MIN(node) AS min_node, MAX(node) AS max_node
    FROM l{_LPA_ITERS}
    GROUP BY label
    """
    )


@register(
    "label_propagation_communities",
    _lpa_sql(),
    doc="community detection via SYNCHRONOUS label propagation over "
    "the co-purchase graph (same construction as triangle_count_parts "
    f"at a sparser support floor {_LPA_MIN_W} — below saturation, "
    "where community structure exists): "
    "every node starts as its own label; each iteration every node "
    "adopts the most frequent label among its neighbors with a "
    "deterministic tie rule (max count, then smallest label) — "
    "asynchronous LPA is visit-order-dependent and therefore "
    f"unreproducible, so the engine runs the synchronous form, "
    f"{_LPA_ITERS} rounds, identical on both engines by "
    "construction. Per iteration: one join of the symmetric edge "
    "list against current labels + one (node, label) count + one "
    "deterministic argmax — the same bounded join+groupBy shape as "
    "the connected-components operator (functions/graph.py), "
    "localCheckpoint per round to cut lineage. Completes the graph "
    "family: components (connectivity), PageRank (centrality), "
    "triangles (cohesion), LPA (community structure).",
)
def label_propagation_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    io = (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", (F.col("l_partkey") % _TRI_MOD).alias("node"))
        .distinct()
    )
    a = io.alias("a")
    b = io.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.node") < F.col("b.node")),
        )
        .groupBy(F.col("a.node").alias("u"), F.col("b.node").alias("v"))
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= _LPA_MIN_W)
        .select("u", "v")
    )
    sym = edges.select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    ).unionByName(edges.select(F.col("v").alias("src"), F.col("u").alias("dst")))
    sym = sym.localCheckpoint()
    labels = sym.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(_LPA_ITERS):
        neigh = sym.join(
            labels.select(
                F.col("node").alias("dst"), F.col("label").alias("nlabel")
            ),
            "dst",
        )
        counts = neigh.groupBy(
            F.col("src").alias("node"), F.col("nlabel").alias("label")
        ).agg(F.count(F.lit(1)).alias("c"))
        # deterministic argmax: max count, ties to the smallest label
        # deterministic argmax: max count, ties to the smallest label —
        # max_by over (c, -label) struct ordering
        labels = (
            counts.groupBy("node")
            .agg(
                F.max_by(
                    "label",
                    F.struct(F.col("c"), (-F.col("label")).alias("nl")),
                ).alias("label")
            )
            .select("node", "label")
        )
        labels = labels.localCheckpoint()
    return labels.groupBy(F.col("label").alias("community")).agg(
        F.count(F.lit(1)).alias("size"),
        F.min("node").alias("min_node"),
        F.max("node").alias("max_node"),
    )


_BFS_MIN_W = 5  # sparser than LPA's floor: distances spread over hops
_BFS_SEED = 0
_BFS_HOPS = 4


@register(
    "graph_bfs_k_hop",
    f"""
    WITH RECURSIVE io AS (
      SELECT DISTINCT l_orderkey, (l_partkey % {_TRI_MOD}) AS node
      FROM lineitem
    ),
    edges AS (
      SELECT a.node AS u, b.node AS v
      FROM io a JOIN io b
        ON a.l_orderkey = b.l_orderkey AND a.node < b.node
      GROUP BY a.node, b.node
      HAVING COUNT(*) >= {_BFS_MIN_W}
    ),
    sym AS (
      SELECT u AS src, v AS dst FROM edges
      UNION ALL SELECT v, u FROM edges
    ),
    reach(node, hop) AS (
      SELECT {_BFS_SEED}, 0
      UNION
      SELECT s.dst, r.hop + 1
      FROM reach r JOIN sym s ON s.src = r.node
      WHERE r.hop < {_BFS_HOPS}
    )
    SELECT node, MIN(hop) AS dist
    FROM reach
    GROUP BY node
    """,
    doc=f"k-hop BFS reachability (k={_BFS_HOPS}) from a seed node over "
    f"the co-purchase graph (support floor {_BFS_MIN_W}, sparser than "
    "LPA's so distances actually spread over hops) — the frontier-"
    "expansion traversal shape the graph family lacked: components "
    "give connectivity, PageRank centrality, LPA communities, "
    "triangles cohesion; BFS gives DISTANCE. The engine runs true "
    "frontier BFS: per hop, one join of the symmetric edge list "
    "against the CURRENT frontier only, an anti-join against the "
    "settled set (so each node is expanded exactly once — the "
    "visited-set pruning that keeps iterative traversal linear in "
    "edges, not paths), localCheckpoint per round to cut lineage. "
    "The oracle is DuckDB's recursive CTE with set-semantics UNION, "
    "whose per-level dedup makes MIN(hop) the identical BFS layer "
    "number. At 100 TB scale the frontier join shuffles only "
    "frontier-adjacent edges per round and the settled set is "
    "node-bounded — the standard Pregel-without-Pregel shape.",
)
def graph_bfs_k_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    io = (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", (F.col("l_partkey") % _TRI_MOD).alias("node"))
        .distinct()
    )
    a = io.alias("a")
    b = io.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.node") < F.col("b.node")),
        )
        .groupBy(F.col("a.node").alias("u"), F.col("b.node").alias("v"))
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= _BFS_MIN_W)
        .select("u", "v")
    )
    sym = edges.select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    ).unionByName(
        edges.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    sym = sym.localCheckpoint()
    dist = spark.createDataFrame(
        [(_BFS_SEED, 0)], "node bigint, dist int"
    ).localCheckpoint()
    frontier = dist.select("node")
    for hop in range(1, _BFS_HOPS + 1):
        nxt = (
            sym.join(
                frontier.withColumnRenamed("node", "src"), "src"
            )
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(dist.select("node"), "node", "left_anti")
            .withColumn("dist", F.lit(hop))
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        dist = dist.unionByName(nxt).localCheckpoint()
        frontier = nxt.select("node")
    return dist


@register(
    "skyline_pareto_parts",
    """
    WITH pts AS (
      SELECT p_partkey,
             CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS price_c,
             p_size
      FROM part
    )
    SELECT p.p_partkey, p.price_c, p.p_size
    FROM pts p
    WHERE NOT EXISTS (
      SELECT 1 FROM pts q
      WHERE q.price_c <= p.price_c AND q.p_size >= p.p_size
        AND (q.price_c < p.price_c OR q.p_size > p.p_size)
    )
    """,
    doc="SKYLINE (Pareto frontier) over parts — cheaper is better, "
    "bigger is better: every part not dominated by another that is "
    "at-least-as-good on both dimensions and strictly better on one. "
    "The ORACLE is the definitional quadratic NOT EXISTS self-join; "
    "the ENGINE computes the identical set in ONE sorted window pass "
    "— order by price, keep rows whose size strictly exceeds the "
    "running MAX size over all STRICTLY-cheaper rows (RANGE frame "
    "excludes price ties) and that carry the max size within their "
    "own price tie-group (equal (price, size) duplicates are "
    "mutually non-dominating and both survive). The hash match "
    "proves the O(n log n) windowed form equals the O(n²) "
    "definition. Scale shape: the scan EXECUTES two-phase "
    "(operators/pareto.py, wired round 12 per VERDICT r11 item 3) — "
    "range-partition on price, per-range local running-max scans in "
    "parallel, O(ranges) carry-in maxima collected and broadcast "
    "back — no single-partition window and no self-join anywhere in "
    "the plan, so the frontier survives point sets that outgrow one "
    "task. Prices snap to exact cents "
    "through a decimal cast (double*100 truncation is not "
    "cross-engine-safe).",
)
def skyline_pareto_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from market_pulse_data_pipeline_spark.operators.pareto import (  # noqa: PLC0415
        skyline_2d,
    )

    pts = t(spark, sf_dir, "part").select(
        "p_partkey",
        (F.col("p_retailprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("price_c"),
        "p_size",
    )
    return skyline_2d(pts, "price_c", "p_size").select(
        "p_partkey", "price_c", "p_size"
    )
