"""SQL-text interface witness.

The reference's users write SQL (its dbt models are SQL files); this
engine therefore exposes the same surface: `register_views` + one
`spark.sql(text)` call. The witness below runs ONE shared ANSI string
— byte-identical on both engines — through `spark.sql` and through
DuckDB, proving the text interface computes the DataFrame semantics
(and that a dbt-style SQL model can be dropped in unchanged when it
sticks to the shared dialect).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from market_pulse_data_pipeline_spark.queries.common import register, t
from market_pulse_data_pipeline_spark.sources.tables import register_views

# One string, two engines. Restricted to the ANSI subset both parse
# identically: DATE literals, DECIMAL casts, COUNT/SUM, GROUP BY,
# HAVING, ORDER BY.
_SHARED_SQL = """
SELECT l_returnflag,
       l_linestatus,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,6))) AS DOUBLE)
         AS sum_price
FROM lineitem
WHERE l_shipdate >= DATE '1995-06-01'
  AND l_shipdate < DATE '1996-06-01'
GROUP BY l_returnflag, l_linestatus
HAVING COUNT(*) > 10
ORDER BY l_returnflag, l_linestatus
"""


@register(
    "sql_text_shared_dialect",
    _SHARED_SQL,
    doc="the SQL-string surface: register_views(spark, sf_dir) + "
    "spark.sql(text) where text is BYTE-IDENTICAL to the DuckDB "
    "oracle string — a dbt-style SQL model runs unchanged on this "
    "engine when it sticks to the shared ANSI dialect. Catalyst "
    "plans SQL text and DataFrame code through the same optimizer, "
    "so every scale property (pushdown, partial aggs, AQE) applies "
    "identically.",
)
def sql_text_shared_dialect(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_SHARED_SQL)


@register(
    "sql_registered_udf",
    """
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens_udf
    FROM documents
    """,
    doc="SQL-callable UDF registration surface: a vectorized "
    "pandas_udf registered via spark.udf.register and invoked from "
    "SQL TEXT over the temp views — the extension point a SQL-first "
    "user (dbt macro, ad-hoc analyst) needs. Arrow-batched, so the "
    "Python hop is the blessed slow-path shape, exercised here on a "
    "bounded table; hot-path token counting stays JVM-side "
    "(text_token_count).",
)
def sql_registered_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # pandas imported at module scope: under `from __future__ import
    # annotations` the hint strings must resolve from function globals
    from pyspark.sql.functions import pandas_udf  # noqa: PLC0415

    @pandas_udf("int")
    def token_count_py(texts: pd.Series) -> pd.Series:
        return texts.str.split(" ").str.len().astype("int32")

    spark.udf.register("token_count_py", token_count_py)
    register_views(spark, sf_dir)
    return spark.sql(
        "SELECT doc_id, token_count_py(text) AS n_tokens_udf FROM documents"
    )


# LATERAL correlated subquery — one shared string again. Spark plans
# this as a rewritten inner join + per-key TakeOrdered (no
# nested-loop per outer row); DuckDB executes its lateral operator.
_LATERAL_SQL = """
SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey, t.o_totalprice
FROM customer c, LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 2
) t
WHERE c.c_custkey % 5 = 0
"""


@register(
    "sql_lateral_top2_orders",
    _LATERAL_SQL,
    doc="LATERAL correlated subquery (top-2 orders per customer), the "
    "same byte-identical string through spark.sql and DuckDB — the "
    "SQL-text form of the top-N-per-group family (top3_per_supplier "
    "is the DataFrame/window form). Deterministic inner ordering "
    "(price desc, key); Catalyst decorrelates the LATERAL into a "
    "ranked join rather than executing per-outer-row.",
)
def sql_lateral_top2_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)


@register(
    "udtf_split_sentences",
    """
    SELECT doc_id, i - 1 AS pos, parts[i] AS sentence
    FROM (SELECT doc_id, string_split(text, ' the ') AS parts
          FROM documents WHERE doc_id < 40),
         UNNEST(range(1, len(parts) + 1)) AS u(i)
    """,
    doc="Python UDTF surface (Spark 4 @udtf): a table function "
    "registered via spark.udtf.register and invoked through SQL "
    "LATERAL, hash-checked against the relational split oracle. This "
    "is the API-flexibility witness — arbitrary Python generators as "
    "table functions — NOT the performance path (UDTFs evaluate "
    "row-at-a-time; every hot-path operator in this repo uses built-in "
    "generators or Arrow-batched pandas instead, and the bench plan "
    "gate enforces that).",
)
def udtf_split_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf  # noqa: PLC0415

    @udtf(returnType="doc_id bigint, pos int, sentence string")
    class SplitSentences:
        def eval(self, doc_id, text):  # noqa: ANN001
            for i, s in enumerate(text.split(" the ")):
                yield doc_id, i, s

    register_views(spark, sf_dir)
    spark.udtf.register("split_sentences", SplitSentences)
    return spark.sql(
        """
        SELECT s.doc_id, s.pos, s.sentence
        FROM documents d, LATERAL split_sentences(d.doc_id, d.text) s
        WHERE d.doc_id < 40
        """
    )


@register(
    "sql_scalar_udf_params",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_high_disc,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_quantity >= 30
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="Spark 4 SQL-body scalar UDF + parameterized SQL surface: "
    "CREATE TEMPORARY FUNCTION ... RETURNS INT RETURN CASE ... (a "
    "catalog function whose body is pure SQL — Catalyst inlines it, so "
    "it costs nothing at 100 TB, unlike a Python UDF), invoked from a "
    "query bound with named parameter markers (spark.sql(..., "
    "args={'minq': 30}) — injection-safe plan-cacheable parameter "
    "binding). The oracle is the inlined-by-hand equivalent.",
)
def sql_scalar_udf_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION is_high_disc(d DOUBLE) "
        "RETURNS INT RETURN CASE WHEN d >= 0.05 THEN 1 ELSE 0 END"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(SUM(is_high_disc(l_discount)) AS BIGINT)
                 AS n_high_disc,
               COUNT(*) AS n_rows
        FROM lineitem
        WHERE l_quantity >= :minq
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """,
        args={"minq": 30},
    )


@register(
    "sql_table_function_orders",
    """
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_big_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2)
                AS DOUBLE) AS total_big
    FROM orders WHERE o_totalprice >= 400000
    GROUP BY o_custkey
    ORDER BY o_custkey
    """,
    doc="Spark 4 SQL table-valued UDF surface: CREATE TEMPORARY "
    "FUNCTION ... RETURNS TABLE(...) RETURN SELECT ... — a "
    "parameterized view the planner inlines (the scan keeps its "
    "pushed filters; no materialization boundary), then an "
    "aggregation over the TVF call. The exact-decimal SUM keeps the "
    "float total portable. Oracle is the inlined equivalent.",
)
def sql_table_function_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION big_orders(minp DOUBLE) "
        "RETURNS TABLE(o_orderkey BIGINT, o_custkey BIGINT, "
        "o_totalprice DOUBLE) "
        "RETURN SELECT o_orderkey, o_custkey, o_totalprice "
        "FROM orders WHERE o_totalprice >= minp"
    )
    return spark.sql(
        """
        SELECT o_custkey,
               CAST(COUNT(*) AS BIGINT) AS n_big_orders,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2)
                    AS DOUBLE) AS total_big
        FROM big_orders(400000.0)
        GROUP BY o_custkey
        ORDER BY o_custkey
        """
    )


@register(
    "sql_recursive_cte",
    """
    WITH RECURSIVE walk(start_key, node, depth) AS (
      SELECT p_partkey, p_partkey, 0
      FROM part WHERE p_partkey % 97 = 0
      UNION ALL
      SELECT start_key, node // 4, depth + 1
      FROM walk WHERE node > 0
    )
    SELECT start_key,
           CAST(MAX(depth) AS BIGINT) AS depth_to_zero,
           COUNT(*) AS n_steps,
           CAST(SUM(node) AS BIGINT) AS path_sum
    FROM walk GROUP BY start_key
    """,
    doc="recursive CTE (WITH RECURSIVE — new in Spark 4): an iterated "
    "ancestor walk (node -> node/4 until 0) from every 97th part key, "
    "aggregated to per-start depth, step count, and path sum — the "
    "hierarchy/graph-reachability SQL surface, verified against "
    "DuckDB's recursive CTE on the same seed rows. Catalyst executes "
    "it as an iterated loop over the recursion relation (UnionLoop) "
    "with a recursion-depth guard; depth here is O(log key), and at "
    "100 TB each iteration is one distributed join/scan pass, the "
    "same shape as the iterative connected-components operator "
    "(functions/graph.py) this surface complements. SUM over the "
    "BIGINT nodes is CAST on the oracle side (DuckDB HUGEINT rule).",
)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH RECURSIVE walk(start_key, node, depth) AS (
          SELECT p_partkey, p_partkey, 0
          FROM part WHERE p_partkey % 97 = 0
          UNION ALL
          SELECT start_key, node DIV 4, depth + 1
          FROM walk WHERE node > 0
        )
        SELECT start_key,
               CAST(MAX(depth) AS BIGINT) AS depth_to_zero,
               COUNT(*) AS n_steps,
               SUM(node) AS path_sum
        FROM walk GROUP BY start_key
        """
    )


@register(
    "sql_pipe_syntax",
    """
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(20,2))) AS DOUBLE)
             AS sum_qty,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                AS DECIMAL(20,4))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="SQL pipe syntax (Spark 4 |> operators): the Q1 aggregation "
    "written as FROM ... |> WHERE ... |> EXTEND ... |> AGGREGATE ... "
    "GROUP BY — the linear top-to-bottom SQL dialect — verified "
    "against the classic SELECT formulation in DuckDB. Pipe stages "
    "are pure parser sugar: Catalyst plans the identical partial+final "
    "hash aggregate with the shipdate filter pushed to the scan, so "
    "the surface costs nothing at 100 TB. Decimal sums keep the "
    "cross-engine hash exact as everywhere else.",
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |> EXTEND CAST(l_quantity AS DECIMAL(20,2)) AS qty_d,
                  CAST(l_extendedprice * (1 - l_discount)
                       AS DECIMAL(20,4)) AS rev_d
        |> AGGREGATE COUNT(*) AS n_items,
                     CAST(SUM(qty_d) AS DOUBLE) AS sum_qty,
                     CAST(SUM(rev_d) AS DOUBLE) AS revenue
           GROUP BY l_returnflag, l_linestatus
        |> SELECT l_returnflag, l_linestatus, n_items, sum_qty, revenue
        """
    )


@register(
    "pandas_api_groupby",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           MAX(value) AS max_value,
           MIN(value) AS min_value
    FROM events
    GROUP BY event_type
    """,
    doc="pandas API on Spark (pyspark.pandas): the same grouped "
    "profile expressed as df.pandas_api().groupby(...).agg(...) — "
    "the migration surface for pandas-first users — converted back "
    "with to_spark() and hash-checked against the relational oracle. "
    "Only order-independent aggregates (count / distinct / min / "
    "max) are exposed through this surface; the pandas API plans "
    "into the SAME Catalyst operators (one partial+final hash "
    "aggregate here), so nothing is lost at 100 TB — except that "
    "pandas defaults like sort_index can add exchanges, which this "
    "query avoids by aggregating unsorted.",
)
def pandas_api_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "event_type", "user_id", "value"
    )
    psdf = ev.pandas_api()
    agg = psdf.groupby("event_type", as_index=False).agg(
        n_events=("user_id", "count"),
        n_users=("user_id", "nunique"),
        max_value=("value", "max"),
        min_value=("value", "min"),
    )
    # dropping the synthetic index is exactly what this query wants:
    # silence the pandas-on-Spark advice warning without switching to
    # index_col=, which would force a distributed-sequence index into
    # the plan just to drop it again
    import warnings  # noqa: PLC0415

    from pyspark.pandas.utils import PandasAPIOnSparkAdviceWarning  # noqa: PLC0415

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", PandasAPIOnSparkAdviceWarning)
        out = agg.to_spark()
    return out.select(
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("n_users").cast("long").alias("n_users"),
        "max_value",
        "min_value",
    )
