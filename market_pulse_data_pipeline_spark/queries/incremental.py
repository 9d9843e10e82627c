"""Incremental-maintenance operator shapes.

The reference rebuilds its dbt models in full every run (SURVEY §2.7-d);
at 100 TB the production shape is INCREMENTAL maintenance: keep partial
aggregates, fold in only the delta, and prove the merged state equals a
full recompute. These queries register that proof, plus the calendar
gap-fill/forward-fill resampling every market-data pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from market_pulse_data_pipeline_spark.queries.common import register, t

# deterministic base/delta split: everything before this day is the
# "already materialized" state, the rest is the incoming delta
_CUTOFF = "2025-02-01"


@register(
    "incremental_agg_maintenance",
    """
    SELECT event_type,
           CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS value_sum
    FROM events
    GROUP BY 1, 2
    """,
    doc="incremental aggregate maintenance (the dbt-incremental shape "
    "the reference's full-rebuild models lack): the pre-cutoff half is "
    "aggregated into partial state (n, exact decimal sum) as a stand-in "
    "for yesterday's materialization, the post-cutoff delta is "
    "aggregated separately, and the two partial-state sets are MERGED "
    "(union + re-aggregate on the group key). The oracle is a FULL "
    "recompute over all events — the hash match is the algebraic-"
    "maintenance proof (count/sum are mergeable; the decimal sums make "
    "the merge order-insensitive). At 100 TB only the delta's "
    "partitions are scanned and the merge shuffle carries one row per "
    "TOUCHED group, not per event.",
)
def incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("day"),
        F.col("value").cast("decimal(20,6)").alias("v"),
    )

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type", "day").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("v").alias("value_sum_dec"),
        )

    base = partials(ev.filter(F.col("day") < F.lit(_CUTOFF).cast("date")))
    delta = partials(ev.filter(F.col("day") >= F.lit(_CUTOFF).cast("date")))
    merged = (
        base.unionByName(delta)
        .groupBy("event_type", "day")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("value_sum_dec").cast("double").alias("value_sum"),
        )
    )
    return merged.select("event_type", "day", "n_events", "value_sum")


_GAPFILL_USERS = 10  # bounded user slice keeps the calendar spine small


@register(
    "calendar_gapfill_ffill",
    f"""
    WITH daily AS (
      SELECT user_id,
             CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS day_value
      FROM events WHERE user_id < {_GAPFILL_USERS}
      GROUP BY 1, 2
    ), span AS (
      SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily
      GROUP BY user_id
    ), spine AS (
      SELECT user_id, CAST(g.d AS DATE) AS day
      FROM span, UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS g(d)
    )
    SELECT s.user_id, s.day,
           (d.day IS NOT NULL) AS observed,
           last_value(d.day_value IGNORE NULLS)
             OVER (PARTITION BY s.user_id ORDER BY s.day
                   ROWS UNBOUNDED PRECEDING) AS value_ffill
    FROM spine s LEFT JOIN daily d
      ON s.user_id = d.user_id AND s.day = d.day
    ORDER BY s.user_id, s.day
    """,
    doc="calendar gap-fill + forward-fill (market-data resampling: "
    "every day between a user's first and last activity gets a row; "
    "missing days carry the last observed value forward). The spine is "
    "sequence()-generated per key — rows created ∝ span, never a "
    "cross-join against a global calendar — and the fill is one "
    "last(ignoreNulls) window pass sharing the join's partitioning. "
    "Day-level sums go through exact decimals so fill values "
    "hash-match bit-for-bit.",
)
def calendar_gapfill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < _GAPFILL_USERS)
    daily = ev.groupBy(
        "user_id",
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(
        F.sum(F.col("value").cast("decimal(20,6)"))
        .cast("double")
        .alias("day_value")
    )
    span = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = span.select(
        "user_id",
        F.explode(
            F.sequence("d0", "d1", F.expr("interval 1 day"))
        ).alias("day"),
    )
    joined = spine.join(
        daily.withColumnRenamed("day", "obs_day"),
        (spine.user_id == daily.user_id) & (spine.day == F.col("obs_day")),
        "left",
    ).select(
        spine.user_id, spine.day, F.col("obs_day"), F.col("day_value")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        "day",
        F.col("obs_day").isNotNull().alias("observed"),
        F.last("day_value", ignorenulls=True).over(w).alias("value_ffill"),
    ).orderBy("user_id", "day")


_TT_ROOT = None  # lazy per-process scratch


def _tt_scratch() -> str:
    global _TT_ROOT
    if _TT_ROOT is None:
        import atexit  # noqa: PLC0415
        import shutil  # noqa: PLC0415
        import os  # noqa: PLC0415
        import tempfile  # noqa: PLC0415

        _TT_ROOT = os.path.join(
            tempfile.gettempdir(), f"mp_timetravel_{os.getpid()}"
        )
        atexit.register(lambda: shutil.rmtree(_TT_ROOT, ignore_errors=True))
    return _TT_ROOT


@register(
    "pointer_swap_time_travel",
    """
    SELECT 'v1' AS version_tag, o_orderstatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(20,6))) AS DOUBLE)
             AS price_sum
    FROM orders WHERE o_orderkey % 2 = 0
    GROUP BY o_orderstatus
    UNION ALL
    SELECT 'v2', o_orderstatus, COUNT(*),
           CAST(SUM(CAST(o_totalprice AS DECIMAL(20,6))) AS DOUBLE)
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY version_tag, o_orderstatus
    """,
    doc="time travel over the pointer-swap commit protocol "
    "(operators/merge.py): two successive commit_pointer_swap() "
    "snapshots of the orders table (half, then all); read_current() "
    "must resolve the second, read_version() on the OLDEST prefix must "
    "still see the first — old snapshots stay readable until "
    "vacuum_versions, exactly the Delta/Iceberg time-travel contract "
    "in dependency-free form. The returned frame aggregates BOTH reads "
    "with a version tag; the oracle re-derives both states "
    "relationally, so the hash match proves snapshot isolation (the "
    "second commit did not disturb the first snapshot's bytes).",
)
def pointer_swap_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os  # noqa: PLC0415
    import shutil  # noqa: PLC0415

    from market_pulse_data_pipeline_spark.operators.merge import (  # noqa: PLC0415
        commit_pointer_swap,
        list_versions,
        read_current,
        read_version,
    )

    root = os.path.join(_tt_scratch(), "orders_tt")
    shutil.rmtree(root, ignore_errors=True)
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    commit_pointer_swap(orders.filter(F.col("o_orderkey") % 2 == 0), root)
    commit_pointer_swap(orders, root)

    def summarize(df: DataFrame, tag: str) -> DataFrame:
        return df.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(20,6)"))
            .cast("double")
            .alias("price_sum"),
        ).select(
            F.lit(tag).alias("version_tag"), "o_orderstatus", "n", "price_sum"
        )

    v_first = list_versions(root)[0]
    old = summarize(read_version(spark, root, v_first), "v1")
    cur = summarize(read_current(spark, root), "v2")
    return old.unionByName(cur).orderBy("version_tag", "o_orderstatus")


@register(
    "join_strategy_independence",
    """
    WITH j AS (
      SELECT o.o_orderpriority,
             COUNT(*) AS n,
             CAST(SUM(CAST(l.l_quantity AS DECIMAL(20,6))) AS DOUBLE)
               AS qty_sum
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderdate >= DATE '1995-01-01'
        AND o.o_orderdate < DATE '1995-04-01'
      GROUP BY o.o_orderpriority
    )
    SELECT s.strategy, j.o_orderpriority, j.n, j.qty_sum
    FROM j, (VALUES ('broadcast'), ('merge'), ('shuffle_hash'),
                    ('shuffle_replicate_nl')) AS s(strategy)
    ORDER BY strategy, o_orderpriority
    """,
    doc="physical-strategy independence proof: the SAME join+aggregate "
    "executed under all four Spark join hints — BROADCAST, MERGE "
    "(sort-merge), SHUFFLE_HASH, SHUFFLE_REPLICATE_NL — unioned with a "
    "strategy tag; every variant must produce identical bytes (the "
    "oracle replicates one relational result x4). This is the "
    "guarantee that lets an operator author pick the physical plan "
    "purely on scale grounds (broadcast for dim-sized sides, "
    "sort-merge for fact-fact, shuffle-hash for mid-size skewless) "
    "with zero semantic risk. tests/test_quality_incremental.py "
    "asserts each hint actually selected its join node.",
)
def join_strategy_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = (
        t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
            & (F.col("o_orderdate") < F.lit("1995-04-01").cast("date"))
        )
        .select("o_orderkey", "o_orderpriority")
    )
    out = None
    for hint in ("broadcast", "merge", "shuffle_hash", "shuffle_replicate_nl"):
        j = (
            li.join(orders.hint(hint), li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("l_quantity").cast("decimal(20,6)"))
                .cast("double")
                .alias("qty_sum"),
            )
            .select(
                F.lit(hint).alias("strategy"), "o_orderpriority", "n", "qty_sum"
            )
        )
        out = j if out is None else out.unionByName(j)
    return out.orderBy("strategy", "o_orderpriority")


@register(
    "cdc_version_diff",
    """
    WITH old_v AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    ),
    new_v AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 1.5
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 97 <> 0
      UNION ALL
      SELECT o_orderkey + 1000000, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 101 = 0
    )
    SELECT o_orderkey, change_type FROM (
      SELECT COALESCE(n.o_orderkey, o.o_orderkey) AS o_orderkey,
             CASE WHEN o.o_orderkey IS NULL THEN 'inserted'
                  WHEN n.o_orderkey IS NULL THEN 'deleted'
                  WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice
                    OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                    THEN 'updated'
             END AS change_type
      FROM old_v o FULL OUTER JOIN new_v n ON o.o_orderkey = n.o_orderkey
    ) WHERE change_type IS NOT NULL
    """,
    bench=True,
    doc="change-data-feed derivation between two table versions "
    "(operators/cdc.py::version_diff over a deterministic synthetic "
    "edit of orders: %97 keys deleted, %13 repriced, %101 re-keyed as "
    "inserts). One keyed full-outer join emitting only changed keys "
    "with inserted/deleted/updated labels — the read side of a "
    "lakehouse change feed, and the input a downstream incremental "
    "materialization consumes. Null-safe value comparison; unchanged "
    "rows never leave the join.",
)
def cdc_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from market_pulse_data_pipeline_spark.operators.cdc import version_diff

    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    new_v = (
        orders.filter(F.col("o_orderkey") % 97 != 0)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 13 == 0, F.col("o_totalprice") + 1.5
            ).otherwise(F.col("o_totalprice")),
        )
        .unionByName(
            orders.filter(F.col("o_orderkey") % 101 == 0).withColumn(
                "o_orderkey", F.col("o_orderkey") + 1000000
            )
        )
    )
    return version_diff(orders, new_v, ["o_orderkey"])


@register(
    "cdc_apply_changes",
    """
    WITH changes AS (
      SELECT o_custkey AS c_custkey,
             'cdc-' || CAST(o_custkey AS VARCHAR) AS c_name,
             o_totalprice AS c_acctbal,
             CASE WHEN o_orderkey % 10 < 2 THEN 'delete'
                  ELSE 'upsert' END AS op,
             o_orderkey AS seq
      FROM orders
    ),
    latest AS (
      SELECT c_custkey, c_name, c_acctbal, op FROM (
        SELECT c.*, ROW_NUMBER() OVER (PARTITION BY c_custkey
                                       ORDER BY seq DESC) AS rn
        FROM changes c
      ) WHERE rn = 1
    )
    SELECT b.c_custkey, b.c_name, b.c_acctbal
    FROM customer b LEFT JOIN latest l ON b.c_custkey = l.c_custkey
    WHERE l.c_custkey IS NULL
    UNION ALL
    SELECT c_custkey, c_name, c_acctbal FROM latest WHERE op = 'upsert'
    """,
    doc="CDC feed replay (operators/cdc.py::apply_changes): a "
    "deterministic upsert/delete feed derived from orders (latest "
    "order per customer decides; %10<2 order keys are deletes) applied "
    "to the customer snapshot. Per key only the max-seq change takes "
    "effect — delete-then-upsert survives, upsert-then-delete is "
    "removed — so the replay is idempotent and order-insensitive "
    "within a batch, which is what makes it safe to run from "
    "foreachBatch at scale. One window over the feed + one anti-join "
    "against base; base rows without changes stream through untouched.",
)
def cdc_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from market_pulse_data_pipeline_spark.operators.cdc import apply_changes

    base = t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    orders = t(spark, sf_dir, "orders")
    changes = orders.select(
        F.col("o_custkey").alias("c_custkey"),
        F.concat(F.lit("cdc-"), F.col("o_custkey").cast("string")).alias(
            "c_name"
        ),
        F.col("o_totalprice").alias("c_acctbal"),
        F.when(F.col("o_orderkey") % 10 < 2, F.lit("delete"))
        .otherwise(F.lit("upsert"))
        .alias("op"),
        F.col("o_orderkey").alias("seq"),
    )
    return apply_changes(base, changes, ["c_custkey"])


@register(
    "table_fingerprint_orders",
    """
    SELECT COUNT(*) AS n_rows,
           bit_xor(h) AS xor_fp,
           -- CAST: DuckDB SUM(BIGINT) is HUGEINT -> float64 via the
           -- driver's pandas path; Spark emits int64. The sum itself is
           -- bounded: n_rows * (1e9+7) stays far below 2^63 (and below
           -- 2^53 through sf1 — pinned by tests/test_fingerprint_bounds.py).
           CAST(SUM(h % 1000000007) AS BIGINT) AS sum_fp
    FROM (
      SELECT ('0x' || substring(md5(
               CAST(o_orderkey AS VARCHAR) || '|' || o_orderstatus || '|' ||
               CAST(o_totalprice AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM orders
    )
    """,
    doc="order-insensitive whole-table fingerprint: per-row portable "
    "60-bit md5 over a canonical column serialization, combined with "
    "XOR and a modular sum (two independent commutative folds — "
    "collisions would have to fool both). The version-equality check "
    "that pairs with operators/cdc.py: two snapshots are equal iff "
    "their fingerprints match, ONE scan + a 3-cell aggregate each, no "
    "row comparison, trivially mergeable across partitions/files at "
    "100 TB. Cross-engine note: DOUBLE->VARCHAR rendering is pinned by "
    "both engines' shortest-roundtrip formatting for these fixture "
    "values (hash-checked here); production fingerprints should "
    "serialize exact types (long/decimal/string) only.",
)
def table_fingerprint_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from market_pulse_data_pipeline_spark.functions.dedup import (  # noqa: PLC0415
        portable_hash60,
    )

    orders = t(spark, sf_dir, "orders")
    h = portable_hash60(
        F.concat_ws(
            "|",
            F.col("o_orderkey").cast("string"),
            F.col("o_orderstatus"),
            F.col("o_totalprice").cast("string"),
        )
    )
    return orders.select(h.alias("h")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr("bit_xor(h)").alias("xor_fp"),
        F.sum(F.col("h") % F.lit(1000000007)).alias("sum_fp"),
    )


@register(
    "scd2_point_in_time_join",
    """
    WITH states AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS chg
      FROM events WHERE event_type != 'purchase'
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    runs AS (
      SELECT user_id, event_type,
             CAST(SUM(chg) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS version,
             ts
      FROM states
    ),
    dim AS (
      SELECT user_id, event_type AS state, version,
             epoch_us(CAST(MIN(ts) AS TIMESTAMP)) AS valid_from_us,
             COALESCE(
               lead(epoch_us(CAST(MIN(ts) AS TIMESTAMP)))
                 OVER (PARTITION BY user_id ORDER BY version),
               9223372036854775807) AS valid_to_us
      FROM runs GROUP BY user_id, event_type, version
    ),
    probes AS (
      SELECT user_id, event_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS p_us
      FROM events WHERE event_type = 'purchase'
    )
    SELECT p.user_id, p.event_id, p.p_us,
           d.state, d.version, d.valid_from_us
    FROM probes p
    LEFT JOIN dim d
      ON d.user_id = p.user_id
     AND p.p_us >= d.valid_from_us AND p.p_us < d.valid_to_us
    """,
    doc="SCD2 point-in-time lookup — the feature-store join that "
    "prevents training-serving leakage: each purchase retrieves the "
    "state VERSION that was valid AT its event time (half-open "
    "[valid_from, valid_to) intervals from the gaps-and-islands run "
    "construction; purchases before any state row get NULLs, never a "
    "future version). The oracle is the interval-predicate join; the "
    "Spark side uses the union + one-window merge (the as-of "
    "pattern): versions and probes interleave on (user, time) and "
    "last(ignoreNulls) carries the active version onto each probe — "
    "ONE shuffle, no range-predicate nested loop, exactly "
    "operators/asof.py's scale shape. SCD2 validity is the temporal "
    "twin of pointer-swap snapshot isolation: versions by business "
    "time instead of commit time.",
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window  # noqa: PLC0415

    ev = t(spark, sf_dir, "events")
    states = ev.filter(F.col("event_type") != "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = F.when(
        ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
    ).otherwise(0)
    runs = states.withColumn("chg", chg).withColumn(
        "version",
        F.sum("chg").over(
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    dim = runs.groupBy(
        "user_id", F.col("event_type").alias("state"), "version"
    ).agg(F.unix_micros(F.min("ts")).alias("valid_from_us"))
    probes = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", F.unix_micros(F.col("ts")).alias("p_us")
    )
    # as-of merge: versions and probes interleave on (user, time); the
    # active version carries forward onto each probe — one shuffle
    v_side = dim.select(
        "user_id",
        F.col("valid_from_us").alias("t_us"),
        F.lit(0).alias("is_probe"),
        F.lit(None).cast("long").alias("event_id"),
        "state",
        "version",
        "valid_from_us",
    )
    p_side = probes.select(
        "user_id",
        F.col("p_us").alias("t_us"),
        F.lit(1).alias("is_probe"),
        "event_id",
        F.lit(None).cast("string").alias("state"),
        F.lit(None).cast("long").alias("version"),
        F.lit(None).cast("long").alias("valid_from_us"),
    )
    # at equal timestamps the version row must precede the probe
    # (valid_from is inclusive), hence is_probe in the sort key.
    # version breaks ties BETWEEN version rows sharing a valid_from_us
    # (a ts-tie state change yields an empty [t, t) interval for the
    # earlier version): the later version must sort last so
    # last(ignoreNulls) carries it — the oracle's interval join gives
    # the empty interval no probes. event_id is NULL on version rows,
    # so without version the tie order would be nondeterministic.
    mw = Window.partitionBy("user_id").orderBy(
        "t_us", "is_probe", "version", "event_id"
    ).rowsBetween(Window.unboundedPreceding, 0)
    merged = v_side.unionByName(p_side).select(
        "user_id",
        "t_us",
        "is_probe",
        "event_id",
        F.last("state", ignorenulls=True).over(mw).alias("state"),
        F.last("version", ignorenulls=True).over(mw).alias("version"),
        F.last("valid_from_us", ignorenulls=True)
        .over(mw)
        .alias("valid_from_us"),
    )
    return merged.filter(F.col("is_probe") == 1).select(
        "user_id",
        "event_id",
        F.col("t_us").alias("p_us"),
        "state",
        "version",
        "valid_from_us",
    )


@register(
    "qc_profile_drift",
    """
    WITH new_v AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 1.5
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 97 <> 0
      UNION ALL
      SELECT o_orderkey + 1000000, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 101 = 0
    ),
    p_old AS (
      SELECT COUNT(*) AS n,
             CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_status,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(20,2))) AS DOUBLE)
               AS total_price,
             MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
      FROM orders
    ),
    p_new AS (
      SELECT COUNT(*) AS n,
             CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_status,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(20,2))) AS DOUBLE)
               AS total_price,
             MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
      FROM new_v
    )
    SELECT o.n AS n_old, nw.n AS n_new,
           nw.n - o.n AS row_drift,
           (ABS(nw.n - o.n) * 100 > o.n) AS row_drift_alert,
           (o.n_status != nw.n_status) AS status_domain_changed,
           CAST(ROUND(CAST(nw.total_price - o.total_price
                AS DECIMAL(28,10)), 2) AS DOUBLE) AS total_price_delta,
           (o.min_price != nw.min_price OR o.max_price != nw.max_price)
             AS range_changed
    FROM p_old o CROSS JOIN p_new nw
    """,
    doc="table-profile drift monitor between two versions (the "
    "pre-publish QC gate a nightly pipeline runs before swapping the "
    "pointer): row-count drift with a 1% alert threshold, categorical "
    "domain-cardinality change, exact-decimal total delta, and "
    "min/max range movement — computed as ONE aggregate row per "
    "version (single scan each) and one 1-row cross join. Versions "
    "are the same deterministic synthetic edit cdc_version_diff "
    "uses, so the drift numbers are cross-checkable against the "
    "change feed (row_drift = inserts - deletes). At 100 TB profile "
    "rows are constant-size whatever the table; persist them per "
    "version and drift checks never rescan history.",
)
def qc_profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    new_v = (
        orders.filter(F.col("o_orderkey") % 97 != 0)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 13 == 0, F.col("o_totalprice") + 1.5
            ).otherwise(F.col("o_totalprice")),
        )
        .unionByName(
            orders.filter(F.col("o_orderkey") % 101 == 0).withColumn(
                "o_orderkey", F.col("o_orderkey") + 1000000
            )
        )
    )

    def profile(df):
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("o_orderstatus").alias("n_status"),
            F.sum(F.col("o_totalprice").cast("decimal(20,2)"))
            .cast("double")
            .alias("total_price"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )

    o = profile(orders).alias("o")
    nw = profile(new_v).alias("nw")
    return o.crossJoin(F.broadcast(nw)).select(
        F.col("o.n").alias("n_old"),
        F.col("nw.n").alias("n_new"),
        (F.col("nw.n") - F.col("o.n")).alias("row_drift"),
        (F.abs(F.col("nw.n") - F.col("o.n")) * 100 > F.col("o.n")).alias(
            "row_drift_alert"
        ),
        (F.col("o.n_status") != F.col("nw.n_status")).alias(
            "status_domain_changed"
        ),
        F.round(
            (F.col("nw.total_price") - F.col("o.total_price")).cast(
                "decimal(28,10)"
            ),
            2,
        )
        .cast("double")
        .alias("total_price_delta"),
        (
            (F.col("o.min_price") != F.col("nw.min_price"))
            | (F.col("o.max_price") != F.col("nw.max_price"))
        ).alias("range_changed"),
    )


@register(
    "calendar_interpolate_linear",
    f"""
    WITH daily AS (
      SELECT user_id,
             CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS day_value
      FROM events WHERE user_id < {_GAPFILL_USERS}
      GROUP BY 1, 2
    ), span AS (
      SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily
      GROUP BY user_id
    ), spine AS (
      SELECT user_id, CAST(g.d AS DATE) AS day
      FROM span, UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS g(d)
    ), neighbors AS (
      SELECT s.user_id, s.day,
             (d.day IS NOT NULL) AS observed,
             last_value(d.day_value IGNORE NULLS)
               OVER (PARTITION BY s.user_id ORDER BY s.day
                     ROWS UNBOUNDED PRECEDING) AS pv,
             last_value(d.day IGNORE NULLS)
               OVER (PARTITION BY s.user_id ORDER BY s.day
                     ROWS UNBOUNDED PRECEDING) AS pd,
             first_value(d.day_value IGNORE NULLS)
               OVER (PARTITION BY s.user_id ORDER BY s.day
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             first_value(d.day IGNORE NULLS)
               OVER (PARTITION BY s.user_id ORDER BY s.day
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
      FROM spine s LEFT JOIN daily d
        ON s.user_id = d.user_id AND s.day = d.day
    )
    SELECT user_id, day, observed,
           CASE WHEN observed THEN pv
                ELSE pv + (nv - pv)
                     * (day - pd) / (nd - pd)
           END AS value_interp
    FROM neighbors
    """,
    doc="calendar gap-fill with LINEAR interpolation (the resampling "
    "mode forward-fill can't express: missing days move smoothly "
    "between the surrounding observations instead of holding flat): "
    "previous observation via last(ignoreNulls) over the preceding "
    "frame, next via first(ignoreNulls) over the following frame, "
    "then value = prev + (next-prev) * elapsed/gap. Interior gaps "
    "always have both neighbors (the spine spans first..last "
    "observation), so no NULL edge cases; both engines compute the "
    "identical double expression (day differences are exact small "
    "ints, the division is one IEEE op). Same spine-per-key scale "
    "shape as calendar_gapfill_ffill — rows ∝ span, two window "
    "passes sharing one partitioning.",
)
def calendar_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < _GAPFILL_USERS)
    daily = ev.groupBy(
        "user_id",
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(
        F.sum(F.col("value").cast("decimal(20,6)"))
        .cast("double")
        .alias("day_value")
    )
    span = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = span.select(
        "user_id",
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias(
            "day"
        ),
    )
    joined = spine.join(
        daily.withColumnRenamed("day", "obs_day"),
        (spine.user_id == daily.user_id) & (spine.day == F.col("obs_day")),
        "left",
    ).select(spine.user_id, spine.day, F.col("obs_day"), F.col("day_value"))
    back = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    nb = joined.select(
        "user_id",
        "day",
        F.col("obs_day").isNotNull().alias("observed"),
        F.last("day_value", ignorenulls=True).over(back).alias("pv"),
        F.last("obs_day", ignorenulls=True).over(back).alias("pd"),
        F.first("day_value", ignorenulls=True).over(fwd).alias("nv"),
        F.first("obs_day", ignorenulls=True).over(fwd).alias("nd"),
    )
    interp = F.when(F.col("observed"), F.col("pv")).otherwise(
        F.col("pv")
        + (F.col("nv") - F.col("pv"))
        * F.datediff(F.col("day"), F.col("pd"))
        / F.datediff(F.col("nd"), F.col("pd"))
    )
    return nb.select("user_id", "day", "observed", interp.alias("value_interp"))
