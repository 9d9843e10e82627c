"""Skew mitigation utilities.

AQE's skew-join splitting handles most cases at runtime
(spark.sql.adaptive.skewJoin.enabled, on in session.py); these helpers
cover the two patterns AQE can't fix:

- ``salted_aggregate``: a hot grouping key that funnels into one reducer.
  Two-phase: aggregate on (key, salt) first (spreads the hot key over
  ``salt_buckets`` reducers), then combine partials on key. Works for any
  algebraic aggregate expressed as (partial, combine) column pairs.
- ``salted_broadcast_left``: replicate-the-small-side salt join for when
  a skewed key must be joined and the dim is too big to broadcast whole
  but small enough to replicate per salt bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    partials: dict[str, tuple[Column, Column]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation over skewed keys.

    ``partials`` maps output name → (phase1 aggregate over rows,
    phase2 combiner over phase-1 results); e.g.::

        salted_aggregate(df, ["k"], {
            "total": (F.sum("v"), F.sum("total")),
            "n":     (F.count(F.lit(1)), F.sum("n")),
        })

    Phase 1 groups on keys + a uniform salt, so a key with 10^9 rows
    becomes ``salt_buckets`` partial groups instead of one giant reducer;
    phase 2 combines the (tiny) partials.
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets))
    )
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[expr.alias(name) for name, (expr, _) in partials.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[comb.alias(name) for name, (_, comb) in partials.items()]
    )


def salted_broadcast_left(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "left",
) -> DataFrame:
    """Join a skew-keyed fact against a dim by salting the fact and
    replicating the dim once per salt bucket — every bucket of the hot
    key joins in parallel instead of on a single task."""
    salted_fact = fact.withColumn(
        "_salt",
        F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets)).cast("int"),
    )
    replicated_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    return salted_fact.join(replicated_dim, on=[key, "_salt"], how=how).drop(
        "_salt"
    )
