"""Change-data-capture primitives over immutable table versions.

Complements operators/merge.py's pointer-swap versioning: `version_diff`
derives the row-level change feed BETWEEN two committed versions (what
a lakehouse exposes as a change data feed), and `apply_changes` replays
an upsert/delete feed onto a base snapshot (the consumer side — e.g.
propagating bronze changes into a downstream mart without a full
rebuild, which is the incremental counterpart of the reference's
full-rebuild dbt models, dbt_finance/dbt_project.yml:6).

Scale shapes: both are single key-shuffle operations — `version_diff`
is one full-outer join on the key, `apply_changes` is one window pass
over the (small) change feed plus one anti-join against base. Neither
forms pairs or collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

INSERTED = "inserted"
DELETED = "deleted"
UPDATED = "updated"


def version_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level diff new-vs-old keyed on ``keys`` (assumed non-null and
    unique per version, the pointer-swap table contract).

    Returns one row per changed key: the key columns plus
    ``change_type`` ∈ inserted | deleted | updated. Unchanged rows are
    dropped. Value comparison is null-safe on ``compare_cols``
    (default: every non-key column of ``new``).
    """
    if compare_cols is None:
        compare_cols = [c for c in new.columns if c not in keys]
    o = old.select(*keys, *compare_cols).alias("o")
    n = new.select(*keys, *compare_cols).alias("n")
    cond = None
    for k in keys:
        eq = F.col(f"o.{k}") == F.col(f"n.{k}")
        cond = eq if cond is None else cond & eq
    joined = o.join(n, cond, "full_outer")
    in_old = F.col(f"o.{keys[0]}").isNotNull()
    in_new = F.col(f"n.{keys[0]}").isNotNull()
    changed = None
    for c in compare_cols:
        ne = ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
        changed = ne if changed is None else changed | ne
    change_type = (
        F.when(~in_old, F.lit(INSERTED))
        .when(~in_new, F.lit(DELETED))
        .when(changed if changed is not None else F.lit(False), F.lit(UPDATED))
    )
    return (
        joined.select(
            *[
                F.coalesce(F.col(f"n.{k}"), F.col(f"o.{k}")).alias(k)
                for k in keys
            ],
            change_type.alias("change_type"),
        )
        .filter(F.col("change_type").isNotNull())
    )


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str],
    op_col: str = "op",
    seq_col: str = "seq",
) -> DataFrame:
    """Replay a CDC feed onto a base snapshot.

    ``changes`` carries the key columns, ``op_col`` ∈ 'upsert' |
    'delete', ``seq_col`` (a monotone change ordering — commit LSN,
    timestamp), and the full payload for upserts. Per key only the
    LATEST change (max ``seq_col``) takes effect — a delete-then-upsert
    key survives with the upsert payload; an upsert-then-delete key is
    removed. Base rows with no change pass through unchanged.
    """
    w = Window.partitionBy(*keys).orderBy(F.col(seq_col).desc())
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    survivors = (
        latest.filter(F.col(op_col) == "upsert").drop(op_col, seq_col)
    )
    untouched = base.join(latest.select(*keys), keys, "left_anti")
    return untouched.unionByName(survivors)
