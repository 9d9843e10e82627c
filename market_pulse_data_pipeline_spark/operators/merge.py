"""Keyed upsert & last-write-wins merge (reference operators J2, J3) plus
atomic parquet overwrite — the one genuinely stateful physical concern in
the rebuild (SURVEY.md §4.2-1).

J2 — whole-document MERGE on SYMBOL (``dags/minio_to_snowflake.py:66-75``):
WHEN MATCHED UPDATE, WHEN NOT MATCHED INSERT; last write wins per key.
Plain-parquet idiom: ``new ∪ (old ⟕anti new)`` — the anti-join is a
broadcast when the delta is small (the common incremental case), so the
big base table is never shuffled.

J3 — map-level per-(symbol, date) merge (``dags/get_stock.py:84-105``):
``existing_series.update(new_series)`` — new API data overwrites
same-date entries, older dates retained. Row-level idiom: union + keep
the newest row per key via max-priority semi-aggregation.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def upsert_by_key(old: DataFrame, new: DataFrame, keys: list[str] | str) -> DataFrame:
    """J2 — keyed upsert: every key present in ``new`` takes ``new``'s row;
    keys only in ``old`` are retained.

    The anti-join probe side is ``new`` (typically the small daily delta),
    so Catalyst broadcasts it and the base table streams through without a
    shuffle — the property that matters at 100 TB.
    """
    keys = [keys] if isinstance(keys, str) else keys
    survivors = old.join(new.select(*keys).distinct(), on=keys, how="left_anti")
    return new.unionByName(survivors)


def merge_last_write_wins(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    order_col: str = "_batch_priority",
) -> DataFrame:
    """J3 — per-key last-write-wins across batches.

    Tags each side with a batch priority, unions, and keeps the highest-
    priority row per key (ties impossible: priorities differ). Implemented
    with row_number over (keys ORDER BY priority DESC) — a single shuffle
    on the merge keys; at scale, AQE handles skewed keys.
    """
    tagged = old.withColumn(order_col, F.lit(0)).unionByName(
        new.withColumn(order_col, F.lit(1))
    )
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", order_col)
    )


def atomic_overwrite_parquet(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> None:
    """Write-new-then-swap so readers never observe a half-written table
    (and so ``upsert_by_key(read(path), delta)`` can safely rewrite the
    very path it read from — Spark cannot overwrite an input in place).

    ``partition_by`` hive-partitions the table — at scale, partition
    pruning on those columns turns full scans into directory-pruned reads.
    """
    tmp = f"{path}.__tmp__{uuid.uuid4().hex[:8]}"
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)
    if os.path.exists(path):
        old = f"{path}.__old__{uuid.uuid4().hex[:8]}"
        os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old, ignore_errors=True)
    else:
        os.rename(tmp, path)
