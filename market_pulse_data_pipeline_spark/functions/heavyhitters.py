"""Misra-Gries heavy-hitter candidate generation (mergeable summaries).

The Misra-Gries summary keeps at most ``k - 1`` counters and guarantees
that any item whose true frequency exceeds ``n / k`` survives; merging
two summaries (add counters, subtract the k-th largest count, drop
non-positives) preserves the combined ``(n1 + n2) / k`` error bound
[Agarwal et al., "Mergeable Summaries", PODS 2012]. Run per partition,
the union of partition summaries therefore contains EVERY global heavy
hitter: if an item's global count exceeds n/k = Σ_p n_p/k, the
pigeonhole principle gives a partition p where its local count exceeds
n_p/k, and that partition's summary retains it.

This module implements the candidate-generation half of the
"sketch-propose, exact-verify" pattern: downstream code re-counts the
(bounded, ≤ (k-1) × num_partitions) candidate set exactly and filters
to the true threshold, so the final result is deterministic and
independent of partitioning even though each partition's summary is not.

Scale shape: one pass over the data with O(k) state per partition, no
shuffle during sketching (mapInPandas, Arrow-batched, value_counts
vectorized per batch — never a per-row Python loop), then a distinct on
the tiny candidate relation.
"""

from __future__ import annotations

import heapq
from collections import Counter
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def mg_fold(counters: Counter, batch_counts: dict, k: int) -> Counter:
    """One weighted Misra-Gries merge step: fold a batch's exact counts
    into the summary, then restore the <= k-1 size bound by subtracting
    the k-th largest count from every counter (equivalent to that many
    rounds of the classic decrement-all step). Pure function so the
    summary invariants are property-testable without a SparkSession."""
    counters = counters + Counter(batch_counts)
    if len(counters) > k - 1:
        kth = heapq.nlargest(k, counters.values())[-1]
        counters = Counter(
            {key: c - kth for key, c in counters.items() if c > kth}
        )
    return counters


def misra_gries_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """Distinct per-partition Misra-Gries survivors of ``df[col]``.

    Returns a 1-column DataFrame (same column name) holding a SUPERSET
    of the items whose global frequency exceeds count(df)/k. The exact
    membership depends on partitioning; only the superset guarantee is
    stable, so callers must exact-verify before reporting.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k!r}")
    src = df.select(col)
    schema = src.schema

    def sketch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: Counter = Counter()
        for pdf in batches:
            counters = mg_fold(
                counters, pdf[col].value_counts().to_dict(), k
            )
        yield pd.DataFrame({col: list(counters.keys())})

    return src.mapInPandas(sketch, schema).distinct()
