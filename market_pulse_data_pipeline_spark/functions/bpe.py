"""Distributed BPE-style merge induction over the corpus.

Classic byte-pair-encoding training loop, lifted to word symbols
(phrase induction): repeatedly count adjacent symbol pairs corpus-wide,
merge the most frequent pair everywhere, repeat. This is the actual
iterative vocabulary-learning algorithm (the registry's
``text_bpe_token_estimate`` is the static cost model that CONSUMES such
a vocab).

Scale shape per merge round, mirroring functions/clustering.py's
driver-coordination pattern:

- pair counting is posexplode-free: a JVM ``transform`` over index
  sequences builds the per-doc pair list, one hash aggregate shuffles
  per-pair partials (vocabulary-bounded, not row-bounded);
- the argmax pair is a 1-row TakeOrdered collect (count desc, then
  lexicographic — fully deterministic);
- the merge applies as a greedy left-to-right single pass per doc via a
  higher-order ``aggregate`` lambda — map-only, no Python;
- symbol arrays are ``localCheckpoint``-ed each round so the lineage
  (and recompute cost) stays O(1) per round instead of O(rounds).

Exactness is pinned by tests/test_bpe.py against a pure-Python replay
of the same greedy semantics ("x x x" with pair (x,x) merges positions
0-1 only — non-overlapping, left to right).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pair_list(ws):
    """Adjacent-pair structs for one symbol array (empty when < 2)."""
    return F.when(
        F.size(ws) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(ws) - 2),
            lambda i: F.struct(
                F.element_at(ws, i + 1).alias("l"),
                F.element_at(ws, i + 2).alias("r"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))


def _merge_pass(ws, left, right):
    """Greedy non-overlapping left-to-right merge of (left, right) into
    one symbol 'left right' — a single higher-order aggregate, JVM-side."""
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(False).alias("skip"),
    )

    def step(acc, i):
        tok = F.element_at(ws, i + 1)
        nxt = F.element_at(ws, i + 2)  # NULL at the last index
        is_pair = (
            (i < F.size(ws) - 1) & (tok == left) & (nxt.eqNullSafe(right))
        )
        return F.when(
            acc["skip"],
            F.struct(acc["out"].alias("out"), F.lit(False).alias("skip")),
        ).otherwise(
            F.when(
                is_pair,
                F.struct(
                    F.array_append(
                        acc["out"], F.concat(tok, F.lit(" "), nxt)
                    ).alias("out"),
                    F.lit(True).alias("skip"),
                ),
            ).otherwise(
                F.struct(
                    F.array_append(acc["out"], tok).alias("out"),
                    F.lit(False).alias("skip"),
                )
            )
        )

    return F.aggregate(
        F.sequence(F.lit(0), F.size(ws) - 1),
        init,
        step,
        lambda acc: acc["out"],
    )


def bpe_train(
    docs: DataFrame, n_merges: int = 8, text_col: str = "text"
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` merges; returns [(left, right, pair_count)]
    in rank order. Stops early when no pair occurs twice."""
    sym = docs.select(F.split(F.col(text_col), " ").alias("ws"))
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        sym = sym.localCheckpoint(eager=True)  # O(1) lineage per round
        top = (
            sym.select(F.explode(_pair_list(F.col("ws"))).alias("p"))
            .groupBy("p.l", "p.r")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.col("n").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < 2:
            break
        left, right, n = top[0]["l"], top[0]["r"], top[0]["n"]
        merges.append((left, right, n))
        sym = sym.select(
            _merge_pass(F.col("ws"), F.lit(left), F.lit(right)).alias("ws")
        )
    return merges
