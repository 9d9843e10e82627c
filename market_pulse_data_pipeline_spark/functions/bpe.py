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

``bpe_oracle_sql`` replays the ENTIRE training loop in DuckDB as
chained materialized CTEs (the kmeans/pagerank/PCA unrolling
discipline): per round, the argmax pair is a windowed-lead count with
the same (n DESC, l, r) order, and the greedy non-overlapping merge is
gaps-and-islands — candidate positions p (tok=l, next=r) can only
overlap when consecutive, so within each maximal run of consecutive
candidates exactly the odd-numbered ones merge, which IS the
left-to-right greedy rule. Early stop falls out for free: a round
whose best pair has n < 2 merges nothing (the n >= 2 filter empties
the candidate set), leaving the corpus unchanged, so every later round
reproduces the same sub-threshold argmax and is filtered identically —
matching the Spark loop's break.
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
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    id_col: str | None = None,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` merges; returns [(left, right, pair_count)]
    in rank order. Stops early when no pair occurs twice."""
    merges, _ = bpe_train_encode(docs, n_merges, text_col, id_col)
    return merges


def bpe_train_encode(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    id_col: str | list[str] | None = None,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """``bpe_train`` that also returns the ENCODED corpus — the symbol
    arrays after every learned merge has been applied in rank order
    (training's final state IS the encode of the training corpus: BPE
    encoding applies merges in learned order, which is exactly what
    each training round's merge pass did). ``id_col`` carries a
    per-document key (or list of passthrough columns — e.g. the
    language for a per-lang rollup) through the merge passes so the
    encode is addressable; the extra columns never enter pair
    counting."""
    if id_col is None:
        keep = []
    elif isinstance(id_col, str):
        keep = [id_col]
    else:
        keep = list(id_col)
    sym = docs.select(*keep, F.split(F.col(text_col), " ").alias("ws"))
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
            *keep,
            _merge_pass(F.col("ws"), F.lit(left), F.lit(right)).alias("ws"),
        )
    return merges, sym


def bpe_oracle_sql(
    n_merges: int = 8,
    src: str = "documents",
    text_col: str = "text",
    final: str | None = None,
) -> str:
    """DuckDB twin of ``bpe_train``: the full iterative loop unrolled as
    materialized CTEs — t0 is the (doc_id, pos, tok) shred of the split
    corpus; each round i derives the argmax pair b{i} (LIMIT 1 under the
    Spark orderBy, kept only when n >= 2), the greedily-kept candidate
    positions keep{i} (islands of consecutive candidates, odd ranks),
    and the rewritten corpus t{i} (merged token at kept positions,
    consumed successors dropped, positions renumbered). Output matches
    the Spark query's (merge_rank, left, right, pair_count) schema —
    unless ``final`` overrides the tail SELECT, which may reference any
    chain CTE (``t{n_merges}`` is the fully-encoded corpus — the
    ``bpe_encode_corpus`` oracle aggregates it per doc). CTEs are
    MATERIALIZED so each round's corpus is computed once, not
    re-expanded per reference."""
    parts = [
        f"""
WITH t0 AS MATERIALIZED (
  SELECT doc_id, u.pos, u.tok
  FROM (SELECT doc_id, string_split({text_col}, ' ') AS ws FROM {src}),
       UNNEST(list_transform(range(1, len(ws) + 1),
                             i -> {{'pos': i, 'tok': ws[i]}})) AS uu(u)
)"""
    ]
    for i in range(1, n_merges + 1):
        p = f"t{i - 1}"
        parts.append(f""",
b{i} AS MATERIALIZED (
  SELECT l, r, n FROM (
    SELECT l, r, COUNT(*) AS n
    FROM (SELECT tok AS l,
                 lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS r
          FROM {p})
    WHERE r IS NOT NULL
    GROUP BY l, r
    ORDER BY n DESC, l, r
    LIMIT 1
  ) WHERE n >= 2
),
keep{i} AS MATERIALIZED (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos,
           ROW_NUMBER() OVER (PARTITION BY doc_id, grp ORDER BY pos) AS k
    FROM (
      SELECT doc_id, pos,
             pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos)
               AS grp
      FROM (
        SELECT x.doc_id, x.pos
        FROM (SELECT doc_id, pos, tok,
                     lead(tok) OVER (PARTITION BY doc_id ORDER BY pos)
                       AS nxt
              FROM {p}) x, b{i} b
        WHERE x.tok = b.l AND x.nxt = b.r
      )
    )
  ) WHERE k % 2 = 1
),
t{i} AS MATERIALIZED (
  SELECT doc_id,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS pos,
         tok
  FROM (
    SELECT t.doc_id, t.pos,
           CASE WHEN k1.pos IS NOT NULL
                THEN (SELECT l || ' ' || r FROM b{i})
                ELSE t.tok END AS tok
    FROM {p} t
    LEFT JOIN keep{i} k1 ON k1.doc_id = t.doc_id AND k1.pos = t.pos
    LEFT JOIN keep{i} k2 ON k2.doc_id = t.doc_id AND k2.pos = t.pos - 1
    WHERE k2.pos IS NULL
  )
)""")
    if final is not None:
        parts.append(final)
        return "".join(parts)
    sel = "\nUNION ALL ".join(
        f'SELECT {i - 1} AS merge_rank, l AS "left", r AS "right", '
        f"CAST(n AS BIGINT) AS pair_count FROM b{i}"
        for i in range(1, n_merges + 1)
    )
    parts.append(f"\nSELECT * FROM ({sel}) ORDER BY merge_rank")
    return "".join(parts)
