"""Multi-dimensional data layout: Z-order (Morton) clustering.

Parquet data skipping prunes files/row-groups by min/max statistics.
Sorting by ONE key makes its stats tight but leaves every other column's
range spanning the whole table — filters on a second dimension prune
nothing. Interleaving the bits of two keys (Morton code) and sorting by
that single value bounds BOTH dimensions per file at ~sqrt coverage, so
selective filters on either key (or both) skip most of a 100 TB table.

The code is a pure integer expression (shift/and/add), built from
JVM-side functions — usable in repartitionByRange + sortWithinPartitions
ahead of any parquet write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_code(x: Column, y: Column, bits: int = 8) -> Column:
    """Interleave the low ``bits`` bits of x (even positions) and y (odd
    positions) into a single 2*bits-bit Z-order code. Inputs must be
    pre-bucketized to [0, 2^bits)."""
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = z + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return z


def sql_morton_code(x: str, y: str, bits: int = 8) -> str:
    """The identical interleave as ANSI/DuckDB SQL (operators, not
    Spark's shiftleft/shiftright functions)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def write_zorder_sorted(
    df: DataFrame,
    path: str,
    x: str,
    y: str,
    bits: int = 8,
    n_files: int = 32,
) -> None:
    """Write parquet clustered by the Z-order of (x % 2^bits, y % 2^bits):
    range-partition on the code (one skew-resistant range shuffle), sort
    within partitions, one file per partition — each file's min/max stats
    then bound both x and y."""
    mask = (1 << bits) - 1
    z = morton_code(
        F.col(x).bitwiseAND(F.lit(mask)), F.col(y).bitwiseAND(F.lit(mask)), bits
    )
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
