"""Pins for the snapped-PCA conversion (rows-only → value-hash oracle).

Three independent angles:

1. Engine-free cross-engine parity: the driver-side pure-Python integer
   eigensolve (``_pca_snapped_vectors``) plus IEEE float finishing must
   reproduce the DuckDB oracle (``pca_oracle_sql``) bit-for-bit — the
   same parity the CORRECTNESS gate witnesses Spark-side, pinned here
   without a Spark session so regressions surface in seconds.
2. Quality: both snapped principal directions align with numpy's eigh
   to |cos| ≥ 0.9999 at every fixture SF (repeated squaring handles the
   corpus's near-flat spectrum: top-3 eigenvalue ratios ≈ 0.99), and
   the two components are orthogonal to integer resolution.
3. Spark end-to-end: ``pca_snapped_project`` output at sf0.001 equals
   the independently-emulated projection exactly.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

import duckdb
import numpy as np
import pytest

from market_pulse_data_pipeline_spark.functions.clustering import (
    SNAP_SCALE,
    _pca_snapped_vectors,
    pca_oracle_sql,
    pca_snapped_project,
    quantize_vec_py,
)

_DIM = 64


def _load(sf: str):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM "
        f"'/root/testdata/sf{sf}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    con.close()
    return rows


def _moments(V):
    n = len(V)
    s = [sum(v[i] for v in V) for i in range(_DIM)]
    G = [
        [sum(v[i] * v[j] for v in V) for j in range(_DIM)]
        for i in range(_DIM)
    ]
    return n, s, G


def _unit(v):
    nrm = math.sqrt(float(sum(c * c for c in v)))
    return [float(c) / nrm for c in v]


def _snap4(p: float) -> float:
    """Python twin of round_div(p, 1.0, 4): decimal(28,8) then ROUND 4,
    both half-up over the shortest-round-trip repr (the quantize_vec_py
    equivalence argument)."""
    q = Decimal(repr(p)).quantize(Decimal("1e-8"), ROUND_HALF_UP)
    return float(q.quantize(Decimal("1e-4"), ROUND_HALF_UP))


def _emulate_projection(rows):
    """Driver-loop + IEEE-ordered fold emulation of the full query."""
    V = [quantize_vec_py(r[1]) for r in rows]
    n, s, G = _moments(V)
    v1, v2 = _pca_snapped_vectors(n, s, G, _DIM)
    c1, c2 = _unit(v1), _unit(v2)
    mean = [float(s[i]) / float(n * SNAP_SCALE) for i in range(_DIM)]
    out = []
    for r, v in zip(rows, V):
        p1 = 0.0
        p2 = 0.0
        for i in range(_DIM):
            cen = float(v[i]) / float(SNAP_SCALE) - mean[i]
            p1 += cen * c1[i]
            p2 += cen * c2[i]
        out.append((r[0], _snap4(p1), _snap4(p2)))
    return out, (v1, v2)


@pytest.mark.parametrize("sf", ["0.001", "0.01"])
def test_oracle_matches_driver_loop_bit_for_bit(sf):
    rows = _load(sf)
    want, _ = _emulate_projection(rows)
    con = duckdb.connect()
    sql = pca_oracle_sql(
        dim=_DIM,
        src=f"'/root/testdata/sf{sf}/embeddings.parquet'",
    )
    got = con.execute(sql).fetchall()
    con.close()
    assert len(got) == len(want)
    assert all(a == tuple(b) for a, b in zip(want, got))


@pytest.mark.parametrize("sf", ["0.001", "0.01", "0.1"])
def test_snapped_directions_align_with_eigh(sf):
    rows = _load(sf)
    V = [quantize_vec_py(r[1]) for r in rows]
    n, s, G = _moments(V)
    v1, v2 = _pca_snapped_vectors(n, s, G, _DIM)
    c1, c2 = np.array(_unit(v1)), np.array(_unit(v2))
    X = np.array(V, dtype=np.float64) / SNAP_SCALE
    cov = np.cov(X, rowvar=False, bias=True)
    _, vecs = np.linalg.eigh(cov)
    assert abs(float(c1 @ vecs[:, -1])) >= 0.9999
    assert abs(float(c2 @ vecs[:, -2])) >= 0.9999
    # orthogonal to integer truncation resolution (~1/VS)
    assert abs(float(c1 @ c2)) < 1e-4


def test_spark_projection_matches_emulation(spark, sf_dir):
    from market_pulse_data_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    got = {
        r["vec_id"]: (r["pc1"], r["pc2"])
        for r in pca_snapped_project(emb, dim=_DIM).collect()
    }
    rows = _load("0.001")
    want, _ = _emulate_projection(rows)
    assert len(got) == len(want)
    for vec_id, p1, p2 in want:
        assert got[vec_id] == (p1, p2)
