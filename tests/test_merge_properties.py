"""Property-based tests (hypothesis) for the upsert/merge operators —
the reference's core stateful semantics (SURVEY §2.3 J2/J3):

- upsert_by_key: keys(result) = keys(old) ∪ keys(new); new wins on
  overlap; old-only rows pass through untouched; idempotent.
- merge_last_write_wins: equals the dict-update semantics of the
  reference's ``existing.update(new)`` (get_stock.py:88-97).
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from market_pulse_data_pipeline_spark.operators.merge import (
    merge_last_write_wins,
    upsert_by_key,
)

KEYS = st.integers(min_value=0, max_value=20)
VALS = st.integers(min_value=-1000, max_value=1000)
BATCH = st.lists(st.tuples(KEYS, VALS), max_size=30)


def _df(spark, rows):
    return spark.createDataFrame(
        [(k, v) for k, v in rows], "k int, v int"
    )


def _dedup_last(rows):
    out = {}
    for k, v in rows:
        out[k] = v
    return out


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(old=BATCH, new=BATCH)
def test_upsert_by_key_is_dict_update(spark, old, new):
    # upsert operates on unique-keyed tables (bronze invariant) — dedup
    # inputs the same way the pipeline does before upserting
    old_m, new_m = _dedup_last(old), _dedup_last(new)
    result = upsert_by_key(
        _df(spark, old_m.items()), _df(spark, new_m.items()), "k"
    ).collect()
    got = {r.k: r.v for r in result}
    want = {**old_m, **new_m}  # dict-update: new wins
    assert got == want
    assert len(result) == len(want)  # key uniqueness preserved


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(old=BATCH, new=BATCH)
def test_upsert_idempotent(spark, old, new):
    old_m, new_m = _dedup_last(old), _dedup_last(new)
    old_df, new_df = _df(spark, old_m.items()), _df(spark, new_m.items())
    once = upsert_by_key(old_df, new_df, "k")
    twice = upsert_by_key(once, new_df, "k")
    assert sorted((r.k, r.v) for r in once.collect()) == sorted(
        (r.k, r.v) for r in twice.collect()
    )


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(old=BATCH, new=BATCH)
def test_merge_last_write_wins_matches_dict_semantics(spark, old, new):
    old_m, new_m = _dedup_last(old), _dedup_last(new)
    got = {
        r.k: r.v
        for r in merge_last_write_wins(
            _df(spark, old_m.items()), _df(spark, new_m.items()), ["k"]
        ).collect()
    }
    assert got == {**old_m, **new_m}


def test_pointer_swap_commit_roundtrip(spark, tmp_path):
    """commit_pointer_swap: reader always resolves a complete snapshot;
    re-commit flips the pointer; vacuum never removes the current one."""
    from market_pulse_data_pipeline_spark.operators.merge import (
        commit_pointer_swap,
        read_current,
        vacuum_versions,
    )

    root = str(tmp_path / "tbl")
    df1 = _df(spark, [(1, 10), (2, 20)])
    commit_pointer_swap(df1, root)
    got1 = sorted((r.k, r.v) for r in read_current(spark, root).collect())
    assert got1 == [(1, 10), (2, 20)]

    df2 = _df(spark, [(1, 90)])
    p2 = commit_pointer_swap(df2, root)
    got2 = sorted((r.k, r.v) for r in read_current(spark, root).collect())
    assert got2 == [(1, 90)]

    df3 = _df(spark, [(3, 30)])
    commit_pointer_swap(df3, root)
    removed = vacuum_versions(root, keep=2)
    # oldest version vacuumed; current still readable
    assert len(removed) == 1
    assert p2 not in removed  # keep=2 retains the previous version too
    assert sorted((r.k, r.v) for r in read_current(spark, root).collect()) == [
        (3, 30)
    ]


def test_compact_current_version_reduces_files_preserves_rows(spark, tmp_path):
    from market_pulse_data_pipeline_spark.operators.merge import (
        commit_pointer_swap,
        compact_current_version,
        list_versions,
        read_current,
        read_version,
    )

    root = str(tmp_path / "tbl")
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    # fragment: 64 tiny files
    commit_pointer_swap(li.repartition(64), root)
    before = read_current(spark, root)
    n_rows = before.count()
    frag_version = list_versions(root)[-1]

    _, n_in, n_out = compact_current_version(
        spark, root, target_bytes=1 * 1024 * 1024
    )
    assert n_in == 64
    assert n_out < n_in
    after = read_current(spark, root)
    assert after.count() == n_rows
    # content identical (order-insensitive)
    assert before.exceptAll(after).count() == 0
    assert after.exceptAll(before).count() == 0
    # fragmented snapshot still time-travelable until vacuum
    assert read_version(spark, root, frag_version).count() == n_rows


def test_pointer_swap_crash_window_leaves_readers_on_old_snapshot(
    spark, tmp_path
):
    """The pointer-swap failure window: a writer that dies AFTER landing
    its immutable v_ prefix but BEFORE the atomic pointer flip leaves an
    orphan directory — readers keep resolving the old snapshot (never a
    torn or half-visible table), the next successful commit supersedes
    it, and vacuum eventually collects the orphan."""
    import os
    import time

    from market_pulse_data_pipeline_spark.operators.merge import (
        commit_pointer_swap,
        read_current,
        vacuum_versions,
    )

    root = str(tmp_path / "tbl")
    commit_pointer_swap(_df(spark, [(1, 10), (2, 20)]), root)

    # crash simulation: data fully written, pointer never flipped
    orphan = "v_orphancrash"
    _df(spark, [(1, 999)]).write.parquet(os.path.join(root, orphan))
    got = sorted((r.k, r.v) for r in read_current(spark, root).collect())
    assert got == [(1, 10), (2, 20)]  # readers unaffected by the orphan

    time.sleep(1.1)  # vacuum orders versions by mtime; separate them
    commit_pointer_swap(_df(spark, [(3, 30)]), root)
    assert sorted(
        (r.k, r.v) for r in read_current(spark, root).collect()
    ) == [(3, 30)]

    removed = vacuum_versions(root, keep=1)
    assert any(p.endswith(orphan) for p in removed)  # orphan collected
    assert not os.path.exists(os.path.join(root, orphan))
    # current snapshot untouched by vacuum
    assert sorted(
        (r.k, r.v) for r in read_current(spark, root).collect()
    ) == [(3, 30)]
