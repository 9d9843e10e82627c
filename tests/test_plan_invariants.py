"""Machine-checked plan anti-pattern gate over the bench headline set.

Two structural bans, asserted on the optimizer's physical plan (built,
never executed):

- ``CartesianProduct``: an unconditioned all-pairs join — the classic
  accidental scale-killer. (TPC-H Q22's 1-row scalar cross join plans
  as BroadcastNestedLoopJoin, which is the intended shape and distinct
  from CartesianProduct.)
- ``BatchEvalPython``: a row-at-a-time Python UDF in the plan. The
  engine's contract is that Python only ever appears Arrow-batched
  (``ArrowEvalPython`` / mapInPandas), which is 10-100x faster and the
  only acceptable Python at 100 TB.

Bench queries are pure batch builders (no side effects at construction),
so building every plan is cheap; registry entries that execute during
construction (streaming witnesses, codebook training) are exercised by
their own tests instead.
"""

import pytest

from market_pulse_data_pipeline_spark.queries import all_queries

SF = "/root/testdata/sf0.001"

_BENCH = [n for n, q in all_queries().items() if q.bench]


@pytest.mark.parametrize("name", _BENCH)
def test_no_plan_antipatterns(spark, name):
    qd = all_queries()[name]
    df = qd.spark(spark, SF)
    plan = df._jdf.queryExecution().sparkPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"


def test_bench_set_nonempty():
    assert len(_BENCH) >= 20
