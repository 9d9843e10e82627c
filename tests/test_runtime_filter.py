"""Runtime bloom-filter join pruning (Catalyst's
InjectRuntimeFilter): when a shuffle join's small side carries a
selective predicate, Spark builds a bloom filter from its join keys at
runtime and applies might_contain on the large side BEFORE the shuffle
— at 100 TB this drops most of the fact-side shuffle for selective
dim filters, the same effect dynamic partition pruning has for
partition columns but on arbitrary keys.

Default thresholds (10 GB application-side scan) are sized for real
clusters and never fire at test scale, so the test lowers them; the
production session inherits the defaults, which is correct — the
filter only pays off when the application side is big.
"""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"

_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force shuffle join
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
}


@pytest.fixture
def bloom_spark(spark):
    saved = {k: spark.conf.get(k, None) for k in _CONFS}
    for k, v in _CONFS.items():
        spark.conf.set(k, v)
    yield spark
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _join(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def test_bloom_filter_injected_into_application_side(bloom_spark):
    q = _join(bloom_spark)
    opt = q._jdf.queryExecution().optimizedPlan().toString()
    assert "bloom_filter_agg" in opt
    assert "might_contain" in opt
    # the filter must land on the lineitem (application) side scan branch
    ep = q._jdf.queryExecution().executedPlan().toString()
    assert "might_contain" in ep


def test_bloom_filter_is_semantically_transparent(bloom_spark):
    with_filter = {tuple(r) for r in _join(bloom_spark).collect()}
    bloom_spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.enabled", "false"
    )
    without = {tuple(r) for r in _join(bloom_spark).collect()}
    assert with_filter == without and len(with_filter) > 0
