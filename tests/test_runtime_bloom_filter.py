"""Runtime bloom-filter join pruning — the scale path for dim-filtering
fact joins whose dim side exceeds the broadcast threshold.

At 100 TB a selective dim filter (e.g. one order priority) should reach
the fact scan even when the dim is too big to broadcast; Spark's
InjectRuntimeFilter does that by aggregating a bloom filter over the dim
join keys and semi-filtering the fact side before the shuffle. The
session keeps the default thresholds (local testdata is far below the
10 GiB application-side floor, so the rule correctly stays out of the
way); this test scales the thresholds to the local data to prove the
mechanism our plans rely on at cluster scale, and that results are
unchanged by the rewrite.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"

_CONF = {
    # creation side must be SMALLER than this cap (it bounds bloom build
    # memory); application side must be LARGER than the scan floor.
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force the shuffle join
}


@contextmanager
def _scaled_thresholds(spark):
    old = {}
    for k, v in _CONF.items():
        old[k] = spark.conf.get(k)
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def _joined(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    od = spark.read.parquet(f"{SF}/orders.parquet").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum("l_quantity").alias("sum_qty"),
        )
    )


def test_bloom_filter_injected_on_fact_side(spark):
    with _scaled_thresholds(spark):
        plan = _joined(spark)._jdf.queryExecution().executedPlan().toString()
    assert "bloom_filter_agg" in plan, "no bloom filter built on the dim side"
    assert "might_contain" in plan.lower() or "BloomFilterMightContain" in plan or (
        "bloomFilter" in plan
    ), "bloom filter not applied on the fact side"
    # the filter must sit on the FACT (lineitem) scan side, keyed by the
    # fact join key
    assert "l_orderkey" in plan.split("bloom_filter_agg")[0], (
        "expected the might_contain probe on l_orderkey upstream of the build"
    )


def test_bloom_filter_rewrite_preserves_results(spark):
    with _scaled_thresholds(spark):
        with_bloom = _joined(spark).collect()
    baseline = _joined(spark).collect()  # default confs: broadcast join
    assert sorted(map(tuple, with_bloom)) == sorted(map(tuple, baseline))
    assert with_bloom[0]["n"] > 0
