"""Sort- and aggregate-implementation invariance: results must be
identical when Spark's radix sort and ObjectHashAggregate operators are
swapped for their fallback implementations — the sixth plan-level
invariance axis (round 11).

Two independent session flips, each a disjoint physical implementation
of an operator the catalog leans on everywhere:

- ``spark.sql.sort.enableRadixSort=false`` — every SortExec (window
  ordering, sort-merge join sides, ORDER BY, SortAggregate input) runs
  TimSort over the full record instead of MSD radix over the binary
  prefix. The two sorts may emit DIFFERENT permutations of key-tied
  rows; any entry whose answer depends on the tie order (an unpinned
  window tiebreak, a first()-after-sort) would diverge here. This is
  the sort-algorithm twin of the partition-count net's "first row per
  partition" probe — the repo's total-ordering discipline (every window
  ORDER BY carries a unique tiebreak) is exactly what this axis gates.

- ``spark.sql.execution.useObjectHashAggregateExec=false`` — every
  TypedImperativeAggregate (collect_list/collect_set, percentile,
  count-min/HLL sketches) falls back from hash-based to sort-based
  aggregation: group results are built in sorted-key order instead of
  hash-table order, a different per-group accumulation ORDER for the
  order-sensitive buffer types. Catalog entries sort collected arrays
  or reduce them commutatively; this axis machine-checks that claim.

Both fallbacks are routine in production (radix sort is unusable for
some key shapes; ObjectHashAggregate falls back to sort-based mid-task
past ``objectHashAggregate.sortBased.fallbackThreshold``), so an answer
that differs under either flip is a wrong answer on some cluster.
Entry list shared with the partition-invariance net, plus the
collect/percentile/sketch-heavy entries ObjectHashAggregate serves.
"""

from __future__ import annotations

import pytest

from data_engineering_project_capstone_spark.plans.catalog import CATALOG

from test_partition_invariance import ENTRIES, SF

# ObjectHashAggregate serves TypedImperativeAggregate: collect_list/set,
# percentile family, and the sketch entries — add the heaviest users not
# already in the shared shuffle-sensitive list.
OBJ_AGG_EXTRA = [
    "agg_percentiles",
    "array_explode_agg",
    "doc_length_percentiles",
    "events_json_struct",
    "pack_sequences",
    "sketch_hll_union",
    "chunk_documents",
]
NAMES = sorted(set(ENTRIES) | set(OBJ_AGG_EXTRA))


@pytest.fixture(scope="module")
def spark_fallback(spark):
    s = spark.newSession()
    s.conf.set("spark.sql.sort.enableRadixSort", "false")
    s.conf.set("spark.sql.execution.useObjectHashAggregateExec", "false")
    assert s.conf.get("spark.sql.sort.enableRadixSort") == "false"
    # the shared fixture session must be untouched
    assert spark.conf.get("spark.sql.sort.enableRadixSort") == "true"
    return s


def _rows(session, name):
    return sorted(
        (tuple(r) for r in CATALOG[name].spark_fn(session, SF).collect()),
        key=repr,
    )


@pytest.mark.parametrize("name", NAMES)
def test_result_invariant_under_fallback_operators(
    spark, spark_fallback, name
):
    primary = _rows(spark, name)
    fallback = _rows(spark_fallback, name)
    assert primary == fallback, (
        f"{name}: result depends on radix sort / ObjectHashAggregate"
    )
