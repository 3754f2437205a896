"""Codegen-off invariance: results must be identical with whole-stage
codegen disabled and expression compilation forced to the interpreted
path — the fourth plan-level invariance axis (round 11), alongside
partition count (test_partition_invariance), physical layout
(test_schema_shape), and AQE (test_aqe_invariance).

Whole-stage codegen fuses operators into one generated Java method;
with it off, Spark runs the Volcano iterator path instead, and with
``spark.sql.codegen.factoryMode=NO_CODEGEN`` even single expressions
evaluate through the interpreted ``InterpretedUnsafeProjection`` /
``InterpretedPredicate`` classes rather than Janino-compiled ones.
That is a genuinely disjoint implementation of every projection,
predicate, hash, and aggregate update in the plan — the same class of
cross-implementation check as the DuckDB oracle, but inside Spark
itself. An entry whose answer depends on codegen being on (fold order
through the generated loop, codegen-only constant folding, a
generated-code arithmetic quirk) would be a latent wrong-answer bug on
any cluster that trips the codegen fallback (method-size limits,
``spark.sql.codegen.fallback`` paths — both routine at 100 TB plan
complexity).

Spark scopes SQL confs per session: ``spark.newSession()`` shares the
SparkContext/JVM but takes its own conf, so flipping codegen off there
never touches the shared fixture session other tests use.

Entry list shared with the partition-invariance net: the shuffle- and
fold-order-sensitive classes are exactly where a codegen-vs-interpreted
divergence would surface (hash partitioning of the same keys must hash
identically through both projection paths for the answer to agree).
"""

from __future__ import annotations

import pytest

from data_engineering_project_capstone_spark.plans.catalog import CATALOG

from test_partition_invariance import ENTRIES, SF


@pytest.fixture(scope="module")
def spark_nocodegen(spark):
    s = spark.newSession()
    s.conf.set("spark.sql.codegen.wholeStage", "false")
    s.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    assert s.conf.get("spark.sql.codegen.wholeStage") == "false"
    # the shared fixture session must be untouched
    assert spark.conf.get("spark.sql.codegen.wholeStage") == "true"
    return s


def _rows(session, name):
    # key=repr (same idiom as the ansi/allflips nets): raw-tuple sorting
    # raises TypeError on mixed NULL/non-NULL columns (None < int).
    return sorted(
        (tuple(r) for r in CATALOG[name].spark_fn(session, SF).collect()),
        key=repr,
    )


@pytest.mark.parametrize("name", ENTRIES)
def test_result_invariant_without_codegen(spark, spark_nocodegen, name):
    with_codegen = _rows(spark, name)
    interpreted = _rows(spark_nocodegen, name)
    assert with_codegen == interpreted, (
        f"{name}: result depends on whole-stage codegen"
    )
