"""_CC_MEMO lifecycle: the MinHash pairs/components memo must be scoped
to the owning SparkSession (no cross-session plan reuse) and must not
grow without bound in a long-lived process (the memo is an attribute on
the session, so it is garbage-collected with it)."""

from __future__ import annotations

import gc
import weakref

from data_engineering_project_capstone_spark.plans import catalog


def _drop_memo(session) -> None:
    if hasattr(session, catalog._CC_MEMO_ATTR):
        delattr(session, catalog._CC_MEMO_ATTR)


def test_memo_hits_within_session(spark, sf_dir):
    _drop_memo(spark)
    a = catalog._minhash_components(spark, sf_dir)
    b = catalog._minhash_components(spark, sf_dir)
    # identical objects, not just equal plans — the memo actually fired
    assert a[0] is b[0] and a[1] is b[1]


def test_memo_isolated_per_session_and_dies_with_it(spark, sf_dir):
    _drop_memo(spark)
    first = catalog._minhash_components(spark, sf_dir)
    sibling = spark.newSession()
    second = catalog._minhash_components(sibling, sf_dir)
    # a different session never receives another session's cached plans
    assert first[0] is not second[0] and first[1] is not second[1]
    assert getattr(sibling, catalog._CC_MEMO_ATTR) is not getattr(
        spark, catalog._CC_MEMO_ATTR
    )
    # the cache dies with its session: once the sibling is dropped, its
    # memo dict (a session→memo→DataFrame→session cycle) is reaped by GC.
    # pyspark itself pins the most-recently-created session via the global
    # RDD.toDF monkeypatch closure, so create one more throwaway session
    # to displace that pin before asserting collection.
    memo_ref = weakref.ref(getattr(sibling, catalog._CC_MEMO_ATTR))
    del sibling, second
    displace = spark.newSession()
    gc.collect()
    assert memo_ref() is None
    del displace
    # and the surviving entry still serves the original session
    again = catalog._minhash_components(spark, sf_dir)
    assert again[0] is first[0]
