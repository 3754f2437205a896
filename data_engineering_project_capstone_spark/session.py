"""SparkSession factory.

One place to encode the engine's execution posture:

- AQE on (runtime shuffle-partition coalescing + skew-join splitting) so the
  same plans survive a 100x scale-up without retuning.
- Arrow on, for the few pandas-UDF escape hatches (vectorized transfer).
- Session timezone pinned to UTC so timestamp semantics match the DuckDB
  oracle (DuckDB timestamps are UTC-naive).
- Shuffle partitions default to ~cores locally; on a real cluster AQE
  coalesces from a deliberately-high initial number instead.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "*")

# JDK-17 G1 + Arrow's JNI critical sections: a humongous allocation
# racing the GCLocker fails after only 2 retries (the JDK default) and
# surfaces as a spurious OOM that kills the driver JVM mid-broadcast
# ("Retried waiting for GCLocker too often" — observed under heavy
# concurrent plan construction on a loaded host). Raising the retry
# budget is the canonical mitigation; it costs nothing when memory is
# genuinely exhausted.
_GCLOCKER_OPTS = (
    "-XX:+UnlockDiagnosticVMOptions -XX:GCLockerRetryAllocationCount=64"
)


def _merge_driver_java_opts(caller_opts: str | None) -> str:
    """Caller-provided spark.driver.extraJavaOptions merged with (not
    clobbered by) the GCLocker mitigation. The caller's flags come
    first; the mitigation is appended unless the caller already sets a
    GCLockerRetryAllocationCount of their own (that IS the opt-out:
    set e.g. ``-XX:GCLockerRetryAllocationCount=2`` to restore the JDK
    default). GCLockerRetryAllocationCount is a *diagnostic* VM option
    — a JVM launched with it but without -XX:+UnlockDiagnosticVMOptions
    refuses to start — so when the caller sets their own count we still
    prepend the unlock flag if absent (it is idempotent and has no
    other effect)."""
    if not caller_opts:
        return _GCLOCKER_OPTS
    if "GCLockerRetryAllocationCount" in caller_opts:
        if "-XX:+UnlockDiagnosticVMOptions" in caller_opts:
            return caller_opts
        return f"-XX:+UnlockDiagnosticVMOptions {caller_opts}"
    return f"{caller_opts} {_GCLOCKER_OPTS}"


def get_spark(
    app_name: str = "data_engineering_project_capstone_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``).
    On a cluster, pass ``master=None`` with ``spark.master`` preset in the
    environment and this factory only applies conf.
    """
    if master is None:
        master = f"local[{DEFAULT_CPUS}]"
    if shuffle_partitions is None:
        cpus = os.cpu_count() or 8
        shuffle_partitions = min(64, max(8, cpus))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # driver testdata writes events.ts as TIMESTAMP(NANOS), which the
        # Spark parquet reader rejects; read as long and convert explicitly
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # 64 MiB scan splits: keeps task counts sane locally and at scale
        # AQE re-coalesces post-shuffle anyway.
        .config("spark.sql.files.maxPartitionBytes", str(64 * 1024 * 1024))
        # InferFiltersFromGenerate infers size(e)>0 below explode(e); when
        # CollapseProject has folded an expensive expression into the
        # Generate input (shingle/gram pipelines), that filter re-derives
        # the WHOLE expression per row — with tokenizers inside transform
        # lambdas that is quadratic per doc (measured: minhash cold
        # 11.5s -> 1.8s at sf0.1 with the rule off). The rows it would
        # skip (empty arrays) are negligible in every workload here.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # explicit (it is the Spark default): the evaluation-count guard
        # tests (tests/test_clusters.py, tests/test_graph.py) count UDF
        # executions via accumulators, and a speculative duplicate task
        # re-adds its partition's count.
        .config("spark.speculation", "false")
        # reliable checkpoints (operators/lineage.py, active when a
        # checkpoint dir is configured) otherwise accumulate files for
        # the life of the session — iterative entries cut per loop, so
        # a long-lived session leaks the dir without this.
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
    )
    extra_conf = dict(extra_conf or {})
    # Like every JVM option here, this only takes effect when this call
    # actually starts the JVM — getOrCreate() reusing a live session
    # keeps that session's flags.
    builder = builder.config(
        "spark.driver.extraJavaOptions",
        _merge_driver_java_opts(
            extra_conf.pop("spark.driver.extraJavaOptions", None)
        ),
    )
    for k, v in extra_conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
