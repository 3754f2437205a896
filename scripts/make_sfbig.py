"""Build the r19 second-SF scaling corpus (~sf0.4) in /tmp/sf_big.

VERDICT r18 ask #8: the c8/c32 core ratios proved sf0.1 cannot see
parallelism (every headline entry is AQE/scheduler-bound there), so the
round needs a larger-SF spot signal. The driver ships no SF above 0.1
and /root/testdata is read-only, so this derives one: K=4 shifted
copies of every sf0.1 table, integer keys offset by copy_index x span
so referential integrity (and therefore join fan-in/selectivity) is
preserved; doc/event/vector payloads repeat verbatim, which quadruples
corpus-global duplicate counts — fine for a TIMING signal, never for
correctness (no oracle runs here). Output is written with a HEALTHY
layout (multiple files/row groups per table) because the point is to
measure compute/shuffle scaling, not the single-row-group degeneracy
spread_scan exists to absorb. MEASUREMENT ARTIFACT ONLY: bench.py and
the oracle never read this directory.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_engineering_project_capstone_spark.session import get_spark

K = 4
SRC = "/root/testdata/sf0.1"
DST = os.environ.get("SFBIG_DIR", "/tmp/sf_big")

# per-table integer key columns to shift (span = global max+1 of the
# base table, so copies never collide and cross-table references stay
# aligned because both sides of every FK shift by the same span)
SHIFT = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "documents": ["doc_id"],
    "events": ["event_id", "user_id"],
    "embeddings": ["vec_id"],
    "nation": [],
    "region": [],
}
# one span per KEY DOMAIN (not per column): l_orderkey must shift by
# the same amount as o_orderkey etc.
DOMAIN = {
    "c_custkey": "custkey", "o_custkey": "custkey",
    "o_orderkey": "orderkey", "l_orderkey": "orderkey",
    "p_partkey": "partkey", "l_partkey": "partkey",
    "s_suppkey": "suppkey", "l_suppkey": "suppkey",
    "doc_id": "docid", "event_id": "eventid", "user_id": "userid",
    "vec_id": "vecid",
}
BASE = {
    "custkey": ("customer", "c_custkey"),
    "orderkey": ("orders", "o_orderkey"),
    "partkey": ("part", "p_partkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "docid": ("documents", "doc_id"),
    "eventid": ("events", "event_id"),
    "userid": ("events", "user_id"),
    "vecid": ("embeddings", "vec_id"),
}


def main() -> None:
    spark = get_spark(app_name="make_sfbig")
    spark.sparkContext.setLogLevel("ERROR")
    spans = {}
    for dom, (tbl, col) in BASE.items():
        m = (
            spark.read.parquet(f"{SRC}/{tbl}.parquet")
            .agg(F.max(col))
            .collect()[0][0]
        )
        spans[dom] = int(m) + 1
    os.makedirs(DST, exist_ok=True)
    for tbl, keys in SHIFT.items():
        df = spark.read.parquet(f"{SRC}/{tbl}.parquet")
        if not keys:  # bounded dims stay single-copy
            df.write.mode("overwrite").parquet(f"{DST}/{tbl}.parquet")
            continue
        copies = []
        for i in range(K):
            c = df
            for kcol in keys:
                span = spans[DOMAIN[kcol]]
                # preserve NULL keys as NULL (offset of NULL is NULL
                # anyway); cast back to the original type
                dt = dict(df.dtypes)[kcol]
                c = c.withColumn(
                    kcol, (F.col(kcol) + F.lit(i * span)).cast(dt)
                )
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionAll(c)
        out.repartition(8).write.mode("overwrite").parquet(
            f"{DST}/{tbl}.parquet"
        )
        print(tbl, "rows", spark.read.parquet(f"{DST}/{tbl}.parquet").count())
    spark.stop()


if __name__ == "__main__":
    main()
