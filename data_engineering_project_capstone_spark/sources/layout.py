"""Data-layout optimization for scan pruning at scale.

Parquet scans prune row groups (and whole files) with column min/max
statistics; pruning only bites when the data is PHYSICALLY clustered on
the filtered columns. Sorting clusters one column perfectly and leaves
every other column's ranges wide; Z-ordering (bit-interleaving the
binary representations of several columns) trades a little locality on
each column for bounded ranges on ALL of them — the standard layout for
multi-dimensional filter workloads (Delta OPTIMIZE ZORDER BY, Iceberg
sort orders).

Everything here is expression-level (shiftleft/shiftright/bitwise-and
inside whole-stage codegen) plus one ``repartitionByRange`` — no UDFs,
no collect. The write path is ordinary ``DataFrameWriter`` so any
downstream engine (including DuckDB in the tests) sees plain parquet
with tight per-file statistics.

Scale: the range partitioner samples the z-key to cut balanced,
CONTIGUOUS z-ranges — each output task owns a z-curve segment, so each
file covers a small hyper-rectangle of the key space. At 100 TB the
same plan holds: sampling is a driver-side sketch, the single shuffle
is the unavoidable re-layout cost, and every later selective scan pays
for only the files whose boxes intersect its predicate.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# bits taken from each dimension; 2 dims x 21 bits interleave into a
# 42-bit key that fits a long with headroom.
_ZBITS = 21


def _rank_scaled(df: DataFrame, col: str, bits: int = _ZBITS) -> Column:
    """Scale a numeric column into [0, 2**bits) via min/max normalization.

    Min/max come from a window over a broadcast 1-row aggregate computed
    by the caller (see zorder_by) — this helper only applies the affine
    map. Ties and skew are acceptable: z-order needs monotonicity, not
    uniformity."""
    lo, hi = F.col(f"_lo_{col}"), F.col(f"_hi_{col}")
    span = F.when(hi > lo, hi - lo).otherwise(F.lit(1))
    scaled = ((F.col(col) - lo) * ((1 << bits) - 1)) / span
    return F.floor(scaled).cast("long")


def zorder_key(dim_cols: list[str], bits: int = _ZBITS) -> Column:
    """Interleave the low ``bits`` bits of the given pre-scaled long
    columns into one z-curve key (column expression, codegen-friendly).

    Bit i of dimension d lands at position i * n_dims + d, so
    lexicographic order on the key walks the Z-curve."""
    n = len(dim_cols)
    parts = [
        F.shiftleft(
            F.shiftright(F.col(c), i).bitwiseAND(F.lit(1)), i * n + d
        )
        for d, c in enumerate(dim_cols)
        for i in range(bits)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), parts).alias("_zkey")


def zorder_by(
    df: DataFrame, cols: list[str], num_files: int, bits: int = _ZBITS
) -> DataFrame:
    """Return ``df`` re-laid-out along the Z-curve of ``cols``:
    range-partitioned into ``num_files`` contiguous z-segments and
    sorted by the key within each partition, with the helper columns
    dropped. Write the result with plain ``write.parquet`` to get one
    tight-statistics file per partition."""
    aggs = []
    for c in cols:
        aggs += [
            F.min(c).cast("double").alias(f"_lo_{c}"),
            F.max(c).cast("double").alias(f"_hi_{c}"),
        ]
    bounds = df.agg(*aggs)
    scaled = df.crossJoin(F.broadcast(bounds)).select(
        "*", *[_rank_scaled(df, c, bits).alias(f"_z_{c}") for c in cols]
    )
    keyed = scaled.withColumn("_zkey", zorder_key([f"_z_{c}" for c in cols], bits))
    return (
        keyed.repartitionByRange(num_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey", *[f"_z_{c}" for c in cols],
              *[f"_lo_{c}" for c in cols], *[f"_hi_{c}" for c in cols])
    )


def linear_order_by(df: DataFrame, cols: list[str], num_files: int) -> DataFrame:
    """Plain lexicographic re-layout (the baseline z-order is compared
    against): perfect clustering on cols[0], none on the rest."""
    return df.repartitionByRange(num_files, *cols).sortWithinPartitions(*cols)


def file_skip_fraction(
    path: str, preds: dict[str, tuple[float, float]]
) -> tuple[int, int]:
    """(files_skippable, files_total) for the conjunction of ``col
    BETWEEN lo AND hi`` predicates against the parquet files under
    ``path``, judged purely from footer row-group statistics — the same
    information any engine's scan pruning uses. A file is skippable if
    ANY predicate column's stats show no overlap in every row group.
    Driver-side metadata read; no data pages touched."""
    import glob
    import os

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    total = skip = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        ranges: dict[str, list[float]] = {}
        for rg in range(md.num_row_groups):
            grp = md.row_group(rg)
            for ci in range(grp.num_columns):
                cc = grp.column(ci)
                if cc.path_in_schema in preds and cc.statistics is not None:
                    st = cc.statistics
                    r = ranges.setdefault(cc.path_in_schema, [st.min, st.max])
                    r[0] = min(r[0], st.min)
                    r[1] = max(r[1], st.max)
        total += 1
        if any(
            col in ranges and (ranges[col][0] > hi or ranges[col][1] < lo)
            for col, (lo, hi) in preds.items()
        ):
            skip += 1
    return skip, total
