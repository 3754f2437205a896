"""Scalar column helpers — the engine's whole scalar-function surface.

Every helper is built from `pyspark.sql.functions` primitives (JVM-side,
whole-stage-codegen friendly). The reference needed one Python UDF and two
pandas row-wise lambdas for these; here none of them leave the JVM.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SAS_EPOCH = "1960-01-01"


def sas_date(days: Column | str) -> Column:
    """SAS numeric date (days since 1960-01-01) → DateType, null-preserving.

    Replaces the reference's only Python UDF (``dataprep.py:210-212``) with a
    built-in: ``date_add`` stays inside codegen, so the conversion runs at
    columnar speed instead of round-tripping every row through Python.
    """
    c = F.col(days) if isinstance(days, str) else days
    return F.date_add(F.lit(SAS_EPOCH).cast("date"), c.cast("int"))


def coord_format(coord: Column | str, pos: str, neg: str, scale: int = 2) -> Column:
    """Signed coordinate → compass string, e.g. ``-84.43`` → ``"84.43W"``.

    Reference does this with a pandas row-wise ``apply(lambda ...)``
    (``dataprep.py:144-145``); here it is a single ``when/concat`` expression.
    ``pos``/``neg`` are the hemisphere suffixes (``"N"``/``"S"``, ``"E"``/``"W"``).
    """
    c = F.col(coord) if isinstance(coord, str) else coord
    r = F.round(F.abs(c), scale)
    return F.when(c < 0, F.concat(r.cast("string"), F.lit(neg))).otherwise(
        F.concat(r.cast("string"), F.lit(pos))
    )


def pct_of(count: Column | str, total: Column | str, scale: int = 2) -> Column:
    """``round(100 * count / total, scale)`` (reference README.md:200).

    Null on zero denominator (``try_divide``): Spark 4's ANSI mode would
    otherwise FAIL THE JOB on one zero-population row — the reference's
    pandas division yields inf instead; null is the warehouse-sane choice.
    """
    c = F.col(count) if isinstance(count, str) else count
    t = F.col(total) if isinstance(total, str) else total
    return F.round(F.try_divide(F.lit(100) * c, t), scale)


def ratio_of(count: Column | str, total: Column | str, scale: int = 2) -> Column:
    """``round(count / total, scale)`` (reference dataprep.py:32,37,57-66).
    Null on zero denominator — see :func:`pct_of`."""
    c = F.col(count) if isinstance(count, str) else count
    t = F.col(total) if isinstance(total, str) else total
    return F.round(F.try_divide(c, t), scale)


def round_cols(df: DataFrame, cols: Iterable[str], scale: int = 2) -> DataFrame:
    """Round several columns in place (reference dataprep.py:57-66,141,185-188)."""
    return df.withColumns({c: F.round(F.col(c), scale) for c in cols})


def ieee_round(col: Column | str, scale: int = 2) -> Column:
    """Tie-deterministic cross-engine rounding: ``floor(x*10^s + 0.5)/10^s``.

    Spark's ``round()`` re-parses the double's shortest decimal string and
    rounds HALF_UP; DuckDB scales and rounds the binary value — at decimal
    ties (x.xx5, common in 2dp×2dp products) they disagree. This formula is
    pure IEEE multiply/add/floor/divide, so for bit-identical inputs every
    engine produces bit-identical output. Use for row-level money rounding
    wherever results are compared across engines.

    Totality guard (r11, found by the NaN/inf events fuzz): Spark's
    ``floor(double)`` returns LONG and SATURATES silently — NaN→0,
    ±inf→±2^63, any |y|≥2^63→2^63−1 — where DuckDB's floor stays double
    (NaN→NaN, inf→inf, big→identity). For |y| ≥ 2^63 a double has no
    fractional part (integers only from 2^52 up), so floor is the
    IDENTITY there and the guard branch returns ``y/m`` — the identical
    IEEE op sequence DuckDB executes, bit-for-bit, over the entire
    double domain including NaN and ±inf. Below the guard Spark's
    long-floor is exact. The DuckDB twin (``sql_ieee_round``) needs no
    guard. One extra codegen branch per rounding; no measurable cost.
    """
    c = F.col(col) if isinstance(col, str) else col
    m = F.lit(float(10**scale))
    y = c * m + F.lit(0.5)
    return F.when(
        F.isnan(c) | (F.abs(y) >= F.lit(float(2**63))), y / m
    ).otherwise(F.floor(y) / m)


def split_part_col(col: Column | str, sep: str, idx: int) -> Column:
    """One piece of a delimiter-split string (reference dataprep.py:114,122)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, sep).getItem(idx)


def md5_bucket(col: Column | str, salt: Column | str, mod: int) -> Column:
    """First 60 bits of md5(col ':' salt) mod ``mod`` — the cross-engine
    deterministic hash-bucket idiom (DuckDB twin:
    ``CAST(concat('0x', substring(md5(..), 1, 15)) AS BIGINT) % mod``).
    60 bits < 2^63, so the value is always non-negative. Used by the
    content-addressed split, the count-min sketch, and the streaming
    sketch maintainer, which must all bucket identically."""
    c = F.col(col) if isinstance(col, str) else col
    s = F.col(salt) if isinstance(salt, str) else salt
    return (
        F.conv(F.substring(F.md5(F.concat_ws(":", c, s)), 1, 15), 16, 10)
        .cast("long")
        % mod
    )
