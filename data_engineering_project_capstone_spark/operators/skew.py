"""Skew-handling join: salting for hot keys.

AQE's skew-join splitting handles most skew at runtime; salting is the
explicit fallback for the pathological case AQE can't fix — a single key so
hot that even a split partition won't fit (the classic 'null key' or
'megacity' problem at 100 TB).

``salted_join``: the big side gets a random-free deterministic salt
(hash of a row-unique column mod n_salts); the small side is exploded
n_salts× so every (key, salt) pair finds its match. Equivalent rows out,
shuffle fan-out n_salts× wider on the hot key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    salt_src: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with the big side salted.

    ``salt_src``: a big-side column whose hash spreads rows across salts
    (defaults to the whole row via all columns — deterministic, no rand()).

    Only ``inner`` and ``left`` joins are supported: the small side is
    replicated n_salts×, so right/full-outer would emit each unmatched
    small-side row once per salt replica. Use an unsalted join (or swap the
    sides) for those modes.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'/'left', got {how!r}: the "
            "exploded small side would duplicate unmatched rows under "
            "right/full outer modes"
        )
    salt_cols = [F.col(salt_src)] if salt_src else [F.col(c) for c in big.columns]
    big_s = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*salt_cols), F.lit(n_salts)).cast("int")
    )
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = big_s.join(small_s, [key, "_salt"], how)
    return out.drop("_salt")
