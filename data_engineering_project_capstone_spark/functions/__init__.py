from .scalar import (
    coord_format,
    ieee_round,
    pct_of,
    ratio_of,
    round_cols,
    sas_date,
    split_part_col,
)

__all__ = [
    "coord_format",
    "ieee_round",
    "pct_of",
    "ratio_of",
    "round_cols",
    "sas_date",
    "split_part_col",
]
