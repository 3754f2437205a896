from .scalar import (
    coord_format,
    pct_of,
    round_cols,
    sas_date,
    split_part_col,
)

__all__ = ["coord_format", "pct_of", "round_cols", "sas_date", "split_part_col"]
