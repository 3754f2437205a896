from .readers import (
    load_testdata,
    read_csv,
    read_json,
    read_orc,
    read_parquet,
    read_sas,
)
from .writers import compact, write_csv, write_json, write_orc, write_parquet

__all__ = [
    "compact",
    "load_testdata",
    "read_csv",
    "read_json",
    "read_orc",
    "read_parquet",
    "read_sas",
    "write_csv",
    "write_json",
    "write_orc",
    "write_parquet",
]
