from .readers import load_testdata, read_csv, read_parquet, read_sas
from .writers import write_csv, write_parquet

__all__ = [
    "load_testdata",
    "read_csv",
    "read_parquet",
    "read_sas",
    "write_csv",
    "write_parquet",
]
