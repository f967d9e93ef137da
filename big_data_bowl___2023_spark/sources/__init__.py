from .io import load_table, read_csv_glob, write_parquet
from . import schemas

__all__ = ["load_table", "read_csv_glob", "write_parquet", "schemas"]
