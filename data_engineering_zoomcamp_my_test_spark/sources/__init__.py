from .readers import (
    fetch_to_local,
    read_csv,
    read_jdbc,
    read_json,
    read_orc,
    read_parquet,
    read_source,
)
from .tables import TABLE_NAMES, load_table, load_tables, register_tables

__all__ = [
    "fetch_to_local",
    "read_csv",
    "read_jdbc",
    "read_json",
    "read_orc",
    "read_parquet",
    "read_source",
    "TABLE_NAMES",
    "load_table",
    "load_tables",
    "register_tables",
]
