from .catalog import create_database_if_absent, table_exists
from .sql import explain_str, preview, run_sql

__all__ = [
    "create_database_if_absent",
    "table_exists",
    "explain_str",
    "preview",
    "run_sql",
]
