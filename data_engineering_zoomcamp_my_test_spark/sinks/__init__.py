from .writers import (
    publish_to_object_store,
    save_table,
    upsert_table,
    write_csv,
    write_parquet,
    write_warehouse_table,
)

__all__ = [
    "publish_to_object_store",
    "save_table",
    "upsert_table",
    "write_csv",
    "write_parquet",
    "write_warehouse_table",
]
