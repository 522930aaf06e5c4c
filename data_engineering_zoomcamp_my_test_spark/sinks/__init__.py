from .writers import (
    cdc_snapshot,
    compact_parquet,
    publish_to_object_store,
    save_table,
    scd2_apply,
    scd2_init,
    upsert_table,
    write_csv,
    write_jdbc,
    write_orc,
    write_parquet,
    write_warehouse_table,
)

__all__ = [
    "cdc_snapshot",
    "compact_parquet",
    "publish_to_object_store",
    "save_table",
    "scd2_apply",
    "scd2_init",
    "upsert_table",
    "write_csv",
    "write_jdbc",
    "write_orc",
    "write_parquet",
    "write_warehouse_table",
]
