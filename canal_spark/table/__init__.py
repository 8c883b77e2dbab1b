from canal_spark.table.format import (
    DataFile,
    Snapshot,
    Table,
    create_table,
    load_table,
)

__all__ = ["DataFile", "Snapshot", "Table", "create_table", "load_table"]
