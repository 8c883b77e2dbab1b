"""canal_spark — a PySpark-native lakehouse table-maintenance engine.

A from-scratch rebuild of the *capability set* of Alibaba Canal
(reference: /root/reference, a MySQL-binlog CDC middleware) expressed
idiomatically on Spark: ordered change-data-capture apply (MERGE INTO
upsert/delete with last-wins dedupe and skew-aware joins), small-file
compaction by greedy bin-packing, Z-order / Hilbert clustering,
manifest rewrite + snapshot expiry with time travel, and per-partition
checkpointed, idempotently-resumable maintenance jobs.

The storage layer is a self-contained "mini-lakehouse" format
(Parquet data files + JSON metadata/manifests with atomic commits and
snapshot isolation) standing in for Apache Iceberg, since the sandbox
has no Iceberg runtime jar.  The public API mirrors the Iceberg
operations named in BASELINE.json.north_rule.

Nothing here is a port: the reference is row-at-a-time Java
(ring buffers, disruptors, netty); this engine is declarative
DataFrame plans executed by Catalyst/Tungsten with vectorized
pandas/Arrow UDFs for the few kernels Spark lacks (bit-interleaved
Z-order keys, Hilbert indices).
"""

from canal_spark.session import get_spark
from canal_spark.table.format import Table, create_table, load_table


def check_table(spark, table, **kw):
    """Manifest-vs-physical consistency check (see canal_spark.doctor)."""
    from canal_spark.doctor import check_table as _ct

    return _ct(spark, table, **kw)


__all__ = ["get_spark", "Table", "create_table", "load_table", "check_table"]
__version__ = "0.1.0"
