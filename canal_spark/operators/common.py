"""Shared helpers for cross-engine (Spark vs DuckDB) deterministic ops.

The one nontrivial trick: a **deterministic 60-bit integer hash** both
engines compute identically — ``md5`` of the UTF-8 string, first 15 hex
digits, parsed base-16.  Verified: Spark
``conv(substr(md5(x),1,15),16,10)`` == DuckDB
``('0x'||substr(md5(x),1,15))::BIGINT`` (e.g. 'hello' ->
419982666956583591 in both).  This powers minhash/simhash/fingerprint
oracles without relying on engine-specific hash functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def md5int(col) -> "F.Column":
    """60-bit deterministic int from a string column (JVM-side)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def duck_md5int(expr: str) -> str:
    """DuckDB rendering of the same 60-bit hash."""
    return f"CAST(('0x'||substr(md5({expr}),1,15)) AS BIGINT)"
