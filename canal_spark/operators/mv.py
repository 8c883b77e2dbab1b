"""SQL-checkable face of incremental join-view maintenance (A9).

``mv_join_maintain`` replays the ES-adapter scenario
(ESSyncService.java:115-183 main-path, :532-650 dim-path) over the
shared fixtures: view = orders ⋈ customer; a batch updates some orders
(main change) and reassigns some customers' market segment (dim
change); the query returns the DELTA view rows the maintainer would
MERGE — derived the incremental way (changed main keys ∪ fk-affected
keys, re-join only those), never a full view recompute.

The DuckDB oracle states the same delta declaratively, so the
incremental plan is checked against the definitional answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from canal_spark.operators.common import load


def q_mv_join_maintain(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")

    # current (post-change) states
    main_cur = orders.withColumn(
        "o_totalprice",
        F.col("o_totalprice")
        + F.when(F.col("o_orderkey") % 31 == 0, F.lit(1000.0)).otherwise(F.lit(0.0)),
    )
    dim_cur = cust.withColumn(
        "c_mktsegment",
        F.when(F.col("c_custkey") % 13 == 0, F.lit("REASSIGNED")).otherwise(
            F.col("c_mktsegment")
        ),
    )

    # incremental affected-key derivation (the A9 shapes):
    #   main path: keys of changed orders
    #   dim path:  keys of orders whose FK hits a changed customer
    changed_main = orders.where(F.col("o_orderkey") % 31 == 0).select("o_orderkey")
    changed_dim = cust.where(F.col("c_custkey") % 13 == 0).select("c_custkey")
    via_dim = main_cur.join(
        F.broadcast(changed_dim),
        main_cur["o_custkey"] == changed_dim["c_custkey"],
        "leftsemi",
    ).select("o_orderkey")
    affected = changed_main.unionByName(via_dim).distinct()

    # re-derive ONLY the affected view rows from current state
    live = main_cur.join(F.broadcast(affected), "o_orderkey", "leftsemi")
    delta = live.join(dim_cur, live["o_custkey"] == dim_cur["c_custkey"], "inner")
    return delta.select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.col("o_custkey").cast("long").alias("o_custkey"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
        F.col("c_name").alias("c_name"),
        F.col("c_mktsegment").alias("mktsegment"),
    )


SQL_MV_JOIN_MAINTAIN = """
WITH main_cur AS (
  SELECT o_orderkey, o_custkey,
         o_totalprice + CASE WHEN o_orderkey % 31 = 0 THEN 1000.0 ELSE 0.0 END
           AS o_totalprice
  FROM orders),
dim_cur AS (
  SELECT c_custkey, c_name,
         CASE WHEN c_custkey % 13 = 0 THEN 'REASSIGNED' ELSE c_mktsegment END
           AS c_mktsegment
  FROM customer)
SELECT m.o_orderkey::BIGINT AS o_orderkey,
       m.o_custkey::BIGINT AS o_custkey,
       CAST(round(m.o_totalprice * 100) AS BIGINT) AS price_cents,
       d.c_name AS c_name,
       d.c_mktsegment AS mktsegment
FROM main_cur m JOIN dim_cur d ON m.o_custkey = d.c_custkey
WHERE m.o_orderkey % 31 = 0 OR m.o_custkey % 13 = 0
"""


QUERIES = {"mv_join_maintain": q_mv_join_maintain}
ORACLES = {"mv_join_maintain": SQL_MV_JOIN_MAINTAIN}
