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


def q_mv_two_dim_maintain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-dimension star view (SqlParser.java:40-66 N-table join form):
    view = lineitem ⋈ part ⋈ supplier.  A batch changes some lineitems
    (main path), rebrands some parts (dim-1 path) and renames some
    suppliers (dim-2 path); the delta is derived by the REAL
    ``derive_star_view_changelog`` machinery — affected keys from all
    three paths, re-join only those — never a full view recompute."""
    from canal_spark.mv import DimJoin, StarViewConfig, derive_star_view_changelog

    raw = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    supp = load(spark, sf_dir, "supplier")

    # the fixture's (l_orderkey, l_linenumber) is NOT unique — collapse
    # to one row per view key with order-independent aggregates (min) so
    # the view pk actually is a pk; mirrored in the oracle
    li = raw.groupBy("l_orderkey", "l_linenumber").agg(
        F.min("l_partkey").alias("l_partkey"),
        F.min("l_suppkey").alias("l_suppkey"),
        F.min("l_extendedprice").alias("l_extendedprice"),
    )
    main_cur = li.withColumn(
        "l_extendedprice",
        F.col("l_extendedprice")
        + F.when(F.col("l_orderkey") % 31 == 0, F.lit(1000.0)).otherwise(F.lit(0.0)),
    )
    d1_cur = part.withColumn(
        "p_brand",
        F.when(F.col("p_partkey") % 17 == 0, F.lit("REBRANDED")).otherwise(
            F.col("p_brand")
        ),
    )
    d2_cur = supp.withColumn(
        "s_name",
        F.when(F.col("s_suppkey") % 13 == 0, F.lit("RENAMED")).otherwise(
            F.col("s_name")
        ),
    )
    cfg = StarViewConfig(
        main_key=["l_orderkey", "l_linenumber"],
        main_cols=[
            "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
            "l_extendedprice",
        ],
        dims=[
            DimJoin("l_partkey", "p_partkey", ["p_brand"]),
            DimJoin("l_suppkey", "s_suppkey", ["s_name"]),
        ],
    )
    cl = derive_star_view_changelog(
        cfg,
        main_cur,
        [d1_cur, d2_cur],
        ordinal=1,
        main_changes=li.where(F.col("l_orderkey") % 31 == 0).select(
            "l_orderkey", "l_linenumber"
        ),
        dim_changes=[
            part.where(F.col("p_partkey") % 17 == 0).select("p_partkey"),
            supp.where(F.col("s_suppkey") % 13 == 0).select("s_suppkey"),
        ],
    )
    return cl.where(F.col("op") == "U").select(
        F.col("l_orderkey").cast("long").alias("l_orderkey"),
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("price_cents"),
        F.col("p_brand").alias("p_brand"),
        F.col("s_name").alias("s_name"),
    )


SQL_MV_TWO_DIM = """
WITH li AS (
  SELECT l_orderkey, l_linenumber, min(l_partkey) AS l_partkey,
         min(l_suppkey) AS l_suppkey, min(l_extendedprice) AS l_extendedprice
  FROM lineitem GROUP BY l_orderkey, l_linenumber),
main_cur AS (
  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
         l_extendedprice + CASE WHEN l_orderkey % 31 = 0 THEN 1000.0 ELSE 0.0 END
           AS l_extendedprice
  FROM li),
d1 AS (SELECT p_partkey,
              CASE WHEN p_partkey % 17 = 0 THEN 'REBRANDED' ELSE p_brand END AS p_brand
       FROM part),
d2 AS (SELECT s_suppkey,
              CASE WHEN s_suppkey % 13 = 0 THEN 'RENAMED' ELSE s_name END AS s_name
       FROM supplier)
SELECT m.l_orderkey::BIGINT AS l_orderkey,
       m.l_linenumber::BIGINT AS l_linenumber,
       CAST(round(m.l_extendedprice * 100) AS BIGINT) AS price_cents,
       d1.p_brand AS p_brand,
       d2.s_name AS s_name
FROM main_cur m
LEFT JOIN d1 ON m.l_partkey = d1.p_partkey
LEFT JOIN d2 ON m.l_suppkey = d2.s_suppkey
WHERE m.l_orderkey % 31 = 0 OR m.l_partkey % 17 = 0 OR m.l_suppkey % 13 = 0
"""


def q_mv_child_agg_maintain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-to-many subquery view (LabelSyncJoinSubTest shape,
    ESSyncService.java:579-650 subquery re-run path): view = orders +
    per-order lineitem aggregates (n_items, sum_qty).  A batch changes
    some orders (main path) and some lineitems (child path — the
    affected main keys ride on the child rows); the delta re-runs the
    child subquery for ONLY the affected orders."""
    from canal_spark.mv import ChildAgg, StarViewConfig, derive_star_view_changelog

    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")

    main_cur = orders.withColumn(
        "o_totalprice",
        F.col("o_totalprice")
        + F.when(F.col("o_orderkey") % 31 == 0, F.lit(1000.0)).otherwise(F.lit(0.0)),
    )
    child_cur = li.withColumn(
        "l_quantity",
        F.col("l_quantity")
        + F.when(F.col("l_orderkey") % 19 == 0, F.lit(5.0)).otherwise(F.lit(0.0)),
    )
    cfg = StarViewConfig(
        main_key=["o_orderkey"],
        main_cols=["o_orderkey", "o_custkey", "o_totalprice"],
        dims=[],
        child=ChildAgg(
            child_fk="l_orderkey",
            agg={
                "n_items": "CAST(count(*) AS BIGINT)",
                "sum_qty": "CAST(round(sum(l_quantity)) AS BIGINT)",
            },
        ),
    )
    cl = derive_star_view_changelog(
        cfg,
        main_cur,
        [],
        ordinal=1,
        main_changes=orders.where(F.col("o_orderkey") % 31 == 0).select("o_orderkey"),
        child_current=child_cur,
        child_changes=li.where(F.col("l_orderkey") % 19 == 0),
    )
    return cl.where(F.col("op") == "U").select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.col("o_custkey").cast("long").alias("o_custkey"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
        F.col("n_items").alias("n_items"),
        F.col("sum_qty").alias("sum_qty"),
    )


SQL_MV_CHILD_AGG = """
WITH main_cur AS (
  SELECT o_orderkey, o_custkey,
         o_totalprice + CASE WHEN o_orderkey % 31 = 0 THEN 1000.0 ELSE 0.0 END
           AS o_totalprice
  FROM orders),
child_cur AS (
  SELECT l_orderkey,
         l_quantity + CASE WHEN l_orderkey % 19 = 0 THEN 5.0 ELSE 0.0 END
           AS l_quantity
  FROM lineitem),
agg AS (
  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_items,
         CAST(round(sum(l_quantity)) AS BIGINT) AS sum_qty
  FROM child_cur GROUP BY l_orderkey),
affected AS (
  SELECT o_orderkey FROM orders WHERE o_orderkey % 31 = 0
  UNION
  SELECT DISTINCT l_orderkey AS o_orderkey FROM lineitem WHERE l_orderkey % 19 = 0)
SELECT m.o_orderkey::BIGINT AS o_orderkey,
       m.o_custkey::BIGINT AS o_custkey,
       CAST(round(m.o_totalprice * 100) AS BIGINT) AS price_cents,
       a.n_items AS n_items,
       a.sum_qty AS sum_qty
FROM main_cur m
JOIN affected USING (o_orderkey)
LEFT JOIN agg a ON m.o_orderkey = a.l_orderkey
"""


QUERIES = {
    "mv_join_maintain": q_mv_join_maintain,
    "mv_two_dim_maintain": q_mv_two_dim_maintain,
    "mv_child_agg_maintain": q_mv_child_agg_maintain,
}
ORACLES = {
    "mv_join_maintain": SQL_MV_JOIN_MAINTAIN,
    "mv_two_dim_maintain": SQL_MV_TWO_DIM,
    "mv_child_agg_maintain": SQL_MV_CHILD_AGG,
}
