"""Temporal join operators over the `events` stream: as-of join and
bounded range (interval) join — the two joins Spark's optimizer has no
native operator for, re-expressed in shapes that scale.

The reference's analogue is its event-time ordering machinery (every
Entry carries `executeTime`, `EntryProtocol.proto:44`; the multi-source
sink merges streams by event time, sink/.../GroupEventSink.java) — a
feature pipeline joining each event to "the state as of then" is the
query-side restatement of that ordering contract.

Scale shapes:

* **as-of join** — NOT a per-row lookup and NOT a range cross-join:
  both sides union into one frame tagged by side, one hash shuffle on
  the join key, and a running `last(..., ignorenulls=True)` window
  ordered by (ts, side) carries the most recent right-side value onto
  every left row.  One exchange, zero Python, no row explosion; skew
  bounded by the hottest key (same bound any per-key-ordered semantics
  has).  This is the standard distributed as-of (Flink's event-time
  temporal join does the same with keyed state).
* **range join** — the classic bucketed interval join: intervals
  explode to the fixed-width time buckets they overlap (bounded window
  width / bucket width per row), points land in one bucket, the join is
  an equi-join on (key, bucket) with the exact range check as residual.
  Work is O(pairs actually near in time), never the O(n·m) a naive
  inequality join plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from canal_spark.operators.common import load

# 5-minute lookback window for the range join, in microseconds (both
# engines compare integer epoch-μs: no timestamp-arithmetic drift)
RANGE_US = 300_000_000
BUCKET_US = RANGE_US  # bucket width == window width -> ≤2 buckets/interval


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every click event: the most recent purchase (value + ts) by
    the same user at-or-before the click — event-time as-of join.

    Implementation: union(purchases tagged 0, clicks tagged 1), window
    per user ordered by (ts, side, event_id), running
    last(purchase-only columns, ignorenulls) — right rows sort before
    left rows at equal ts, so ties are inclusive exactly like DuckDB's
    ``ASOF JOIN ... ON l.ts >= r.ts`` oracle.  (user_id, ts) pairs are
    unique in the fixture, so the match is fully deterministic."""
    ev = load(spark, sf_dir, "events")
    right = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value", F.lit(0).alias("_side")
    )
    left = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value", F.lit(1).alias("_side")
    )
    u = right.unionByName(left)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "_side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # ONE running last() over a struct of the whole purchase row — two
    # independent last(value)/last(ts) windows would disagree when the
    # most recent purchase has a NULL value (ignorenulls skips it for
    # value but not for ts), stitching a chimera row from two different
    # purchases; the struct is non-null per purchase row, so both
    # columns always come from the SAME (latest) purchase
    pr = F.when(
        F.col("_side") == 0, F.struct(F.col("value"), F.col("ts"))
    )
    out = (
        u.withColumn("_lp", F.last(pr, ignorenulls=True).over(w))
        .where(F.col("_side") == 1)
        .select(
            "event_id", "user_id", "ts",
            F.col("_lp.value").alias("last_purchase_value"),
            F.col("_lp.ts").alias("last_purchase_ts"),
        )
    )
    return out


SQL_ASOF_JOIN = """
SELECT l.event_id, l.user_id, l.ts,
       r.value AS last_purchase_value,
       r.ts AS last_purchase_ts
FROM (SELECT * FROM events WHERE event_type = 'click') l
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
"""


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per purchase event: how many clicks the same user made in the
    5 minutes up to the purchase (exclusive lower bound, inclusive
    upper) — bounded interval join via time bucketing.

    Each purchase interval (p-5min, p] overlaps at most 2 fixed
    5-minute buckets (enumerated with `sequence`, so any window/bucket
    ratio works); each click lands in exactly 1.  The equi-join runs on
    (user_id, bucket) and the exact μs range check is the residual
    predicate.  Purchases with zero nearby clicks still appear (left
    join after aggregation would re-shuffle; instead clicks aggregate
    per purchase and a left join from the purchase set restores the
    zero rows — both joins are (user, bucket/event)-keyed hash joins)."""
    ev = load(spark, sf_dir, "events")
    # μs since a fixed NTZ origin: `ts` is TIMESTAMP_NTZ, for which
    # unix_micros is undefined and an LTZ cast would smuggle the session
    # timezone into the basis; any exact linear μs basis works because
    # only DIFFERENCES are compared (the oracle uses epoch_us — same
    # comparisons, shifted by a constant)
    us = F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ'2000-01-01 00:00:00', ts)")
    p = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", us.alias("p_us")
    )
    # integer DIV, not double division: μs epochs are ~2^50 and a
    # float-rounded quotient can land a boundary row in the wrong
    # bucket, silently dropping a matching pair
    c = ev.where(F.col("event_type") == "click").select(
        "user_id", us.alias("c_us")
    ).withColumn("bkt", F.expr(f"c_us DIV {BUCKET_US}"))
    p_bkts = p.select(
        "event_id", "user_id", "p_us",
        F.explode(
            F.sequence(
                F.expr(f"(p_us - {RANGE_US}) DIV {BUCKET_US}"),
                F.expr(f"p_us DIV {BUCKET_US}"),
            )
        ).alias("bkt"),
    )
    hits = (
        p_bkts.join(c, ["user_id", "bkt"])
        .where(
            (F.col("c_us") > F.col("p_us") - F.lit(RANGE_US))
            & (F.col("c_us") <= F.col("p_us"))
        )
        .groupBy("event_id")
        .agg(F.count("*").alias("n"))
    )
    out = (
        p.join(hits, "event_id", "left")
        .select(
            "event_id",
            "user_id",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_clicks_5m"),
        )
    )
    return out


SQL_RANGE_JOIN = f"""
SELECT p.event_id, p.user_id,
       CAST(count(c.event_id) AS BIGINT) AS n_clicks_5m
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON c.user_id = p.user_id
 AND epoch_us(c.ts) > epoch_us(p.ts) - {RANGE_US}
 AND epoch_us(c.ts) <= epoch_us(p.ts)
GROUP BY p.event_id, p.user_id
"""


QUERIES = {
    "asof_join": q_asof_join,
    "range_join": q_range_join,
}

ORACLES = {
    "asof_join": SQL_ASOF_JOIN,
    "range_join": SQL_RANGE_JOIN,
}
