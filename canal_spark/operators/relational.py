"""Engine-core operators expressed over the shared testdata, with
DuckDB oracles — the SQL-checkable faces of the maintenance engine
(SURVEY.md §2): last-wins changelog dedupe, merge-as-join, pk-hash
partitioning, bin-pack planning, Z-order keys, stat tightness, regex
table filters / topic routing, metrics rollups, event-time windows.

Every aggregate/computed column is aliased identically on both sides
(driver hashes values under sorted column names).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from canal_spark.operators.common import chunked_cumsum, duck_md5int, load, md5int


# --- 1. changelog last-wins dedupe (P1-P3 per-key order invariant) --------


def q_changelog_dedupe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last event per user by (ts, event_id) — the dedupe that precedes
    every MERGE (canal_spark.changelog.dedupe_last_wins), over the
    shared `events` table (ts = ordinal analogue)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("_rn", F.row_number().over(w))
        .where("_rn = 1")
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_event_type"),
            F.round(F.col("value"), 6).alias("last_value"),
        )
    )


SQL_CHANGELOG_DEDUPE = """
SELECT user_id,
       event_id   AS last_event_id,
       event_type AS last_event_type,
       round(value::DOUBLE, 6) AS last_value
FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
WHERE rn = 1
"""


# --- 2. merge-as-join: upsert/delete resolution (A1-A3) --------------------


def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics as a declarative join over `documents`:
    base = doc_id%7!=0; upserts = doc_id%3==0 (n_chars+1000);
    deletes = doc_id%11==0 (delete wins over upsert, like a later
    ordinal).  Mirrors canal_spark.merge.merge_into's COW resolution."""
    docs = load(spark, sf_dir, "documents")
    base = docs.where("doc_id % 7 != 0").select("doc_id", "n_chars")
    ups = docs.where("doc_id % 3 = 0").select(
        "doc_id", (F.col("n_chars") + 1000).alias("n_chars")
    )
    dels = docs.where("doc_id % 11 = 0").select("doc_id")
    merged = (
        base.join(ups.select("doc_id"), "doc_id", "left_anti")
        .unionByName(ups)
        .join(dels, "doc_id", "left_anti")
    )
    return merged.select("doc_id", F.col("n_chars").cast("long").alias("n_chars_final"))


SQL_MERGE_UPSERT = """
WITH base AS (SELECT doc_id, n_chars FROM documents WHERE doc_id % 7 != 0),
     ups  AS (SELECT doc_id, n_chars + 1000 AS n_chars FROM documents WHERE doc_id % 3 = 0),
     dels AS (SELECT doc_id FROM documents WHERE doc_id % 11 = 0)
SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars_final
FROM (SELECT * FROM base WHERE doc_id NOT IN (SELECT doc_id FROM ups)
      UNION ALL SELECT * FROM ups)
WHERE doc_id NOT IN (SELECT doc_id FROM dels)
"""


# --- 3. metrics rollup (prometheus counters analogue) ----------------------


def q_metrics_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 3).alias("sum_value"),
        F.round(F.min("value"), 6).alias("min_value"),
        F.round(F.max("value"), 6).alias("max_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


SQL_METRICS_ROLLUP = """
SELECT event_type,
       count(*) AS n_events,
       round(sum(value)::DOUBLE, 3) AS sum_value,
       round(min(value)::DOUBLE, 6) AS min_value,
       round(max(value)::DOUBLE, 6) AS max_value,
       count(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
"""


def q_json_props_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: pull a typed field out of the JSON
    `props` payload (the FlatMessage-style stringly column every CDC
    envelope carries — FlatMessage.java keeps row data as string maps)
    and roll it up per event type.  `get_json_object` is a JVM
    expression inside whole-stage codegen — the parse never leaves the
    scan stage, no shuffle happens before the keyed partial agg, and
    all outputs are exact integers."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.select("event_type", "user_id", k.alias("k")).groupBy(
        "event_type"
    ).agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum("k").cast("long").alias("sum_k"),
        F.min("k").cast("long").alias("min_k"),
        F.max("k").cast("long").alias("max_k"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )


SQL_JSON_PROPS_ROLLUP = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(min(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
       CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type
"""


# --- 4. topic routing (F8: MQMessageUtils.messageTopics) --------------------


def q_topic_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    topic = (
        F.when(F.col("source").rlike("^src1[0-9]$"), F.lit("topic-high"))
        .when(F.col("source").rlike("^src[0-4]$"), F.lit("topic-low"))
        .otherwise(F.lit("topic-mid"))
    )
    return (
        docs.withColumn("topic", topic)
        .groupBy("topic")
        .agg(F.count("*").alias("n_docs"), F.countDistinct("source").alias("n_sources"))
    )


SQL_TOPIC_ROUTING = """
SELECT CASE WHEN regexp_matches(source, '^src1[0-9]$') THEN 'topic-high'
            WHEN regexp_matches(source, '^src[0-4]$')  THEN 'topic-low'
            ELSE 'topic-mid' END AS topic,
       count(*) AS n_docs,
       count(DISTINCT source) AS n_sources
FROM documents GROUP BY 1
"""


# --- 5. regex whitelist filter (F1: AviaterRegexFilter) ---------------------


def q_table_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canal filters `schema.table` against anchored regexes
    (filter/.../AviaterRegexFilter.java:39-75); analogue: filter
    `source.lang` keys against a whitelist."""
    docs = load(spark, sf_dir, "documents")
    key = F.concat_ws(".", "source", "lang")
    keep = key.rlike("^src[0-3]\\.(en|de)$") | key.rlike("^src1[0-5]\\..*$")
    return (
        docs.where(keep)
        .groupBy("source", "lang")
        .agg(F.count("*").alias("n_docs"))
    )


SQL_TABLE_FILTER = """
SELECT source, lang, count(*) AS n_docs
FROM documents
WHERE regexp_matches(source || '.' || lang, '^src[0-3]\\.(en|de)$')
   OR regexp_matches(source || '.' || lang, '^src1[0-5]\\..*$')
GROUP BY source, lang
"""


# --- 6. pk-hash partitioner (P1: MQMessageUtils.messagePartition) -----------


def q_pk_hash_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    pid = (md5int(F.col("doc_id").cast("string")) % 8).alias("partition_id")
    return docs.select(pid, "n_chars").groupBy("partition_id").agg(
        F.count("*").alias("n_rows"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
    )


SQL_PK_HASH_PARTITION = f"""
SELECT {duck_md5int("CAST(doc_id AS VARCHAR)")} % 8 AS partition_id,
       count(*) AS n_rows,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY 1
"""


# --- 7. bin-pack planning (compaction sizing, MEMSIZE analogue) --------------


def q_binpack_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative-fill bin assignment by byte budget — the SQL-visible
    core of canal_spark.compact.plan_bins (greedy by running total).

    The running sum is the two-phase chunked cumsum (see
    operators.common.chunked_cumsum): deterministic chunks of the
    doc_id key, per-chunk parallel windows, broadcast prefix offsets —
    identical values to a global window without the single-partition
    WindowExec that would funnel the whole table through one task."""
    docs = load(spark, sf_dir, "documents")
    cummed = chunked_cumsum(
        docs.select("doc_id", "n_chars"),
        order_col="doc_id",
        value_col="n_chars",
        out_col="cum",
        chunk_width=256,
    )
    binned = cummed.select(
        "doc_id", "n_chars", F.floor((F.col("cum") - 1) / F.lit(50000)).alias("bin_id")
    )
    return binned.groupBy("bin_id").agg(
        F.count("*").alias("n_files"),
        F.sum("n_chars").cast("long").alias("bin_bytes"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


SQL_BINPACK_PLAN = """
WITH c AS (SELECT doc_id, n_chars,
                  sum(n_chars) OVER (ORDER BY doc_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM documents)
SELECT CAST(floor((cum - 1) / 50000) AS BIGINT) AS bin_id,
       count(*) AS n_files,
       CAST(sum(n_chars) AS BIGINT) AS bin_bytes,
       min(doc_id) AS first_doc,
       max(doc_id) AS last_doc
FROM c GROUP BY 1
"""


# --- 8. Z-order key (bit interleave, SQL-expressible 8+8-bit variant) --------


def _zorder_sql_spark():
    # interleave low 8 bits of (n_chars) with low 8 bits of md5int(doc_id):
    # a-bits on odd positions, b-bits on even — mirrors
    # canal_spark.cluster.morton_interleave at reduced width.
    a = F.pmod(F.col("n_chars").cast("long"), F.lit(256))
    b = F.pmod(md5int(F.col("doc_id").cast("string")), F.lit(256))
    terms = []
    for i in range(8):
        terms.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i + 1))
        terms.append(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i))
    z = terms[0]
    for t in terms[1:]:
        z = z + t
    return z.cast("long")


def q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select("doc_id", _zorder_sql_spark().alias("zkey"))


def _zorder_sql_duck() -> str:
    h = duck_md5int("CAST(doc_id AS VARCHAR)")
    terms = []
    for i in range(8):
        terms.append(f"((((n_chars % 256) >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"(((({h} % 256) >> {i}) & 1) << {2 * i})")
    return " + ".join(terms)


SQL_ZORDER_KEY = f"""
SELECT doc_id, CAST({_zorder_sql_duck()} AS BIGINT) AS zkey FROM documents
"""


# --- 9. stat tightness (min/max range metric) --------------------------------


def q_stat_tightness(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    h = md5int(F.col("doc_id").cast("string"))
    full = float((1 << 60) - 1)
    return (
        docs.select("source", h.alias("h"))
        .groupBy("source")
        .agg(
            F.round((F.max("h") - F.min("h")) / F.lit(full), 6).alias("range_norm"),
            F.count("*").alias("n_rows"),
        )
    )


SQL_STAT_TIGHTNESS = f"""
SELECT source,
       round((max(h) - min(h)) / 1152921504606846975.0, 6) AS range_norm,
       count(*) AS n_rows
FROM (SELECT source, {duck_md5int("CAST(doc_id AS VARCHAR)")} AS h FROM documents)
GROUP BY source
"""


# --- 10. event-time tumbling windows (streaming-batch parity) ----------------


def q_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    wh = F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH")
    return (
        ev.select(wh.alias("window_hour"), "event_type", "value")
        .groupBy("window_hour", "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 3).alias("sum_value"))
    )


SQL_EVENT_WINDOWS = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS window_hour,
       event_type,
       count(*) AS n_events,
       round(sum(value)::DOUBLE, 3) AS sum_value
FROM events GROUP BY 1, 2
"""


SESSION_GAP_US = 1800 * 1_000_000  # 30-minute inactivity gap


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization of the event stream: per user, a new
    session starts after 30 min of inactivity; emits per-session event
    counts and micro-second start/end/duration.  All windows are
    PARTITIONED by user (lag + running sum within user) — the
    single-partition global-window trap never appears, and at 10^12
    events the shuffle key is the user id, exactly how a sessionizer
    scales.  Timestamps compare in integer microseconds so both engines
    agree exactly."""
    from pyspark.sql import Window

    # ts is TIMESTAMP_NTZ: diff against the NTZ epoch (tz-independent,
    # matches DuckDB's epoch_us on naive timestamps exactly)
    # null event times are excluded on BOTH sides: the engines disagree
    # on null ordering (Spark windows order nulls first, DuckDB last),
    # so an untimed event has no well-defined session anyway
    ev = (
        load(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull())
        .select(
            "user_id",
            "event_id",
            F.expr(
                "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
            ).alias("us"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gap = F.col("us") - F.lag("us").over(w)
    new_sess = (gap.isNull() | (gap > SESSION_GAP_US)).cast("long")
    sess = F.sum(new_sess).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        ev.withColumn("session_seq", sess)
        .groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min("us").alias("start_us"),
            F.max("us").alias("end_us"),
            (F.max("us") - F.min("us")).alias("duration_us"),
        )
    )


SQL_SESSIONIZE = f"""
WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us
           FROM events WHERE ts IS NOT NULL),
m AS (
  SELECT user_id, event_id, us,
         CASE WHEN lag(us) OVER w IS NULL
                   OR us - lag(us) OVER w > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS ns
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
s AS (
  SELECT user_id, us,
         sum(ns) OVER (PARTITION BY user_id ORDER BY us, event_id
                       ROWS UNBOUNDED PRECEDING) AS sess
  FROM m)
SELECT user_id,
       CAST(sess AS BIGINT) AS session_seq,
       count(*) AS n_events,
       min(us) AS start_us,
       max(us) AS end_us,
       max(us) - min(us) AS duration_us
FROM s GROUP BY user_id, sess
"""


QUERIES = {
    "changelog_dedupe": q_changelog_dedupe,
    "merge_upsert": q_merge_upsert,
    "metrics_rollup": q_metrics_rollup,
    "json_props_rollup": q_json_props_rollup,
    "topic_routing": q_topic_routing,
    "table_filter": q_table_filter,
    "pk_hash_partition": q_pk_hash_partition,
    "binpack_plan": q_binpack_plan,
    "zorder_key": q_zorder_key,
    "stat_tightness": q_stat_tightness,
    "event_windows": q_event_windows,
    "sessionize": q_sessionize,
}

ORACLES = {
    "changelog_dedupe": SQL_CHANGELOG_DEDUPE,
    "merge_upsert": SQL_MERGE_UPSERT,
    "metrics_rollup": SQL_METRICS_ROLLUP,
    "json_props_rollup": SQL_JSON_PROPS_ROLLUP,
    "topic_routing": SQL_TOPIC_ROUTING,
    "table_filter": SQL_TABLE_FILTER,
    "pk_hash_partition": SQL_PK_HASH_PARTITION,
    "binpack_plan": SQL_BINPACK_PLAN,
    "zorder_key": SQL_ZORDER_KEY,
    "stat_tightness": SQL_STAT_TIGHTNESS,
    "event_windows": SQL_EVENT_WINDOWS,
    "sessionize": SQL_SESSIONIZE,
}
