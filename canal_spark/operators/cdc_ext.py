"""Extended CDC dataflow operators from SURVEY.md §2 not covered by
the core relational set: multi-source timeline merge (M1/M3),
FlatMessage encode/decode (A12/F8), PK-change normalization (A2/A10),
empty-transaction suppression (F6), start-position resolution (K4),
and unsigned type promotion (S6).

Each operator is expressed over the shared fixture tables so the
DuckDB oracle can replay it exactly; the Spark plans are the shapes
the real engine uses (union + window for the k-way merge, from_json
for the wire format, conditional explode for D+I splitting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from canal_spark.operators.common import chunked_row_number, load


# --------------------------------------------------------------------------
# M1/M3 — timeline merge barrier: k-way merge of N shard streams into one
# globally time-ordered stream (sink/.../group/TimelineBarrier.java:13-60 —
# min-timestamp gate across parsers; GroupEventSink fan-in)
# --------------------------------------------------------------------------


def q_timeline_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split `events` into 3 shard streams (multi-master shards), then
    merge back into global (ts, event_id) order with a gap-free global
    sequence — Spark's sort-merge replaces the barrier CAS loop.

    Scale shape: the global sequence is assigned two-phase (chunk by the
    event-time DAY — monotone in the (ts, event_id) order — rank within
    chunk in parallel windows, broadcast per-chunk prefix offsets), so
    no single-partition WindowExec ever sees the full table."""
    # null event times are excluded on BOTH sides: Spark orders nulls
    # first, DuckDB last, so an untimed event would shift every
    # global_seq and break cross-engine parity (same rule as sessionize;
    # a real timeline barrier has no position for an untimed event)
    ev = load(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    shards = [
        ev.where(F.col("event_id") % 3 == i).withColumn("shard", F.lit(i).cast("int"))
        for i in range(3)
    ]
    merged = shards[0].unionByName(shards[1]).unionByName(shards[2])
    seq = chunked_row_number(
        merged,
        order_cols=["ts", "event_id"],
        chunk_col=F.to_date("ts"),
        out_col="global_seq",
    )
    return (
        seq.where(F.col("global_seq") <= 2000)
        .select("global_seq", "shard", "event_id", "ts")
    )


SQL_TIMELINE_MERGE = """
WITH sharded AS (
  SELECT event_id, ts, CAST(event_id % 3 AS INT) AS shard
  FROM events WHERE ts IS NOT NULL),
merged AS (
  SELECT *, row_number() OVER (ORDER BY ts, event_id) AS global_seq FROM sharded)
SELECT CAST(global_seq AS BIGINT) AS global_seq, shard, event_id, ts
FROM merged WHERE global_seq <= 2000
"""


# --------------------------------------------------------------------------
# A12/F8 — FlatMessage wire format: rows -> JSON envelope -> rows
# (protocol/.../FlatMessage.java; MQMessageUtils.messageConverter:249-371;
# adapter-side MessageUtil.parse4Dml)
# --------------------------------------------------------------------------

_FLAT_SCHEMA = (
    "database string, table string, type string, es bigint, ts bigint, "
    "pkNames array<string>, data array<map<string,string>>"
)


def q_flat_message_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode order rows as FlatMessage JSON (stringly-typed data maps,
    exactly the reference's wire shape) then decode with from_json +
    explode and project typed columns back out — S6's type
    normalization semantics done as column casts."""
    o = load(spark, sf_dir, "orders").where(F.col("o_orderkey") % 97 == 0)
    msg = o.select(
        F.to_json(
            F.struct(
                F.lit("tpch").alias("database"),
                F.lit("orders").alias("table"),
                F.lit("INSERT").alias("type"),
                F.unix_date(F.to_date("o_orderdate")).cast("long").alias("es"),
                F.lit(0).cast("long").alias("ts"),
                F.array(F.lit("o_orderkey")).alias("pkNames"),
                F.array(
                    F.map_from_arrays(
                        F.array(F.lit("o_orderkey"), F.lit("o_price_cents"), F.lit("o_orderstatus")),
                        F.array(
                            F.col("o_orderkey").cast("string"),
                            # stringly-typed wire value: integer cents (a
                            # decimal rendering both engines agree on —
                            # DECIMAL toPlainString semantics, S6)
                            F.round(F.col("o_totalprice") * 100).cast("long").cast("string"),
                            F.col("o_orderstatus"),
                        ),
                    )
                ).alias("data"),
            )
        ).alias("json")
    )
    parsed = msg.select(F.from_json("json", _FLAT_SCHEMA).alias("m"))
    row = parsed.select(
        F.col("m.table").alias("tbl"),
        F.col("m.type").alias("op"),
        F.col("m.es").alias("es"),
        F.explode("m.data").alias("cells"),
    )
    return row.select(
        "tbl",
        "op",
        "es",
        F.col("cells")["o_orderkey"].cast("long").alias("o_orderkey"),
        F.col("cells")["o_price_cents"].cast("long").alias("price_cents"),
        F.col("cells")["o_orderstatus"].alias("status"),
    )


SQL_FLAT_MESSAGE = """
SELECT 'orders' AS tbl, 'INSERT' AS op,
       datediff('day', DATE '1970-01-01', o_orderdate)::BIGINT AS es,
       o_orderkey::BIGINT AS o_orderkey,
       CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
       o_orderstatus AS status
FROM orders WHERE o_orderkey % 97 = 0
"""


# --------------------------------------------------------------------------
# A2/A10 — PK-change normalization: an UPDATE that changes the key becomes
# DELETE(old pk) + INSERT(new pk)
# (RdbSyncService.java:441-455 hashes by the OLD pk; HbaseSyncService
# :178-208 deletes old rowkey + puts new)
# --------------------------------------------------------------------------


def q_pk_change_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model key-renames over `documents`: every doc with doc_id%19==0
    'renames' to doc_id+1000000.  Emit D(old) + I(new) rows, ordered so
    the delete precedes the insert at the same change ordinal."""
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") % 19 == 0)
    dels = d.select(
        (F.col("doc_id") * 2).cast("long").alias("ordinal"),
        F.lit("D").alias("op"),
        F.col("doc_id").cast("long").alias("key"),
        F.lit(None).cast("string").alias("source_after"),
    )
    ins = d.select(
        (F.col("doc_id") * 2 + 1).cast("long").alias("ordinal"),
        F.lit("I").alias("op"),
        (F.col("doc_id") + 1000000).cast("long").alias("key"),
        F.col("source").alias("source_after"),
    )
    return dels.unionByName(ins)


SQL_PK_CHANGE_SPLIT = """
SELECT (doc_id*2)::BIGINT AS ordinal, 'D' AS op, doc_id::BIGINT AS key,
       NULL::VARCHAR AS source_after
FROM documents WHERE doc_id % 19 = 0
UNION ALL
SELECT (doc_id*2+1)::BIGINT, 'I', (doc_id+1000000)::BIGINT, source
FROM documents WHERE doc_id % 19 = 0
"""


# --------------------------------------------------------------------------
# F6 — empty-transaction suppression: batches containing no row events are
# dropped, but the latest position still advances
# (sink/.../EntryEventSink.java:99-135 — rate-limited pass-through)
# --------------------------------------------------------------------------


def q_empty_txn_suppress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group events into txn-like frames of 100 by event_id; a frame is
    'empty' if it carries no click/purchase rows.  Emit only non-empty
    frames plus the global max position (the cursor still advances)."""
    ev = load(spark, sf_dir, "events")
    framed = ev.withColumn("frame", (F.col("event_id") / 100).cast("long"))
    agg = framed.groupBy("frame").agg(
        F.sum(
            F.when(F.col("event_type").isin("click", "purchase"), 1).otherwise(0)
        ).alias("dml_rows"),
        F.max("event_id").alias("end_position"),
        F.count("*").alias("n_events"),
    )
    return agg.where(F.col("dml_rows") > 0).select(
        "frame", "dml_rows", "n_events", "end_position"
    )


SQL_EMPTY_TXN_SUPPRESS = """
WITH framed AS (
  SELECT *, CAST(floor(event_id / 100) AS BIGINT) AS frame FROM events),
agg AS (
  SELECT frame,
         CAST(SUM(CASE WHEN event_type IN ('click','purchase') THEN 1 ELSE 0 END) AS BIGINT) AS dml_rows,
         MAX(event_id) AS end_position, COUNT(*) AS n_events
  FROM framed GROUP BY frame)
SELECT frame, dml_rows, n_events, end_position FROM agg WHERE dml_rows > 0
"""


# --------------------------------------------------------------------------
# K4 — start-position resolution: saved cursor > configured position >
# by-timestamp seek, with a rewind overlap on failover
# (parse/.../MysqlEventParser.findStartPositionInternal:422-521)
# --------------------------------------------------------------------------


def q_start_position_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per user_id stream: resume position = latest event at-or-before
    the cutoff timestamp, rewound by 60 s (failover overlap) — the
    by-timestamp seek done as one window aggregation."""
    ev = load(spark, sf_dir, "events")
    cutoff = F.to_timestamp(F.lit("2024-01-10 00:00:00"))
    eligible = ev.where(F.col("ts") <= cutoff)
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    latest = eligible.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1)
    return latest.select(
        "user_id",
        F.col("event_id").alias("saved_position"),
        (F.col("ts") - F.expr("INTERVAL 60 SECONDS")).alias("resume_from"),
    )


SQL_START_POSITION = """
WITH ranked AS (
  SELECT user_id, event_id, ts,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events WHERE ts <= TIMESTAMP '2024-01-10 00:00:00')
SELECT user_id, event_id AS saved_position, ts - INTERVAL 60 SECOND AS resume_from
FROM ranked WHERE rn = 1
"""


# --------------------------------------------------------------------------
# S6 — unsigned type promotion: unsigned values that overflow the signed
# range are promoted one type up
# (parse/.../dbsync/LogEventConvert.java:726-757)
# --------------------------------------------------------------------------


def q_unsigned_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-read lineitem keys as if they were signed 16-bit wire values:
    negative raw readings are promoted by +65536 into the next type up
    (SMALLINT -> INT), mirroring the reference's promotion ladder."""
    li = load(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 1001 == 0)
    raw16 = (
        F.conv(F.substring(F.md5(F.col("l_orderkey").cast("string")), 1, 4), 16, 10)
        .cast("long")
        - 32768
    )
    return li.select(
        F.col("l_orderkey").cast("long").alias("l_orderkey"),
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        raw16.alias("raw_signed"),
        F.when(raw16 < 0, raw16 + 65536).otherwise(raw16).alias("promoted"),
    ).distinct()


SQL_UNSIGNED_PROMOTION = """
SELECT DISTINCT l_orderkey::BIGINT AS l_orderkey,
       l_linenumber::BIGINT AS l_linenumber,
       CAST(('0x'||substr(md5(l_orderkey::VARCHAR),1,4)) AS BIGINT) - 32768 AS raw_signed,
       CASE WHEN CAST(('0x'||substr(md5(l_orderkey::VARCHAR),1,4)) AS BIGINT) - 32768 < 0
            THEN CAST(('0x'||substr(md5(l_orderkey::VARCHAR),1,4)) AS BIGINT) - 32768 + 65536
            ELSE CAST(('0x'||substr(md5(l_orderkey::VARCHAR),1,4)) AS BIGINT) - 32768
       END AS promoted
FROM lineitem WHERE l_orderkey % 1001 = 0
"""


# --------------------------------------------------------------------------
# A1-A3 merge-on-read scan — Iceberg-v2-style equality-delete resolution
# (canal_spark/merge.py mode="mor" + table/format.py read_files_live):
# data rows carry a commit sequence; an equality-delete set at sequence
# d kills rows with the same key and a STRICTLY SMALLER sequence, so a
# key re-inserted after its delete survives.  Reference behavior: the
# same keyed INSERT/UPDATE/DELETE resolution as the COW path
# (client-adapter/rdb/.../RdbSyncService.java insert/update/delete),
# deferred to scan time.
# --------------------------------------------------------------------------


def q_mor_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-aware merge-on-read scan over `documents`: rows are
    assigned commit sequences seq = doc_id % 5; two pending
    equality-delete sets exist — keys doc_id%3==0 at delete-sequence 2
    and keys doc_id%7==0 at delete-sequence 4.  The scan is ONE
    anti-join with the sequence comparison as a residual condition —
    exactly read_files_live's plan shape (broadcast pending-delete keys,
    per-row sequence from the file manifest)."""
    docs = load(spark, sf_dir, "documents")
    data = docs.select(
        "doc_id", "source", (F.col("doc_id") % 5).alias("seq")
    )
    dels = (
        docs.where("doc_id % 3 = 0")
        .select(F.col("doc_id").alias("d_id"), F.lit(2).alias("dseq"))
        .unionByName(
            docs.where("doc_id % 7 = 0").select(
                F.col("doc_id").alias("d_id"), F.lit(4).alias("dseq")
            )
        )
    )
    cond = (F.col("doc_id") == F.col("d_id")) & (F.col("dseq") > F.col("seq"))
    return data.join(F.broadcast(dels), cond, "left_anti").select(
        "doc_id", "source", F.col("seq").cast("long").alias("seq")
    )


SQL_MOR_SCAN = """
WITH data AS (SELECT doc_id, source, doc_id % 5 AS seq FROM documents),
     dels AS (SELECT doc_id AS d_id, 2 AS dseq FROM documents WHERE doc_id % 3 = 0
              UNION ALL
              SELECT doc_id AS d_id, 4 AS dseq FROM documents WHERE doc_id % 7 = 0)
SELECT doc_id, source, CAST(seq AS BIGINT) AS seq
FROM data
WHERE NOT EXISTS (SELECT 1 FROM dels
                  WHERE dels.d_id = data.doc_id AND dels.dseq > data.seq)
"""


# --------------------------------------------------------------------------
# A1-A3 merge-on-read scan, POSITION-delete form — Iceberg v2's second
# delete shape (canal_spark/merge.py mode="mor-pos" +
# table/format.py read_files_live pos branch): a delete row is the exact
# physical identity (file, row-index) of the row it kills, so the scan
# applies deletes with a two-column equi anti-join and NO sequence
# residual — file identity is immutable (a rewrite emits a new path),
# which is why position deletes need commit-time validateDataFilesExist
# instead of the eq-delete sequence rule.  Reference behavior: the same
# keyed DELETE resolution (RdbSyncService.java delete), targeted by
# physical row identity instead of key equality.
# --------------------------------------------------------------------------


def q_pos_delete_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-delete merge-on-read scan over `documents`: rows get a
    synthetic physical identity (file_id = doc_id % 16,
    pos = doc_id div 16 — 16 "files" of consecutive row indexes); the
    pending position-delete set references the exact (file_id, pos)
    pairs of docs with doc_id % 11 == 0.  The scan is ONE broadcast
    two-column equi anti-join — exactly read_files_live's pos-delete
    plan shape (no sequence residual: physical identity, not key
    matching)."""
    docs = load(spark, sf_dir, "documents")
    data = docs.select(
        "doc_id",
        "source",
        (F.col("doc_id") % 16).alias("fp"),
        F.floor(F.col("doc_id") / 16).cast("long").alias("pos"),
    )
    dels = docs.where("doc_id % 11 = 0").select(
        (F.col("doc_id") % 16).alias("d_fp"),
        F.floor(F.col("doc_id") / 16).cast("long").alias("d_pos"),
    )
    cond = (F.col("fp") == F.col("d_fp")) & (F.col("pos") == F.col("d_pos"))
    return data.join(F.broadcast(dels), cond, "left_anti").select(
        "doc_id", "source", F.col("fp").cast("long").alias("file_id"), "pos"
    )


SQL_POS_DELETE_SCAN = """
WITH data AS (SELECT doc_id, source, doc_id % 16 AS fp, doc_id // 16 AS pos
              FROM documents),
     dels AS (SELECT doc_id % 16 AS d_fp, doc_id // 16 AS d_pos
              FROM documents WHERE doc_id % 11 = 0)
SELECT doc_id, source, CAST(fp AS BIGINT) AS file_id, CAST(pos AS BIGINT) AS pos
FROM data
WHERE NOT EXISTS (SELECT 1 FROM dels
                  WHERE dels.d_fp = data.fp AND dels.d_pos = data.pos)
"""


# --------------------------------------------------------------------------
# C2 recovery path — incremental snapshot-diff read: reconstruct the I/U/D
# row-change stream between two retained snapshots (the driver-query twin of
# canal_spark/diff.py::snapshot_diff; server/.../CanalServerWithEmbedded.java:
# 289-371 get-batch for consumers that missed the original changelog)
# --------------------------------------------------------------------------


def q_incremental_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diff two simulated snapshots of the documents table and emit
    exactly the (op, doc_id, after_len) changes that turn the old one
    into the new one: docs absent from OLD are I, absent from NEW are
    D, present in both with different content are U; unchanged rows
    are dropped before anything wide moves.

    The two snapshots are deterministic slices of the fixture —
    old = doc_id % 17 != 3 (those docs get inserted later),
    new = doc_id % 13 != 5 (those got deleted), with doc_id % 7 == 2
    rewritten (updates).

    Scale shape (same as `diff.snapshot_diff`): both sides reduce to
    (doc_id, 60-bit content signature) map-side BEFORE the full-outer
    join, so the one unavoidable shuffle moves two narrow key/hash
    frames, never the token payload; the after-image is carried only
    on the new side, which the consumer needs anyway.  The diff is
    O(table) by nature — it is the recovery path; the changelog is the
    cheap path."""
    docs = load(spark, sf_dir, "documents")
    old = docs.where(F.col("doc_id") % 17 != 3).select(
        F.col("doc_id"), F.md5("text").alias("_osig")
    )
    new = docs.where(F.col("doc_id") % 13 != 5).select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 2, F.upper(F.col("text")))
        .otherwise(F.col("text"))
        .alias("text"),
    ).select("doc_id", F.md5("text").alias("_nsig"), F.length("text").alias("_len"))
    j = old.join(new, "doc_id", "full_outer")
    return (
        j.where(
            F.col("_osig").isNull()
            | F.col("_nsig").isNull()
            | (F.col("_osig") != F.col("_nsig"))
        )
        .select(
            F.when(F.col("_osig").isNull(), F.lit("I"))
            .when(F.col("_nsig").isNull(), F.lit("D"))
            .otherwise(F.lit("U"))
            .alias("op"),
            "doc_id",
            F.col("_len").cast("long").alias("after_len"),
        )
    )


SQL_INCREMENTAL_DIFF = """
WITH old AS (SELECT doc_id, md5(text) AS osig FROM documents
             WHERE doc_id % 17 <> 3),
new AS (SELECT doc_id, md5(t) AS nsig, length(t) AS len
        FROM (SELECT doc_id,
                     CASE WHEN doc_id % 7 = 2 THEN upper(text) ELSE text END AS t
              FROM documents WHERE doc_id % 13 <> 5)),
j AS (SELECT coalesce(o.doc_id, n.doc_id) AS doc_id, o.osig, n.nsig, n.len
      FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id)
SELECT CASE WHEN osig IS NULL THEN 'I'
            WHEN nsig IS NULL THEN 'D'
            ELSE 'U' END AS op,
       doc_id,
       CAST(len AS BIGINT) AS after_len
FROM j
WHERE osig IS NULL OR nsig IS NULL OR osig <> nsig
"""


_CDF_T0 = "2024-01-15 00:00:00"


def q_cdf_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed read with pre/post images: reconstruct the NET
    row-level changes between two table states from the raw changelog
    (Iceberg `create_changelog_view(net_changes=true)` / Delta CDF
    semantics; the reference's RowData before/after pairing,
    `protocol/.../EntryProtocol.proto` RowData beforeColumns/
    afterColumns).  `events` is the changelog — key user_id, ordinal
    (ts, event_id), 'error' rows are tombstones, everything else is an
    upsert of `value`.  State at T = last-wins as of T; the feed
    between T0 and now emits I (new key, after image), D (dropped key,
    before image), or the UB/UA before+after pair for a changed value.
    Keys whose value round-tripped back to its T0 value emit NOTHING —
    that is what distinguishes a net feed from a raw changelog replay.

    Scale shape: each side collapses to one row per key via a
    key-partitioned window BEFORE the join, so the full-outer join
    moves two narrow per-key frames; the up-to-two output rows per key
    are built map-side with a literal struct array + explode — one
    pass over the joined frame, no union-of-four-selects re-scan."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))

    def last_state(df: DataFrame, tag: str) -> DataFrame:
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .where("_rn = 1")
            .select(
                "user_id",
                (F.col("event_type") != "error").alias(f"{tag}_live"),
                F.col("value").alias(f"{tag}_val"),
            )
        )

    old = last_state(ev.where(F.col("ts") <= F.lit(_CDF_T0).cast("timestamp")), "o")
    new = last_state(ev, "n")
    j = old.join(new, "user_id", "full_outer")
    op = F.coalesce(F.col("o_live"), F.lit(False))
    np_ = F.coalesce(F.col("n_live"), F.lit(False))
    ch = F.struct  # (change_type, raw value) pairs, exploded below
    arr = (
        F.when(~op & np_, F.array(ch(F.lit("I").alias("t"), F.col("n_val").alias("v"))))
        .when(op & ~np_, F.array(ch(F.lit("D").alias("t"), F.col("o_val").alias("v"))))
        .when(
            op & np_ & (F.col("o_val") != F.col("n_val")),
            F.array(
                ch(F.lit("UB").alias("t"), F.col("o_val").alias("v")),
                ch(F.lit("UA").alias("t"), F.col("n_val").alias("v")),
            ),
        )
        .otherwise(F.array())
    )
    return (
        j.select("user_id", F.explode(arr).alias("_c"))
        .select(
            "user_id",
            F.col("_c.t").alias("change_type"),
            F.round(F.col("_c.v"), 6).alias("val"),
        )
    )


SQL_CDF_READ = f"""
WITH e AS (SELECT user_id, ts, event_id,
                  event_type <> 'error' AS live, value AS v
           FROM events),
old AS (SELECT user_id, live AS o_live, v AS o_val
        FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                           ORDER BY ts DESC, event_id DESC) AS rn
              FROM e WHERE ts <= TIMESTAMP '{_CDF_T0}')
        WHERE rn = 1),
new AS (SELECT user_id, live AS n_live, v AS n_val
        FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                           ORDER BY ts DESC, event_id DESC) AS rn
              FROM e)
        WHERE rn = 1),
j AS (SELECT coalesce(o.user_id, n.user_id) AS user_id,
             coalesce(o_live, false) AS op, o_val,
             coalesce(n_live, false) AS np, n_val
      FROM old o FULL OUTER JOIN new n ON o.user_id = n.user_id)
SELECT user_id, 'I' AS change_type, round(n_val::DOUBLE, 6) AS val
FROM j WHERE NOT op AND np
UNION ALL
SELECT user_id, 'D', round(o_val::DOUBLE, 6) FROM j WHERE op AND NOT np
UNION ALL
SELECT user_id, 'UB', round(o_val::DOUBLE, 6)
FROM j WHERE op AND np AND o_val <> n_val
UNION ALL
SELECT user_id, 'UA', round(n_val::DOUBLE, 6)
FROM j WHERE op AND np AND o_val <> n_val
"""


# --------------------------------------------------------------------------
# S3 — cold-archive resolve: whole-file segment catalog pruned by range,
# cold ∪ live union with exactly-once delivery across the crash-overlap
# window (parse/.../mysql/rds/RdsBinlogOpenApi.listBinlogFiles:28-49 range
# query; BinlogDownloadQueue.prepareBinlogList:76-104 sort;
# RdsLocalBinlogEventParser:196-217 gap-free switch back to live).
# Engine implementation: canal_spark/archive.py; this query restates the
# same semantics as one SQL-checkable plan over `events`.
# --------------------------------------------------------------------------


def q_archive_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cold∪live changelog resolve over ``events`` (ordinal = event_id):

    * the archive holds whole 100-ordinal *segments* (binlog files)
      covering ordinals below ``retain`` = 60% of the stream head;
    * live staging holds ordinals from ``live_from`` = 55% — the
      [live_from, retain) band exists in BOTH stores (the crash window
      between the manifest commit and the staging delete);
    * a consumer resumes from ``resume`` = 50%: cold segments are
      fetched only when their FILE-LEVEL max ordinal passes the cursor
      (the listBinlogFiles range query — whole segments, so a fetched
      boundary segment still carries rows below the cursor that the
      row filter then drops), unioned with live, row-filtered to
      ordinal > resume, delivered exactly once per ordinal.

    Output per segment: exact-once event count (``n_events``), the raw
    per-arm row counts showing the overlap band double-fetched
    (``n_cold + n_live > n_events`` there), and the delivered range.
    All thresholds derive from one broadcast 1-row MAX — the query is
    scale-relative, no literal depends on the corpus size.
    """
    ev = load(spark, sf_dir, "events").select("event_id")
    head = ev.agg((F.max("event_id") + F.lit(1)).cast("long").alias("m"))
    base = ev.crossJoin(F.broadcast(head)).select(
        F.col("event_id").cast("long").alias("event_id"),
        F.floor(F.col("m") * 3 / 5).alias("retain"),
        F.floor(F.col("m") * 11 / 20).alias("live_from"),
        F.floor(F.col("m") / 2).alias("resume"),
    )
    seg = F.floor(F.col("event_id") / 100)
    # cold arm: archived segments, pruned at FILE granularity by the
    # per-segment max ordinal (parquet-footer stats in archive.py)
    cold = base.where(F.col("event_id") < F.col("retain")).withColumn("seg", seg)
    segmax = Window.partitionBy("seg")
    cold = (
        cold.withColumn("_segmax", F.max("event_id").over(segmax))
        .where(F.col("_segmax") > F.col("resume"))
        .drop("_segmax")
        .withColumn("arm", F.lit("cold"))
    )
    live = (
        base.where(F.col("event_id") >= F.col("live_from"))
        .withColumn("seg", seg)
        .withColumn("arm", F.lit("live"))
    )
    resolved = cold.unionByName(live).where(F.col("event_id") > F.col("resume"))
    return (
        resolved.groupBy("seg")
        .agg(
            F.countDistinct("event_id").alias("n_events"),
            F.sum(F.when(F.col("arm") == "cold", 1).otherwise(0))
            .cast("long")
            .alias("n_cold"),
            F.sum(F.when(F.col("arm") == "live", 1).otherwise(0))
            .cast("long")
            .alias("n_live"),
            F.min("event_id").alias("min_ord"),
            F.max("event_id").alias("max_ord"),
        )
        .orderBy("seg")
    )


SQL_ARCHIVE_RESOLVE = """
WITH head AS (SELECT CAST(MAX(event_id) + 1 AS BIGINT) AS m FROM events),
t AS (
  SELECT CAST(event_id AS BIGINT) AS event_id,
         CAST((head.m * 3) // 5 AS BIGINT) AS retain,
         CAST((head.m * 11) // 20 AS BIGINT) AS live_from,
         CAST(head.m // 2 AS BIGINT) AS resume
  FROM events, head),
cold0 AS (
  SELECT *, CAST(event_id // 100 AS BIGINT) AS seg
  FROM t WHERE event_id < retain),
fetched AS (
  SELECT seg FROM cold0 GROUP BY seg HAVING MAX(event_id) > MAX(resume)),
cold AS (
  SELECT c.*, 'cold' AS arm FROM cold0 c JOIN fetched f ON c.seg = f.seg),
live AS (
  SELECT *, CAST(event_id // 100 AS BIGINT) AS seg, 'live' AS arm
  FROM t WHERE event_id >= live_from),
resolved AS (
  SELECT * FROM cold UNION ALL SELECT * FROM live)
SELECT seg,
       COUNT(DISTINCT event_id) AS n_events,
       CAST(SUM(CASE WHEN arm = 'cold' THEN 1 ELSE 0 END) AS BIGINT) AS n_cold,
       CAST(SUM(CASE WHEN arm = 'live' THEN 1 ELSE 0 END) AS BIGINT) AS n_live,
       MIN(event_id) AS min_ord,
       MAX(event_id) AS max_ord
FROM resolved WHERE event_id > resume
GROUP BY seg ORDER BY seg
"""


QUERIES = {
    "timeline_merge": q_timeline_merge,
    "flat_message_roundtrip": q_flat_message_roundtrip,
    "pk_change_split": q_pk_change_split,
    "empty_txn_suppress": q_empty_txn_suppress,
    "start_position_resolve": q_start_position_resolve,
    "unsigned_promotion": q_unsigned_promotion,
    "mor_scan": q_mor_scan,
    "pos_delete_scan": q_pos_delete_scan,
    "incremental_diff": q_incremental_diff,
    "cdf_read": q_cdf_read,
    "archive_resolve": q_archive_resolve,
}

ORACLES = {
    "timeline_merge": SQL_TIMELINE_MERGE,
    "flat_message_roundtrip": SQL_FLAT_MESSAGE,
    "pk_change_split": SQL_PK_CHANGE_SPLIT,
    "empty_txn_suppress": SQL_EMPTY_TXN_SUPPRESS,
    "start_position_resolve": SQL_START_POSITION,
    "unsigned_promotion": SQL_UNSIGNED_PROMOTION,
    "mor_scan": SQL_MOR_SCAN,
    "pos_delete_scan": SQL_POS_DELETE_SCAN,
    "incremental_diff": SQL_INCREMENTAL_DIFF,
    "cdf_read": SQL_CDF_READ,
    "archive_resolve": SQL_ARCHIVE_RESOLVE,
}
