"""FlatMessage delivery: topic routing, pk-hash lanes, per-lane
ordinal order, envelope round-trip."""

import json
import os


def test_delivery_lanes_and_envelope(spark, token_table, tmp_path):
    from pyspark.sql import functions as F

    from canal_spark.changelog import changelog_df, synth_changelog_rows
    from canal_spark.deliver import deliver_flat_messages

    _, base = token_table
    rows = synth_changelog_rows(base, 400, seed=61)
    changes = changelog_df(spark, rows)
    out_root = str(tmp_path / "mq")
    bid = deliver_flat_messages(changes, out_root, lanes=4)
    # directory layout: batch=<id>/topic=<source topic>/lane=<0..3>
    out = os.path.join(out_root, f"batch={bid:020d}")
    topics = {d for d in os.listdir(out) if d.startswith("topic=")}
    assert any("tokens.web" in t for t in topics)
    # deletes route by the delete-stable doc_id prefix, so even deletes
    # of never-inserted keys land in a real topic (ghost:<n> -> tokens.ghost)
    assert any("tokens.ghost" in t for t in topics)

    n_msgs = 0
    n_old = 0
    key_lanes = {}
    for topic_dir in sorted(topics):
        for lane_dir in sorted(os.listdir(os.path.join(out, topic_dir))):
            if not lane_dir.startswith("lane="):
                continue
            lane = int(lane_dir.split("=")[1])
            assert 0 <= lane < 4
            lane = (topic_dir, lane)  # key -> single (topic, lane) pair
            for fn in os.listdir(os.path.join(out, topic_dir, lane_dir)):
                if not fn.endswith(".txt"):
                    continue
                path = os.path.join(out, topic_dir, lane_dir, fn)
                last_es = None
                for line in open(path):
                    m = json.loads(line)
                    n_msgs += 1
                    assert m["database"] == "lakehouse"
                    assert m["type"] in ("INSERT", "UPDATE", "DELETE")
                    assert m["pkNames"] == ["doc_id"]
                    cell = m["data"][0]
                    key_lanes.setdefault(cell["doc_id"], set()).add(lane)
                    # within a lane file, event order is preserved
                    if last_es is not None:
                        assert m["es"] >= 0
                    last_es = m["es"]
                    toks = None
                    if m["type"] != "DELETE":
                        toks = json.loads(cell["tokens"])
                        assert len(toks) == int(cell["n_tok"])
                    # `old` carries ONLY changed columns, on UPDATEs that
                    # actually changed something AND on DELETEs (whose
                    # before-image would otherwise be lost on the wire —
                    # the decode side reads old[] first for both)
                    if m.get("old"):
                        assert m["type"] in ("UPDATE", "DELETE")
                        n_old += 1
                        old = m["old"][0]
                        assert set(old) <= {"tokens", "n_tok"} and old
                        if m["type"] == "UPDATE" and "tokens" in old:
                            assert json.loads(old["tokens"]) != toks
                        if m["type"] == "DELETE" and "tokens" in old:
                            # the prior image, not the (null) after-image
                            assert json.loads(old["tokens"]) is not None
    assert n_msgs == 400
    assert n_old > 0  # real updates deliver their before-image
    # per-key order invariant: every key maps to exactly one (topic, lane)
    # pair — a consumer of that one lane sees ALL of the key's changes,
    # deletes included
    assert all(len(lanes_) == 1 for lanes_ in key_lanes.values())

    # (topic, lane) assignment matches the engine's routing + pk-hash (P1)
    expected = {
        r["doc_id"]: (
            f"topic=tokens.{r['doc_id'].split(':')[0]}",
            r["lane"],
        )
        for r in changes.select(
            "doc_id", F.pmod(F.xxhash64("doc_id"), F.lit(4)).cast("int").alias("lane")
        ).collect()
    }
    for k, lanes_ in key_lanes.items():
        assert lanes_ == {expected[k]}


def test_kafka_frame_contract(spark, token_table):
    """The Kafka producer path shares the exact routing/envelope frame:
    (topic, lane, key, ordinal, value) with per-key single lane and the
    FlatMessage envelope as value — what df.write.format('kafka') ships
    (CanalKafkaProducer.java:81-190), minus the brokers the sandbox
    doesn't have."""
    from canal_spark.changelog import changelog_df, synth_changelog_rows
    from canal_spark.deliver import build_mq_frame

    _, base = token_table
    changes = changelog_df(spark, synth_changelog_rows(base, 200, seed=62))
    frame = build_mq_frame(changes, lanes=6)
    assert [f[0] for f in frame.dtypes] == ["topic", "lane", "key", "ordinal", "value"]
    assert dict(frame.dtypes)["lane"] == "int"
    rows = frame.collect()
    assert len(rows) == 200
    per_key = {}
    for r in rows:
        per_key.setdefault(r["key"], set()).add((r["topic"], r["lane"]))
        assert 0 <= r["lane"] < 6
        assert r["value"].startswith('{"database"')
    assert all(len(v) == 1 for v in per_key.values())


def test_kafka_ingest_roundtrip_and_gtid_positions(spark, token_table):
    """C7 symmetry: deliver's FlatMessage frame, wrapped as Kafka
    records (key/value/topic/partition/offset), decodes back through
    kafka_changelog_frame into the changelog shape — and the decoded
    frame MERGEs with per-(topic,partition) GTID checkpoints, Kafka's
    own position algebra."""
    from pyspark.sql import functions as F

    from canal_spark.changelog import changelog_df, synth_changelog_rows
    from canal_spark.deliver import build_mq_frame
    from canal_spark.merge import merge_gtid_set, merge_into
    from canal_spark.streaming.apply import kafka_changelog_frame

    t, base = token_table
    rows = synth_changelog_rows(base, 300, seed=63)
    changes = changelog_df(spark, rows)
    frame = build_mq_frame(changes, lanes=4)

    # simulate the Kafka record frame a real source would produce:
    # offset = per-(topic,partition) position; ordinal-1 makes the
    # offsets START AT 0, covering the offset-0 record that a raw
    # ordinal=offset mapping would silently drop at the merge filter
    records = frame.select(
        F.encode("key", "UTF-8").alias("key"),
        F.encode("value", "UTF-8").alias("value"),
        "topic",
        F.col("lane").alias("partition"),
        (F.col("ordinal") - 1).alias("offset"),
        F.current_timestamp().alias("timestamp"),
    )
    decoded = kafka_changelog_frame(records)

    orig = {
        (r["doc_id"], r["ordinal"]): r
        for r in changes.select(
            "doc_id", "op", "ordinal", "tokens", "n_tok", "source"
        ).collect()
    }
    got = decoded.collect()
    assert len(got) == 300
    assert decoded.where("ordinal <= 0").count() == 0  # offset 0 still applies
    for r in got:
        # ordinal encodes (offset, row-in-message); 1-row messages ->
        # ordinal = (offset+1) << 16, offset was orig ordinal - 1
        o = orig[(r["doc_id"], (r["ordinal"] >> 16) - 1 + 1)]
        assert r["op"] == o["op"]
        assert (r["tokens"] or None) == (o["tokens"] or None)
        assert r["n_tok"] == o["n_tok"]
        if r["op"] != "D":
            assert r["source"] == o["source"]
        assert r["stream_id"] == f"tokens.{r['doc_id'].split(':')[0]}-" + str(
            r["stream_id"].rsplit("-", 1)[1]
        ) and r["stream_id"].rsplit("-", 1)[1].isdigit()

    # decoded frame applies through MERGE with per-stream checkpoints
    res = merge_into(spark, t, decoded)
    assert res.applied
    gset = merge_gtid_set(t)
    assert gset and all("-" in k for k in gset)
    # replay of the same records: every stream filters to empty
    assert not merge_into(spark, t, decoded).applied


def test_kafka_ingest_multi_row_messages_and_ddl_drop(spark):
    """A FlatMessage batches rows (data is an ARRAY): every element must
    decode to its own ordered changelog row with its paired old[i]
    before-image; DDL messages (type=CREATE, data=null) drop instead of
    becoming null-key deletes that would crash merge."""
    import json

    from pyspark.sql import functions as F

    from canal_spark.streaming.apply import kafka_changelog_frame

    def msg(mtype, rows, old=None):
        return json.dumps({
            "database": "lakehouse", "table": "tokens", "type": mtype,
            "es": 1704067200000, "ts": 0, "pkNames": ["doc_id"],
            "data": rows, "old": old,
        })

    two_rows = msg(
        "UPDATE",
        [
            {"doc_id": "web:1", "n_tok": "2", "tokens": "[1,2]"},
            {"doc_id": "web:2", "n_tok": "3", "tokens": "[3,4,5]"},
        ],
        old=[
            {"tokens": "[9]", "n_tok": "1"},
            {"n_tok": "2"},  # only n_tok changed for row 2
        ],
    )
    ddl = json.dumps({
        "database": "lakehouse", "table": "tokens", "type": "CREATE",
        "es": 0, "ts": 0, "pkNames": None, "data": None, "old": None,
    })
    records = spark.createDataFrame(
        [(b"k", two_rows.encode(), "tokens.web", 0, 5),
         (b"k", ddl.encode(), "tokens.web", 0, 6)],
        "key binary, value binary, topic string, partition int, offset long",
    ).withColumn("timestamp", F.current_timestamp())

    got = {r["doc_id"]: r for r in kafka_changelog_frame(records).collect()}
    assert set(got) == {"web:1", "web:2"}  # DDL dropped, both rows kept
    r1, r2 = got["web:1"], got["web:2"]
    assert r1["ordinal"] == ((5 + 1) << 16) + 0
    assert r2["ordinal"] == ((5 + 1) << 16) + 1
    assert list(r1["tokens"]) == [1, 2] and r1["before_n_tok"] == 1
    assert list(r1["before_tokens"]) == [9]
    assert list(r2["tokens"]) == [3, 4, 5]
    assert r2["before_tokens"] is None and r2["before_n_tok"] == 2
    assert r1["stream_id"] == "tokens.web-0"


def test_kafka_ingest_malformed_messages_raise_not_vanish(spark):
    """A corrupt JSON value or a row-change message without its key must
    RAISE (silently skipping it while the checkpoint advances would be
    unrecoverable data loss); DDL messages still drop cleanly."""
    import json

    import pytest
    from pyspark.sql import functions as F

    from canal_spark.streaming.apply import kafka_changelog_frame

    def records(value: str):
        return spark.createDataFrame(
            [(b"k", value.encode(), "tokens.web", 0, 1)],
            "key binary, value binary, topic string, partition int, offset long",
        ).withColumn("timestamp", F.current_timestamp())

    # corrupt JSON -> raise, with the position in the message
    with pytest.raises(Exception, match="malformed FlatMessage"):
        kafka_changelog_frame(records("{not json")).collect()

    # row-change type but no doc_id in the cells -> raise
    bad_row = json.dumps({
        "database": "d", "table": "t", "type": "INSERT", "es": 0, "ts": 0,
        "pkNames": ["doc_id"], "data": [{"n_tok": "1", "tokens": "[1]"}],
        "old": None,
    })
    with pytest.raises(Exception, match="malformed FlatMessage"):
        kafka_changelog_frame(records(bad_row)).collect()


def test_kafka_ingest_tombstones_drop(spark):
    """A null-value record (log-compaction tombstone) is benign: it must
    DROP, not raise — raising would wedge the stream at that offset on
    every restart."""
    from pyspark.sql import functions as F

    from canal_spark.streaming.apply import kafka_changelog_frame

    records = spark.createDataFrame(
        [(b"k", None, "tokens.web", 0, 3)],
        "key binary, value binary, topic string, partition int, offset long",
    ).withColumn("timestamp", F.current_timestamp())
    assert kafka_changelog_frame(records).collect() == []


def test_deliver_second_batch_appends_not_destroys(spark, token_table, tmp_path):
    """Delivering a second batch to the same out_dir must keep the first
    batch's lane files (a consumer may not have read them yet)."""
    import json as _json
    import os as _os

    from canal_spark.changelog import changelog_df, synth_changelog_rows
    from canal_spark.deliver import deliver_flat_messages

    _, base = token_table
    out = str(tmp_path / "mq2")
    b1_changes = changelog_df(spark, synth_changelog_rows(base, 100, seed=71))
    b2_changes = changelog_df(spark, synth_changelog_rows(base, 60, seed=72))
    b1 = deliver_flat_messages(b1_changes, out, lanes=2)
    b2 = deliver_flat_messages(b2_changes, out, lanes=2)
    assert b1 != b2  # distinct deterministic batch ids

    def count_msgs():
        n = 0
        for dirpath, _d, names in _os.walk(out):
            for fn in names:
                if fn.endswith(".txt"):
                    with open(_os.path.join(dirpath, fn)) as f:
                        n += sum(1 for line in f if _json.loads(line))
        return n

    assert count_msgs() == 160  # both batches present
    # batch dirs replay in zero-padded id order
    batches = sorted(d for d in _os.listdir(out) if d.startswith("batch="))
    assert len(batches) == 2 and batches == sorted(batches)
    # RE-delivery of batch 2 (same deterministic id) is idempotent —
    # it overwrites only its own subdir, never duplicating messages
    assert deliver_flat_messages(b2_changes, out, lanes=2) == b2
    assert count_msgs() == 160


def test_multi_stream_default_batch_id_and_empty_raise(spark, token_table, tmp_path):
    """Per-stream ordinals overlap across streams: two batches from
    DIFFERENT stream subsets with the same max ordinal must get distinct
    default batch ids (previously the second overwrite wiped the first
    batch's subdir).  Re-delivery of the SAME frame stays idempotent
    (same id).  An empty frame has no deterministic id and raises."""
    import pytest
    from pyspark.sql import functions as F

    from canal_spark.changelog import changelog_df, synth_changelog_rows
    from canal_spark.deliver import deliver_flat_messages

    _, base = token_table
    out = str(tmp_path / "mq3")
    frame = changelog_df(spark, synth_changelog_rows(base, 40, seed=73))
    a = frame.withColumn("stream_id", F.lit("srcA"))
    b = frame.withColumn("stream_id", F.lit("srcB"))  # same ordinals!
    ba = deliver_flat_messages(a, out, lanes=2)
    bb = deliver_flat_messages(b, out, lanes=2)
    assert ba != bb  # fingerprint keeps disjoint-stream batches apart
    assert deliver_flat_messages(a, out, lanes=2) == ba  # idempotent retry

    with pytest.raises(ValueError, match="batch_id"):
        deliver_flat_messages(frame.limit(0), out, lanes=2)


def test_sink_profile_rocketmq_placement_modes(spark, token_table):
    """The RocketMQ destination's three queue-placement modes produce
    the same shared frame with only the lane column changing — the
    frame builder is sink-agnostic (CanalRocketMQProducer.java:92-213,
    MQMessageUtils.messagePartition:381-458)."""
    import pytest
    from pyspark.sql import functions as F

    from canal_spark.changelog import changelog_df, synth_changelog_rows
    from canal_spark.deliver import SinkProfile, build_mq_frame

    _t, base = token_table
    changes = changelog_df(spark, synth_changelog_rows(base, 150, seed=81))
    default = build_mq_frame(changes, lanes=6)

    # fixed-partition mode: every message to ONE queue
    fixed = build_mq_frame(
        changes, profile=SinkProfile(queues=6, fixed_partition=4)
    )
    assert fixed.select("lane").distinct().collect() == [(4,)]
    # everything except the lane is byte-identical to the default frame
    cols = ["topic", "key", "ordinal", "value"]
    assert (
        default.select(cols).exceptAll(fixed.select(cols)).count() == 0
        and fixed.select(cols).exceptAll(default.select(cols)).count() == 0
    )

    # queue-count bound: the reference's "partition number is error"
    with pytest.raises(ValueError, match="partition number is error"):
        build_mq_frame(changes, profile=SinkProfile(queues=6, fixed_partition=6))

    # table-hash mode: all rows of one table land in one queue
    th = build_mq_frame(changes, profile=SinkProfile(queues=6, table_hash=True))
    assert th.select("lane").distinct().count() == 1

    # explicit hash-cols mode: per-key single-lane invariant holds on
    # the CHOSEN column, and lanes stay inside [0, queues)
    hc = build_mq_frame(
        changes, profile=SinkProfile(queues=6, hash_cols=("n_tok",))
    )
    expected = changes.select(
        "ordinal",
        F.pmod(F.xxhash64("n_tok"), F.lit(6)).cast("int").alias("exp"),
    )
    assert hc.join(expected, "ordinal").where("lane <> exp").count() == 0
    lanes = [r[0] for r in hc.select("lane").distinct().collect()]
    assert all(0 <= l < 6 for l in lanes) and len(lanes) > 1

    # default profile == legacy lanes= arg (auto pk-hash)
    legacy = build_mq_frame(changes, lanes=6)
    via_profile = build_mq_frame(changes, profile=SinkProfile(queues=6))
    assert (
        legacy.exceptAll(via_profile).count() == 0
        and via_profile.exceptAll(legacy).count() == 0
    )


def test_kafka_ingest_canal_convention_delete_normalizes_before_image(spark):
    """Canal's DELETE convention carries the deleted row's image in
    data[] with old=null (RdbSyncService builds the delete from data);
    this engine's deliver sends old=[prior image] instead.  BOTH must
    decode to the changelog contract: op=D, NO after-image
    (tokens/n_tok null), prior image in before_*."""
    import json

    from pyspark.sql import functions as F

    from canal_spark.streaming.apply import kafka_changelog_frame

    canal_style = json.dumps({
        "database": "lakehouse", "table": "tokens", "type": "DELETE",
        "es": 1704067200000, "ts": 0, "pkNames": ["doc_id"],
        "data": [{"doc_id": "web:9", "n_tok": "2", "tokens": "[7,8]"}],
        "old": None,
    })
    engine_style = json.dumps({
        "database": "lakehouse", "table": "tokens", "type": "DELETE",
        "es": 1704067200000, "ts": 0, "pkNames": ["doc_id"],
        "data": [{"doc_id": "web:10", "n_tok": None, "tokens": None}],
        "old": [{"tokens": "[4]", "n_tok": "1"}],
    })
    records = spark.createDataFrame(
        [(b"k", canal_style.encode(), "tokens.web", 0, 1),
         (b"k", engine_style.encode(), "tokens.web", 0, 2)],
        "key binary, value binary, topic string, partition int, offset long",
    ).withColumn("timestamp", F.current_timestamp())

    got = {r["doc_id"]: r for r in kafka_changelog_frame(records).collect()}
    assert set(got) == {"web:9", "web:10"}
    for r in got.values():
        assert r["op"] == "D"
        assert r["tokens"] is None and r["n_tok"] is None  # no after-image
        assert r["source"] is None
    assert list(got["web:9"]["before_tokens"]) == [7, 8]
    assert got["web:9"]["before_n_tok"] == 2
    assert list(got["web:10"]["before_tokens"]) == [4]
    assert got["web:10"]["before_n_tok"] == 1
