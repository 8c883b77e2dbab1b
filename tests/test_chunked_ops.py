"""Two-phase chunked sequence ops (operators/common.py): exactness vs
the single-partition window they replace, including null order keys —
nulls sort first (matching window nulls-first order) and must never be
silently dropped by the offset join."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from canal_spark.operators.common import chunked_cumsum, chunked_row_number


def test_chunked_cumsum_matches_window(spark):
    df = spark.range(1000).select(
        (F.col("id") * 7 % 997).alias("k"), F.lit(1).alias("v")
    ).distinct()
    got = {
        r["k"]: r["cs"]
        for r in chunked_cumsum(df, "k", "v", "cs", chunk_width=100).collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r["k"]: r["cs"]
        for r in df.withColumn("cs", F.sum("v").over(w)).collect()
    }
    assert got == want


def test_chunked_row_number_with_null_chunk_keeps_rows_first(spark):
    """A null ts -> to_date null chunk: rows survive (null-safe join)
    and take the FIRST sequence positions (window nulls-first order)."""
    import datetime as dt

    rows = [(None, "a"), (dt.datetime(2026, 1, 2, 5), "b"),
            (dt.datetime(2026, 1, 1, 9), "c"), (None, "d"),
            (dt.datetime(2026, 1, 2, 7), "e")]
    df = spark.createDataFrame(rows, "ts timestamp, id string")
    out = chunked_row_number(
        df, ["ts", "id"], F.to_date("ts"), "seq"
    ).collect()
    assert len(out) == 5  # nothing dropped
    by_id = {r["id"]: r["seq"] for r in out}
    # same as the exact single-partition window (nulls first)
    w = Window.orderBy("ts", "id")
    want = {
        r["id"]: r["seq"]
        for r in df.withColumn("seq", F.row_number().over(w).cast("long")).collect()
    }
    assert by_id == want
    assert {by_id["a"], by_id["d"]} == {1, 2}


def test_sequence_pack_invariants_and_plan_shape(spark):
    """Packing layout over the fixture corpus: offsets are contiguous
    in doc_id order (stream concatenation), chunk spans follow from
    integer division, straddling docs report n_chunks >= 2, and the
    physical plan has NO single-partition window (the global cumsum is
    the two-phase chunked kernel)."""
    import contextlib
    import io

    from canal_spark.operators.text import SEQ_LEN, q_sequence_pack

    df = q_sequence_pack(spark, "/root/testdata/sf0.001")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "No Partition Defined" not in plan  # the 1-task window smell
    rows = sorted((r["doc_id"], r) for r in df.collect())
    off = 0
    saw_straddle = False
    for _, r in rows:
        assert r["start_off"] == off  # contiguous stream
        end = off + r["n_tok"]
        assert r["first_chunk"] == off // SEQ_LEN
        assert r["last_chunk"] == (end - 1) // SEQ_LEN
        assert r["n_chunks"] == r["last_chunk"] - r["first_chunk"] + 1
        saw_straddle = saw_straddle or r["n_chunks"] >= 2
        off = end
    assert off > SEQ_LEN  # corpus spans multiple chunks
    assert saw_straddle  # at least one doc crosses a boundary


def test_pack_materialize_reassembles_the_exact_token_stream(spark):
    """Packed chunks ARE the corpus: all chunks full except the last,
    ids dense from 0, and the chunk-order concatenation equals the
    doc_id-order concatenation of every doc's tokens."""
    from canal_spark.operators.text import SEQ_LEN, pack_chunks

    sf = "/root/testdata/sf0.001"
    rows = sorted(
        (r["chunk_id"], r["n_tok"], list(r["tokens"]))
        for r in pack_chunks(spark, sf).collect()
    )
    assert [c for c, _, _ in rows] == list(range(len(rows)))
    assert all(n == SEQ_LEN for _, n, _ in rows[:-1])
    assert all(n == len(t) for _, n, t in rows)
    got_stream = [tok for _, _, t in rows for tok in t]

    import hashlib

    def tok(w):
        return int(hashlib.md5(w.encode()).hexdigest()[:15], 16) % 50257

    docs = spark.read.parquet(f"{sf}/documents.parquet").collect()
    want_stream = [
        tok(w)
        for r in sorted(docs, key=lambda r: r["doc_id"])
        for w in r["text"].split(" ")
    ]
    assert got_stream == want_stream
