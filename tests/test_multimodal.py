"""Multimodal plumbing: binary payload schema, mapInPandas batch shape,
stubbed real decoder (SURVEY.md §2.11 — the engine's UDF surface)."""

import pytest


def test_decode_real_is_stubbed():
    from canal_spark.operators.multimodal import decode_image_real

    with pytest.raises(NotImplementedError):
        decode_image_real(b"\xff\xd8\xff")


def test_media_meta_schema_and_values(spark):
    from canal_spark.operators.multimodal import q_media_meta_extract

    df = q_media_meta_extract(spark, "/root/testdata/sf0.001")
    types = dict(df.dtypes)
    assert types == {
        "doc_id": "bigint",
        "media_type": "string",
        "n_bytes": "bigint",
        "width": "int",
        "height": "int",
        "checksum": "bigint",
    }
    rows = df.limit(50).collect()
    assert rows
    for r in rows:
        assert r["n_bytes"] > 0
        assert 128 <= r["width"] <= 255 + 128
        assert r["checksum"] > 0


def test_payload_is_byte_exact(spark):
    """The binary column must round-trip byte-exact (BLOB semantics,
    LogEventConvert.java:797-806)."""
    from pyspark.sql import functions as F

    from canal_spark.operators.common import load
    from canal_spark.operators.multimodal import with_payload

    docs = with_payload(load(spark, "/root/testdata/sf0.001", "documents"))
    bad = docs.where(F.decode("payload", "UTF-8") != F.col("text")).count()
    assert bad == 0


def test_decode_media_plug_point_matches_jvm_path(spark):
    """The mapInPandas codec plug-point (default fake decode) must agree
    exactly with the vectorized JVM metadata path — a real codec swaps
    in with the same signature and inherits tested plumbing."""
    from canal_spark.operators.multimodal import (
        decode_media,
        q_media_meta_extract,
        with_payload,
    )
    from canal_spark.operators.common import load

    sf = "/root/testdata/sf0.001"
    jvm = {r["doc_id"]: r.asDict() for r in q_media_meta_extract(spark, sf).collect()}
    docs = with_payload(load(spark, sf, "documents"))
    plug = {r["doc_id"]: r.asDict() for r in decode_media(docs).collect()}
    assert plug == jvm
