"""Multimodal columns: opaque binary payloads + typed metadata.

The engine treats image/audio/video as `binary` columns riding next to
the token data (the reference ships opaque bytes the same way —
Column values BLOB-typed, byte-exact via ISO-8859-1,
parse/.../dbsync/LogEventConvert.java:797-806).  Real codec work
(JPEG decode, resampling) is STUBBED — the sandbox has no image/audio
libraries — behind `decode_image_real`, which raises
NotImplementedError; the deterministic fake header parse below keeps
the Spark-side plumbing (binary schema, Arrow batch transfer,
mapInPandas signature, partition layout) real and testable.

Scale notes: payloads stay packed in Arrow buffers end-to-end
(binary column -> pandas bytes objects per batch); metadata extraction
is one mapInPandas pass, no shuffle; frame sampling is a JVM-side
posexplode with a modulo filter, so the exploded stream prunes before
any exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from canal_spark.operators.common import load

MEDIA_SCHEMA = "doc_id bigint, media_type string, n_bytes long, width int, height int, checksum long"


def decode_image_real(payload: bytes) -> dict:
    """Real image decode — requires PIL/libjpeg, absent in this
    environment.  The deterministic fake in `_decode_batch` stands in;
    swap this in when a codec library is available."""
    raise NotImplementedError(
        "image decoding requires an image library (e.g. Pillow); "
        "this sandbox build uses the deterministic header-parse fake"
    )


def with_payload(df: DataFrame) -> DataFrame:
    """Attach the opaque binary column: UTF-8 bytes of `text` playing
    the role of an encoded media blob (deterministic, schema-true)."""
    return df.withColumn("payload", F.encode("text", "UTF-8")).withColumn(
        "media_type", F.lit("image/fake")
    )


def _byte_val(col: str, i: int):
    """Value of 1-based byte ``i`` of a binary column, 0 past the end —
    pure JVM (substring on binary -> hex -> base-16 parse)."""
    return F.coalesce(
        F.conv(F.hex(F.expr(f"substring({col}, {i}, 1)")), 16, 10).cast("int"),
        F.lit(0),
    )


def q_media_meta_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media metadata, entirely JVM-side: `n_bytes` is `length(payload)`,
    the fake 2-byte header parse is substring/hex arithmetic, and the
    checksum is the 60-bit md5 (`F.md5` accepts binary) — zero Python in
    the hot path, whole-stage codegen end to end.  A REAL codec (JPEG
    dims etc.) cannot be expressed in JVM exprs; that path goes through
    :func:`decode_media`, the mapInPandas plug-point with this exact
    output schema."""
    docs = with_payload(load(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        "media_type",
        F.length("payload").cast("long").alias("n_bytes"),
        (_byte_val("payload", 1) + 128).alias("width"),
        (_byte_val("payload", 2) + 128).alias("height"),
        F.conv(F.substring(F.md5("payload"), 1, 15), 16, 10)
        .cast("long")
        .alias("checksum"),
    )


def decode_media(df: DataFrame, decode_batch=None, schema: str = MEDIA_SCHEMA) -> DataFrame:
    """Codec plug-point: one Arrow-batched mapInPandas pass with the
    canonical (doc_id, media_type, payload) -> MEDIA_SCHEMA signature.
    ``decode_batch`` is an iterator-of-pandas-DataFrames transform; the
    default fake parses the 2-byte header with pandas' vectorized str
    accessor on the bytes objects (no Python lambda per row) so the
    plug-point itself demonstrates the batch-vectorized shape a real
    decoder (PIL/libjpeg via numpy frombuffer) should use."""
    import numpy as np
    import pandas as pd

    def _fake_decode(batches):
        import hashlib

        for pdf in batches:
            p = pdf["payload"]
            nb = p.str.len().fillna(0).astype("int64")
            b0 = p.str[0:1].map(lambda b: b[0] if b else 0).astype("int32")
            b1 = p.str[1:2].map(lambda b: b[0] if b else 0).astype("int32")
            ck = np.fromiter(
                (int(hashlib.md5(b).hexdigest()[:15], 16) for b in p),
                dtype=np.int64,
                count=len(p),
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": nb,
                    "width": b0 + 128,
                    "height": b1 + 128,
                    "checksum": ck,
                }
            )

    return df.select("doc_id", "media_type", "payload").mapInPandas(
        decode_batch or _fake_decode, schema
    )


# DuckDB replays the fake decode on the text bytes directly (the fixture
# text is ASCII, so byte values == code points)
SQL_MEDIA_META = """
SELECT doc_id, 'image/fake' AS media_type,
       octet_length(encode(text))::BIGINT AS n_bytes,
       (ascii(substr(text,1,1)) + 128)::INT AS width,
       (ascii(substr(text,2,1)) + 128)::INT AS height,
       CAST(('0x'||substr(md5(text),1,15)) AS BIGINT) AS checksum
FROM documents
"""


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: a 'video' is the word sequence of a document;
    keep every 10th frame with its index.  posexplode + modulo filter —
    the filter runs before any shuffle, so at scale only 10% of frames
    leave the scan stage."""
    docs = load(spark, sf_dir, "documents")
    frames = docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("frame_idx", "frame"),
    )
    return frames.where(F.col("frame_idx") % 10 == 0).select(
        "doc_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.length("frame").cast("long").alias("frame_bytes"),
    )


SQL_FRAME_SAMPLE = """
SELECT doc_id, CAST(u.idx - 1 AS BIGINT) AS frame_idx,
       CAST(length(u.frame) AS BIGINT) AS frame_bytes
FROM documents,
     LATERAL (SELECT unnest(string_split(text, ' ')) AS frame,
                     generate_subscripts(string_split(text, ' '), 1) AS idx) u
WHERE (u.idx - 1) % 10 = 0
"""


QUERIES = {
    "media_meta_extract": q_media_meta_extract,
    "frame_sample": q_frame_sample,
}

ORACLES = {
    "media_meta_extract": SQL_MEDIA_META,
    "frame_sample": SQL_FRAME_SAMPLE,
}
