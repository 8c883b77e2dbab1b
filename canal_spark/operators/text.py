"""Text-analysis operators: language-ID heuristic, quality scoring,
token counting — the per-document scoring stages of a training-data
pipeline, all pure JVM column expressions (no UDFs)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from canal_spark.operators.common import load

# marker lexicons for the n-gram/stopword language heuristic
LEX = {
    "en": ("the", "a", "small", "big"),
    "db": ("table", "row", "column", "query", "join"),
    "stream": ("stream", "batch", "window", "spark"),
}
STOPWORDS = ("the", "a")


def _lex_count(group: str):
    words = ", ".join(f"'{w}'" for w in LEX[group])
    return F.expr(f"size(filter(split(text, ' '), w -> w in ({words})))")


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-lexicon language/domain ID with deterministic tie-break
    (en > db > stream on equal scores)."""
    docs = load(spark, sf_dir, "documents")
    c_en, c_db, c_st = _lex_count("en"), _lex_count("db"), _lex_count("stream")
    pred = (
        F.when((c_en >= c_db) & (c_en >= c_st), F.lit("en"))
        .when(c_db >= c_st, F.lit("db"))
        .otherwise(F.lit("stream"))
    )
    return docs.select(
        "doc_id",
        pred.alias("pred_lang"),
        c_en.cast("long").alias("score_en"),
        c_db.cast("long").alias("score_db"),
        c_st.cast("long").alias("score_stream"),
    )


def _duck_lex(group: str) -> str:
    words = ", ".join(f"'{w}'" for w in LEX[group])
    return f"len(list_filter(string_split(text, ' '), w -> w IN ({words})))"


SQL_LANG_ID = f"""
SELECT doc_id,
       CASE WHEN {_duck_lex('en')} >= {_duck_lex('db')}
             AND {_duck_lex('en')} >= {_duck_lex('stream')} THEN 'en'
            WHEN {_duck_lex('db')} >= {_duck_lex('stream')} THEN 'db'
            ELSE 'stream' END AS pred_lang,
       CAST({_duck_lex('en')} AS BIGINT) AS score_en,
       CAST({_duck_lex('db')} AS BIGINT) AS score_db,
       CAST({_duck_lex('stream')} AS BIGINT) AS score_stream
FROM documents
"""


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length / stopword-ratio / word-length quality score, emitted as
    integer-scaled values (permille / centi) so cross-engine float
    round-half behavior can never flip a digit: every output is
    ``floor`` of an exact-integer division, which IEEE doubles compute
    identically everywhere (exact when integral, >=1/q away from the
    floor boundary otherwise)."""
    docs = load(spark, sf_dir, "documents")
    wc = F.size(F.split("text", " ")).cast("long")
    stop = F.expr(
        f"size(filter(split(text, ' '), w -> w in "
        f"({', '.join(repr(w) for w in STOPWORDS)})))"
    ).cast("long")
    chars_in_words = F.col("n_chars") - (wc - 1)  # total chars minus separators
    stop_pm = F.floor(stop * 1000 / wc)
    awl_centi = F.floor(chars_in_words * 100 / wc)
    quality_m = (
        F.least(wc, F.lit(100)) * 4
        + F.floor((wc - stop) * 400 / wc)
        + F.least(F.floor(chars_in_words * 25 / wc), F.lit(200))
    )
    return docs.select(
        "doc_id",
        wc.alias("n_words"),
        stop_pm.cast("long").alias("stopword_permille"),
        awl_centi.cast("long").alias("avg_word_len_centi"),
        quality_m.cast("long").alias("quality_milli"),
    )


SQL_QUALITY_SCORE = """
WITH q AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS wc,
         CAST(len(list_filter(string_split(text, ' '), w -> w IN ('the', 'a'))) AS BIGINT) AS stop,
         n_chars - (len(string_split(text, ' ')) - 1) AS ciw
  FROM documents)
SELECT doc_id,
       wc AS n_words,
       CAST(floor(stop * 1000 / wc) AS BIGINT) AS stopword_permille,
       CAST(floor(ciw * 100 / wc) AS BIGINT) AS avg_word_len_centi,
       CAST(least(wc, 100) * 4
            + floor((wc - stop) * 400 / wc)
            + least(floor(ciw * 25 / wc), 200) AS BIGINT) AS quality_milli
FROM q
"""


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token count + a BPE-ish estimate (chars/4, standard
    subword heuristic) and the conservative max of both."""
    docs = load(spark, sf_dir, "documents")
    ws = F.size(F.split("text", " ")).cast("long")
    bpe = F.ceil(F.col("n_chars") / 4.0).cast("long")
    return docs.select(
        "doc_id",
        ws.alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
        F.greatest(ws, bpe).alias("est_tokens"),
    )


SQL_TOKEN_COUNT = """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
       CAST(ceil(n_chars / 4.0) AS BIGINT) AS bpe_tokens,
       greatest(CAST(len(string_split(text, ' ')) AS BIGINT),
                CAST(ceil(n_chars / 4.0) AS BIGINT)) AS est_tokens
FROM documents
"""


QUERIES = {
    "lang_id": q_lang_id,
    "quality_score": q_quality_score,
    "token_count": q_token_count,
}

ORACLES = {
    "lang_id": SQL_LANG_ID,
    "quality_score": SQL_QUALITY_SCORE,
    "token_count": SQL_TOKEN_COUNT,
}
