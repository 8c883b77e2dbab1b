"""Text-analysis operators: language-ID heuristic, quality scoring,
token counting — the per-document scoring stages of a training-data
pipeline, all pure JVM column expressions (no UDFs)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from canal_spark.operators.common import (
    attach_cached_deps,
    chunked_row_number,
    duck_md5int,
    load,
    md5int,
)

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


def q_sample_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling — the data-mixing step of a
    training pipeline: each source stratum keeps a configured fraction
    of its docs, selected by a stable content hash (md5int(doc_id) mod
    10000 < rate), so the sample is reproducible across runs/engines
    and needs no shuffle beyond the final per-source rollup.  Rates
    here: 'high' sources (src1X) keep 50%, 'low' (src0-4) keep 10%,
    the rest 25% — the same routing buckets as topic_routing."""
    docs = load(spark, sf_dir, "documents")
    rate = (
        F.when(F.col("source").rlike("^src1[0-9]$"), F.lit(5000))
        .when(F.col("source").rlike("^src[0-4]$"), F.lit(1000))
        .otherwise(F.lit(2500))
    )
    keep = F.pmod(md5int(F.col("doc_id").cast("string")), F.lit(10000)) < rate
    return (
        docs.select("source", keep.cast("int").alias("kept"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_total"),
            F.sum("kept").cast("long").alias("n_kept"),
        )
    )


SQL_SAMPLE_MIX = f"""
SELECT source,
       count(*) AS n_total,
       CAST(sum(CASE WHEN {duck_md5int("CAST(doc_id AS VARCHAR)")} % 10000 <
                (CASE WHEN regexp_matches(source, '^src1[0-9]$') THEN 5000
                      WHEN regexp_matches(source, '^src[0-4]$')  THEN 1000
                      ELSE 2500 END)
            THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM documents GROUP BY source
"""


def q_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source data-QA profile: counts, language cardinality, and
    exact length quantiles (median/p90 with linear interpolation — both
    engines compute the same continuous quantile).  The profiling sweep
    a pipeline runs before/after each processing stage; one partial-agg
    shuffle per stratum."""
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.min("n_chars").cast("long").alias("min_chars"),
        F.max("n_chars").cast("long").alias("max_chars"),
        F.round(F.expr("percentile(n_chars, 0.5)"), 4).alias("p50_chars"),
        F.round(F.expr("percentile(n_chars, 0.9)"), 4).alias("p90_chars"),
    )


SQL_COLUMN_PROFILE = """
SELECT source,
       count(*) AS n_docs,
       count(DISTINCT lang) AS n_langs,
       CAST(min(n_chars) AS BIGINT) AS min_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars,
       round(quantile_cont(n_chars, 0.5), 4) AS p50_chars,
       round(quantile_cont(n_chars, 0.9), 4) AS p90_chars
FROM documents GROUP BY source
"""


def q_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter: per doc, the fraction of 3-gram
    occurrences taken by the single most frequent 3-gram — boilerplate
    and template spam score near 1000 permille, natural text low.
    Integer permille ((1000*top) DIV total) keeps the score exact
    across engines.  Shuffle shape: shingle explode (map-side) ->
    (doc, gram) partial count -> per-doc max/sum — two partial-agg
    shuffles keyed by doc, never a self-join."""
    docs = load(spark, sf_dir, "documents", spread=True)
    grams = (
        docs.select("doc_id", F.split("text", " ").alias("ws"))
        .where(F.size("ws") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ws) - 2),"
                    " i -> concat_ws(' ', slice(ws, i, 3)))"
                )
            ).alias("g"),
        )
    )
    per_gram = grams.groupBy("doc_id", "g").agg(F.count("*").alias("c"))
    return per_gram.groupBy("doc_id").agg(
        F.sum("c").alias("n_grams"),
        F.max("c").alias("top_gram_count"),
        F.expr("CAST((1000 * max(c)) DIV sum(c) AS BIGINT)").alias("rep_permille"),
    )


SQL_REPETITION = """
WITH g AS (
  SELECT doc_id, array_to_string(ws[i:i+2], ' ') AS g
  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 2)) AS i
        FROM (SELECT doc_id, string_split(text, ' ') AS ws
              FROM documents WHERE len(string_split(text, ' ')) >= 3))),
pg AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY doc_id, g)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_grams,
       CAST(max(c) AS BIGINT) AS top_gram_count,
       CAST((1000 * max(c)) // sum(c) AS BIGINT) AS rep_permille
FROM pg GROUP BY doc_id
"""


SEQ_LEN = 2048  # packed training-sequence length (tokens per chunk)
PACK_CHUNK = 4096  # doc_ids per two-phase-cumsum chunk (see chunked_cumsum)


def q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing layout: concatenate the corpus in
    doc_id order into one token stream and cut it into fixed SEQ_LEN
    training chunks; emit per doc its stream offset and the first/last
    chunk it lands in (n_chunks > 1 = the doc straddles a boundary).
    This is the packing manifest a pretraining dataloader consumes —
    deciding which docs each training sequence pulls from without
    materializing the packed sequences.

    Scale shape: the global running token offset is the two-phase
    chunked cumsum (`operators.common.chunked_cumsum` — per-chunk
    window + driver-side prefix of O(n/PACK_CHUNK) totals), never a
    single-partition global window; everything after is map-side
    integer arithmetic.  Chunk ids use integer DIV, exact at any
    stream length (a double division would lose exactness past 2^53
    total tokens — a 10^12-sequence corpus crosses that)."""
    docs = load(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tok")
    )
    from canal_spark.operators.common import chunked_cumsum

    c = chunked_cumsum(d, "doc_id", "n_tok", "cum_end", PACK_CHUNK)
    return c.withColumn("start_off", F.col("cum_end") - F.col("n_tok")).selectExpr(
        "doc_id",
        "n_tok",
        "start_off",
        f"CAST(start_off DIV {SEQ_LEN} AS BIGINT) AS first_chunk",
        f"CAST((cum_end - 1) DIV {SEQ_LEN} AS BIGINT) AS last_chunk",
        f"CAST((cum_end - 1) DIV {SEQ_LEN}"
        f" - start_off DIV {SEQ_LEN} + 1 AS BIGINT) AS n_chunks",
    )


SQL_SEQUENCE_PACK = f"""
WITH d AS (SELECT doc_id,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
           FROM documents),
c AS (SELECT doc_id, n_tok,
             CAST(sum(n_tok) OVER (ORDER BY doc_id) AS BIGINT) AS cum_end
      FROM d)
SELECT doc_id, n_tok,
       cum_end - n_tok AS start_off,
       (cum_end - n_tok) // {SEQ_LEN} AS first_chunk,
       (cum_end - 1) // {SEQ_LEN} AS last_chunk,
       (cum_end - 1) // {SEQ_LEN} - (cum_end - n_tok) // {SEQ_LEN} + 1 AS n_chunks
FROM c
"""


TOP_WORDS = 25


def q_word_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary head: the TOP_WORDS most frequent whitespace
    tokens — the frequency sweep behind stopword lists, vocab builds,
    and boilerplate detection.  Deterministic total order (count desc,
    word asc) so the top-k set is engine-independent.

    Scale shape: explode is map-side, the count is one partial-agg
    shuffle keyed by word (hot words collapse in the map-side combine),
    and orderBy().limit() compiles to TakeOrderedAndProject — per-
    partition top-k then a driver merge of O(partitions × k) rows,
    never a global sort."""
    docs = load(spark, sf_dir, "documents", spread=True)
    words = docs.select(F.explode(F.split("text", " ")).alias("w"))
    return (
        words.groupBy("w")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("w"))
        .limit(TOP_WORDS)
    )


SQL_WORD_TOPK = f"""
SELECT w, CAST(count(*) AS BIGINT) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
GROUP BY w ORDER BY n DESC, w ASC LIMIT {TOP_WORDS}
"""


# --- out-of-vocabulary rate --------------------------------------------------


VOCAB_K = 16  # fixture corpus has 31 distinct words; 16 leaves a real OOV tail


def q_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document out-of-vocabulary rate against the corpus's own
    top-``VOCAB_K`` vocabulary — the tokenizer-coverage diagnostic run
    before committing to a vocab size (docs with a high OOV rate
    fragment into byte-fallback tokens and train poorly).

    Scale shape: two corpus passes, which is the honest cost — pass 1
    builds the vocabulary (partial-agg word count + per-partition
    top-k via TakeOrderedAndProject, O(partitions × k) at the driver),
    pass 2 re-explodes and LEFT-joins each word against the
    driver-bounded vocab as a broadcast (a 50k-word production vocab
    is a few MB — always broadcastable), then one partial-agg rollup
    per doc.  No corpus-scale frame is ever collected or shuffled on
    anything but doc_id."""
    docs = load(spark, sf_dir, "documents", spread=True)
    words = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    vocab = (
        words.groupBy("w")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("w"))
        .limit(VOCAB_K)
        .select("w", F.lit(1).alias("_inv"))
    )
    flagged = words.join(F.broadcast(vocab), "w", "left")
    oov = F.when(F.col("_inv").isNull(), 1).otherwise(0)
    return flagged.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_words"),
        F.sum(oov).cast("long").alias("n_oov"),
        F.round(F.sum(oov) / F.count("*"), 6).alias("oov_rate"),
    )


SQL_OOV_RATE = f"""
WITH words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
               FROM documents),
vocab AS (SELECT w FROM (SELECT w, count(*) AS n FROM words
                         GROUP BY w ORDER BY n DESC, w ASC LIMIT {VOCAB_K})),
f AS (SELECT doc_id, CASE WHEN v.w IS NULL THEN 1 ELSE 0 END AS oov
      FROM words LEFT JOIN vocab v ON words.w = v.w)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(oov) AS BIGINT) AS n_oov,
       round(CAST(sum(oov) AS DOUBLE) / count(*), 6) AS oov_rate
FROM f GROUP BY doc_id
"""


# --- tf-idf keyword extraction -----------------------------------------------


TFIDF_TOPK = 3


def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-``TFIDF_TOPK`` keywords by tf-idf — the topic /
    boilerplate signal extraction stage of a curation pipeline.  The
    idf is the log-free rational variant ``(N * 1000) DIV df`` (exact
    integer both engines — same reason bigram_lm_score is integer
    math: a transcendental ln may differ in the last ulp between the
    JVM and DuckDB and break value-hash parity; the RANKING it induces
    is the classic idf ranking).

    Scale shape: tf is one (doc, word)-keyed partial-agg shuffle over
    the exploded corpus; df derives from the PERSISTED tf frame (one
    row per distinct doc-word — already corpus-compressed) and is
    dictionary-sized, so it broadcasts into the score join; the top-k
    is a doc-partitioned window (parallel over docs, never global).
    N is one O(1) driver scalar."""
    docs = load(spark, sf_dir, "documents", spread=True)
    n_docs = docs.count()
    words = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    tf = words.groupBy("doc_id", "w").agg(F.count("*").alias("tf")).persist()
    df_dict = tf.groupBy("w").agg(F.count("*").alias("df"))
    from pyspark.sql import Window

    scored = tf.join(F.broadcast(df_dict), "w").select(
        "doc_id",
        F.col("w").alias("term"),
        (F.col("tf") * F.expr(f"({n_docs}L * 1000) DIV df"))
        .cast("long")
        .alias("score"),
    )
    w_doc = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("term")
    )
    out = (
        scored.withColumn("rank", F.row_number().over(w_doc))
        .where(F.col("rank") <= TFIDF_TOPK)
        .select("doc_id", "term", "score", F.col("rank").cast("int"))
    )
    return attach_cached_deps(out, [tf])


SQL_TFIDF_TOPK = f"""
WITH words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
               FROM documents),
tf AS (SELECT doc_id, w, count(*) AS tf FROM words GROUP BY doc_id, w),
df AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
n AS (SELECT count(*) AS n FROM documents),
s AS (SELECT tf.doc_id, tf.w AS term,
             CAST(tf.tf * ((n.n * 1000) // df.df) AS BIGINT) AS score
      FROM tf JOIN df ON tf.w = df.w CROSS JOIN n),
r AS (SELECT doc_id, term, score,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, term ASC) AS rn
      FROM s)
SELECT doc_id, term, score, CAST(rn AS INTEGER) AS rank
FROM r WHERE rn <= {TFIDF_TOPK}
"""


# --- deterministic epoch shuffle ---------------------------------------------


EPOCH_SEED = 7
SHUFFLE_CHUNKS = 1024
_KEY_SPACE = 1 << 60  # md5int range (15 hex digits)
N_SHARDS = 8


def q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic seeded global shuffle order for one training
    epoch: every doc gets a pseudo-random 60-bit key from
    md5(doc_id # seed), the corpus is totally ordered by it, and the
    resulting position assigns the doc to a data-parallel reader shard
    (pos % N_SHARDS).  Reproducible across engines and re-runs —
    change the seed, get an independent permutation for the next epoch.

    Scale shape: the permutation rank is the two-phase
    `chunked_row_number` — the hash key is uniform over its 60-bit
    domain, so equal-width key ranges are balanced chunks (rank within
    chunk in parallel windows, driver-side prefix over O(SHUFFLE_CHUNKS)
    totals).  No single-partition window, no global sort: a training
    dataloader consumes (shard, epoch_pos) ranges, so the ORDER is a
    manifest, not a materialized sort."""
    docs = load(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        md5int(
            F.concat_ws(
                "#", F.col("doc_id").cast("string"), F.lit(str(EPOCH_SEED))
            )
        ).alias("sk"),
    )
    ranked = chunked_row_number(
        keyed,
        order_cols=["sk", "doc_id"],
        chunk_col=F.expr(f"sk DIV {_KEY_SPACE // SHUFFLE_CHUNKS}"),
        out_col="rn",
    )
    return ranked.select(
        "doc_id",
        (F.col("rn") - 1).cast("long").alias("epoch_pos"),
        ((F.col("rn") - 1) % N_SHARDS).cast("long").alias("shard"),
    )


_DUCK_SK = duck_md5int(f"CAST(doc_id AS VARCHAR) || '#' || '{EPOCH_SEED}'")

SQL_EPOCH_SHUFFLE = f"""
WITH k AS (SELECT doc_id, {_DUCK_SK} AS sk FROM documents),
r AS (SELECT doc_id,
             CAST(row_number() OVER (ORDER BY sk, doc_id) - 1 AS BIGINT) AS epoch_pos
      FROM k)
SELECT doc_id, epoch_pos, CAST(epoch_pos % {N_SHARDS} AS BIGINT) AS shard
FROM r
"""


def q_pack_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the packed training sequences `sequence_pack` only
    lays out: tokenize every document (the shared cross-engine md5
    word hash mod 50257), concatenate the corpus in doc_id order into
    one token stream, and emit actual fixed-SEQ_LEN chunks — (chunk_id,
    n_tok, tokens_md5) rows; the final partial chunk keeps its true
    length.  The driver-visible output digests the token array
    (md5 of the comma-joined tokens — the dup_span_cut pattern) because
    the external canonicalizer cannot hash list cells; the reassembly
    pytest keeps pinning the real arrays via pack_chunks().

    Scale shape: global offsets come from the two-phase chunked cumsum
    (no single-partition window); the token stream then explodes
    map-side WITH its global position (posexplode + start_off — no
    second pass, no join), and chunk assembly is ONE shuffle keyed by
    chunk_id (integer DIV — exact past 2^53 total tokens where a double
    would drift) with the per-chunk array built by array_sort over
    (slot, token) structs, never a window.  Chunks are ~SEQ_LEN tokens
    by construction, so groups are constant-bounded at any corpus size.
    """
    return pack_chunks(spark, sf_dir).select(
        "chunk_id",
        "n_tok",
        F.md5(F.concat_ws(",", "tokens")).alias("tokens_md5"),
    )


def pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The real packed chunks — (chunk_id, n_tok, tokens:array<int>) —
    behind ``q_pack_materialize``; the reassembly pytest reads this."""
    from canal_spark.operators.common import chunked_cumsum

    docs = load(spark, sf_dir, "documents", spread=True)
    toks = F.expr(
        "transform(split(text, ' '), w -> CAST(CAST(conv(substring(md5(w)"
        ", 1, 15), 16, 10) AS BIGINT) % 50257 AS INT))"
    )
    d = docs.select("doc_id", toks.alias("toks")).withColumn(
        "n_tok", F.size("toks").cast("long")
    )
    c = chunked_cumsum(d, "doc_id", "n_tok", "cum_end", PACK_CHUNK)
    ex = c.select(
        (F.col("cum_end") - F.col("n_tok")).alias("start_off"),
        F.posexplode("toks").alias("pos", "tok"),
    ).select((F.col("start_off") + F.col("pos")).alias("gpos"), "tok")
    return (
        ex.groupBy(F.expr(f"CAST(gpos DIV {SEQ_LEN} AS BIGINT)").alias("chunk_id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tok"),
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.expr(f"gpos % {SEQ_LEN}").alias("slot"),
                            F.col("tok").alias("tok"),
                        )
                    )
                ),
                lambda s: s["tok"],
            ).alias("tokens"),
        )
    )


SQL_PACK_MATERIALIZE = f"""
WITH d AS (SELECT doc_id,
             list_transform(string_split(text,' '),
                            w -> CAST({duck_md5int('w')} % 50257 AS INT)) AS toks
           FROM documents),
c AS (SELECT doc_id, toks, len(toks) AS n_tok,
             CAST(sum(len(toks)) OVER (ORDER BY doc_id) AS BIGINT) AS cum_end
      FROM d),
ex AS (SELECT c.cum_end - c.n_tok + u.i - 1 AS gpos, c.toks[u.i] AS tok
       FROM c, UNNEST(range(1, c.n_tok + 1)) AS u(i))
SELECT CAST(gpos // {SEQ_LEN} AS BIGINT) AS chunk_id,
       CAST(count(*) AS BIGINT) AS n_tok,
       md5(array_to_string(list(tok ORDER BY gpos), ',')) AS tokens_md5
FROM ex GROUP BY 1
"""


SPAN_W = 8  # words per pseudo-line (the fixture text has no newlines)
SPAN_DUP_T = 2  # corpus-wide occurrences at/above this mark a span duplicated


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/RefinedWeb-style line-level dedup: cut every document into
    fixed word-window spans (the fixture's stand-in for lines — the
    text has no newlines), count each span's occurrences across the
    WHOLE corpus, and drop spans that appear >= SPAN_DUP_T times
    anywhere — the "remove boilerplate lines repeated across pages"
    step of a web-scale training-data pipeline.  Emits per doc the
    span count, how many were corpus-duplicated, and the reassembled
    clean text (== the original text whenever nothing was dropped).

    Scale shape: span extraction is a map-side higher-order-function
    transform + posexplode (no Python); the corpus-wide span count is
    ONE partial-agg shuffle keyed by span (hot boilerplate spans
    collapse in the map-side combine); the dup flag comes back via an
    equi-join on span against only the >=T subset (AQE picks
    broadcast when that subset is small — the common case: boilerplate
    is rare relative to the corpus); reassembly is a per-doc groupBy
    with an array_sort over (span_id, span) structs — never a window,
    never a global sort."""
    docs = load(spark, sf_dir, "documents", spread=True)
    span_arr = F.expr(
        f"transform(sequence(0, cast(ceil(size(split(text, ' '))/{SPAN_W}.0) as int) - 1),"
        f" i -> array_join(slice(split(text, ' '), i*{SPAN_W}+1, {SPAN_W}), ' '))"
    )
    spans = docs.select("doc_id", F.posexplode(span_arr).alias("span_id", "span"))
    dup = (
        spans.groupBy("span")
        .agg(F.count("*").alias("c"))
        .where(F.col("c") >= SPAN_DUP_T)
        .select("span", F.lit(True).alias("is_dup"))
    )
    flagged = spans.join(dup, "span", "left")
    kept = F.when(
        F.col("is_dup").isNull(), F.struct(F.col("span_id"), F.col("span"))
    )
    return flagged.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_spans"),
        F.sum(F.when(F.col("is_dup"), 1).otherwise(0)).cast("long").alias("n_dup_spans"),
        F.array_join(
            F.transform(F.array_sort(F.collect_list(kept)), lambda s: s["span"]),
            " ",
        ).alias("clean_text"),
    )


SQL_LINE_DEDUP = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
spans AS (
  SELECT doc_id, u.i AS span_id,
         array_to_string(ws[u.i*{SPAN_W}+1 : u.i*{SPAN_W}+{SPAN_W}], ' ') AS span
  FROM w, UNNEST(range(0, CAST(ceil(len(ws)/{SPAN_W}.0) AS BIGINT))) AS u(i)),
cnt AS (SELECT span, count(*) AS c FROM spans GROUP BY span),
f AS (SELECT s.doc_id, s.span_id, s.span, (c.c >= {SPAN_DUP_T}) AS is_dup
      FROM spans s JOIN cnt c USING (span))
SELECT doc_id,
  CAST(count(*) AS BIGINT) AS n_spans,
  CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
  coalesce(string_agg(CASE WHEN NOT is_dup THEN span END, ' ' ORDER BY span_id),
           '') AS clean_text
FROM f GROUP BY doc_id
"""


# PII patterns shared by both engines.  Kept to the common subset of
# Java regex (Spark) and RE2 (DuckDB): character classes, bounded
# repetition, \b word boundaries — no backrefs, no lookaround.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+1-555-[0-9]{4}"
PII_IP = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"

# Deterministic PII injection: the fixture text is synthetic word-salad
# with no PII, so the operator first appends doc_id-derived emails /
# phones / IPv4s (0-2 / 0-1 / 0-1 per doc) and then redacts them — the
# counts and the redacted fingerprint are nontrivial yet exactly
# reproducible in both engines.
_PII_INJECT_SPARK = (
    "concat(text,"
    " repeat(concat(' user', doc_id, '@example.com'),"
    "        cast(doc_id % 3 as int)),"
    " repeat(concat(' +1-555-', lpad(cast(doc_id % 10000 as string), 4, '0')),"
    "        cast((doc_id div 3) % 2 as int)),"
    " repeat(concat(' 10.', doc_id % 256, '.0.', (doc_id * 7) % 256),"
    "        cast(doc_id % 2 as int)))"
)


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing pass: count and redact emails, NANP phone numbers,
    and IPv4 addresses, emitting per-document match counts and a
    fingerprint of the redacted text — the compliance stage every
    web-scale training corpus runs before tokenization.

    Scale shape: pure map-side JVM ``regexp_count``/``regexp_replace``
    column expressions inside whole-stage codegen — no shuffle, no
    Python, embarrassingly parallel at any corpus size.  Redaction
    order (emails, then phones, then IPs) is fixed so the composed
    replacement is engine-deterministic."""
    docs = load(spark, sf_dir, "documents")
    d = docs.select("doc_id", F.expr(_PII_INJECT_SPARK).alias("t"))
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("t", PII_EMAIL, "<EMAIL>"),
            PII_PHONE,
            "<PHONE>",
        ),
        PII_IP,
        "<IP>",
    )
    return d.select(
        "doc_id",
        F.regexp_count("t", F.lit(PII_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count("t", F.lit(PII_PHONE)).cast("long").alias("n_phones"),
        F.regexp_count("t", F.lit(PII_IP)).cast("long").alias("n_ips"),
        md5int(red).alias("redacted_fp"),
    )


_PII_INJECT_DUCK = (
    "text"
    " || repeat(' user' || CAST(doc_id AS VARCHAR) || '@example.com',"
    "           CAST(doc_id % 3 AS INT))"
    " || repeat(' +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),"
    "           CAST((doc_id // 3) % 2 AS INT))"
    " || repeat(' 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.'"
    "           || CAST((doc_id * 7) % 256 AS VARCHAR),"
    "           CAST(doc_id % 2 AS INT))"
)

_PII_RED_DUCK = (
    f"regexp_replace(regexp_replace(regexp_replace(t,"
    f" '{PII_EMAIL}', '<EMAIL>', 'g'),"
    f" '{PII_PHONE}', '<PHONE>', 'g'),"
    f" '{PII_IP}', '<IP>', 'g')"
)

SQL_PII_REDACT = f"""
WITH e AS (SELECT doc_id, {_PII_INJECT_DUCK} AS t FROM documents)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{PII_EMAIL}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(t, '{PII_PHONE}')) AS BIGINT) AS n_phones,
       CAST(len(regexp_extract_all(t, '{PII_IP}')) AS BIGINT) AS n_ips,
       {duck_md5int(_PII_RED_DUCK)} AS redacted_fp
FROM e
"""


NGRAM_D = 6      # decontamination n-gram width (words)
EVAL_MOD, EVAL_REM = 10, 7    # docs with doc_id % 10 == 7 form the eval set
CONTAM_MOD, CONTAM_REM = 7, 3  # train docs that get contamination injected
CONTAM_WORDS = NGRAM_D + 2    # words of eval text appended (-> 3 hit grams)


def q_decontaminate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Llama/GPT-3-style span-level decontamination: every train-side
    word position covered by an ``NGRAM_D``-gram that also occurs in
    the eval set is REMOVED (not just flagged — the surgery step beyond
    `contamination_check`'s detection).  The fixture corpus is random
    word-salad with no natural overlap, so contamination is first
    INJECTED deterministically (like `pii_redact`'s PII): train docs
    with doc_id % 7 == 3 get the first 8 words of their decade's eval
    doc appended — removal must then restore exactly the original text.
    Emits per TRAIN doc: word count (post-injection), removed-word
    count, and the reassembled clean text.

    Scale shape: the forbidden-gram dictionary is eval-set-bounded
    (distinct grams of the held-out set — small by definition); train
    gram extraction is a map-side transform + posexplode; the match is
    a leftsemi equi-join on gram (AQE broadcasts the dictionary);
    covered positions explode O(matches × D); the final flag join is
    keyed (doc, pos) against that match-bounded side; reassembly is
    one doc-keyed aggregate with array_sort — never a window, no
    Python anywhere."""
    docs = load(spark, sf_dir, "documents", spread=True)
    is_eval = F.col("doc_id") % EVAL_MOD == EVAL_REM
    ev = docs.where(is_eval).select("doc_id", "text")
    partner = (
        F.col("doc_id") - F.col("doc_id") % EVAL_MOD + EVAL_REM
    ).alias("pid")
    train = (
        docs.where(~is_eval)
        .select("doc_id", "text", partner)
        .join(
            ev.select(F.col("doc_id").alias("pid"), F.col("text").alias("ptext")),
            "pid", "left",
        )
        .select(
            "doc_id",
            F.when(
                (F.col("doc_id") % CONTAM_MOD == CONTAM_REM)
                & F.col("ptext").isNotNull(),
                F.concat_ws(
                    " ", "text",
                    F.array_join(
                        F.slice(F.split("ptext", " "), 1, CONTAM_WORDS), " "
                    ),
                ),
            ).otherwise(F.col("text")).alias("text"),
        )
    )
    gram_arr = F.expr(
        f"transform(sequence(0, size(split(text, ' ')) - {NGRAM_D}), "
        f"i -> array_join(slice(split(text, ' '), i + 1, {NGRAM_D}), ' '))"
    )
    forbidden = (
        ev.where(F.size(F.split("text", " ")) >= NGRAM_D)
        .select(F.explode(gram_arr).alias("gram"))
        .distinct()
    )
    grams = train.where(F.size(F.split("text", " ")) >= NGRAM_D).select(
        "doc_id", F.posexplode(gram_arr).alias("pos", "gram")
    )
    covered = (
        grams.join(forbidden, "gram", "leftsemi")
        .select(
            "doc_id",
            F.explode(
                F.expr(f"sequence(pos, pos + {NGRAM_D - 1})")
            ).alias("pos"),
        )
        .distinct()
        .withColumn("rm", F.lit(True))
    )
    words = train.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
    )
    flagged = words.join(covered, ["doc_id", "pos"], "left")
    kept = F.when(F.col("rm").isNull(), F.struct(F.col("pos"), F.col("w")))
    return flagged.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_words"),
        F.sum(F.when(F.col("rm"), 1).otherwise(0)).cast("long").alias("n_removed"),
        F.array_join(
            F.transform(F.array_sort(F.collect_list(kept)), lambda s: s["w"]),
            " ",
        ).alias("clean_text"),
    )


SQL_DECONTAMINATE_SPANS = f"""
WITH ev AS (SELECT doc_id, text FROM documents
            WHERE doc_id % {EVAL_MOD} = {EVAL_REM}),
tr AS (
  SELECT d.doc_id,
         CASE WHEN d.doc_id % {CONTAM_MOD} = {CONTAM_REM} AND e.text IS NOT NULL
              THEN d.text || ' ' ||
                   array_to_string(
                     (string_split(e.text, ' '))[1 : {CONTAM_WORDS}], ' ')
              ELSE d.text END AS text
  FROM documents d
  LEFT JOIN ev e ON e.doc_id = d.doc_id - d.doc_id % {EVAL_MOD} + {EVAL_REM}
  WHERE d.doc_id % {EVAL_MOD} <> {EVAL_REM}),
forbidden AS (
  SELECT DISTINCT array_to_string(ws[u.i + 1 : u.i + {NGRAM_D}], ' ') AS gram
  FROM (SELECT string_split(text, ' ') AS ws FROM ev) w,
       UNNEST(range(0, len(ws) - {NGRAM_D} + 1)) AS u(i)),
grams AS (
  SELECT doc_id, u.i AS pos,
         array_to_string(ws[u.i + 1 : u.i + {NGRAM_D}], ' ') AS gram
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM tr) t,
       UNNEST(range(0, len(ws) - {NGRAM_D} + 1)) AS u(i)),
cov AS (
  SELECT DISTINCT m.doc_id, m.pos + u.j AS cpos
  FROM (SELECT DISTINCT g.doc_id, g.pos
        FROM grams g JOIN forbidden f USING (gram)) m,
       UNNEST(range(0, {NGRAM_D})) AS u(j)),
wd AS (
  SELECT doc_id, u.i - 1 AS pos, ws[CAST(u.i AS INT)] AS w
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM tr) t,
       UNNEST(range(1, len(ws) + 1)) AS u(i))
SELECT wd.doc_id,
  CAST(count(*) AS BIGINT) AS n_words,
  CAST(sum(CASE WHEN cov.cpos IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      AS n_removed,
  coalesce(string_agg(CASE WHEN cov.cpos IS NULL THEN wd.w END,
                      ' ' ORDER BY wd.pos), '') AS clean_text
FROM wd LEFT JOIN cov ON cov.doc_id = wd.doc_id AND cov.cpos = wd.pos
GROUP BY wd.doc_id
"""


BPE_TOP = 32


def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One round of BPE tokenizer training (Sennrich-style): the most
    frequent adjacent character pairs across the corpus, weighted by
    word frequency — the statistic each merge step of a byte-pair
    tokenizer build consumes.

    Scale shape: the corpus first collapses to the word-frequency
    dictionary (one partial-agg shuffle keyed by word; hot words
    combine map-side), then pair generation runs over DISTINCT words
    only — O(vocab × word length), not O(corpus tokens) — and the pair
    count is a second partial-agg shuffle over a ≤ alphabet² key space.
    The final top-k compiles to TakeOrderedAndProject (per-partition
    heads + an O(partitions × k) driver merge), never a global sort.
    Real BPE iterates this with the chosen merge applied; each round is
    the same two-shuffle job over the (tiny) updated vocab table."""
    docs = load(spark, sf_dir, "documents", spread=True)
    wc = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .where(F.length("w") >= 2)  # 1-char words carry no pair
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("c"))
    )
    pairs = wc.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair"),
        "c",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("c").cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(BPE_TOP)
    )


SQL_BPE_PAIR_COUNTS = f"""
WITH w AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
wc AS (SELECT w, CAST(count(*) AS BIGINT) AS c
       FROM w WHERE len(w) >= 2 GROUP BY w),
p AS (SELECT substring(wc.w, CAST(t.i AS INT), 2) AS pair, wc.c
      FROM wc, UNNEST(range(1, len(wc.w))) AS t(i))
SELECT pair, CAST(sum(c) AS BIGINT) AS n
FROM p GROUP BY pair ORDER BY n DESC, pair ASC LIMIT {BPE_TOP}
"""


RARE_BIGRAM_T = 2  # corpus occurrences at/below this mark a bigram rare


def q_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-shaped language-model quality filter: score every document
    by how predictable its word bigrams are under the corpus's own
    bigram model — P(w2|w1) = count(w1 w2) / count(w1 ·) — emitting the
    per-doc mean conditional probability in permille plus the rare-
    bigram count (the high-perplexity tail a quality cut drops first).
    All arithmetic is integer DIV on integer counts (per the module's
    exact-math convention), so the score is bit-identical across
    engines and order-independent at any parallelism.

    Scale shape: doc bigrams pre-aggregate to (doc, bigram) counts
    map-side and PERSIST — the model tables B(bigram) and U(prefix) and
    the scoring probe all derive from that one frame, and without the
    persist each of the three would re-run the corpus scan + explode
    (the plan showed 3 parquet scans).  B carries the prefix alongside
    the bigram (bg determines w1, so grouping by (w1, bg) ≡ by bg) and
    U then rolls up FROM B — a dictionary-scale regroup instead of a
    second corpus-scale shuffle of the persisted doc-bigram frame.  B
    and U are vocab²-bounded (dictionary-sized, not corpus-sized), and
    the scoring join is equi-keyed with AQE choosing broadcast while
    the dictionaries stay small.  Docs with fewer than two words carry
    no bigram and drop out (same in the oracle)."""
    docs = load(spark, sf_dir, "documents", spread=True)
    d = docs.where(F.size(F.split("text", " ")) >= 2).select(
        "doc_id", F.split("text", " ").alias("ws")
    )
    bg = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(ws) - 2), "
                "i -> struct(ws[i] AS w1, concat(ws[i], ' ', ws[i+1]) AS bg))"
            )
        ).alias("b"),
    ).select("doc_id", "b.w1", "b.bg")
    db = (
        bg.groupBy("doc_id", "w1", "bg")
        .agg(F.count("*").cast("long").alias("c"))
        .persist()  # released by the caller via release_cached_deps
    )
    model_b = db.groupBy("w1", "bg").agg(F.sum("c").cast("long").alias("nb"))
    model_u = model_b.groupBy("w1").agg(F.sum("nb").cast("long").alias("nu"))
    j = db.join(model_b.drop("w1"), "bg").join(model_u, "w1")
    per = j.select(
        "doc_id", "c", "nb", F.expr("nb * 1000 DIV nu").alias("pm")
    )
    out = per.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_bigrams"),
        F.sum(
            F.when(F.col("nb") <= RARE_BIGRAM_T, F.col("c")).otherwise(F.lit(0))
        ).cast("long").alias("rare_bigrams"),
        F.expr("CAST(sum(c * pm) DIV sum(c) AS BIGINT)").alias("lm_permille"),
    )
    return attach_cached_deps(out, [db])


SQL_BIGRAM_LM_SCORE = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
           WHERE len(string_split(text, ' ')) >= 2),
bg AS (SELECT doc_id, ws[CAST(t.i AS INT)] AS w1,
              ws[CAST(t.i AS INT)] || ' ' || ws[CAST(t.i AS INT) + 1] AS bg
       FROM w, UNNEST(range(1, len(ws))) AS t(i)),
db AS (SELECT doc_id, w1, bg, CAST(count(*) AS BIGINT) AS c
       FROM bg GROUP BY doc_id, w1, bg),
b AS (SELECT bg, CAST(sum(c) AS BIGINT) AS nb FROM db GROUP BY bg),
u AS (SELECT w1, CAST(sum(c) AS BIGINT) AS nu FROM db GROUP BY w1)
SELECT db.doc_id,
       CAST(sum(db.c) AS BIGINT) AS n_bigrams,
       CAST(sum(CASE WHEN b.nb <= {RARE_BIGRAM_T} THEN db.c ELSE 0 END)
            AS BIGINT) AS rare_bigrams,
       CAST(sum(db.c * (b.nb * 1000 // u.nu)) // sum(db.c) AS BIGINT)
           AS lm_permille
FROM db JOIN b USING (bg) JOIN u USING (w1)
GROUP BY db.doc_id
"""


QUERIES = {
    "lang_id": q_lang_id,
    "quality_score": q_quality_score,
    "token_count": q_token_count,
    "sample_mix": q_sample_mix,
    "column_profile": q_column_profile,
    "repetition_filter": q_repetition_filter,
    "sequence_pack": q_sequence_pack,
    "word_topk": q_word_topk,
    "line_dedup": q_line_dedup,
    "pack_materialize": q_pack_materialize,
    "pii_redact": q_pii_redact,
    "bpe_pair_counts": q_bpe_pair_counts,
    "bigram_lm_score": q_bigram_lm_score,
    "decontaminate_spans": q_decontaminate_spans,
    "oov_rate": q_oov_rate,
    "epoch_shuffle": q_epoch_shuffle,
    "tfidf_topk": q_tfidf_topk,
}

ORACLES = {
    "lang_id": SQL_LANG_ID,
    "quality_score": SQL_QUALITY_SCORE,
    "token_count": SQL_TOKEN_COUNT,
    "sample_mix": SQL_SAMPLE_MIX,
    "column_profile": SQL_COLUMN_PROFILE,
    "repetition_filter": SQL_REPETITION,
    "sequence_pack": SQL_SEQUENCE_PACK,
    "word_topk": SQL_WORD_TOPK,
    "line_dedup": SQL_LINE_DEDUP,
    "pack_materialize": SQL_PACK_MATERIALIZE,
    "pii_redact": SQL_PII_REDACT,
    "bpe_pair_counts": SQL_BPE_PAIR_COUNTS,
    "bigram_lm_score": SQL_BIGRAM_LM_SCORE,
    "decontaminate_spans": SQL_DECONTAMINATE_SPANS,
    "oov_rate": SQL_OOV_RATE,
    "epoch_shuffle": SQL_EPOCH_SHUFFLE,
    "tfidf_topk": SQL_TFIDF_TOPK,
}
