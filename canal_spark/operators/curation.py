"""Training-corpus curation operators: deterministic train/val/test
splitting, data-mixture token budgeting, and context-window chunking.

These are the corpus-assembly verbs that sit between the cleaning ops
(`dedup`, `text`) and the export path (`export.py` / `epoch_shuffle`):
decide which documents belong to which split, how many tokens each
source contributes to the training mix, and how long documents break
into model-context-sized windows.  All determinism comes from the
shared cross-engine md5 hash (`common.md5int`), so every decision is
reproducible across engines, re-runs, and cluster sizes — the same
property the reference pins with binlog positions
(`parse/.../LogPosition.java`): a curation decision, like an ack
point, must never depend on execution order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from canal_spark.operators.common import (
    attach_cached_deps,
    duck_md5int,
    load,
    md5int,
)

# --- deterministic stratified train/val/test split ---------------------------

SPLIT_SEED = 11
TEST_PCT = 5
VAL_PCT = 10  # val bucket is [TEST_PCT, TEST_PCT+VAL_PCT)


def q_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every document to train/val/test by a seeded hash bucket
    (md5(doc_id#seed) % 100 -> test <5, val <15, train otherwise) and
    report per-(source, split) document and token counts.  The split is
    a pure function of the document id: adding data, reshuffling
    partitions, or re-running never moves a doc across splits — the
    property that keeps eval sets eval sets.

    Scale shape: one map (hash + bucket + token count) and ONE
    partial-aggregated shuffle keyed by (source, split) — low, fixed
    cardinality, so the final agg is trivially small at any corpus
    size.  No window, no join."""
    docs = load(spark, sf_dir, "documents")
    bucket = md5int(
        F.concat_ws("#", F.col("doc_id").cast("string"), F.lit(str(SPLIT_SEED)))
    ) % 100
    split = (
        F.when(bucket < TEST_PCT, F.lit("test"))
        .when(bucket < TEST_PCT + VAL_PCT, F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return (
        docs.select(
            "source",
            split.alias("split"),
            F.size(F.split(F.coalesce("text", F.lit("")), " "))
            .cast("long")
            .alias("_tok"),
        )
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_tok").cast("long").alias("n_tokens"),
        )
    )


_DUCK_BUCKET = (
    duck_md5int(f"CAST(doc_id AS VARCHAR) || '#' || '{SPLIT_SEED}'") + " % 100"
)

SQL_TRAIN_SPLIT = f"""
WITH b AS (
  SELECT source,
         CASE WHEN {_DUCK_BUCKET} < {TEST_PCT} THEN 'test'
              WHEN {_DUCK_BUCKET} < {TEST_PCT + VAL_PCT} THEN 'val'
              ELSE 'train' END AS split,
         len(string_split(coalesce(text, ''), ' ')) AS tok
  FROM documents)
SELECT source, split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(tok) AS BIGINT) AS n_tokens
FROM b GROUP BY source, split
"""


# --- data-mixture token budgeting --------------------------------------------

# budget = half the corpus (integer), split across sources by weight.
MIX_BUDGET_DEN = 2
PPM = 1_000_000


def q_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan a training mixture: each source gets a deterministic config
    weight (1 + md5(source)%4 — standing in for the hand-tuned
    per-source weights of a real mixture config), the global token
    budget is half the corpus, and each source is allocated
    min(available, weight-share of budget) tokens with the implied
    per-document sampling rate in ppm.  All math is exact integer
    arithmetic, so the plan is identical on every engine and at every
    parallelism.

    Scale shape: one partial-agg shuffle keyed by source reduces the
    corpus to a config-cardinality frame; the totals row is an
    aggregate OF THAT FRAME (persisted, source-count rows), broadcast
    back with a cross join.  Nothing data-scale crosses the driver."""
    docs = load(spark, sf_dir, "documents")
    per_src = (
        docs.select(
            "source",
            F.size(F.split(F.coalesce("text", F.lit("")), " "))
            .cast("long")
            .alias("_tok"),
        )
        .groupBy("source")
        .agg(F.sum("_tok").cast("long").alias("avail_tokens"))
        .withColumn("weight", (md5int(F.col("source")) % 4 + 1).cast("long"))
        .persist()
    )
    totals = per_src.agg(
        F.sum("weight").alias("_sum_w"), F.sum("avail_tokens").alias("_sum_avail")
    )
    out = (
        per_src.crossJoin(F.broadcast(totals))
        .withColumn(
            "alloc_tokens",
            F.least(
                F.col("avail_tokens"),
                F.expr(f"weight * (_sum_avail DIV {MIX_BUDGET_DEN}) DIV _sum_w"),
            ).cast("long"),
        )
        .withColumn(
            "sample_ppm", F.expr(f"alloc_tokens * {PPM} DIV avail_tokens").cast("long")
        )
        .select("source", "weight", "avail_tokens", "alloc_tokens", "sample_ppm")
    )
    return attach_cached_deps(out, [per_src])


SQL_MIXTURE_PLAN = f"""
WITH per_src AS (
  SELECT source,
         CAST(sum(len(string_split(coalesce(text, ''), ' '))) AS BIGINT)
           AS avail_tokens,
         CAST({duck_md5int('source')} % 4 + 1 AS BIGINT) AS weight
  FROM documents GROUP BY source),
tot AS (SELECT sum(weight) AS sum_w, sum(avail_tokens) AS sum_avail FROM per_src),
a AS (
  SELECT source, weight, avail_tokens,
         CAST(least(avail_tokens,
                    (weight * (sum_avail // {MIX_BUDGET_DEN})) // sum_w)
              AS BIGINT) AS alloc_tokens
  FROM per_src CROSS JOIN tot)
SELECT source, weight, avail_tokens, alloc_tokens,
       CAST((alloc_tokens * {PPM}) // avail_tokens AS BIGINT) AS sample_ppm
FROM a
"""


# --- context-window chunking --------------------------------------------------

CHUNK_LEN = 64  # model context length (tokens)
CHUNK_STRIDE = 48  # overlap = CHUNK_LEN - CHUNK_STRIDE


def q_doc_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Break every document into overlapping context windows of
    CHUNK_LEN tokens at CHUNK_STRIDE (the sliding-window chunking that
    feeds long documents to a fixed-context model), emitting per-chunk
    offsets, true length, and an md5 signature of the chunk text — the
    signature proves both engines cut IDENTICAL windows, not just the
    same counts.  Unlike `pack_materialize` (corpus-order packing that
    crosses document boundaries), chunks here never span documents and
    overlap by design.

    Scale shape: chunk count per doc is computed from the token count
    alone, then `explode(sequence(...))` fans out map-side — no
    shuffle at all, the whole operator is narrow.  Each output row
    slices its own window from the doc's word array, so memory per row
    is O(CHUNK_LEN)."""
    docs = load(spark, sf_dir, "documents", spread=True)
    d = (
        docs.select(
            "doc_id", F.split(F.coalesce("text", F.lit("")), " ").alias("w")
        )
        .withColumn("n_tok", F.size("w"))
        .withColumn(
            "n_chunks",
            F.expr(
                f"(greatest(n_tok - {CHUNK_LEN}, 0) + {CHUNK_STRIDE} - 1)"
                f" DIV {CHUNK_STRIDE} + 1"
            ),
        )
    )
    e = d.select(
        "doc_id",
        "w",
        "n_tok",
        F.explode(F.expr("sequence(0, n_chunks - 1)")).alias("cidx"),
    )
    start = F.col("cidx") * CHUNK_STRIDE
    clen = F.least(F.lit(CHUNK_LEN), F.col("n_tok") - start)
    return e.select(
        "doc_id",
        F.col("cidx").cast("long").alias("chunk_idx"),
        start.cast("long").alias("start_tok"),
        clen.cast("long").alias("chunk_len"),
        F.md5(F.concat_ws(" ", F.slice("w", start + 1, clen))).alias("chunk_sig"),
    )


SQL_DOC_CHUNK = f"""
WITH t AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS w
           FROM documents),
n AS (SELECT doc_id, w, len(w) AS n_tok FROM t),
c AS (SELECT doc_id, w, n_tok,
             (greatest(n_tok - {CHUNK_LEN}, 0) + {CHUNK_STRIDE} - 1)
               // {CHUNK_STRIDE} + 1 AS n_chunks
      FROM n),
e AS (SELECT doc_id, w, n_tok,
             unnest(generate_series(0, n_chunks - 1)) AS cidx
      FROM c)
SELECT doc_id,
       CAST(cidx AS BIGINT) AS chunk_idx,
       CAST(cidx * {CHUNK_STRIDE} AS BIGINT) AS start_tok,
       CAST(least({CHUNK_LEN}, n_tok - cidx * {CHUNK_STRIDE}) AS BIGINT) AS chunk_len,
       md5(array_to_string(
             w[cidx * {CHUNK_STRIDE} + 1 :
               cidx * {CHUNK_STRIDE} + least({CHUNK_LEN}, n_tok - cidx * {CHUNK_STRIDE})],
             ' ')) AS chunk_sig
FROM e
"""


# --- per-source quality-percentile cut ----------------------------------------

KEEP_PCT = 70  # keep the top 70% of each source's docs by quality


def q_quality_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality cut: keep (at least) the top KEEP_PCT% of each
    source's documents by `quality_milli` (ties at the threshold keep
    everything tied — a cut must be a pure function of the score, never
    of row order) and report the threshold plus kept doc/token counts.

    Scale shape: quality_milli is a BOUNDED integer (≤1000 by
    construction), so the exact percentile needs no corpus-scale sort —
    ONE partial-agg shuffle reduces the corpus to a (source × ≤1001)-row
    histogram carrying doc and token counts, and everything after
    (top-down cumulative counts, threshold = max score whose cumulative
    count reaches ceil(KEEP_PCT% · n), kept rollup) is windows and joins
    over that config-scale frame.  This is the standard trick for exact
    quantiles over bounded domains — the alternative per-source
    percent_rank window would sort corpus-scale partitions keyed by a
    handful of sources, the worst possible skew."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    wc = F.size(F.split(F.coalesce("text", F.lit("")), " ")).cast("long")
    stop = F.expr(
        "size(filter(split(coalesce(text, ''), ' '), w -> w in ('the', 'a')))"
    ).cast("long")
    ciw = F.col("n_chars") - (wc - 1)
    quality = (
        F.least(wc, F.lit(100)) * 4
        + F.floor((wc - stop) * 400 / wc)
        + F.least(F.floor(ciw * 25 / wc), F.lit(200))
    ).cast("long")
    # persisted: BOTH consumers below (threshold derivation and the kept
    # rollup join) scan this histogram — without the persist each join
    # branch would re-run the corpus scan + scoring + partial agg
    hist = (
        docs.select("source", quality.alias("q"), wc.alias("_tok"))
        .groupBy("source", "q")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum("_tok").cast("long").alias("tok"),
        )
        .persist()
    )
    w_cum = (
        Window.partitionBy("source")
        .orderBy(F.desc("q"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("source")
    h = hist.withColumn("cum", F.sum("cnt").over(w_cum)).withColumn(
        "n", F.sum("cnt").over(w_all)
    )
    need = F.expr(f"(n * {KEEP_PCT} + 99) DIV 100")
    thr = h.groupBy("source").agg(
        F.max(F.when(F.col("cum") >= need, F.col("q"))).alias("threshold_milli"),
        F.max("n").alias("n_docs"),
    )
    kept = (
        h.join(F.broadcast(thr), "source")
        .where(F.col("q") >= F.col("threshold_milli"))
        .groupBy("source")
        .agg(
            F.max("threshold_milli").alias("threshold_milli"),
            F.max("n_docs").cast("long").alias("n_docs"),
            F.sum("cnt").cast("long").alias("n_kept"),
            F.sum("tok").cast("long").alias("kept_tokens"),
        )
    )
    return attach_cached_deps(
        kept.select(
            "source", "threshold_milli", "n_docs", "n_kept", "kept_tokens"
        ),
        [hist],
    )


SQL_QUALITY_CUT = f"""
WITH s AS (
  SELECT source,
         CAST(least(len(string_split(coalesce(text, ''), ' ')), 100) * 4
              + floor((len(string_split(coalesce(text, ''), ' '))
                       - len(list_filter(string_split(coalesce(text, ''), ' '),
                                         w -> w IN ('the', 'a'))))
                      * 400 / len(string_split(coalesce(text, ''), ' ')))
              + least(floor((n_chars
                             - (len(string_split(coalesce(text, ''), ' ')) - 1))
                            * 25 / len(string_split(coalesce(text, ''), ' '))),
                      200)
              AS BIGINT) AS q,
         CAST(len(string_split(coalesce(text, ''), ' ')) AS BIGINT) AS tok
  FROM documents),
hist AS (SELECT source, q, CAST(count(*) AS BIGINT) AS cnt,
                CAST(sum(tok) AS BIGINT) AS tok
         FROM s GROUP BY source, q),
h AS (SELECT *,
             sum(cnt) OVER (PARTITION BY source ORDER BY q DESC
                            ROWS UNBOUNDED PRECEDING) AS cum,
             sum(cnt) OVER (PARTITION BY source) AS n
      FROM hist),
thr AS (SELECT source,
               max(CASE WHEN cum >= (n * {KEEP_PCT} + 99) // 100
                        THEN q END) AS threshold_milli,
               CAST(max(n) AS BIGINT) AS n_docs
        FROM h GROUP BY source)
SELECT h.source, thr.threshold_milli,
       thr.n_docs,
       CAST(sum(h.cnt) AS BIGINT) AS n_kept,
       CAST(sum(h.tok) AS BIGINT) AS kept_tokens
FROM h JOIN thr ON h.source = thr.source
WHERE h.q >= thr.threshold_milli
GROUP BY h.source, thr.threshold_milli, thr.n_docs
"""


# --- DSIR-style hashed n-gram importance weights ------------------------------

DSIR_B = 4096  # hashed feature buckets (the paper uses 10k; B is a constant)
DSIR_TGT_MOD = 97  # doc_id % 97 == 0 -> target-domain docs (contamination rule)
PPM_SCALE = 1_000_000


def q_dsir_weight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection weights (Xie et al. 2023,
    arXiv:2302.03169): score every RAW-pool document by how much its
    hashed n-gram feature distribution looks like the target domain
    (here the `doc_id % 97 == 0` held-out set — the same stand-in the
    contamination check uses).  Features are unigrams + word bigrams
    hashed into DSIR_B buckets by the shared cross-engine md5;
    per-bucket importance is the add-1-smoothed target/raw count ratio.

    Deviation from the paper, documented: DSIR resamples by the
    log-product of per-feature ratios; this module's exact-math
    convention (see `q_bigram_lm_score`) replaces float logs with the
    count-weighted MEAN per-occurrence importance ratio in ppm —
    integer DIV on integer counts end to end, so the weight is
    bit-identical across engines and order-independent at any
    parallelism (a float log-sum is neither).  The global total-count
    normalizer folds into one integer scalar (ppm_g); at extreme corpus
    scale keep (tgt_c+1)*ppm_g inside int64 by raising the ppm scale
    into the per-doc divide (counts are per-BUCKET, B is constant).

    Scale shape: gram explode pre-aggregates to (doc, bucket) counts
    map-side and persists (the dictionary and the probe both consume
    it); the feature dictionary is B-bounded (constant), broadcast into
    the probe join; the only corpus-scale shuffles are the two
    doc-keyed partial aggs.  No window, no Python."""
    docs = load(spark, sf_dir, "documents", spread=True)
    ws = F.split("text", " ")
    grams = docs.select(
        "doc_id",
        (F.col("doc_id") % DSIR_TGT_MOD == 0).alias("is_tgt"),
        F.explode(
            F.concat(
                ws,
                F.when(
                    F.size(ws) >= 2,
                    F.expr(
                        "transform(sequence(0, size(split(text, ' ')) - 2), "
                        "i -> concat(split(text, ' ')[i], ' ', "
                        "split(text, ' ')[i+1]))"
                    ),
                ).otherwise(F.array().cast("array<string>")),
            )
        ).alias("g"),
    )
    dfc = (
        grams.select("doc_id", "is_tgt", (md5int(F.col("g")) % DSIR_B).alias("b"))
        .groupBy("doc_id", "is_tgt", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .persist()  # released by the caller via release_cached_deps
    )
    dic = dfc.groupBy("b").agg(
        F.sum(F.when(F.col("is_tgt"), F.col("c")).otherwise(0)).cast("long").alias("tc"),
        F.sum(F.when(~F.col("is_tgt"), F.col("c")).otherwise(0)).cast("long").alias("sc"),
    )
    tot = dic.agg(
        F.expr(
            f"CAST({PPM_SCALE} * (sum(sc) + {DSIR_B}) "
            f"DIV (sum(tc) + {DSIR_B}) AS BIGINT)"
        ).alias("ppm_g")
    )
    rdic = dic.crossJoin(F.broadcast(tot)).select(
        "b", F.expr("(tc + 1) * ppm_g DIV (sc + 1)").alias("r_ppm")
    )
    probe = dfc.where(~F.col("is_tgt")).join(F.broadcast(rdic), "b")
    out = probe.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_grams"),
        F.expr("CAST(sum(c * r_ppm) DIV sum(c) AS BIGINT)").alias("dsir_ppm"),
    )
    return attach_cached_deps(out, [dfc])


_DUCK_GB = duck_md5int("g") + f" % {DSIR_B}"

SQL_DSIR_WEIGHT = f"""
WITH w AS (SELECT doc_id, doc_id % {DSIR_TGT_MOD} = 0 AS is_tgt,
                  string_split(text, ' ') AS ws FROM documents),
grams AS (
  SELECT doc_id, is_tgt, u.g FROM w, UNNEST(ws) AS u(g)
  UNION ALL
  SELECT doc_id, is_tgt,
         ws[CAST(t.i AS INT)] || ' ' || ws[CAST(t.i AS INT) + 1] AS g
  FROM w, UNNEST(range(1, len(ws))) AS t(i)
  WHERE len(ws) >= 2),
dfc AS (SELECT doc_id, is_tgt, {_DUCK_GB} AS b,
               CAST(count(*) AS BIGINT) AS c
        FROM grams GROUP BY doc_id, is_tgt, b),
dic AS (SELECT b,
               CAST(sum(CASE WHEN is_tgt THEN c ELSE 0 END) AS BIGINT) AS tc,
               CAST(sum(CASE WHEN NOT is_tgt THEN c ELSE 0 END) AS BIGINT) AS sc
        FROM dfc GROUP BY b),
tot AS (SELECT CAST({PPM_SCALE} * (sum(sc) + {DSIR_B})
               // (sum(tc) + {DSIR_B}) AS BIGINT) AS ppm_g FROM dic),
rdic AS (SELECT b, CAST((tc + 1) * ppm_g // (sc + 1) AS BIGINT) AS r_ppm
         FROM dic, tot)
SELECT d.doc_id,
       CAST(sum(d.c) AS BIGINT) AS n_grams,
       CAST(sum(d.c * r.r_ppm) // sum(d.c) AS BIGINT) AS dsir_ppm
FROM dfc d JOIN rdic r USING (b)
WHERE NOT d.is_tgt
GROUP BY d.doc_id
"""


# --- length-bucketed batching plan --------------------------------------------

LEN_BUCKETS = (16, 32, 64, 128, 256, 512)  # padded sequence lengths
MAX_SEQ = LEN_BUCKETS[-1]  # longer docs truncate to this (overflow tracked)
BATCH_TOKENS = 8_192  # fixed per-batch token budget (padded tokens)


def _bucket_case(n_col: str) -> str:
    """Smallest bucket >= n, else the cap — an explicit CASE chain so
    both engines agree exactly (no float log2 at bucket boundaries)."""
    arms = " ".join(
        f"WHEN {n_col} <= {b} THEN {b}" for b in LEN_BUCKETS[:-1]
    )
    return f"CASE {arms} ELSE {MAX_SEQ} END"


def q_length_bucket_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padded-batch planning: assign every document to the smallest
    power-of-two length bucket that holds it (capped at MAX_SEQ with
    truncation), then report per bucket how many batches a fixed
    BATCH_TOKENS budget yields and the exact padding waste in ppm —
    the pre-training answer to "what does padding cost us if we batch
    by length instead of concat-packing?" (`sequence_pack` is the
    concat alternative; this is the padded-batch alternative, the two
    plans a data team compares).  All integer math, so the plan is
    bit-identical across engines and cluster sizes.

    Scale shape: the bucket key is a map-side CASE over the word
    count (pure JVM, no explode — only `size(split(...))`, never the
    array itself, crosses the shuffle), then ONE partial-agg shuffle
    onto a len(LEN_BUCKETS)-row frame; everything downstream is
    constant-sized.  The same cost class as `sample_mix` — the
    cheapest possible corpus pass."""
    docs = load(spark, sf_dir, "documents", spread=True)
    d = docs.select(
        F.size(F.split(F.coalesce("text", F.lit("")), " ")).alias("n")
    ).select(
        F.expr(_bucket_case("n")).alias("bucket_len"),
        F.least(F.col("n"), F.lit(MAX_SEQ)).alias("eff"),
        F.greatest(F.col("n") - MAX_SEQ, F.lit(0)).alias("trunc"),
    )
    agg = d.groupBy("bucket_len").agg(
        F.count(F.lit(1)).cast("long").alias("n_seqs"),
        F.sum("eff").cast("long").alias("real_tokens"),
        F.sum("trunc").cast("long").alias("trunc_tokens"),
    )
    return agg.select(
        F.col("bucket_len").cast("long").alias("bucket_len"),
        "n_seqs",
        "real_tokens",
        "trunc_tokens",
        # padded-token counts * PPM exceed int64 near the 10^12-sequence
        # design point (512-bucket: ~5e14 padded tokens * 1e6 = 5e20) —
        # widen to DECIMAL(38,0) before the multiply, exactly the
        # convention propagate_min_labels/dsir document for full-range
        # int64 aggregation; floor == integer div (all values >= 0)
        F.expr(
            f"CAST(floor((CAST(n_seqs AS DECIMAL(38,0)) * bucket_len"
            f" - real_tokens) * {PPM}"
            f" / (CAST(n_seqs AS DECIMAL(38,0)) * bucket_len)) AS BIGINT)"
        ).alias("pad_ppm"),
        F.expr(
            f"(n_seqs + ({BATCH_TOKENS} DIV bucket_len) - 1) "
            f"DIV ({BATCH_TOKENS} DIV bucket_len)"
        ).cast("long").alias("n_batches"),
    ).orderBy("bucket_len")


SQL_LENGTH_BUCKET_PLAN = f"""
WITH n AS (SELECT len(string_split(coalesce(text, ''), ' ')) AS n
           FROM documents),
b AS (SELECT {_bucket_case("n")} AS bucket_len,
             least(n, {MAX_SEQ}) AS eff,
             greatest(n - {MAX_SEQ}, 0) AS trunc
      FROM n),
a AS (SELECT bucket_len, count(*) AS n_seqs,
             sum(eff) AS real_tokens, sum(trunc) AS trunc_tokens
      FROM b GROUP BY bucket_len)
SELECT CAST(bucket_len AS BIGINT) AS bucket_len,
       CAST(n_seqs AS BIGINT) AS n_seqs,
       CAST(real_tokens AS BIGINT) AS real_tokens,
       CAST(trunc_tokens AS BIGINT) AS trunc_tokens,
       CAST((CAST(n_seqs AS HUGEINT) * bucket_len - real_tokens) * {PPM}
            // (CAST(n_seqs AS HUGEINT) * bucket_len) AS BIGINT) AS pad_ppm,
       CAST((n_seqs + ({BATCH_TOKENS} // bucket_len) - 1)
            // ({BATCH_TOKENS} // bucket_len) AS BIGINT) AS n_batches
FROM a ORDER BY bucket_len
"""


QUERIES = {
    "train_split": q_train_split,
    "mixture_plan": q_mixture_plan,
    "doc_chunk": q_doc_chunk,
    "quality_cut": q_quality_cut,
    "dsir_weight": q_dsir_weight,
    "length_bucket_plan": q_length_bucket_plan,
}

ORACLES = {
    "train_split": SQL_TRAIN_SPLIT,
    "mixture_plan": SQL_MIXTURE_PLAN,
    "doc_chunk": SQL_DOC_CHUNK,
    "quality_cut": SQL_QUALITY_CUT,
    "dsir_weight": SQL_DSIR_WEIGHT,
    "length_bucket_plan": SQL_LENGTH_BUCKET_PLAN,
}
