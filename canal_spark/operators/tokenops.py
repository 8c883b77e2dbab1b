"""Token-payload curation operators over the pre-tokenized corpus.

These run on the SAME deterministic token view the maintenance engine
stores (``etl.tokenize_documents``: 60-bit md5 word hash mod 50257 —
FIXTURES.md §4), so they are the query-side mirrors of what a pass
would compute over the physical ``tokens array<int>`` column.

1. ``dup_span_detect`` — Lee et al. ("Deduplicating Training Data
   Makes Language Models Better", ACL 2022) style EXACT substring
   duplication: every ``DUP_W``-token window that occurs in >= 2
   distinct documents.  The reference analogue is Canal's row-image
   comparison (`RowsLogBuffer.java` fetchValue) generalized from whole
   rows to token spans.
2. ``dup_span_cut`` — the surgery step: remove every token position
   covered by a cross-document duplicated window and emit the cleaned
   array fingerprint (the tokens-payload sibling of
   ``decontaminate_spans``, which operates on words vs an eval set).
3. ``token_drift`` — exact-integer total-variation distance (ppm)
   between each source's token distribution and the corpus-wide
   distribution: the per-source distribution-shift diagnostic a
   mixture rebalance reads before re-weighting (`mixture_plan`).

Scale shapes (100 TB audit):
- Window extraction is a map-side ``transform(sequence(...))`` over the
  token array (pure JVM, no Python) followed by ONE posexplode; rows
  out = total_tokens - (W-1)·n_docs, i.e. O(corpus tokens) — the same
  cost class as ``doc_chunk``/``sequence_pack``.  For corpora where
  stride-1 is too hot, ``span_windows(..., sample_mod=k)`` keeps only
  windows whose 60-bit hash ≡ 0 (mod k): the classic hash-threshold
  fingerprinting used in place of suffix arrays at cluster scale —
  detection of any duplicated RUN of length ≥ ~W·k survives with
  probability ≥ 1-(1-1/k)^(run/W) and the shuffle shrinks by k×.
- The duplicated-hash table is an aggregation (count DISTINCT doc per
  hash), never a doc×doc join, so a million-document boilerplate span
  costs one group row, not O(b²) pairs (the same hot-bucket argument
  as the LSH band guard in ``dedup.py``).
- ``dup_span_cut``'s anti-join is bounded by matches (covered
  positions), and reassembly is the chunk-free ``array_sort`` over
  (pos, tok) structs — no window function anywhere.
- ``token_drift`` pays ONE corpus-scale shuffle (the per-(source,
  token) partial-count with map-side combine, ≤ sources × vocab rows
  out); everything after is vocab-bounded and broadcast.

The fixture corpus is word-salad with no guaranteed natural overlap,
so duplication is INJECTED deterministically (like ``pii_redact`` /
``decontaminate_spans``): docs with doc_id % 5 ∈ {1, 3} get a shared
synthetic boilerplate of ``DUP_B`` words keyed by their decade
(doc_id // 10) appended.  Each decade thus has ≥ 2 docs sharing a
``DUP_B``-word tail → exactly ``DUP_B - DUP_W + 1`` duplicated windows
per injected doc whose covered positions are exactly the boilerplate,
so the cut restores the original token array bit-for-bit (asserted in
tests/test_tokenops.py).  A per-doc UNIQUE sentinel word sits between
the original text and the boilerplate: without it, two same-decade
docs that happen to share their last original word(s) would also share
the straddling window (original suffix + boilerplate prefix), and the
excision would — correctly per the run semantics, but unhelpfully for
the fixture — cut into the original text.  The sentinel pins the
duplicated run's left edge to the boilerplate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from canal_spark.etl import _TOKENS_EXPR
from canal_spark.operators.common import duck_md5int, load, md5int

DUP_W = 12            # duplicated-window width (tokens)
DUP_B = DUP_W + 2     # injected boilerplate length (words)
DUP_MOD = 5           # docs with doc_id % DUP_MOD in DUP_REMS get boilerplate
DUP_REMS = (1, 3)
PPM = 1_000_000

_BOILER_SPARK = (
    f"array_join(transform(sequence(0, {DUP_B - 1}), "
    f"j -> concat('bp', CAST(doc_id DIV 10 AS STRING), '_', CAST(j AS STRING))), ' ')"
)
_BOILER_DUCK = (
    f"array_to_string(list_transform(generate_series(0, {DUP_B - 1}), "
    f"j -> 'bp' || CAST(doc_id // 10 AS VARCHAR) || '_' || CAST(j AS VARCHAR)), ' ')"
)
_REMS_SQL = ", ".join(str(r) for r in DUP_REMS)


def injected_token_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + deterministic boilerplate injection -> (doc_id,
    source, toks array<int>).  Injection happens in TEXT space so the
    oracle mirrors it with the identical string pipeline."""
    docs = load(spark, sf_dir, "documents", spread=True)
    injected = F.when(
        F.expr(f"doc_id % {DUP_MOD}").isin(*DUP_REMS),
        F.concat_ws(
            " ",
            F.col("text"),
            F.concat(F.lit("u"), F.col("doc_id").cast("string")),  # sentinel
            F.expr(_BOILER_SPARK),
        ),
    ).otherwise(F.col("text"))
    return docs.select("doc_id", "source", injected.alias("text")).select(
        "doc_id", "source", F.expr(_TOKENS_EXPR).alias("toks")
    )


def span_windows(t: DataFrame, w: int = DUP_W, sample_mod: int = 1) -> DataFrame:
    """(doc_id, toks) -> one row per w-token window: (doc_id, pos, h).

    h is the md5 of the comma-joined token slice — the cross-engine
    span identity.  ``sample_mod > 1`` keeps the 1-in-k hash-threshold
    sample (the suffix-array replacement at cluster scale; see module
    docstring).  Docs shorter than w produce no windows (the
    ``size >= w`` guard also dodges Spark's descending
    ``sequence(0, negative)``)."""
    wins = F.expr(
        f"transform(sequence(0, size(toks) - {w}), "
        f"i -> md5(array_join(transform(slice(toks, i + 1, {w}), "
        f"x -> CAST(x AS STRING)), ',')))"
    )
    sp = (
        t.where(F.size("toks") >= w)
        .select("doc_id", F.posexplode(wins).alias("pos", "h"))
        .select("doc_id", F.col("pos").cast("long").alias("pos"), "h")
    )
    if sample_mod > 1:
        sp = sp.where(md5int(F.col("h")) % sample_mod == 0)
    return sp


def duplicated_spans(sp: DataFrame) -> DataFrame:
    """Windows present in >= 2 distinct docs: (doc_id, pos, h) hits.

    Aggregation-then-semi-join — a boilerplate shared by a million
    docs is ONE group row, never a doc×doc pair explosion."""
    dup = (
        sp.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("h")
    )
    return sp.join(dup, "h", "leftsemi")


def covered_positions(hits: DataFrame, w: int = DUP_W) -> DataFrame:
    """Distinct (doc_id, p) token positions covered by any hit window."""
    return hits.select(
        "doc_id", F.explode(F.expr(f"sequence(pos, pos + {w - 1})")).alias("p")
    ).distinct()


def q_dup_span_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document cross-corpus duplicated-span report: how many
    w-token windows of this doc also appear in another doc, and how
    many token positions they cover."""
    t = injected_token_view(spark, sf_dir)
    hits = duplicated_spans(span_windows(t))
    wins = hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_dup_windows")
    )
    cov = covered_positions(hits).groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_dup_tokens")
    )
    return wins.join(cov, "doc_id").select(
        "doc_id", "n_dup_windows", "n_dup_tokens"
    )


def q_dup_span_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The excision: drop every covered position, emit the cleaned
    array's length and fingerprint per doc.  Docs with no duplicated
    span pass through with their original fingerprint."""
    t = injected_token_view(spark, sf_dir)
    cov = covered_positions(duplicated_spans(span_windows(t)))
    toks = t.select("doc_id", F.posexplode("toks").alias("pos", "tok")).select(
        "doc_id", F.col("pos").cast("long").alias("p"), "tok"
    )
    clean = toks.join(cov, ["doc_id", "p"], "left_anti")
    return (
        clean.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tok_clean"),
            md5int(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct(F.col("p"), F.col("tok")))
                        ),
                        lambda s: s["tok"].cast("string"),
                    ),
                    ",",
                )
            ).alias("clean_fp"),
        )
        .select("doc_id", "n_tok_clean", "clean_fp")
    )


def q_token_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-integer total-variation distance (ppm) between each
    source's token distribution and the corpus-wide one.

    p_s(t) = c_st·PPM DIV n_s, q(t) = c_t·PPM DIV n; TV×PPM =
    (Σ_present|p-q| + (Q - Σ_present q)) DIV 2 where Q = Σ_t q(t)
    (the absent-token mass enters via Q - Qp).  Identical integer ops
    in both engines — no float drift."""
    docs = load(spark, sf_dir, "documents", spread=True)
    t = docs.select("source", F.expr(_TOKENS_EXPR).alias("toks"))
    per = (
        t.select("source", F.explode("toks").alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per = per.persist()
    ns = per.groupBy("source").agg(F.sum("c").alias("n_s"))
    gl = per.groupBy("tok").agg(F.sum("c").alias("c_t"))
    n = gl.agg(F.sum("c_t").alias("n"))
    q = gl.crossJoin(F.broadcast(n)).select(
        "tok", F.expr(f"c_t * {PPM} DIV n").alias("q")
    )
    big_q = q.agg(F.sum("q").alias("Q"))
    j = (
        per.join(F.broadcast(ns), "source")
        .join(F.broadcast(q), "tok")
        .select("source", F.expr(f"c * {PPM} DIV n_s").alias("p"), "q")
    )
    s = j.groupBy("source").agg(
        F.sum(F.expr("abs(p - q)")).alias("s1"), F.sum("q").alias("qp")
    )
    out = (
        s.join(ns, "source")
        .crossJoin(F.broadcast(big_q))
        .select(
            "source",
            F.col("n_s").cast("long").alias("n_tokens"),
            F.expr("(s1 + Q - qp) DIV 2").cast("long").alias("tv_ppm"),
        )
        .orderBy("source")
    )
    from canal_spark.operators.common import attach_cached_deps

    return attach_cached_deps(out, [per])


# mirrors etl._TOKENS_EXPR exactly, including its hardening: NULL text
# coalesces to '' and empty words (consecutive/leading spaces) never
# hash phantom md5('') tokens — without both guards the oracle computes
# a DIFFERENT tokenizer than the Spark side on whitespace-odd text
_TOK_DUCK = (
    f"list_transform(list_filter(string_split(coalesce(text, ''), ' '), "
    f"w -> w != ''), "
    f"w -> CAST({duck_md5int('w')} % 50257 AS INT))"
)

_DUP_CTES = f"""
base AS (
  SELECT doc_id,
         CASE WHEN doc_id % {DUP_MOD} IN ({_REMS_SQL})
              -- concat_ws, not ||: Spark's injection NULL-SKIPS a null
              -- text (sentinel+boilerplate survive); || would NULL the
              -- whole doc and silently drop it from the oracle
              THEN concat_ws(' ', text,
                             'u' || CAST(doc_id AS VARCHAR), {_BOILER_DUCK})
              ELSE text END AS text
  FROM documents),
tok AS (SELECT doc_id, {_TOK_DUCK} AS toks FROM base),
sp AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
         md5(array_to_string(toks[i:i + {DUP_W - 1}], ',')) AS h
  FROM tok, UNNEST(generate_series(1, len(toks) - {DUP_W - 1})) AS u(i)),
dup AS (SELECT h FROM sp GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
hit AS (SELECT sp.doc_id, sp.pos, sp.h FROM sp JOIN dup USING (h)),
cov AS (SELECT DISTINCT doc_id, pos + o AS p
        FROM hit, UNNEST(generate_series(0, {DUP_W - 1})) AS z(o))
"""

SQL_DUP_SPAN_DETECT = f"""
WITH {_DUP_CTES},
wins AS (SELECT doc_id, count(*) AS n_dup_windows FROM hit GROUP BY doc_id),
covn AS (SELECT doc_id, count(*) AS n_dup_tokens FROM cov GROUP BY doc_id)
SELECT wins.doc_id,
       CAST(n_dup_windows AS BIGINT) AS n_dup_windows,
       CAST(n_dup_tokens AS BIGINT) AS n_dup_tokens
FROM wins JOIN covn USING (doc_id)
"""

SQL_DUP_SPAN_CUT = f"""
WITH {_DUP_CTES},
tp AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS p, toks[i] AS tok
       FROM tok, UNNEST(generate_series(1, len(toks))) AS u(i)),
clean AS (
  SELECT tp.doc_id, tp.p, tp.tok
  FROM tp LEFT JOIN cov ON tp.doc_id = cov.doc_id AND tp.p = cov.p
  WHERE cov.p IS NULL)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tok_clean,
       {duck_md5int("array_to_string(list(tok ORDER BY p), ',')")} AS clean_fp
FROM clean GROUP BY doc_id
"""

SQL_TOKEN_DRIFT = f"""
WITH tok AS (SELECT source, {_TOK_DUCK} AS toks FROM documents),
ex AS (SELECT source, u.tok FROM tok, UNNEST(toks) AS u(tok)),
per AS (SELECT source, tok, count(*) AS c FROM ex GROUP BY source, tok),
ns AS (SELECT source, sum(c) AS n_s FROM per GROUP BY source),
gl AS (SELECT tok, sum(c) AS c_t FROM per GROUP BY tok),
nn AS (SELECT sum(c_t) AS n FROM gl),
q AS (SELECT tok, (c_t * {PPM}) // (SELECT n FROM nn) AS q FROM gl),
qq AS (SELECT sum(q) AS bigq FROM q),
j AS (SELECT per.source, (per.c * {PPM}) // ns.n_s AS p, q.q AS q
      FROM per JOIN ns USING (source) JOIN q USING (tok)),
s AS (SELECT source, sum(abs(p - q)) AS s1, sum(q) AS qp FROM j GROUP BY source)
SELECT s.source, CAST(ns.n_s AS BIGINT) AS n_tokens,
       CAST((s1 + (SELECT bigq FROM qq) - qp) // 2 AS BIGINT) AS tv_ppm
FROM s JOIN ns USING (source) ORDER BY s.source
"""

QUERIES = {
    "dup_span_detect": q_dup_span_detect,
    "dup_span_cut": q_dup_span_cut,
    "token_drift": q_token_drift,
}

ORACLES = {
    "dup_span_detect": SQL_DUP_SPAN_DETECT,
    "dup_span_cut": SQL_DUP_SPAN_CUT,
    "token_drift": SQL_TOKEN_DRIFT,
}
