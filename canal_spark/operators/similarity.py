"""Similarity search over the `embeddings` table (array<float>, 64-d).

Brute-force cosine top-k as the exactness baseline, and an IVF-style
variant that searches only the query's coarse cluster (the `label`
column plays the centroid-assignment role).  All math is JVM-side
(`zip_with`/`aggregate` higher-order functions) in float64; ranking
rounds to 9 decimals to absorb summation-order ulp noise before the
deterministic (score, vec_id) tie-break, output scores round to 4.

Scale path: brute force is O(Q*N) — fine for a broadcast query set;
the IVF variant turns it into a per-cluster equi-join, the same plan
shape a 10^12-row ANN sweep needs (partition by cell, join within).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from canal_spark.operators.common import load

TOPK = 3
Q_MOD = 50  # vec_id % 50 == 0 -> query set


def _with_norm(df: DataFrame) -> DataFrame:
    vec = F.transform("embedding", lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(vec, vec, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    return df.select("vec_id", "label", vec.alias("v"), F.sqrt(dot).alias("norm"))


def _cosine(a, b, na, nb):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    return dot / (na * nb)


def q_embed_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = _with_norm(load(spark, sf_dir, "embeddings"))
    q = e.where(F.col("vec_id") % Q_MOD == 0).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"), F.col("norm").alias("qn")
    )
    n = e.select(
        F.col("vec_id").alias("n_id"), F.col("v").alias("nv"), F.col("norm").alias("nn")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(n)
        .where(F.col("q_id") != F.col("n_id"))
        .select(
            "q_id",
            "n_id",
            F.round(_cosine(F.col("qv"), F.col("nv"), F.col("qn"), F.col("nn")), 9).alias(
                "c9"
            ),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("c9"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOPK)
        .select(
            "q_id",
            "n_id",
            F.col("rank").cast("long").alias("rank"),
            F.round("c9", 4).alias("cosine"),
        )
    )


SQL_EMBED_COSINE_TOPK = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
scored AS (
  SELECT q.vec_id AS q_id, n.vec_id AS n_id,
         round(list_cosine_similarity(q.v, n.v), 9) AS c9
  FROM e q, e n
  WHERE q.vec_id % {Q_MOD} = 0 AND q.vec_id != n.vec_id),
ranked AS (
  SELECT q_id, n_id, c9,
         row_number() OVER (PARTITION BY q_id ORDER BY c9 DESC, n_id ASC) AS rank
  FROM scored)
SELECT q_id, n_id, CAST(rank AS BIGINT) AS rank, round(c9, 4) AS cosine
FROM ranked WHERE rank <= {TOPK}
"""


CENT_MOD = 41  # seeded coarse-centroid picks: vec_id % 41 == 1 (~n/41 cells)
NPROBE = 3  # queries search their top-3 nearest cells (multi-probe IVF)


def _centroid_scores(targets: DataFrame, full: DataFrame | None = None) -> DataFrame:
    """(vec_id, cent_id, cc): each target vector scored against the
    broadcast seeded-centroid set — K = n/CENT_MOD rows per vector,
    map-side.  Centroids always come from ``full`` (default: targets),
    never from a filtered subset."""
    cents = (full if full is not None else targets).where(
        F.col("vec_id") % CENT_MOD == 1
    ).select(
        F.col("vec_id").alias("cent_id"),
        F.col("v").alias("cv"),
        F.col("norm").alias("cn"),
    )
    return (
        targets.select("vec_id", "v", "norm")
        .crossJoin(F.broadcast(cents))
        .select(
            "vec_id",
            "cent_id",
            F.round(_cosine(F.col("v"), F.col("cv"), F.col("norm"), F.col("cn")), 9).alias("cc"),
        )
    )


def ivf_cells(e: DataFrame) -> DataFrame:
    """Real IVF coarse quantization: (vec_id, cell) where cell is the
    nearest seeded centroid by cosine (k-means-lite: deterministic seed
    picks, one assignment pass — the inverted-file structure an ANN
    sweep partitions by).

    Plan shape: every vector scores against the BROADCAST centroid set
    (K = n/CENT_MOD, bounded) and max_by picks the argmax — a map-side
    crossJoin + partial aggregate, no all-pairs anything; ties break on
    the lower centroid id for cross-engine determinism.
    """
    return _centroid_scores(e).groupBy("vec_id").agg(
        F.max_by(
            "cent_id", F.struct(F.col("cc"), (-F.col("cent_id")).alias("nid"))
        ).alias("cell")
    )


def q_embed_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe IVF ANN with REAL centroid assignment: vectors
    quantize to their nearest seeded centroid (ivf_cells); each query
    probes its NPROBE nearest cells and candidates come from the
    (probe-cell = data-cell) equi-join — the inverted-file sweep a
    10^12-row index partitions by, never a global cross join."""
    from pyspark.sql import Window

    e = _with_norm(load(spark, sf_dir, "embeddings"))
    cells = ivf_cells(e)
    queries = e.where(F.col("vec_id") % Q_MOD == 0)
    wp = Window.partitionBy("vec_id").orderBy(F.desc("cc"), F.asc("cent_id"))
    probes = (
        _centroid_scores(queries, full=e)
        .withColumn("_pr", F.row_number().over(wp))
        .where(F.col("_pr") <= NPROBE)
        .select(F.col("vec_id").alias("q_id"), F.col("cent_id").alias("cell"))
    )
    q = queries.select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qv"), F.col("norm").alias("qn"),
    ).join(probes, "q_id")
    n = e.select(
        F.col("vec_id").alias("n_id"),
        F.col("v").alias("nv"), F.col("norm").alias("nn"),
    ).join(cells.select(F.col("vec_id").alias("n_id"), "cell"), "n_id")
    scored = (
        F.broadcast(q)
        .join(n, "cell")
        .where(F.col("q_id") != F.col("n_id"))
        .select(
            "q_id",
            F.col("cell").cast("long").alias("cell"),
            "n_id",
            F.round(_cosine(F.col("qv"), F.col("nv"), F.col("qn"), F.col("nn")), 9).alias(
                "c9"
            ),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("c9"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 1)
        .select("q_id", "cell", "n_id", F.round("c9", 4).alias("cosine"))
    )


SQL_EMBED_IVF_TOPK = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
c AS (SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id % {CENT_MOD} = 1),
assign AS (
  SELECT e.vec_id, c.cent_id,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY round(list_cosine_similarity(e.v, c.cv), 9) DESC,
                                     c.cent_id ASC) AS rn
  FROM e, c),
cells AS (SELECT vec_id, cent_id AS cell FROM assign WHERE rn = 1),
probes AS (SELECT vec_id AS q_id, cent_id AS cell FROM assign
           WHERE rn <= {NPROBE} AND vec_id % {Q_MOD} = 0),
scored AS (
  SELECT p.q_id, CAST(p.cell AS BIGINT) AS cell, n.vec_id AS n_id,
         round(list_cosine_similarity(q.v, n.v), 9) AS c9
  FROM probes p
  JOIN e q ON q.vec_id = p.q_id
  JOIN cells cn ON cn.cell = p.cell
  JOIN e n ON n.vec_id = cn.vec_id AND n.vec_id != p.q_id),
ranked AS (
  SELECT q_id, cell, n_id, c9,
         row_number() OVER (PARTITION BY q_id ORDER BY c9 DESC, n_id ASC) AS rank
  FROM scored)
SELECT q_id, cell, n_id, round(c9, 4) AS cosine FROM ranked WHERE rank = 1
"""


def q_embed_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: candidates bucketed by
    `label` (LSH-cell stand-in) so the pair join is an equi-join within
    cells, then filtered by cosine >= 0.3.  At 10^12 rows this is the
    only viable shape — cell join + threshold, never a global cross
    join; emitted once per pair (a_id < b_id)."""
    e = _with_norm(load(spark, sf_dir, "embeddings"))
    a = e.select(F.col("vec_id").alias("a_id"), "label",
                 F.col("v").alias("av"), F.col("norm").alias("an"))
    b = e.select(F.col("vec_id").alias("b_id"), "label",
                 F.col("v").alias("bv"), F.col("norm").alias("bn"))
    return (
        a.join(b, "label")
        .where(F.col("a_id") < F.col("b_id"))
        .select(
            F.col("label").cast("long").alias("cell"),
            "a_id",
            "b_id",
            F.round(_cosine(F.col("av"), F.col("bv"), F.col("an"), F.col("bn")), 9).alias("c9"),
        )
        .where(F.col("c9") >= 0.3)
        .select("cell", "a_id", "b_id", F.round("c9", 4).alias("cosine"))
    )


SQL_EMBED_NEAR_DUP = """
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
pairs AS (
  SELECT CAST(a.label AS BIGINT) AS cell, a.vec_id AS a_id, b.vec_id AS b_id,
         round(list_cosine_similarity(a.v, b.v), 9) AS c9
  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
SELECT cell, a_id, b_id, round(c9, 4) AS cosine FROM pairs WHERE c9 >= 0.3
"""


QUERIES = {
    "embed_cosine_topk": q_embed_cosine_topk,
    "embed_ivf_topk": q_embed_ivf_topk,
    "embed_near_dup": q_embed_near_dup,
}

ORACLES = {
    "embed_cosine_topk": SQL_EMBED_COSINE_TOPK,
    "embed_ivf_topk": SQL_EMBED_IVF_TOPK,
    "embed_near_dup": SQL_EMBED_NEAR_DUP,
}
