"""Shared helpers for cross-engine (Spark vs DuckDB) deterministic ops.

The one nontrivial trick: a **deterministic 60-bit integer hash** both
engines compute identically — ``md5`` of the UTF-8 string, first 15 hex
digits, parsed base-16.  Verified: Spark
``conv(substr(md5(x),1,15),16,10)`` == DuckDB
``('0x'||substr(md5(x),1,15))::BIGINT`` (e.g. 'hello' ->
419982666956583591 in both).  This powers minhash/simhash/fingerprint
oracles without relying on engine-specific hash functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load(spark: SparkSession, sf_dir: str, name: str, spread: bool = False) -> DataFrame:
    """Read a fixture table.  ``spread=True`` repartitions a
    fewer-splits-than-cores input up to the default parallelism — for
    operators whose per-row work EXPLODES (shingling, per-word hashing,
    vector math), a single-row-group fixture file otherwise pins the
    whole expensive stage to ONE task.  The shuffle moves only the tiny
    raw input; at production scale the source has plenty of splits and
    the repartition is a no-op by the guard."""
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if spread:
        p = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < p:
            df = df.repartition(p)
    return df


def attach_cached_deps(df: DataFrame, deps: list[DataFrame]) -> DataFrame:
    """Tag a returned frame with the persisted frames it derives from.

    Query builders that persist an internal frame (band tables,
    signature frames — persisted because self-joins re-execute aliased
    subplans) can't unpersist it before returning: the caller hasn't
    run its action yet.  The tag hands ownership to the caller:
    `release_cached_deps(df)` once fully consumed.  Long-lived sessions
    (bench sweeps, services) MUST release, else each call leaks one
    MEMORY_AND_DISK copy of a corpus-scale frame for the session
    lifetime.

    Deps are FLATTENED: a dep that itself carries ``_cached_deps`` (a
    builder returning a derived view of its own persisted frame, e.g.
    the capped band table over the persisted uncapped one) hands those
    through, so the caller's single release reaches every persisted
    ancestor.  Unpersisting an unpersisted frame is a no-op, so listing
    intermediate views is harmless."""
    flat: list[DataFrame] = []
    for d in deps:
        flat.append(d)
        flat.extend(getattr(d, "_cached_deps", []))
    df._cached_deps = flat
    return df


def release_cached_deps(df: DataFrame) -> None:
    """Unpersist the frames `attach_cached_deps` tagged (no-op for
    untagged frames)."""
    for dep in getattr(df, "_cached_deps", []):
        dep.unpersist()


def md5int(col) -> "F.Column":
    """60-bit deterministic int from a string column (JVM-side)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def duck_md5int(expr: str) -> str:
    """DuckDB rendering of the same 60-bit hash."""
    return f"CAST(('0x'||substr(md5({expr}),1,15)) AS BIGINT)"


def _broadcast_prefix_offsets(spark, totals: DataFrame, zero):
    """Exclusive prefix sums of per-chunk totals, computed driver-side.

    The totals frame has ONE ROW PER CHUNK (n/chunk_width — manifest
    scale, never data scale; pick chunk width so this stays ~10^5-10^6
    at target scale, same contract as merge's driver-side manifest
    pruning).  Collecting it and prefix-summing in Python avoids the
    single-partition WindowExec a global running sum would need — the
    'broadcast per-partition offsets' half of the two-phase pattern.
    """
    from pyspark.sql.types import StructField, StructType

    # nulls-first sort key: a null chunk (e.g. chunked_row_number over a
    # null ts -> to_date null) must sort FIRST, matching the
    # single-partition window's nulls-first order this pattern replaces;
    # a bare key=r["_chunk"] would raise TypeError (None vs date).
    # groupBy guarantees at most one null-chunk row, so the tuple's
    # second element never compares None against None.
    rows = sorted(totals.collect(), key=lambda r: (r["_chunk"] is not None, r["_chunk"]))
    acc, out = zero, []
    for r in rows:
        out.append((r["_chunk"], acc))
        acc += r["_tot"]
    schema = StructType(
        [totals.schema["_chunk"], StructField("_off", totals.schema["_tot"].dataType)]
    )
    return F.broadcast(spark.createDataFrame(out, schema))


def chunked_cumsum(
    df: DataFrame,
    order_col: str,
    value_col,
    out_col: str,
    chunk_width: int,
) -> DataFrame:
    """Scale-safe global running sum over a numeric, unique order key.

    A bare ``sum().over(Window.orderBy(k))`` funnels the whole table
    through ONE task (Spark's 'No Partition Defined' WindowExec).  This
    is the standard two-phase restatement:

      1. chunk rows by a *deterministic, monotone* function of the order
         key (``floor(k / chunk_width)``) — no sampling pass, identical
         chunking on every recompute, unlike repartitionByRange;
      2. per-chunk running sum (window partitioned by chunk — parallel);
      3. per-chunk totals get exclusive prefix offsets driver-side
         (bounded by the chunk count, not the row count);
      4. broadcast-join offsets back: global = local + offset.

    Result is value-identical to the single-partition plan.
    """
    from pyspark.sql import Window

    spark = df.sparkSession
    value = F.col(value_col) if isinstance(value_col, str) else value_col
    # null values count as 0 — the SAME rule in the chunk-local window
    # and the per-chunk totals, so the two phases compose exactly (a
    # chunk whose values are all null would otherwise sum to NULL,
    # crashing the driver-side prefix accumulation and yielding NULL
    # local sums where the composed total should carry forward)
    value = F.coalesce(value, F.lit(0))
    d = df.withColumn("_chunk", F.floor(F.col(order_col) / F.lit(chunk_width)))
    w_local = Window.partitionBy("_chunk").orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    d = d.withColumn("_loc", F.sum(value).over(w_local))
    totals = d.groupBy("_chunk").agg(F.sum(value).alias("_tot"))
    offs = _broadcast_prefix_offsets(spark, totals, 0)
    # null-safe join: a plain equi-join on a null chunk silently DROPS
    # those rows (null != null), where the window this replaces kept them
    return (
        d.join(offs, d["_chunk"].eqNullSafe(offs["_chunk"]))
        .drop(offs["_chunk"])
        .withColumn(out_col, F.col("_loc") + F.col("_off"))
        .drop("_chunk", "_loc", "_off")
    )


def chunked_row_number(
    df: DataFrame,
    order_cols: list[str],
    chunk_col,
    out_col: str,
) -> DataFrame:
    """Scale-safe global row_number over a total order.

    ``chunk_col`` must be a deterministic expression MONOTONE in the
    order key (e.g. the day of an event-time order) so chunk-local
    ranks + broadcast chunk-count prefix offsets compose into the exact
    global sequence — same two-phase shape as chunked_cumsum, zero
    single-partition windows.
    """
    from pyspark.sql import Window

    spark = df.sparkSession
    d = df.withColumn("_chunk", chunk_col)
    w_local = Window.partitionBy("_chunk").orderBy(*order_cols)
    d = d.withColumn("_loc", F.row_number().over(w_local).cast("long"))
    totals = d.groupBy("_chunk").agg(F.count("*").alias("_tot"))
    offs = _broadcast_prefix_offsets(spark, totals, 0)
    # null-safe join: see chunked_cumsum — null chunks must not vanish
    return (
        d.join(offs, d["_chunk"].eqNullSafe(offs["_chunk"]))
        .drop(offs["_chunk"])
        .withColumn(out_col, F.col("_loc") + F.col("_off"))
        .drop("_chunk", "_loc", "_off")
    )


def propagate_min_labels(
    spark: SparkSession,
    pairs: DataFrame,
    doc_a: str = "doc_a",
    doc_b: str = "doc_b",
    max_rounds: int = 50,
) -> DataFrame:
    """Connected components of an undirected candidate-pair graph:
    every node gets its component's MIN member as label — iterative
    min-label propagation, the DataFrame restatement of GraphX
    connected components; works for numeric AND string node ids.

    Distributed shape: edges persist HASH-PARTITIONED ON THE JOIN KEY
    (every round joins on it, so the pair-scale reused frame shuffles
    once, not once per round); rounds checkpoint to truncate the
    multiplicatively-growing iterative lineage (reliable checkpoint
    when a dir is configured — executor loss at 10^9-edge scale
    recovers from the last round); convergence is witnessed by a
    per-round hash-sum fingerprint of the (node, label) assignment —
    one cheap agg that also materializes the lazy checkpoint, no
    join-and-count.  Raises (never silently wrong) if the graph's
    diameter exceeds ``max_rounds``.
    """
    edges = (
        pairs.select(F.col(doc_a).alias("doc_a"), F.col(doc_b).alias("doc_b"))
        .unionByName(
            pairs.select(
                F.col(doc_b).alias("doc_a"), F.col(doc_a).alias("doc_b")
            )
        )
        .repartition("doc_a")
        .persist()
    )
    sc = spark.sparkContext
    reliable = sc.getCheckpointDir() is not None

    def _ckpt(df: DataFrame) -> DataFrame:
        return df.checkpoint(eager=False) if reliable else df.localCheckpoint(eager=False)

    labels = _ckpt(
        edges.select(F.col("doc_a").alias("doc"))
        .distinct()
        .withColumn("lbl", F.col("doc"))
    )
    prev_fp, converged = None, False
    for _ in range(max_rounds):
        prop = (
            edges.join(labels, edges["doc_a"] == labels["doc"])
            .select(F.col("doc_b").alias("doc"), "lbl")
        )
        nbr = labels.unionByName(prop).groupBy("doc").agg(
            F.min("lbl").alias("lbl")
        )
        # path halving (pointer jumping): also adopt the label OF the
        # label — lbl(x) is a node in x's component whose own label is
        # <= lbl(x) (labels are min-monotone), so min(lbl, lbl(lbl))
        # stays in-component and preserves the fixed point while
        # squaring the convergence rate: O(log diameter) rounds instead
        # of O(diameter).  At 10^9-edge scale each saved round is a
        # full pass over the edge frame; the halving join touches only
        # the node-scale label frame.
        hop = nbr.select(F.col("doc").alias("_ld"), F.col("lbl").alias("_ll"))
        new_labels = _ckpt(
            nbr.join(hop, nbr["lbl"] == hop["_ld"], "left").select(
                "doc",
                F.least(
                    F.col("lbl"), F.coalesce(F.col("_ll"), F.col("lbl"))
                ).alias("lbl"),
            )
        )
        # assignment fingerprint: unchanged labels -> identical sum; a
        # changed round colliding back to the same sum is ~2^-64 per
        # round and bounded by max_rounds + the raise below.  The sum
        # runs in decimal(38,0): full-range int64 hashes overflow a
        # long accumulator under ANSI mode.
        cur_fp = new_labels.agg(
            F.sum(
                F.xxhash64(
                    F.col("doc").cast("string"), F.col("lbl").cast("string")
                ).cast("decimal(38,0)")
            )
        ).collect()[0][0]
        labels = new_labels
        if cur_fp == prev_fp:
            converged = True
            break
        prev_fp = cur_fp
    edges.unpersist()
    if not converged:
        raise RuntimeError(
            f"label propagation did not converge in {max_rounds} rounds — "
            "raise max_rounds for this graph"
        )
    return labels
