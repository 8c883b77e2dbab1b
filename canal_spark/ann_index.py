"""Maintained IVF (ANN) cell index — similarity search wired into the
maintenance pass.

The driver-query operators (`operators/similarity.py`) train a codebook
and assign cells from scratch per query; a production pass over a
10^12-vector corpus instead MAINTAINS the inverted file as a lakehouse
table of its own (`vec_id, cell` — the coarse-quantizer assignment) and,
per changelog batch, only

  1. rewrites the index files whose vec_id range overlaps the batch's
     changed keys (same manifest min/max pruning as the data merge),
  2. re-assigns cells from the CURRENT post-merge embedding table for
     those keys (deleted vectors simply have no rows -> they vanish),
  3. keeps the codebook FROZEN across batches (stored as a parquet
     artifact under the index root, pinned by table properties) so cell
     ids stay comparable — retraining is an explicit full rebuild that
     bumps ``codebook-version``.

Reference parity: the ES/HBase derived-store pattern again
(client-adapter/.../ESSyncService.java sync-by-affected-keys) — the
derived "view" here is the ANN inverted file instead of a search
document; FAISS-style serving does exactly this split (codebook trained
rarely, assignments maintained incrementally).

Scale notes: refresh work is O(batch + overlapping index files); the
assignment is the shared vectorized Arrow kernel
(`operators.similarity._assign_cell_udf` — one numpy matmul per batch,
zero shuffles) against an O(K)-row codebook, so the collect is constant
at any corpus size.  ``ann_search`` serves top-k through the index: the
(small) query side broadcasts into an equi-join on cell, candidates
semi-join back into the embedding table by key — the 10^12-row side
never shuffles and never cross-joins.
"""

from __future__ import annotations

import os
import shutil
import uuid
from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from canal_spark.operators.similarity import (
    IVF_K,
    NPROBE,
    SEM_EPS,
    _assign_cell_cc_udf,
    _assign_cell_udf,
    _collect_cents,
    _cosine,
    _probe_cells_expr,
    ivf_centroids,
    semantic_losers,
)
from canal_spark.table.format import Table, create_table
from canal_spark.table.writer import write_datafiles

IVF_INDEX_SCHEMA = StructType(
    [
        StructField("vec_id", LongType(), False),
        StructField("cell", LongType(), False),
    ]
)

CODEBOOK_SCHEMA = StructType(
    [
        StructField("cent_id", LongType(), False),
        StructField("cv", ArrayType(DoubleType(), False), False),
        StructField("cn", DoubleType(), False),
    ]
)

CODEBOOK_PATH_PROP = "ivf-codebook-path"
CODEBOOK_VERSION_PROP = "ivf-codebook-version"


def create_ivf_index(root: str) -> Table:
    """An empty IVF index table (keyed by vec_id for manifest pruning)."""
    return create_table(root, IVF_INDEX_SCHEMA, properties={"key-cols": "vec_id"})


def load_or_create_ivf_index(root: str) -> Table:
    """Load an existing IVF index or create an empty one (the first
    refresh on an empty index full-trains the codebook) — the shared
    bootstrap for every entry point that takes an index ROOT."""
    from canal_spark.table.format import load_table

    if os.path.exists(os.path.join(root, "metadata")):
        return load_table(root)
    return create_ivf_index(root)


def expire_codebooks(index_table: Table) -> list[str]:
    """Reclaim superseded codebook artifacts: every ``codebook/cb-*``
    directory except the currently pinned one and the single most
    recent superseded one (kept as a grace generation for readers that
    loaded the pin just before the rebuild committed).  Without this,
    each full retrain leaks one O(K×dims) parquet directory forever —
    `remove_orphan_files` only sweeps `data/`.  Returns deleted paths."""
    cur = index_table.refresh().properties.get(CODEBOOK_PATH_PROP)
    cb_dir = os.path.join(index_table.root, "codebook")
    if not os.path.isdir(cb_dir):
        return []
    def _mtime(p: str) -> float:
        # a concurrent expire (two rebuilds racing on one index) can
        # delete an entry between listdir and here; it must sort as
        # oldest and no-op in the guarded rmtree, not raise after this
        # caller's commit already succeeded
        try:
            return os.path.getmtime(p)
        except FileNotFoundError:
            return 0.0

    stale = sorted(
        (
            os.path.join(cb_dir, name)
            for name in os.listdir(cb_dir)
            if name.startswith("cb-")
            and (cur is None or os.path.join("codebook", name) != cur)
        ),
        key=_mtime,
    )
    removed = []
    for path in stale[:-1]:  # keep the newest superseded generation
        shutil.rmtree(path, ignore_errors=True)
        removed.append(path)
    return removed


def _emb_frame(emb_table: Table, spark: SparkSession, emb_col: str) -> DataFrame:
    """(vec_id, v, norm) from the embedding table's live scan."""
    key = emb_table.key_cols[0]
    vec = F.transform(emb_col, lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(vec, vec, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    # cast to the index schema's LongType here so BOTH write paths
    # (full rebuild selects this frame's vec_id directly, incremental
    # casts explicitly) put the same parquet type in index files even
    # when the embedding table's key column is a narrower int type
    return emb_table.scan(spark).select(
        F.col(key).cast("long").alias("vec_id"),
        vec.alias("v"),
        F.sqrt(dot).alias("norm"),
    )


def _write_codebook(
    spark: SparkSession, index_table: Table, cent_rows: list
) -> str:
    """Persist the codebook as a parquet artifact under the index root.

    A property-embedded JSON codebook would bloat every metadata version
    at real K (2^16-2^20 cells x dims); a pinned file is how Iceberg
    handles puffin/stat artifacts.  O(K) rows — one driver write."""
    rel = f"codebook/cb-{uuid.uuid4().hex[:12]}.parquet"
    path = os.path.join(index_table.root, rel)
    spark.createDataFrame(
        [(int(cid), [float(x) for x in cv], float(cn)) for cid, cv, cn in cent_rows],
        CODEBOOK_SCHEMA,
    ).coalesce(1).write.mode("overwrite").parquet(path)
    return rel


def load_codebook(spark: SparkSession, index_table: Table) -> list:
    """The pinned codebook as `_collect_cents` rows — O(K) driver-side."""
    rel = index_table.properties.get(CODEBOOK_PATH_PROP)
    if not rel:
        raise ValueError(
            "index has no trained codebook — run a full refresh_ivf_index first"
        )
    df = spark.read.schema(CODEBOOK_SCHEMA).parquet(
        os.path.join(index_table.root, rel)
    )
    return _collect_cents(
        df.select("cent_id", F.col("cv"), F.col("cn"))
    )


@dataclass
class IvfIndexResult:
    applied: bool
    full_rebuild: bool = False
    snapshot_id: int | None = None
    vecs_changed: int = 0
    rows_written: int = 0
    files_rewritten: int = 0
    files_pruned: int = 0
    codebook_version: int = 0
    job_id: str = ""
    extra: dict = field(default_factory=dict)


def refresh_ivf_index(
    spark: SparkSession,
    emb_table: Table,
    index_table: Table,
    keys: DataFrame | None = None,
    emb_col: str = "embedding",
    max_driver_keys: int = 2_000_000,
    max_broadcast_keys: int = 5_000_000,
    target_file_rows: int = 4_000_000,
    job_id: str | None = None,
) -> IvfIndexResult:
    """Bring the IVF index in sync with ``emb_table``.

    ``keys=None`` (or an empty index) -> full rebuild: train a fresh
    codebook (fixed K — `operators.similarity.ivf_centroids`), assign
    every vector, range-write by vec_id so per-file min/max stats prune
    future incremental refreshes.  Otherwise incremental: index files
    overlapping the changed vec_ids rewrite copy-on-write, cells for the
    changed keys re-assign from the CURRENT embedding table under the
    FROZEN codebook (deletes fall out naturally; replay is idempotent).
    """
    from canal_spark.merge import _affected_files

    job_id = job_id or uuid.uuid4().hex[:12]
    entries = index_table.files()
    full = keys is None or not entries

    if full:
        e = _emb_frame(emb_table, spark, emb_col)
        cent_rows = _collect_cents(ivf_centroids(e))
        rel = _write_codebook(spark, index_table, cent_rows)
        version = int(index_table.properties.get(CODEBOOK_VERSION_PROP, "0")) + 1
        assigned = e.select(
            "vec_id", _assign_cell_udf(cent_rows)("v").cast("long").alias("cell")
        )
        n_out = max(1, spark.sparkContext.defaultParallelism)
        new_entries = write_datafiles(
            spark,
            index_table,
            assigned.repartitionByRange(n_out, "vec_id"),
            sort_within_by=["vec_id"],
        )
        snap = index_table.commit(
            added=new_entries,
            removed_paths=[x.path for x in entries],
            operation="overwrite",
            summary={"job-id": job_id, "phase": "ivf_index", "rebuild": "full"},
            new_properties={
                CODEBOOK_PATH_PROP: rel,
                CODEBOOK_VERSION_PROP: str(version),
            },
        )
        # commit succeeded: the previous codebook is unpinned — reclaim
        # all but the newest superseded generation (retrain hygiene)
        expire_codebooks(index_table)
        return IvfIndexResult(
            applied=True,
            full_rebuild=True,
            snapshot_id=snap.snapshot_id,
            vecs_changed=-1,
            rows_written=sum(x.rows for x in new_entries),
            files_rewritten=len(entries),
            codebook_version=version,
            job_id=job_id,
        )

    cent_rows = load_codebook(spark, index_table)
    version = int(index_table.properties.get(CODEBOOK_VERSION_PROP, "0"))
    key_col = emb_table.key_cols[0]
    keys_df = keys.select(F.col(keys.columns[0]).alias("vec_id")).distinct().persist()
    try:
        n_keys = keys_df.count()
        if n_keys == 0:
            return IvfIndexResult(applied=False, job_id=job_id)

        # same gate as merge_into: batch-sized key sets broadcast, a
        # huge backfill joins unhinted (AQE picks the strategy) instead
        # of forcing a multi-million-key broadcast
        def keys_side(df):
            return F.broadcast(df) if n_keys <= max_broadcast_keys else df

        vec = F.transform(emb_col, lambda x: x.cast("double"))
        delta = (
            emb_table.scan(spark)
            .join(
                keys_side(keys_df.select(F.col("vec_id").alias("_k"))),
                F.col(key_col) == F.col("_k"),
                "leftsemi",
            )
            .select(F.col(key_col).cast("long").alias("vec_id"), vec.alias("v"))
            .select(
                "vec_id",
                _assign_cell_udf(cent_rows)("v").cast("long").alias("cell"),
            )
            .persist()
        )

        if n_keys <= max_driver_keys:
            key_arr = np.sort(
                np.array([int(r[0]) for r in keys_df.collect()], dtype=object)
            )
            affected, untouched = _affected_files(entries, key_arr, "vec_id")
        else:
            affected, untouched = entries, []

        n_delta = delta.count()
        if not affected and n_delta == 0:
            return IvfIndexResult(
                applied=False,
                vecs_changed=int(n_keys),
                files_pruned=len(untouched),
                codebook_version=version,
                job_id=job_id,
            )
        new_entries = []
        if affected:
            keep = index_table.read_files(spark, affected).join(
                keys_side(keys_df), "vec_id", "left_anti"
            )
            new_entries += write_datafiles(
                spark, index_table, keep, sort_within_by=["vec_id"]
            )
        if n_delta > 0:
            m_out = max(1, -(-n_delta // target_file_rows))
            new_entries += write_datafiles(
                spark,
                index_table,
                delta.repartitionByRange(m_out, "vec_id"),
                sort_within_by=["vec_id"],
            )
        snap = index_table.commit(
            added=new_entries,
            removed_paths=[x.path for x in affected],
            operation="overwrite",
            summary={
                "job-id": job_id,
                "phase": "ivf_index",
                "keys-changed": int(n_keys),
                "files-pruned": len(untouched),
            },
        )
        return IvfIndexResult(
            applied=True,
            snapshot_id=snap.snapshot_id,
            vecs_changed=int(n_keys),
            rows_written=int(n_delta),
            files_rewritten=len(affected),
            files_pruned=len(untouched),
            codebook_version=version,
            job_id=job_id,
        )
    finally:
        try:
            delta.unpersist()
        except Exception:
            pass
        keys_df.unpersist()


def ann_search(
    spark: SparkSession,
    emb_table: Table,
    index_table: Table,
    query_df: DataFrame,
    emb_col: str = "embedding",
    k: int = 3,
    nprobe: int = NPROBE,
) -> DataFrame:
    """Top-k cosine neighbors of ``query_df`` (columns: q_id, qv —
    array<float/double>) through the maintained index.

    Plan shape: queries (small, broadcast) explode into their nprobe
    nearest cells against the O(K) codebook — map-side, no shuffle;
    the index equi-joins on cell to produce candidate vec_ids; the
    embedding table joins candidates BY KEY to fetch vectors (its scan
    prunes by the candidate key range at real scale); one windowed
    top-k per query.  The corpus-scale side never cross-joins."""
    from pyspark.sql import Window

    cent_rows = load_codebook(spark, index_table)
    qv = F.transform("qv", lambda x: x.cast("double"))
    qdot = F.aggregate(
        F.zip_with(qv, qv, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    q = query_df.select(
        "q_id", qv.alias("v"), F.sqrt(qdot).alias("norm")
    ).select(
        F.col("q_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qn"),
        F.explode(_probe_cells_expr(cent_rows, nprobe)).alias("cell"),
    )
    cand = F.broadcast(q).join(index_table.scan(spark), "cell")
    e = _emb_frame(emb_table, spark, emb_col).select(
        F.col("vec_id"), F.col("v").alias("nv"), F.col("norm").alias("nn")
    )
    scored = (
        cand.join(e, "vec_id")
        .where(F.col("q_id") != F.col("vec_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("n_id"),
            F.round(
                _cosine(F.col("qv"), F.col("nv"), F.col("qn"), F.col("nn")), 9
            ).alias("c9"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("c9"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "q_id", "n_id", F.col("rank").cast("long").alias("rank"),
            F.round("c9", 4).alias("cosine"),
        )
    )


@dataclass
class SemanticPruneResult:
    """Outcome of one SemDedup pass over the embedding table."""

    applied: bool
    dry_run: bool = False
    vecs_scored: int = 0
    losers_removed: int = 0
    snapshot_id: int | None = None
    codebook_version: int = 0
    wap: dict = field(default_factory=dict)
    index_refresh: dict = field(default_factory=dict)
    job_id: str = ""


def semantic_prune_pass(
    spark: SparkSession,
    emb_table: Table,
    index_table: Table,
    eps: float = SEM_EPS,
    emb_col: str = "embedding",
    dry_run: bool = False,
    wap: bool = False,
    max_delete_fraction: float = 0.5,
    job_id: str | None = None,
) -> SemanticPruneResult:
    """SemDedup as a MAINTENANCE VERB (the embedding-space sibling of
    `dedup_index.corpus_dedup_pass`): under the index's FROZEN codebook,
    drop every vector whose IVF cell holds a semantic duplicate
    (9-rounded cosine >= ``eps``) ranking better by the
    keep-furthest-from-centroid rule (cc ASC, vec_id ASC — the
    `operators.similarity.q_semantic_dedup` tournament, so the pass and
    the driver query can never disagree on who survives a given cell).
    Losers apply as a DELETE changelog through the ordinary MERGE, then
    their index rows drop via the incremental refresh.

    Scale shape: like the SemDedup paper this is inherently a
    full-corpus pass — ONE map-side Arrow kernel pass computes (cell,
    cc) per vector (the frozen codebook makes recomputation exactly
    equal to the maintained index rows, and one matmul beats a
    corpus-scale index join just to avoid it), persisted once; the
    duplicate probe is the cell-keyed LEFT SEMI self-join (cells are
    corpus/K); the deletes flow through `merge_into`'s manifest-pruned
    COW.  Safety contract shared with corpus self-dedup: the merge is
    OUT-OF-BAND (`advance_checkpoint=False` — engine-generated deletes
    never shadow an unapplied upstream event), ``wap=True`` stages and
    audits with the runaway-delete bound ``max_delete_fraction``,
    ``dry_run`` touches nothing, a crash between the delete merge and
    the index refresh self-heals on re-run (stale index keys fold into
    the refresh set), and a re-run finds no losers -> no-op idempotence.
    """
    from canal_spark.merge import merge_into

    job_id = job_id or uuid.uuid4().hex[:12]
    if CODEBOOK_PATH_PROP not in index_table.refresh().properties:
        raise ValueError(
            "semantic_prune_pass needs a trained codebook — run "
            "refresh_ivf_index (full build) first"
        )
    cent_rows = load_codebook(spark, index_table)
    version = int(index_table.properties.get(CODEBOOK_VERSION_PROP, "0"))

    e = _emb_frame(emb_table, spark, emb_col)
    asg = _assign_cell_cc_udf(cent_rows)
    assigned = (
        e.select("vec_id", "v", "norm", asg("v").alias("_a"))
        .select(
            "vec_id", "v", "norm",
            F.col("_a.cell").alias("cell"), F.col("_a.cc").alias("cc"),
        )
        .persist()
    )
    losers = None
    try:
        n_vecs = assigned.count()
        losers = (
            semantic_losers(assigned, eps)
            .select(F.col("a_id").alias("vec_id"))
            .persist()
        )
        n_losers = losers.count()
        rep = SemanticPruneResult(
            applied=False, dry_run=dry_run, vecs_scored=int(n_vecs),
            losers_removed=int(n_losers), codebook_version=version,
            job_id=job_id,
        )
        if dry_run:
            return rep

        # self-heal index drift first (keys in the index but gone from
        # the table — e.g. a prior pass that crashed after its delete
        # merge): fold them into the refresh set so the interrupted
        # repair completes on re-run
        stale = index_table.scan(spark).select("vec_id").distinct().join(
            e.select("vec_id"), "vec_id", "left_anti"
        )
        refresh_keys = losers.unionByName(stale).distinct()

        if n_losers > 0:
            key_col = emb_table.key_cols[0]
            schema = emb_table.spark_schema()
            sel = [
                F.lit(1).cast("long").alias("ordinal"),
                F.lit("D").alias("op"),
            ]
            for fld in schema.fields:
                if fld.name == key_col:
                    sel.append(
                        F.col("vec_id").cast(fld.dataType).alias(fld.name)
                    )
                else:
                    sel.append(F.lit(None).cast(fld.dataType).alias(fld.name))
            m = merge_into(
                spark, emb_table, losers.select(*sel), job_id=job_id,
                stage_only=wap, advance_checkpoint=False,
            )
            rep.applied = m.applied
            rep.snapshot_id = m.snapshot_id
            if wap and m.applied:
                from canal_spark.maintenance import wap_finalize, wap_parent_rows

                rep.wap = wap_finalize(
                    spark, emb_table, m,
                    parent_rows=wap_parent_rows(spark, emb_table),
                    max_delete_fraction=max_delete_fraction,
                )
                if not rep.wap["published"]:
                    rep.applied = False
                    return rep
        elif stale.isEmpty():
            return rep  # nothing to remove, nothing to repair

        r = refresh_ivf_index(
            spark, emb_table, index_table, keys=refresh_keys,
            emb_col=emb_col, job_id=job_id,
        )
        rep.index_refresh = {
            "applied": r.applied, "vecs_changed": r.vecs_changed,
            "files_rewritten": r.files_rewritten, "snapshot_id": r.snapshot_id,
        }
        return rep
    finally:
        if losers is not None:
            losers.unpersist()
        assigned.unpersist()
