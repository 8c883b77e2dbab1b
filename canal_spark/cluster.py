"""Data clustering: Z-order (Morton) with Hilbert-curve fallback.

Keys are computed exactly as BASELINE.json.north_star prescribes:
over ``(source, xxhash64(doc_id))`` — the hash runs JVM-side
(``F.xxhash64``, zero Python), and the bit-interleave / Hilbert index
runs in **vectorized pandas/Arrow UDFs** over numpy uint64 arrays
(no per-row Python).  This is the engine's only custom compute kernel,
the batched analogue of the reference's pluggable per-row hooks
(sink/.../CanalEventDownStreamHandler.java).

The clustered rewrite is ``repartitionByRange(zkey)`` (range exchange
with sampled bounds — balanced output files regardless of key skew)
+ ``sortWithinPartitions(zkey)`` + one file per range, committed as a
scan-equivalent ``replace`` snapshot.  Locality effect: rows of one
``source`` with nearby key hashes co-locate, so manifest min/max
stats on (source, hash) tighten and point/partition scans prune.

Both curves use 31 bits per dimension so the 62-bit key stays positive
in a signed int64 (ordering-safe in Spark's LongType).
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf

from canal_spark.table.format import Table
from canal_spark.table.writer import write_datafiles

BITS = 31  # per-dimension


# --------------------------------------------------------------------------
# vectorized curve kernels (numpy, executed inside Arrow batches)
# --------------------------------------------------------------------------


def _spread_bits_u64(x: np.ndarray) -> np.ndarray:
    """Insert a 0 between each of the low 32 bits (Morton spread)."""
    x = x.astype(np.uint64) & np.uint64(0xFFFFFFFF)
    x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
    return x


def morton_interleave(a: np.ndarray, b: np.ndarray, bits: int = BITS) -> np.ndarray:
    """62-bit Morton key from two arrays, top `bits` of each dim."""
    mask = np.uint64((1 << bits) - 1)
    a = a.astype(np.uint64) & mask
    b = b.astype(np.uint64) & mask
    return (_spread_bits_u64(a) << np.uint64(1)) | _spread_bits_u64(b)


def hilbert_index_2d(x: np.ndarray, y: np.ndarray, bits: int = BITS) -> np.ndarray:
    """Vectorized 2-D Hilbert curve index (xy -> d), `bits` per dim.

    Classic iterative rotation algorithm, numpy-vectorized: loops over
    ``bits`` levels (31 iterations), each step O(n) branch-free.
    """
    mask = np.uint64((1 << bits) - 1)
    x = x.astype(np.uint64) & mask
    y = y.astype(np.uint64) & mask
    rx = np.zeros_like(x)
    ry = np.zeros_like(y)
    d = np.zeros_like(x)
    s = np.uint64(1 << (bits - 1))
    one = np.uint64(1)
    zero = np.uint64(0)
    while s > 0:
        rx = np.where((x & s) > 0, one, zero)
        ry = np.where((y & s) > 0, one, zero)
        d += s * s * ((np.uint64(3) * rx) ^ ry)
        # rotate quadrant
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = np.where(flip, (s - one) - x, x)
        y_f = np.where(flip, (s - one) - y, y)
        x, y = np.where(swap, y_f, x_f), np.where(swap, x_f, y_f)
        s >>= one
    return d


# --------------------------------------------------------------------------
# Spark column builders
# --------------------------------------------------------------------------


def with_cluster_key(
    df: DataFrame,
    curve: str = "zorder",  # "zorder" | "hilbert"
    key_col: str = "_ckey",
    doc_col: str | list[str] = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Add the clustering key column over (source, xxhash64(doc_id)).

    Dim A = top 31 bits of the JVM xxhash64 of the key column(s) —
    composite keys hash together; dim B = a 31-bit hash of source
    (low-cardinality dim; hashing spreads its codes across the curve
    without a dictionary lookup/shuffle).
    """
    doc_cols = [doc_col] if isinstance(doc_col, str) else list(doc_col)
    h_doc = F.xxhash64(*[F.col(c) for c in doc_cols])
    h_src = F.xxhash64(F.col(source_col))

    if curve == "zorder":

        @pandas_udf("long")
        def _zkey(a: pd.Series, b: pd.Series) -> pd.Series:
            av = (a.to_numpy().astype(np.int64).view(np.uint64)) >> np.uint64(33)
            bv = (b.to_numpy().astype(np.int64).view(np.uint64)) >> np.uint64(33)
            return pd.Series(morton_interleave(av, bv).view(np.int64))

        return df.withColumn(key_col, _zkey(h_src, h_doc))

    if curve == "hilbert":

        @pandas_udf("long")
        def _hkey(a: pd.Series, b: pd.Series) -> pd.Series:
            av = (a.to_numpy().astype(np.int64).view(np.uint64)) >> np.uint64(33)
            bv = (b.to_numpy().astype(np.int64).view(np.uint64)) >> np.uint64(33)
            return pd.Series(hilbert_index_2d(av, bv).view(np.int64))

        return df.withColumn(key_col, _hkey(h_src, h_doc))

    raise ValueError(f"unknown curve {curve!r}")


def cluster_dims(table) -> tuple[str | None, str]:
    """The table's ``(stratum dim or None, curve source column)``.

    The curve source column is the first partition column when the
    table is partitioned, else the first key column.  This is the ONE
    definition every ``with_cluster_key`` call site uses — the cluster
    pass, compaction's in-bin re-sort, and merge's keep-path rewrite
    all stamp files with the same ``sort_order`` tag, so a dim-selection
    change applied at one site but not the others would silently mix
    incompatible curve sort orders under a single tag (files claim the
    same order but sort by different dims, breaking pruning).
    """
    dim = table.partition_by[0] if table.partition_by else None
    return dim, (dim if dim is not None else table.key_cols[0])


# --------------------------------------------------------------------------
# clustering metrics (stat tightness)
# --------------------------------------------------------------------------


def measure_tightness(
    spark: SparkSession,
    table: Table,
    snapshot_id: int | None = None,
    entries: list | None = None,
) -> dict:
    """Avg normalized per-file min/max width of xxhash64(doc_id), plus
    avg distinct sources per file.  Lower = tighter stats = better
    pruning.  Column-pruned scan (doc_id, source only).

    Pass ``entries`` to measure a SUBSET of files — the incremental
    cluster pass measures only what it rewrites, keeping the metric
    O(delta); a full-table measurement per pass would be two whole
    scans of a 100 TB table for bookkeeping."""
    if entries is None:
        entries = table.files(snapshot_id)
    if not entries:
        return {"hash_range": 1.0, "sources_per_file": 0.0, "files": 0}
    key_cols = table.key_cols
    dim_col = cluster_dims(table)[1]
    rows = (
        table.read_files(spark, entries, with_file_path="fp")
        .select(
            "fp",
            F.xxhash64(*[F.col(c) for c in key_cols]).alias("h"),
            F.col(dim_col).alias("source"),
        )
        .groupBy("fp")
        .agg(
            F.min("h").alias("mn"),
            F.max("h").alias("mx"),
            F.countDistinct("source").alias("nsrc"),
        )
        .collect()
    )
    width = float(2**64)
    ranges = [(r["mx"] - r["mn"]) / width for r in rows]
    return {
        "hash_range": float(np.mean(ranges)) if ranges else 1.0,
        "sources_per_file": float(np.mean([r["nsrc"] for r in rows])),
        "files": len(rows),
    }


# --------------------------------------------------------------------------
# the clustering job
# --------------------------------------------------------------------------


@dataclass
class ClusterResult:
    snapshot_id: int
    curve: str
    files_before: int
    files_after: int
    tightness_before: dict
    tightness_after: dict
    job_id: str


def cluster(
    spark: SparkSession,
    table: Table,
    curve: str = "zorder",
    target_file_rows: int = 500_000,
    measure: bool = True,
    scope: str = "incremental",  # "incremental" | "full"
    job_id: str | None = None,
    branch: str | None = None,
) -> ClusterResult:
    """Cluster the table along the chosen curve.

    ``branch``: operate ON a writable branch (the branch-pass flow):
    victims, pending deletes and the commit all pin to the branch head;
    mainline readers see nothing until ``fast_forward``.

    ``scope="incremental"`` (default) rewrites ONLY files not already
    tagged with this curve's sort order — i.e. what merge/compaction
    produced since the last clustering pass.  At the 10^12-sequence
    design point a full-table re-sort per maintenance pass would be
    the dominant cost (and write amplification) of the whole engine;
    the incremental pass is O(new data), like an LSM level merge.
    Already-clustered files keep their tight per-file min/max stats,
    so manifest pruning is unaffected; zkey ranges of old vs new
    clustered file *sets* may overlap until a periodic
    ``scope="full"`` rewrite (Iceberg full rewrite_data_files cadence).
    """
    job_id = job_id or uuid.uuid4().hex[:12]
    tag = f"{curve}-v1"
    base_sid: int | None = None
    if branch is not None:
        table.refresh()
        table.branch_chain(branch)  # validates: exists and is a branch
        base_sid = table.refs[branch]["snapshot_id"]
    entries = table.files(base_sid)
    victims = (
        [e for e in entries if e.sort_order != tag]
        if scope == "incremental" else entries
    )
    # measure ONLY what this pass touches: the victims before, the
    # replacement files after — O(rewritten delta), never two full
    # scans of the table per maintenance cycle
    before = measure_tightness(spark, table, entries=victims) if measure else {}
    if not victims:
        return ClusterResult(
            snapshot_id=(
                base_sid if branch is not None else table.current_snapshot_id
            ),
            curve=curve,
            files_before=0, files_after=0,
            tightness_before=before, tightness_after=before, job_id=job_id,
        )

    key_cols = table.key_cols
    dim_col, source_col = cluster_dims(table)
    # live read: pending MoR equality-deletes fold in here, or the
    # re-clustered files (new sequence) would resurrect deleted rows
    # (branch mode: the BRANCH's pending deletes, not mainline's)
    raw = table.read_files_live(
        spark, victims, delete_entries=table.delete_files(base_sid)
    )
    # planning snapshot for commit-time rewrite validation (a MoR delete
    # committed after this read must conflict, not strand)
    plan_sid = table.planning_snapshot_id(base_sid)

    # Analytic range partitioning, no sampling job.  The curve key as a
    # whole is NOT uniform (the source dim is low-cardinality), but the
    # key-hash dim IS uniform by construction — so bins are computed per
    # PARTITION STRATUM: per-stratum row counts come from one cheap
    # column-pruned agg (no curve kernel), each stratum gets
    # ceil(rows/target) equal-width slices of the uniform key hash, and
    # the one-file-per-bin writer emits balanced (binomial spread only),
    # source-homogeneous, internally-curve-sorted files in a single
    # data pass.  repartitionByRange would instead run a sampling job
    # re-executing the whole scan + Arrow kernel a second time.
    # Stratum-homogeneous files also keep manifest partition inference
    # (min == max) working, so partition-filtered scans prune.
    #
    # CRITICAL: the bin domain must be the SAME top-31-bit value the
    # curve kernel sorts by (``hash >> 33``, with_cluster_key above) —
    # within a stratum the Morton key is monotone in that value, so
    # equal-width slices of [0, 2^31) produce ckey-contiguous, DISJOINT
    # files whose per-file hash min/max width is ~1/bins of full range.
    # (Binning ``pmod(hash, 2^62)`` instead would drop the top 2 hash
    # bits and mix all four top-bit quadrants into every bin, leaving
    # per-file hash ranges ~0.77 of full range — useless for pruning.)
    span = 1 << 31
    b_hash = F.shiftrightunsigned(F.xxhash64(*[F.col(c) for c in key_cols]), 33)
    if dim_col is not None:
        strat = F.coalesce(F.col(dim_col).cast("string"), F.lit("\x00null"))
    else:
        strat = F.lit("")
    # LIVE counts in both branches (manifest rows overcount while MoR
    # delete debt is pending): victims whose rows are ALL covered by
    # pending deletes yield zero live rows — rewriting would crash on
    # the empty bin frame, so leave them for materialize_deletes
    counts = {
        r["_s"]: r["count"]
        for r in raw.groupBy(strat.alias("_s")).count().collect()
    }
    if not counts:
        return ClusterResult(
            # branch mode: attribute the no-op to the BRANCH head, like
            # the no-victims return above — never the mainline snapshot
            snapshot_id=(
                base_sid if branch is not None else table.current_snapshot_id
            ),
            curve=curve,
            files_before=len(victims), files_after=len(victims),
            tightness_before=before, tightness_after=before, job_id=job_id,
        )
    offsets, off = [], 0
    for s in sorted(counts):
        n_s = max(1, -(-counts[s] // target_file_rows))
        offsets.append((s, off, span // n_s + (1 if span % n_s else 0)))
        off += n_s
    n_out = off
    bin_map = F.broadcast(
        spark.createDataFrame(offsets, ["_s", "_boff", "_bwidth"])
    )
    df = with_cluster_key(raw, curve=curve, doc_col=key_cols, source_col=source_col)
    out = (
        df.withColumn("_s", strat)
        .withColumn("_bh", b_hash)
        .join(bin_map, "_s")
        # integer division: double-precision F.floor(a/b) can misround
        # at power-of-two boundaries and spill rows into the next
        # stratum's bin, breaking min==max partition inference
        .withColumn(
            "_zbin",
            (F.col("_boff") + F.expr("_bh DIV _bwidth")).cast("long"),
        )
    )
    new_entries = write_datafiles(
        spark,
        table,
        out,
        group_col="_zbin",
        n_groups=n_out,
        sort_within_by=["_ckey"],
        drop_cols=["_ckey", "_s", "_bh", "_boff", "_bwidth"],
        sort_order=tag,
    )
    snap = table.commit(
        added=new_entries,
        removed_paths=[e.path for e in victims],
        operation="replace",
        summary={"phase": "cluster", "curve": curve, "scope": scope,
                 "job-id": job_id},
        branch=branch,
        validate_no_new_deletes_since=plan_sid,
    )
    after = measure_tightness(spark, table, entries=new_entries) if measure else {}
    return ClusterResult(
        snapshot_id=snap.snapshot_id,
        curve=curve,
        files_before=len(victims),
        files_after=len(new_entries),
        tightness_before=before,
        tightness_after=after,
        job_id=job_id,
    )
