"""Maintained dedup signature index — the dedup suite wired into the
maintenance pass.

The driver-query operators (`operators/dedup.py`) compute band tables
from scratch per query; a production pass over a 10^12-sequence corpus
instead MAINTAINS the signature table as a lakehouse table of its own
(`doc_id, band, bucket`) in one of two signature families, pinned per
index by the `dedup.signature` table property:

  * ``minhash`` (default) — one row per doc per MinHash band over the
    TOKEN arrays: constant N_MINHASH rows/doc, probabilistic candidate
    recall (any shared band).
  * ``winnow`` — winnowing fingerprints (window-of-w minima over the
    shingle hash stream, `token_winnow_frame`): ~2/(w+1) of all
    shingle hashes per doc, but a GUARANTEE that any shared token run
    of >= w + SHINGLE_K - 1 tokens produces a shared bucket.

Everything downstream of the frame builder — incremental refresh,
manifest-pruned COW rewrites, hot-bucket caps, delta candidates,
corpus self-dedup, index compaction — is family-agnostic: it only ever
sees (doc_id, band, bucket).  Per changelog batch the refresh

  1. rewrites the index files whose key range overlaps the batch's
     changed doc_ids (same manifest min/max pruning as the data merge),
  2. recomputes band rows from the CURRENT post-merge token table for
     those keys (deleted docs simply have no rows -> they vanish), and
  3. reports the batch's near-dup candidates vs the index (the
     `dedup_incremental` O(delta) shape) as lineage metrics.

Reference parity: this is the ES/HBase adapter pattern — a derived
store kept in sync from the same changelog the primary apply consumes
(client-adapter/.../ESSyncService.java sync-by-affected-keys), with
the derived "view" being the LSH index instead of a search document.

Scale notes: refresh work is O(batch + overlapping index files); the
candidate join restricts the index to the delta's buckets FIRST, then
applies the hot-bucket cap (`operators/dedup.MAX_BUCKET`) on those
bucket counts — a boilerplate mega-bucket costs one linear count, never
an O(b²) pair blowup.  All hashing is the shared cross-engine md5
kernel, so index contents equal what the batch operators would compute.
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from canal_spark.operators.common import md5int
from canal_spark.operators.dedup import (
    MAX_BUCKET,
    N_MINHASH,
    WINNOW_MIN,
    WINNOW_W,
    winnow_min_expr,
)
from canal_spark.table.format import Table, create_table
from canal_spark.table.writer import write_datafiles

BAND_INDEX_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("band", IntegerType(), False),
        StructField("bucket", LongType(), False),
    ]
)

SHINGLE_K = 3  # 3-token shingles over the token arrays


def token_band_frame(df: DataFrame) -> DataFrame:
    """(doc_id, band, bucket) MinHash bands over TOKEN arrays.

    Shingles are 3-token windows rendered as space-joined ints (so the
    salted md5 kernel is byte-identical to the text operators'); docs
    shorter than SHINGLE_K tokens produce no rows and are simply absent
    from the index.  One posexplode — never an N-branch union."""
    # filter BEFORE the generator, not after: sequence(1, size-2) is
    # DESCENDING for docs shorter than SHINGLE_K (e.g. [1, 0]) and
    # slice(tokens, 0, 3) is a runtime error — a post-select where
    # happens to work only because PushDownPredicates rewrites it below
    # the explode, and correctness must not hang on an optimizer rule
    # (bpe_train orders the identical pattern this way)
    sh = df.where(F.size("tokens") >= SHINGLE_K).select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(tokens) - {SHINGLE_K - 1}),"
                f" i -> concat_ws(' ', transform(slice(tokens, i, {SHINGLE_K}),"
                " t -> cast(t as string))))"
            )
        ).alias("shingle"),
    )
    aggs = [
        F.min(md5int(F.concat_ws("#", "shingle", F.lit(str(k))))).alias(f"mh{k}")
        for k in range(N_MINHASH)
    ]
    sigs = sh.groupBy("doc_id").agg(*aggs)
    return sigs.select(
        "doc_id",
        F.posexplode(
            F.array(*[F.col(f"mh{k}") for k in range(N_MINHASH)])
        ).alias("band", "bucket"),
    ).select("doc_id", F.col("band").cast("int"), "bucket")


# WINNOW_W is imported from operators.dedup (single source of truth —
# the text query, this token index, the SQL oracle, and the doctor's
# min-length math all derive from the same width).  Self-dedup pair
# threshold for the winnow family: one shared fingerprint is one shared
# 3-token phrase — too weak to merge (and delete) on; require at least
# WINNOW_MIN distinct shared fingerprints (same bar as q_winnow_pairs).
WINNOW_MIN_SHARED = WINNOW_MIN


def token_winnow_frame(df: DataFrame, w: int = WINNOW_W) -> DataFrame:
    """(doc_id, band, bucket) WINNOWING fingerprints over TOKEN arrays
    — the second signature family the index machinery can maintain
    (Schleimer et al., SIGMOD 2003; the query-side sibling is
    `operators.dedup.q_winnow_pairs` over text).

    Each 3-token shingle hashes with the same md5 kernel as the
    MinHash builder; a window of ``w`` consecutive hashes keeps its
    MINIMUM as a fingerprint, rows are the doc's DISTINCT fingerprints
    with ``band = 0`` (winnowing has no band dimension — the shared
    (band, bucket) key space simply collapses to one band).  Unlike
    MinHash-LSH's probabilistic candidate recall, a shared TOKEN run
    of >= w + 3 - 1 tokens GUARANTEES a shared fingerprint, at the
    cost of ~2/(w+1) of all shingle hashes stored per doc (vs a flat
    N_MINHASH rows/doc) — pick per corpus: guarantee-carrying local
    duplication detection vs constant index size.

    Hashing + window minima are pure JVM array expressions (transform
    + array_min over slices, map-side); the only shuffle is the
    distinct.  Docs shorter than one full window contribute no rows."""
    sh_arr = (
        f"transform(sequence(1, size(tokens) - {SHINGLE_K - 1}),"
        f" i -> concat_ws(' ', transform(slice(tokens, i, {SHINGLE_K}),"
        " t -> cast(t as string))))"
    )
    h_arr = (
        f"transform({sh_arr},"
        " s -> CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT))"
    )
    # filter BEFORE the generator (same rule as token_band_frame):
    # sequence() descends on short docs and slice() errors
    return (
        df.where(F.size("tokens") >= SHINGLE_K + w - 1)
        .select("doc_id", F.expr(h_arr).alias("hs"))
        .select(
            "doc_id",
            F.explode(F.expr(winnow_min_expr("hs", w))).alias("bucket"),
        )
        .distinct()
        .select("doc_id", F.lit(0).cast("int").alias("band"), "bucket")
    )


# signature family -> delta/rebuild frame builder.  The family is
# pinned as a TABLE PROPERTY at index creation: one index must never
# mix signature families (minhash buckets and winnow fingerprints
# share the (band, bucket) key space but mean different things — a
# mixed index would silently emit garbage candidates).
SIGNATURES = {
    "minhash": token_band_frame,
    "winnow": token_winnow_frame,
}
SIGNATURE_PROP = "dedup.signature"


def index_signature(index_table: Table) -> str:
    """The index's pinned signature family (pre-property indexes are
    minhash — the only family that existed when they were created)."""
    sig = index_table.properties.get(SIGNATURE_PROP, "minhash")
    if sig not in SIGNATURES:
        raise ValueError(
            f"unknown {SIGNATURE_PROP}={sig!r} on {index_table.root}"
            f" (known: {sorted(SIGNATURES)})"
        )
    return sig


def load_or_create_band_index(root: str, signature: str | None = None) -> Table:
    """Load an existing band index or create an empty one — the shared
    bootstrap for every entry point that takes an index ROOT (run_pass,
    jobs/stream, instance specs).

    ``signature`` selects the family for a NEW index (default minhash);
    passing it for an EXISTING index validates it against the pinned
    property and raises on mismatch (refreshing a minhash index with
    winnow rows would corrupt it silently — fail at config time)."""
    import os

    from canal_spark.table.format import load_table

    if os.path.exists(os.path.join(root, "metadata")):
        t = load_table(root)
        have = index_signature(t)
        if signature is not None and signature != have:
            raise ValueError(
                f"index at {root} is pinned to {SIGNATURE_PROP}={have!r};"
                f" requested {signature!r} — create a separate index"
            )
        return t
    return create_band_index(root, signature=signature or "minhash")


def create_band_index(root: str, signature: str = "minhash") -> Table:
    """An empty band-index table (keyed by doc_id for manifest pruning),
    pinned to one signature family."""
    if signature not in SIGNATURES:
        raise ValueError(
            f"unknown signature {signature!r} (known: {sorted(SIGNATURES)})"
        )
    return create_table(
        root,
        BAND_INDEX_SCHEMA,
        properties={"key-cols": "doc_id", SIGNATURE_PROP: signature},
    )


@dataclass
class BandIndexResult:
    applied: bool
    full_rebuild: bool = False
    snapshot_id: int | None = None
    docs_changed: int = 0
    bands_written: int = 0
    files_rewritten: int = 0
    files_pruned: int = 0
    dup_candidates: int = 0
    dup_docs: int = 0
    hot_buckets_capped: int = 0
    job_id: str = ""
    extra: dict = field(default_factory=dict)


def delta_dup_candidates(
    index_bands: DataFrame,
    delta_bands: DataFrame,
    max_bucket: int = MAX_BUCKET,
    hint_broadcast: bool = True,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(candidates, capped_buckets, hits): near-dup candidates of a
    delta vs the maintained index — O(delta) work.

    The index is first restricted to the delta's (band, bucket) set
    (broadcast semi-join — index files never shuffle), bucket sizes are
    counted over that restricted subset only, and buckets above
    ``max_bucket`` are dropped (reported in `capped_buckets`).  A hot
    bucket therefore costs one linear count, never O(b²) pairs.

    ``hits`` is the PERSISTED restriction frame both outputs derive
    from; the caller must ``hits.unpersist()`` once its actions on
    `candidates`/`capped_buckets` are done.

    ``hint_broadcast=False`` drops every broadcast hint on the
    delta-derived frames (they are N_MINHASH× the delta's doc count):
    callers pass it when the delta is a huge backfill, the same
    max_broadcast_keys gate the refresh joins use — AQE then picks the
    strategy instead of being forced into a multi-GB broadcast."""

    def hint(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if hint_broadcast else df

    delta_buckets = delta_bands.select("band", "bucket").distinct()
    # persisted: the restriction is the only index-scanning subplan, and
    # both consumers (`sizes`/`capped` and the candidate join) would
    # otherwise re-run the full index scan + semi-join — one action per
    # consumer = two passes over the 10^12-doc index.  Row count is
    # linear in the delta's bucket membership, never squared.
    hits = index_bands.join(
        hint(delta_buckets), ["band", "bucket"]
    ).persist()
    sizes = hits.groupBy("band", "bucket").agg(
        F.count(F.lit(1)).alias("bucket_size")
    )
    capped = sizes.where(F.col("bucket_size") > max_bucket)
    ok = sizes.where(F.col("bucket_size") <= max_bucket).select("band", "bucket")
    cands = (
        # `ok` is bucket-count-sized (bounded by the delta's bucket
        # membership), but a huge delta inflates it too — same gate
        hits.join(hint(ok), ["band", "bucket"])
        .join(
            hint(
                delta_bands.select(
                    F.col("doc_id").alias("new_id"), "band", "bucket"
                )
            ),
            ["band", "bucket"],
        )
        .where(F.col("doc_id") != F.col("new_id"))
        .groupBy("new_id")
        .agg(
            F.countDistinct("doc_id").alias("n_index_dups"),
            F.min("doc_id").alias("min_index_dup"),
        )
    )
    return cands, capped, hits


def refresh_band_index(
    spark: SparkSession,
    token_table: Table,
    index_table: Table,
    keys: DataFrame | None = None,
    max_driver_keys: int = 2_000_000,
    max_broadcast_keys: int = 5_000_000,
    target_file_rows: int = 1_000_000,
    max_bucket: int = MAX_BUCKET,
    report_candidates: bool = True,
    job_id: str | None = None,
) -> BandIndexResult:
    """Bring the band index in sync with ``token_table``.

    ``keys=None`` (or an empty index) -> full rebuild.  Otherwise
    incremental: index files overlapping the changed doc_ids are
    rewritten copy-on-write (kept rows anti-joined, same pruning as the
    data merge); new band rows come from the CURRENT token table for
    those keys, so deletes fall out naturally and re-running after an
    already-applied changelog is a no-op rewrite (idempotent).  The
    delta's near-dup candidates vs the PRE-refresh index are counted
    into the result when ``report_candidates`` (dup candidates of the
    batch = what a dedup gate would quarantine)."""
    from canal_spark.merge import _affected_files

    job_id = job_id or uuid.uuid4().hex[:12]
    frame_fn = SIGNATURES[index_signature(index_table)]
    entries = index_table.files()
    full = keys is None or not entries

    if full:
        src = token_table.scan(spark).select("doc_id", "tokens")
        bands = frame_fn(src)
        n_out = max(1, spark.sparkContext.defaultParallelism)
        # RANGE layout, same lesson as etl.full_load: hash-partitioned
        # files each span the whole doc_id space, so per-file min/max
        # stats never prune and the first incremental refresh rewrites
        # the entire index; range layout gives disjoint key intervals
        new_entries = write_datafiles(
            spark,
            index_table,
            bands.repartitionByRange(n_out, "doc_id"),
            sort_within_by=["doc_id"],
        )
        snap = index_table.commit(
            added=new_entries,
            removed_paths=[e.path for e in entries],
            operation="overwrite",
            summary={"job-id": job_id, "phase": "band_index", "rebuild": "full"},
        )
        return BandIndexResult(
            applied=True,
            full_rebuild=True,
            snapshot_id=snap.snapshot_id,
            docs_changed=-1,
            bands_written=sum(e.rows for e in new_entries),
            files_rewritten=len(entries),
            job_id=job_id,
        )

    keys_df = keys.select("doc_id").distinct().persist()
    try:
        n_keys = keys_df.count()
        if n_keys == 0:
            return BandIndexResult(applied=False, job_id=job_id)

        # same gate as merge_into: a batch-sized key set broadcasts (no
        # shuffle), a huge backfill must not force a multi-million-key
        # broadcast — join unhinted and let AQE pick the strategy
        keys_side = (
            F.broadcast(keys_df) if n_keys <= max_broadcast_keys else keys_df
        )
        src = token_table.scan(spark).select("doc_id", "tokens")
        delta_bands = frame_fn(
            src.join(keys_side, "doc_id", "leftsemi")
        ).persist()
        # count FIRST (materializes the persist the candidate join
        # reuses): the broadcast gate below must compare ACTUAL band
        # rows, not keys — minhash is a flat N_MINHASH rows/doc but a
        # winnow delta is O(tokens), so any per-doc multiplier estimate
        # under-gates one family or the other
        n_bands = delta_bands.count()

        cands_n = dup_docs = capped_n = 0
        if report_candidates:
            index_bands = index_table.scan(spark)
            cands, capped, hits = delta_dup_candidates(
                # exclude the delta's own (possibly stale) rows from the
                # index side so a doc never matches itself
                index_bands.join(keys_side, "doc_id", "left_anti"),
                delta_bands,
                max_bucket=max_bucket,
                hint_broadcast=n_bands <= max_broadcast_keys,
            )
            try:
                agg = cands.agg(
                    F.coalesce(F.sum("n_index_dups"), F.lit(0)).alias("c"),
                    F.count(F.lit(1)).alias("d"),
                ).collect()[0]
                cands_n, dup_docs = int(agg["c"]), int(agg["d"])
                capped_n = capped.count()
            finally:
                hits.unpersist()

        if n_keys <= max_driver_keys:
            key_arr = np.sort(
                np.array([r[0] for r in keys_df.collect()], dtype=object)
            )
            affected, untouched = _affected_files(entries, key_arr, "doc_id")
        else:
            affected, untouched = entries, []

        if not affected and n_bands == 0:
            # batch keys overlap no index file and contribute no bands
            # (absent or sub-shingle docs): committing would mint an
            # empty overwrite snapshot per pass — report candidates,
            # change nothing (mirrors merge_into's applied=False).
            return BandIndexResult(
                applied=False,
                docs_changed=int(n_keys),
                files_pruned=len(untouched),
                dup_candidates=cands_n,
                dup_docs=dup_docs,
                hot_buckets_capped=capped_n,
                job_id=job_id,
            )
        new_entries = []
        if affected:
            keep = index_table.read_files(spark, affected).join(
                keys_side, "doc_id", "left_anti"
            )
            new_entries += write_datafiles(
                spark, index_table, keep, sort_within_by=["doc_id"]
            )
        if n_bands > 0:
            m_out = max(1, -(-n_bands // target_file_rows))
            new_entries += write_datafiles(
                spark,
                index_table,
                delta_bands.repartitionByRange(m_out, "doc_id"),
                sort_within_by=["doc_id"],
            )
        snap = index_table.commit(
            added=new_entries,
            removed_paths=[e.path for e in affected],
            operation="overwrite",
            summary={
                "job-id": job_id,
                "phase": "band_index",
                "keys-changed": int(n_keys),
                "files-pruned": len(untouched),
            },
        )
        return BandIndexResult(
            applied=True,
            snapshot_id=snap.snapshot_id,
            docs_changed=int(n_keys),
            bands_written=int(n_bands),
            files_rewritten=len(affected),
            files_pruned=len(untouched),
            dup_candidates=cands_n,
            dup_docs=dup_docs,
            hot_buckets_capped=capped_n,
            job_id=job_id,
        )
    finally:
        try:
            delta_bands.unpersist()
        except NameError:
            pass
        keys_df.unpersist()


# --------------------------------------------------------------------------
# corpus self-dedup: the index turned back on the table that feeds it
# --------------------------------------------------------------------------


@dataclass
class CorpusDedupResult:
    """Outcome of one corpus self-dedup pass."""

    applied: bool
    dry_run: bool = False
    docs_in_groups: int = 0
    groups: int = 0
    losers_removed: int = 0
    snapshot_id: int | None = None
    hot_buckets_capped: int = 0
    wap: dict = field(default_factory=dict)
    index_refresh: dict = field(default_factory=dict)
    job_id: str = ""


def corpus_dedup_pass(
    spark: SparkSession,
    table: Table,
    index: Table,
    max_bucket: int = MAX_BUCKET,
    max_rounds: int = 50,
    dry_run: bool = False,
    wap: bool = False,
    max_delete_fraction: float = 0.5,
    job_id: str | None = None,
) -> CorpusDedupResult:
    """Deduplicate the token table AGAINST ITSELF using its maintained
    band index: LSH candidate pairs -> connected components -> keep the
    longest doc per near-dup group (ties: smallest doc_id) -> apply the
    losers as a DELETE changelog through the normal MERGE path -> drop
    their band rows from the index.  The corpus curates itself as a
    maintenance phase; afterwards the per-batch `delta_dup_candidates`
    reporting keeps it clean in O(delta).

    Scale shape: pair generation is the capped within-bucket equi-join
    (a hot boilerplate bucket costs one linear count, never O(b²)
    pairs), with a per-family evidence threshold — a winnow index
    requires ``WINNOW_MIN_SHARED`` distinct shared fingerprints before
    two docs pair (one shared fp is one shared phrase; deleting on it
    would over-merge), while a minhash band is a full-signature
    agreement and pairs on one; components run on the shared `propagate_min_labels` kernel
    (pair-scale frames, checkpointed rounds); survivor choice is a
    window partitioned by group label; the deletes flow through
    `merge_into`'s manifest-pruned COW — every step is the shape its
    10^12-sequence version needs.

    Safety: the delete merge is OUT-OF-BAND (`advance_checkpoint=False`)
    — engine-generated deletes neither filter against nor advance the
    hwm/GTID marks, so they can never shadow a not-yet-applied upstream
    changelog event; idempotence comes from the planner (a re-run finds
    no losers), the same contract as compaction.  A crash between the
    delete merge and the index refresh self-heals: the next pass folds
    index doc_ids missing from the table into the refresh key set.
    ``wap=True`` stages the merge and audits it — including the
    runaway-delete bound ``max_delete_fraction`` (default 0.5: a
    degenerate LSH config that would delete more than half the corpus
    aborts instead of publishing).  ``dry_run=True`` reports the
    would-be removals and touches nothing.
    """
    from pyspark.sql import Window

    from canal_spark.merge import merge_into
    from canal_spark.operators.common import propagate_min_labels

    job_id = job_id or uuid.uuid4().hex[:12]
    bands = index.scan(spark)

    # persisted: both the cap count and the ok-bucket join consume it —
    # without the persist the bucket-size aggregation scans the full
    # index twice (bucket-count-scale rows, bounded)
    sizes = bands.groupBy("band", "bucket").agg(
        F.count(F.lit(1)).alias("bucket_size")
    ).persist()
    n_capped = sizes.where(F.col("bucket_size") > max_bucket).count()
    ok = sizes.where(
        (F.col("bucket_size") > 1) & (F.col("bucket_size") <= max_bucket)
    ).select("band", "bucket")
    hits = bands.join(ok, ["band", "bucket"]).persist()
    try:
        a = hits.select("band", "bucket", F.col("doc_id").alias("doc_a"))
        b = hits.select("band", "bucket", F.col("doc_id").alias("doc_b"))
        # evidence threshold per signature family: one shared MINHASH
        # band is agreement of a full 60-bit signature (strong), but
        # one shared WINNOW fingerprint is a single common shingle —
        # far weaker evidence, and pairing (then DELETING a member) on
        # it would over-merge any two docs sharing one selected
        # 3-token phrase.  The winnow family therefore requires
        # >= WINNOW_MIN_SHARED shared fingerprints (the q_winnow_pairs
        # contract); the count rides the same (band, bucket) join and
        # stays candidate-pair scale.
        min_shared = (
            WINNOW_MIN_SHARED if index_signature(index) == "winnow" else 1
        )
        joined = (
            a.join(b, ["band", "bucket"])
            .where(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
        )
        if min_shared > 1:
            pairs = (
                joined.groupBy("doc_a", "doc_b")
                .agg(F.count(F.lit(1)).alias("_n"))
                .where(F.col("_n") >= min_shared)
                .select("doc_a", "doc_b")
            )
        else:
            pairs = joined.distinct()
        labels = propagate_min_labels(spark, pairs, max_rounds=max_rounds)
    finally:
        hits.unpersist()
        sizes.unpersist()

    # survivors: longest doc wins (dedup keeps the most content), ties
    # break to the smallest doc_id — deterministic at any parallelism.
    # `ranked` persists: the stats agg, the loser changelog and the
    # index-refresh key set all consume it, and re-deriving it is a
    # full table scan + join + window each time.
    scored = table.scan(spark).select("doc_id", "n_tok").join(
        labels.select(F.col("doc").alias("doc_id"), F.col("lbl")), "doc_id"
    )
    w = Window.partitionBy("lbl").orderBy(F.desc("n_tok"), F.asc("doc_id"))
    ranked = scored.withColumn("_rn", F.row_number().over(w)).persist()
    try:
        stats = ranked.agg(
            F.count(F.lit(1)).alias("docs"),
            F.count_distinct("lbl").alias("groups"),
        ).collect()[0]
        docs_in_groups, groups = int(stats["docs"]), int(stats["groups"])
        losers = ranked.where(F.col("_rn") > 1).select("doc_id")
        n_losers = docs_in_groups - groups

        rep = CorpusDedupResult(
            applied=False, dry_run=dry_run, docs_in_groups=docs_in_groups,
            groups=groups, losers_removed=n_losers,
            hot_buckets_capped=n_capped, job_id=job_id,
        )
        if dry_run:
            return rep

        # Self-heal index drift FIRST (doc_ids in the index but not in
        # the table — e.g. a prior pass that crashed between publishing
        # its delete merge and refreshing the index): fold them into
        # the refresh key set so the interrupted repair completes on
        # re-run instead of leaving phantom band rows forever.
        stale = bands.select("doc_id").distinct().join(
            table.scan(spark).select("doc_id"), "doc_id", "left_anti"
        )
        refresh_keys = losers.unionByName(stale).distinct()

        if n_losers > 0:
            # OUT-OF-BAND merge: these are engine-generated deletes,
            # not changelog events — the constant ordinal is
            # positionless by contract (advance_checkpoint=False skips
            # both the hwm slice and the mark advance, so a real
            # upstream event can never be shadowed by this batch).
            changelog = losers.select(
                F.lit(1).cast("long").alias("ordinal"),
                F.lit("D").alias("op"),
                "doc_id",
                F.lit(None).cast("array<int>").alias("tokens"),
                F.lit(None).cast("int").alias("n_tok"),
                F.lit(None).cast("string").alias("source"),
                F.lit(None).cast("timestamp").alias("es"),
                F.lit(None).cast("long").alias("batch_id"),
                F.lit(None).cast("array<int>").alias("before_tokens"),
                F.lit(None).cast("int").alias("before_n_tok"),
            )
            m = merge_into(
                spark, table, changelog, job_id=job_id, stage_only=wap,
                advance_checkpoint=False,
            )
            rep.applied = m.applied
            rep.snapshot_id = m.snapshot_id
            if wap and m.applied:
                from canal_spark.maintenance import wap_finalize, wap_parent_rows

                rep.wap = wap_finalize(
                    spark, table, m,
                    parent_rows=wap_parent_rows(spark, table),
                    max_delete_fraction=max_delete_fraction,
                )
                if not rep.wap["published"]:
                    rep.applied = False
                    return rep
        elif stale.isEmpty():
            return rep  # nothing to remove, nothing to repair

        # the removed docs' band rows drop out of the index (recompute
        # from the post-merge table: deleted keys have no rows -> they
        # vanish); stale keys from an interrupted prior pass repair too
        r = refresh_band_index(
            spark, table, index, keys=refresh_keys, job_id=job_id,
            max_bucket=max_bucket,
            # the refreshed keys are just-deleted losers (plus stale
            # repairs) with no band rows left: the candidate metrics
            # would cost an index-wide semi-join + two actions and the
            # report below discards them anyway
            report_candidates=False,
        )
    finally:
        ranked.unpersist()
    rep.index_refresh = {
        "applied": r.applied, "docs_changed": r.docs_changed,
        "files_rewritten": r.files_rewritten, "snapshot_id": r.snapshot_id,
    }
    return rep
