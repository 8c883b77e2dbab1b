"""Corpus-internal duplicated-span excision as a maintenance phase.

The table-side sibling of ``operators/tokenops.py``'s driver queries:
find every ``w``-token window of the PHYSICAL token table that occurs
in >= 2 distinct documents (Lee et al., "Deduplicating Training Data
Makes Language Models Better") and rewrite the affected documents with
the duplicated positions excised, through the engine's ordinary MERGE
path.  Where ``corpus_dedup_pass`` (dedup_index.py) removes whole
near-duplicate DOCUMENTS, this removes repeated SPANS inside otherwise
distinct documents — the two passes compose: doc-level first (cheaper,
catches templated mirrors), span-level after (catches boilerplate
headers/footers/licenses stitched into unique pages).

Reference parity: this is the row-image diff idea of Canal's
`RowsLogBuffer` generalized from whole rows to token runs; the apply
side is the same out-of-band MERGE contract as the self-dedup pass.

Semantics: ``keep_one=True`` (default) keeps the FIRST occurrence
(smallest doc_id per duplicated window) and cuts the rest — corpus
still contains one copy of every span, the training set just stops
over-weighting it.  ``keep_one=False`` excises every occurrence (the
decontamination-style surgery the ``dup_span_cut`` driver query
mirrors with its DuckDB oracle).  Documents whose every position is
covered become DELETEs.

Scale shape (10^12 sequences):
- Window extraction is the shared ``span_windows`` kernel: a map-side
  JVM ``transform(sequence(...))`` + ONE posexplode — O(corpus tokens)
  rows but zero Python and no self-join; ``sample_mod=k`` switches to
  1-in-k hash-threshold fingerprinting (detects runs >= ~w*k) and cuts
  the shuffle k-fold — the knob a 100 TB run sets first to SIZE the
  problem (``dry_run=True`` only: an applied cut needs every window of
  a run, so it requires ``sample_mod=1``; estimate sampled, cut exact).
- The duplicated-window set is an aggregation consumed by a semi/inner
  join — a boilerplate shared by a million docs is ONE group row,
  never O(b^2) pairs (same argument as the LSH hot-bucket cap).
- The rewrite is bounded by AFFECTED docs only: covered positions
  anti-join the posexploded affected rows (match-bounded), reassembly
  is array_sort over (pos, tok) structs — no window function — and the
  changes flow through ``merge_into``'s manifest-/bloom-pruned COW.
- The span frame is deliberately NOT persisted: it is consumed twice
  (dup aggregation, hit join) but recomputing it is a map-side
  transform off the same scan — a persist would spill corpus-scale
  state for no shuffle saved.

Safety: the merge is OUT-OF-BAND (``advance_checkpoint=False``) —
engine-generated edits never advance or filter against the hwm/GTID
marks, so they cannot shadow an in-flight upstream event (the
compaction idempotence contract).  Re-running after an applied cut
finds no duplicated windows (the survivors are single-copy now), so
the pass is naturally idempotent; ``wap=True`` stages the merge and
audits it through the shared ``wap_finalize`` gate, and
``max_cut_fraction`` aborts a degenerate config (e.g. w too small for
the corpus vocabulary) BEFORE any write.  If a maintained band index
is passed, the touched keys are refreshed through the same
``refresh_band_index`` path as the self-dedup pass (content changed ->
signatures changed); a crash between merge and refresh self-heals on
the next index pass exactly like self-dedup's.
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from canal_spark.operators.tokenops import DUP_W, covered_positions, span_windows
from canal_spark.table.format import Table


@dataclass
class DupSpanResult:
    applied: bool
    dry_run: bool
    dup_windows: int
    docs_affected: int
    docs_deleted: int
    tokens_removed: int
    keep_one: bool
    job_id: str
    snapshot_id: int | None = None
    wap: dict | None = None
    index_refresh: dict | None = None
    aborted: str | None = None
    extra: dict = field(default_factory=dict)


def dup_span_cut_pass(
    spark: SparkSession,
    table: Table,
    w: int = DUP_W,
    sample_mod: int = 1,
    keep_one: bool = True,
    dry_run: bool = False,
    wap: bool = False,
    max_cut_fraction: float = 0.5,
    index: Table | None = None,
    job_id: str | None = None,
) -> DupSpanResult:
    """Excise cross-document duplicated token spans from the table.

    See module docstring for semantics, scale shape and safety."""
    from canal_spark.merge import merge_into

    if sample_mod > 1 and not dry_run:
        # sampling keeps 1-in-k windows: sound for DETECTING runs (and
        # for a dry-run cost estimate) but an applied cut would excise
        # only the sampled w-token patches, leaving ~ (k-1)/k of every
        # duplicated run in place while reporting success — and the
        # leftovers re-flag on the next run, breaking idempotence
        raise ValueError(
            "sample_mod > 1 is estimation-only (dry_run=True): an "
            "applied cut must see every window of a duplicated run "
            "(sample_mod=1) or it excises Swiss-cheese patches"
        )
    job_id = job_id or uuid.uuid4().hex[:12]
    rows = table.scan(spark)
    sp = span_windows(
        rows.select("doc_id", F.col("tokens").alias("toks")),
        w=w,
        sample_mod=sample_mod,
    )
    per_h = sp.groupBy("h").agg(
        F.countDistinct("doc_id").alias("nd"),
        F.min("doc_id").alias("first_doc"),
    )
    # persisted: dup is consumed twice (the report count and the hits
    # join) — without it each action re-runs the corpus-scale window
    # extraction + groupBy, doubling the most expensive stage
    dup = per_h.where(F.col("nd") >= 2).select("h", "first_doc").persist()
    hits = sp.join(dup, "h")
    if keep_one:
        hits = hits.where(F.col("doc_id") != F.col("first_doc"))
    # distinct covered positions per doc; bounded by matches (the
    # shared tokenops kernel — ONE coverage-expansion implementation)
    cov = covered_positions(hits, w).persist()
    try:
        affected = cov.select("doc_id").distinct()
        n_affected = affected.count()
        n_dup_windows = dup.count()
        rep = DupSpanResult(
            applied=False, dry_run=dry_run, dup_windows=n_dup_windows,
            docs_affected=n_affected, docs_deleted=0, tokens_removed=0,
            keep_one=keep_one, job_id=job_id,
        )
        if n_affected == 0:
            return rep

        total_rows = table.row_count()
        if total_rows and n_affected / total_rows > max_cut_fraction:
            # degenerate config guard BEFORE any write: a w too small
            # for the vocabulary flags most of the corpus — abort loud
            rep.aborted = (
                f"would touch {n_affected}/{total_rows} docs "
                f"(> max_cut_fraction={max_cut_fraction})"
            )
            return rep

        old = rows.join(affected, "doc_id").select(
            "doc_id", "tokens", "n_tok", "source"
        )
        ex = old.select(
            "doc_id", "source", F.posexplode("tokens").alias("pos", "tok")
        ).select(
            "doc_id", "source", F.col("pos").cast("long").alias("p"), "tok"
        )
        kept = ex.join(cov, ["doc_id", "p"], "left_anti")
        rebuilt = kept.groupBy("doc_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("p"), F.col("tok")))),
                lambda s: s["tok"],
            ).alias("new_tokens")
        )
        # fully-excised docs have NO surviving rows -> left join null
        planned = old.join(rebuilt, "doc_id", "left").select(
            "doc_id",
            "source",
            "n_tok",
            F.coalesce("new_tokens", F.expr("array()").cast("array<int>")).alias(
                "new_tokens"
            ),
        ).withColumn("new_n_tok", F.size("new_tokens").cast("int")).persist()
        try:
            stats = planned.agg(
                F.sum(F.col("n_tok") - F.col("new_n_tok")).alias("cut"),
                F.sum((F.col("new_n_tok") == 0).cast("long")).alias("dels"),
            ).collect()[0]
            rep.tokens_removed = int(stats["cut"] or 0)
            rep.docs_deleted = int(stats["dels"] or 0)
            if dry_run:
                return rep

            # OUT-OF-BAND changelog: constant ordinal by contract
            # (advance_checkpoint=False skips hwm slice + mark advance)
            changelog = planned.select(
                F.lit(1).cast("long").alias("ordinal"),
                F.when(F.col("new_n_tok") == 0, F.lit("D"))
                .otherwise(F.lit("U"))
                .alias("op"),
                "doc_id",
                F.when(F.col("new_n_tok") > 0, F.col("new_tokens"))
                .alias("tokens"),
                F.when(F.col("new_n_tok") > 0, F.col("new_n_tok"))
                .alias("n_tok"),
                F.when(F.col("new_n_tok") > 0, F.col("source")).alias("source"),
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
                    max_delete_fraction=max_cut_fraction,
                )
                if not rep.wap["published"]:
                    rep.applied = False
                    return rep

            if index is not None and rep.applied:
                from canal_spark.dedup_index import refresh_band_index

                r = refresh_band_index(
                    spark, table, index,
                    keys=planned.select("doc_id"), job_id=job_id,
                )
                rep.index_refresh = {
                    "applied": r.applied,
                    "docs_changed": r.docs_changed,
                    "files_rewritten": r.files_rewritten,
                    "snapshot_id": r.snapshot_id,
                }
        finally:
            planned.unpersist()
    finally:
        cov.unpersist()
        dup.unpersist()
    return rep
