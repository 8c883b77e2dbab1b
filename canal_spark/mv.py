"""Incremental materialized join-view maintenance (A9).

The reference's ES adapter keeps denormalized join views current from
the changelog: a main-table change upserts the view row directly
(client-adapter/elasticsearch/.../ESSyncService.java:115-183), a
dimension-table change finds the affected main keys BY FOREIGN KEY and
re-derives only those view rows (ESSyncService.java:532-650), with the
view shape declared as a single-equi-join SQL config
(es/config/SqlParser.java:40-66).  Every UserSyncJoinOne/LabelSyncJoin
test in the reference exercises exactly this loop.

Spark restatement: the view is itself a mini-lakehouse Table keyed by
the main table's key (``key-cols`` property), and maintenance derives a
*view changelog* that the ordinary ``merge_into`` applies — MERGE is
the only write path, so the view inherits snapshot isolation,
idempotent replay (high-water mark), and no-op suppression for free.

Scale shape: the affected-key set is batch-sized (CDC contract), so it
broadcasts to both the main-table semi-join and the delete anti-join;
the only big-big operation is the re-derive join main⋈dim, which runs
ONLY over the affected main rows (batch-sized) against the dimension —
Catalyst broadcasts whichever side is small, AQE covers the rest.  A
full-view recompute never happens after the initial load.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from canal_spark.merge import MergeResult, merge_high_water_mark, merge_into
from canal_spark.table.format import Table


@dataclass
class JoinViewConfig:
    """SELECT m.<main_cols>, d.<dim_cols> FROM main m
    LEFT JOIN dim d ON m.<fk_col> = d.<dim_pk> — the SqlParser.java:40-66
    single-join subset, declared instead of parsed."""

    main_key: list[str]  # view pk == main-table pk
    fk_col: str  # FK column on the main table
    dim_pk: str  # PK column on the dimension table
    main_cols: list[str]  # view columns taken from main (must cover keys+fk)
    dim_cols: list[str]  # view columns taken from dim


def view_select(cfg: JoinViewConfig, main: DataFrame, dim: DataFrame) -> DataFrame:
    """The view definition itself (used for initial load / oracles).

    Sides are aliased so callers may pass change-sets DERIVED from the
    same current-state frames (the normal incremental calling pattern)
    without tripping Spark's ambiguous-self-join analysis."""
    m, d = main.alias("__mv_m"), dim.alias("__mv_d")
    joined = m.join(
        d, F.col(f"__mv_m.{cfg.fk_col}") == F.col(f"__mv_d.{cfg.dim_pk}"), "left"
    )
    return joined.select(
        *[F.col(f"__mv_m.{c}") for c in cfg.main_cols],
        *[F.col(f"__mv_d.{c}") for c in cfg.dim_cols],
    )


def derive_view_changelog(
    cfg: JoinViewConfig,
    main_current: DataFrame,
    dim_current: DataFrame,
    main_changes: DataFrame | None,
    dim_changes: DataFrame | None,
    ordinal: int,
) -> DataFrame:
    """Changelog of view rows that batch of main/dim changes invalidates.

    affected = keys(main_changes) ∪ keys(main WHERE fk IN dim_changes);
    U rows re-derive from CURRENT main⋈dim state, D rows are affected
    keys no longer present in main.  One constant ``ordinal`` suffices:
    keys are unique within the derived batch, and merge's high-water
    mark only needs it monotone across batches.
    """
    mk = cfg.main_key
    parts = []
    if main_changes is not None:
        parts.append(main_changes.select(*mk))
    if dim_changes is not None:
        dim_keys = dim_changes.select(cfg.dim_pk).distinct()
        parts.append(
            main_current.join(
                F.broadcast(dim_keys),
                main_current[cfg.fk_col] == dim_keys[cfg.dim_pk],
                "leftsemi",
            ).select(*mk)
        )
    if not parts:
        raise ValueError("at least one of main_changes/dim_changes required")
    affected = parts[0]
    for p in parts[1:]:
        affected = affected.unionByName(p)
    affected = affected.distinct()

    live = main_current.join(F.broadcast(affected), mk, "leftsemi")
    after = view_select(cfg, live, dim_current)
    data_cols = [c for c in after.columns if c not in mk]
    ups = after.select(
        F.lit(ordinal).cast("long").alias("ordinal"),
        F.lit("U").alias("op"),
        *mk,
        *data_cols,
    )
    # deleted mains = affected keys with no live row.  Anti-join against
    # the batch-sized LIVE key set (already computed for the re-derive),
    # not against the full main table — both sides are batch-sized, the
    # build side broadcasts, and main is never scanned a second time.
    dels = (
        affected.join(F.broadcast(live.select(*mk)), mk, "left_anti")
        .select(
            F.lit(ordinal).cast("long").alias("ordinal"),
            F.lit("D").alias("op"),
            *mk,
            *[F.lit(None).cast(dict(after.dtypes)[c]).alias(c) for c in data_cols],
        )
    )
    return ups.unionByName(dels)


def maintain_join_view(
    spark: SparkSession,
    view: Table,
    cfg: JoinViewConfig,
    main_current: DataFrame,
    dim_current: DataFrame,
    main_changes: DataFrame | None = None,
    dim_changes: DataFrame | None = None,
    batch_ordinal: int | None = None,
    **merge_kw,
) -> MergeResult:
    """Apply one batch of main/dim changes to the materialized view.

    Pass the SOURCE batch's position as ``batch_ordinal`` (e.g. the max
    changelog ordinal it covers): a crash-replay of the same batch then
    filters to empty against the view's high-water mark — the adapter's
    ack/rollback loop collapsed into MERGE idempotence.  Without it the
    view's own hwm+1 is used (always applies; still convergent, since
    re-derived rows equal the committed ones).
    """
    ordinal = batch_ordinal if batch_ordinal is not None else merge_high_water_mark(view) + 1
    cl = derive_view_changelog(
        cfg, main_current, dim_current, main_changes, dim_changes, ordinal
    )
    return merge_into(spark, view, cl, **merge_kw)
