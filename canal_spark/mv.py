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
from canal_spark.operators.common import release_cached_deps
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


def _as_star(cfg: JoinViewConfig) -> "StarViewConfig":
    """A join view IS a one-dim star view — the adapter that lets the
    join-view API delegate to the star implementation (one code path
    for the affected/live/ups/dels pipeline, one place to gate
    broadcasts)."""
    return StarViewConfig(
        main_key=cfg.main_key,
        main_cols=cfg.main_cols,
        dims=[DimJoin(fk_col=cfg.fk_col, dim_pk=cfg.dim_pk, dim_cols=cfg.dim_cols)],
    )


def view_select(cfg: JoinViewConfig, main: DataFrame, dim: DataFrame) -> DataFrame:
    """The view definition itself (used for initial load / oracles).

    Sides are aliased so callers may pass change-sets DERIVED from the
    same current-state frames (the normal incremental calling pattern)
    without tripping Spark's ambiguous-self-join analysis."""
    return star_view_select(_as_star(cfg), main, [dim])


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

    Delegates to :func:`derive_star_view_changelog` (a join view is a
    one-dim star view), inheriting its counted broadcast gate.
    """
    return derive_star_view_changelog(
        _as_star(cfg),
        main_current,
        [dim_current],
        ordinal,
        main_changes=main_changes,
        dim_changes=[dim_changes],
    )


# --------------------------------------------------------------------------
# N-dimension star views + one-to-many child aggregation
# --------------------------------------------------------------------------


@dataclass
class DimJoin:
    """One dimension of a star view: LEFT JOIN dim ON m.<fk_col> =
    d.<dim_pk>.  A list of these is the multi-table equi-join form the
    reference's SqlParser accepts (es/config/SqlParser.java:40-66
    parses N joined tables into per-table field lists)."""

    fk_col: str  # FK column on the main table
    dim_pk: str  # PK column on this dimension
    dim_cols: list[str]  # view columns taken from this dimension


@dataclass
class ChildAgg:
    """One-to-many child table collapsed into the view row — the
    subquery form of the reference's ES views
    (LabelSyncJoinSubTest.java: labels group-concat per user;
    ESSyncService.java:579-650 re-runs the subquery for affected main
    keys on any child change).  ``agg`` maps view column -> SQL
    aggregate expression over the child frame, e.g.
    ``{"labels": "sort_array(collect_list(label))"}``."""

    child_fk: str  # column on the child referencing the main key
    agg: dict[str, str]  # out_col -> aggregate SQL over child rows


@dataclass
class StarViewConfig:
    """SELECT m.<main_cols>, d1.<...>, ..., child-agg cols
    FROM main m LEFT JOIN dim_i ... LEFT JOIN (child subquery) —
    the declared (not parsed) superset of :class:`JoinViewConfig`."""

    main_key: list[str]  # view pk == main-table pk (single col if child used)
    main_cols: list[str]  # must cover keys + every fk
    dims: list[DimJoin]
    child: ChildAgg | None = None


def _child_agg_frame(cfg: StarViewConfig, child: DataFrame) -> DataFrame:
    c = cfg.child
    return child.groupBy(F.col(c.child_fk).alias("__mv_ck")).agg(
        *[F.expr(e).alias(name) for name, e in c.agg.items()]
    )


def star_view_select(
    cfg: StarViewConfig,
    main: DataFrame,
    dims: list[DataFrame],
    child: DataFrame | None = None,
) -> DataFrame:
    """The star-view definition (initial load / recompute oracle)."""
    if len(dims) != len(cfg.dims):
        raise ValueError(f"expected {len(cfg.dims)} dim frames, got {len(dims)}")
    m = main.alias("__mv_m")
    out_cols = [F.col(f"__mv_m.{c}") for c in cfg.main_cols]
    joined = m
    for i, (dj, d) in enumerate(zip(cfg.dims, dims)):
        a = f"__mv_d{i}"
        joined = joined.join(
            d.alias(a),
            F.col(f"__mv_m.{dj.fk_col}") == F.col(f"{a}.{dj.dim_pk}"),
            "left",
        )
        out_cols += [F.col(f"{a}.{c}") for c in dj.dim_cols]
    if cfg.child is not None:
        if child is None:
            raise ValueError("config declares a child table; none passed")
        if len(cfg.main_key) != 1:
            raise ValueError("child aggregation requires a single-column main key")
        agg = _child_agg_frame(cfg, child)
        joined = joined.join(
            agg,
            F.col(f"__mv_m.{cfg.main_key[0]}") == agg["__mv_ck"],
            "left",
        )
        out_cols += [F.col(c) for c in cfg.child.agg]
    return joined.select(*out_cols)


def derive_star_view_changelog(
    cfg: StarViewConfig,
    main_current: DataFrame,
    dim_currents: list[DataFrame],
    ordinal: int,
    main_changes: DataFrame | None = None,
    dim_changes: list[DataFrame | None] | None = None,
    child_current: DataFrame | None = None,
    child_changes: DataFrame | None = None,
    max_broadcast_keys: int = 5_000_000,
) -> DataFrame:
    """Changelog of view rows invalidated by one batch of changes across
    main, any subset of dimensions, and the child table.

    affected = keys(main_changes)
             ∪ (per changed dim i) keys(main ⋉ changed dim-pks)
             ∪ distinct child_fk of child_changes          -- subquery path
    then re-derive ONLY those rows from current state; deletes are
    affected keys with no live main row.  Every affected-key frame is
    batch-sized by CDC contract -> broadcast semi-joins; the re-derive
    joins run over the affected subset only, never the full view.
    """
    mk = cfg.main_key
    if dim_changes is not None and len(dim_changes) != len(cfg.dims):
        # mirror star_view_select's dim_currents check: a SHORT list
        # would silently treat trailing dims as unchanged (positional
        # ambiguity — wrong fk/pk pairing leaves view rows stale with
        # no error), a long one would IndexError — unchanged dims must
        # be explicit Nones
        raise ValueError(
            f"dim_changes has {len(dim_changes)} entries for "
            f"{len(cfg.dims)} dims — pass None for unchanged dims"
        )
    parts = []
    if main_changes is not None:
        parts.append(main_changes.select(*mk))
    for i, dch in enumerate(dim_changes or []):
        if dch is None:
            continue
        dj = cfg.dims[i]
        keys = dch.select(dj.dim_pk).distinct()
        parts.append(
            main_current.join(
                F.broadcast(keys),
                main_current[dj.fk_col] == keys[dj.dim_pk],
                "leftsemi",
            ).select(*mk)
        )
    if child_changes is not None:
        if cfg.child is None:
            raise ValueError("child_changes passed but config has no child")
        if len(mk) != 1:
            # fail here, not as a cannot-resolve-column error deep in
            # the union (star_view_select enforces the same constraint)
            raise ValueError("child aggregation requires a single-column main key")
        # child-side change: the affected main keys are right on the
        # child rows (ESSyncService re-runs the subquery per main key)
        parts.append(
            child_changes.select(
                F.col(cfg.child.child_fk).alias(mk[0])
            ).distinct()
        )
    if not parts:
        raise ValueError("at least one changes frame required")
    affected = parts[0]
    for p in parts[1:]:
        affected = affected.unionByName(p)
    # COUNTED broadcast gate (merge_into's max_broadcast_keys rule):
    # main_changes keys are batch-sized by CDC contract, but the dim
    # fan-out path is NOT — one update to a popular dimension row can
    # invalidate millions of main keys.  Persist the affected set (every
    # downstream join reuses it), count it, and only hint the broadcast
    # when it is genuinely batch-sized; past the gate the joins run
    # unhinted and AQE picks the strategy.  The persisted dep is tagged
    # on the returned frame for the caller to release after the merge.
    from canal_spark.operators.common import attach_cached_deps

    affected = affected.distinct().persist()
    live = None
    try:
        n_affected = affected.count()

        def hint(df: DataFrame) -> DataFrame:
            return F.broadcast(df) if n_affected <= max_broadcast_keys else df

        # persisted: consumed TWICE (the re-derive and the delete
        # anti-join build side) — without it each is a separate full
        # scan of the main table per batch; batch-sized rows by the
        # affected-key gate above
        live = main_current.join(hint(affected), mk, "leftsemi").persist()
        # the child subquery must also run over ONLY the affected keys —
        # a bare groupBy of child_current would aggregate the whole
        # child table every batch (O(child), not O(affected), at the
        # 10^12-row design point); semi-join it down to the batch first
        child_live = child_current
        if cfg.child is not None and child_current is not None:
            child_live = child_current.join(
                hint(affected.select(F.col(mk[0]).alias(cfg.child.child_fk))),
                cfg.child.child_fk,
                "leftsemi",
            )
        after = star_view_select(cfg, live, dim_currents, child_live)
        data_cols = [c for c in after.columns if c not in mk]
        ups = after.select(
            F.lit(ordinal).cast("long").alias("ordinal"),
            F.lit("U").alias("op"),
            *mk,
            *data_cols,
        )
        # live keys ⊆ affected keys, so the same gate bounds this side
        dels = affected.join(hint(live.select(*mk)), mk, "left_anti").select(
            F.lit(ordinal).cast("long").alias("ordinal"),
            F.lit("D").alias("op"),
            *mk,
            *[F.lit(None).cast(dict(after.dtypes)[c]).alias(c)
              for c in data_cols],
        )
        return attach_cached_deps(ups.unionByName(dels), [affected, live])
    except BaseException:
        # a validation raise downstream of the persists (e.g. a
        # wrong-length dim_currents in star_view_select) must not leak
        # the cached frames for the session lifetime
        affected.unpersist()
        if live is not None:
            live.unpersist()
        raise


def maintain_star_view(
    spark: SparkSession,
    view: Table,
    cfg: StarViewConfig,
    main_current: DataFrame,
    dim_currents: list[DataFrame],
    main_changes: DataFrame | None = None,
    dim_changes: list[DataFrame | None] | None = None,
    child_current: DataFrame | None = None,
    child_changes: DataFrame | None = None,
    batch_ordinal: int | None = None,
    **merge_kw,
) -> MergeResult:
    """Apply one batch of star-schema changes to the materialized view —
    same MERGE-only write path (snapshot isolation, hwm idempotence,
    no-op suppression) as :func:`maintain_join_view`."""
    # branch-aware default ordinal: merge_into filters against the
    # BRANCH-aware hwm, so computing the default from the mainline mark
    # would make every branch-mode batch after the first filter to
    # empty and silently drop its view updates
    ordinal = (
        batch_ordinal
        if batch_ordinal is not None
        else merge_high_water_mark(view, branch=merge_kw.get("branch")) + 1
    )
    cl = derive_star_view_changelog(
        cfg,
        main_current,
        dim_currents,
        ordinal,
        main_changes=main_changes,
        dim_changes=dim_changes,
        child_current=child_current,
        child_changes=child_changes,
    )
    try:
        return merge_into(spark, view, cl, **merge_kw)
    finally:
        release_cached_deps(cl)


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
    # branch-aware like maintain_star_view — see the comment there
    ordinal = (
        batch_ordinal
        if batch_ordinal is not None
        else merge_high_water_mark(view, branch=merge_kw.get("branch")) + 1
    )
    cl = derive_view_changelog(
        cfg, main_current, dim_current, main_changes, dim_changes, ordinal
    )
    try:
        return merge_into(spark, view, cl, **merge_kw)
    finally:
        release_cached_deps(cl)
