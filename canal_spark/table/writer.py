"""Spark write path for the mini-lakehouse: data files + per-file stats.

Files are written by Spark (one Parquet file per task partition, or one
per explicit *group* via the repartition+partitionBy trick), then
registered in a manifest with row counts, byte sizes, and column
min/max/null stats read from the **Parquet footers** — a metadata-only
pass that never rescans data.  Footer harvesting is distributed over
executors when the file count is large, so the driver does O(#files)
JSON bookkeeping only.
"""

from __future__ import annotations

import os
from datetime import date, datetime
from decimal import Decimal
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from canal_spark.table.bloom import BLOOM_PROP, build_sidecars
from canal_spark.table.format import DataFile, Table

# min/max stat eligibility is enforced structurally in _footer_stats:
# nested paths (arrays/maps/structs) are skipped by the '.' check and
# byte values drop to None in _json_native — no type whitelist needed

GROUP_COL = "_grp"  # synthetic grouping column, dropped on write


def norm_file_path(col):
    """Normalize ``_metadata.file_path`` (a ``file:///...`` URI on local
    fs, scheme-prefixed on HDFS/S3 too) to a plain absolute path so it
    can be equality-joined against manifest paths."""
    from pyspark.sql import functions as F

    return F.regexp_replace(col, "^[a-zA-Z0-9]+:/+", "/")


def _json_native(v: Any) -> Any:
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, bytes):
        return None
    return v


def _footer_stats(path: str) -> tuple[int, dict[str, dict]]:
    """(row_count, {col: {min,max,nulls}}) from a Parquet footer."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    rows = md.num_rows
    agg: dict[str, dict] = {}
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema
            if "." in name:  # nested (e.g. tokens.list.element) — skip
                continue
            st = col.statistics
            if st is None:
                continue
            cur = agg.setdefault(name, {"min": None, "max": None, "nulls": 0})
            if st.has_null_count and st.null_count is not None:
                cur["nulls"] += st.null_count
            if st.has_min_max:
                mn, mx = _json_native(st.min), _json_native(st.max)
                if mn is not None and (cur["min"] is None or mn < cur["min"]):
                    cur["min"] = mn
                if mx is not None and (cur["max"] is None or mx > cur["max"]):
                    cur["max"] = mx
    return rows, agg


def _harvest(spark: SparkSession, paths: list[str]) -> list[tuple[str, int, int, dict]]:
    """[(path, rows, bytes, stats)] — distributed when the list is large."""
    sizes = {p: os.path.getsize(p) for p in paths}
    if len(paths) <= 64:
        out = []
        for p in paths:
            rows, stats = _footer_stats(p)
            out.append((p, rows, sizes[p], stats))
        return out

    # fan footer reads out to executors: O(#files) tiny tasks, no data scan
    sc = spark.sparkContext
    n_slices = max(1, min(len(paths) // 16, sc.defaultParallelism * 2))

    def part(it):
        from canal_spark.table.writer import _footer_stats as fs

        for p in it:
            rows, stats = fs(p)
            yield (p, rows, stats)

    res = sc.parallelize(paths, n_slices).mapPartitions(part).collect()
    return [(p, rows, sizes[p], stats) for (p, rows, stats) in res]


def _list_parquet(prefix: str) -> list[str]:
    out = []
    for dirpath, _dirs, names in os.walk(prefix):
        for n in names:
            if n.endswith(".parquet") and not n.startswith((".", "_")):
                out.append(os.path.join(dirpath, n))
    return sorted(out)


def write_datafiles(
    spark: SparkSession,
    table: Table,
    df: DataFrame,
    group_col: str | None = None,
    n_groups: int | None = None,
    sort_within_by: list[str] | None = None,
    drop_cols: list[str] | None = None,
    sort_order: str | None = None,
    group_local: bool = False,
    build_bloom: bool = True,
) -> list[DataFile]:
    """Write ``df`` into fresh immutable data files; return manifest entries.

    * default: one file per task partition of ``df`` (caller controls
      layout via repartition/repartitionByRange upstream);
    * ``group_col``: exactly one file per distinct group value — all
      rows of a group hash to one partition (``repartition(n, col)``)
      and ``partitionBy`` then splits co-resident groups into separate
      files.  This is how bin-packed compaction emits its target files.
    * ``group_local=True``: groups are already task-local (e.g. the
      group is derived from the input FILE a row was scanned from) —
      skip the repartition and write one file per (task, group) with NO
      exchange.  The merge keep-side uses this to write each affected
      file's survivors back as its own stratum-pure file.

    Partition values for the manifest are inferred from per-file stats:
    a table partition column with ``min == max`` in a file pins that
    file's partition value (identity transform).
    """
    prefix = table.new_data_prefix()
    if group_col is not None:
        n = n_groups or 200
        grouped = df if group_local else df.repartition(n, group_col)
        if sort_within_by:
            # group col FIRST: the dynamic-partition writer requires its
            # input ordered by the partition column and would otherwise
            # insert its own sort AFTER this one, destroying the
            # within-file key order (files claiming a curve sort order
            # must actually be curve-sorted runs)
            grouped = grouped.sortWithinPartitions(group_col, *sort_within_by)
        if drop_cols:
            # projection after the sort: row order survives, the sort
            # key (e.g. a curve key) doesn't reach the files
            grouped = grouped.drop(*drop_cols)
        (
            grouped.withColumnRenamed(group_col, GROUP_COL)
            .write.partitionBy(GROUP_COL)
            .parquet(prefix)
        )
    else:
        if sort_within_by:
            df = df.sortWithinPartitions(*sort_within_by)
        if drop_cols:
            df = df.drop(*drop_cols)
        df.write.parquet(prefix)

    paths = _list_parquet(prefix)
    harvested = _harvest(spark, paths)

    # opt-in per-file key bloom sidecars (table/bloom.py): built from a
    # column-pruned re-read of each fresh file, distributed alongside
    # the footer harvest pattern when the file count is large
    # build_bloom=False: delete-file writers opt out — nothing ever
    # probes a delete file's bloom (_affected_files and
    # prune_deletes_for read data-entry stats only), so building one
    # would add a full column re-read per file to the hot O(batch)
    # MoR write path for stats no reader looks at
    bloom_col = table.properties.get(BLOOM_PROP) if build_bloom else None
    bloom_markers: dict[str, dict] = {}
    if bloom_col:
        bloom_markers = build_sidecars(
            spark, [p for p, rows, _b, _s in harvested if rows > 0], bloom_col
        )

    part_cols = table.partition_by
    entries: list[DataFile] = []
    for path, rows, nbytes, stats in harvested:
        if rows == 0:
            continue
        if path in bloom_markers:
            stats.setdefault(bloom_col, {})["bloom"] = bloom_markers[path]
        partition = {}
        for pc in part_cols:
            st = stats.get(pc)
            if st and st["min"] is not None and st["min"] == st["max"]:
                partition[pc] = st["min"]
        entries.append(
            DataFile(
                path=os.path.relpath(path, table.root),
                rows=rows,
                bytes=nbytes,
                partition=partition,
                stats=stats,
                sort_order=sort_order,
                # stamp the write-time schema era: reads resolve renames
                # and widenings between this era and the read schema
                schema_id=table.current_schema_id,
                # and the write-time partition spec (partition evolution)
                spec_id=table.default_spec_id,
            )
        )
    return entries


def append(
    spark: SparkSession,
    table: Table,
    df: DataFrame,
    summary: dict | None = None,
    **write_kw,
):
    """Append ``df`` as a new snapshot; returns (snapshot, entries)."""
    entries = write_datafiles(spark, table, df, **write_kw)
    snap = table.commit(entries, operation="append", summary=summary)
    return snap, entries
