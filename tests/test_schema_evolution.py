"""Schema evolution as its own commit (DDL-isolation barrier, B3/A6):
add/drop columns, old files project correctly, time travel intact."""

import pytest


def test_add_column_projects_null_for_old_files(spark, token_table):
    from pyspark.sql import functions as F

    table, base = token_table
    v0_rows = table.row_count()
    snap_before = table.current_snapshot_id

    snap = table.evolve_schema(add=[("quality", "double")])
    assert snap.operation == "schema"
    assert snap.snapshot_id == snap_before + 1

    df = table.scan(spark)
    assert dict(df.dtypes)["quality"] == "double"
    assert df.count() == v0_rows
    assert df.where(F.col("quality").isNotNull()).count() == 0

    # new data carries the column; old rows stay null
    from canal_spark.table.writer import append

    extra = df.limit(5).select(
        F.concat(F.lit("new:"), "doc_id").alias("doc_id"),
        "tokens", "n_tok", "source", F.lit(0.5).alias("quality"),
    )
    append(spark, table, extra)
    got = table.scan(spark)
    assert got.where(F.col("quality").isNotNull()).count() == 5
    assert got.count() == v0_rows + 5


def test_drop_column_and_guards(spark, token_table):
    table, _ = token_table
    table.evolve_schema(add=[("tmp", "int")])
    table.evolve_schema(drop=["tmp"])
    assert "tmp" not in [f["name"] for f in table.schema_json["fields"]]

    with pytest.raises(ValueError):
        table.evolve_schema(add=[("doc_id", "string")])  # duplicate
    with pytest.raises(ValueError):
        table.evolve_schema(drop=["nope"])  # missing
    with pytest.raises(ValueError):
        table.evolve_schema(drop=["source"])  # partition column


def test_time_travel_pins_snapshot_schema(spark, token_table):
    """The TSDB rollback analogue (DatabaseTableMeta.rollback,
    parse/.../tsdb/DatabaseTableMeta.java:168-188): rebuilding state at
    a past position must use the schema *as of* that position.  evolve
    (add) -> write -> evolve(drop): a time-travel read of the pre-drop
    snapshot still returns the dropped column's data, while the current
    scan no longer has the column."""
    from pyspark.sql import functions as F

    from canal_spark.table.writer import append

    table, _ = token_table
    table.evolve_schema(add=[("quality", "double")])
    extra = table.scan(spark).limit(5).select(
        F.concat(F.lit("q:"), "doc_id").alias("doc_id"),
        "tokens", "n_tok", "source", F.lit(0.75).alias("quality"),
    )
    append(spark, table, extra)
    pre_drop = table.current_snapshot_id

    table.evolve_schema(drop=["quality"])
    assert "quality" not in table.scan(spark).columns

    tt = table.scan(spark, snapshot_id=pre_drop)
    assert "quality" in tt.columns
    assert tt.where(F.col("quality") == 0.75).count() == 5
    # and the snapshot BEFORE the add doesn't have the column at all
    first = table.snapshots[0].snapshot_id
    assert "quality" not in table.scan(spark, snapshot_id=first).columns


def test_schema_change_is_metadata_only_commit(spark, token_table):
    """DDL barrier: no data files added/removed; the data of the parent
    snapshot is still exactly readable (scan equality)."""
    table, _ = token_table
    before = {r["doc_id"] for r in table.scan(spark).select("doc_id").collect()}
    files_before = {e.path for e in table.files()}
    snap = table.evolve_schema(add=[("lang", "string")])
    assert snap.summary["added-files"] == 0
    assert {e.path for e in table.files()} == files_before
    after = {r["doc_id"] for r in table.scan(spark).select("doc_id").collect()}
    assert after == before
