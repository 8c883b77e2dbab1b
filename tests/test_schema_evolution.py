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


def test_rename_column_reads_old_files_by_field_id(spark, token_table):
    """Rename keeps the field id: files written before the rename store
    the old column name on disk, and the era read aliases it to the new
    name — no rewrite (Iceberg's per-field-id mechanism)."""
    from pyspark.sql import functions as F

    from canal_spark.table.writer import append

    table, _ = token_table
    files_before = {e.path for e in table.files()}
    total = table.scan(spark).agg(F.sum("n_tok")).collect()[0][0]
    pre_rename = table.current_snapshot_id

    table.evolve_schema(rename=[("n_tok", "tok_len")])
    assert {e.path for e in table.files()} == files_before  # metadata only
    df = table.scan(spark)
    assert "tok_len" in df.columns and "n_tok" not in df.columns
    # old files' data is fully visible under the new name
    assert df.agg(F.sum("tok_len")).collect()[0][0] == total
    assert df.where(F.col("tok_len").isNull()).count() == 0

    # new writes use the new name; mixed-era scan still consistent
    extra = df.limit(3).select(
        F.concat(F.lit("r:"), "doc_id").alias("doc_id"),
        "tokens", F.col("tok_len"), "source",
    )
    append(spark, table, extra)
    assert table.scan(spark).where(F.col("tok_len").isNull()).count() == 0

    # time travel to the pre-rename snapshot shows the old name
    tt = table.scan(spark, snapshot_id=pre_rename)
    assert "n_tok" in tt.columns and "tok_len" not in tt.columns

    # protected columns cannot be renamed
    with pytest.raises(ValueError):
        table.evolve_schema(rename=[("source", "src")])  # partition col
    with pytest.raises(ValueError):
        table.evolve_schema(rename=[("doc_id", "key")])  # key col


def test_add_after_drop_does_not_resurrect_old_data(spark, token_table):
    """Iceberg add-after-drop semantics: re-adding a dropped name mints
    a NEW field id, so the old column's bytes never resurrect."""
    from pyspark.sql import functions as F

    from canal_spark.table.writer import append

    table, _ = token_table
    table.evolve_schema(add=[("quality", "double")])
    extra = table.scan(spark).limit(5).select(
        F.concat(F.lit("q:"), "doc_id").alias("doc_id"),
        "tokens", "n_tok", "source", F.lit(0.9).alias("quality"),
    )
    append(spark, table, extra)
    assert table.scan(spark).where("quality = 0.9").count() == 5

    table.evolve_schema(drop=["quality"])
    table.evolve_schema(add=[("quality", "double")])
    # same name, NEW id: all null, including the 5 rows that had 0.9
    assert table.scan(spark).where(F.col("quality").isNotNull()).count() == 0


def test_retype_widening_casts_old_files(spark, token_table):
    from pyspark.sql import functions as F

    table, _ = token_table
    total = table.scan(spark).agg(F.sum("n_tok")).collect()[0][0]
    table.evolve_schema(retype=[("n_tok", "bigint")])
    df = table.scan(spark)
    assert dict(df.dtypes)["n_tok"] == "bigint"
    assert df.agg(F.sum("n_tok")).collect()[0][0] == total  # values intact

    with pytest.raises(ValueError):
        table.evolve_schema(retype=[("n_tok", "int")])  # narrowing
    with pytest.raises(ValueError):
        table.evolve_schema(retype=[("source", "bigint")])  # not a widening


def test_merge_through_rename_boundary(spark, token_table):
    """CDC apply keeps working across a rename: a post-rename changelog
    (new column names) merges into a table whose files predate the
    rename — the keep-side era read resolves the old files."""
    import datetime as dt

    from pyspark.sql.types import (
        ArrayType, IntegerType, LongType, StringType, StructField,
        StructType, TimestampType,
    )

    from canal_spark.merge import merge_into

    table, base = token_table
    table.evolve_schema(rename=[("n_tok", "tok_len")])
    cl_schema = StructType([
        StructField("ordinal", LongType(), False),
        StructField("op", StringType(), False),
        StructField("doc_id", StringType(), False),
        StructField("tokens", ArrayType(IntegerType(), False), True),
        StructField("tok_len", IntegerType(), True),
        StructField("source", StringType(), True),
        StructField("es", TimestampType(), True),
        StructField("batch_id", LongType(), True),
    ])
    E = dt.datetime(2026, 1, 1)
    k0, k1 = base[0][0], base[1][0]
    changes = [
        (1, "U", k0, [7, 7], 2, base[0][3], E, 1),
        (2, "D", k1, None, None, None, E, 1),
    ]
    res = merge_into(spark, table, spark.createDataFrame(changes, cl_schema))
    assert res.applied
    got = {r["doc_id"]: (list(r["tokens"]) if r["tokens"] else None, r["tok_len"])
           for r in table.scan(spark).collect()}
    assert got[k0] == ([7, 7], 2)
    assert k1 not in got
    assert len(got) == 1200 - 1


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


def test_retype_of_key_and_partition_columns_rejected(spark, token_table):
    """Key and partition columns cannot retype even to a wider type:
    equality-delete files and manifest pruning stats are read/compared
    with the CURRENT key schema, and manifest partition values are
    keyed by the spec's column type — a widened key would strand
    pending MoR delete debt unreadably."""
    table, _ = token_table
    # doc_id is the key column (string -> no legal widening anyway, so
    # use a table whose key is an int to prove the protection fires
    # BEFORE the widening check)
    from canal_spark import create_table
    from pyspark.sql.types import (IntegerType, StringType, StructField,
                                   StructType)

    t2 = create_table(
        str(table.root) + "_intkey",
        StructType([
            StructField("k", IntegerType(), False),
            StructField("src", StringType(), True),
        ]),
        partition_by=["src"],
        properties={"key-cols": "k"},
    )
    with pytest.raises(ValueError, match="key"):
        t2.evolve_schema(retype=[("k", "bigint")])  # legal widening, protected col
    with pytest.raises(ValueError, match="partition"):
        table.evolve_schema(retype=[("source", "string")])  # partition col
