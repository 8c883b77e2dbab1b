"""applyInPandasWithState cross-batch last-wins dedupe: the streaming
winner per key must match the batch dedupe over all slices."""


def _write_slice(spark, rows, out_dir):
    from canal_spark.changelog import changelog_df

    changelog_df(spark, rows).coalesce(1).write.mode("append").parquet(out_dir)


def test_stream_dedupe_matches_batch(spark, token_table, tmp_path):
    from pyspark.sql import functions as F

    from canal_spark.changelog import changelog_df, synth_changelog_rows
    from canal_spark.streaming import stream_changelog_reader, stream_dedupe_last_wins

    _, base = token_table
    rows1 = synth_changelog_rows(base, 250, seed=11, start_ordinal=1)
    rows2 = synth_changelog_rows(base, 250, seed=12, start_ordinal=1001)
    cl_dir = str(tmp_path / "cl")
    _write_slice(spark, rows1, cl_dir)
    _write_slice(spark, rows2, cl_dir)

    stream = stream_changelog_reader(spark, cl_dir, max_files_per_trigger=1)
    q = (
        stream_dedupe_last_wins(stream)
        .writeStream.format("memory")
        .queryName("dedupe_state_test")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # memory sink in update mode appends each emission; the LAST emission
    # per key is the stream's final winner
    emitted = spark.sql(
        """SELECT doc_id, ordinal, op FROM (
             SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY ordinal DESC) rn
             FROM dedupe_state_test) WHERE rn = 1"""
    ).collect()
    got = {r["doc_id"]: (r["ordinal"], r["op"]) for r in emitted}

    batch = changelog_df(spark, rows1 + rows2)
    expected = {
        r["doc_id"]: (r["ordinal"], r["op"])
        for r in batch.groupBy("doc_id")
        .agg(F.max_by(F.struct("ordinal", "op"), "ordinal").alias("w"))
        .select("doc_id", "w.ordinal", "w.op")
        .collect()
    }
    assert got == expected
    spark.catalog.dropTempView("dedupe_state_test")


def test_stale_replay_is_suppressed(spark, token_table, tmp_path):
    """A replayed file with already-seen ordinals must emit no new
    winners (state suppresses stale updates across restarts)."""
    import shutil

    from canal_spark.changelog import synth_changelog_rows
    from canal_spark.streaming import stream_changelog_reader, stream_dedupe_last_wins

    _, base = token_table
    rows = synth_changelog_rows(base, 200, seed=13)
    cl_dir = str(tmp_path / "cl")
    _write_slice(spark, rows, cl_dir)

    def drain():
        # foreachBatch sink: memory sink can't resume from a checkpoint
        emitted = []
        stream = stream_changelog_reader(spark, cl_dir)
        q = (
            stream_dedupe_last_wins(stream)
            .writeStream.foreachBatch(lambda df, _e: emitted.append(df.count()))
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sum(emitted)

    n1 = drain()
    assert n1 > 0
    # same checkpoint, duplicate data file appended -> same ordinals again
    src = [p for p in __import__("os").listdir(cl_dir) if p.endswith(".parquet")][0]
    shutil.copy(f"{cl_dir}/{src}", f"{cl_dir}/dup-{src}")
    n2 = drain()
    assert n2 == 0  # every replayed ordinal is stale -> suppressed
