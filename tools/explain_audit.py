"""Physical-plan audit: captures `.explain("formatted")` for the
engine's hot paths and asserts the plan shapes we designed for —
pushdown reaching the scans, broadcast (not shuffled) anti-join on the
merge path, whole-stage codegen coverage, no accidental cartesian
products.  Writes PLANS.md for review.

Usage: python tools/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import contextlib
import re
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from canal_spark import create_table, get_spark
    from canal_spark.changelog import base_table_df, changelog_df, synth_changelog_rows, synth_token_rows
    from canal_spark.cluster import with_cluster_key
    from canal_spark.schema import TOKEN_TABLE_SCHEMA
    from canal_spark.table.writer import append

    spark = get_spark("explain_audit", master="local[8]", shuffle_partitions=8)

    # a real table so plans carry real scan nodes
    root = tempfile.mkdtemp(prefix="audit_tbl_")
    shutil.rmtree(root, ignore_errors=True)
    t = create_table(root, TOKEN_TABLE_SCHEMA, partition_by=["source"])
    base = synth_token_rows(2000)
    append(spark, t, base_table_df(spark, 2000).repartition(8))
    changes = changelog_df(spark, synth_changelog_rows(base, 300))

    sections: list[tuple[str, str, list[str], list[str]]] = []
    # (title, plan, must_contain, must_not_contain)

    # 1. changelog slice: ordinal filter must push to the parquet scan
    cl_dir = os.path.join(root, "cl")
    changes.write.parquet(cl_dir)
    slice_df = spark.read.parquet(cl_dir).where(F.col("ordinal") > 100)
    sections.append((
        "Changelog slice (C2 get-batch): ordinal predicate pushdown",
        plan_of(slice_df),
        ["PushedFilters: [IsNotNull(ordinal), GreaterThan(ordinal,100)]"],
        [],
    ))

    # 2. merge keep-side: broadcast LEFT ANTI join, no shuffle on table side
    from canal_spark.merge import dedupe_max_by

    keys_df = dedupe_max_by(changes).select("doc_id")
    keep = t.scan(spark).join(F.broadcast(keys_df), "doc_id", "left_anti")
    sections.append((
        "MERGE keep-side: broadcast anti-join (table side never shuffles)",
        plan_of(keep),
        # note: Catalyst prunes the key-side max_by(struct) down to a
        # plain distinct (HashAggregate) because only doc_id survives —
        # column pruning removing the struct entirely
        ["BroadcastHashJoin LeftAnti", "BroadcastExchange", "Batched: true"],
        ["SortMergeJoin", "CartesianProduct"],
    ))

    # 3. last-wins dedupe: partial (map-side) aggregation before exchange.
    # max_by over a struct is not hash-aggregable, so Spark picks
    # SortAggregate — still two-phase (partial on the map side, final
    # after the exchange), which is the property that makes zipf-hot
    # keys cheap; the within-partition sort is on the small batch only.
    sections.append((
        "Last-wins dedupe: max_by two-phase aggregation (hot keys collapse map-side)",
        plan_of(dedupe_max_by(changes)),
        ["SortAggregate", "Exchange"],
        ["Window"],  # the window variant would be a global sort, no partial agg
    ))

    # 4. cluster key + range partition: one exchange, Arrow UDF evaluated once
    df = with_cluster_key(t.scan(spark))
    clustered = df.repartitionByRange(8, "_ckey").sortWithinPartitions("_ckey")
    p4 = plan_of(clustered)
    sections.append((
        "Cluster rewrite: Arrow-batched Z-order key, single range exchange",
        p4,
        ["ArrowEvalPython", "rangepartitioning(_ckey"],
        ["CartesianProduct"],
    ))
    # the Arrow kernel must appear exactly once in the plan tree
    if len(re.findall(r"ArrowEvalPython \(\d+\)", p4)) != 1:
        sections.append(("Cluster: ArrowEvalPython appears once", p4, ["IMPOSSIBLE"], []))

    # 4b. huge-backfill merge path: broadcast disabled -> shuffled anti-join
    # (AQE skew-join eligible), never a nested-loop product
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    keep_big = t.scan(spark).join(
        dedupe_max_by(changes).select("doc_id"), "doc_id", "left_anti"
    )
    p4b = plan_of(keep_big)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    sections.append((
        "MERGE huge-backfill path: shuffled anti-join (AQE skew-join eligible)",
        p4b,
        ["SortMergeJoin LeftAnti", "Exchange"],
        ["BroadcastNestedLoopJoin", "CartesianProduct"],
    ))

    # 5. projection pruning: 2-column rollup must read 2 columns only
    rollup = t.scan(spark).groupBy("source").agg(F.sum("n_tok").alias("tok"))
    sections.append((
        "Metrics rollup: column pruning (ReadSchema carries only source, n_tok)",
        plan_of(rollup),
        ["ReadSchema: struct<n_tok:int,source:string>"],
        ["tokens"],
    ))

    failures = []
    out = ["# PLANS — physical-plan audit of the hot paths",
           "",
           "Generated by `python tools/explain_audit.py`; asserts pass/fail",
           "noted per section.  Re-run after any plan-shape change.",
           ""]
    for title, plan, must, must_not in sections:
        ok = True
        notes = []
        for m in must:
            if m not in plan:
                ok = False
                notes.append(f"MISSING: `{m}`")
        for m in must_not:
            if m in plan:
                ok = False
                notes.append(f"UNEXPECTED: `{m}`")
        status = "PASS" if ok else "FAIL"
        if not ok:
            failures.append((title, notes))
        out += [f"## {title}", "", f"**{status}**" + (" — " + "; ".join(notes) if notes else ""), "",
                "```", plan.strip()[:4000], "```", ""]

    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    shutil.rmtree(root, ignore_errors=True)

    for title, notes in failures:
        print(f"FAIL {title}: {notes}")
    print("PLANS.md written;", "ALL PLAN CHECKS PASSED" if not failures else f"{len(failures)} FAILURES")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
