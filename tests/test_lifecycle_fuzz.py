"""Randomized maintenance-lifecycle fuzz: a seeded sequence of merges
(COW + MoR), predicate deletes (all three modes: eq-MoR / pos-MoR /
COW), compaction, clustering, and delete materialization must keep the
live table equal to the single-threaded Python oracle — token-array
equality per row, the north-rule invariant — after EVERY step, not
just at the end.

This is the composition test the per-feature suites can't give: the
specific interleavings (pos debt folded by a COW merge, eq+pos debt
materialized together, cluster over a table carrying debt, compact
right after a predicate cut) arise from the seed, not from hand-picked
scenarios.

Changelog batches are generated with ``include_noop_update=False``:
the all-no-op suppression optimization is only sound when before-images
are accurate (the binlog contract — LogEventConvert captures the actual
prior row), and ``synth_changelog_rows`` tracks state per call, so
across batches a synthetic "no-op" U could carry a stale before-image —
a scenario the CDC contract excludes, not a behavior to fuzz.
"""

import random

from canal_spark import create_table
from canal_spark.changelog import (
    base_table_df,
    changelog_df,
    python_oracle_apply,
    synth_changelog_rows,
    synth_token_rows,
)
from canal_spark.cluster import cluster
from canal_spark.compact import compact
from canal_spark.merge import delete_where, materialize_deletes, merge_into
from canal_spark.schema import TOKEN_TABLE_SCHEMA
from canal_spark.table.writer import append

SEED = 20260819
N_STEPS = 12


def _snapshot(spark, t):
    return {
        r["doc_id"]: (list(r["tokens"]), r["n_tok"], r["source"])
        for r in t.scan(spark).collect()
    }


def test_random_lifecycle_matches_oracle(spark, tmp_table_root):
    rng = random.Random(SEED)
    t = create_table(tmp_table_root, TOKEN_TABLE_SCHEMA, partition_by=["source"])
    base = synth_token_rows(300)
    append(spark, t, base_table_df(spark, 300).repartition(4))
    oracle = {r[0]: (list(r[1]), r[2], r[3]) for r in base}

    ordinal = 1
    ops_run: list[str] = []
    for step in range(N_STEPS):
        op = rng.choice(
            [
                "merge_cow",
                "merge_mor",
                "del_eq",
                "del_pos",
                "del_cow",
                "compact",
                "cluster",
                "materialize",
            ]
        )
        ops_run.append(op)
        if op.startswith("merge"):
            cl = synth_changelog_rows(
                base, 60, seed=1000 + step, start_ordinal=ordinal,
                zipf_a=1.5, include_noop_update=False,
            )
            ordinal += 10_000
            merge_into(
                spark, t, changelog_df(spark, cl),
                mode="mor" if op == "merge_mor" else "cow",
            )
            oracle = python_oracle_apply(oracle, cl)
        elif op.startswith("del"):
            k = rng.choice([7, 11, 13])
            r = rng.randrange(k)
            mode = {"del_eq": "mor", "del_pos": "mor-pos", "del_cow": "cow"}[op]
            delete_where(spark, t, f"n_tok % {k} = {r}", mode=mode)
            oracle = {d: v for d, v in oracle.items() if v[1] % k != r}
        elif op == "compact":
            compact(spark, t, target_bytes=1 << 20)
        elif op == "cluster":
            cluster(spark, t, target_file_rows=200, measure=False)
        else:
            materialize_deletes(spark, t)
        assert _snapshot(spark, t) == oracle, (step, op, ops_run)

    # steady-state close: repay any remaining debt and re-verify
    materialize_deletes(spark, t)
    t.refresh()
    assert t.delete_files() == []
    assert _snapshot(spark, t) == oracle, ops_run
