"""Measure what bloom sidecars cost at write time and buy at merge time.

Builds the bench token table (sf fixture × REPLICAS, fragmented
repartition(64) load — the interleaved layout where every file's doc_id
[min, max] straddles every key, i.e. range pruning's worst case) twice:
once plain, once with ``write.bloom.col=doc_id``.  Then applies the
same N_KEYS-point DELETE changelog to each and reports load wall (write
cost), merge wall, and files rewritten/pruned (benefit).

Usage: python tools/bloom_bench.py [N_KEYS]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
       SPARK_GRAFT_BENCH_REPLICAS (default 40)
       SPARK_GRAFT_CPUS (default 32)
Prints one JSON line per variant + a summary line.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    replicas = int(os.environ.get("SPARK_GRAFT_BENCH_REPLICAS", "40"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    from bench import make_token_table
    from canal_spark import create_table, get_spark
    from canal_spark.merge import merge_into
    from canal_spark.schema import TOKEN_TABLE_SCHEMA
    from canal_spark.table.writer import append

    spark = get_spark(
        "bloom_bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    tok = make_token_table(spark, sf_dir, replicas).persist()
    tok.count()
    # deterministic victim keys spread across the key space
    victims = [
        r["doc_id"]
        for r in tok.select("doc_id")
        .orderBy(F.crc32("doc_id"), "doc_id")  # deterministic spread
        .limit(n_keys)
        .collect()
    ]
    if len(victims) < n_keys:
        raise SystemExit(f"corpus too small: {len(victims)} victims")
    E = dt.datetime(2026, 1, 1)
    out = {}
    for variant, props in (
        ("plain", None),
        ("bloom", {"write.bloom.col": "doc_id"}),
    ):
        root = tempfile.mkdtemp(prefix=f"bloom_bench_{variant}_")
        shutil.rmtree(root, ignore_errors=True)
        t = create_table(
            root, TOKEN_TABLE_SCHEMA, partition_by=["source"], properties=props
        )
        t0 = time.perf_counter()
        append(spark, t, tok.repartition(64))
        load_s = time.perf_counter() - t0
        rows = [
            (i + 1, "D", k, None, None, None, E, 1)
            for i, k in enumerate(victims)
        ]
        cl = spark.createDataFrame(
            rows,
            "ordinal long, op string, doc_id string, tokens array<int>, "
            "n_tok int, source string, es timestamp, batch_id long",
        )
        t0 = time.perf_counter()
        res = merge_into(spark, t, cl)
        merge_s = time.perf_counter() - t0
        rec = {
            "variant": variant,
            "load_sec": round(load_s, 3),
            "merge_sec": round(merge_s, 3),
            "files_total": res.files_rewritten + res.files_pruned,
            "files_rewritten": res.files_rewritten,
            "files_pruned": res.files_pruned,
            "files_pruned_bloom": res.extra.get("files_pruned_bloom", 0),
            "bytes_rewritten": res.bytes_rewritten,
            "rows_deleted": res.rows_deleted,
        }
        out[variant] = rec
        print(json.dumps(rec), flush=True)
        shutil.rmtree(root, ignore_errors=True)
    tok.unpersist()
    summary = {
        "n_keys": n_keys,
        "replicas": replicas,
        "cpus": cpus,
        "load_overhead_pct": round(
            100.0 * (out["bloom"]["load_sec"] / out["plain"]["load_sec"] - 1), 1
        ),
        "merge_speedup_x": round(
            out["plain"]["merge_sec"] / out["bloom"]["merge_sec"], 2
        ),
        "rewrite_cut_x": round(
            out["plain"]["files_rewritten"]
            / max(out["bloom"]["files_rewritten"], 1),
            1,
        ),
    }
    print(json.dumps(summary), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
