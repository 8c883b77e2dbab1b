"""Dedicated full-scan throughput measurement on an existing table.

Fresh process + fresh SparkSession per measurement so heap/GC state
from prior phases can't pollute the number; best-of-5 scans reading
every token of every row (array aggregate, JVM-side).

Usage: python tools/scan_bench.py TABLE_ROOT CPUS [SPLIT_MB]
Prints one JSON line {"cpus": N, "rows": R, "scan_sec": S, "seq_per_sec": T}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    root, cpus = sys.argv[1], int(sys.argv[2])
    split_mb = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from pyspark.sql import functions as F

    from canal_spark import get_spark, load_table

    spark = get_spark(
        "scan_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            # small stand-in files: shrink splits so there are several
            # task waves per thread (a 100 TB table has 800k+ splits)
            "spark.sql.files.maxPartitionBytes": str(split_mb << 20),
            "spark.sql.files.openCostInBytes": str(256 << 10),
        },
    )
    t = load_table(root)
    df = t.scan(spark)
    best = float("inf")
    rows = 0
    for _ in range(5):
        t0 = time.perf_counter()
        r = df.agg(
            F.count("*").alias("n"),
            F.sum(F.expr("aggregate(tokens, 0L, (a, x) -> a + x)")).alias("chk"),
        ).collect()[0]
        best = min(best, time.perf_counter() - t0)
        rows = r["n"]
    print(json.dumps({
        "cpus": cpus,
        "rows": int(rows),
        "scan_sec": round(best, 3),
        "seq_per_sec": round(rows / best, 1),
        "n_splits": df.rdd.getNumPartitions(),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
