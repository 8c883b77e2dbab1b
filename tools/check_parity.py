"""Local mirror of the driver's correctness harness: run every
queries() entry on Spark and its oracle_sql() on DuckDB at a given
sf_dir, compare row count, column names, and an order-insensitive
value hash.  Usage: python tools/check_parity.py [sf_dir] [name ...]"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    import datetime as dt
    from decimal import Decimal

    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return repr(v)


def value_hash(rows, colnames):
    """Order-insensitive hash: sort columns by name, then row reprs."""
    import hashlib

    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entrymod
    from canal_spark import get_spark
    from canal_spark.operators.common import release_cached_deps

    spark = get_spark("parity", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            # LINT (stricter than our own hasher, which can handle
            # lists): the EXTERNAL driver canonicalizes through pandas
            # Categorical/factorize, which crashes on unhashable cells —
            # reject array/map/struct output columns outright so the
            # mismatch in harness strictness can never hide again
            # (round-4 pack_materialize lesson: digest such columns,
            # e.g. md5(concat_ws(',', arr))).
            bad = [
                f.name
                for f in sdf.schema.fields
                if f.dataType.typeName() in ("array", "map", "struct")
            ]
            if bad:
                failures.append(
                    (name, f"non-scalar output columns {bad} (driver-unhashable)")
                )
                print(f"FAIL {name}: non-scalar output columns {bad}")
                release_cached_deps(sdf)  # builder may have persisted deps
                continue
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            release_cached_deps(sdf)  # don't leak persisted deps across a 59-query sweep
        except Exception as ex:
            failures.append((name, f"SPARK ERROR: {ex}"))
            print(f"FAIL {name}: spark error: {str(ex)[:300]}")
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows-only check: {len(s_rows)} rows)")
            continue
        try:
            rel = con.sql(oracles[name])
            d_cols = rel.columns
            d_rows = rel.fetchall()
        except Exception as ex:
            failures.append((name, f"DUCKDB ERROR: {ex}"))
            print(f"FAIL {name}: duckdb error: {str(ex)[:300]}")
            continue
        problems = []
        if len(s_rows) != len(d_rows):
            problems.append(f"rows {len(s_rows)} vs {len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols {sorted(s_cols)} vs {sorted(d_cols)}")
        if not problems:
            hs, hd = value_hash(s_rows, s_cols), value_hash(d_rows, d_cols)
            if hs != hd:
                problems.append("value-hash mismatch")
                # show a diff sample
                order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                order_d = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
                set_s = {"|".join(norm_cell(r[i]) for i in order_s) for r in s_rows}
                set_d = {"|".join(norm_cell(r[i]) for i in order_d) for r in d_rows}
                for x in list(set_s - set_d)[:3]:
                    print(f"  spark-only: {x[:160]}")
                for x in list(set_d - set_s)[:3]:
                    print(f"  duck-only : {x[:160]}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            print(f"OK   {name}: {len(s_rows)} rows")
    spark.stop()
    if failures:
        print(f"\n{len(failures)} FAILURES")
        sys.exit(1)
    print("\nALL PARITY CHECKS PASSED")


if __name__ == "__main__":
    main()
