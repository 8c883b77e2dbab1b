"""Two-parallelism scaling evidence (sandbox proxy for N vs 4N executors).

Runs bench.py twice on the SAME deterministic input — local[8] and
local[32] — and reports full-scan throughput (sequences/sec) plus
maintenance-pass wall time at both, with scaling efficiencies:

  scan_eff = (seq_per_sec@32 / seq_per_sec@8) / 4
  pass_eff = (pass_sec@8   / pass_sec@32)   / 4

Writes the result as JSON to BENCH_SCALING.json and refreshes the
"## Scaling evidence" section of BASELINE.md.

Usage: python tools/scaling_bench.py [replicas] [sf_dir]
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cpus: int, replicas: int, sf_dir: str) -> dict:
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_BENCH_REPLICAS=str(replicas),
        SPARK_GRAFT_BENCH_QUERIES="none",
        # small stand-in table: shrink splits so >=32 scan tasks exist
        # (the 100 TB table always has enough 128 MB splits on its own)
        SPARK_GRAFT_BENCH_SPLIT_MB="4",
        SPARK_GRAFT_BENCH_TARGET_ROWS="100000",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600, check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    results = {}
    for cpus in (8, 32):
        r = run_bench(cpus, replicas, sf_dir)
        results[cpus] = r
        print(f"local[{cpus}]: scan {r['scan_seq_per_sec']:.0f} seq/s, "
              f"pass {r['value']:.1f}s, rows {r['rows_after']}")

    scan8, scan32 = results[8]["scan_seq_per_sec"], results[32]["scan_seq_per_sec"]
    pass8, pass32 = results[8]["value"], results[32]["value"]
    scan_eff = (scan32 / scan8) / 4.0
    pass_eff = (pass8 / pass32) / 4.0

    summary = {
        "replicas": replicas,
        "sf_dir": sf_dir,
        "rows": results[32]["rows_after"],
        "scan_seq_per_sec": {"local8": scan8, "local32": scan32},
        "maintenance_pass_sec": {"local8": pass8, "local32": pass32},
        "scan_scaling_efficiency": round(scan_eff, 3),
        "pass_scaling_efficiency": round(pass_eff, 3),
        "detail": results,
    }
    with open(os.path.join(REPO, "BENCH_SCALING.json"), "w") as f:
        json.dump(summary, f, indent=2)

    section = f"""## Scaling evidence (measured in-sandbox)

Same deterministic input ({results[32]['rows_loaded']:,} sequences synthesized
from `{sf_dir}/documents.parquet` × {replicas} replicas), identical job, two
parallelism levels — the sandbox proxy for N vs 4N executor clusters
(split size shrunk to 4 MB so the small stand-in exposes ≥32 scan splits,
as a 100 TB table trivially would):

| metric | local[8] | local[32] | scaling efficiency (target ≥ 0.8) |
|---|---|---|---|
| post-maintenance full-scan throughput | {scan8:,.0f} seq/s | {scan32:,.0f} seq/s | **{scan_eff:.2f}** |
| maintenance-pass wall time (merge+compact+cluster+expire) | {pass8:.1f} s | {pass32:.1f} s | {pass_eff:.2f} |

Raw per-run JSON: `BENCH_SCALING.json`. Reproduce:
`python tools/scaling_bench.py {replicas}`.
"""
    path = os.path.join(REPO, "BASELINE.md")
    with open(path) as f:
        text = f.read()
    if "## Scaling evidence" in text:
        text = re.sub(r"## Scaling evidence.*", section, text, flags=re.S)
    else:
        text = text.rstrip() + "\n\n" + section
    with open(path, "w") as f:
        f.write(text)
    print(json.dumps({"scan_eff": scan_eff, "pass_eff": pass_eff}))


if __name__ == "__main__":
    main()
