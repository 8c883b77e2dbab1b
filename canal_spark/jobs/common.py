"""Shared CLI plumbing for the spark-submit jobs."""

from __future__ import annotations

import argparse
import json


def base_parser(desc: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=desc)
    p.add_argument("table", help="table root path")
    p.add_argument("--lineage", default=None, help="lineage table root (checkpoint + metrics)")
    p.add_argument("--job-id", default=None)
    p.add_argument("--app-name", default=None)
    return p


def session(args, default_name: str):
    from canal_spark import get_spark

    # master comes from spark-submit / environment — never hardcoded here.
    # Under spark-submit the JVM gateway is already up (PYSPARK_GATEWAY_PORT
    # set) and spark.master is in its conf: pass 'from-submit' so get_spark
    # never overrides the cluster manager with a local[*] fallback.
    import os

    master = os.environ.get("SPARK_GRAFT_MASTER")
    if not master and "PYSPARK_GATEWAY_PORT" in os.environ:
        master = "from-submit"
    return get_spark(args.app_name or default_name, master=master)


def emit(report: dict) -> None:
    print(json.dumps(report, default=str))
