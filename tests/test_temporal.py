"""Temporal joins: as-of and bounded range join — semantics edges the
DuckDB parity harness can't isolate, plus plan-shape audits (no
cartesian product, single keyed shuffle for the as-of)."""

import pytest

from canal_spark.operators.temporal import (
    BUCKET_US,
    RANGE_US,
    q_asof_join,
    q_range_join,
)

SF = "/root/testdata/sf0.001"


def test_asof_join_every_click_appears_once(spark):
    out = q_asof_join(spark, SF).collect()
    ev = spark.read.parquet(f"{SF}/events.parquet")
    n_clicks = ev.where("event_type = 'click'").count()
    assert len(out) == n_clicks
    assert len({r["event_id"] for r in out}) == n_clicks


def test_asof_join_matches_pointwise_oracle(spark):
    """Row-level re-derivation in plain Python: the matched purchase is
    the max-ts purchase with ts <= click ts for that user."""
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    purchases = {}
    for r in ev:
        if r["event_type"] == "purchase":
            purchases.setdefault(r["user_id"], []).append((r["ts"], r["value"]))
    for v in purchases.values():
        v.sort()
    out = q_asof_join(spark, SF).collect()
    for r in out:
        cands = [p for p in purchases.get(r["user_id"], []) if p[0] <= r["ts"]]
        if not cands:
            assert r["last_purchase_value"] is None
            assert r["last_purchase_ts"] is None
        else:
            ts, val = max(cands)
            assert r["last_purchase_ts"] == ts
            assert r["last_purchase_value"] == pytest.approx(val)


def test_asof_join_plan_single_keyed_shuffle_no_cartesian(spark):
    plan = q_asof_join(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the union + window shape needs exactly ONE exchange, keyed on user_id
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan
    assert "user_id" in plan.split("Exchange hashpartitioning", 1)[1][:120]


def test_range_join_counts_match_pointwise_oracle(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    clicks = {}
    for r in ev:
        if r["event_type"] == "click":
            clicks.setdefault(r["user_id"], []).append(r["ts"])
    out = q_range_join(spark, SF).collect()
    import datetime as dt

    w = dt.timedelta(microseconds=RANGE_US)
    purchases = [r for r in ev if r["event_type"] == "purchase"]
    assert len(out) == len(purchases)
    by_id = {r["event_id"]: r["n_clicks_5m"] for r in out}
    for p in purchases:
        expect = sum(
            1
            for ts in clicks.get(p["user_id"], [])
            if p["ts"] - w < ts <= p["ts"]
        )
        assert by_id[p["event_id"]] == expect, p["event_id"]


def test_range_join_plan_is_bucketed_equijoin(spark):
    plan = q_range_join(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # interval explode is bounded: window width == bucket width -> <= 2
    assert RANGE_US == BUCKET_US


def test_asof_join_null_value_purchase_is_not_a_chimera(spark, tmp_path):
    """The matched purchase must be ONE row: when the most recent
    purchase has a NULL value, the result carries (NULL value, its ts)
    — not the previous purchase's value stitched to the latest ts
    (which two independent last(ignorenulls) windows would produce)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0, 7, "purchase", 10.0, None),
        (2, t0 + dt.timedelta(minutes=1), 7, "purchase", None, None),
        (3, t0 + dt.timedelta(minutes=2), 7, "click", 1.0, None),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )
    sf = str(tmp_path / "sfnull")
    df.write.parquet(f"{sf}/events.parquet")
    out = q_asof_join(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert r["last_purchase_value"] is None  # latest purchase's value
    assert r["last_purchase_ts"] == t0 + dt.timedelta(minutes=1)
