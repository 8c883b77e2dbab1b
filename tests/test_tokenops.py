"""Token-payload curation ops (operators/tokenops.py): exact
duplicated-span detection/excision and token-distribution drift."""

import pytest
from pyspark.sql import functions as F

from canal_spark.etl import _TOKENS_EXPR
from canal_spark.operators.common import load, md5int
from canal_spark.operators.tokenops import (
    DUP_B,
    DUP_MOD,
    DUP_REMS,
    DUP_W,
    covered_positions,
    duplicated_spans,
    injected_token_view,
    q_dup_span_cut,
    q_dup_span_detect,
    q_token_drift,
    span_windows,
)

SF = "/root/testdata/sf0.001"


def _is_injected(doc_id: int) -> bool:
    return doc_id % DUP_MOD in DUP_REMS


def test_detect_hits_every_injected_doc(spark):
    rows = {r["doc_id"]: r for r in q_dup_span_detect(spark, SF).collect()}
    docs = [r["doc_id"] for r in load(spark, SF, "documents").select("doc_id").collect()]
    injected = [d for d in docs if _is_injected(d)]
    # each decade contributes >=2 docs sharing the boilerplate
    assert injected and all(d in rows for d in injected)
    for d in injected:
        # the boilerplate contributes exactly B-W+1 windows and covers B
        # positions; natural word-salad dups can only ADD on top
        assert rows[d]["n_dup_windows"] >= DUP_B - DUP_W + 1
        assert rows[d]["n_dup_tokens"] >= DUP_B


def test_cut_restores_injected_docs_exactly(spark):
    """The boilerplate is synthetic (never natural text) and fenced by
    the per-doc sentinel, so excising covered positions must restore
    the original tokens + sentinel (injected docs) or leave the doc
    untouched (clean docs) — for docs with no natural dup spans."""
    docs = load(spark, SF, "documents")
    # expected post-cut text: original, plus the sentinel when injected
    expect_txt = F.when(
        F.expr(f"doc_id % {DUP_MOD}").isin(*DUP_REMS),
        F.concat_ws(
            " ", F.col("text"), F.concat(F.lit("u"), F.col("doc_id").cast("string"))
        ),
    ).otherwise(F.col("text"))
    orig = {
        r["doc_id"]: (r["fp"], r["n"])
        for r in docs.select("doc_id", expect_txt.alias("text")).select(
            "doc_id",
            md5int(
                F.array_join(
                    F.transform(
                        F.expr(_TOKENS_EXPR), lambda x: x.cast("string")
                    ),
                    ",",
                )
            ).alias("fp"),
            F.size(F.expr(_TOKENS_EXPR)).alias("n"),
        ).collect()
    }
    # docs whose NATURAL text already shares a span with another doc —
    # excision legitimately cuts deeper there, so exclude them
    natural = {
        r["doc_id"]
        for r in duplicated_spans(
            span_windows(
                docs.select(
                    "doc_id", F.expr(_TOKENS_EXPR).alias("toks")
                )
            )
        )
        .select("doc_id")
        .distinct()
        .collect()
    }
    cut = {r["doc_id"]: r for r in q_dup_span_cut(spark, SF).collect()}
    checked = 0
    for d, (fp, n) in orig.items():
        if d in natural:
            continue
        if _is_injected(d):
            assert cut[d]["n_tok_clean"] == n, d
            assert cut[d]["clean_fp"] == fp, d
            checked += 1
        elif d in cut:
            assert cut[d]["n_tok_clean"] == n
            assert cut[d]["clean_fp"] == fp
    assert checked >= 2  # the fixture really exercised the invariant


def test_sample_mod_subsets_and_detects_long_runs(spark):
    """Hash-threshold sampling keeps a strict subset of windows, and a
    long duplicated run still surfaces at k>1 when any of its windows
    survives the threshold (the scale path's recall argument)."""
    t = injected_token_view(spark, SF)
    full = span_windows(t)
    k = 3
    sampled = span_windows(t, sample_mod=k)
    n_full, n_samp = full.count(), sampled.count()
    assert 0 < n_samp < n_full
    # sampled windows are a subset of full windows
    assert sampled.join(full, ["doc_id", "pos", "h"], "left_anti").count() == 0
    # every sampled dup hit is also a full dup hit
    hs = duplicated_spans(sampled)
    hf = duplicated_spans(full)
    assert hs.join(hf, ["doc_id", "pos", "h"], "left_anti").count() == 0


def test_covered_positions_are_within_doc(spark):
    t = injected_token_view(spark, SF)
    cov = covered_positions(duplicated_spans(span_windows(t)))
    n = t.select("doc_id", F.size("toks").alias("n"))
    bad = cov.join(n, "doc_id").where(
        (F.col("p") < 0) | (F.col("p") >= F.col("n"))
    )
    assert bad.count() == 0


def test_token_drift_bounds_and_self_consistency(spark):
    rows = q_token_drift(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r["tv_ppm"] <= 1_000_000
        assert r["n_tokens"] > 0
    # a single-source corpus has zero drift vs itself
    one = (
        load(spark, SF, "documents")
        .where(F.col("source") == rows[0]["source"])
    )
    one.createOrReplaceTempView("_drift_one")
    # reuse the operator shape manually on the one-source frame
    t = one.select("source", F.expr(_TOKENS_EXPR).alias("toks"))
    per = (
        t.select("source", F.explode("toks").alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ns = per.groupBy("source").agg(F.sum("c").alias("n_s"))
    # p == q identically when the source IS the corpus
    gl = per.groupBy("tok").agg(F.sum("c").alias("c_t"))
    n_val = gl.agg(F.sum("c_t")).collect()[0][0]
    j = per.join(ns, "source").select(
        F.expr("c * 1000000 DIV n_s").alias("p"),
        (F.col("c") * 1_000_000 / F.lit(n_val)).cast("long").alias("q_like"),
    )
    assert j.where(F.col("p") != F.col("q_like")).count() == 0


def test_dup_span_plan_shape(spark):
    """No window functions, no cartesian products in the detect plan."""
    plan = q_dup_span_detect(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
