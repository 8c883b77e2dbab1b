"""Property tests for the curation operators beyond the oracle parity
gate (tests/test_entry_parity.py covers value equality): split
determinism/disjointness, mixture budget feasibility, and chunk
coverage/overlap invariants."""

import pytest
from pyspark.sql import functions as F

from canal_spark.operators.curation import (
    CHUNK_LEN,
    CHUNK_STRIDE,
    MIX_BUDGET_DEN,
    q_doc_chunk,
    q_mixture_plan,
    q_train_split,
)
from canal_spark.operators.common import release_cached_deps

SF_DIR = "/root/testdata/sf0.001"


def test_train_split_partitions_every_doc_once(spark):
    agg = q_train_split(spark, SF_DIR)
    total = agg.agg(F.sum("n_docs")).first()[0]
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert total == n_docs  # splits partition the corpus exactly
    splits = {r["split"] for r in agg.select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"}
    assert "train" in splits


def test_train_split_is_rerun_stable(spark):
    a = sorted(tuple(r) for r in q_train_split(spark, SF_DIR).collect())
    b = sorted(tuple(r) for r in q_train_split(spark, SF_DIR).collect())
    assert a == b


def test_mixture_plan_respects_budget_and_availability(spark):
    df = q_mixture_plan(spark, SF_DIR)
    rows = df.collect()
    release_cached_deps(df)
    total_avail = sum(r["avail_tokens"] for r in rows)
    budget = total_avail // MIX_BUDGET_DEN
    assert sum(r["alloc_tokens"] for r in rows) <= budget
    for r in rows:
        assert 0 <= r["alloc_tokens"] <= r["avail_tokens"]
        assert 0 <= r["sample_ppm"] <= 1_000_000
        # exact integer rate: alloc == floor(ppm-rate applied back)
        assert r["sample_ppm"] == r["alloc_tokens"] * 1_000_000 // r["avail_tokens"]


def test_doc_chunk_covers_every_token_with_exact_stride(spark):
    chunks = q_doc_chunk(spark, SF_DIR)
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tok"))
    )
    per_doc = (
        chunks.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.max(F.col("start_tok") + F.col("chunk_len")).alias("cover_end"),
            F.min("chunk_len").alias("min_len"),
            F.max("chunk_len").alias("max_len"),
        )
        .join(docs, "doc_id")
        .collect()
    )
    assert per_doc
    for r in per_doc:
        assert r["cover_end"] == r["n_tok"]  # last chunk ends at doc end
        assert r["max_len"] <= CHUNK_LEN
        assert r["min_len"] >= 1
        # chunk count matches the stride formula exactly
        expect = (max(r["n_tok"] - CHUNK_LEN, 0) + CHUNK_STRIDE - 1) // CHUNK_STRIDE + 1
        assert r["n_chunks"] == expect


def test_doc_chunk_consecutive_windows_overlap(spark):
    chunks = q_doc_chunk(spark, SF_DIR)
    multi = chunks.where(F.col("chunk_idx") > 0).limit(1).collect()
    if not multi:
        pytest.skip("fixture has no multi-chunk docs at this SF")
    r = multi[0]
    # window i starts at i*stride: overlap with window i-1 is LEN-STRIDE
    assert r["start_tok"] == r["chunk_idx"] * CHUNK_STRIDE
    assert CHUNK_LEN - CHUNK_STRIDE > 0


def test_quality_cut_keeps_at_least_pct_and_is_tie_minimal(spark):
    from canal_spark.operators.curation import KEEP_PCT, q_quality_cut
    from canal_spark.operators.text import q_quality_score

    cut = {r["source"]: r for r in q_quality_cut(spark, SF_DIR).collect()}
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "source")
    scored = (
        q_quality_score(spark, SF_DIR)
        .join(docs, "doc_id")
        .select("source", "quality_milli")
        .collect()
    )
    by_src = {}
    for r in scored:
        by_src.setdefault(r["source"], []).append(r["quality_milli"])
    assert set(by_src) == set(cut)
    for src, qs in by_src.items():
        row = cut[src]
        need = (len(qs) * KEEP_PCT + 99) // 100
        t = row["threshold_milli"]
        kept = [q for q in qs if q >= t]
        assert row["n_docs"] == len(qs)
        assert row["n_kept"] == len(kept) >= need  # quota met
        # minimal: excluding the threshold bucket would miss the quota
        assert len([q for q in qs if q > t]) < need


def test_dsir_weight_ranks_target_like_docs_higher(spark, tmp_path):
    """Planted fixture: docs sharing the target domain's vocabulary must
    out-score docs with disjoint vocabulary, and the weight must be
    deterministic across re-runs (exact integer math)."""
    from canal_spark.operators.curation import DSIR_TGT_MOD, q_dsir_weight

    tgt_text = "alpha beta gamma delta alpha beta gamma delta"
    like_text = "alpha beta gamma delta epsilon"
    far_text = "zork quux blarg wibble frotz"
    rows = []
    # target docs: ids divisible by DSIR_TGT_MOD
    for k in range(1, 4):
        rows.append((k * DSIR_TGT_MOD, tgt_text, "s0"))
    # raw pool: 5 target-like, 5 far
    for i in range(5):
        rows.append((1 + i, like_text, "s1"))
        rows.append((10 + i, far_text, "s2"))
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    sf = str(tmp_path)
    df.write.parquet(f"{sf}/documents.parquet")

    q1 = q_dsir_weight(spark, sf)
    out = {r["doc_id"]: r["dsir_ppm"] for r in q1.collect()}
    release_cached_deps(q1)
    assert set(out) == {1, 2, 3, 4, 5, 10, 11, 12, 13, 14}
    like = [out[i] for i in range(1, 6)]
    far = [out[i] for i in range(10, 15)]
    assert min(like) > max(far), (like, far)
    # determinism: identical weights on a re-run
    q2 = q_dsir_weight(spark, sf)
    out2 = {r["doc_id"]: r["dsir_ppm"] for r in q2.collect()}
    release_cached_deps(q2)
    assert out == out2


def test_length_bucket_plan_accounting_and_feasibility(spark):
    from canal_spark.operators.curation import (
        BATCH_TOKENS,
        LEN_BUCKETS,
        MAX_SEQ,
        q_length_bucket_plan,
    )

    rows = q_length_bucket_plan(spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()
    n_words = docs.agg(
        F.sum(F.size(F.split(F.coalesce("text", F.lit("")), " ")))
    ).first()[0]

    assert sum(r["n_seqs"] for r in rows) == n_docs  # buckets partition
    # conservation: every word is either kept (real) or truncated
    assert sum(r["real_tokens"] + r["trunc_tokens"] for r in rows) == n_words
    for r in rows:
        assert r["bucket_len"] in LEN_BUCKETS
        padded = r["n_seqs"] * r["bucket_len"]
        assert 0 <= r["real_tokens"] <= padded
        # exact ppm: floor of the integer ratio
        assert r["pad_ppm"] == (padded - r["real_tokens"]) * 1_000_000 // padded
        # truncation only happens at the cap bucket
        if r["bucket_len"] < MAX_SEQ:
            assert r["trunc_tokens"] == 0
        # batch feasibility: minimal batch count for the budget
        spb = BATCH_TOKENS // r["bucket_len"]
        assert r["n_batches"] * spb >= r["n_seqs"]
        assert (r["n_batches"] - 1) * spb < r["n_seqs"]


def test_length_bucket_plan_bucket_assignment_is_minimal(spark, tmp_path):
    from canal_spark.operators.curation import q_length_bucket_plan

    # exact boundary docs: 16 words -> bucket 16; 17 words -> bucket 32;
    # 600 words -> cap 512 with 88 truncated
    rows = [
        (1, " ".join(["w"] * 16), "s"),
        (2, " ".join(["w"] * 17), "s"),
        (3, " ".join(["w"] * 600), "s"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    sf = str(tmp_path)
    df.write.parquet(f"{sf}/documents.parquet")
    out = {r["bucket_len"]: r for r in q_length_bucket_plan(spark, sf).collect()}
    assert set(out) == {16, 32, 512}
    assert out[16]["pad_ppm"] == 0 and out[16]["trunc_tokens"] == 0
    assert out[32]["real_tokens"] == 17
    assert out[512]["real_tokens"] == 512 and out[512]["trunc_tokens"] == 88
