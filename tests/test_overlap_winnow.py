"""Property tests for the cross-source overlap matrix and the
winnowing fingerprint pairs (dedup.py round-4 wave-14 operators).

- winnowing detection GUARANTEE (Schleimer et al., SIGMOD 2003): any
  shared word run of length >= w + k - 1 (k = 3-word shingles) selects
  at least one common fingerprint in both documents — verified against
  a pure-Python winnower on engineered corpora.
- source_overlap exact values on a hand-computable corpus, plus the
  boilerplate spread cap semantics.
"""

import pytest


def _write_docs(spark, tmp_path, rows):
    """rows: (doc_id, source, text) — the minimal documents fixture."""
    df = spark.createDataFrame(
        [(i, s, t, len(t)) for (i, s, t) in rows],
        "doc_id long, source string, text string, n_chars long",
    )
    sf_dir = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")
    return sf_dir


def _py_winnow_fps(text, w):
    """Reference winnower: 3-word shingle hashes, window-of-w minima."""
    import hashlib

    ws = text.split(" ")
    hs = [
        int(hashlib.md5(" ".join(ws[i : i + 3]).encode()).hexdigest()[:15], 16)
        for i in range(len(ws) - 2)
    ]
    return {min(hs[i : i + w]) for i in range(len(hs) - w + 1)}


def test_winnow_matches_python_reference(spark, tmp_path):
    """Engine pairs == brute-force pairs from the Python winnower on a
    mixed corpus (shared runs, disjoint docs, a short doc below the
    window threshold)."""
    from canal_spark.operators.dedup import q_winnow_pairs

    run = " ".join(f"r{k}" for k in range(20))
    rows = [
        (1, "s0", " ".join(f"a{k}" for k in range(10)) + " " + run),
        (2, "s0", run + " " + " ".join(f"b{k}" for k in range(10))),
        (3, "s1", " ".join(f"c{k}" for k in range(30))),
        (4, "s1", "tiny doc here"),  # 3 words: below one full window
        (5, "s2", run),  # the run alone
    ]
    sf_dir = _write_docs(spark, tmp_path, rows)
    w, min_shared = 4, 1
    fps = {
        i: _py_winnow_fps(t, w) for (i, _, t) in rows if len(t.split()) >= w + 2
    }
    expect = {}
    ids = sorted(fps)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            n = len(fps[a] & fps[b])
            if n >= min_shared:
                expect[(a, b)] = n
    got = {
        (r["doc_a"], r["doc_b"]): r["n_shared"]
        for r in q_winnow_pairs(
            spark, sf_dir, w=w, min_shared=min_shared, max_docs=100
        ).collect()
    }
    assert got == expect
    # the guarantee: docs 1,2,5 share a 20-word run >= w+3-1=6 words,
    # so every pair among them MUST be detected
    for pair in [(1, 2), (1, 5), (2, 5)]:
        assert pair in got


def test_winnow_guarantee_at_threshold_run(spark, tmp_path):
    """A shared run of EXACTLY w + k - 1 words (the theoretical minimum)
    still yields a common fingerprint."""
    from canal_spark.operators.dedup import q_winnow_pairs

    w = 4
    run = " ".join(f"s{k}" for k in range(w + 3 - 1))  # w+k-1 words
    rows = [
        (1, "s0", " ".join(f"x{k}" for k in range(12)) + " " + run),
        (2, "s0", run + " " + " ".join(f"y{k}" for k in range(12))),
    ]
    sf_dir = _write_docs(spark, tmp_path, rows)
    got = q_winnow_pairs(
        spark, sf_dir, w=w, min_shared=1, max_docs=100
    ).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in got} == {(1, 2)}


def test_winnow_hot_fp_cap_drops_boilerplate(spark, tmp_path):
    """A fingerprint present in more than max_docs documents is excluded
    from pairing (the O(b²) guard); distinctive fps still pair."""
    from canal_spark.operators.dedup import q_winnow_pairs

    boiler = " ".join(f"bp{k}" for k in range(10))
    rows = [(i, "s0", boiler) for i in range(1, 7)]  # 6 docs of boilerplate
    uniq = " ".join(f"u{k}" for k in range(10))
    rows += [(10, "s1", uniq), (11, "s1", uniq)]
    sf_dir = _write_docs(spark, tmp_path, rows)
    got = {
        (r["doc_a"], r["doc_b"])
        for r in q_winnow_pairs(
            spark, sf_dir, w=4, min_shared=1, max_docs=3
        ).collect()
    }
    # every boilerplate fp sits in 6 > 3 docs -> capped out entirely;
    # the unique pair (2 docs per fp) survives
    assert got == {(10, 11)}


def test_source_overlap_exact_values(spark, tmp_path):
    """Hand-computable corpus: s0/s1 share exactly one shingle; s0/s2
    disjoint.  Jaccard ppm is exact integer floor division."""
    from canal_spark.operators.dedup import q_source_overlap

    rows = [
        (1, "s0", "a b c d"),   # shingles: 'a b c', 'b c d'
        (2, "s1", "b c d e"),   # shingles: 'b c d', 'c d e'
        (3, "s2", "x y z"),     # shingle: 'x y z'
    ]
    sf_dir = _write_docs(spark, tmp_path, rows)
    got = {
        (r["src_a"], r["src_b"]): (
            r["n_src_a"], r["n_src_b"], r["n_shared"], r["jaccard_ppm"]
        )
        for r in q_source_overlap(spark, sf_dir).collect()
    }
    # only the s0/s1 pair shares anything: inter=1, union=2+2-1=3
    assert got == {("s0", "s1"): (2, 2, 1, 1_000_000 // 3)}


def test_source_overlap_spread_cap_excludes_boilerplate(spark, tmp_path):
    """A shingle present in more sources than max_spread contributes no
    pair evidence, while per-source totals still count it."""
    from canal_spark.operators.dedup import q_source_overlap

    boiler = "p q r"  # one shingle, present in every source
    rows = [(i, f"s{i}", boiler) for i in range(4)]
    rows += [(10, "s0", "a b c"), (11, "s1", "a b c")]
    sf_dir = _write_docs(spark, tmp_path, rows)
    got = {
        (r["src_a"], r["src_b"]): (r["n_src_a"], r["n_src_b"], r["n_shared"])
        for r in q_source_overlap(spark, sf_dir, max_spread=3).collect()
    }
    # 'p q r' spread=4 > 3 -> dropped; only 'a b c' pairs s0/s1.
    # totals still include the boilerplate shingle (2 each).
    assert got == {("s0", "s1"): (2, 2, 1)}


def test_ngram_novelty_exact_values(spark, tmp_path):
    """Hand-computable: doc 1 owns both its shingles; doc 2 restates
    one of doc 1's and adds one new -> 500000 ppm; doc 3 fully novel."""
    from canal_spark.operators.dedup import q_ngram_novelty

    rows = [
        (1, "s0", "a b c d"),   # shingles {a b c, b c d} — both first here
        (2, "s0", "b c d e"),   # {b c d (first: doc 1), c d e (novel)}
        (3, "s1", "x y z"),     # {x y z} novel
    ]
    sf_dir = _write_docs(spark, tmp_path, rows)
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_novel"], r["novelty_ppm"])
        for r in q_ngram_novelty(spark, sf_dir).collect()
    }
    assert got == {
        1: (2, 2, 1_000_000),
        2: (2, 1, 500_000),
        3: (1, 1, 1_000_000),
    }
