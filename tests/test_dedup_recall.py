"""Blocking recall for the banded SimHash pair join: the multi-band
candidate join must find EVERY pair within the Hamming threshold
(pigeonhole: HAM_MAX < N_BANDS), verified against brute-force all-pairs
on a fixture engineered to contain near-duplicates."""


def _brute_pairs(rows, ham_max):
    out = set()
    by_id = sorted(rows, key=lambda r: r["doc_id"])
    for i in range(len(by_id)):
        for j in range(i + 1, len(by_id)):
            a, b = by_id[i], by_id[j]
            d = bin(a["simhash"] ^ b["simhash"]).count("1")
            if d <= ham_max:
                out.add((a["doc_id"], b["doc_id"], d))
    return out


def test_banded_simhash_pairs_equal_brute_force(spark, tmp_path):
    from canal_spark.operators.dedup import HAM_MAX, q_simhash_pairs, wide_simhash

    # synthesize near-dup docs: pairs (2i, 2i+1) share 39 of 40 words ->
    # signatures land within a few bits; unrelated docs are far apart
    words = [f"w{k}" for k in range(40)]
    docs = []
    for i in range(12):
        base = [f"{w}x{i}" for w in words]
        docs.append((2 * i, " ".join(base)))
        docs.append((2 * i + 1, " ".join(base[:-1] + [f"odd{i}"])))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sf_dir = str(tmp_path)
    df.write.parquet(f"{sf_dir}/documents.parquet")

    sigs = wide_simhash(spark, sf_dir).collect()
    exact = _brute_pairs(sigs, HAM_MAX)
    assert exact, "fixture must contain at least one near-dup pair"

    blocked = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in q_simhash_pairs(spark, sf_dir).collect()
    }
    # perfect recall AND no false positives (the join verifies hamming)
    assert blocked == exact


def test_dedup_groups_are_valid_connected_components(spark):
    """Label-propagation output is a correct component labeling of the
    LSH candidate graph: both endpoints of every candidate pair share a
    group, and each group's id is its minimum member (checked against a
    python union-find on the same edges)."""
    from canal_spark.operators.dedup import q_dedup_groups, q_dedup_minhash_lsh

    sf = "/root/testdata/sf0.001"
    pairs = [(r["doc_a"], r["doc_b"]) for r in q_dedup_minhash_lsh(spark, sf).collect()]
    got = {r["doc_id"]: r["group_id"] for r in q_dedup_groups(spark, sf).collect()}

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comps = {}
    for n in parent:
        comps.setdefault(find(n), []).append(n)
    expect = {}
    for members in comps.values():
        g = min(members)
        for m in members:
            expect[m] = g
    assert got == expect


def test_ivf_cells_are_true_argmax_and_recall_floor(spark):
    """Real centroid assignment with one Lloyd refinement: the refined
    codebook equals a numpy replication (seed-assign -> per-cell mean
    rounded to 6 -> reassign), every vector's cell is the argmax-cosine
    refined centroid, and multi-probe IVF recall@1 vs brute force
    clears the floor with NPROBE=3 of the FIXED IVF_K=16 cells on the
    deterministic fixture.  Seeds are the K smallest LCG-hash picks —
    the codebook size is a constant, never n-dependent."""
    import numpy as np

    from canal_spark.operators.similarity import (
        IVF_K,
        SEED_ADD,
        SEED_DOM,
        SEED_MOD,
        SEED_MUL,
        TRAIN_N,
        _with_norm,
        ivf_cells,
        ivf_centroids,
        q_embed_cosine_topk,
        q_embed_ivf_topk,
    )
    from canal_spark.operators.common import load

    sf = "/root/testdata/sf0.001"
    e = _with_norm(load(spark, sf, "embeddings"))
    vecs = {r["vec_id"]: np.array(r["v"]) for r in e.collect()}

    def seed_hash(vid):
        return ((vid % SEED_DOM) * SEED_MUL + SEED_ADD) % SEED_MOD

    seed_ids = sorted(vecs, key=lambda i: (seed_hash(i), i))[:IVF_K]
    seeds = {i: vecs[i] for i in seed_ids}

    def argmax(v, cdict):
        scores = {
            cid: round(float(v @ cv / (np.linalg.norm(v) * np.linalg.norm(cv))), 9)
            for cid, cv in cdict.items()
        }
        return max(scores.items(), key=lambda kv: (kv[1], -kv[0]))[0]

    # numpy replication of the one-step Lloyd update over the bounded
    # training sample (TRAIN_N smallest by the same hash order; at this
    # 500-vector fixture the sample IS the full corpus)
    train_ids = sorted(vecs, key=lambda i: (seed_hash(i), i))[:TRAIN_N]
    assign0 = {vid: argmax(vecs[vid], seeds) for vid in train_ids}
    refined = {}
    for cell in set(assign0.values()):
        members = np.array([vecs[vid] for vid, c in assign0.items() if c == cell])
        refined[cell] = np.round(members.mean(axis=0), 6)

    # collect through the cached-deps contract (the builder persists its
    # train sample and tags the result; a raw .collect() would leak it)
    from canal_spark.operators.common import release_cached_deps

    cents_df = ivf_centroids(e)
    got_cents = {r["cent_id"]: np.array(r["cv"]) for r in cents_df.collect()}
    release_cached_deps(cents_df)
    assert set(got_cents) == set(refined)
    for cid in refined:
        assert np.allclose(got_cents[cid], refined[cid], atol=1e-9), cid

    got = {r["vec_id"]: r["cell"] for r in ivf_cells(e).collect()}
    for vid, v in vecs.items():
        best = argmax(v, refined)
        assert got[vid] == best, f"vec {vid}: {got[vid]} != argmax {best}"

    brute = {
        r["q_id"]: r["n_id"]
        for r in q_embed_cosine_topk(spark, sf).where("rank=1").collect()
    }
    ivf = {r["q_id"]: r["n_id"] for r in q_embed_ivf_topk(spark, sf).collect()}
    recall = sum(1 for q in brute if ivf.get(q) == brute[q]) / len(brute)
    assert recall >= 0.5  # seeded codebook scored 0.4 on this fixture


def test_dedup_groups_reliable_checkpoint_same_labels(spark, tmp_path):
    """With a reliable checkpoint dir configured the CC loop switches
    from localCheckpoint (plan truncation only) to DataFrame.checkpoint
    (lineage-recoverable) — labels must be identical either way."""
    from canal_spark.operators.dedup import q_dedup_groups

    sf = "/root/testdata/sf0.001"
    base = {r["doc_id"]: r["group_id"] for r in q_dedup_groups(spark, sf).collect()}
    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None
    sc.setCheckpointDir(str(tmp_path / "ckpt"))
    try:
        rel = {r["doc_id"]: r["group_id"] for r in q_dedup_groups(spark, sf).collect()}
    finally:
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(sc._jvm.scala.Option.empty())
    assert rel == base
    import os
    assert os.listdir(str(tmp_path / "ckpt"))  # checkpoints actually written


def test_lsh_hot_bucket_cap_bounds_pair_blowup(spark, tmp_path):
    """A degenerate mega-bucket (N identical templated docs sharing every
    minhash) must NOT produce O(N²) candidate pairs: buckets above the
    cap are dropped, distinct near-dup docs still pair, and
    band_index_stats reports exactly what was dropped."""
    from canal_spark.operators.dedup import (
        _minhash_bands,
        band_index_stats,
        q_dedup_minhash_lsh,
    )

    n_mega = 40  # identical docs -> every band collapses to one bucket
    docs = [(i, "the same boiler plate template text here") for i in range(n_mega)]
    # two genuinely near-dup docs that must survive the cap
    docs += [
        (1000, " ".join(f"u{k}" for k in range(20))),
        (1001, " ".join(f"u{k}" for k in range(19)) + " tail"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sf_dir = str(tmp_path)
    df.write.parquet(f"{sf_dir}/documents.parquet")

    capped = q_dedup_minhash_lsh(spark, sf_dir, max_bucket=10).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in capped}
    assert (1000, 1001) in got  # small buckets untouched
    assert all(a >= 1000 for a, _ in got)  # no mega-bucket pairs at all
    # without the guard the join would emit n_mega*(n_mega-1)/2 pairs
    assert len(got) < n_mega * (n_mega - 1) // 2

    stats = band_index_stats(_minhash_bands(spark, sf_dir, max_bucket=10**9),
                             max_bucket=10).collect()
    dropped = [r for r in stats if r["dropped"]]
    assert dropped and all(r["bucket_size"] == n_mega for r in dropped)
    kept = [r for r in stats if not r["dropped"]]
    assert kept  # the near-dup docs' buckets are reported, not dropped


def test_zero_norm_embedding_assigns_deterministically(spark):
    """An all-zero embedding must score cosine 0 against every centroid
    (never NaN — NaN sorts above every double in Spark and argmax over
    an all-NaN numpy row silently returns 0) and assign to the LOWEST
    centroid id in both the Arrow kernel and the expression path."""
    from pyspark.sql import functions as F

    from canal_spark.operators.similarity import (
        EMB_DIM,
        _assign_cell_udf,
        _cosine,
        _probe_cells_expr,
    )

    cents = [(5, [1.0] * EMB_DIM, float(EMB_DIM) ** 0.5),
             (9, [0.5] * EMB_DIM, (0.25 * EMB_DIM) ** 0.5)]
    df = spark.createDataFrame(
        [(1, [0.0] * EMB_DIM), (2, [1.0] * EMB_DIM)],
        "vec_id long, v array<double>",
    ).withColumn(
        "norm",
        F.sqrt(F.aggregate(F.transform("v", lambda x: x * x),
                           F.lit(0.0), lambda a, x: a + x)),
    )
    got = {r["vec_id"]: r for r in df.select(
        "vec_id",
        _assign_cell_udf(cents)("v").alias("cell"),
        _probe_cells_expr(cents, 1)[0].alias("probe"),
        F.round(_cosine(F.col("v"), F.lit([1.0] * EMB_DIM),
                        F.col("norm"), F.lit(float(EMB_DIM) ** 0.5)), 9
                ).alias("cos"),
    ).collect()}
    assert got[1]["cos"] == 0.0          # zero vector: 0, not NaN
    assert got[1]["cell"] == 5           # lowest centroid id, kernel
    assert got[1]["probe"] == 5          # lowest centroid id, expr path
    assert got[2]["cos"] == 1.0          # sane vector unaffected


def test_line_dedup_reassembly_and_flag_invariants(spark):
    """A doc with zero corpus-duplicated spans reassembles to its
    original text verbatim; flagged counts are consistent (0 <=
    n_dup_spans <= n_spans, n_spans == ceil(words/SPAN_W)); and every
    span the operator dropped really does occur >= SPAN_DUP_T times in
    the corpus-wide span multiset (no over-dropping)."""
    from canal_spark.operators.text import SPAN_DUP_T, SPAN_W, q_line_dedup

    sf = "/root/testdata/sf0.001"
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf}/documents.parquet").collect()
    }
    got = {r["doc_id"]: r for r in q_line_dedup(spark, sf).collect()}
    assert set(got) == set(docs)

    from collections import Counter

    corpus_spans = Counter()
    per_doc_spans = {}
    for did, text in docs.items():
        ws = text.split(" ")
        spans = [
            " ".join(ws[i : i + SPAN_W]) for i in range(0, len(ws), SPAN_W)
        ]
        per_doc_spans[did] = spans
        corpus_spans.update(spans)

    for did, r in got.items():
        spans = per_doc_spans[did]
        assert r["n_spans"] == len(spans)
        expect_dup = sum(1 for s in spans if corpus_spans[s] >= SPAN_DUP_T)
        assert r["n_dup_spans"] == expect_dup
        kept = [s for s in spans if corpus_spans[s] < SPAN_DUP_T]
        assert r["clean_text"] == " ".join(kept)
        if r["n_dup_spans"] == 0:
            assert r["clean_text"] == docs[did]


def test_dedup_canonical_keeps_best_per_group_and_partitions_corpus(spark):
    """Canonical selection: one survivor per group; group sizes sum to
    the corpus size; the survivor is the argmax (quality, -doc_id) of
    its group's members; singleton docs keep themselves."""
    from canal_spark.operators.dedup import q_dedup_canonical, q_dedup_groups
    from canal_spark.operators.text import q_quality_score

    sf = "/root/testdata/sf0.001"
    n_docs = spark.read.parquet(f"{sf}/documents.parquet").count()
    labels = {
        r["doc_id"]: r["group_id"] for r in q_dedup_groups(spark, sf).collect()
    }
    quality = {
        r["doc_id"]: r["quality_milli"]
        for r in q_quality_score(spark, sf).collect()
    }
    kept = q_dedup_canonical(spark, sf).collect()

    groups = {}
    for did in quality:
        groups.setdefault(labels.get(did, did), []).append(did)

    assert {r["group_id"] for r in kept} == set(groups)
    assert sum(r["n_members"] for r in kept) == n_docs
    for r in kept:
        members = groups[r["group_id"]]
        assert r["n_members"] == len(members)
        best = min(members, key=lambda d: (-quality[d], d))
        assert r["keep_doc_id"] == best
        assert r["keep_quality_milli"] == quality[best]


def test_pii_redact_strips_everything_and_matches_python_re(spark):
    """The redacted text contains zero residual pattern matches (checked
    JVM-side), counts follow the deterministic injection formula, and
    the fingerprint equals an independent Python ``re`` redaction of the
    same enriched text — Spark's Java regex and the test's re module
    agree on these patterns by construction (common subset only)."""
    import hashlib
    import re

    from pyspark.sql import functions as F

    from canal_spark.operators.text import (
        PII_EMAIL,
        PII_IP,
        PII_PHONE,
        _PII_INJECT_SPARK,
        q_pii_redact,
    )

    sf = "/root/testdata/sf0.001"
    got = {r["doc_id"]: r for r in q_pii_redact(spark, sf).collect()}
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf}/documents.parquet").collect()
    }
    assert set(got) == set(docs)

    for did, text in docs.items():
        r = got[did]
        assert r["n_emails"] == did % 3
        assert r["n_phones"] == (did // 3) % 2
        assert r["n_ips"] == did % 2
        enriched = (
            text
            + f" user{did}@example.com" * (did % 3)
            + f" +1-555-{did % 10000:04d}" * ((did // 3) % 2)
            + f" 10.{did % 256}.0.{did * 7 % 256}" * (did % 2)
        )
        red = re.sub(PII_EMAIL, "<EMAIL>", enriched)
        red = re.sub(PII_PHONE, "<PHONE>", red)
        red = re.sub(PII_IP, "<IP>", red)
        for pat in (PII_EMAIL, PII_PHONE, PII_IP):
            assert not re.search(pat, red)
        want_fp = int(hashlib.md5(red.encode()).hexdigest()[:15], 16)
        assert r["redacted_fp"] == want_fp

    # JVM-side residual check: after redaction, zero matches remain.
    residual = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select(F.expr(_PII_INJECT_SPARK).alias("t"))
        .select(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace("t", PII_EMAIL, "<EMAIL>"),
                    PII_PHONE,
                    "<PHONE>",
                ),
                PII_IP,
                "<IP>",
            ).alias("red")
        )
        .select(
            (
                F.regexp_count("red", F.lit(PII_EMAIL))
                + F.regexp_count("red", F.lit(PII_PHONE))
                + F.regexp_count("red", F.lit(PII_IP))
            ).alias("n")
        )
        .agg(F.sum("n").alias("total"))
        .collect()[0]["total"]
    )
    assert residual == 0


def test_decontaminate_spans_matches_python_reference(spark):
    """Third-engine check: a direct Python mirror of the semantics —
    inject the decade-partner eval prefix into doc_id%7==3 train docs,
    remove every word position covered by a 6-gram present anywhere in
    the eval set, reassemble.  (The fixture corpus contains deliberate
    near-duplicates, so NATURAL eval/train overlap exists beyond the
    injected spans — the reference accounts for both.)  Also asserts
    the removal path really fires and that injected spans always go."""
    from canal_spark.operators.text import (
        CONTAM_MOD,
        CONTAM_REM,
        CONTAM_WORDS,
        EVAL_MOD,
        EVAL_REM,
        NGRAM_D,
        q_decontaminate_spans,
    )

    sf = "/root/testdata/sf0.001"
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf}/documents.parquet").collect()
    }
    eval_ids = {d for d in docs if d % EVAL_MOD == EVAL_REM}

    forbidden = set()
    for d in eval_ids:
        ws = docs[d].split(" ")
        for i in range(len(ws) - NGRAM_D + 1):
            forbidden.add(" ".join(ws[i : i + NGRAM_D]))

    want = {}
    for did, text in docs.items():
        if did in eval_ids:
            continue
        partner = did - did % EVAL_MOD + EVAL_REM
        if did % CONTAM_MOD == CONTAM_REM and partner in docs:
            text = text + " " + " ".join(
                docs[partner].split(" ")[:CONTAM_WORDS]
            )
        ws = text.split(" ")
        covered = set()
        for i in range(len(ws) - NGRAM_D + 1):
            if " ".join(ws[i : i + NGRAM_D]) in forbidden:
                covered.update(range(i, i + NGRAM_D))
        kept = [w for i, w in enumerate(ws) if i not in covered]
        want[did] = (len(ws), len(covered), " ".join(kept))

    got = {r["doc_id"]: r for r in q_decontaminate_spans(spark, sf).collect()}
    assert set(got) == set(want)
    for did, (nw, nr, clean) in want.items():
        r = got[did]
        assert (r["n_words"], r["n_removed"], r["clean_text"]) == (nw, nr, clean)
    # the injected contamination fired and was fully removed everywhere
    injected_ids = [
        d for d in want
        if d % CONTAM_MOD == CONTAM_REM and (d - d % EVAL_MOD + EVAL_REM) in docs
    ]
    assert injected_ids
    assert all(want[d][1] >= CONTAM_WORDS for d in injected_ids)


def test_semantic_dedup_tournament_matches_numpy(spark):
    """q_semantic_dedup's kept-set rule verified against an independent
    numpy reference: given the module's own cell assignment (tested by
    test_ivf_cells_are_true_argmax_and_recall_floor), a vector is
    dropped iff its cell contains a better-ranked member (lower
    centroid cosine, tie lower id — the paper's keep-furthest-from-
    centroid policy) with 9-rounded cosine >= SEM_EPS.  Also pins the
    invariant that each cell's best-ranked member survives."""
    import numpy as np
    import pandas as pd

    from canal_spark.operators.common import load
    from canal_spark.operators.similarity import (
        SEM_EPS,
        _assign_kernel,
        _collect_cents,
        _with_norm,
        ivf_centroids,
        q_semantic_dedup,
    )

    sf = "/root/testdata/sf0.001"
    e = _with_norm(load(spark, sf, "embeddings"))
    kernel = _assign_kernel(_collect_cents(ivf_centroids(e)))
    rows = e.select("vec_id", "v").collect()
    v = pd.Series([np.asarray(r["v"], dtype=np.float64) for r in rows])
    cells, cc = kernel(v)
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    V = np.vstack(v.to_numpy())

    expected = set()
    for cell in np.unique(cells):
        idx = np.where(cells == cell)[0]
        Vc = V[idx]
        nrm = np.sqrt((Vc * Vc).sum(axis=1))
        denom = nrm[:, None] * nrm[None, :]
        S = np.round(
            np.divide(Vc @ Vc.T, denom, out=np.zeros_like(denom), where=denom > 0), 9
        )
        for ip, i in enumerate(idx):
            for jp, j in enumerate(idx):
                if i == j:
                    continue
                better = (cc[j] < cc[i]) or (cc[j] == cc[i] and ids[j] < ids[i])
                if better and S[ip, jp] >= SEM_EPS:
                    expected.add((int(cell), int(ids[i])))
                    break

    got = {(r["cell"], r["vec_id"]) for r in q_semantic_dedup(spark, sf).collect()}
    assert got == expected
    assert expected, "fixture must exercise the prune (else the test is vacuous)"

    # survivor floor: the best-ranked member of every cell is kept
    for cell in np.unique(cells):
        idx = np.where(cells == cell)[0]
        best = min(idx, key=lambda k: (cc[k], ids[k]))
        assert (int(cell), int(ids[best])) not in got


def test_cached_deps_flatten_and_release_reaches_band_cache(spark):
    """attach_cached_deps flattens nested deps: q_dedup_minhash_lsh's
    result is tagged with the PERSISTED uncapped band frame living one
    level below the capped view _minhash_bands returns, so one release
    from the consumer unpersists the real cache (round-5 cap rework —
    without flattening the release would no-op on the unpersisted view
    and leak a corpus-scale frame per call)."""
    from canal_spark.operators.common import release_cached_deps
    from canal_spark.operators.dedup import q_dedup_minhash_lsh

    pairs = q_dedup_minhash_lsh(spark, "/root/testdata/sf0.001")
    pairs.count()
    deps = pairs._cached_deps
    cached = [d for d in deps if d.storageLevel.useMemory or d.storageLevel.useDisk]
    assert cached, "no persisted dep tagged on the LSH result"
    release_cached_deps(pairs)
    for d in cached:
        lvl = d.storageLevel
        assert not (lvl.useMemory or lvl.useDisk), "release left a dep persisted"
