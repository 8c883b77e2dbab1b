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
