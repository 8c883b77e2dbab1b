"""BPE tokenizer training/encoding vs a pure-Python reference
implementation (Sennrich-style greedy merges, identical tie-break) —
the third-engine equivalence check for the iterative operator the
SQL oracle can't express."""

import pytest

from canal_spark.tokenizer import bpe_encode, bpe_train, word_frequency

SF_DIR = "/root/testdata/sf0.001"


def python_bpe(word_counts, n_merges, min_pair_count=2):
    """Reference: greedy most-frequent adjacent pair, weighted by word
    frequency, tie-break count desc then (p1, p2) asc; merges apply
    left-to-right with the just-merged token re-eligible on the left."""
    state = {w: list(w) for w in word_counts}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for w, syms in state.items():
            c = word_counts[w]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + c
        if not counts:
            break
        (p1, p2), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_pair_count:
            break
        merges.append((p1, p2, n))
        for w, syms in state.items():
            out = []
            for s in syms:
                if out and out[-1] == p1 and s == p2:
                    out[-1] = p1 + p2
                else:
                    out.append(s)
            state[w] = out
    return merges, state


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string"
    )


def test_bpe_train_matches_python_reference_synthetic(spark):
    rows = [
        "low low low lower lowest",
        "new newer newest low low",
        "wider wide new new newer",
        "aaaa aa a banana bandana",
    ]
    docs = _docs(spark, rows)
    wc = {r["w"]: r["c"] for r in word_frequency(docs).collect()}
    want_merges, want_state = python_bpe(wc, n_merges=12)

    model = bpe_train(spark, docs, n_merges=12)
    assert model.merges == want_merges
    got_state = {r["w"]: list(r["syms"]) for r in model.vocab.collect()}
    assert got_state == want_state
    # lossless segmentation: symbols reassemble the word exactly
    assert all("".join(s) == w for w, s in got_state.items())
    model.release()


def test_bpe_train_on_fixture_and_encode_compression(spark):
    from canal_spark.operators.common import load

    docs = load(spark, SF_DIR, "documents")
    wc = {r["w"]: r["c"] for r in word_frequency(docs).collect()}
    want_merges, want_state = python_bpe(wc, n_merges=8)

    model = bpe_train(spark, docs, n_merges=8)
    assert model.merges == want_merges
    assert len(model.merges) == 8  # fixture vocab has >=8 productive pairs

    enc = {r["doc_id"]: r for r in bpe_encode(docs, model).collect()}
    # exact per-doc token count: sum of trained symbol counts per word
    import collections

    want = collections.defaultdict(lambda: [0, 0, 0])
    for r in docs.select("doc_id", "text").collect():
        for w in r["text"].split(" "):
            if not w:
                continue
            want[r["doc_id"]][0] += 1
            want[r["doc_id"]][1] += len(w)
            want[r["doc_id"]][2] += len(want_state[w])
    assert set(enc) == set(want)
    for did, (nw, nc, nt) in want.items():
        row = enc[did]
        assert (row["n_words"], row["n_chars"], row["n_tokens"]) == (nw, nc, nt)
    # merges strictly compress: fewer tokens than characters
    assert all(r["n_tokens"] < r["n_chars"] for r in enc.values())
    model.release()


def test_bpe_encode_oov_falls_back_to_chars(spark):
    model = bpe_train(spark, _docs(spark, ["ab ab ab cd cd"]), n_merges=4)
    out = {
        r["doc_id"]: r["n_tokens"]
        for r in bpe_encode(
            _docs(spark, ["ab cd", "zzzz ab"]), model
        ).collect()
    }
    assert out[0] == 2  # both in-vocab, fully merged
    assert out[1] == 5  # zzzz is OOV -> 4 char symbols + merged ab
    model.release()


def test_bpe_train_early_stop_and_monotone_compression(spark):
    docs = _docs(spark, ["ab ab cd ef gh ij"])
    # only one pair repeats >=2 times -> exactly one merge then stop
    model = bpe_train(spark, docs, n_merges=10)
    assert [m[:2] for m in model.merges] == [("a", "b")]
    model.release()
    # more merges never increase the encoded token count
    rows = ["the cat sat on the mat", "the bat and the rat", "cat cat bat"]
    prev = None
    for k in (0, 2, 6):
        m = bpe_train(spark, _docs(spark, rows), n_merges=k)
        tot = (
            bpe_encode(_docs(spark, rows), m)
            .groupBy()
            .sum("n_tokens")
            .collect()[0][0]
        )
        if prev is not None:
            assert tot <= prev
        prev = tot
        m.release()


def test_reliable_mode_keeps_at_most_two_state_dirs(tmp_path):
    """Reliable training state is manual ping-pong parquet: at most two
    bpe-* dirs exist no matter how many merge rounds ran (df.checkpoint
    would leak one dictionary-scale dir per round — Spark never cleans
    reliable checkpoints), and release() reclaims both."""
    import subprocess
    import sys

    script = f"""
import os
from canal_spark import get_spark
from canal_spark.tokenizer import bpe_train, bpe_encode
spark = get_spark("bpe-reliable", master="local[2]", shuffle_partitions=2)
ck = {str(tmp_path / 'ck')!r}
spark.sparkContext.setCheckpointDir(ck)
docs = spark.createDataFrame(
    [("d%d" % i, "low lower lowest newer newest") for i in range(20)],
    "doc_id string, text string",
)
model = bpe_train(spark, docs, n_merges=6)
assert len(model.merges) >= 3, model.merges

def bpe_dirs():
    # setCheckpointDir nests a UUID subdir — walk for the state dirs
    return sorted(
        n for _r, ds, _f in os.walk(ck) for n in ds if n.startswith("bpe-")
    )

sub = bpe_dirs()
assert len(sub) == 2, sub  # ping + pong, never one per round
enc = bpe_encode(docs, model).count()
assert enc == 20, enc
model.release()
assert bpe_dirs() == []
print("RELIABLE-BPE-OK")
spark.stop()
"""
    out = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        timeout=420, cwd="/root/repo",
    )
    assert "RELIABLE-BPE-OK" in out.stdout, out.stdout + out.stderr
