"""Property-based tests (hypothesis) for the pure planning/algebra
kernels: bin-packing, curve keys, and the last-wins oracle."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from canal_spark.cluster import hilbert_index_2d, morton_interleave
from canal_spark.compact import plan_bins
from canal_spark.table.format import DataFile


def mk_file(i, nbytes, part="web"):
    return DataFile(path=f"f{i}.parquet", rows=1, bytes=nbytes,
                    partition={"source": part}, stats={})


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=600), min_size=0, max_size=60),
       st.integers(min_value=100, max_value=1000))
def test_binpack_invariants(sizes, target):
    entries = [mk_file(i, s) for i, s in enumerate(sizes)]
    bins = plan_bins(entries, target_bytes=target)
    seen = set()
    for members in bins:
        # every bin coalesces (>=2 files), never exceeds the budget
        # unless a single file already does (can't happen: victims are
        # < target/2), and no file is packed twice
        assert len(members) >= 2
        assert sum(e.bytes for e in members) <= target
        for e in members:
            assert e.path not in seen
            seen.add(e.path)
        # packing never crosses a partition boundary
        assert len({e.partition["source"] for e in members}) == 1
    # only small files are ever packed
    small = target // 2
    for e in entries:
        if e.bytes >= small:
            assert e.path not in seen


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=(1 << 31) - 1),
                min_size=1, max_size=200),
       st.lists(st.integers(min_value=0, max_value=(1 << 31) - 1),
                min_size=1, max_size=200))
def test_morton_order_preserved_within_axis(xs, ys):
    """Fixing one axis, the curve key is monotone in the other axis —
    the property that makes min/max file stats tight after the sort."""
    n = min(len(xs), len(ys))
    a = np.array(sorted(xs[:n]), dtype=np.uint64)
    b = np.full(n, ys[0], dtype=np.uint64)
    keys = morton_interleave(a, b)
    assert list(keys) == sorted(keys)


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=0, max_value=(1 << 31) - 1),
       st.integers(min_value=0, max_value=(1 << 31) - 1))
def test_curves_are_deterministic_and_distinct_points_distinct(x, y):
    a = np.array([x, x], dtype=np.uint64)
    b = np.array([y, y], dtype=np.uint64)
    m = morton_interleave(a, b)
    h = hilbert_index_2d(a, b)
    assert m[0] == m[1] and h[0] == h[1]
    if x != y:
        m2 = morton_interleave(np.array([y], dtype=np.uint64),
                               np.array([x], dtype=np.uint64))
        # morton is injective: swapped coordinates give a different key
        assert m2[0] != m[0]


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(st.integers(1, 50), st.sampled_from("IUD"),
                          st.integers(0, 5)), min_size=0, max_size=60))
def test_python_oracle_last_wins(ops):
    """The single-threaded oracle itself obeys last-wins algebra: state
    after applying a log equals state from only each key's final op."""
    from canal_spark.changelog import python_oracle_apply

    base = {f"k{i}": ([i], 1, "web") for i in range(6)}
    log = [(ordinal, op, f"k{key}", [ordinal], 1, "web", None, 1)
           for ordinal, (key, op) in
           enumerate(((k, o) for _, o, k in ops), start=1)]
    full = python_oracle_apply(dict(base), log)

    last = {}
    for row in log:
        last[row[2]] = row
    compact_log = sorted(last.values(), key=lambda r: r[0])
    reduced = python_oracle_apply(dict(base), compact_log)
    assert full == reduced


@given(
    files=st.lists(
        st.tuples(
            st.sampled_from(["web", "books", "code", None]),  # partition value
            st.one_of(st.none(), st.tuples(st.text("abw", min_size=1, max_size=3),
                                           st.text("abw", min_size=1, max_size=3))),
            st.sampled_from(["web", "books", "code"]),  # a row the file contains
        ),
        min_size=1,
        max_size=30,
    ),
    want=st.sampled_from(["web", "books", "code"]),
)
@settings(max_examples=200, deadline=None)
def test_partition_prune_is_never_lossy(files, want):
    """Safety property of prune_files partition filtering: a file whose
    metadata cannot EXCLUDE value v (no partition value and no stats, or
    stats range covering v) must be kept — regardless of spec era or
    stratum mixing.  Only files that provably exclude v may drop."""
    from canal_spark.table.format import prune_files

    entries = []
    contains = []
    for i, (pv, stat, row) in enumerate(files):
        partition = {"source": pv} if pv is not None else {}
        # stats range widened to include the row the file "contains"
        if stat is not None:
            lo, hi = sorted([stat[0], stat[1], row])[0], sorted([stat[0], stat[1], row])[-1]
            stats = {"source": {"min": lo, "max": hi, "nulls": 0}}
        else:
            stats = {}
        # a file with partition value pv actually contains only pv rows
        actually_has_want = (pv == want) if pv is not None else (row == want or stat is None)
        entries.append(
            DataFile(path=f"f{i}", rows=1, bytes=1, partition=partition, stats=stats)
        )
        contains.append(actually_has_want)

    kept = {e.path for e in prune_files(entries, partition_filter={"source": want})}
    for e, has in zip(entries, contains):
        if has and e.path not in kept:
            # the file may only be dropped if its metadata excludes want
            pv = e.partition.get("source")
            st_ = e.stats.get("source")
            excludes = (pv is not None and pv != want) or (
                st_ is not None and not (st_["min"] <= want <= st_["max"])
            )
            assert excludes, (e.partition, e.stats, want)
