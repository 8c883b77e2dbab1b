"""Maintained IVF (ANN) index: full build, incremental refresh under a
frozen codebook, delete fall-out, idempotent replay, and top-k search
through the index — the second derived-store instance of the
ES-adapter sync pattern (after the MinHash band index)."""

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from canal_spark import create_table
from canal_spark.ann_index import (
    CODEBOOK_PATH_PROP,
    CODEBOOK_VERSION_PROP,
    ann_search,
    create_ivf_index,
    load_codebook,
    refresh_ivf_index,
)
from canal_spark.operators.similarity import EMB_DIM, _assign_cell_udf
from canal_spark.table.writer import append

EMB_SCHEMA = StructType(
    [
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(FloatType(), False), False),
        StructField("source", StringType(), True),
    ]
)

CL_SCHEMA = StructType(
    [
        StructField("ordinal", LongType(), False),
        StructField("op", StringType(), False),
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(FloatType(), False), True),
        StructField("source", StringType(), True),
    ]
)


def _vec(i: int) -> list[float]:
    rng = np.random.default_rng(i)
    return [float(x) for x in rng.standard_normal(EMB_DIM).astype(np.float32)]


def _base_rows(n: int) -> list[tuple]:
    return [(i, _vec(i), f"s{i % 3}") for i in range(n)]


@pytest.fixture()
def emb_table(spark, tmp_path):
    t = create_table(
        str(tmp_path / "emb"), EMB_SCHEMA,
        partition_by=["source"], properties={"key-cols": "vec_id"},
    )
    rows = _base_rows(300)
    append(spark, t, spark.createDataFrame(rows, EMB_SCHEMA).repartition(6))
    idx = create_ivf_index(str(tmp_path / "ivf"))
    return t, idx, rows


def _index_dict(spark, idx):
    return {r["vec_id"]: r["cell"] for r in idx.scan(spark).collect()}


def _expected_cells(spark, t, idx):
    """Ground truth: every CURRENT vector assigned under the index's
    frozen codebook (the shared Arrow kernel)."""
    cents = load_codebook(spark, idx)
    vec = F.transform("embedding", lambda x: x.cast("double"))
    df = t.scan(spark).select(
        F.col("vec_id"), _assign_cell_udf(cents)(vec).cast("long").alias("cell")
    )
    return {r["vec_id"]: r["cell"] for r in df.collect()}


def test_full_build_assigns_every_vector(spark, emb_table):
    t, idx, rows = emb_table
    res = refresh_ivf_index(spark, t, idx)
    assert res.applied and res.full_rebuild and res.codebook_version == 1
    assert idx.refresh().properties.get(CODEBOOK_PATH_PROP)
    got = _index_dict(spark, idx)
    assert set(got) == {r[0] for r in rows}
    assert got == _expected_cells(spark, t, idx)


def test_incremental_refresh_frozen_codebook(spark, emb_table):
    t, idx, rows = emb_table
    refresh_ivf_index(spark, t, idx)
    cb_before = idx.refresh().properties[CODEBOOK_PATH_PROP]

    from canal_spark.merge import merge_into

    changes = [
        (1, "U", 7, _vec(9007), "s1"),     # moved vector
        (2, "D", 11, None, None),          # deleted
        (3, "I", 5000, _vec(5000), "s2"),  # brand new
    ]
    cl = spark.createDataFrame(changes, CL_SCHEMA)
    assert merge_into(spark, t, cl).applied
    res = refresh_ivf_index(spark, t, idx, keys=cl.select("vec_id"))
    assert res.applied and not res.full_rebuild
    assert res.vecs_changed == 3
    # manifest pruning did real work: only overlapping files rewrote
    assert res.files_pruned > 0
    # codebook FROZEN: same artifact, same version
    t2 = idx.refresh()
    assert t2.properties[CODEBOOK_PATH_PROP] == cb_before
    assert int(t2.properties[CODEBOOK_VERSION_PROP]) == 1

    got = _index_dict(spark, idx)
    assert 11 not in got and 5000 in got
    assert got == _expected_cells(spark, t, idx)

    # replay is content-idempotent
    refresh_ivf_index(spark, t, idx, keys=cl.select("vec_id"))
    assert _index_dict(spark, idx) == got


def test_run_pass_syncs_ivf_index(spark, emb_table):
    """The full maintenance pass generalizes to the embedding shape:
    merge + ivf sync + cluster + compact on a (vec_id, embedding,
    source) table, with the scrape dump carrying the ivf counters."""
    from canal_spark.maintenance import prometheus_metrics, run_pass

    t, idx, rows = emb_table
    refresh_ivf_index(spark, t, idx)
    changes = [(i + 1, "U", i * 3 % 300, _vec(7000 + i), f"s{(i * 3 % 300) % 3}")
               for i in range(40)]
    cl = spark.createDataFrame(changes, CL_SCHEMA)
    rep = run_pass(
        spark, t, cl, ivf_index=idx, target_file_rows=200, pack_by="bytes"
    )
    assert rep.merge["applied"] and rep.ivf_index["applied"]
    m = prometheus_metrics(rep)
    lbl = '{destination="tokens"}'
    assert m[f"canal_spark_ivf_index_vecs_changed{lbl}"] == len(
        {c[2] for c in changes}
    )
    assert _index_dict(spark, idx) == _expected_cells(spark, t, idx)


def test_ann_search_finds_exact_duplicate(spark, emb_table):
    """An exact duplicate vector lands in the same cell by construction,
    so the index search must return it at rank 1 with cosine 1.0."""
    t, idx, rows = emb_table
    from canal_spark.merge import merge_into

    dup_of = 42
    cl = spark.createDataFrame(
        [(1, "I", 9042, _vec(dup_of), "s0")], CL_SCHEMA
    )
    merge_into(spark, t, cl)
    refresh_ivf_index(spark, t, idx)  # full (first) build sees the dup

    q = spark.createDataFrame(
        [(dup_of, _vec(dup_of))], "q_id long, qv array<float>"
    )
    hits = ann_search(spark, t, idx, q, k=3).collect()
    assert hits and hits[0]["q_id"] == dup_of
    assert hits[0]["n_id"] == 9042 and hits[0]["rank"] == 1
    assert hits[0]["cosine"] == pytest.approx(1.0)


def test_incremental_refresh_unhinted_join_path(spark, emb_table):
    """Above max_broadcast_keys the refresh must not hint a broadcast —
    the unhinted (AQE-chosen) join path has to produce the identical
    index state.  Forced here with a zero threshold."""
    t, idx, rows = emb_table
    refresh_ivf_index(spark, t, idx)

    from canal_spark.merge import merge_into

    changes = [
        (1, "U", 3, _vec(9003), "s1"),
        (2, "D", 17, None, None),
        (3, "I", 6000, _vec(6000), "s0"),
    ]
    cl = spark.createDataFrame(changes, CL_SCHEMA)
    assert merge_into(spark, t, cl).applied
    res = refresh_ivf_index(
        spark, t, idx, keys=cl.select("vec_id"), max_broadcast_keys=0
    )
    assert res.applied and not res.full_rebuild
    got = _index_dict(spark, idx)
    assert 17 not in got and 6000 in got
    assert got == _expected_cells(spark, t, idx)


def test_full_rebuild_expires_superseded_codebooks(spark, emb_table, tmp_path):
    """Each retrain pins a fresh codebook artifact; superseded ones are
    reclaimed down to ONE grace generation — no unbounded codebook/
    accumulation across retrains (remove_orphan_files never sweeps it)."""
    import os

    t, idx, rows = emb_table

    def cb_dirs():
        d = os.path.join(idx.root, "codebook")
        return sorted(n for n in os.listdir(d) if n.startswith("cb-"))

    refresh_ivf_index(spark, t, idx)          # v1
    assert len(cb_dirs()) == 1
    refresh_ivf_index(spark, t, idx)          # v2: v1 kept as grace
    assert len(cb_dirs()) == 2
    refresh_ivf_index(spark, t, idx)          # v3: v1 reclaimed
    assert len(cb_dirs()) == 2
    cur = idx.refresh().properties[CODEBOOK_PATH_PROP]
    assert os.path.basename(cur) in cb_dirs()  # pinned one survives
    # the index still searches through the current codebook
    q = spark.createDataFrame([(7, _vec(7))], "q_id long, qv array<float>")
    assert ann_search(spark, t, idx, q, k=1).count() == 1


def test_run_pass_expires_ivf_index_snapshots(spark, emb_table):
    """Every batch refresh commits a COW overwrite snapshot on the IVF
    table; run_pass must expire them like the band index, or the ANN
    store grows one snapshot (and its file generation) per batch
    forever."""
    from canal_spark.maintenance import run_pass

    t, idx, rows = emb_table
    refresh_ivf_index(spark, t, idx)
    for i in range(3):
        cl = spark.createDataFrame(
            [(1 + i, "U", (11 * i + 3) % 300, _vec(8000 + i), "s0")], CL_SCHEMA
        )
        run_pass(spark, t, cl, ivf_index=idx, keep_snapshots=1,
                 do_cluster=False, do_compact=False)
    assert len(idx.refresh().snapshots) <= 2  # bounded, not one per batch


def _near_dup(i: int, scale: float = 1.0, jitter: float = 1e-3) -> list[float]:
    """A vector almost colinear with _vec(i): cosine ~0.999+."""
    rng = np.random.default_rng(100_000 + i)
    base = np.array(_vec(i), dtype=np.float64) * scale
    return [float(x) for x in (base + jitter * rng.standard_normal(EMB_DIM))]


def _prune_reference(spark, t, idx, eps):
    """Independent numpy tournament: expected loser vec_ids under the
    index's frozen codebook."""
    import pandas as pd

    from canal_spark.operators.similarity import _assign_kernel

    kernel = _assign_kernel(load_codebook(spark, idx))
    rows = t.scan(spark).select("vec_id", "embedding").collect()
    v = pd.Series([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    cells, cc = kernel(v)
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    V = np.vstack(v.to_numpy())
    losers = set()
    for cell in np.unique(cells):
        loc = np.where(cells == cell)[0]
        Vc = V[loc]
        nrm = np.sqrt((Vc * Vc).sum(axis=1))
        den = nrm[:, None] * nrm[None, :]
        S = np.round(np.divide(Vc @ Vc.T, den, out=np.zeros_like(den),
                               where=den > 0), 9)
        for ip, i in enumerate(loc):
            for jp, j in enumerate(loc):
                if i == j:
                    continue
                better = (cc[j] < cc[i]) or (cc[j] == cc[i] and ids[j] < ids[i])
                if better and S[ip, jp] >= eps:
                    losers.add(int(ids[i]))
                    break
    return losers


def test_semantic_prune_pass_removes_cell_duplicates(spark, tmp_path):
    """SemDedup maintenance verb end-to-end: planted near-duplicate
    vectors are pruned (matching an independent numpy tournament under
    the frozen codebook), survivors keep their rows, the index drops the
    losers, and a re-run is a no-op."""
    from canal_spark.ann_index import semantic_prune_pass

    t = create_table(
        str(tmp_path / "emb"), EMB_SCHEMA,
        partition_by=["source"], properties={"key-cols": "vec_id"},
    )
    rows = _base_rows(120) + [
        (1000 + i, _near_dup(i), f"s{i % 3}") for i in range(10)
    ]
    append(spark, t, spark.createDataFrame(rows, EMB_SCHEMA).repartition(6))
    idx = create_ivf_index(str(tmp_path / "ivf"))
    refresh_ivf_index(spark, t, idx)

    expected = _prune_reference(spark, t, idx, eps=0.9)
    assert expected, "fixture must contain semantic duplicates"

    # dry run: reports, touches nothing
    dr = semantic_prune_pass(spark, t, idx, eps=0.9, dry_run=True)
    assert dr.dry_run and not dr.applied
    assert dr.losers_removed == len(expected)
    assert t.refresh().scan(spark).count() == len(rows)

    res = semantic_prune_pass(spark, t, idx, eps=0.9)
    assert res.applied and res.losers_removed == len(expected)
    live = {r["vec_id"] for r in t.refresh().scan(spark).select("vec_id").collect()}
    assert live == {r[0] for r in rows} - expected
    # index followed: losers gone, survivors unchanged under the frozen codebook
    assert res.index_refresh["applied"]
    assert set(_index_dict(spark, idx.refresh())) == live
    assert _index_dict(spark, idx) == _expected_cells(spark, t, idx)

    # idempotent: the pruned corpus has no remaining duplicates to drop
    again = semantic_prune_pass(spark, t, idx, eps=0.9)
    assert again.losers_removed == 0 and not again.applied


def test_semantic_prune_wap_bound_aborts_runaway(spark, emb_table):
    """eps=-1 makes every non-best cell member a 'duplicate' — the WAP
    delete-fraction audit must abort the publish and leave the table
    and index untouched."""
    from canal_spark.ann_index import semantic_prune_pass

    t, idx, rows = emb_table
    refresh_ivf_index(spark, t, idx)
    idx_before = _index_dict(spark, idx)

    res = semantic_prune_pass(spark, t, idx, eps=-1.0, wap=True,
                              max_delete_fraction=0.5)
    assert res.losers_removed > len(rows) * 0.5
    assert not res.applied and res.wap and not res.wap["published"]
    assert t.refresh().scan(spark).count() == len(rows)
    assert _index_dict(spark, idx.refresh()) == idx_before


def test_semantic_prune_requires_codebook(spark, emb_table):
    from canal_spark.ann_index import semantic_prune_pass

    t, idx, _ = emb_table  # index never built
    with pytest.raises(ValueError, match="codebook"):
        semantic_prune_pass(spark, t, idx)
