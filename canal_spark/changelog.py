"""Changelog synthesis and last-wins dedupe.

Dedupe is the engine's restatement of the reference's per-key ordering
invariant: Canal keeps per-PK serial order by hashing all rows of a key
into one ordered apply lane (client-adapter/rdb/.../RdbSyncService.java:
437-462 pkHash; server/.../MQMessageUtils.java:158-241).  Set-based
equivalent: within a batch, only the *last* change per key (highest
``ordinal``) decides the key's final state, so we window
``row_number() over (partition by doc_id order by ordinal desc)`` and
keep row 1 — same net effect, one shuffle, fully parallel.

Generator is deterministic (seeded) per FIXTURES.md §2 — scenario knobs
cover insert/update/delete mixes, multi-op-per-key, no-op updates,
missing-key deletes, upsert-on-existing, and zipf key skew.
"""

from __future__ import annotations

import datetime as _dt
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from canal_spark.schema import CHANGELOG_SCHEMA, SOURCES, TOKEN_TABLE_SCHEMA

EPOCH = _dt.datetime(2026, 1, 1)


def changelog_dir_has_data(d: str | None) -> bool:
    """True when the staging dir exists and holds any parquet file or
    partition subdir (skipping ``_``/``.`` metadata names) — the ONE
    'has the producer started?' probe shared by the consumer server
    and the instance pass, so the two can never disagree about whether
    a changelog is empty."""
    if not d or not os.path.isdir(d):
        return False
    return any(
        n.endswith(".parquet") or os.path.isdir(os.path.join(d, n))
        for n in os.listdir(d)
        if not n.startswith(("_", "."))
    )


def _tokens_for(rng: np.ndarray) -> list:
    # deterministic token arrays: length in [1, 64] for tests (vocab 50257)
    return rng


def synth_token_rows(n: int, seed: int = 42, max_len: int = 64) -> list[tuple]:
    """Deterministic base-table rows: doc_id '{source}:{seq:010d}'."""
    rng = np.random.default_rng(seed)
    rows = []
    srcs = rng.integers(0, len(SOURCES), size=n)
    lens = rng.integers(1, max_len + 1, size=n)
    for i in range(n):
        source = SOURCES[srcs[i]]
        toks = rng.integers(0, 50257, size=int(lens[i]), dtype=np.int32).tolist()
        rows.append((f"{source}:{i:010d}", toks, len(toks), source))
    return rows


def base_table_df(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    return spark.createDataFrame(synth_token_rows(n, seed), TOKEN_TABLE_SCHEMA)


def initial_state(base_rows: list[tuple]) -> dict[str, tuple]:
    """Running-state dict for ``synth_changelog_rows(state=...)`` —
    build once from the base rows, thread through every batch so
    before-images stay accurate across separately-generated batches."""
    return {r[0]: (list(r[1]), r[2]) for r in base_rows}


def synth_changelog_rows(
    base_rows: list[tuple],
    n_ops: int,
    seed: int = 7,
    start_ordinal: int = 1,
    p_insert: float = 0.4,
    p_update: float = 0.4,
    p_delete: float = 0.2,
    zipf_a: float | None = None,
    include_noop_update: bool = True,
    include_missing_delete: bool = True,
    max_len: int = 64,
    state: dict[str, tuple] | None = None,
) -> list[tuple]:
    """Deterministic changelog over a base table (FIXTURES.md §2 scenarios).

    Rows carry accurate before-images (last two tuple fields:
    before_tokens, before_n_tok): a running state dict tracks each key
    through the changelog, so an update to an already-updated key gets
    the intermediate state as its before-image — the same invariant the
    binlog gives Canal (a RowData's beforeColumns are the row as of the
    previous event, not the initial load).

    MULTI-BATCH callers must thread ``state``: pass the dict returned
    into the next call (it is seeded from ``base_rows`` when None, and
    mutated in place).  Two independent calls each reset to the base
    state, so a later batch can emit a "no-op update" (before == after)
    carrying the BASE value for a key the earlier batch changed — the
    engine rightly suppresses it (an accurate-before-image no-op can't
    change replica state) while a naive oracle applies the stale
    after-image, a fixture-made divergence, not an engine bug (found by
    the round-5 stream-fleet reload soak).
    """
    rng = np.random.default_rng(seed)
    n_base = len(base_rows)
    rows = []
    if state is None:
        state = initial_state(base_rows)
    next_new = n_base + 1_000_000
    ops = rng.choice(["I", "U", "D"], size=n_ops, p=[p_insert, p_update, p_delete])
    for j in range(n_ops):
        ordinal = start_ordinal + j
        es = EPOCH + _dt.timedelta(seconds=j)
        batch_id = j // 50 + 1  # reference adapter batch size 50
        op = ops[j]
        if zipf_a is not None and op in ("U", "D") and n_base:
            idx = min(int(rng.zipf(zipf_a)) - 1, n_base - 1)
        else:
            idx = int(rng.integers(0, n_base)) if n_base else 0
        if op == "I":
            source = SOURCES[int(rng.integers(0, len(SOURCES)))]
            doc_id = f"{source}:{next_new:010d}"
            next_new += 1
            toks = rng.integers(0, 50257, size=int(rng.integers(1, max_len + 1)), dtype=np.int32).tolist()
            rows.append((ordinal, "I", doc_id, toks, len(toks), source, es, batch_id,
                         None, None))
            state[doc_id] = (toks, len(toks))
        elif op == "U" and n_base:
            d_id, _base_toks, _n, src = base_rows[idx]
            prev = state.get(d_id)  # None if deleted earlier in this slice
            if include_noop_update and j % 37 == 0 and prev is not None:
                toks = list(prev[0])  # update that changes nothing
            else:
                toks = rng.integers(0, 50257, size=int(rng.integers(1, max_len + 1)), dtype=np.int32).tolist()
            rows.append((ordinal, "U", d_id, toks, len(toks), src, es, batch_id,
                         list(prev[0]) if prev else None,
                         prev[1] if prev else None))
            state[d_id] = (toks, len(toks))
        else:
            if include_missing_delete and j % 41 == 0:
                doc_id = f"ghost:{j:010d}"  # delete of a non-existent key
            elif n_base:
                doc_id = base_rows[idx][0]
            else:
                doc_id = f"ghost:{j:010d}"
            prev = state.pop(doc_id, None)
            rows.append((ordinal, "D", doc_id, None, None, None, es, batch_id,
                         list(prev[0]) if prev else None,
                         prev[1] if prev else None))
    return rows


def changelog_df(spark: SparkSession, rows: list[tuple]) -> DataFrame:
    """Rows may omit trailing optional fields (e.g. the before-image
    columns) — they pad to null, meaning 'before-image not captured'."""
    n = len(CHANGELOG_SCHEMA.fields)
    rows = [tuple(r) + (None,) * (n - len(r)) for r in rows]
    return spark.createDataFrame(rows, CHANGELOG_SCHEMA)


def dedupe_last_wins(changes: DataFrame, key: str = "doc_id", ordinal: str = "ordinal") -> DataFrame:
    """Collapse a changelog slice to one final row per key (highest ordinal).

    An upsert of a key that was deleted earlier in the slice survives as
    the insert; a delete last → the delete.  This preserves Canal's
    per-key serial-apply semantics in one set-based window.
    """
    w = Window.partitionBy(key).orderBy(F.col(ordinal).desc())
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def python_oracle_apply(base: dict[str, tuple], changes: list[tuple]) -> dict[str, tuple]:
    """Single-threaded reference applier (FIXTURES.md §5): replay in
    ordinal order; I/U = put after-image, D = delete.  Returns
    {doc_id: (tokens, n_tok, source)}."""
    state = dict(base)
    for row in sorted(changes, key=lambda r: r[0]):
        _ordinal, op, doc_id, tokens, n_tok, source = row[:6]
        if op in ("I", "U"):
            state[doc_id] = (list(tokens), n_tok, source)
        elif op == "D":
            state.pop(doc_id, None)
    return state
