"""Per-file key bloom filters — puffin-style sidecars for file skipping.

Min/max range pruning (``merge._affected_files``) is exact on a
well-clustered table, but on freshly appended or interleaved layouts a
file's key [min, max] straddles almost any point key, so a 3-key delete
still "affects" every file.  A per-file bloom over the key column makes
point-y batches prune by *membership*, not range: at the 100 TB design
point a hot-key correction batch rewrites only the files that actually
contain the keys (plus the bloom's ~1% false positives), independent of
how wide the layout's key ranges spray.  This is Iceberg's puffin
bloom-blob idea re-expressed for the mini-format: the filter lives in a
sidecar next to the data file (``<file>.parquet.bloom``), the manifest
records only {m, k} per column, and GC removes sidecars with their data
files (reference parity note: Canal has no table format at all — this
extends the TableMeta/TSDB analogue of SURVEY §1.2).

Determinism contract: the probe hash is md5 of ``str(value)`` — the
same canonical form on build and probe, engine- and partitioning-
independent, so a filter built by one writer is probed identically by
any later reader.  m is a power of two; h2 is forced odd so the k
double-hash probes cycle the full bit domain.

Opt-in: set table property ``write.bloom.col = <key column>``.  Cost is
one column-pruned re-read of each freshly written file (distributed
over executors alongside footer harvesting when the file count is
large) — the standard price of write-time secondary indexes.
"""

from __future__ import annotations

import hashlib
import os
import struct
import zlib

import numpy as np

BLOOM_PROP = "write.bloom.col"
BITS_PER_KEY = 10  # ~0.8% fpp at k=7
K_PROBES = 7
MIN_BITS = 1 << 11  # 256 B floor
MAX_BITS = 1 << 24  # 2 MiB cap per file (≈1.7M keys at 10 bits/key)
# v2 adds a crc32 of the bit payload.  A bloom is the one pruning
# structure where corruption is NOT self-safe: range stats can only
# over-approximate, but a zeroed/flipped bit inside a sidecar that
# still passes the length check produces a FALSE NEGATIVE — a file
# containing the key gets pruned and the delete/upsert is silently
# lost.  The crc turns any payload corruption into "unreadable",
# which degrades to range-only pruning (correct, just slower) —
# Iceberg's puffin blobs carry the same integrity guard.
MAGIC = b"CSBF2"
MARKER_VERSION = 2
_HEADER = "<IBI"  # m (bits), k (probes), crc32(bits)
# driver-side probe gate: above this many batch keys, hashing the key
# list costs more than bloom pruning saves (a batch that size is
# range-pruned fine — and near max_driver_keys it is a bulk rewrite
# anyway, where membership pruning buys nothing)
PROBE_MAX_KEYS = 250_000


def sidecar_path(data_path: str) -> str:
    return data_path + ".bloom"


def size_bits(n_keys: int) -> int:
    """Power-of-two bit count for ``n_keys`` at BITS_PER_KEY, clamped."""
    want = max(n_keys, 1) * BITS_PER_KEY
    m = 1 << (want - 1).bit_length()
    return min(max(m, MIN_BITS), MAX_BITS)


def key_hashes(values) -> np.ndarray:
    """(n, 2) uint64 double-hash bases for the canonical str() form."""
    out = np.empty((len(values), 2), dtype=np.uint64)
    for i, v in enumerate(values):
        d = hashlib.md5(str(v).encode("utf-8")).digest()
        out[i, 0] = int.from_bytes(d[:8], "big")
        out[i, 1] = int.from_bytes(d[8:16], "big") | 1  # odd: full period
    return out


def build_bits(hashes: np.ndarray, m: int) -> np.ndarray:
    """Set the k probe bits for every hash row; returns a uint8 bit array."""
    bits = np.zeros(m // 8, dtype=np.uint8)
    mask = np.uint64(m - 1)
    h0, h1 = hashes[:, 0], hashes[:, 1]
    for i in range(K_PROBES):
        p = (h0 + np.uint64(i) * h1) & mask
        np.bitwise_or.at(bits, (p >> np.uint64(3)).astype(np.int64),
                         (np.uint64(1) << (p & np.uint64(7))).astype(np.uint8))
    return bits


def probe_any(bits: np.ndarray, m: int, hashes: np.ndarray) -> bool:
    """True iff ANY hash row has all k probe bits set (maybe-present)."""
    if len(hashes) == 0:
        return False
    mask = np.uint64(m - 1)
    alive = np.ones(len(hashes), dtype=bool)
    h0, h1 = hashes[:, 0], hashes[:, 1]
    for i in range(K_PROBES):
        p = (h0[alive] + np.uint64(i) * h1[alive]) & mask
        hit = (
            bits[(p >> np.uint64(3)).astype(np.int64)]
            >> (p & np.uint64(7)).astype(np.uint8)
        ) & 1
        idx = np.flatnonzero(alive)
        alive[idx[hit == 0]] = False
        if not alive.any():
            return False
    return True


def write_sidecar(data_path: str, values) -> dict:
    """Build + write the sidecar for ``values``; returns the manifest
    marker {"m": bits, "k": probes, "v": format version}."""
    m = size_bits(len(values))
    payload = build_bits(key_hashes(values), m).tobytes()
    tmp = sidecar_path(data_path) + ".tmp"
    with open(tmp, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack(_HEADER, m, K_PROBES, zlib.crc32(payload)))
        f.write(payload)
    os.replace(tmp, sidecar_path(data_path))
    return {"m": m, "k": K_PROBES, "v": MARKER_VERSION}


def load_sidecar(data_path: str) -> tuple[int, np.ndarray] | None:
    """(m, bit array) or None when absent/unreadable/corrupt (probe
    degrades to range-only pruning — never an error, never a false
    negative).  Validates magic, probe count, that m is a power of two
    (the probe mask assumes it), payload length, AND the payload crc —
    a v1 or bit-flipped sidecar reads as None, not as a wrong filter."""
    try:
        with open(sidecar_path(data_path), "rb") as f:
            raw = f.read()
    except OSError:
        return None
    hdr = len(MAGIC) + struct.calcsize(_HEADER)
    if len(raw) < hdr or raw[: len(MAGIC)] != MAGIC:
        return None
    m, k, crc = struct.unpack_from(_HEADER, raw, len(MAGIC))
    if k != K_PROBES or m <= 0 or m & (m - 1) or len(raw) - hdr != m // 8:
        return None  # foreign params: be conservative
    if zlib.crc32(raw[hdr:]) != crc:
        return None  # corrupt payload would FALSE-NEGATIVE: reject
    return m, np.frombuffer(raw, dtype=np.uint8, offset=hdr)


def build_for_file(data_path: str, col: str) -> dict | None:
    """Read one column of a parquet file and write its bloom sidecar.
    Returns the manifest marker, or None when the column is absent
    (schema-era drift: older writers simply have no filter)."""
    import pyarrow.parquet as pq

    try:
        pf = pq.ParquetFile(data_path)
        if col not in pf.schema_arrow.names:
            return None
        tbl = pf.read(columns=[col])
    except OSError:
        return None
    vals = [v for v in tbl.column(0).to_pylist() if v is not None]
    return write_sidecar(data_path, vals)


def build_sidecars(spark, paths: list[str], col: str) -> dict[str, dict]:
    """Build sidecars for many files; {path: marker}.  Driver loop for a
    handful, executor fan-out (O(#files) tiny column-read tasks, the
    footer-harvest pattern) beyond that."""
    out: dict[str, dict] = {}
    if len(paths) <= 64:
        for p in paths:
            mk = build_for_file(p, col)
            if mk:
                out[p] = mk
        return out
    sc = spark.sparkContext
    n_slices = max(1, min(len(paths) // 16, sc.defaultParallelism * 2))

    def part(it):
        from canal_spark.table.bloom import build_for_file as bff

        for p in it:
            yield (p, bff(p, col))

    for p, mk in sc.parallelize(paths, n_slices).mapPartitions(part).collect():
        if mk:
            out[p] = mk
    return out


def backfill(spark, table) -> dict:
    """Build bloom sidecars for EXISTING data files that predate the
    ``write.bloom.col`` property and register their markers via one
    metadata-only ``replace`` commit — so an opted-in table gets
    membership pruning on its whole history immediately instead of
    waiting for organic rewrites.  Idempotent: files already carrying a
    marker are skipped; a crash between sidecar writes and the commit
    leaves unused (harmless) sidecars a re-run adopts by rebuilding.
    Cost is one column-pruned read per un-annotated file, distributed —
    the same price those files would have paid at write time."""
    col = table.properties.get(BLOOM_PROP)
    if not col:
        raise ValueError(f"table has no {BLOOM_PROP!r} property — set it first")
    table.refresh()
    entries = [e for e in table.all_entries() if e.content == "data"]
    # stale = no marker OR a marker from an older sidecar format whose
    # file probes as unreadable now — backfill doubles as the format
    # upgrade path (re-run it once after an engine upgrade).
    todo = [
        e
        for e in entries
        if ((e.stats.get(col) or {}).get("bloom") or {}).get("v")
        != MARKER_VERSION
    ]
    if not todo:
        return {"annotated": 0, "already": len(entries)}
    markers = build_sidecars(
        spark, [os.path.join(table.root, e.path) for e in todo], col
    )
    updates = {
        e.path: {col: {"bloom": markers[os.path.join(table.root, e.path)]}}
        for e in todo
        if os.path.join(table.root, e.path) in markers
    }
    snap = table.annotate_entry_stats(
        updates, summary={"phase": "bloom-backfill"}
    )
    return {
        "annotated": len(updates),
        "already": len(entries) - len(todo),
        "snapshot_id": snap.snapshot_id,
    }
