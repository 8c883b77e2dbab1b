"""Operator library exposed through the driver contract.

Each module defines ``QUERIES`` ({name: fn(spark, sf_dir) -> DataFrame})
and ``ORACLES`` ({name: DuckDB SQL string}) pairs with identical output
column names, aggregated by ``all_queries()`` / ``all_oracles()`` for
``__spark_entry__.py``.
"""

from canal_spark.operators import (
    cdc_ext,
    curation,
    dedup,
    funcreg,
    multimodal,
    mv,
    relational,
    similarity,
    temporal,
    text,
    tokenops,
)

# Registry ORDER IS LOAD-BEARING: the external correctness driver
# checks the first 50 entries of the flattened registry.  Modules whose
# queries have the thinnest external verification history go FIRST
# (round 4 found 21 queries that had never received a driver oracle row
# because they sat past position 50); the long-green engine-core basics
# (mv/cdc_ext/relational — stable since round 1-2, still covered by the
# in-repo parity harness tests/test_entry_parity.py) rotate to the back.
_MODULES = (
    similarity, temporal, curation, tokenops, funcreg, multimodal, text,
    dedup, mv, cdc_ext, relational,
)


def all_queries():
    out = {}
    for m in _MODULES:
        out.update(m.QUERIES)
    return out


def all_oracles():
    out = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
