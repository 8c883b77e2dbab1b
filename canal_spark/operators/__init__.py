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

_MODULES = (
    relational, cdc_ext, mv, dedup, text, similarity, multimodal, funcreg,
    temporal, curation, tokenops,
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
