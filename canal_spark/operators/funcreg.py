"""User-pluggable filter-function registry.

Reference parity: Canal lets deployments extend its Aviator expression
filters with custom functions — `AviaterRegexFilter` statically
registers `RegexFunction` (filter/.../aviater/AviaterRegexFilter.java:28-32,
filter/.../aviater/RegexFunction.java:19-31) and event filters then
evaluate expressions like ``regex(pattern, target)`` per event
(filter/.../aviater/AviaterELFilter.java:27-35).

The Spark-first restatement: the engine's expression filters are plain
Catalyst ``expr()`` strings (operators/relational.py F3), so a "custom
Aviator function" is a **named function registered with the session**
that those expression strings can call.  Two tiers, fast path first:

* `register_sql_function` — a Spark SQL-defined function
  (``CREATE OR REPLACE TEMPORARY FUNCTION … RETURN <expr>``): the body
  is inlined by the analyzer into the calling plan, stays inside
  whole-stage codegen, and costs nothing over writing the expression
  by hand.  This is the right tier for ~every filter predicate.
* `register_pandas_function` — an Arrow-vectorized Python kernel for
  semantics SQL genuinely can't express.  Documented slow path: rows
  cross to a Python worker in Arrow batches (never per-row).

Both register into the session's function catalog, so the name works
in ``F.expr``, ``spark.sql``, and every operator that accepts an
expression filter — the exact role `AviatorEvaluator.addFunction`
plays for the reference's filter chain.
"""

from __future__ import annotations

import re
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_NAME_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _check_name(name: str) -> None:
    if not _NAME_RE.match(name):
        raise ValueError(f"invalid function name: {name!r}")


def register_sql_function(
    spark: SparkSession,
    name: str,
    params: list[tuple[str, str]],
    returns: str,
    body: str,
) -> None:
    """Register a SQL-defined function: ``params`` is [(name, type)],
    ``body`` a single SQL expression over those parameters.

    The definition is declarative, so Catalyst inlines it at every call
    site — the plan is identical to hand-writing the expression (no UDF
    barrier, codegen intact).  Re-registering a name replaces it, like
    `AviatorEvaluator.addFunction` overwrite semantics."""
    _check_name(name)
    for p, _ in params:
        _check_name(p)
    sig = ", ".join(f"{p} {t}" for p, t in params)
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({sig}) "
        f"RETURNS {returns} RETURN {body}"
    )


def register_pandas_function(
    spark: SparkSession, name: str, fn: Callable, returns: str
) -> None:
    """Register an Arrow-vectorized Python function under ``name``.

    ``fn`` takes/returns pandas Series (batch-at-a-time).  Use ONLY for
    semantics Catalyst can't express — it inserts an ArrowEvalPython
    exchange into every calling plan."""
    from pyspark.sql.pandas.functions import pandas_udf

    _check_name(name)
    spark.udf.register(name, pandas_udf(fn, returns))


def q_filter_func_custom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query for the registry: an expression filter calling the
    session-registered functions — the exact shape of a Canal deployment
    filtering events through a custom Aviator function
    (filter/.../AviaterELFilter.java:27-35 evaluating a user expression
    per event).  The plan must show NO Python eval: both functions are
    SQL-defined, so the filter inlines into the parquet scan's codegen
    stage."""
    from canal_spark.operators.common import load

    register_builtin_functions(spark)
    docs = load(spark, sf_dir, "documents")
    keep = F.expr(
        "canal_regex_any('src[0-3],src1[0-5]', source)"
        " AND canal_regex('(en|de|fr)', lang)"
    )
    return (
        docs.where(keep)
        .groupBy("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
    )


SQL_FILTER_FUNC_CUSTOM = """
SELECT source, lang, count(*) AS n_docs, sum(n_chars) AS sum_chars
FROM documents
WHERE (regexp_full_match(source, 'src[0-3]')
       OR regexp_full_match(source, 'src1[0-5]'))
  AND regexp_full_match(lang, '(en|de|fr)')
GROUP BY source, lang
"""

QUERIES = {"filter_func_custom": q_filter_func_custom}
ORACLES = {"filter_func_custom": SQL_FILTER_FUNC_CUSTOM}


def register_builtin_functions(spark: SparkSession) -> None:
    """The engine's stock extension functions (the `RegexFunction`
    analogue), available to every expression filter after one call:

    * ``canal_regex(pattern, target)`` — FULL-match of target against
      pattern (the reference anchors patterns head and tail:
      AviaterRegexFilter.completionPattern, filter/.../AviaterRegexFilter.java:79-97);
      null target -> false, like matching an absent schema.table.
    * ``canal_regex_any(patterns, target)`` — full-match against any of
      a COMMA-SEPARATED pattern list, the reference's multi-pattern
      filter string format (SPLIT=",", :25,45-52).
    """
    register_sql_function(
        spark,
        "canal_regex",
        [("pattern", "STRING"), ("target", "STRING")],
        "BOOLEAN",
        "coalesce(target RLIKE concat('^(?:', pattern, ')$'), false)",
    )
    register_sql_function(
        spark,
        "canal_regex_any",
        [("patterns", "STRING"), ("target", "STRING")],
        "BOOLEAN",
        "exists(split(patterns, ','), "
        "p -> coalesce(target RLIKE concat('^(?:', p, ')$'), false))",
    )
