"""User-pluggable filter functions (the Aviator addFunction analogue)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from canal_spark.operators.funcreg import (
    register_builtin_functions,
    register_pandas_function,
    register_sql_function,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_builtin_regex_matches_reference_semantics(spark):
    """canal_regex is a FULL match (patterns anchored head+tail like
    AviaterRegexFilter.completionPattern); null target -> false; the
    _any variant takes the reference's comma-separated pattern list."""
    register_builtin_functions(spark)
    rows = spark.sql(
        "SELECT x, canal_regex('db1\\\\..*', x) AS m,"
        "       canal_regex_any('db1\\\\..*,db2\\\\.t1', x) AS a "
        "FROM VALUES ('db1.users'), ('db2.t1'), ('db2.t12'),"
        "            ('xdb1.users'), (CAST(NULL AS STRING)) v(x)"
    ).collect()
    got = {r["x"]: (r["m"], r["a"]) for r in rows}
    assert got["db1.users"] == (True, True)
    assert got["db2.t1"] == (False, True)
    # full-match, not substring: db2.t12 must NOT match db2.t1
    assert got["db2.t12"] == (False, False)
    # anchored: a prefix before the pattern breaks the match
    assert got["xdb1.users"] == (False, False)
    assert got[None] == (False, False)


def test_sql_function_usable_in_expression_filter_and_stays_jvm(spark):
    """A registered SQL function works inside the F3 expression-filter
    path (F.expr over a scan) and is INLINED by the analyzer — the
    physical plan contains no Python evaluation node and keeps the
    parquet filter pushdown alive."""
    register_builtin_functions(spark)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    flt = docs.where(F.expr("canal_regex('src[0-3]', source)"))
    plan = _plan(flt)
    assert "EvalPython" not in plan  # no Arrow/Batch Python exchange
    want = docs.where(F.col("source").rlike("^(?:src[0-3])$")).count()
    assert flt.count() == want > 0


def test_driver_query_plan_is_pure_jvm(spark):
    """The filter_func_custom driver query (both registered functions in
    one expression filter) compiles to a plan with no Python eval node."""
    from canal_spark.operators.funcreg import q_filter_func_custom

    df = q_filter_func_custom(spark, "/root/testdata/sf0.001")
    assert "EvalPython" not in _plan(df)
    rows = df.collect()
    assert len(rows) > 0
    assert all(r["n_docs"] > 0 for r in rows)


def test_register_replaces_and_validates_names(spark):
    register_sql_function(
        spark, "canal_tst_twice", [("x", "INT")], "INT", "x + 1"
    )
    register_sql_function(
        spark, "canal_tst_twice", [("x", "INT")], "INT", "x + 2"
    )
    assert spark.sql("SELECT canal_tst_twice(1) AS v").collect()[0]["v"] == 3
    with pytest.raises(ValueError):
        register_sql_function(spark, "bad name; DROP", [], "INT", "1")
    with pytest.raises(ValueError):
        register_sql_function(
            spark, "ok", [("bad param", "INT")], "INT", "1"
        )


def test_pandas_function_vectorized_fallback(spark):
    """The Python tier registers an Arrow-vectorized kernel for
    semantics SQL can't express; it is the documented slow path (an
    ArrowEvalPython node appears in the plan)."""

    def _revcmp(s: pd.Series) -> pd.Series:
        return s.str[::-1] == s

    register_pandas_function(spark, "canal_tst_palin", _revcmp, "boolean")
    df = spark.createDataFrame(
        [("abba",), ("abc",)], "x string"
    ).where(F.expr("canal_tst_palin(x)"))
    assert "EvalPython" in _plan(df)
    assert [r["x"] for r in df.collect()] == ["abba"]
