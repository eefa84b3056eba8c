"""Unit gate for tools/plan_lint.py's pure lint, plus a live Spark
check that the two error classes are actually detectable in real plan
strings (so a Spark upgrade renaming a node can't silently blind the
lint)."""

from __future__ import annotations

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load():
    spec = importlib.util.spec_from_file_location(
        "plan_lint_mod", os.path.join(REPO, "tools", "plan_lint.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_lint_plan_counts():
    pl = _load()
    plan = (
        "CartesianProduct\n+- BatchEvalPython [f(x)]\n"
        "+- Exchange hashpartitioning(a, 8)\n"
        "+- Exchange SinglePartition\n"
        "+- BroadcastNestedLoopJoin BuildRight, Cross\n")
    row = pl.lint_plan(plan)
    assert row["errors"] == {"CartesianProduct": 1, "BatchEvalPython": 1}
    assert row["warnings"] == {"BroadcastNestedLoopJoin": 1}
    assert row["exchanges"] == 2


def test_clean_plan_passes():
    pl = _load()
    row = pl.lint_plan(
        "ArrowEvalPython\n+- MapInPandas\n+- FlatMapGroupsInPandas\n"
        "+- BroadcastHashJoin\n+- SortMergeJoin\n")
    assert not row["errors"] and not row["warnings"]
    assert row["exchanges"] == 0


def _plan_of(df):
    jvm = df.sparkSession._jvm
    return jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple")


def test_error_nodes_detectable_in_live_plans(spark):
    """A real cross join and a real row-at-a-time UDF must still
    surface under the exact node names the lint greps for."""
    import pyspark.sql.functions as F
    from pyspark.sql.functions import udf

    pl = _load()
    a = spark.range(3)
    b = spark.range(3).withColumnRenamed("id", "id2")
    # defeat broadcast so the cross join lowers to CartesianProduct
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        cross = a.crossJoin(b)
        assert pl.lint_plan(_plan_of(cross))["errors"].get("CartesianProduct")
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    slow = udf(lambda x: x + 1, "bigint")
    bad = a.select(slow(F.col("id")).alias("y"))
    assert pl.lint_plan(_plan_of(bad))["errors"].get("BatchEvalPython")


def test_budget_drift():
    pl = _load()
    old = {"a": {"exchanges": 3}, "b": {"exchanges": 2},
           "gone": {"exchanges": 1}, "err": {"errors": {"EXCEPTION": 1}}}
    new = {"a": {"exchanges": 5}, "b": {"exchanges": 2},
           "fresh": {"exchanges": 9}, "err": {"errors": {"EXCEPTION": 1}}}
    assert pl.budget_drift(old, new) == [("a", 3, 5)]
