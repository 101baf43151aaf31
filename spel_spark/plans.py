"""Physical-plan auditing (SURVEY §4 custom work #5).

The north rule mandates "no per-row Python anywhere on the hot path".  In
Spark terms: pandas UDFs compile to ``ArrowEvalPython`` nodes (vectorized
Arrow transfer), row-at-a-time ``F.udf`` to ``BatchEvalPython`` (pickle
per row).  These helpers assert plan quality in tests and let operators be
reviewed with ``.explain`` programmatically:

* no ``BatchEvalPython`` anywhere;
* ``ArrowEvalPython`` only in stages that are allowed Python (scoring,
  extraction UDTF);
* parquet scans push filters (``PushedFilters``) and prune columns
  (``ReadSchema``);
* dimension joins broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def assert_no_row_python(df: DataFrame) -> None:
    """Fail if any row-at-a-time Python UDF is in the plan."""
    plan = physical_plan(df)
    assert "BatchEvalPython" not in plan, (
        "row-at-a-time Python UDF (BatchEvalPython) found on the hot path:\n"
        + plan
    )


def count_arrow_eval_nodes(df: DataFrame) -> int:
    return physical_plan(df).count("ArrowEvalPython")


def scan_summary(df: DataFrame) -> dict:
    """Pushed filters / read schema of every parquet scan in the plan."""
    import re

    plan = formatted_plan(df)
    return {
        "pushed_filters": re.findall(r"PushedFilters: \[([^\]]*)\]", plan),
        "read_schemas": re.findall(r"ReadSchema: ([^\n]*)", plan),
        "has_broadcast": "BroadcastHashJoin" in plan or "BroadcastExchange" in plan,
        "wholestage_codegen_spans": plan.count("WholeStageCodegen"),
    }
