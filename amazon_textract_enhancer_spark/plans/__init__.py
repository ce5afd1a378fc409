"""Explain-plan introspection helpers (SURVEY.md §4: "verify with
df.explain() in tests"). Used by tests/test_plans.py to assert the
physical plans are the ones we want — pushdown reaching the scan,
column pruning, broadcast joins, top-k as TakeOrderedAndProject, and
no shuffle in the extraction stage — not just the first ones that
passed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def final_plan(df: DataFrame) -> str:
    """The executed plan with AQE's "Initial Plan" echo stripped: after
    execution, AdaptiveSparkPlan.toString prints BOTH the final and the
    initial plan, so substring counts (e.g. scans) double-count unless
    the initial section is cut."""
    plan = executed_plan(df)
    marker = "== Initial Plan =="
    return plan.split(marker, 1)[0]


def formatted_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def n_exchanges(df: DataFrame) -> int:
    """Count shuffle boundaries (excluding broadcast exchanges)."""
    plan = executed_plan(df)
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "BroadcastExchange" not in line
    )


def n_broadcast_joins(df: DataFrame) -> int:
    return executed_plan(df).count("BroadcastHashJoin")


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section(s) of the formatted plan."""
    return "\n".join(
        line for line in formatted_plan(df).splitlines() if "PushedFilters" in line
    )


def read_schema(df: DataFrame) -> str:
    return "\n".join(
        line for line in formatted_plan(df).splitlines() if "ReadSchema" in line
    )
