"""Physical-plan inspection helpers.

The 100 TB stance is enforced in tests: dimension joins must be
broadcast, filters must reach the parquet scan, projections must prune
columns.  These helpers make those properties assertable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def assert_broadcast_join(df: DataFrame) -> None:
    plan = plan_string(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, (
        "expected a broadcast join in plan:\n" + plan
    )


def assert_pushed_filters(df: DataFrame, fragment: str) -> None:
    plan = plan_string(df)
    assert "PushedFilters" in plan and fragment in plan, (
        f"expected pushed filter containing {fragment!r} in plan:\n" + plan
    )
