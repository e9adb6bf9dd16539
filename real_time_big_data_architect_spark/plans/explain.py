"""Plan-inspection helpers: verify pushdown/broadcast/codegen posture.

Used by tests and during development to assert the physical plan is the
one we'd want at 100 TB — not just the first one that passed
(``.explain("formatted")`` discipline from the build brief).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def plan_has(df: DataFrame, *needles: str) -> dict[str, bool]:
    """Which substrings appear in the formatted physical plan."""
    plan = formatted_plan(df)
    return {n: (n in plan) for n in needles}


def assert_pushed_filters(df: DataFrame) -> None:
    plan = formatted_plan(df)
    if "PushedFilters: []" in plan:
        raise AssertionError("expected non-empty PushedFilters:\n" + plan)


def assert_broadcast_join(df: DataFrame) -> None:
    plan = formatted_plan(df)
    if "BroadcastHashJoin" not in plan:
        raise AssertionError("expected BroadcastHashJoin:\n" + plan)
