"""Physical-plan inspection helpers.

The 100 TB contract is enforced here, not hoped for: tests assert that
point lookups push their predicates into the parquet scan, projections
prune the read schema, dimension joins broadcast instead of shuffling,
top-k compiles to TakeOrderedAndProject, and aggregations are partial
(map-side combined) before their one shuffle.  A plan regression fails
the suite the same way a wrong answer does.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def plan_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section(s) of the scan nodes."""
    return "\n".join(
        line.strip() for line in plan_str(df).splitlines()
        if "PushedFilters" in line
    )


def read_schema(df: DataFrame) -> str:
    return "\n".join(
        line.strip() for line in plan_str(df).splitlines()
        if "ReadSchema" in line
    )


def n_shuffles(df: DataFrame) -> int:
    """Number of Exchange operators (shuffles) in the physical plan."""
    plan = plan_str(df, "simple")
    return sum(1 for line in plan.splitlines()
               if "Exchange" in line and "BroadcastExchange" not in line
               and "Reused" not in line)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan_str(df, "simple")


def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in plan_str(df, "simple")


def has_cartesian(df: DataFrame) -> bool:
    plan = plan_str(df, "simple")
    return "CartesianProduct" in plan


def has_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in plan_str(df, "simple")


def has_partial_aggregation(df: DataFrame) -> bool:
    """Map-side combine: HashAggregate with partial_* functions before
    the shuffle."""
    return "partial_" in plan_str(df, "formatted")


def wholestage_codegen_ids(df: DataFrame) -> int:
    """Number of whole-stage-codegen spans in the EXECUTED plan (AQE only
    materializes codegen markers after the job runs -- and only on the
    same query execution, so this collects the DataFrame itself)."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    ids = {line.split("*(")[1].split(")")[0]
           for line in plan.splitlines() if "*(" in line}
    return len(ids)
