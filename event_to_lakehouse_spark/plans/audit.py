"""Physical-plan introspection (the engine's performance contract).

The 100 TB design rules in this repo are statements about plan shape:
filters reach the parquet scan, projections prune columns, dimensions
broadcast, facts shuffle at most once per key change. ``audit_plan``
extracts those facts from Catalyst's executed plan so tests can PIN
them — a plan regression (lost pushdown, a broadcast degrading to
sort-merge, a surprise extra exchange) fails CI instead of surfacing
as a 10× slowdown on the cluster.

Works on the AQE-wrapped plan (Spark 3.0+): counts reflect the initial
physical plan; AQE may further coalesce at runtime, never add joins.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanAudit:
    broadcast_hash_joins: int = 0
    sort_merge_joins: int = 0
    shuffled_hash_joins: int = 0
    nested_loop_joins: int = 0
    exchanges: int = 0
    broadcast_exchanges: int = 0
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    has_partial_aggregate: bool = False
    take_ordered: bool = False
    text: str = ""

    @property
    def shuffle_exchanges(self) -> int:
        return self.exchanges - self.broadcast_exchanges


def audit_plan(df: DataFrame) -> PlanAudit:
    """Parse the formatted explain output into checkable facts.

    Formatted mode (same payload as ``df.explain("formatted")``) is
    used because the tree's toString() truncates long scan lines,
    silently dropping PushedFilters/ReadSchema details."""
    text = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    a = PlanAudit(text=text)
    # Count numbered node detail headers ("(5) Exchange") — the tree
    # rendering above them repeats every operator name once more.
    nodes = re.findall(r"^\(\d+\) (\w+)", text, re.MULTILINE)
    counts: dict[str, int] = {}
    for n in nodes:
        counts[n] = counts.get(n, 0) + 1
    a.broadcast_hash_joins = counts.get("BroadcastHashJoin", 0)
    a.sort_merge_joins = counts.get("SortMergeJoin", 0)
    a.shuffled_hash_joins = counts.get("ShuffledHashJoin", 0)
    a.nested_loop_joins = counts.get("BroadcastNestedLoopJoin", 0)
    a.broadcast_exchanges = counts.get("BroadcastExchange", 0)
    a.exchanges = a.broadcast_exchanges + counts.get("Exchange", 0)
    a.pushed_filters = [
        m.group(0) for m in re.finditer(r"PushedFilters: \[[^\]]*\]", text)
    ]
    a.read_schemas = [
        m.group(0) for m in re.finditer(r"ReadSchema: .+", text)
    ]
    a.has_partial_aggregate = "partial_" in text
    a.take_ordered = counts.get("TakeOrderedAndProject", 0) > 0
    return a


def pushed_filter_columns(audit: PlanAudit) -> set[str]:
    """Column names appearing in any pushed filter (pruned scans)."""
    cols: set[str] = set()
    for pf in audit.pushed_filters:
        cols.update(re.findall(r"\((\w+)[,)]", pf))
    return cols
