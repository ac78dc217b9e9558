"""Physical-plan inspection helpers.

The 100 TB posture lives or dies in plan shapes (SURVEY.md §4); these
helpers turn ``.explain`` output into assertions so the properties that
matter — pushdown, pruned schemas, broadcast strategy, shuffle counts,
top-k without full sort — are pinned by tests instead of re-checked by
hand after every change.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode))


@dataclass
class PlanFacts:
    text: str
    n_shuffles: int          # hash/range repartition exchanges
    n_broadcasts: int
    has_take_ordered: bool
    pushed_filters: list[str]
    read_schemas: list[str]
    has_python_eval: bool    # row-at-a-time Python UDF in the plan

    def pushed(self, fragment: str) -> bool:
        return any(fragment in p for p in self.pushed_filters)

    def reads_column(self, col: str) -> bool:
        return any(col in s for s in self.read_schemas)

    def distinct_shuffle_keys(self) -> set[str]:
        """Logically-distinct shuffle partitionings: expression ids are
        stripped so a cached subtree printed N times (InMemoryRelation
        bodies appear inline in explain output) counts once."""
        keys = set()
        for m in re.finditer(
                r"Exchange (?:hash|range)partitioning\(([^)]*)\)",
                self.text):
            keys.add(re.sub(r"#\d+L?", "", m.group(1)))
        return keys


def plan_facts(df: DataFrame) -> PlanFacts:
    text = explain_str(df, "simple")
    return PlanFacts(
        text=text,
        n_shuffles=len(re.findall(
            r"Exchange (?:hash|range)partitioning", text)),
        n_broadcasts=len(re.findall(r"BroadcastExchange", text)),
        has_take_ordered="TakeOrderedAndProject" in text,
        pushed_filters=re.findall(r"PushedFilters: \[([^\]]*)\]", text),
        read_schemas=re.findall(r"ReadSchema: (\S+)", text),
        has_python_eval="BatchEvalPython" in text,
    )
