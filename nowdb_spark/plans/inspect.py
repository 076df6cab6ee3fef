"""Physical-plan introspection over a DataFrame's executed plan."""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanInfo:
    text: str
    pushed_filters: list[str] = field(default_factory=list)
    partition_filters: list[str] = field(default_factory=list)
    read_schema: str = ""
    n_exchanges: int = 0
    has_broadcast_join: bool = False
    has_sortmerge_join: bool = False
    has_take_ordered: bool = False
    python_eval_nodes: list[str] = field(default_factory=list)

    def reads_column(self, col: str) -> bool:
        return col in self.read_schema


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """Full (untruncated) physical plan text — `toString()` of the
    executed plan clips long field lists."""
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def inspect_plan(df: DataFrame) -> PlanInfo:
    text = plan_string(df)
    info = PlanInfo(text=text)
    m = re.search(r"PushedFilters: \[([^\]]*)\]", text)
    if m:
        info.pushed_filters = [s.strip() for s in m.group(1).split(",")
                               if s.strip()]
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", text)
    if m:
        info.partition_filters = [s.strip() for s in m.group(1).split(",")
                                  if s.strip()]
    m = re.search(r"ReadSchema: (\S+)", text)
    if m:
        info.read_schema = m.group(1)
    info.n_exchanges = text.count("Exchange ")
    info.has_broadcast_join = ("BroadcastHashJoin" in text
                               or "BroadcastNestedLoopJoin" in text)
    info.has_sortmerge_join = "SortMergeJoin" in text
    info.has_take_ordered = "TakeOrderedAndProject" in text
    info.python_eval_nodes = re.findall(
        r"(BatchEvalPython|MapInPandas|FlatMapGroupsInPandas)", text)
    return info
