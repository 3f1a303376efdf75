"""Physical-plan audit: extract the scale-relevant features of a query's
executed plan (SURVEY §4, SCALE.md evidence).

For every declared query we care about a handful of plan properties that
decide 100 TB behavior long before any row is processed:

* how many Exchanges (shuffles) the plan contains, and whether any is a
  SinglePartition funnel;
* whether dim joins broadcast (BroadcastHashJoin) vs shuffle (SMJ/SHJ);
* whether top-k avoided a total sort (TakeOrderedAndProject /
  WindowGroupLimit);
* whether filters/partition predicates reached the parquet scan
  (PushedFilters / PartitionFilters non-empty);
* how much of the plan runs in WholeStageCodegen vs Python exchange
  operators (ArrowEval / MapInPandas / FlatMapGroupsInPandas...);
* aggregate shape: partial+final HashAggregate pairs (map-side combine).

``audit_plan`` computes them from a DataFrame without executing it (the
AQE initial plan — join strategies may still improve at runtime, never
degrade below what's pinned here). ``tools/gen_plans.py`` renders the
whole registry into PLANS.md.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_PY_OPS = (
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "FlatMapGroupsInPandasWithState",
    "MapInArrow",
    "PythonUDTF",
)


def plan_string(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# Operators that BOUND the row count flowing into an exchange: an
# aggregation (output = group space), a limit, or a per-partition top-k.
_BOUNDING_OPS = (
    "HashAggregate",
    "SortAggregate",
    "ObjectHashAggregate",
    "AggregateInPandas",
    "TakeOrderedAndProject",
    "CollectLimit",
    "LocalLimit",
    "GlobalLimit",
    "WindowGroupLimit",
)

# Operators that can RE-EXPAND rows: a bounding op BELOW one of these
# does not bound what reaches the exchange (review r8 — a join or
# explode between the aggregate and the funnel re-inflates the stream).
_EXPANDING_OPS = (
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "Generate",
    "Expand",
    "FlatMapGroupsInPandas",
    "MapInPandas",
)


def _tree_depth(line: str) -> int:
    """Column of the operator name in Spark's toString tree drawing —
    lines are prefixed with ':'/' ' guides and a '+-' connector."""
    m = re.search(r"[+:]- ", line)
    if m:
        return m.start()
    return -1  # root line (no connector)


def classify_single_partition(plan: str) -> list[str]:
    """For each `Exchange SinglePartition` in the plan, classify its
    input subtree: 'bounded(<op>)' when a row-count-bounding operator
    (aggregate / limit / group-top-k) feeds the funnel with NO
    row-expanding operator (join / explode / grouped-map) between it and
    the exchange, else 'UNBOUNDED' — the class that funnels raw data
    through one task at 100 TB.

    Decision rule: the FIRST bounding-or-expanding operator met in the
    subtree's pre-order walk decides. Pre-order visits an operator
    before its children, so a join directly under the exchange is seen
    before any aggregate buried in its inputs (-> UNBOUNDED: the
    aggregate does not bound the join's output), while an aggregate
    whose own input contains a join is seen first (-> bounded: group
    space is what crosses the funnel).

    Machine replacement for PLANS.md's hand-listed whitelist (VERDICT r7
    item 6): the audit test fails on any UNBOUNDED funnel that is not a
    declared-semantics exemption."""
    lines = plan.splitlines()
    out = []
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        if "ReusedExchange" in line:
            # a reference to an exchange classified elsewhere — it has no
            # subtree of its own and must not read as a second funnel
            # (review r8: it previously classified UNBOUNDED spuriously)
            continue
        depth = _tree_depth(line)
        verdict = "UNBOUNDED"
        for sub in lines[i + 1 :]:
            d = _tree_depth(sub)
            if d != -1 and d <= depth:
                break  # left the exchange's input subtree
            hit = None
            for op in _EXPANDING_OPS:
                if op in sub:
                    hit = "UNBOUNDED"
                    break
            if hit is None:
                for op in _BOUNDING_OPS:
                    if op in sub and f"Object{op}" not in sub:
                        hit = f"bounded({op})"
                        break
            if hit is not None:
                verdict = hit
                break
        out.append(verdict)
    return out


def audit_plan(df: DataFrame) -> dict:
    """Feature-extract one plan. Keys are stable — PLANS.md columns."""
    plan = plan_string(df)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    partf = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    return {
        "exchanges": plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning")
        + plan.count("Exchange SinglePartition"),
        "single_partition": plan.count("Exchange SinglePartition"),
        # per-funnel bounded/UNBOUNDED classification (see
        # classify_single_partition); PLANS.md renders it and the audit
        # test rejects undeclared UNBOUNDED funnels
        "sp_class": ",".join(
            sorted(set(classify_single_partition(plan)))
        ),
        "broadcast_joins": plan.count("BroadcastHashJoin")
        + plan.count("BroadcastNestedLoopJoin"),
        "shuffle_joins": plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin"),
        "take_ordered": "TakeOrderedAndProject" in plan,
        "window_group_limit": "WindowGroupLimit" in plan,
        # boundary-aware: plain count("HashAggregate") also matches inside
        # "ObjectHashAggregate" and would double-count those plans
        "partial_agg_pairs": len(re.findall(r"(?<!Object)HashAggregate", plan)) // 2
        + plan.count("ObjectHashAggregate") // 2
        + plan.count("SortAggregate") // 2,
        "pushed_filters": any(p.strip() for p in pushed),
        "partition_filters": any(p.strip() for p in partf),
        # toString marks codegen stages as "*(N) Operator"; formatted-mode
        # prints "WholeStageCodegen (N)" — accept both
        "codegen_spans": len(
            set(re.findall(r"\*\((\d+)\)", plan))
            | set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
        ),
        "python_ops": sum(plan.count(op) for op in _PY_OPS),
        # AQE wrapper present -> runtime skew-join splitting / join-strategy
        # re-planning is armed for every Exchange below it (VERDICT r5
        # item 9: pin it per-plan so a config regression that silently
        # disables AQE on the newest tiers fails the audit diff)
        "aqe": "AdaptiveSparkPlan" in plan,
        # lineage-truncation sites (localCheckpoint / driver-built inputs)
        # surface as ExistingRDD scans; tracked separately from file scans
        # so a missing checkpoint in a multi-consumer plan is visible
        "rdd_scans": plan.count("Scan ExistingRDD"),
        "scans": plan.count("Scan parquet") + plan.count("Scan json")
        + plan.count("Scan csv") + plan.count("Scan text")
        + plan.count("Scan ExistingRDD"),
    }
