"""Physical-plan audit: for each headline query, print the formatted
plan plus a summary of scale-relevant properties — exchange (shuffle)
count, broadcast joins, pushed filters, scan schema width, and
whole-stage-codegen coverage.

Usage: python tools/explain_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2:]


def summarize(spark, df) -> dict:
    """Scale-relevant physical-plan properties of an (un-executed)
    DataFrame, with AQE disabled for the static view. Keys double as
    the structural contract tests/test_plan_properties.py pins."""
    aqe_prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted")
        cg = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "codegen")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_prev)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    scans = re.findall(r"ReadSchema: (struct<[^\n]*)", plan)
    m = re.search(r"Found (\d+) WholeStageCodegen", cg)
    return {
        "shuffles": len(re.findall(r"Arguments: hashpartitioning", plan)),
        "range_shuffles": len(re.findall(r"Arguments: rangepartitioning", plan)),
        "single_part": len(re.findall(r"Arguments: SinglePartition", plan)),
        # windowspecdefinition whose FIRST argument is the frame or an
        # ordered column = no PARTITION BY → the whole input moves to
        # one task (the `WindowExec: No Partition Defined` warning).
        "unpartitioned_windows": len(re.findall(
            r"windowspecdefinition\((?:specifiedwindowframe|"
            r"\S+#\d+\w* (?:ASC|DESC))", plan)),
        "broadcast_joins": len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)),
        "broadcast_nl_joins": len(
            re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan)),
        "sort_merge_joins": len(re.findall(r"\(\d+\) SortMergeJoin", plan)),
        "in_memory_scans": len(re.findall(r"InMemoryTableScan", plan)),
        "scans": len(scans),
        "scan_widths": [s.count(":") for s in scans],
        "pushed_filter_scans": sum(1 for p in pushed if p.strip()),
        "codegen_spans": int(m.group(1)) if m else 0,
        "_plan": plan,
    }


def main() -> None:
    from alma_publish_to_marc_spark.session import get_spark
    from alma_publish_to_marc_spark import registry

    spark = get_spark("explain-audit")
    qs = registry.queries()
    # Default: EVERY registry key (VERDICT r06 item 4) — one audit
    # section per query so a shuffle regression anywhere is caught
    # mechanically. Pass names to subset.
    names = ONLY or list(qs)
    for name in names:
        if name not in qs:
            continue
        df = qs[name](spark, SF_DIR)
        # AQE wraps un-executed plans in AdaptiveSparkPlan, under which
        # the "codegen" explain reports 0 WholeStageCodegen subtrees
        # (compiled only at execution). Disable it AFTER building the
        # frame so the audit sees the static plan, and restore the
        # previous value in `finally` — anything built in this session
        # outside the registry wrappers (whose tune() re-enables AQE)
        # must not silently plan without it.
        props = summarize(spark, df)
        plan = props.pop("_plan")
        # driver-paced queries persist frames during construction;
        # drop them so a full-registry audit doesn't accumulate cache
        spark.catalog.clearCache()
        print(f"== {name}: " + " ".join(
            f"{k}={v}" for k, v in props.items()))
        if "-v" in sys.argv or os.environ.get("AUDIT_VERBOSE"):
            print(plan)


if __name__ == "__main__":
    main()
