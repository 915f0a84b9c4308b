#!/usr/bin/env python
"""Registry-wide plan-health table: exchanges, file scans, join kinds
per declared query (executed plans at sf0.001).

The cheap way to spot a re-executed shared subplan (exchange/scan count
far above its family's norm — fix with a lazy localCheckpoint, see
copurchase_triangles) or an accidental SortMergeJoin where a broadcast
was intended. The pytest gate enforces the hard ceilings
(tests/test_plans.py::test_no_scale_killer_joins_anywhere); this tool
prints the full table for eyeballing trends.

Run: python tools/plan_health.py [--top N]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

from biodiversity_data_ingestion_spark.plans.queries import QUERIES  # noqa: E402
from biodiversity_data_ingestion_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    top = None
    if "--top" in sys.argv:
        top = int(sys.argv[sys.argv.index("--top") + 1])
    spark = get_spark(app_name="plan-health", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for name, spec in sorted(QUERIES.items()):
        if name.startswith("stream_"):
            continue  # builders execute the stream eagerly
        p = (
            spec["builder"](spark, SF_DIR)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        rows.append(
            (
                len(re.findall(r"Exchange (?:hash|range)partitioning", p))
                + len(re.findall(r"Exchange SinglePartition", p)),
                len(re.findall(r"FileScan parquet", p)),
                p.count("BroadcastHashJoin"),
                p.count("SortMergeJoin"),
                p.count("BroadcastNestedLoopJoin"),
                name,
            )
        )
    rows.sort(reverse=True)
    print(f"{'query':42s} {'exch':>4s} {'scan':>4s} {'BHJ':>3s} {'SMJ':>3s} {'BNLJ':>4s}")
    for ex, sc, bhj, smj, bnlj, name in rows[:top]:
        print(f"{name:42s} {ex:4d} {sc:4d} {bhj:3d} {smj:3d} {bnlj:4d}")


if __name__ == "__main__":
    main()
