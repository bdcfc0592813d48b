"""Dump .explain("formatted") for headline queries → plans/r20/.

Usage: python scripts/r20_explain_dump.py [suffix] [query ...]
  suffix: "before" | "after" (default "before")
  query:  subset of bench.HEADLINE (default: all)

The dumped plan is the AQE initial plan of the DataFrame each query
returns (isFinalPlan=false) — the artifact the optimization round
commits so plan-shape claims (Exchange count, join strategy,
PushedFilters, Python-eval nodes) are checkable without running Spark.
Queries whose construction runs eager actions (iterative loops,
bounded collects) execute them here like anywhere else.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r20")


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    from bench import HEADLINE
    from jobminer_spark import QUERIES, load_all_operators
    from jobminer_spark.plans.explain import physical_plan
    from jobminer_spark.session import get_spark

    load_all_operators()
    names = sys.argv[2:] or HEADLINE
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("jobminer-explain-r20")
    for name in names:
        try:
            df = QUERIES[name](spark, SF_DIR)
            plan = physical_plan(df)
        except Exception as e:  # noqa: BLE001 — record, keep dumping
            plan = f"EXPLAIN FAILED: {e!r}\n"
        path = os.path.join(OUT, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
