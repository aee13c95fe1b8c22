#!/usr/bin/env python
"""Capture the PRE-checkpoint internal plans of eagerly-materializing
queries (plans/audit.capture_plans) into plans/<round>/<query>_<tag>_internal.txt
— the checkpointed final frame's own plan is just an RDD scan, so the
real execution plans live in the audit sink.

Usage: python scripts/capture_internal_plans.py <tag> <query> [...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from adventureworkslakehousepoc_spark.plans.audit import capture_plans  # noqa: E402
from adventureworkslakehousepoc_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("AWLH_PLAN_ROUND", "r16")
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="awlh-plan-capture")

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    for name in names:
        with capture_plans() as sink:
            df = queries[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            final = df._jdf.queryExecution().executedPlan().toString()
        path = os.path.join(out_dir, f"{name}_{tag}_internal.txt")
        with open(path, "w") as f:
            for label, plan in sink:
                f.write(f"===== internal materialization: {label} =====\n{plan}\n")
            f.write(f"===== returned frame =====\n{final}\n")
        print(f"wrote {path} ({len(sink)} internal plans)")


if __name__ == "__main__":
    main()
