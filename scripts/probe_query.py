#!/usr/bin/env python
"""Isolate and time registered queries with the noop sink (guide §1.4):
warm-up + min-of-N, inter-rep GC, per-query job descriptions.

Usage: python scripts/probe_query.py [-n N] <query> [<query> ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from adventureworkslakehousepoc_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    n = 3
    if args and args[0] == "-n":
        n = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="awlh-probe", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    for name in args:
        def once() -> float:
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0

        spark.sparkContext.setJobDescription(f"probe: {name}")
        warm = once()
        reps = []
        for _ in range(n):
            reps.append(once())
            spark._jvm.System.gc()
        spark.sparkContext.setJobDescription(None)
        print(
            f"{name}: warm={warm:.3f} min={min(reps):.3f} reps="
            + ",".join(f"{r:.3f}" for r in reps),
            flush=True,
        )


if __name__ == "__main__":
    main()
