#!/usr/bin/env python
"""sf1-equivalent scaling spot-check (r16, VERDICT item 7): at sf0.1 every
bench row is job-overhead-bound, so the driver's c8-vs-c32 comparison is
flat everywhere and carries no information about which operators
parallelize. This probes a handful of HEAVY rows against the 10x
key-shifted dataset `scripts/scale_smoke.py` derives from sf0.1
(engineering probe only — never driver test inputs), once per core count:

    SPARK_GRAFT_CPUS=32 python scripts/sf1_spot.py
    SPARK_GRAFT_CPUS=8  python scripts/sf1_spot.py

Each query runs one untimed warm-up + one timed noop-sink execution
(N=1 — the rows are tens of seconds at this scale; run-to-run noise is
small relative to the 4x core-count signal). Results go to stdout and
SCALE.md by hand.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from adventureworkslakehousepoc_spark.session import get_spark  # noqa: E402

SPOT = [
    "q1_pricing_summary",
    "ccnet_perplexity_buckets",
    "dedup_prefix_filter_jaccard",
    "minhash_estimate_error",
    "kmv_source_overlap",
]


def main() -> None:
    from scripts import scale_smoke
    from scripts.scale_smoke import build

    names = sys.argv[1].split(",") if len(sys.argv) > 1 else SPOT
    # AWLH_SF1_COPIES > 10 probes a bigger multiple (30x ~ sf3) — the text
    # rows stay overhead-bound at 10x on 32 cores
    copies = int(os.environ.get("AWLH_SF1_COPIES", "10"))
    scale_smoke.DST = DST = f"/tmp/awlh_scale/x{copies}"
    spark = get_spark(
        app_name="awlh-sf1-spot",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    if not os.path.isdir(DST):
        t0 = time.perf_counter()
        build(spark, copies)
        print(f"built {DST} in {time.perf_counter() - t0:.1f}s")

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "?")
    for name in names:
        spark.sparkContext.setJobDescription(f"sf1spot: {name}")
        def once() -> float:
            t0 = time.perf_counter()
            queries[name](spark, DST).write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0
        warm = once()
        timed = once()
        print(f"sf1spot cpus={cpus} {name}: warm={warm:.2f} timed={timed:.2f}",
              flush=True)


if __name__ == "__main__":
    main()
