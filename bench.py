"""Benchmark harness: runs the registered headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from eth_dspa_2019_spark.plans import all_queries
    from eth_dspa_2019_spark.session import get_spark

    spark = get_spark(app_name="bench")

    # Warm the JVM / codegen paths once so per-query numbers measure the
    # plan, not first-run JIT.
    warm = all_queries()["q1_pricing_summary"].spark(spark, sf_dir)
    warm.collect()

    timings: dict[str, float] = {}
    for name, spec in sorted(all_queries().items()):
        t0 = time.perf_counter()
        df = spec.spark(spark, sf_dir)
        df.collect()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
