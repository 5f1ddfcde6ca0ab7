"""Median-of-N cold-cache timings for selected queries — the round-11
noise protocol. This box shows multi-minute host-level slowdown bursts
(same code, same data: 3-10x inflation on whichever queries run inside a
burst, different queries each run — see OPTIMIZATION_r11.md "Inherited
state"). Single full-bench runs therefore cannot resolve <2x per-query
changes; every before/after claim in r11 uses the median of N>=3
cold-cache repetitions from this script, A/B'd in the same time window.

    python scripts/bench_median.py [N] name-substring...

Methodology matches bench.py exactly (same session factory, same
clear_plan_caches cold discipline, same toPandas materialization), so
medians here are comparable to per-query entries in BENCH_FULL files.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    reps = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 3
    pats = [a.lower() for a in sys.argv[2:]] if len(sys.argv) > 2 else []

    from eth_dspa_2019_spark.io.readers import TESTDATA_TABLES, load_table
    from eth_dspa_2019_spark.plans import all_queries, clear_plan_caches
    from eth_dspa_2019_spark.session import get_spark

    spark = get_spark(app_name="bench-median")
    for t in TESTDATA_TABLES:
        load_table(spark, sf_dir, t).count()
    all_queries()["q1_pricing_summary"].spark(spark, sf_dir).toPandas()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.range(10_000).repartition(cpus).mapInPandas(lambda it: it, "id long").count()

    specs = sorted(all_queries().items())
    if pats:
        specs = [(n, s) for n, s in specs if any(p in n.lower() for p in pats)]
    out: dict[str, dict] = {}
    for name, spec in specs:
        ts = []
        for _ in range(reps):
            clear_plan_caches(spark)
            spark.sparkContext.setJobDescription(name)
            t0 = time.perf_counter()
            df = spec.spark(spark, sf_dir)
            try:
                df.toPandas()
            except Exception:
                df.collect()
            ts.append(round(time.perf_counter() - t0, 4))
        out[name] = {"median": statistics.median(ts), "runs": ts}
        print(f"{statistics.median(ts):8.2f}s  {name}  {ts}", flush=True)
    path = os.environ.get("SPARK_GRAFT_BENCH_MEDIAN", "/tmp/BENCH_MEDIAN.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({n: v["median"] for n, v in sorted(out.items())}))
    spark.stop()


if __name__ == "__main__":
    main()
