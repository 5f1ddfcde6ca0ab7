"""Benchmark harness: runs the registered headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Output contract (verdict r7 #1): the LAST stdout line is ONE compact JSON
summary object (metric, value, core13_seconds, social_*, n_queries, sf —
no per-query dict) guaranteed to fit in the driver's 2000-char tail
capture. The full per-query timing dict is written to
$SPARK_GRAFT_BENCH_FULL (default BENCH_FULL.json next to this file) and
also printed on an EARLIER stdout line for humans.
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
    # plan, not first-run JIT; also touch every testdata table once so no
    # single query absorbs the session's first-parquet-footer cost.
    from eth_dspa_2019_spark.io.readers import TESTDATA_TABLES, load_table

    for t in TESTDATA_TABLES:
        load_table(spark, sf_dir, t).count()
    warm = all_queries()["q1_pricing_summary"].spark(spark, sf_dir)
    warm.toPandas()  # also initializes the Arrow collect path
    # spin up the Arrow/Python worker pool so the first mapInPandas query
    # doesn't absorb per-core interpreter startup
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.range(10_000).repartition(cpus).mapInPandas(
        lambda it: it, "id long"
    ).count()

    from eth_dspa_2019_spark.plans import clear_plan_caches

    # dev loop: SPARK_GRAFT_BENCH_ONLY="fuzzy,kmeans" times only queries
    # whose names contain one of the comma-separated substrings; the
    # driver sets nothing and gets the full run
    only = [
        p.strip().lower()
        for p in os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").split(",")
        if p.strip()
    ]
    specs = sorted(all_queries().items())
    if only:
        specs = [
            (n, s)
            for n, s in specs
            if any(p in n.lower() for p in only)
        ]
        # ADVICE r7: make a filtered run impossible to mistake for a full
        # one — loud stderr warning + a "filtered" tag in the output JSON.
        print(
            f"WARNING: SPARK_GRAFT_BENCH_ONLY={only!r} active — timing "
            f"only {len(specs)} queries; this is a PARTIAL bench run",
            file=sys.stderr,
        )

    timings: dict[str, float] = {}
    for name, spec in specs:
        # Cold-cache discipline: each query pays for its own materializations
        # (parse/resolve caches, LSH pair checkpoints) — numbers measure the
        # plan, not block-manager eviction across 68 accumulated queries.
        clear_plan_caches(spark)
        t0 = time.perf_counter()
        df = spec.spark(spark, sf_dir)
        # Arrow-vectorized materialization: every result row still lands in
        # the driver process (same contract as collect()), without paying
        # row-at-a-time Python deserialization — which otherwise dominates
        # the large-output queries (721k-row task1 outputs spend ~2.5 s in
        # collect() vs ~0.8 s via Arrow at sf0.1).
        try:
            df.toPandas()
        except Exception:
            df.collect()
        timings[name] = round(time.perf_counter() - t0, 4)
        # r12 (verdict r11 #2, additive): one compact machine-parseable
        # line per query so per-query timings survive even when the full
        # dict overflows the driver's stdout tail capture. The last-line
        # summary contract below is unchanged.
        print(json.dumps({"q": name, "sec": timings[name]}), flush=True)

    total = round(sum(timings.values()), 4)

    # Verdict r4 #8: the social family (parse→resolve→task1/2/3/cleaning)
    # shares one pipeline prefix that a real user materializes ONCE. The
    # cold loop above charges every member its own parse+resolve, which is
    # honest per-plan but double-counts the shared stage ~15×. Record a
    # second, pipeline-shared number: clear caches once, then run the
    # family in registration order letting the parse/resolve caches carry.
    social = [
        q
        for q in (
            "activity_parse reply_post_resolution task1_comment_counts "
            "task1_reply_counts task1_unique_users task2_static_similarity "
            "task2_activity_counts task2_dynamic_similarity "
            "task2_recommendations task3_user_features task3_anomalies "
            "clean_likes_valid clean_comment_tree repair_timestamps "
            "cleaned_invariants post_thread_children"
        ).split()
        if q in timings
    ]
    clear_plan_caches(spark)
    t0 = time.perf_counter()
    for name in social:
        df = all_queries()[name].spark(spark, sf_dir)
        try:
            df.toPandas()
        except Exception:
            df.collect()
    social_shared = round(time.perf_counter() - t0, 4)
    social_cold = round(sum(timings[q] for q in social), 4)
    # The round-1 baseline (BENCH_r01.json, 14.36 s) covered these 13
    # queries; report their subtotal so rounds stay comparable while the
    # registry grows.
    core13 = (
        "q1_pricing_summary q3_shipping_priority q5_local_supplier_volume "
        "q6_forecast_revenue top3_customers_per_nation "
        "customers_without_urgent_orders order_priority_counts "
        "tumbling_counts_30m sliding_counts_12h_30m unique_users_12h_1h "
        "session_windows_30m_gap running_user_totals windowed_value_stats"
    ).split()
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    summary = {
        "metric": "total_query_seconds",
        "value": total,
        "unit": "sec",
        "n_queries": len(timings),
        "core13_seconds": round(
            sum(timings.get(q, 0.0) for q in core13), 4
        ),
        "social_cold_seconds": social_cold,
        "social_shared_seconds": social_shared,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if only:
        summary["filtered"] = only
    # Full per-query detail: committed file + an early stdout line. The
    # driver tail-captures stdout, so the dict must NOT be on the last line
    # (it overflowed the 2000-char tail from round 3 on → "parsed": null).
    full = dict(summary, queries=timings)
    full_path = os.environ.get(
        "SPARK_GRAFT_BENCH_FULL",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_FULL.json"),
    )
    with open(full_path, "w") as f:
        json.dump(full, f, indent=1, sort_keys=True)
    # r12 (verdict r11 #2, additive): ALSO write a core-count-stamped copy
    # so a multi-config driver run (32c then 8c) no longer clobbers the
    # 32-core per-query dict — both configs stay readable after the run.
    stamped = os.path.join(
        os.path.dirname(full_path) or ".",
        f"BENCH_FULL.{cpus}c.json",
    )
    if os.path.abspath(stamped) != os.path.abspath(full_path):
        with open(stamped, "w") as f:
            json.dump(full, f, indent=1, sort_keys=True)
    print(json.dumps(full))
    spark.stop()
    # LAST line = compact summary only; must stay well under 2000 chars.
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
