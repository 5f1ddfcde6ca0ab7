"""100x scale probe (VERDICT r8 #4): the five most expensive registered
queries run at sf0.1, ~10x, and ~100x (10M events / 500k docs / 200k
vectors, scripts/gen_scale.py) — one more decade past the r6 10x table.
Per-decade wall-clock ratios expose superlinear growth the 10x probe
could hide; knob-derived queries (grid correlation band width, kmeans
stride, IVF planes/probes) must absorb the decade by DESIGN, not by
retuning. Writes /tmp/scale_probe100.json; summarized in SCALE.md."""
import json
import os
import sys
import time

# local[32] shares ONE heap across all 32 executor threads; the engine's
# 8g default is 250 MB/core — an order below any production executor
# (4-8 GB/core typical). At 100x that OOMs the shared heap mid-shuffle,
# so size the harness like a (small) real executor: 48g = 1.5 GB/core.
os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")

sys.path.insert(0, "/root/repo")
from eth_dspa_2019_spark.session import get_spark
from eth_dspa_2019_spark.plans import all_queries, clear_plan_caches

DIRS = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("10x", "/tmp/sf1synth"),
    ("100x", "/tmp/sf100synth"),
]
QUERIES = [
    "task3_anomalies",
    "prefix_filter_jaccard",
    "task2_recommendations",
    "grid_correlation_pruned_auto",
    "vector_pipeline_e2e",
]

spark = get_spark(app_name="probe100")
spark.sparkContext.setLogLevel("ERROR")
qs = all_queries()
# warm the JVM once
qs["task1_comment_counts"].spark(spark, DIRS[0][1]).collect()

out = {}
for name in QUERIES:
    row = {}
    for label, d in DIRS:
        clear_plan_caches(spark)
        t0 = time.time()
        try:
            n = len(qs[name].spark(spark, d).collect())
            row[label] = round(time.time() - t0, 2)
            row[f"{label}_rows"] = n
        except Exception as ex:
            row[label] = f"ERR {type(ex).__name__}: {str(ex)[:100]}"
        print(name, label, row.get(label), flush=True)
    out[name] = row
print("JSON:", json.dumps(out))
with open("/tmp/scale_probe100.json", "w") as f:
    json.dump(out, f, indent=1)
