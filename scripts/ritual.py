#!/usr/bin/env python
"""End-of-round ritual, as ONE script (VERDICT r9 #6): freeze the
registry, then regenerate/verify every per-round artifact against that
single frozen count, so a late registration can never ship half-covered
(the r9 `token_budget_allocation` gap: registered after the ritual
sweep, so BENCH_FULL_r9 had 168 queries vs registry 169).

    python scripts/ritual.py R            # e.g. 10 → BENCH_FULL_r10.json

Steps (each in a fresh subprocess so sweep stays vanilla-session):
  1. freeze: N = len(registry)
  2. scripts/gen_catalog.py → CATALOG.md; assert its count == N
  3. full contract sweep at sf0.01 (vanilla local[8], typed comparator,
     zero whitelist); assert swept == N and failures == 0
  4. bench.py at sf0.1 → BENCH_FULL_r{R}.json; assert benched == N
  5. print the COVERAGE.md "Full-registry sweep log" row to paste

Exit 0 only if every count equals the frozen N and the sweep is clean.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd: list[str], **env: str) -> str:
    e = dict(os.environ, **env)
    p = subprocess.run(
        cmd, cwd=REPO, env=e, text=True,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    if p.returncode != 0:
        sys.stdout.write(p.stdout[-4000:])
        raise SystemExit(f"ritual step failed: {' '.join(cmd)}")
    return p.stdout


def main() -> int:
    rnd = int(sys.argv[1])
    sys.path.insert(0, REPO)
    from eth_dspa_2019_spark.plans import all_queries

    n = len(all_queries())
    print(f"[ritual] frozen registry count: {n}")

    run([sys.executable, "scripts/gen_catalog.py"])
    with open(f"{REPO}/CATALOG.md") as f:
        head = f.readline()
    m = re.search(r"the (\d+)-query registry", head)
    assert m and int(m.group(1)) == n, f"CATALOG.md count {head!r} != {n}"
    print(f"[ritual] CATALOG.md regenerated at {n}")

    out = run([sys.executable, "scripts/verify_contract.py",
               "/root/testdata/sf0.01"])
    m = re.search(r"==== (\d+) queries, (\d+) failures", out)
    assert m, "sweep produced no summary line"
    swept, fails = int(m.group(1)), int(m.group(2))
    assert swept == n, f"sweep covered {swept} != frozen {n}"
    assert fails == 0, f"sweep has {fails} failures:\n{out[-2000:]}"
    print(f"[ritual] sweep {swept}/{swept} green at sf0.01")

    # Idle-box guard (VERDICT r10 #6): BENCH_FULL_r10 ran concurrently
    # with the pytest suite and drifted +7%; a contended run must never
    # silently become the round's record. Wait for the 1-min load to
    # drop below the threshold (default 4.0 on the 32-CPU box), then
    # stamp the observed load into the JSON either way.
    import time

    load_cap = float(os.environ.get("SPARK_GRAFT_BENCH_LOAD_CAP", "4.0"))
    deadline = time.time() + float(
        os.environ.get("SPARK_GRAFT_BENCH_LOAD_WAIT_S", "600")
    )
    while os.getloadavg()[0] > load_cap and time.time() < deadline:
        print(f"[ritual] load {os.getloadavg()[0]:.1f} > {load_cap}; "
              "waiting for an idle box before the bench step")
        time.sleep(30)
    load_at_bench = os.getloadavg()[0]
    if load_at_bench > load_cap:
        print(f"[ritual] WARNING: benching under load {load_at_bench:.1f}"
              " — figures will be annotated as contended")

    bench_path = f"{REPO}/BENCH_FULL_r{rnd}.json"
    run([sys.executable, "bench.py"], SPARK_GRAFT_BENCH_FULL=bench_path,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1")
    with open(bench_path) as f:
        full = json.load(f)
    full["loadavg_1m_at_start"] = round(load_at_bench, 2)
    full["contended"] = load_at_bench > load_cap
    with open(bench_path, "w") as f:
        json.dump(full, f)
    benched = len(full["queries"])
    assert benched == n, f"BENCH_FULL has {benched} != frozen {n}"
    print(f"[ritual] BENCH_FULL_r{rnd}.json: {benched} queries, "
          f"total {full['value']} s, core13 {full['core13_seconds']} s")

    print("\n[ritual] COVERAGE.md sweep-log row to paste:")
    print(f"| r{rnd} | {n} | {n}/{n} green at sf0.01 | "
          f"bench total {full['value']} s / core13 "
          f"{full['core13_seconds']} s (BENCH_FULL_r{rnd}.json) |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
