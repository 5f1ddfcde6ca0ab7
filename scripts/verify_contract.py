"""Local mirror of the driver's correctness gate, runnable end-to-end:

    python scripts/verify_contract.py [sf_dir] [name-substring ...]

Optional name-substring args restrict the sweep to matching queries
(case-insensitive) for fast iteration on one family; exit status and
the unexpected-failure report work the same.

Set SPARK_GRAFT_SHARD="i/n" (0-based) to sweep every n-th query of the
sorted registry — lets the 10x certification sweep run as 4 parallel
shards on the 32-CPU box while each shard keeps the vanilla local[8]
session the driver uses.

Creates a VANILLA SparkSession (no engine configs — the driver won't have
them), runs `__spark_entry__.entry`, then every `queries()` entry against
its `oracle_sql()` in DuckDB using the TYPED comparator the test suite
uses (tests/oracle.py: schema + canonical dtype + type-tagged values,
order-insensitive) — the same comparison discipline as the driver's
value hash, with no repr-artifact whitelist: zero failures means green.
"""

from __future__ import annotations

import sys


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sys.path.insert(0, ".")
    import os

    from pyspark.sql import SparkSession

    b = SparkSession.builder.master("local[8]")
    # The sf0.01 gate mirror stays vanilla (1g heap, like the driver);
    # the 10x certification sweep needs a bigger driver heap — values,
    # not session shape, are what is being certified at that scale.
    mem = os.environ.get("SPARK_GRAFT_SWEEP_MEM")
    if mem:
        b = b.config("spark.driver.memory", mem)
    spark = b.getOrCreate()
    import __spark_entry__ as e
    from tests.oracle import compare

    assert len(e.entry(spark).collect()) > 0, "entry returned 0 rows"
    qs, os_ = e.queries(), e.oracle_sql()
    pats = [a.lower() for a in sys.argv[2:]]
    if pats:
        qs = {
            n: q
            for n, q in qs.items()
            if any(p in n.lower() for p in pats)
        }
    shard = os.environ.get("SPARK_GRAFT_SHARD")
    names = sorted(qs)
    if shard:
        i, n = (int(x) for x in shard.split("/"))
        names = names[i::n]
    # Documented wall-clock exclusions (comma-separated names) and a
    # per-query watchdog for scale sweeps: on timeout, cancel the Spark
    # jobs and interrupt the DuckDB oracle, record the query as a
    # TIMEOUT failure, and move on instead of wedging the shard.
    skip = {
        s for s in os.environ.get("SPARK_GRAFT_SKIP", "").split(",") if s
    }
    timeout_s = float(os.environ.get("SPARK_GRAFT_QUERY_TIMEOUT_S", "0"))
    fails = []
    zombies: list = []
    import threading
    import time

    from tests.oracle import interrupt_current_oracle

    def run_one(name: str) -> str:
        compare(qs[name](spark, sf), os_[name], sf)
        return "ok"

    for name in names:
        if name in skip:
            print(f"skip {name} (SPARK_GRAFT_SKIP)", flush=True)
            continue
        t0 = time.monotonic()
        if timeout_s:
            box: dict[str, str] = {}

            def worker(n=name):
                try:
                    box["status"] = run_one(n)
                except Exception as ex:
                    box["status"] = (
                        f"FAIL {type(ex).__name__}: {str(ex)[:160]}"
                    )

            th = threading.Thread(target=worker, daemon=True)
            th.start()
            th.join(timeout_s)
            if th.is_alive():
                spark.sparkContext.cancelAllJobs()
                # Interrupt THIS worker's oracle connection (per-thread
                # slot in tests/oracle.py — r10 ADVICE: a zombie that
                # later re-connects must not hijack the interrupt target).
                interrupt_current_oracle(th.ident)
                th.join(120)
                if th.is_alive():
                    # The worker survived the grace join: it keeps running
                    # concurrently with later queries, so its Spark jobs
                    # may be killed by an unrelated cancelAllJobs. Record
                    # it so the log explains any such casualty.
                    zombies.append(name)
                    print(f"ZOMBIE worker for {name} still running — "
                          "later cancelAllJobs may hit its jobs",
                          flush=True)
                status = f"FAIL Timeout: > {timeout_s:.0f}s (cancelled)"
            else:
                status = box.get("status", "FAIL worker died")
        else:
            try:
                status = run_one(name)
            except Exception as ex:  # pragma: no cover - diagnostic path
                status = f"FAIL {type(ex).__name__}: {str(ex)[:160]}"
        if status != "ok":
            fails.append((name, status))
        dt = time.monotonic() - t0
        print(
            f"{'ok  ' if status == 'ok' else 'FAIL'} {name} ({dt:.1f}s)",
            flush=True,
        )
    if zombies:
        print(f"==== zombie workers (timed out, never died): {zombies}")
    print(f"==== {len(names)} queries, {len(fails)} failures")
    for n, s in fails:
        print("FAIL:", n, s)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
