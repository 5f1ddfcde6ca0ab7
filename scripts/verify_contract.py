"""Local mirror of the driver's correctness gate, runnable end-to-end:

    python scripts/verify_contract.py [sf_dir] [name-substring ...]

Optional name-substring args restrict the sweep to matching queries
(case-insensitive) for fast iteration on one family; exit status and
the unexpected-failure report work the same.

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
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[8]").getOrCreate()
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
    fails = []
    import time

    for name in sorted(qs):
        t0 = time.monotonic()
        try:
            compare(qs[name](spark, sf), os_[name], sf)
            status = "ok"
        except Exception as ex:  # pragma: no cover - diagnostic path
            status = f"FAIL {type(ex).__name__}: {str(ex)[:160]}"
            fails.append((name, status))
        dt = time.monotonic() - t0
        print(
            f"{'ok  ' if status == 'ok' else 'FAIL'} {name} ({dt:.1f}s)",
            flush=True,
        )
    print(f"==== {len(qs)} queries, {len(fails)} failures")
    for n, s in fails:
        print("FAIL:", n, s)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
