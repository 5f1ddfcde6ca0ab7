"""Local mirror of the driver's correctness gate, runnable end-to-end:

    python scripts/verify_contract.py [sf_dir] [name-substring ...]

Optional name-substring args restrict the sweep to matching queries
(case-insensitive) for fast iteration on one family; exit status and
the unexpected-failure report work the same.

Creates a VANILLA SparkSession (no engine configs — the driver won't have
them), runs `__spark_entry__.entry`, then every `queries()` entry against
its `oracle_sql()` in DuckDB with the 10 testdata views registered,
comparing (sorted columns, sorted repr-rows). Two known benign repr
artifacts (`activity_parse`, `events_asof_last_purchase`: pandas
timestamp-repr canonicalization) pass the driver's typed comparator
(tests/oracle.py) but not this cruder repr compare; they are listed so a
zero-exit run means "everything the driver checks is green".
"""

from __future__ import annotations

import sys

import duckdb

REPR_ARTIFACTS = {"activity_parse", "events_asof_last_purchase"}
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sys.path.insert(0, ".")
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[8]").getOrCreate()
    import __spark_entry__ as e

    assert len(e.entry(spark).collect()) > 0, "entry returned 0 rows"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf}/{t}.parquet')"
        )
    qs, os_ = e.queries(), e.oracle_sql()
    pats = [a.lower() for a in sys.argv[2:]]
    if pats:
        qs = {
            n: q
            for n, q in qs.items()
            if any(p in n.lower() for p in pats)
        }
    fails = []
    for name in sorted(qs):
        try:
            sdf = qs[name](spark, sf)
            cols = sorted(sdf.columns)
            srows = sorted(
                tuple(repr(r[c]) for c in cols) for r in sdf.collect()
            )
            odf = con.sql(os_[name]).df()
            assert sorted(odf.columns.tolist()) == cols, "schema mismatch"
            orows = sorted(
                tuple(repr(v) for v in row)
                for row in odf[cols].itertuples(index=False)
            )
            status = "ok" if srows == orows else "FAIL"
        except Exception as ex:  # pragma: no cover - diagnostic path
            status = f"ERR {type(ex).__name__}: {str(ex)[:120]}"
        if status != "ok" and name not in REPR_ARTIFACTS:
            fails.append((name, status))
        print(f"{status:4s} {name}", flush=True)
    print(f"==== {len(qs)} queries, {len(fails)} unexpected failures")
    for n, s in fails:
        print("FAIL:", n, s)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
