"""Dump .explain("formatted") for named queries to plans/<tag>/<name>_<suffix>.txt.

Usage: python scripts/dump_plans.py <tag> <suffix> <query> [<query> ...]

The judge reads these files to check plan claims (Exchange counts, join
strategies, PushedFilters) against the code; capture BEFORE touching a
query and AFTER the optimization lands.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout


def main() -> int:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from eth_dspa_2019_spark.plans import all_queries, clear_plan_caches
    from eth_dspa_2019_spark.session import get_spark

    spark = get_spark(app_name="dump_plans")
    qs = all_queries()
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        clear_plan_caches(spark)
        df = qs[name].spark(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path} ({buf.getvalue().count('Exchange')} Exchange mentions)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
