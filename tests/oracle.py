"""Local mirror of the driver's DuckDB-oracle comparison.

Mimics the contract described in the driver stub: row-count + schema
(column-name set) + order-insensitive value comparison with columns sorted by
name. Unlike a plain Python ``==`` compare (where ``123.0 == 123`` is True),
this mirror is TYPE-FAITHFUL: it asserts a canonical per-column dtype match
between the Spark result and the DuckDB result (fetched as Arrow, so a
DuckDB window/aggregate ``sum(BIGINT)`` that silently widens to HUGEINT —
arrow decimal128(38,0) — is caught), and it tags every value with its Python
type class before comparing, so an int column and a float column can never
hash-alias. This is exactly the failure mode that made ``doc_pack_chunks``
driver-red in round 4 while the local mirror stayed green.
"""

from __future__ import annotations

import math
import os
from typing import Any

import duckdb

from eth_dspa_2019_spark.io.readers import TESTDATA_TABLES


# Per-thread oracle connections, so a sweep watchdog can interrupt a
# runaway oracle from another thread (scripts/verify_contract.py).
# Keyed by thread ident (r10 ADVICE): a timed-out worker that survives
# the grace join keeps running, and when IT later reaches duck_connect
# a single "current" slot would be overwritten — a later watchdog
# interrupt would then target the zombie's connection instead of the
# active query's. Per-thread slots make the interrupt precise.
_CURRENT: dict[int, Any] = {}


def interrupt_current_oracle(thread_ident: int | None = None) -> None:
    """Interrupt the oracle connection opened by ``thread_ident`` (or by
    the calling thread when None)."""
    import threading

    key = thread_ident if thread_ident is not None else threading.get_ident()
    con = _CURRENT.get(key)
    if con is not None:
        try:
            con.interrupt()
        except Exception:
            pass


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # Resource guards for scale sweeps: an unbounded DuckDB oracle at 10x
    # can spill its temp storage until the DISK fills (observed: the
    # paraphrase oracle took the whole box down mid-sweep). Cap memory and
    # temp so a runaway oracle fails loudly instead.
    mem = os.environ.get("SPARK_GRAFT_DUCK_MEM")
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
    tmp = os.environ.get("SPARK_GRAFT_DUCK_TMP")
    if tmp:
        # per-process subdir: parallel sweep shards sharing one temp dir
        # remove each other's spill files (DuckDB then aborts the whole
        # process from its destructor)
        tmp = f"{tmp}/{os.getpid()}"
        os.makedirs(tmp, exist_ok=True)
        con.execute(f"SET temp_directory='{tmp}'")
        cap = os.environ.get("SPARK_GRAFT_DUCK_TMP_CAP", "40GiB")
        con.execute(f"SET max_temp_directory_size='{cap}'")
    import threading

    _CURRENT[threading.get_ident()] = con
    for t in TESTDATA_TABLES:
        # Driver testdata ships single parquet FILES; the synthetic scale
        # dirs (scripts/gen_scale.py) are Spark-written DIRECTORIES of
        # part files — glob those so the 10x certification sweep can run
        # the same oracles over them.
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


# ---------------------------------------------------------------------------
# Canonical dtype tags.  Integer widths <= 64 bits collapse to one class
# (Python-side values are identical ints), but anything WIDER than int64 —
# DuckDB HUGEINT / decimal128(38,0), the silent sum() widening — is a
# distinct class, because pandas/arrow pipelines represent it differently
# and the driver's value hash diverges even when the numbers are equal.


def _canon_spark_type(dt: str) -> str:
    dt = dt.lower()
    if dt in ("tinyint", "smallint", "int", "integer", "bigint", "long"):
        return "int"
    if dt in ("float", "real"):
        return "float32"
    if dt == "double":
        return "float64"
    if dt == "boolean":
        return "bool"
    if dt == "string":
        return "str"
    if dt.startswith("decimal("):
        prec, scale = dt[len("decimal(") : -1].split(",")
        if int(scale) == 0:
            return "int" if int(prec) <= 18 else "bigdecimal"
        return f"decimal(.,{scale})"
    if dt.startswith("array<"):
        return f"list<{_canon_spark_type(dt[6:-1])}>"
    if dt.startswith("timestamp"):
        return "timestamp"
    return dt


def _canon_arrow_type(t: Any) -> str:
    import pyarrow as pa

    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_integer(t):  # int8..int64, uint8..uint32 all fit int64
        if t.bit_width > 64 or (t.bit_width == 64 and not pa.types.is_signed_integer(t)):
            return "bigdecimal"
        return "int"
    if pa.types.is_float32(t):
        return "float32"
    if pa.types.is_float64(t):
        return "float64"
    if pa.types.is_decimal(t):
        if t.scale == 0:
            return "int" if t.precision <= 18 else "bigdecimal"
        return f"decimal(.,{t.scale})"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{_canon_arrow_type(t.value_type)}>"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    return str(t)


def _type_tag(v: Any) -> str:
    if v is None:
        return "_"
    if isinstance(v, bool):
        return "b"
    if isinstance(v, int):
        return "i"
    if isinstance(v, float):
        return "f"
    if isinstance(v, str):
        return "s"
    if isinstance(v, tuple):
        return "t"
    return type(v).__name__


def _norm(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        return float(v)
    if isinstance(v, int):
        return int(v)
    if hasattr(v, "item"):  # numpy scalar
        return _norm(v.item())
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _canon_rows(columns: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return out


def compare(spark_df, oracle_sql: str, sf_dir: str) -> None:
    """Assert spark result == duckdb oracle (order-insensitive, type-faithful)."""
    spark_cols = list(spark_df.columns)
    spark_types = {
        f.name: _canon_spark_type(f.dataType.simpleString())
        for f in spark_df.schema.fields
    }
    spark_rows = [tuple(r) for r in spark_df.collect()]

    con = duck_connect(sf_dir)
    try:
        tbl = con.execute(oracle_sql).fetch_arrow_table()
    finally:
        con.close()
        import threading

        _CURRENT.pop(threading.get_ident(), None)
    duck_cols = list(tbl.column_names)
    duck_types = {
        name: _canon_arrow_type(tbl.schema.field(i).type)
        for i, name in enumerate(duck_cols)
    }
    duck_rows = [
        tuple(d[c] for c in duck_cols) for d in tbl.to_pylist()
    ]

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"schema mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    type_mismatch = {
        c: (spark_types[c], duck_types[c])
        for c in spark_cols
        if spark_types[c] != duck_types[c]
    }
    assert not type_mismatch, (
        f"dtype mismatch (spark, duck): {type_mismatch} — a DuckDB window/agg "
        f"sum() over BIGINT widens to HUGEINT; CAST it in the oracle SQL"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s = _canon_rows(spark_cols, spark_rows)
    d = _canon_rows(duck_cols, duck_rows)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s, d)) if not _rows_eq(a, b)
    ]
    assert not mismatches, f"value mismatch (first 5): {mismatches[:5]}"


def _rows_eq(a: tuple, b: tuple) -> bool:
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if _type_tag(x) != _type_tag(y):
            return False
        if isinstance(x, float) and isinstance(y, float):
            if math.isnan(x) and math.isnan(y):
                continue
            if x != y:
                return False
        elif isinstance(x, tuple) and isinstance(y, tuple):
            if not _rows_eq(x, y):
                return False
        elif x != y:
            return False
    return True
