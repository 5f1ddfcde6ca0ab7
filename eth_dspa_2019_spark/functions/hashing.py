"""Deterministic 60-bit hashing shared by dedup / fingerprint / MinHash
operators.

``h64(expr)`` = first 15 hex digits of md5 as a BIGINT — chosen because the
identical value is computable in DuckDB (the correctness oracle):

    Spark : cast(conv(substring(md5(x), 1, 15), 16, 10) as bigint)
    DuckDB: cast(('0x' || substring(md5(x), 1, 15)) as bigint)

15 hex digits = 60 bits, always positive, no overflow games. MinHash
permutations are derived hashes ``h64(x || '#' || i)`` rather than the
classic ``(a*x+b) mod p`` family — one primitive, same collision behavior.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def h64(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def h64_perm(col: Column | str, perm: int) -> Column:
    """The ``perm``-th independent hash of a value (MinHash permutation)."""
    c = F.col(col) if isinstance(col, str) else col
    return h64(F.concat(c, F.lit(f"#{perm}")))


def o_h64(expr: str) -> str:
    """DuckDB mirror of :func:`h64`."""
    return f"cast(('0x' || substring(md5({expr}), 1, 15)) as bigint)"


def o_h64_perm(expr: str, perm: int) -> str:
    return o_h64(f"{expr} || '#{perm}'")
