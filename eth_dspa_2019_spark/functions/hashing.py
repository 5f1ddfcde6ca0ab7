"""Deterministic 60-bit hashing shared by dedup / fingerprint / MinHash
operators.

``h64(expr)`` = first 15 hex digits of md5 as a BIGINT — chosen because the
identical value is computable in DuckDB (the correctness oracle):

    Spark : cast(conv(substring(md5(x), 1, 15), 16, 10) as bigint)
    DuckDB: cast(('0x' || substring(md5(x), 1, 15)) as bigint)

15 hex digits = 60 bits, always positive, no overflow games. MinHash
permutations use the classic universal-hash family
``(a_p·(h mod P) + b_p) mod P`` over the single base hash ``h = h64(x)``
with P = 2³¹−1: one md5 per value instead of one per (value, permutation) —
the md5→hex→conv chain is ~16× the cost of the integer ops — with
md5-derived (a_p, b_p) literals embedded identically in both engines.
All intermediates fit signed 64-bit: a_p < P and (h mod P) < P, so
a_p·(h mod P) + b_p < 2⁶².
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE31 = (1 << 31) - 1


def perm_coeffs(num_perm: int) -> list[tuple[int, int]]:
    """Deterministic (a_p, b_p) universal-hash coefficients, a_p ∈ [1,P−1],
    b_p ∈ [0,P−1], derived from md5 so Spark and the SQL oracle embed the
    same literals."""
    out = []
    for p in range(num_perm):
        da = int.from_bytes(
            hashlib.md5(f"minhash-a#{p}".encode()).digest()[:8], "big"
        )
        db = int.from_bytes(
            hashlib.md5(f"minhash-b#{p}".encode()).digest()[:8], "big"
        )
        out.append((1 + da % (MERSENNE31 - 1), db % MERSENNE31))
    return out


def auto_band_bits(n: int, lo: int = 4, hi: int = 12, load: int = 8) -> int:
    """The shared banded-LSH sizing knob: bits-per-band R =
    clamp(lo..hi, ⌈log₂(n/load)⌉) — the smallest R with load·2^R ≥ n, so
    expected bucket population tracks ``load`` as the key population n
    grows (collision mass ≈ bands·n²/2^R stays ~n·load). Computed in
    PURE INTEGERS (bit_length, no floating log2) so the DuckDB oracle's
    SQL twin — ``coalesce((SELECT min(r) FROM range(lo, hi+1) t(r) WHERE
    (load::BIGINT << r) >= n), hi)`` — lands on the same R at every n,
    including exact powers of two. ``load`` must be a power of two (the
    subtraction below is exact only then)."""
    if load & (load - 1):
        raise ValueError(f"load must be a power of two, got {load}")
    return min(hi, max(lo, (max(n, 2) - 1).bit_length() - load.bit_length() + 1))


def o_auto_band_bits(n_sql: str, lo: int = 4, hi: int = 12, load: int = 8) -> str:
    """DuckDB mirror of :func:`auto_band_bits` — a scalar subquery
    deriving the same knob from the data with integer comparisons only.
    ``n_sql`` is a scalar SQL expression for the key-population count."""
    return (
        f"coalesce((SELECT min(r) FROM range({lo}, {hi + 1}) t(r) "
        f"WHERE ({load}::BIGINT << r) >= ({n_sql})), {hi})"
    )


def h64(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def o_h64(expr: str) -> str:
    """DuckDB mirror of :func:`h64`."""
    return f"cast(('0x' || substring(md5({expr}), 1, 15)) as bigint)"
