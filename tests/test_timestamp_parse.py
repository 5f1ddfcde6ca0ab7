"""Timestamp-zoo parser edge cases (F1): all format variants of
`yyyy-MM-dd'T'HH:mm:ss[.S][S][S][X][X]` incl. the ``ZZ`` double suffix,
fraction truncation, day/year boundaries, leap day — vectorized against
Python-computed expectations (the reference's parser tests,
`SN/validation/TestJava.java:10-36`, generalized)."""

from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone

from pyspark.sql import functions as F

from eth_dspa_2019_spark.sources.activity import parse_creation_date


def _cases() -> list[tuple[str, int]]:
    """(raw string, expected epoch millis) pairs across the format zoo."""
    rng = random.Random(1347)
    bases = [
        datetime(2012, 2, 29, 23, 59, 59, 999999),  # leap day, end of day
        datetime(2023, 12, 31, 23, 59, 59, 1000),
        datetime(2024, 1, 1, 0, 0, 0, 0),
        datetime(1999, 6, 15, 12, 30, 45, 123456),
        datetime(9999, 12, 31, 23, 59, 59, 0),  # tombstone date
    ]
    for _ in range(60):
        bases.append(
            datetime(2020, 1, 1)
            + timedelta(
                seconds=rng.randrange(0, 10 * 365 * 86400),
                microseconds=rng.randrange(0, 1_000_000),
            )
        )
    out = []
    for dt in bases:
        epoch_us = int(dt.replace(tzinfo=timezone.utc).timestamp() * 1e6)
        epoch_us = int(
            (dt.replace(tzinfo=timezone.utc) - datetime(1970, 1, 1, tzinfo=timezone.utc))
            / timedelta(microseconds=1)
        )
        sec = dt.strftime("%Y-%m-%dT%H:%M:%S")
        frac = f"{dt.microsecond:06d}"
        for fmt, exp_ms in [
            (sec, epoch_us // 1_000_000 * 1000),
            (f"{sec}.{frac[:1]}", epoch_us // 100_000 * 100),
            (f"{sec}.{frac[:2]}Z", epoch_us // 10_000 * 10),
            (f"{sec}.{frac[:3]}Z", epoch_us // 1_000),
            (f"{sec}.{frac[:2]}ZZ", epoch_us // 10_000 * 10),
            (f"{sec}.{frac[:3]}ZZ", epoch_us // 1_000),
            (f"{sec}Z", epoch_us // 1_000_000 * 1000),
            (f"{sec}ZZ", epoch_us // 1_000_000 * 1000),
        ]:
            out.append((fmt, exp_ms))
    return out


def test_parse_creation_date_zoo(spark):
    cases = _cases()
    df = spark.createDataFrame(cases, "raw string, expected_ms long")
    got = df.select(
        "raw",
        "expected_ms",
        F.unix_millis(parse_creation_date(F.col("raw"))).alias("got_ms"),
    ).collect()
    bad = [(r["raw"], r["expected_ms"], r["got_ms"]) for r in got
           if r["got_ms"] != r["expected_ms"]]
    assert not bad, f"{len(bad)} mismatches, first 5: {bad[:5]}"


def test_parse_rejects_garbage(spark):
    rows = [("2024-13-01T00:00:00",), ("not-a-date",), ("2024-01-01 12:00:00",)]
    df = spark.createDataFrame(rows, "raw string")
    got = df.select(parse_creation_date(F.col("raw")).alias("ts")).collect()
    assert all(r["ts"] is None for r in got)
