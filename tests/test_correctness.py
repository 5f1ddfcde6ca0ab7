"""Every registered query with an oracle must hash-match DuckDB — the local
mirror of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from eth_dspa_2019_spark.plans import all_queries

from .oracle import compare

_SPECS = sorted(all_queries().items())


@pytest.mark.parametrize("name", [n for n, s in _SPECS if s.oracle])
def test_query_matches_oracle(name, spark, sf_dir):
    spec = all_queries()[name]
    compare(spec.spark(spark, sf_dir), spec.oracle, sf_dir)


@pytest.mark.parametrize("name", [n for n, s in _SPECS if not s.oracle])
def test_query_runs(name, spark, sf_dir):
    spec = all_queries()[name]
    rows = spec.spark(spark, sf_dir).collect()
    assert rows is not None


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert len(df.collect()) > 0
    assert set(e.oracle_sql()) <= set(e.queries())
