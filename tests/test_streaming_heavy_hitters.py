"""SpaceSaving streaming heavy hitters: exact when the key domain fits,
bounded overestimates + guaranteed coverage when it doesn't, k-row state,
exactly-once across a crash-restart."""

from __future__ import annotations

from pyspark.sql import functions as F

from eth_dspa_2019_spark.io.readers import load_table
from eth_dspa_2019_spark.streaming.heavy_hitters import (
    StreamingHeavyHitters,
    heavy_hitters_stream,
)


def _ts_chunks(df, n, col="ts"):
    lo, hi = df.agg(F.min(col), F.max(col)).collect()[0]
    cuts = [lo.timestamp() + (hi.timestamp() - lo.timestamp()) * i / n for i in range(n)]
    cuts.append(hi.timestamp() + 1)
    return [
        df.filter(
            (F.col(col).cast("double") >= a) & (F.col(col).cast("double") < b)
        )
        for a, b in zip(cuts[:-1], cuts[1:])
    ]


def test_exact_when_domain_fits_any_split(spark, sf_dir):
    """distinct keys <= k: the summary IS the exact count table for any
    micro-batch split (m stays 0, nothing is ever evicted)."""
    ev = load_table(spark, sf_dir, "events").select(
        (F.col("user_id") % 7).alias("key"), "ts"
    )
    exact = {
        r.key: r.c
        for r in ev.groupBy("key").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    for n_batches in (1, 4):
        hh = StreamingHeavyHitters(spark, k=16)
        for i, chunk in enumerate(_ts_chunks(ev, n_batches)):
            hh.begin_batch(i)
            hh.process_batch(chunk)
            hh.commit(i)
        got = {r.key: (r.cnt, r.err) for r in hh.counters.collect()}
        assert {k: c for k, (c, _) in got.items()} == exact
        assert all(e == 0 for _, e in got.values())


def test_bounds_and_coverage_on_large_domain(spark, sf_dir):
    """Key domain >> k: for every kept key, true <= cnt and
    cnt - err <= true; every key with true > N/k is kept; state <= k."""
    k = 32
    ev = load_table(spark, sf_dir, "events").select(
        # skew the domain so heavy keys exist: square the tail onto a head
        F.when(F.col("user_id") % 3 == 0, F.col("user_id") % 5)
        .otherwise(F.col("user_id"))
        .alias("key"),
        "ts",
    )
    true = {
        r.key: r.c
        for r in ev.groupBy("key").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    n_total = sum(true.values())
    hh = StreamingHeavyHitters(spark, k=k)
    for i, chunk in enumerate(_ts_chunks(ev, 5)):
        hh.begin_batch(i)
        out = hh.process_batch(chunk)
        assert out.count() <= k
        hh.commit(i)
    kept = {r.key: (r.cnt, r.err) for r in hh.counters.collect()}
    assert len(kept) <= k
    for key, (cnt, err) in kept.items():
        t = true.get(key, 0)
        assert t <= cnt, (key, t, cnt)
        assert cnt - err <= t, (key, cnt, err, t)
    for key, t in true.items():
        if t > n_total / k:
            assert key in kept, (key, t, n_total / k)


def test_crash_restart_exactly_once(spark, sf_dir, tmp_path):
    """Kill after batch 1's state commit, restart on the same dirs: the
    final summary equals the uninterrupted run's (the replayed batch is
    detected and the k-row full table rolls back one version first)."""
    ev = load_table(spark, sf_dir, "events").select(
        (F.col("user_id") % 100).alias("key"), "ts"
    )
    cdir = tmp_path / "chunks"
    for i, chunk in enumerate(_ts_chunks(ev, 4)):
        chunk.select("key").coalesce(1).write.mode("overwrite").parquet(
            str(cdir / f"chunk{i}")
        )
    schema = "key long"
    glob_ = f"{cdir}/chunk*"

    # uninterrupted reference run (no state dir)
    ref = heavy_hitters_stream(
        spark, glob_, schema, str(tmp_path / "ck_ref"), k=16
    )
    ref_rows = sorted(tuple(r) for r in ref.counters.collect())

    ck, sd = str(tmp_path / "ck"), str(tmp_path / "state")
    try:
        heavy_hitters_stream(
            spark, glob_, schema, ck, k=16, state_dir=sd, _fail_at_batch=1
        )
        raise AssertionError("injected crash did not fire")
    except Exception as ex:
        assert "injected crash" in str(ex)
    hh = heavy_hitters_stream(spark, glob_, schema, ck, k=16, state_dir=sd)
    assert sorted(tuple(r) for r in hh.counters.collect()) == ref_rows


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.data(),
    keys=st.lists(
        st.integers(min_value=0, max_value=30), min_size=1, max_size=120
    ),
)
def test_property_bounds_hold_for_any_stream_and_split(spark, data, keys):
    """Model-based property: for ANY key stream and ANY micro-batch
    split, every SpaceSaving invariant holds against the exact Python
    model — true <= cnt, cnt - err <= true, coverage of keys with
    true > N/k, and state never exceeds k rows."""
    import collections

    k = 8
    n_batches = data.draw(st.integers(min_value=1, max_value=4))
    cuts = sorted(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=len(keys)),
                min_size=n_batches - 1,
                max_size=n_batches - 1,
            )
        )
    )
    bounds = [0] + cuts + [len(keys)]
    true = collections.Counter(keys)
    n_total = len(keys)

    hh = StreamingHeavyHitters(spark, k=k)
    for i, (lo, hi) in enumerate(zip(bounds[:-1], bounds[1:])):
        chunk = keys[lo:hi]
        hh.begin_batch(i)
        out = hh.process_batch(
            spark.createDataFrame(
                [(x,) for x in chunk] or [(None,)], "key long"
            ).filter(F.col("key").isNotNull())
        )
        assert out.count() <= k
        hh.commit(i)

    kept = {r.key: (r.cnt, r.err) for r in hh.counters.collect()}
    assert len(kept) <= k
    for key, (cnt, err) in kept.items():
        t = true.get(key, 0)
        assert t <= cnt, (key, t, cnt, keys)
        assert cnt - err <= t, (key, cnt, err, t, keys)
    for key, t in true.items():
        if t > n_total / k:
            assert key in kept, (key, t, n_total, k, keys)
