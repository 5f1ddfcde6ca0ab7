"""Pure-numpy property tests for the Arrow kernel functions — no Spark
session needed, so hypothesis can sweep many cases cheaply."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from eth_dspa_2019_spark.operators.similarity import (
    SQ8_MAX,
    pair_qsim_batches,
    quantize_sq8_batches,
)


def _quantize(vecs: list[list[float]]) -> pd.DataFrame:
    pdf = pd.DataFrame(
        {
            "vec_id": list(range(len(vecs))),
            "embedding": [np.array(v, dtype=np.float32) for v in vecs],
        }
    )
    (out,) = list(quantize_sq8_batches()([pdf]))
    return out


finite_vec = st.lists(
    st.floats(
        min_value=-1e6,
        max_value=1e6,
        allow_nan=False,
        allow_infinity=False,
        width=32,
    ),
    min_size=2,
    max_size=16,
)


@settings(max_examples=200, deadline=None)
@given(st.lists(finite_vec, min_size=1, max_size=8).filter(
    lambda vs: len({len(v) for v in vs}) == 1
))
def test_sq8_reconstruction_error_bounded(vecs):
    """|x - q·s| <= s/2 with s = max|x|/127: round-half-up quantization can
    never err by more than half a step, and codes stay in [-127, 127]."""
    out = _quantize(vecs)
    for v, q, qn2 in zip(vecs, out["qvec"], out["qn2"]):
        x = np.array(v, dtype=np.float32).astype(np.float64)
        q = np.asarray(q, dtype=np.int64)
        assert q.min() >= -SQ8_MAX and q.max() <= SQ8_MAX
        assert int((q * q).sum()) == int(qn2)
        mx = np.abs(x).max()
        if mx == 0.0:
            assert not q.any()
            continue
        s = mx / SQ8_MAX
        assert np.all(np.abs(x - q * s) <= s / 2 + 1e-12 * mx)


@settings(max_examples=100, deadline=None)
@given(st.lists(finite_vec, min_size=2, max_size=6).filter(
    lambda vs: len({len(v) for v in vs}) == 1
))
def test_sq8_quantized_cosine_tracks_exact(vecs):
    """Quantized cosine must stay within the SQ8 error envelope of exact
    cosine (loose analytic bound ~ 2·dim/127 for unit-normalized error)."""
    out = _quantize(vecs)
    qv = {i: np.asarray(q, dtype=np.int64) for i, q in zip(out["vec_id"], out["qvec"])}
    qn = {i: int(n) for i, n in zip(out["vec_id"], out["qn2"])}
    rows = []
    for a in range(len(vecs)):
        for b in range(a + 1, len(vecs)):
            rows.append((a, b))
    if not rows:
        return
    pdf = pd.DataFrame(
        {
            "query_id": [a for a, _ in rows],
            "vec_id": [b for _, b in rows],
            "q_qvec": [qv[a] for a, _ in rows],
            "c_qvec": [qv[b] for _, b in rows],
            "q_qn2": [qn[a] for a, _ in rows],
            "c_qn2": [qn[b] for _, b in rows],
        }
    )
    (sim,) = list(pair_qsim_batches()([pdf]))
    dim = len(vecs[0])
    for (a, b), q_sim in zip(rows, sim["q_sim"]):
        x = np.array(vecs[a], dtype=np.float32).astype(np.float64)
        y = np.array(vecs[b], dtype=np.float32).astype(np.float64)
        nx, ny = np.linalg.norm(x), np.linalg.norm(y)
        if nx == 0.0 or ny == 0.0:
            assert q_sim == 0.0
            continue
        exact = float(x @ y / (nx * ny))
        assert abs(q_sim - exact) <= 4.0 * dim / SQ8_MAX**2 + 6.0 / SQ8_MAX


def test_auto_band_bits_matches_sql_twin():
    """The shared banded-LSH sizing knob must land on the same R in both
    engines at every population — including exact powers of two, where a
    floating log2 would be one ULP from flipping ceil. The Python side is
    pure bit_length; this pins the DuckDB scalar twin to it."""
    import duckdb

    from eth_dspa_2019_spark.functions.hashing import (
        auto_band_bits,
        o_auto_band_bits,
    )

    con = duckdb.connect()
    probes = [1, 2, 15, 16, 17, 100, 127, 128, 129, 500, 1024, 1025,
              4096, 15000, 32768, 32769, 10**6, 10**9]
    for n in probes:
        sql = con.execute(
            f"SELECT {o_auto_band_bits(str(n))}"
        ).fetchone()[0]
        assert sql == auto_band_bits(n), (n, sql, auto_band_bits(n))
    # non-default clamp + load
    for n in probes:
        sql = con.execute(
            f"SELECT {o_auto_band_bits(str(n), lo=6, hi=17, load=1024)}"
        ).fetchone()[0]
        assert sql == auto_band_bits(n, lo=6, hi=17, load=1024), n
