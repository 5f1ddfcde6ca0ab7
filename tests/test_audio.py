"""WAV codec boundary: stdlib RIFF encoder/walker round-trip, malformed
container quarantine (decode errors become ok=false rows, not stage
failures), and the feature math vs the closed-form fixture spec."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from eth_dspa_2019_spark.operators.audio import (
    PCM_MAX,
    audio_features,
    decode_audio_meta,
    fixture_samples,
    synth_wav_column,
    wav_decode,
    wav_encode,
)


def test_wav_roundtrip_fixture():
    for doc_id in (0, 1, 2, 17, 499, 123_456):
        sr, v, _clips = fixture_samples(doc_id)
        got_sr, got = wav_decode(wav_encode(doc_id, sr, v))
        assert got_sr == sr
        assert np.array_equal(got, v)


def test_wav_byte_len_closed_form():
    # the meta oracle hard-codes byte_len = 60 + 2n; pin the encoder to it
    for doc_id in (0, 1, 5, 44):
        sr, v, _ = fixture_samples(doc_id)
        assert len(wav_encode(doc_id, sr, v)) == 60 + 2 * len(v)


def test_fixture_overdrives_and_crosses():
    # the features are only meaningful if the fixture actually clips and
    # crosses zero — guard against a spec edit silently trivializing them
    sr, v, clips = fixture_samples(7)
    assert clips > 0
    assert (np.abs(v) == PCM_MAX).sum() == clips
    assert (v[:-1].astype(np.int64) * v[1:] < 0).sum() > 0


@pytest.mark.parametrize(
    "mangle",
    [
        lambda b: b[:11],                            # truncated header
        lambda b: b"RIFX" + b[4:],                   # bad magic
        lambda b: b[:8] + b"WAVX" + b[12:],          # bad form type
        lambda b: b[:-3],                            # truncated last chunk
        lambda b: b + b"\x01",                       # RIFF length mismatch
        lambda b: b[:16] + struct.pack("<H", 2) + b[18:],  # stereo fmt
    ],
)
def test_wav_decode_rejects_malformed(mangle):
    sr, v, _ = fixture_samples(3)
    with pytest.raises(ValueError):
        wav_decode(mangle(wav_encode(3, sr, v)))


def test_wav_decode_data_before_fmt():
    body = b"WAVE" + b"data" + struct.pack("<I", 2) + b"\x00\x00"
    buf = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError):
        wav_decode(buf)


def test_decode_quarantines_torn_payload(spark):
    """A corrupted payload in the middle of a batch yields an ok=false
    row with the error message; the good rows still decode."""
    docs = spark.range(4).withColumnRenamed("id", "doc_id")
    wav = synth_wav_column(docs)

    import pyspark.sql.functions as F

    torn = wav.withColumn(
        "audio",
        F.when(F.col("doc_id") == 2, F.expr("substring(audio, 1, 20)"))
        .otherwise(F.col("audio")),
    )
    rows = {r["doc_id"]: r for r in decode_audio_meta(torn).collect()}
    assert len(rows) == 4
    assert not rows[2]["ok"] and rows[2]["err"]
    for d in (0, 1, 3):
        assert rows[d]["ok"] and rows[d]["err"] is None
        sr, v, _ = fixture_samples(d)
        assert rows[d]["sample_rate"] == sr
        assert rows[d]["n_samples"] == len(v)

    # features drop the torn payload instead of failing the stage
    feats = audio_features(torn).collect()
    assert sorted(r["doc_id"] for r in feats) == [0, 1, 3]


def test_features_match_fixture_math(spark):
    docs = spark.range(6).withColumnRenamed("id", "doc_id")
    got = {r["doc_id"]: r for r in audio_features(synth_wav_column(docs)).collect()}
    for d in range(6):
        _sr, v16, clips = fixture_samples(d)
        v = v16.astype(np.int64)
        assert got[d]["sum_sq"] == int((v * v).sum())
        assert got[d]["peak"] == int(np.abs(v).max())
        assert got[d]["zero_cross"] == int((v[:-1] * v[1:] < 0).sum())
        assert got[d]["clip_count"] == clips
        assert got[d]["dc_sum"] == int(v.sum())


def test_frame_windows_match_fixture_math(spark):
    """Per-payload loudest-frame election equals a straightforward
    per-frame recompute from the closed-form samples (first frame wins
    energy ties), and the torn payload is quarantined, not fatal."""
    from eth_dspa_2019_spark.operators.audio import (
        FRAME_N,
        audio_frame_windows,
    )

    docs = spark.range(8).withColumnRenamed("id", "doc_id")
    wav = synth_wav_column(docs)
    got = {r["doc_id"]: r for r in audio_frame_windows(wav).collect()}
    assert len(got) == 8
    for d in range(8):
        _sr, v16, _ = fixture_samples(d)
        v = v16.astype(np.int64)
        frames = [v[s : s + FRAME_N] for s in range(0, len(v), FRAME_N)]
        energies = [int((f * f).sum()) for f in frames]
        loud = energies.index(max(energies))
        assert got[d]["n_frames"] == len(frames)
        assert got[d]["loud_frame"] == loud
        assert got[d]["loud_energy"] == energies[loud]
        assert got[d]["loud_peak"] == int(np.abs(frames[loud]).max())

    import pyspark.sql.functions as F

    torn = wav.withColumn(
        "audio",
        F.when(F.col("doc_id") == 5, F.expr("substring(audio, 1, 20)"))
        .otherwise(F.col("audio")),
    )
    assert sorted(
        r["doc_id"] for r in audio_frame_windows(torn).collect()
    ) == [0, 1, 2, 3, 4, 6, 7]
