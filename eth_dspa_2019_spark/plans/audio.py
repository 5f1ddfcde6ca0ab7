"""Registered audio queries: REAL RIFF/WAV PCM16 payloads (stdlib
encode + chunk-walking parse, operators/audio.py) processed with
Arrow-batched mapInPandas — the audio leg of the multimodal brief,
mirroring plans/multimodal.py's PNG leg (VERDICT r9 task #2).

Every oracle re-derives its output from the closed-form SAMPLE spec
(not the container spec), so the values only match when the RIFF walk +
PCM int16 recovery actually reconstructed the waveform: a parser that
mis-skipped the odd-length LIST chunk, dropped the pad byte, or read
the samples big-endian cannot match sum_sq / zero_cross / clip_count.

Reference parity: the reference (Java/Flink social-network engine) has
no audio path; this implements the LLM-pipeline multimodal brief
(binary media columns, typed metadata, Arrow-batched codec stages).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..io.readers import load_table
from ..operators.audio import (
    FRAME_N,
    N_MOD,
    N_OFF,
    PCM_MAX,
    RAW_MOD,
    RAW_OFF,
    RAW_STRIDE,
    SR_BASE,
    SR_MOD,
    SR_STEP,
    audio_features,
    audio_frame_windows,
    decode_audio_meta,
    synth_wav_column,
)
from .registry import register

# fixture spec as SQL fragments (shared by both oracles):
#   sr(doc) = 8000 + (doc_id % 3) * 4000
#   n(doc)  = doc_id % 500 + 100
#   v(i)    = clamp((31*doc_id + 7919*i) % 70001 - 35000, -32767, 32767)
_SR = f"({SR_BASE} + (doc_id % {SR_MOD}) * {SR_STEP})"
_N = f"(doc_id % {N_MOD} + {N_OFF})"


def _clamped(i_expr: str) -> str:
    """SQL for the clamped int16 sample at index ``i_expr``."""
    raw = f"((31 * doc_id + {RAW_STRIDE} * ({i_expr})) % {RAW_MOD} - {RAW_OFF})"
    return f"greatest(least({raw}, {PCM_MAX}), -{PCM_MAX})"


@register(
    "multimodal_audio_meta",
    oracle=f"""
    SELECT doc_id,
           cast({_SR} AS int) AS sample_rate,
           cast({_N} AS bigint) AS n_samples,
           cast(60 + 2 * {_N} AS int) AS byte_len,
           cast({_N} * 1000 // {_SR} AS bigint) AS duration_ms,
           true AS ok,
           cast(NULL AS varchar) AS err
    FROM documents
    """,
)
def multimodal_audio_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary WAV column → typed metadata + quarantine column via one
    Arrow-batched mapInPandas stage (no shuffle). The oracle recomputes
    sample_rate / n_samples / duration and the closed-form container
    length 60 + 2n (12-byte RIFF header + 24-byte fmt + 16-byte padded
    LIST + 8-byte data header + 2n PCM bytes), so a walker that dropped
    the odd-chunk pad byte or mis-read the fmt chunk cannot match."""
    docs = load_table(spark, sf_dir, "documents")
    return decode_audio_meta(synth_wav_column(docs))


@register(
    "multimodal_audio_features",
    oracle=f"""
    WITH sp AS (
      SELECT doc_id, cast({_N} AS bigint) AS n FROM documents
    ),
    idx AS (
      SELECT doc_id, n, unnest(range(0, n)) AS i FROM sp
    ),
    pv AS (
      SELECT doc_id,
             {_clamped("i")} AS val,
             CASE WHEN i < n - 1 THEN {_clamped("i + 1")} END AS nxt
      FROM idx
    )
    SELECT doc_id,
           cast(sum(val * val) AS bigint) AS sum_sq,
           cast(max(abs(val)) AS int) AS peak,
           cast(sum(CASE WHEN val * nxt < 0 THEN 1 ELSE 0 END) AS bigint)
             AS zero_cross,
           cast(sum(CASE WHEN abs(val) = {PCM_MAX} THEN 1 ELSE 0 END)
                AS bigint) AS clip_count,
           cast(sum(val) AS bigint) AS dc_sum
    FROM pv GROUP BY doc_id
    """,
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCM waveform features (energy, peak, strict-sign zero crossings,
    clip count, DC sum) over the DECODED int16 samples, vectorized per
    payload inside Arrow mapInPandas. The oracle regenerates every
    sample in closed form and aggregates the identical integer math —
    it matches only if the RIFF walk recovered the exact waveform
    (the fixture overdrives int16 so clipping is non-trivial)."""
    docs = load_table(spark, sf_dir, "documents")
    return audio_features(synth_wav_column(docs))


@register(
    "multimodal_audio_frames",
    oracle=f"""
    WITH sp AS (
      SELECT doc_id, cast({_N} AS bigint) AS n FROM documents
    ),
    idx AS (
      SELECT doc_id, n, unnest(range(0, n)) AS i FROM sp
    ),
    pv AS (
      SELECT doc_id, i // {FRAME_N} AS f, {_clamped("i")} AS val
      FROM idx
    ),
    fr AS (
      SELECT doc_id, f,
             cast(sum(val * val) AS bigint) AS energy,
             cast(max(abs(val)) AS int) AS peak
      FROM pv GROUP BY 1, 2
    ),
    top AS (
      SELECT doc_id, f, energy, peak,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY energy DESC, f) AS rn
      FROM fr
    )
    SELECT doc_id,
           cast((n + {FRAME_N} - 1) // {FRAME_N} AS int) AS n_frames,
           cast(f AS int) AS loud_frame,
           energy AS loud_energy,
           peak AS loud_peak
    FROM top JOIN sp USING (doc_id) WHERE rn = 1
    """,
)
def multimodal_audio_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling frame windows over the DECODED waveform — the audio
    analog of the video frame-sample stage (`multimodal_frame_sample`):
    {FRAME_N}-sample frames (16-32 ms at the fixture rates, last
    partial frame included), per-frame energy/peak reduced with
    np.reduceat inside Arrow mapInPandas, and the LOUDEST frame elected
    per payload (max energy, first frame on ties) — the
    transient-picking primitive a training pipeline uses to crop a
    representative window from each clip. The oracle regenerates every
    sample in closed form, frames by i // {FRAME_N}, and replays the
    same election (row_number energy DESC, f) — it matches only if the
    RIFF walk + framing recovered the exact per-frame boundaries.

    Scale shape: one mapInPandas pass, zero shuffle — frames never
    leave the executor; per-payload output is ONE row regardless of
    clip length."""
    docs = load_table(spark, sf_dir, "documents")
    return audio_frame_windows(synth_wav_column(docs))
