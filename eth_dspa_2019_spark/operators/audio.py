"""Audio payloads: REAL RIFF/WAV PCM16 bytes in a binary column, decoded
with a chunk-walking parser and featurized with Arrow-batched
``mapInPandas`` — the audio leg of the multimodal brief, mirroring the
PNG image path (operators/multimodal.py).

Stdlib-only (struct + numpy for the sample math — no audio library
exists in this container and none is needed for the container format):

- :func:`wav_encode` / :func:`synth_wav_column` — fixture generator:
  per-doc deterministic PCM16 mono samples from a closed-form integer
  spec, wrapped in a spec-conformant RIFF container (RIFF/WAVE header,
  ``fmt `` chunk, an odd-length junk ``LIST`` chunk with the RIFF pad
  byte — so the parser's unknown-chunk skip and even-padding logic are
  exercised on every payload — then the ``data`` chunk).
- :func:`wav_decode` — a real RIFF walker: header validation, chunk
  iteration with even-padding, ``fmt `` validation (PCM, mono, 16-bit),
  little-endian int16 sample recovery. Malformed input raises
  ``ValueError``; the batch wrappers quarantine (``ok=false`` + ``err``)
  so a torn payload never kills the stage.

Fixture sample spec (every oracle re-derives features from this in
closed form, so the encode → container-walk → PCM-decode path is
verified end-to-end):

    sr(doc)  = 8000 + (doc_id % 3) * 4000        # 8/12/16 kHz
    n(doc)   = doc_id % 500 + 100                # 100..599 samples
    raw(i)   = ((31*doc_id + 7919*i) % 70001) - 35000
    v(i)     = clamp(raw(i), -32767, 32767)      # some samples CLIP

The prime stride 7919 wraps the modulus every ~9 samples, so every
payload oscillates across zero AND overdrives int16 — zero-crossing
and clip-rate are non-trivial for every doc (pytest-pinned); energy,
peak and DC sum are integer closed-form.

Reference parity: the reference has no audio path; this implements the
LLM-pipeline brief (binary media columns + typed metadata + Arrow-batched
codec stages) — VERDICT r9 task #2.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

# closed-form fixture knobs (shared with the SQL oracles)
SR_BASE, SR_MOD, SR_STEP = 8000, 3, 4000
N_MOD, N_OFF = 500, 100
RAW_MOD, RAW_OFF, RAW_STRIDE = 70001, 35000, 7919
PCM_MAX = 32767

AUDIO_META_SCHEMA = (
    "doc_id bigint, sample_rate int, n_samples bigint, byte_len int, "
    "duration_ms bigint, ok boolean, err string"
)
AUDIO_FEAT_SCHEMA = (
    "doc_id bigint, sum_sq bigint, peak int, zero_cross bigint, "
    "clip_count bigint, dc_sum bigint"
)

#: tumbling frame size for the frame-window stage (the audio analog of
#: the video frame-sample hop; real pipelines use 10-30 ms hops — at the
#: fixture's 8-16 kHz rates 256 samples is 16-32 ms).
FRAME_N = 256
AUDIO_FRAME_SCHEMA = (
    "doc_id bigint, n_frames int, loud_frame int, loud_energy bigint, "
    "loud_peak int"
)


def fixture_samples(doc_id: int) -> tuple[int, np.ndarray, int]:
    """(sample_rate, clamped int16 samples, clip_count) for a doc —
    the closed-form spec the oracles recompute."""
    sr = SR_BASE + (doc_id % SR_MOD) * SR_STEP
    n = doc_id % N_MOD + N_OFF
    i = np.arange(n, dtype=np.int64)
    raw = (31 * doc_id + RAW_STRIDE * i) % RAW_MOD - RAW_OFF
    # post-clamp definition (|v| == PCM_MAX), same as the feature stage
    clip_count = int((np.abs(raw) >= PCM_MAX).sum())
    v = np.clip(raw, -PCM_MAX, PCM_MAX).astype(np.int16)
    return sr, v, clip_count


def _riff_chunk(cid: bytes, data: bytes) -> bytes:
    pad = b"\x00" if len(data) % 2 else b""  # RIFF chunks align to 2
    return cid + struct.pack("<I", len(data)) + data + pad


def wav_encode(doc_id: int, sr: int, samples: np.ndarray) -> bytes:
    """Spec-conformant RIFF/WAV PCM16 mono: fmt chunk, an odd/even
    junk LIST chunk (walker must skip it and honor the pad byte), then
    the data chunk. byte_len is closed-form: 60 + 2*n_samples."""
    fmt = struct.pack("<HHIIHH", 1, 1, sr, sr * 2, 2, 16)  # PCM,mono,16b
    junk = b"fixture" + (b"!" if doc_id % 2 else b"")      # len 7 or 8
    body = (
        b"WAVE"
        + _riff_chunk(b"fmt ", fmt)
        + _riff_chunk(b"LIST", junk)
        + _riff_chunk(b"data", samples.astype("<i2").tobytes())
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(buf: bytes) -> tuple[int, np.ndarray]:
    """Real RIFF walker → (sample_rate, int16 samples). Validates the
    RIFF/WAVE header, iterates chunks with even-padding, requires a
    PCM mono 16-bit ``fmt `` before ``data``, skips unknown chunks.
    Raises ValueError (only — quarantine contract) on malformed input."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("bad RIFF/WAVE header")
    (riff_len,) = struct.unpack("<I", buf[4:8])
    if riff_len + 8 != len(buf):
        raise ValueError(f"RIFF length {riff_len} != payload {len(buf) - 8}")
    pos, sr, data = 12, None, None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        (clen,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        chunk = buf[pos + 8 : pos + 8 + clen]
        if len(chunk) != clen:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            if clen != 16:
                raise ValueError(f"fmt chunk length {clen} != 16")
            afmt, nch, srate, _brate, _balign, bits = struct.unpack(
                "<HHIIHH", chunk
            )
            if (afmt, nch, bits) != (1, 1, 16):
                raise ValueError(
                    f"unsupported WAV: fmt={afmt} ch={nch} bits={bits}"
                )
            sr = srate
        elif cid == b"data":
            if sr is None:
                raise ValueError("data chunk before fmt")
            if clen % 2:
                raise ValueError("odd data chunk length for PCM16")
            data = np.frombuffer(chunk, dtype="<i2")
        pos += 8 + clen + (clen % 2)  # even-align to the next chunk
    if pos != len(buf):
        raise ValueError("trailing bytes after last chunk")
    if data is None:
        raise ValueError("missing data chunk")
    return sr, data


def _encode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        waves = []
        for d in pdf["doc_id"]:
            sr, v, _ = fixture_samples(int(d))
            waves.append(wav_encode(int(d), sr, v))
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"].astype("int64"), "audio": waves}
        )


def synth_wav_column(docs: DataFrame) -> DataFrame:
    """(doc_id, audio binary): real RIFF/WAV PCM16 payloads from the
    closed-form sample spec — born distributed via Arrow-batched
    mapInPandas, exactly how an ingested media table would arrive.

    NO codec fan-out here (r11): unlike PNG inflate (8-9 s one-core at
    sf0.1, where `spread_for_codec` is a 7x win), PCM16 encode+decode is
    sequential-memory trivial — the fixture's whole payload set costs
    ~0.5 s on one task, while the fan-out's extra exchange plus 32 Arrow
    worker streams measured +2-3.5 s per audio query in both full-bench
    runs that carried it. A real audio corpus arrives as a multi-file
    binary table and scans wide without help (guide §1.1: measure, then
    undo the "fix" that pessimized)."""
    return docs.select("doc_id").mapInPandas(
        _encode_batches, schema="doc_id bigint, audio binary"
    )


def _meta_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        rows = {k: [] for k in (
            "doc_id", "sample_rate", "n_samples", "byte_len",
            "duration_ms", "ok", "err",
        )}
        for doc_id, buf in zip(pdf["doc_id"], pdf["audio"]):
            rows["doc_id"].append(int(doc_id))
            try:
                sr, v = wav_decode(bytes(buf))
                rows["sample_rate"].append(sr)
                rows["n_samples"].append(len(v))
                rows["byte_len"].append(len(buf))
                rows["duration_ms"].append(len(v) * 1000 // sr)
                rows["ok"].append(True)
                rows["err"].append(None)
            except (ValueError, struct.error) as ex:  # quarantine
                rows["sample_rate"].append(0)
                rows["n_samples"].append(0)
                rows["byte_len"].append(len(buf))
                rows["duration_ms"].append(0)
                rows["ok"].append(False)
                rows["err"].append(str(ex))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                "sample_rate": pd.Series(rows["sample_rate"], dtype="int32"),
                "n_samples": pd.Series(rows["n_samples"], dtype="int64"),
                "byte_len": pd.Series(rows["byte_len"], dtype="int32"),
                "duration_ms": pd.Series(rows["duration_ms"], dtype="int64"),
                "ok": pd.Series(rows["ok"], dtype="bool"),
                "err": pd.Series(rows["err"], dtype="object"),
            }
        )


def decode_audio_meta(audio: DataFrame) -> DataFrame:
    """Arrow-batched container walk of (doc_id, audio) → typed metadata
    with a quarantine column. One mapInPandas stage, no shuffle."""
    return audio.mapInPandas(_meta_batches, schema=AUDIO_META_SCHEMA)


def _feature_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """PCM features over the DECODED samples, vectorized per payload:
    energy (sum of squares), peak amplitude, zero-crossing count
    (strict sign flips), clip count (samples pinned at ±PCM_MAX — the
    fixture overdrives, so this is re-derivable as |raw| > PCM_MAX),
    and the DC sum. Quarantined payloads produce no feature row."""
    for pdf in it:
        rows = {k: [] for k in (
            "doc_id", "sum_sq", "peak", "zero_cross", "clip_count", "dc_sum",
        )}
        for doc_id, buf in zip(pdf["doc_id"], pdf["audio"]):
            try:
                _sr, v16 = wav_decode(bytes(buf))
            except (ValueError, struct.error):
                continue
            v = v16.astype(np.int64)
            rows["doc_id"].append(int(doc_id))
            rows["sum_sq"].append(int((v * v).sum()))
            rows["peak"].append(int(np.abs(v).max()) if len(v) else 0)
            rows["zero_cross"].append(
                int((v[:-1] * v[1:] < 0).sum()) if len(v) > 1 else 0
            )
            rows["clip_count"].append(int((np.abs(v) == PCM_MAX).sum()))
            rows["dc_sum"].append(int(v.sum()))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                "sum_sq": pd.Series(rows["sum_sq"], dtype="int64"),
                "peak": pd.Series(rows["peak"], dtype="int32"),
                "zero_cross": pd.Series(rows["zero_cross"], dtype="int64"),
                "clip_count": pd.Series(rows["clip_count"], dtype="int64"),
                "dc_sum": pd.Series(rows["dc_sum"], dtype="int64"),
            }
        )


def audio_features(audio: DataFrame) -> DataFrame:
    """mapInPandas PCM feature extraction over (doc_id, audio)."""
    return audio.mapInPandas(_feature_batches, schema=AUDIO_FEAT_SCHEMA)


def _frame_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Tumbling FRAME_N-sample windows over the decoded waveform,
    reduced per frame with np.add/maximum.reduceat (one pass, no Python
    per-frame loop), then the loudest frame elected per payload
    (max energy, smallest index on ties). The last partial frame
    counts — a trailing transient must not be droppable by framing.
    Quarantined payloads produce no row."""
    for pdf in it:
        rows = {k: [] for k in (
            "doc_id", "n_frames", "loud_frame", "loud_energy", "loud_peak",
        )}
        for doc_id, buf in zip(pdf["doc_id"], pdf["audio"]):
            try:
                _sr, v16 = wav_decode(bytes(buf))
            except (ValueError, struct.error):
                continue
            v = v16.astype(np.int64)
            n = len(v)
            nf = max(1, -(-n // FRAME_N)) if n else 0
            if n == 0:
                rows["doc_id"].append(int(doc_id))
                rows["n_frames"].append(0)
                rows["loud_frame"].append(0)
                rows["loud_energy"].append(0)
                rows["loud_peak"].append(0)
                continue
            starts = np.arange(0, n, FRAME_N)
            energy = np.add.reduceat(v * v, starts)
            peak = np.maximum.reduceat(np.abs(v), starts)
            f = int(np.argmax(energy))  # argmax takes the FIRST maximum
            rows["doc_id"].append(int(doc_id))
            rows["n_frames"].append(nf)
            rows["loud_frame"].append(f)
            rows["loud_energy"].append(int(energy[f]))
            rows["loud_peak"].append(int(peak[f]))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                "n_frames": pd.Series(rows["n_frames"], dtype="int32"),
                "loud_frame": pd.Series(rows["loud_frame"], dtype="int32"),
                "loud_energy": pd.Series(
                    rows["loud_energy"], dtype="int64"
                ),
                "loud_peak": pd.Series(rows["loud_peak"], dtype="int32"),
            }
        )


def audio_frame_windows(audio: DataFrame) -> DataFrame:
    """mapInPandas tumbling-frame analysis over (doc_id, audio)."""
    return audio.mapInPandas(_frame_batches, schema=AUDIO_FRAME_SCHEMA)
