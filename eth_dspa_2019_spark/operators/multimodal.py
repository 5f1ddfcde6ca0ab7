"""Multimodal columns: image/audio/video payloads as opaque ``binary``
columns with typed metadata, processed with Arrow-batched ``mapInPandas``.

The 100-TB pattern: payload bytes travel as a binary column next to typed
metadata; decode / feature-extract / resize / frame-sample run as
``mapInPandas`` stages (Arrow batch in, Arrow batch out — no per-row Python
cost), partitioned by whatever key the pipeline shards on. Heavy codec
libraries are NOT in this container, so the codec boundary is explicit:

- :func:`decode_image_meta` — the *plumbing* (schema, batching, UDF
  signature) is real and tested; the pixel decode is a deterministic fake
  header-parse (`_fake_decode`) with the real-codec slot raising
  NotImplementedError, clearly marked.

The fixture payloads are deterministic synthetic "images": a 16-byte
header (magic, width, height, channels) + text bytes, built from the
documents table entirely with SQL expressions, so a DuckDB oracle can
verify the decoded metadata byte-for-byte.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAGIC = 0x1347
HEADER_LEN = 16

META_SCHEMA = (
    "doc_id bigint, width int, height int, channels int, n_pixels bigint, "
    "payload_len int, ok boolean"
)


def synth_image_column(docs: DataFrame) -> DataFrame:
    """(doc_id, image binary): 16-byte big-endian header
    (magic, width, height, channels — all int32) + the utf-8 text payload.
    Width/height derive from doc_id; channels from text length."""
    width = (F.col("doc_id") % 640 + 64).cast("int")
    height = (F.col("doc_id") % 480 + 48).cast("int")
    channels = (F.length("text") % 3 + 1).cast("int")

    def be32(c: Column) -> Column:
        # 4-byte big-endian encoding of a non-negative int32, JVM-side
        return F.unhex(F.lpad(F.hex(c.cast("bigint")), 8, "0"))

    payload = F.encode("text", "UTF-8")
    return docs.select(
        "doc_id",
        F.concat(
            be32(F.lit(MAGIC)), be32(width), be32(height), be32(channels), payload
        ).alias("image"),
    )


def _real_decode(payload: bytes):  # pragma: no cover - codec libs absent
    """Slot for a real image codec (PIL/libvips). STUB: the container has
    no imaging libraries; wire one in here when deploying."""
    raise NotImplementedError("image codec not available in this environment")


def _fake_decode(buf: bytes) -> tuple[int, int, int, bool]:
    """Deterministic header parse standing in for the codec."""
    if len(buf) < HEADER_LEN:
        return 0, 0, 0, False
    magic, width, height, channels = struct.unpack(">iiii", buf[:HEADER_LEN])
    if magic != MAGIC:
        return 0, 0, 0, False
    return width, height, channels, True


def _decode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        decoded = [_fake_decode(b) for b in pdf["image"]]
        w = pd.Series([d[0] for d in decoded], dtype="int32")
        h = pd.Series([d[1] for d in decoded], dtype="int32")
        c = pd.Series([d[2] for d in decoded], dtype="int32")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "width": w,
                "height": h,
                "channels": c,
                "n_pixels": (w.astype("int64") * h * c),
                "payload_len": pd.Series(
                    [len(b) - HEADER_LEN for b in pdf["image"]], dtype="int32"
                ),
                "ok": pd.Series([d[3] for d in decoded], dtype="bool"),
            }
        )


def decode_image_meta(images: DataFrame) -> DataFrame:
    """Arrow-batched decode of (doc_id, image) → typed metadata rows.
    One mapInPandas stage, no shuffle: partition-parallel over however the
    payload table is laid out."""
    return images.mapInPandas(_decode_batches, schema=META_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_offset bigint"


def _frame_sample_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic frame sampling stand-in: every payload is treated as
    n_frames = payload_len % 7 + 1 equal 'frames'; emit (idx, byte offset)
    per sampled frame — the video-path row-explode shape."""
    for pdf in it:
        ids, idxs, offs = [], [], []
        for doc_id, buf in zip(pdf["doc_id"], pdf["image"]):
            plen = len(buf) - HEADER_LEN
            n_frames = plen % 7 + 1
            stride = max(plen // n_frames, 1)
            for i in range(n_frames):
                ids.append(doc_id)
                idxs.append(i)
                offs.append(HEADER_LEN + i * stride)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "frame_offset": pd.Series(offs, dtype="int64"),
            }
        )


def sample_frames(images: DataFrame) -> DataFrame:
    """mapInPandas row-expansion (1 payload → n frame rows)."""
    return images.mapInPandas(_frame_sample_batches, schema=FRAME_SCHEMA)


RESIZE_TARGET = 224  # fit-within square (the ViT/CNN preprocessing box)

RESIZE_SCHEMA = (
    "doc_id bigint, width int, height int, dst_w int, dst_h int, "
    "scale_fx bigint"
)


def _resize_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Aspect-preserving fit-within-{RESIZE_TARGET}px resize PLAN: integer
    target dims + fixed-point scale per image. The pixel resample itself
    is the codec-boundary stub (`_real_decode`); the planning math is the
    real thing a preprocessing pipeline shards on."""
    for pdf in it:
        rows = {"doc_id": [], "width": [], "height": [], "dst_w": [],
                "dst_h": [], "scale_fx": []}
        for doc_id, buf in zip(pdf["doc_id"], pdf["image"]):
            w, h, _c, ok = _fake_decode(buf)
            if not ok:
                continue
            m = max(w, h)
            rows["doc_id"].append(doc_id)
            rows["width"].append(w)
            rows["height"].append(h)
            rows["dst_w"].append(w * RESIZE_TARGET // m)
            rows["dst_h"].append(h * RESIZE_TARGET // m)
            rows["scale_fx"].append(1_000_000 * RESIZE_TARGET // m)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                "width": pd.Series(rows["width"], dtype="int32"),
                "height": pd.Series(rows["height"], dtype="int32"),
                "dst_w": pd.Series(rows["dst_w"], dtype="int32"),
                "dst_h": pd.Series(rows["dst_h"], dtype="int32"),
                "scale_fx": pd.Series(rows["scale_fx"], dtype="int64"),
            }
        )


def resize_plan(images: DataFrame) -> DataFrame:
    """mapInPandas resize planning over (doc_id, image)."""
    return images.mapInPandas(_resize_batches, schema=RESIZE_SCHEMA)


FEAT_BUCKETS = 16

FEAT_SCHEMA = "doc_id bigint, " + ", ".join(
    f"f{i} bigint" for i in range(FEAT_BUCKETS)
)


def _byte_feature_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per-image byte-histogram features over the raw PAYLOAD bytes (the
    16-dim stand-in for a learned visual embedding): bucket = byte % 16,
    vectorized numpy bincount per image. Real byte-level plumbing — the
    oracle cross-checks it from the text column (the payload is utf-8,
    ASCII on the fixture, so byte values == character codes)."""
    import numpy as np

    for pdf in it:
        out = {"doc_id": pdf["doc_id"].to_numpy()}
        feats = np.zeros((len(pdf), FEAT_BUCKETS), dtype="int64")
        for j, buf in enumerate(pdf["image"]):
            b = np.frombuffer(bytes(buf), dtype=np.uint8)[HEADER_LEN:]
            feats[j] = np.bincount(b % FEAT_BUCKETS, minlength=FEAT_BUCKETS)
        for i in range(FEAT_BUCKETS):
            out[f"f{i}"] = feats[:, i]
        yield pd.DataFrame(out)


def byte_features(images: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over (doc_id, image)."""
    return images.mapInPandas(_byte_feature_batches, schema=FEAT_SCHEMA)
