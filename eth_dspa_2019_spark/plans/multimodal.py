"""Registered multimodal queries: REAL PNG payloads (stdlib encode +
scanline-decoding parse, operators/multimodal.py) processed with
Arrow-batched mapInPandas; the DuckDB oracles re-derive every output
column from the closed-form pixel spec — pixel sums and histograms only
match when the inflate + de-filter path actually reconstructed the
scanlines, so the codec round-trip is verified end-to-end without an
imaging library."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..io.readers import load_table
from ..operators.multimodal import (
    CHANNELS,
    FEAT_BUCKETS,
    H_MOD,
    H_OFF,
    RESIZE_TARGET,
    W_MOD,
    W_OFF,
    byte_features,
    decode_image_meta,
    resize_plan,
    sample_frames,
    synth_png_column,
)
from .registry import register

# the fixture spec, as SQL fragments shared by every oracle below
_O_DIMS = f"""
    dims AS (
      SELECT doc_id,
             cast(doc_id % {W_MOD} + {W_OFF} AS bigint) AS w,
             cast(doc_id % {H_MOD} + {H_OFF} AS bigint) AS h
      FROM documents
    )
"""
# pixel value at flat index k (row-major y, x, c):
#   val = (31*id + 7*x + 13*y + 17*c) % 256,
#   x = (k // 3) % w, y = k // (3*w), c = k % 3
_O_PIXELS = f"""
    px AS (
      SELECT doc_id, w, h, unnest(range(0, w * h * {CHANNELS})) AS k
      FROM dims
    ),
    pv AS (
      SELECT doc_id,
             (31 * doc_id + 7 * ((k // {CHANNELS}) % w)
              + 13 * (k // ({CHANNELS} * w)) + 17 * (k % {CHANNELS}))
               % 256 AS val
      FROM px
    )
"""


@register(
    "multimodal_image_meta",
    oracle=f"""
    WITH {_O_DIMS},
    {_O_PIXELS},
    sums AS (
      SELECT doc_id, cast(sum(val) AS bigint) AS pix_sum
      FROM pv GROUP BY doc_id
    )
    SELECT d.doc_id,
           cast(d.w AS int) AS width,
           cast(d.h AS int) AS height,
           {CHANNELS} AS channels,
           cast(d.w * d.h * {CHANNELS} AS bigint) AS n_pixels,
           cast(d.h * (1 + d.w * {CHANNELS}) AS int) AS payload_len,
           s.pix_sum,
           true AS ok,
           cast(NULL AS varchar) AS err
    FROM dims d JOIN sums s ON s.doc_id = d.doc_id
    """,
)
def multimodal_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary PNG column → typed metadata + quarantine via Arrow-batched
    mapInPandas, the decode being a real chunk-walking, CRC-verifying,
    scanline-de-filtering PNG parser. The oracle recomputes width,
    height, decompressed-stream length and the full PIXEL SUM from the
    generation spec, so a decoder that skipped the inflate or the
    de-filter step cannot match."""
    docs = load_table(spark, sf_dir, "documents")
    return decode_image_meta(synth_png_column(docs))


@register(
    "multimodal_frame_sample",
    oracle=f"""
    WITH {_O_DIMS},
    f AS (
      SELECT doc_id, w, h,
             unnest(range(0, h % 7 + 1)) AS i
      FROM dims
    )
    SELECT doc_id,
           cast(i AS int) AS frame_idx,
           cast(i * greatest(h // (h % 7 + 1), 1) * (1 + w * {CHANNELS})
                AS bigint) AS frame_offset
    FROM f
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling: 1 binary payload → n frame rows via
    mapInPandas row expansion, stride math over the REAL decoded
    geometry (scanline stream stands in for the frame sequence)."""
    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(synth_png_column(docs))


@register(
    "multimodal_resize_plan",
    oracle=f"""
    WITH {_O_DIMS}
    SELECT doc_id,
           cast(w AS int) AS width,
           cast(h AS int) AS height,
           cast(w * {RESIZE_TARGET} // greatest(w, h) AS int) AS dst_w,
           cast(h * {RESIZE_TARGET} // greatest(w, h) AS int) AS dst_h,
           cast(1000000 * {RESIZE_TARGET} // greatest(w, h) AS bigint)
             AS scale_fx
    FROM dims
    """,
)
def multimodal_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize planning (fit within 224px) over the real
    decoded dims: decode → integer planning as one Arrow mapInPandas
    stage; the oracle recomputes the targets in closed form."""
    docs = load_table(spark, sf_dir, "documents")
    return resize_plan(synth_png_column(docs))


def _o_pixel_features() -> str:
    cols = ", ".join(
        f"cast(sum(CASE WHEN val % {FEAT_BUCKETS} = {i} "
        f"THEN 1 ELSE 0 END) AS bigint) AS f{i}"
        for i in range(FEAT_BUCKETS)
    )
    return f"""
    WITH {_O_DIMS},
    {_O_PIXELS}
    SELECT doc_id, {cols}
    FROM pv GROUP BY doc_id
    """


@register("multimodal_byte_features", oracle=_o_pixel_features())
def multimodal_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-dim pixel-histogram features per image (bucket = value % 16
    over the DECODED pixels) — the feature-extraction stage of the
    multimodal pipeline, a deterministic stand-in for a learned visual
    embedding with the real codec plumbing underneath. The oracle
    recomputes the histogram from the pixel spec: it matches only if
    decode reconstructed every scanline byte."""
    docs = load_table(spark, sf_dir, "documents")
    return byte_features(synth_png_column(docs))
