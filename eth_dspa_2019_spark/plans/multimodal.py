"""Registered multimodal queries: binary image-column decode and frame
sampling over Arrow-batched mapInPandas, with DuckDB oracles derived from
the same synthetic-payload spec (operators/multimodal.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..io.readers import load_table
from ..operators.multimodal import (
    HEADER_LEN,
    decode_image_meta,
    sample_frames,
    synth_image_column,
)
from .registry import register


@register(
    "multimodal_image_meta",
    oracle="""
    SELECT doc_id,
           cast(doc_id % 640 + 64 AS int) AS width,
           cast(doc_id % 480 + 48 AS int) AS height,
           cast(length(text) % 3 + 1 AS int) AS channels,
           cast((doc_id % 640 + 64) * (doc_id % 480 + 48)
                * (length(text) % 3 + 1) AS bigint) AS n_pixels,
           cast(length(text) AS int) AS payload_len,
           true AS ok
    FROM documents
    """,
)
def multimodal_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary image column → typed metadata via Arrow-batched mapInPandas
    (header parse stands in for the codec — see operators/multimodal.py).
    The oracle recomputes the expected metadata from the payload spec, so
    the binary encode + batch decode round-trip is fully checked."""
    docs = load_table(spark, sf_dir, "documents")
    return decode_image_meta(synth_image_column(docs))


@register(
    "multimodal_frame_sample",
    oracle=f"""
    WITH f AS (
      SELECT doc_id,
             length(text) AS plen,
             unnest(range(0, length(text) % 7 + 1)) AS i
      FROM documents
    )
    SELECT doc_id,
           cast(i AS int) AS frame_idx,
           cast({HEADER_LEN} + i * greatest(plen // (plen % 7 + 1), 1)
                AS bigint) AS frame_offset
    FROM f
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling: 1 binary payload → n frame rows via
    mapInPandas row expansion (deterministic stride stand-in)."""
    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(synth_image_column(docs))


@register(
    "multimodal_resize_plan",
    oracle="""
    WITH dims AS (
      SELECT doc_id,
             cast(doc_id % 640 + 64 AS bigint) AS w,
             cast(doc_id % 480 + 48 AS bigint) AS h
      FROM documents
    )
    SELECT doc_id,
           cast(w AS int) AS width,
           cast(h AS int) AS height,
           cast(w * 224 // greatest(w, h) AS int) AS dst_w,
           cast(h * 224 // greatest(w, h) AS int) AS dst_h,
           cast(1000000 * 224 // greatest(w, h) AS bigint) AS scale_fx
    FROM dims
    """,
)
def multimodal_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize planning (fit within 224px): the decode →
    plan chain runs as Arrow mapInPandas over the binary column; the
    oracle recomputes the target dims in closed form from the payload
    spec, checking the whole encode → decode → integer-planning path.
    The pixel resample is the documented codec-boundary stub."""
    from ..operators.multimodal import resize_plan

    docs = load_table(spark, sf_dir, "documents")
    return resize_plan(synth_image_column(docs))


def _o_byte_features() -> str:
    from ..operators.multimodal import FEAT_BUCKETS

    cols = ", ".join(
        f"cast(sum(CASE WHEN ord(c) % {FEAT_BUCKETS} = {i} "
        f"THEN 1 ELSE 0 END) AS bigint) AS f{i}"
        for i in range(FEAT_BUCKETS)
    )
    return f"""
    WITH chars AS (
      SELECT doc_id, unnest(string_split(text, '')) AS c
      FROM documents
    )
    SELECT doc_id, {cols}
    FROM chars WHERE c != '' GROUP BY doc_id
    """


@register("multimodal_byte_features", oracle=_o_byte_features())
def multimodal_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-dim byte-histogram features per image payload — the
    feature-extraction stage of the multimodal pipeline (a deterministic
    stand-in for a learned embedding, with the REAL byte-level numpy
    plumbing): bucket = byte % 16 over the payload bytes. The oracle
    computes the same histogram from the text column (the payload is the
    utf-8 text; ASCII ⇒ byte == character code), so the binary path is
    verified end-to-end without an imaging library."""
    from ..operators.multimodal import byte_features

    docs = load_table(spark, sf_dir, "documents")
    return byte_features(synth_image_column(docs))
