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
