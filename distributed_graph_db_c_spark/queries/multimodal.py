"""Multimodal queries (SURVEY.md §2.3): binary-column plumbing with
deterministic fake featurizers (real codecs stubbed — see
operators/multimodal.py).  Oracles recompute the byte-level semantics in
DuckDB over encode(text)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.multimodal import FRAME_STRIDE, attach_binary, fake_features, frame_sample
from ..registry import register
from ..sources.tables import load_table

_FEATURES_SQL = f"""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       CAST(CASE WHEN length(text) > 0 THEN ascii(substr(text, 1, 1)) ELSE -1 END AS BIGINT) AS first_byte,
       CAST((octet_length(encode(text)) + {FRAME_STRIDE} - 1) // {FRAME_STRIDE} AS BIGINT) AS n_frames
FROM documents
"""


@register("mm_binary_features", oracle=_FEATURES_SQL)
def mm_binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blob metadata extraction through the real mapInPandas decode path
    (checksum dropped from the oracled projection: byte-sum isn't cleanly
    SQL-expressible; it's covered by pytest instead)."""
    docs = attach_binary(load_table(spark, sf_dir, "documents"))
    return fake_features(docs).select("doc_id", "byte_len", "first_byte", "n_frames")


_FRAME_SQL = f"""
WITH b AS (SELECT doc_id, encode(text) AS blob FROM documents WHERE doc_id < 50),
idx AS (SELECT doc_id, blob,
               unnest(generate_series(0, CAST(octet_length(blob) - 1 AS BIGINT) // {FRAME_STRIDE})) AS i
        FROM b)
SELECT doc_id,
       CAST(i AS BIGINT) AS frame_idx,
       CAST(ascii(substr(CAST(blob AS VARCHAR), CAST(i * {FRAME_STRIDE} + 1 AS INT), 1)) AS BIGINT) AS frame_byte
FROM idx
"""


@register("mm_frame_sample", oracle=_FRAME_SQL)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: one blob row -> many frame rows via mapInPandas
    (ASCII corpus, so byte == codepoint and the oracle can use substr)."""
    docs = attach_binary(load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50))
    return frame_sample(docs)
