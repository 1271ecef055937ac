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


_RESIZE_SQL = """
WITH b AS (SELECT doc_id, encode(text) AS blob FROM documents WHERE doc_id < 50),
ser AS (SELECT doc_id, CAST(blob AS VARCHAR) AS bv, octet_length(blob) AS n,
               unnest(generate_series(0, 63)) AS i
        FROM b)
SELECT doc_id,
       CAST(64 AS BIGINT) AS resized_len,
       CAST(SUM(CASE WHEN n >= 64 THEN ascii(substr(bv, CAST(FLOOR(i * (n / 64.0)) AS INT) + 1, 1))
                WHEN i < n  THEN ascii(substr(bv, CAST(i AS INT) + 1, 1))
                ELSE 0 END) AS BIGINT) AS resized_sum
FROM ser GROUP BY doc_id
"""


@register("mm_resize_checksum", oracle=_RESIZE_SQL)
def mm_resize_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two chained mapInPandas stages — resize to a fixed 64-byte 'tensor',
    then featurize (len + byte-sum) — the decode->resize->featurize
    pipeline shape.  The oracle recomputes the stride arithmetic in SQL
    over the ASCII corpus."""
    from collections.abc import Iterator

    import pandas as pd

    from ..operators.multimodal import resize_blob

    docs = attach_binary(load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50))
    resized = resize_blob(docs, target_len=64)

    def checksum(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "resized_len": pdf["resized"].map(len).astype("int64"),
                    "resized_sum": pdf["resized"].map(sum).astype("int64"),
                }
            )

    return resized.mapInPandas(checksum, schema="doc_id long, resized_len long, resized_sum long")
