"""Multimodal column plumbing (SURVEY.md §2.3).

Design for 100 TB of image/audio/video: blobs live in a ``binary`` column
beside a typed metadata struct; decode/feature-extract/resize/frame-sample
run as Arrow-batched ``mapInPandas`` stages so bytes move executor-side in
columnar batches and never touch the driver.  Partitioning carries over
from the parquet scan; each batch is independent, so the same code runs on
one core or a thousand executors.

The actual codec step is STUBBED in this container (no PIL/ffmpeg/librosa
baked in): ``decode_image``/``decode_audio`` raise NotImplementedError by
contract, and the queries use ``fake_features`` — a deterministic
byte-level featurizer with the exact same Spark-side plumbing (schema,
batching, UDF signature) a real decoder would have.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

FRAME_STRIDE = 32  # bytes per fake "frame" for frame sampling


def attach_binary(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque blob column + typed metadata struct from the
    documents table (the container has no real media files; UTF-8 bytes of
    the text stand in as the blob — the plumbing is identical)."""
    blob = F.encode(F.col(text_col), "UTF-8")
    return docs.withColumn("blob", blob).withColumn(
        "media_meta",
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(blob).cast("long").alias("byte_len"),
            F.lit("text_as_blob").alias("modality"),
        ),
    )


def decode_image(blob_bytes: bytes) -> object:
    """REAL image decode — intentionally unimplemented in this container.

    Contract: returns an HxWxC uint8 array; plug in PIL/turbojpeg here on a
    cluster with the codec libs installed.  The Spark-side plumbing that
    would call this (mapInPandas over binary batches) is real and tested
    via ``fake_features``."""
    raise NotImplementedError("image codec libs not available in this container (STUB)")


def decode_audio(blob_bytes: bytes) -> object:
    """REAL audio decode — intentionally unimplemented (see decode_image)."""
    raise NotImplementedError("audio codec libs not available in this container (STUB)")


def fake_features(df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob") -> DataFrame:
    """Deterministic stand-in feature extractor: byte length, first byte,
    bytes-checksum, and frame count at FRAME_STRIDE — same mapInPandas
    shape as a real decode+featurize stage (Arrow batch in, batch out)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf[blob_col]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "byte_len": blobs.map(len).astype("int64"),
                    "first_byte": blobs.map(lambda b: b[0] if len(b) else -1).astype("int64"),
                    "checksum": blobs.map(lambda b: sum(b) % 997).astype("int64"),
                    "n_frames": blobs.map(
                        lambda b: (len(b) + FRAME_STRIDE - 1) // FRAME_STRIDE
                    ).astype("int64"),
                }
            )

    return df.select(id_col, blob_col).mapInPandas(
        extract, schema=f"{id_col} long, byte_len long, first_byte long, checksum long, n_frames long"
    )


def frame_sample(df: DataFrame, every: int = FRAME_STRIDE, id_col: str = "doc_id", blob_col: str = "blob") -> DataFrame:
    """Sample every ``every``-th byte as a fake 'frame' — the row-explosion
    shape of real video frame sampling (one blob row -> many frame rows)."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frames, vals = [], [], []
            for i, b in zip(pdf[id_col], pdf[blob_col]):
                for f_idx, pos in enumerate(range(0, len(b), every)):
                    ids.append(i)
                    frames.append(f_idx)
                    vals.append(b[pos])
            yield pd.DataFrame({id_col: ids, "frame_idx": frames, "frame_byte": vals})

    return df.select(id_col, blob_col).mapInPandas(
        sample, schema=f"{id_col} long, frame_idx long, frame_byte long"
    )


def resize_blob(
    df: DataFrame, target_len: int = 64, id_col: str = "doc_id", blob_col: str = "blob"
) -> DataFrame:
    """The 'resize' stage shape: every blob mapped to a FIXED-size output
    (what image resize / audio resample does to tensors), here by
    stride-sampling the bytes to ``target_len`` and zero-padding short
    blobs.  Arrow batch in -> fixed-width binary batch out; a real
    implementation swaps the body for PIL resize / librosa resample and
    keeps this exact signature."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for b in pdf[blob_col]:
                if len(b) >= target_len:
                    step = len(b) / target_len
                    out.append(bytes(b[int(i * step)] for i in range(target_len)))
                else:
                    out.append(bytes(b) + b"\x00" * (target_len - len(b)))
            yield pd.DataFrame({id_col: pdf[id_col], "resized": out})

    return df.select(id_col, blob_col).mapInPandas(
        resize, schema=f"{id_col} long, resized binary"
    )
