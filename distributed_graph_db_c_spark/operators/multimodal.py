"""Multimodal column plumbing (SURVEY.md §2.3).

Design for 100 TB of image/audio/video: blobs live in a ``binary`` column
beside a typed metadata struct; decode/feature-extract/resize/frame-sample
run as Arrow-batched ``mapInPandas`` stages so bytes move executor-side in
columnar batches and never touch the driver.  Partitioning carries over
from the parquet scan; each batch is independent, so the same code runs on
one core or a thousand executors.

Decode scope (round 4): the container has no compressed-codec libs
(PIL/ffmpeg/librosa), so JPEG/PNG/MP3 decode raises NotImplementedError
by contract — but UNCOMPRESSED formats decode for real with the stdlib:
``decode_audio`` parses RIFF/PCM WAV containers (``wave`` module) and
``decode_image`` parses 24-bit BMP (struct + numpy, bottom-up rows, 4-byte
row padding).  The decode gates synthesize blobs deterministically from
doc_id and hash-compare decoded features against ANALYTIC DuckDB oracles,
so a mis-parsed header field or padding byte flips the gate red.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib
from collections.abc import Iterator

import numpy as np
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


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_decode(blob_bytes: bytes) -> np.ndarray:
    """REAL PNG decode with the stdlib only: chunk walk, zlib inflate of
    the concatenated IDAT stream, and per-row unfiltering (all 5 filter
    types: None/Sub/Up/Average/Paeth).  Scope: 8-bit depth, color type 2
    (truecolor RGB), non-interlaced — the common case; anything else
    raises NotImplementedError rather than mis-decoding."""
    pos = len(_PNG_MAGIC)
    idat = b""
    w = h = depth = ctype = interlace = None
    while pos + 8 <= len(blob_bytes):
        (clen,), ctag = struct.unpack_from(">I", blob_bytes, pos), blob_bytes[pos + 4 : pos + 8]
        body = blob_bytes[pos + 8 : pos + 8 + clen]
        pos += 12 + clen  # len + tag + body + crc
        if ctag == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(">IIBBBBB", body)
        elif ctag == b"IDAT":
            idat += body
        elif ctag == b"IEND":
            break
    if w is None:
        raise NotImplementedError("PNG missing IHDR")
    if depth != 8 or ctype != 2 or interlace != 0:
        raise NotImplementedError(
            f"PNG depth={depth} color_type={ctype} interlace={interlace} unsupported "
            "(8-bit truecolor non-interlaced only)"
        )
    raw = zlib.decompress(idat)
    bpp, stride = 3, w * 3
    img = np.empty((h, w, 3), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for r in range(h):
        ftype = raw[r * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=r * (stride + 1) + 1
        ).astype(np.int32)
        if ftype == 0:
            cur = line
        elif ftype == 1:  # Sub: per-channel running sum mod 256
            cur = line.reshape(w, bpp).cumsum(axis=0).astype(np.int32).reshape(stride) % 256
        elif ftype == 2:  # Up
            cur = (line + prev) % 256
        elif ftype in (3, 4):  # Average / Paeth: sequential in x
            cur = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                if ftype == 3:
                    cur[i] = (line[i] + (a + b) // 2) % 256
                else:
                    c = prev[i - bpp] if i >= bpp else 0
                    cur[i] = (line[i] + _paeth(int(a), int(b), int(c))) % 256
        else:
            raise NotImplementedError(f"PNG filter type {ftype}")
        img[r] = cur.astype(np.uint8).reshape(w, 3)
        prev = cur
    return img


def decode_image(blob_bytes: bytes) -> np.ndarray:
    """Image decode -> HxWx3 uint8 RGB array.

    REAL for uncompressed 24-bit BMP (``BM`` magic: BITMAPFILEHEADER +
    BITMAPINFOHEADER parsed with struct; rows stored bottom-up, each
    padded to a 4-byte boundary, pixels BGR), for 8-bit truecolor PNG
    (stdlib zlib inflate + per-row unfilter — a genuinely COMPRESSED
    format, no codec libs needed), and — round 12 — for baseline
    sequential 4:4:4 JPEG (operators/jpeg_codec: stream-supplied
    quant/Huffman tables, numpy IDCT; round 13 widened it to any
    spec-legal sampling factors — 4:2:0/4:2:2 multi-block MCUs — plus
    DRI/RSTn restart intervals).  JPEG shapes the native decoder still
    refuses (progressive, arithmetic coding) and
    other formats (WebP/...) capability-probe PIL: on a cluster with
    Pillow installed they decode through it; in this container the
    probe fails and the documented NotImplementedError remains.  Every
    caller goes through this one seam."""
    png_err: NotImplementedError | None = None
    jpeg_err: NotImplementedError | None = None
    if blob_bytes[:2] == b"\xff\xd8":
        from .jpeg_codec import jpeg_decode  # noqa: PLC0415

        try:
            return jpeg_decode(blob_bytes)
        except NotImplementedError as e:
            jpeg_err = e  # a shape only the Pillow tier handles
    if blob_bytes[: len(_PNG_MAGIC)] == _PNG_MAGIC:
        try:
            return _png_decode(blob_bytes)
        except NotImplementedError as e:
            # PNG variant the stdlib path doesn't cover (grayscale/
            # palette/16-bit/interlaced): fall through to the Pillow
            # probe below instead of failing where Pillow exists; keep
            # the specific error for the no-Pillow raise
            png_err = e
    if blob_bytes[:2] == b"BM":
        off, = struct.unpack_from("<I", blob_bytes, 10)
        hdr_size, w, h = struct.unpack_from("<Iii", blob_bytes, 14)
        planes, bpp = struct.unpack_from("<HH", blob_bytes, 26)
        compression, = struct.unpack_from("<I", blob_bytes, 30)
        if bpp != 24 or compression != 0:
            raise NotImplementedError(f"BMP bpp={bpp} compression={compression} unsupported")
        bottom_up = h > 0
        h = abs(h)
        row_bytes = (w * 3 + 3) & ~3  # each row padded to 4 bytes
        img = np.empty((h, w, 3), dtype=np.uint8)
        for r in range(h):
            row = np.frombuffer(blob_bytes, dtype=np.uint8, count=w * 3, offset=off + r * row_bytes)
            dst = (h - 1 - r) if bottom_up else r
            img[dst] = row.reshape(w, 3)[:, ::-1]  # BGR -> RGB
        return img
    # Capability probe: decode anything else through Pillow when the
    # environment provides it (differential-gated the same way — the
    # analytic oracle doesn't care which decoder produced the pixels).
    try:
        from PIL import Image  # noqa: PLC0415

        return np.asarray(Image.open(io.BytesIO(blob_bytes)).convert("RGB"))
    except ImportError:
        pass
    if png_err is not None:
        raise png_err  # the specific unsupported-PNG-variant message
    if jpeg_err is not None:
        raise jpeg_err  # the specific unsupported-JPEG-shape message
    raise NotImplementedError(
        "BMP, 8-bit RGB PNG, and baseline 4:4:4 JPEG decode natively; "
        "progressive/subsampled JPEG and WebP need Pillow, which this "
        "container lacks — the import probe above is the seam"
    )


def decode_audio(blob_bytes: bytes) -> tuple[np.ndarray, int]:
    """Audio decode -> (samples int numpy array [n, channels], rate).

    REAL for RIFF/PCM WAV (stdlib ``wave``: container parse, 8/16/32-bit
    PCM) and — round 12 — for FLAC with CONSTANT/VERBATIM subframes
    (operators/flac_codec, the native tier that finally exercises a
    compressed codec in every environment; samples scale to soundfile's
    int32 convention, << (32 - bps), so the two tiers are numerically
    interchangeable).  FLAC shapes the native decoder refuses
    (FIXED/LPC prediction, stereo decorrelation) and other compressed
    audio (MP3/AAC/OGG) fall through to the soundfile capability probe
    and raise NotImplementedError where it is absent."""
    if blob_bytes[:4] == b"RIFF" and blob_bytes[8:12] == b"WAVE":
        with wave.open(io.BytesIO(blob_bytes), "rb") as w:
            n, ch, width, rate = w.getnframes(), w.getnchannels(), w.getsampwidth(), w.getframerate()
            raw = w.readframes(n)
        dtype = {1: np.uint8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}.get(width)
        if dtype is None:
            raise NotImplementedError(f"PCM sample width {width} unsupported")
        samples = np.frombuffer(raw, dtype=dtype).reshape(-1, ch).astype(np.int64)
        if width == 1:  # 8-bit WAV is unsigned, center it
            samples = samples - 128
        return samples, rate
    flac_err: NotImplementedError | None = None
    if blob_bytes[:4] == b"fLaC":
        from .flac_codec import flac_decode  # noqa: PLC0415

        try:
            samples, rate, bps = flac_decode(blob_bytes)
            return samples << (32 - bps), rate
        except NotImplementedError as e:
            flac_err = e  # a shape only the soundfile tier handles
    # Capability probe: decode compressed audio through soundfile when
    # the environment provides it.
    try:
        import soundfile as sf  # noqa: PLC0415

        data, rate = sf.read(io.BytesIO(blob_bytes), dtype="int32", always_2d=True)
        return data.astype(np.int64), int(rate)
    except ImportError:
        pass
    if flac_err is not None:
        raise flac_err
    raise NotImplementedError(
        "RIFF/PCM WAV and CONSTANT/VERBATIM FLAC decode natively; "
        "MP3/AAC/OGG and predicted/decorrelated FLAC need soundfile, "
        "which this container lacks — the import probe above is the seam"
    )


def synth_wav(doc_id: int) -> bytes:
    """Deterministic mono 16-bit PCM WAV blob for gate synthesis: a square
    wave with amplitude, length, and rate derived from doc_id.  The RIFF
    container is written BY HAND (struct) so the ``wave``-module reader in
    :func:`decode_audio` exercises an independent parse — shared-bug
    cancellation between writer and reader can't hide a header error from
    the analytic oracle."""
    a = 100 + doc_id % 900
    n = 200 + doc_id % 64
    rate = 8000 + (doc_id % 4) * 4000
    samples = np.where(np.arange(n) % 2 == 0, a, -a).astype("<i2")
    data = samples.tobytes()
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        # PCM fmt chunk: size 16, format 1, 1 channel, rate, byte-rate,
        # block align 2, 16 bits per sample
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def synth_bmp(doc_id: int) -> bytes:
    """Deterministic 24-bit uncompressed BMP for gate synthesis: dims and
    per-pixel RGB derived from (x, y, doc_id).  Written by hand per the
    BMP spec — bottom-up rows, BGR byte order, rows padded to 4 bytes —
    so :func:`decode_image` must undo all three to match the oracle."""
    w = 4 + doc_id % 13
    h = 4 + doc_id % 11
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    r = (x * 7 + y * 13 + doc_id) % 256
    g = (x * 11 + y * 3 + 2 * doc_id) % 256
    b = (x * 5 + y * 17 + 3 * doc_id) % 256
    rgb = np.stack(np.broadcast_arrays(r, g, b), axis=-1).astype(np.uint8)
    row_bytes = (w * 3 + 3) & ~3
    pad = b"\x00" * (row_bytes - w * 3)
    # bottom-up: last image row first; BGR
    body = b"".join(rgb[row, :, ::-1].tobytes() + pad for row in range(h - 1, -1, -1))
    off = 14 + 40
    return (
        b"BM"
        + struct.pack("<IHHI", off + len(body), 0, 0, off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
        + body
    )


def synth_png(doc_id: int) -> bytes:
    """Deterministic 8-bit RGB PNG for gate synthesis: dims and per-pixel
    RGB derived from (x, y, doc_id), written by a hand-rolled encoder —
    chunk framing + CRCs by hand, per-row filter type cycling
    ``(doc_id + row) % 5`` so every unfilter path (None/Sub/Up/Average/
    Paeth) in :func:`_png_decode` is exercised, then one zlib deflate.
    The filtering arithmetic here is the forward transform; the decoder
    implements the inverse independently, and the analytic oracle checks
    the round trip from doc_id arithmetic alone."""
    w = 4 + doc_id % 12
    h = 5 + doc_id % 9  # >= 5 rows: every filter type appears
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    r = (x * 3 + y * 19 + doc_id) % 256
    g = (x * 13 + y * 7 + 5 * doc_id) % 256
    b = (x * 17 + y * 11 + 7 * doc_id) % 256
    rgb = np.stack(np.broadcast_arrays(r, g, b), axis=-1).astype(np.int32)
    bpp, stride = 3, w * 3
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for row in range(h):
        cur = rgb[row].reshape(stride)
        ftype = (doc_id + row) % 5
        if ftype == 0:
            filt = cur % 256
        elif ftype == 1:
            left = np.concatenate([np.zeros(bpp, dtype=np.int32), cur[:-bpp]])
            filt = (cur - left) % 256
        elif ftype == 2:
            filt = (cur - prev) % 256
        elif ftype == 3:
            left = np.concatenate([np.zeros(bpp, dtype=np.int32), cur[:-bpp]])
            filt = (cur - (left + prev) // 2) % 256
        else:
            filt = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                bb = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                filt[i] = (cur[i] - _paeth(int(a), int(bb), int(c))) % 256
        raw.append(ftype)
        raw.extend(filt.astype(np.uint8).tobytes())
        prev = cur

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def audio_decode_features(
    df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob"
) -> DataFrame:
    """Real WAV decode + feature extraction over Arrow batches: every blob
    parsed by :func:`decode_audio`, features reduced with numpy.  rms_sq
    is the exact integer mean of squares (square-wave synthesis keeps it
    integral); wsum = sum(s_i * (i+1)) pins sample ORDER and signedness,
    not just magnitudes."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[blob_col]):
                samples, rate = decode_audio(bytes(blob))
                mono = samples[:, 0]
                n = len(mono)
                rows.append(
                    (
                        int(i),
                        n,
                        rate,
                        int(np.abs(mono).max()) if n else 0,
                        int((mono * mono).sum() // n) if n else 0,
                        int((mono * (np.arange(n) + 1)).sum()),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[id_col, "n_samples", "sample_rate", "peak", "rms_sq", "wsum"]
            )

    return df.select(id_col, blob_col).mapInPandas(
        extract,
        schema=f"{id_col} long, n_samples long, sample_rate long, peak long, rms_sq long, wsum long",
    )


def image_decode_stats(
    df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob"
) -> DataFrame:
    """Real BMP decode + stats over Arrow batches: width/height from the
    header, px_sum over every channel, and a position-weighted sum
    wsum = sum((x+1)(y+1)(r + 2g + 3b)) that pins row order, BGR->RGB
    swap, and padding handling (a pure px_sum is order-invariant and
    would let symmetric writer/reader bugs cancel)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[blob_col]):
                img = decode_image(bytes(blob)).astype(np.int64)
                h, w, _ = img.shape
                xw = np.arange(1, w + 1)[None, :]
                yw = np.arange(1, h + 1)[:, None]
                chan = img[:, :, 0] + 2 * img[:, :, 1] + 3 * img[:, :, 2]
                rows.append(
                    (int(i), w, h, int(img.sum()), int((chan * xw * yw).sum()))
                )
            yield pd.DataFrame(rows, columns=[id_col, "width", "height", "px_sum", "wsum"])

    return df.select(id_col, blob_col).mapInPandas(
        extract,
        schema=f"{id_col} long, width long, height long, px_sum long, wsum long",
    )


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


def _write_bmp24(rgb: np.ndarray) -> bytes:
    """Serialize an HxWx3 uint8 RGB array as an uncompressed 24-bit BMP
    (bottom-up rows, BGR, 4-byte row padding — the synth writers' core)."""
    h, w, _ = rgb.shape
    row_bytes = (w * 3 + 3) & ~3
    pad = b"\x00" * (row_bytes - w * 3)
    body = b"".join(rgb[row, :, ::-1].tobytes() + pad for row in range(h - 1, -1, -1))
    off = 14 + 40
    return (
        b"BM"
        + struct.pack("<IHHI", off + len(body), 0, 0, off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
        + body
    )


def synth_bmp_near_dup(doc_id: int) -> bytes:
    """Perceptual-dedup fixture: 16x16 BMP whose pixels derive from the
    doc's GROUP base (groups of 5 consecutive doc_ids); members 1-4
    additionally shift one pixel's red channel.  Within a group the
    images are near-identical (aHash Hamming <= 2); across groups the
    patterns differ everywhere (Hamming ~32)."""
    base = doc_id - doc_id % 5
    w = h = 16
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    r = (x * 7 + y * 13 + base) % 256
    g = (x * 11 + y * 3 + 2 * base) % 256
    b = (x * 5 + y * 17 + 3 * base) % 256
    rgb = np.stack(np.broadcast_arrays(r, g, b), axis=-1).astype(np.uint8)
    k = doc_id % 5
    if k:
        rgb[k, k, 0] = (int(rgb[k, k, 0]) + 8) % 256
    return _write_bmp24(rgb)


def ahash_band_pairs(
    hashed, id_col: str = "doc_id", hash_col: str = "ah", max_hamming: int = 3
):
    """Near-dup pairs (id_a < id_b, hamming <= max_hamming) over a table
    of 64-bit perceptual hashes via 4x16 PIGEONHOLE BANDING: Hamming
    <= 3 over 64 bits guarantees at least one of the four 16-bit
    quarters is identical, so candidates come from 4 bucket-equijoins
    on (quarter_index, quarter_value) — never an all-pairs product —
    then the exact Hamming (bit_count of xor) filters and dedups.
    Total recall for max_hamming <= 3 by the pigeonhole principle
    (ceil(64/16)=4 bands tolerate 4-1 flips); shared by the real-decode
    path (mm_ahash_dedup_pairs) and the oracle-backed hash-table gate
    (mm_ahash_pairs_from_hashes).  At 100 TB the equijoin shuffles slim
    (id, long) rows and each bucket holds hash-sharing docs only."""
    import pyspark.sql.functions as F

    if max_hamming > 3:
        raise ValueError(
            f"ahash_band_pairs: 4x16 banding only guarantees recall for "
            f"hamming <= 3, got max_hamming={max_hamming}"
        )
    quarters = hashed.select(
        F.col(id_col).alias("_id"),
        F.col(hash_col).alias("_ah"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(q).alias("q"),
                        F.shiftright(hash_col, q * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("qv"),
                    )
                    for q in range(4)
                ]
            )
        ).alias("qq"),
    ).select("_id", "_ah", F.col("qq.q").alias("q"), F.col("qq.qv").alias("qv"))
    a = quarters.select(F.col("_id").alias("doc_a"), F.col("_ah").alias("ah_a"), "q", "qv")
    b = quarters.select(F.col("_id").alias("doc_b"), F.col("_ah").alias("ah_b"), "q", "qv")
    # cast: Spark bit_count is INT, DuckDB's is BIGINT — long on both
    hamming = F.bit_count(F.col("ah_a").bitwiseXOR(F.col("ah_b"))).cast("long")
    return (
        a.join(b, on=["q", "qv"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def ahash64(img: np.ndarray) -> int:
    """Average hash (aHash) of an RGB image: luminance proxy r+2g+b,
    8x8 grid of block SUMS over the (cropped-to-multiple-of-8) frame,
    bit_k = 64*block_k > total (strict, integer-exact — no float means),
    MSB = top-left block.  Returned as a SIGNED 64-bit int (Spark
    LongType).  Near-duplicate frames (re-encodes, small edits,
    resizes) keep small Hamming distance — the classic image-dedup
    sketch, the visual sibling of text SimHash.

    Frames narrower than the 8x8 grid are upscaled nearest-neighbor
    first (h<8 or w<8 previously crashed the reshape: bh=1 but the
    crop img[:8] yielded fewer than 8 rows)."""
    h, w, _ = img.shape
    if h < 1 or w < 1:
        raise ValueError(f"ahash64: empty frame {h}x{w}")
    if h < 8:
        img = np.repeat(img, -(-8 // h), axis=0)
    if w < 8:
        img = np.repeat(img, -(-8 // w), axis=1)
    h, w, _ = img.shape
    bh, bw = max(h // 8, 1), max(w // 8, 1)
    g = img[: bh * 8, : bw * 8].astype(np.int64)
    gray = g[:, :, 0] + 2 * g[:, :, 1] + g[:, :, 2]
    blocks = gray.reshape(8, bh, 8, bw).sum(axis=(1, 3))
    total = int(blocks.sum())
    bits = (64 * blocks.reshape(64) > total)
    out = 0
    for bit in bits:
        out = (out << 1) | int(bit)
    return out - (1 << 64) if out >= (1 << 63) else out


def audio_spectral_features(
    df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob"
) -> DataFrame:
    """Real spectral FEATURE EXTRACTION over decoded audio (round 7):
    per clip, the magnitude spectrum via numpy's rFFT reduced to the
    three features audio curation pipelines filter on — spectral
    CENTROID (brightness), BANDWIDTH (spread around the centroid), and
    85% ROLLOFF (the frequency below which 85% of spectral mass sits).
    Extends the decode family (bytes -> samples) with the
    samples -> features step the brief's "decode / feature-extract"
    pair names; no external DSP library — rfft/rfftfreq are numpy
    built-ins, exercised inside the same Arrow-batched mapInPandas
    shape as :func:`audio_decode_features`.

    Accuracy is pytest-pinned by DIFFERENTIAL against an explicit
    O(n^2) DFT summation (independent code path — a windowing,
    normalization, or binning bug in this operator cannot cancel in
    the reference), plus the analytic fact that a period-2 square wave
    concentrates its spectrum at Nyquist.  The gate is rows-only: no
    SQL engine FFTs."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[blob_col]):
                samples, rate = decode_audio(bytes(blob))
                mono = samples[:, 0].astype(np.float64)
                n = len(mono)
                if n == 0:
                    rows.append((int(i), 0, rate, 0.0, 0.0, 0.0))
                    continue
                mag = np.abs(np.fft.rfft(mono))
                freq = np.fft.rfftfreq(n, d=1.0 / rate)
                total = mag.sum()
                if total <= 0:
                    rows.append((int(i), n, rate, 0.0, 0.0, 0.0))
                    continue
                centroid = float((freq * mag).sum() / total)
                bandwidth = float(
                    np.sqrt(((freq - centroid) ** 2 * mag).sum() / total)
                )
                rolloff = float(freq[np.searchsorted(np.cumsum(mag), 0.85 * total)])
                rows.append((int(i), n, rate, centroid, bandwidth, rolloff))
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "n_samples", "sample_rate",
                    "centroid_hz", "bandwidth_hz", "rolloff85_hz",
                ],
            )

    return df.select(id_col, blob_col).mapInPandas(
        extract,
        schema=(
            f"{id_col} long, n_samples long, sample_rate long, "
            "centroid_hz double, bandwidth_hz double, rolloff85_hz double"
        ),
    )


# -- round 9: capability-probed compressed-codec seam -------------------------


def pil_available() -> bool:
    """Capability probe for the Pillow decode path in decode_image —
    queries/multimodal.py registers the JPEG gate only when this
    succeeds, so the gate exercises the probe-SUCCESS branch on
    clusters that ship Pillow and stays honestly absent (not silently
    green) where it can't run."""
    try:
        from PIL import Image  # noqa: F401, PLC0415

        return True
    except ImportError:
        return False


def soundfile_available() -> bool:
    """Capability probe for the soundfile decode path in decode_audio
    (same registration discipline as :func:`pil_available`)."""
    try:
        import soundfile  # noqa: F401, PLC0415

        return True
    except ImportError:
        return False


def _jpeg_gradient_rgb(doc_id: int) -> np.ndarray:
    """The deterministic smooth per-doc gradient both JPEG synths
    encode (smooth rather than synth_bmp's mod-256 ramps: JPEG is
    lossy, so gates pin decoded DIMENSIONS exactly and channel means
    within a tolerance, never exact pixels)."""
    w = 16 + doc_id % 13
    h = 16 + doc_id % 11
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    r = np.clip(40 + x * 2 + doc_id % 64, 0, 255)
    g = np.clip(60 + y * 3 + (2 * doc_id) % 64, 0, 255)
    b = np.clip(80 + x + y + (3 * doc_id) % 64, 0, 255)
    return np.stack(np.broadcast_arrays(r, g, b), axis=-1).astype(np.uint8)


def synth_jpeg_native(doc_id: int, quality: int = 90) -> bytes:
    """Deterministic JPEG blob via the NATIVE baseline encoder (round
    12 — no capability gate): the same gradient as synth_jpeg, encoded
    by operators/jpeg_codec.  Round 13: the CHROMA SUBSAMPLING rotates
    by doc_id through 4:4:4 / 4:2:2 / 4:2:0, so the corpus-wide gate
    decodes genuinely interleaved multi-block-MCU streams — the
    dominant in-the-wild JPEG shape — in every environment.  The
    gate's stats tolerate the (bounded, pinned) chroma error; decoded
    DIMENSIONS stay exact for every rotation (and the restart interval
    rotates 0/1/4, so DRI/RSTn markers decode natively too).  The
    Pillow probe remains the tier for shapes the native pair doesn't
    cover (progressive, arithmetic)."""
    from .jpeg_codec import jpeg_encode

    # 9-doc rotation covers the full subsampling x restart cross product
    subsampling = ("444", "422", "420")[doc_id % 3]
    restart_interval = (0, 1, 4)[(doc_id % 9) // 3]
    return jpeg_encode(
        _jpeg_gradient_rgb(doc_id),
        quality=quality,
        subsampling=subsampling,
        restart_interval=restart_interval,
    )


def synth_jpeg(doc_id: int, quality: int = 90) -> bytes:
    """Deterministic JPEG blob via Pillow (capability-gated — callers
    must have passed :func:`pil_available`).  A smooth per-doc gradient
    rather than synth_bmp's mod-256 ramps: JPEG is lossy, so the gate's
    pytest pins decoded DIMENSIONS exactly and channel means within a
    tolerance, never exact pixels."""
    import io as _io

    from PIL import Image  # noqa: PLC0415

    buf = _io.BytesIO()
    Image.fromarray(_jpeg_gradient_rgb(doc_id)).save(
        buf, format="JPEG", quality=quality
    )
    return buf.getvalue()


def synth_flac_native(doc_id: int) -> bytes:
    """Deterministic FLAC blob via the NATIVE encoder (round 12 — no
    capability gate): the SAME square wave as synth_wav, packed as one
    FLAC frame with real CRCs.  Round 13: the SUBFRAME CODING rotates by
    doc_id across the spec's whole mono repertoire — VERBATIM,
    FIXED orders 0..4 (Rice-coded residuals, varying partition orders),
    and quantized-coefficient LPC — so the corpus-wide gate decodes
    every predicted-subframe shape in every environment, not just the
    uncompressed one.  FLAC is lossless, so the decoded samples are
    identical whichever coding a doc_id lands on, and the pytest
    differential still pins the EXACT scaling relation to the WAV gate
    (max_abs x 2^16, wsum x 2^16, rms_sq x 2^32) — integer-exact, not a
    tolerance."""
    from .flac_codec import flac_encode

    a = 100 + doc_id % 900
    n = 200 + doc_id % 64
    rate = 8000 + (doc_id % 4) * 4000
    samples = np.where(np.arange(n) % 2 == 0, a, -a).astype(np.int16)
    coding = doc_id % 7
    if coding == 0:
        return flac_encode(samples, rate)
    if coding <= 5:  # FIXED orders 0..4; po=1 when the blocksize divides
        po = 1 if n % 2 == 0 else 0
        return flac_encode(
            samples, rate, subframe="fixed", order=coding - 1, partition_order=po
        )
    return flac_encode(samples, rate, subframe="lpc", order=2)


def synth_flac(doc_id: int) -> bytes:
    """Deterministic FLAC blob via soundfile (capability-gated): the
    SAME square wave as synth_wav.  FLAC is lossless, but decode_audio's
    soundfile branch reads dtype='int32', which left-shifts 16-bit
    samples by 16 — so the pytest differential pins the EXACT scaling
    relation to the WAV gate (max_abs x 2^16, wsum x 2^16, rms_sq x
    2^32), integer-exact, not a tolerance."""
    import io as _io

    import soundfile as sf  # noqa: PLC0415

    a = 100 + doc_id % 900
    n = 200 + doc_id % 64
    rate = 8000 + (doc_id % 4) * 4000
    samples = np.where(np.arange(n) % 2 == 0, a, -a).astype(np.int16)
    buf = _io.BytesIO()
    sf.write(buf, samples, rate, format="FLAC", subtype="PCM_16")
    return buf.getvalue()
