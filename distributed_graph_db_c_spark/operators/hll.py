"""Register-level HyperLogLog with SET ALGEBRA (round 7).

Spark's built-in ``approx_count_distinct`` answers one question —
|distinct| of one column — and keeps its sketch opaque: you cannot union
two sketches built separately, and you cannot intersect at all.  Corpus
curation needs both: "how many of the eval set's documents appear in the
training corpus?" is an INTERSECTION cardinality over sets far too large
to join exactly at 100 TB.  This module implements the classic
register-array HLL (Flajolet et al. 2007 estimator with the small-range
linear-counting correction) so sketches become first-class mergeable
values:

- ``hll_sketch``: one ``mapInPandas`` pass emits ONE row per input
  partition — a 2^p-byte register array (numpy: md5-derived 64-bit
  hashes, top p bits pick the register, leading-zero rank of the rest
  max-merges into it).  The shuffle carries n_partitions * 2^p bytes,
  never values.
- ``merge_registers``: elementwise max over register arrays — the union
  operation.  Associative, commutative, idempotent, so ANY merge tree
  gives bit-identical registers: the sketch of A ∪ B EQUALS the merge of
  independent sketches of A and B, exactly (pytest-pinned), and the
  whole pipeline is deterministic under any partitioning.
- ``hll_estimate``: the standard alpha_m * m^2 / sum(2^-M) estimator,
  linear counting below the 2.5m small-range threshold.
- ``hll_intersect_estimate``: inclusion–exclusion |A| + |B| - |A ∪ B| —
  the standard HLL intersection (error grows as the true overlap
  shrinks relative to the union; the gate pins the regime it is fit
  for).

No reference citation: the reference (SURVEY.md §2.1) has no
aggregation surface; sketches are driver-mandated extension surface
(§2.3), and the union/intersection algebra is the piece the built-in
cannot express.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _hash64(values: pd.Series) -> np.ndarray:
    """Deterministic 64-bit hashes via md5 (no RNG state, identical on
    every executor forever — the same discipline as the LSH planes)."""
    return np.fromiter(
        (
            int.from_bytes(hashlib.md5(str(v).encode()).digest()[:8], "big")
            for v in values
        ),
        dtype=np.uint64,
        count=len(values),
    )


def _clz64(x: np.ndarray) -> np.ndarray:
    """Leading-zero count of nonzero uint64 values, pure integer ops
    (binary search on shifts).  float64 log2 is off-by-one near powers
    of two above 2^53 and rounds values within 2^11 of 2^64 up to
    exactly 2^64 (rank 0 — a silently dropped register update); the
    module advertises bit-exact determinism, so no floats here."""
    x = x.copy()
    n = np.zeros(len(x), dtype=np.uint8)
    for s in (32, 16, 8, 4, 2, 1):
        m = x < (np.uint64(1) << np.uint64(64 - s))  # top s bits all zero
        n[m] += s
        x[m] = x[m] << np.uint64(s)
    return n


def _registers_for(values: pd.Series, p: int) -> np.ndarray:
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(values) == 0:
        return regs
    h = _hash64(values)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    # rank = leading zeros of the remaining (64-p)-bit string + 1,
    # capped at 64-p+1 for the all-zero remainder
    nbits = 64 - p
    rank = np.full(len(h), nbits + 1, dtype=np.uint8)
    nz = rest != 0
    rank[nz] = _clz64(rest[nz]) + 1
    np.maximum.at(regs, idx, rank)
    return regs


def hll_sketch(df: DataFrame, col: str, p: int = 12) -> DataFrame:
    """Per-partition HLL register arrays for ``df[col]`` — a DataFrame
    of ``(registers binary)`` with one row per input partition; merge
    with :func:`merge_registers` (or any groupBy max-merge) to the
    corpus sketch.  Nulls count as the string token "None" (a sketch
    over keys treats null as one more key)."""
    m = 1 << p

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        regs = np.zeros(m, dtype=np.uint8)
        for pdf in batches:
            regs = np.maximum(regs, _registers_for(pdf[col], p))
        yield pd.DataFrame({"registers": [regs.tobytes()]})

    return df.select(F.col(col).cast("string").alias(col)).mapInPandas(
        summarize, schema="registers binary"
    )


def merge_registers(sketches: DataFrame, p: int = 12) -> bytes:
    """Union: elementwise max over every register row.  The input is
    n_partitions tiny rows (2^p bytes each) — the one place a bounded
    collect is correct, the same class as the bloom-bitmap collect."""
    m = 1 << p
    out = np.zeros(m, dtype=np.uint8)
    for row in sketches.collect():  # n_partitions rows of 2^p bytes
        out = np.maximum(out, np.frombuffer(bytes(row["registers"]), dtype=np.uint8))
    return out.tobytes()


def hll_estimate(registers: bytes) -> float:
    """Standard HLL estimator with the small-range linear-counting
    correction (Flajolet et al. 2007)."""
    regs = np.frombuffer(registers, dtype=np.uint8)
    m = len(regs)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.power(2.0, -regs.astype(np.float64)).sum()
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def hll_union_estimate(a: bytes, b: bytes) -> float:
    ra = np.frombuffer(a, dtype=np.uint8)
    rb = np.frombuffer(b, dtype=np.uint8)
    return hll_estimate(np.maximum(ra, rb).tobytes())


def hll_intersect_estimate(a: bytes, b: bytes) -> float:
    """Inclusion–exclusion intersection estimate |A| + |B| - |A ∪ B|.
    Relative error grows as true_overlap / |A ∪ B| shrinks (three
    estimator errors stack on a small difference) — fit for overlap
    RATES of a few percent and up, which is the contamination-screening
    regime; exact joins remain the tool below that."""
    return max(0.0, hll_estimate(a) + hll_estimate(b) - hll_union_estimate(a, b))
