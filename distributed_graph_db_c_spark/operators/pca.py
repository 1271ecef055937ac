"""Principal-component analysis over an embedding column (round 8).

The missing piece between the similarity stack (cosine pairs, ANN,
centroids, int8 quantization) and an ML pipeline: dimensionality
reduction for visualization, drift monitoring, and cheap pre-filters.
PCA at 100 TB decomposes into

1. a COVARIANCE MATRIX — one pass over the corpus producing a d x d
   summary (d=64 here: 2,080 upper-triangle entries), the classic
   partial-aggregate shape: each partition emits its moment sums, the
   driver merges (bounded collect: n_partitions tiny rows — the
   hll/bloom class);
2. an EIGENDECOMPOSITION of that d x d matrix — microseconds on the
   driver, never distributed;
3. a PROJECTION map stage — per-row dot products against broadcast
   components, zero shuffle.

Determinism is by EXACTNESS, not by ordering discipline: components are
quantized to w = floor(x * 2^20 + 0.5) (an exact float64 op), and every moment
(sum w_i, sum w_i*w_j) is an exact INTEGER — products bounded by 2^44,
block-summed in float64 (256-row blocks keep partials under 2^53 where
float64 is exact) and accumulated into Python ints (arbitrary
precision).  Partial sums cross to the driver as STRINGS so no Arrow
int64 overflow exists at any row count.  Exact integers make the
covariance bit-identical under ANY partitioning — the same property the
decimal ladders buy the relational gates — and give the gate a real
DuckDB oracle (same quantization in SQL).

The 2^-20 quantization bias on unit-scale float32 embeddings is ~1e-6
relative — far below the sampling noise any covariance estimate carries;
the CONTRACT is "covariance of the 2^-20-quantized corpus", stated
exactly and reproduced exactly by the oracle.

No reference citation: the reference (SURVEY.md §1) has no vector
surface; this is §2.3 extension surface beside operators/similarity.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_SCALE_BITS = 20
_SCALE = float(1 << _SCALE_BITS)
_BLOCK = 256  # 256 * 2^44 < 2^53: block sums stay exact in float64


def covariance_moments(df: DataFrame, col: str = "embedding", dim: int = 64) -> DataFrame:
    """One row per input partition: exact integer moment sums of the
    2^-20-quantized embeddings — ``n`` (rows), ``s`` (d sums, decimal
    strings), ``m`` (d*(d+1)/2 upper-triangle product sums, decimal
    strings).  Strings because partition-level sums outgrow int64 at
    ~2^19 rows x full-scale components; exactness may not depend on the
    partition size."""

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = [0] * dim
        iu = np.triu_indices(dim)
        m = [0] * len(iu[0])
        for pdf in batches:
            w = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[col]]
            ) if len(pdf) else np.zeros((0, dim))
            # floor(x*s + 0.5), NOT rint: numpy rint rounds half-to-even
            # while SQL round() is half-away-from-zero — floor(+0.5) is
            # the one form every engine computes identically (ties are
            # real: float32 * 2^20 is exact in float64 and can land on
            # .5 exactly)
            w = np.floor(w * _SCALE + 0.5)  # exact float64 integers
            n += w.shape[0]
            # exactness BY CONSTRUCTION, not by data luck: block sums
            # must stay under 2^53 where float64 is exact, so the block
            # size adapts to the observed magnitude (unit-scale
            # embeddings give |w| <= 2^20 -> the full 256-row block;
            # pathological inputs just get smaller blocks, never a
            # silently inexact sum)
            wmax = float(np.abs(w).max()) if w.size else 0.0
            # The adaptive block bounds the SUM of products under 2^53,
            # but floors at 1 row — and a SINGLE product w_i*w_j is
            # itself inexact in float64 once the factors' SIGNIFICANT
            # bits total > 53.  Magnitude alone doesn't decide this:
            # float32-derived columns carry <= 24-bit significands, so
            # their products stay exact (<= 48 bits) at ANY |x| — the
            # large-magnitude pytest's regime — while a double-typed
            # column with |w| > 2^26 of FULL significance breaks
            # silently.  Shrinking the block can't save that case, so
            # measure the widest significand in the batch and refuse
            # loudly instead of violating the "never a silently inexact
            # sum" / partitioning-independence contract (r9 advisory).
            if w.size:
                v = np.abs(w[w != 0.0])
                if v.size:
                    mant, exp = np.frexp(v)  # v = mant * 2^exp, mant in [0.5,1)
                    m53 = (mant * (2.0**53)).astype(np.int64)  # exact: 53-bit ints
                    tz = np.log2((m53 & -m53).astype(np.float64)).astype(np.int64)
                    max_sig = int((53 - tz).max())
                    if 2 * max_sig > 53:
                        raise ValueError(
                            f"covariance_moments: a quantized component carries"
                            f" {max_sig} significant bits; a single product"
                            " would exceed float64's 53-bit exact range. The"
                            " column must be float32-derived or unit-scale"
                            " (<= 26 significant bits after 2^20 quantization)."
                        )
            nrows = (
                _BLOCK
                if wmax <= 1.0
                else max(1, min(_BLOCK, int((2.0**53) // (wmax * wmax))))
            )
            for lo in range(0, w.shape[0], nrows):
                blk = w[lo : lo + nrows]
                bs = blk.sum(axis=0)  # <= nrows * wmax : exact
                bm = (blk.T @ blk)[iu]  # <= nrows * wmax^2 < 2^53 : exact
                for k in range(dim):
                    s[k] += int(bs[k])
                for k in range(len(m)):
                    m[k] += int(bm[k])
        yield pd.DataFrame(
            {
                "n": [n],
                "s": [[str(v) for v in s]],
                "m": [[str(v) for v in m]],
            }
        )

    return df.select(col).mapInPandas(
        summarize, schema="n long, s array<string>, m array<string>"
    )


def covariance_merge(moments: DataFrame, dim: int = 64):
    """Merge partition moment rows (bounded collect) into
    ``(n, sums[d], prods[upper-tri])`` exact Python ints."""
    iu = np.triu_indices(dim)
    n = 0
    s = [0] * dim
    m = [0] * len(iu[0])
    for row in moments.collect():  # n_partitions tiny rows
        n += row["n"]
        for k, v in enumerate(row["s"]):
            s[k] += int(v)
        for k, v in enumerate(row["m"]):
            m[k] += int(v)
    return n, s, m


def covariance_matrix(n: int, s: list[int], m: list[int], dim: int = 64) -> np.ndarray:
    """Sample covariance (ddof=1) of the quantized corpus, float64,
    from exact integer moments: cov_ij = (S_ij - S_i*S_j/n) / (n-1),
    descaled by 2^40.  The double arithmetic happens once, on exact
    integer inputs — bit-identical on every engine and partitioning."""
    iu = np.triu_indices(dim)
    cov = np.zeros((dim, dim))
    for k in range(len(m)):
        i, j = int(iu[0][k]), int(iu[1][k])
        c = (float(m[k]) - float(s[i]) * float(s[j]) / n) / (n - 1)
        cov[i, j] = cov[j, i] = c / (_SCALE * _SCALE)
    return cov


def pca_components(cov: np.ndarray, k: int = 2) -> np.ndarray:
    """Top-k eigenvectors of the covariance (driver-side, d x d is
    microseconds), SIGN-NORMALIZED: the entry of largest magnitude in
    each component is made positive (ties broken by lowest index), so
    the factorization is unique and runs reproduce bit-identically —
    eigenvectors are otherwise only defined up to sign."""
    vals, vecs = np.linalg.eigh(cov)  # ascending
    comps = vecs[:, ::-1][:, :k].T  # (k, d), leading first
    for c in comps:
        pivot = int(np.argmax(np.abs(c)))
        if c[pivot] < 0:
            c *= -1.0
    return comps


def pca_project(
    df: DataFrame, comps: np.ndarray, col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Project each embedding onto the (broadcast-as-literals) principal
    components: a pure map stage — per-row left-fold dot products in
    codegen, no Python, no shuffle, deterministic per row (the fold
    order is the dimension order).  Output: (id, pc0.., rounded 8)."""
    out = [F.col(id_col)]
    for ci, c in enumerate(comps):
        acc = None
        for k, w in enumerate(c):
            term = F.element_at(col, k + 1).cast("double") * F.lit(float(w))
            acc = term if acc is None else acc + term
        out.append(F.round(acc, 8).alias(f"pc{ci}"))
    return df.select(*out)
