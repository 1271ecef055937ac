"""Exact-integer Lloyd k-means over an embedding column (round 9).

The clustering primitive under corpus curation at 100 TB: cluster-
balanced sampling, SemDeDup-style cluster-then-dedup, drift cohorts,
IVF quantizer training.  Spark has no built-in SQL k-means, and the
textbook float implementation is PARTITIONING-DEPENDENT (centroid means
are cross-row float sums, and float addition is not associative), which
would violate this engine's determinism contract the same way naive
double SUMs would.

This implementation is INTEGER ARITHMETIC END-TO-END, the pca.py
discipline applied to an iterative algorithm:

- inputs quantize once to w = floor(x * 2^20 + 0.5) (the one rounding
  form every engine computes identically) as ``array<long>`` — a
  codegen map stage, no Python;
- ASSIGNMENT is argmin of the exact integer squared euclidean distance
  ||w - c||^2 (64 dims x (2^22)^2 < 2^50: int64-exact), ties to the
  lowest centroid index — a pure integer function of (row, centroids),
  so identical on every partitioning, executor count, and engine;
- CENTROID UPDATE sums assigned vectors per partition into
  arbitrary-precision Python ints shipped as STRINGS (no row count can
  overflow the transfer), merges them on the driver (bounded:
  k x n_partitions tiny rows), and re-quantizes the mean with one
  deterministic integer rule: c' = (2*s + n) // (2*n), i.e.
  floor(s/n + 1/2) — no float touches the state that crosses
  iterations;
- INIT is the IVF coarse quantizer's deterministic sample: the k
  vectors with the smallest md5(id) (no RNG, no training-order
  dependence).

Result: the entire fixed point — assignments, centroids, inertia — is
bit-identical under ANY partitioning, pinned by pytest at two partition
counts and against a pure-Python replica of the same integer
arithmetic.  Iterations are driver-loop supersteps (one mapInPandas
merge per iteration — the BFS/CC pattern); per-iteration cost is one
scan + a k x d integer summary per partition, the sketch class.

The 2^-20 quantization changes the objective by ~1e-6 relative on
unit-scale embeddings — the contract is "k-means of the quantized
corpus", stated exactly (the covariance gate's argument).

No reference citation: the reference (SURVEY.md §1) has no vector or
ML surface; this is §2.3 extension surface beside operators/pca.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_SCALE_BITS = 20

MAX_ITERS = 8


def quantized(df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """One codegen pass: the 2^-20-quantized integer vectors."""
    return df.select(
        id_col,
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(x.cast("double") * float(1 << _SCALE_BITS) + F.lit(0.5)).cast(
                "long"
            ),
        ).alias("w"),
    )


def init_centroids(
    df: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> list[list[int]]:
    """Deterministic pseudo-random init: the k quantized vectors with
    the smallest md5(id) — the ivf_assign rule, RNG-free."""
    rows = (
        quantized(df, id_col, vec_col)
        .withColumn("_h", F.md5(F.col(id_col).cast("string")))
        .orderBy("_h", id_col)
        .limit(k)
        .collect()
    )
    return [[int(v) for v in r["w"]] for r in rows]


def _moments(assigned: DataFrame, dim: int) -> list:
    """Per-(partition, cluster) exact integer sums, merged driver-side.
    Returns [(cluster, n, sums[dim] ints, inertia int)] — inertia is
    the exact integer sum of ||w - c||^2 of the CURRENT assignment."""

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict[int, list] = {}
        for pdf in batches:
            for cl, grp in pdf.groupby("cluster"):
                w = np.stack([np.asarray(v, dtype=np.int64) for v in grp["w"]])
                a = acc.setdefault(int(cl), [0, [0] * dim, 0])
                a[0] += w.shape[0]
                # column sums are <= rows * 2^21 per block; accumulate
                # into Python ints for arbitrary precision
                cs = w.sum(axis=0)
                for i in range(dim):
                    a[1][i] += int(cs[i])
                # row-wise into Python ints: per-row d2 < 2^50, so a
                # numpy int64 sum can silently wrap past ~8k same-
                # cluster rows in one Arrow batch (the kmeans_summary
                # decimal(38,0) guard, applied to the fit path too)
                a[2] += int(grp["d2"].astype(object).sum())
        yield pd.DataFrame(
            [
                (cl, a[0], [str(v) for v in a[1]], str(a[2]))
                for cl, a in acc.items()
            ],
            columns=["cluster", "n", "s", "inertia"],
        )

    rows = assigned.mapInPandas(
        summarize, schema="cluster int, n long, s array<string>, inertia string"
    ).collect()
    return rows


def _assign_with_d2(cents: list[list[int]]):
    c = np.asarray(cents, dtype=np.int64)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            w = np.stack([np.asarray(v, dtype=np.int64) for v in pdf["w"]])
            d2 = ((w[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            am = np.argmin(d2, axis=1)
            yield pdf.assign(
                cluster=am.astype("int32"),
                d2=d2[np.arange(len(am)), am],
            )

    return assign


def _assign_and_moments(cents: list[list[int]], dim: int):
    """Fused assignment + per-(partition, cluster) moment summary for the
    fit loop (round 15, guide §4): the split formulation chained TWO
    ``mapInPandas`` evals per iteration, shipping every row's
    ``array<long>`` vector JVM->Python->JVM->Python — the intermediate
    assigned frame crossed the boundary solely to be re-grouped.  One
    eval computes the same integer argmin assignment and accumulates the
    same exact-integer sums (numpy int64 per batch-group block, merged
    into arbitrary-precision Python ints — identical magnitudes, so the
    same no-overflow argument), yielding only k tiny summary rows per
    partition.  Centroids, inertia and the fixed point are bit-identical
    to the split path; only boundary bytes change."""
    c = np.asarray(cents, dtype=np.int64)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict[int, list] = {}
        for pdf in batches:
            if not len(pdf):
                continue
            w = np.stack([np.asarray(v, dtype=np.int64) for v in pdf["w"]])
            d2 = ((w[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            am = np.argmin(d2, axis=1)
            d2m = d2[np.arange(len(am)), am]
            for cl in np.unique(am):
                mask = am == cl
                a = acc.setdefault(int(cl), [0, [0] * dim, 0])
                a[0] += int(mask.sum())
                # per-block column sums <= rows * 2^21: int64-safe, then
                # accumulated into Python ints for arbitrary precision
                cs = w[mask].sum(axis=0)
                for i in range(dim):
                    a[1][i] += int(cs[i])
                # row-wise d2 < 2^50 into Python ints (the kmeans_summary
                # decimal(38,0) guard, applied per block)
                a[2] += sum(int(x) for x in d2m[mask])
        yield pd.DataFrame(
            [
                (cl, a[0], [str(v) for v in a[1]], str(a[2]))
                for cl, a in acc.items()
            ],
            columns=["cluster", "n", "s", "inertia"],
        )

    return run


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    max_iters: int = MAX_ITERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> tuple[list[list[int]], int, int]:
    """Lloyd iterations to a fixed point or ``max_iters``.  Returns
    (quantized integer centroids, iterations run, exact integer
    inertia).  Each iteration is one scan emitting k x n_partitions
    summary rows; the update happens ONCE on the driver from exact
    integers, so the centroid state is engine- and partitioning-
    independent.  Empty clusters keep their previous centroid (the
    deterministic convention).

    Inertia semantics: the returned inertia is ASSIGNMENT-TIME — the
    objective of the LAST assignment pass, measured against the
    centroids that produced it.  At a fixed point the two coincide; if
    ``max_iters`` is exhausted first, the returned centroids are the
    post-update state while the inertia is pre-update (one assignment
    pass behind).  Callers needing the post-update objective run
    kmeans_summary against the returned centroids."""
    if max_iters < 1:
        raise ValueError(f"max_iters must be >= 1, got {max_iters}")
    q = quantized(df, id_col, vec_col).persist()
    try:
        cents = init_centroids(df, k, id_col, vec_col)
        last_inertia: int | None = None
        iters = 0
        for _ in range(max_iters):
            iters += 1
            moment_rows = q.mapInPandas(
                _assign_and_moments(cents, dim),
                schema="cluster int, n long, s array<string>, inertia string",
            ).collect()
            merged: dict[int, list] = {}
            for r in moment_rows:
                a = merged.setdefault(int(r["cluster"]), [0, [0] * dim, 0])
                a[0] += int(r["n"])
                for i, v in enumerate(r["s"]):
                    a[1][i] += int(v)
                a[2] += int(r["inertia"])
            inertia = sum(a[2] for a in merged.values())
            new_cents = list(cents)
            for cl, (n, s, _unused) in merged.items():
                if n > 0:
                    # floor(s/n + 1/2) in exact ints (works for negative
                    # s too: Python // floors toward -inf consistently)
                    new_cents[cl] = [(2 * sv + n) // (2 * n) for sv in s]
            if new_cents == cents and last_inertia == inertia:
                break
            cents, last_inertia = new_cents, inertia
        return cents, iters, int(last_inertia if last_inertia is not None else inertia)
    finally:
        q.unpersist()


def kmeans_assign(
    df: DataFrame,
    cents: list[list[int]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One assignment pass against fitted integer centroids ->
    (id, cluster).  Pure integer per-row function: deterministic on any
    partitioning and engine."""
    q = quantized(df, id_col, vec_col)
    return q.mapInPandas(
        _assign_with_d2(cents),
        schema=f"{id_col} long, w array<long>, cluster int, d2 long",
    ).select(id_col, "cluster")


def kmeans_summary(
    df: DataFrame,
    cents: list[list[int]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Final assignment pass -> per-cluster summary: size, exact id
    checksum (proves the exact membership SET, not just counts — the
    hash_split discipline), and the exact integer inertia share."""
    q = quantized(df, id_col, vec_col)
    assigned = q.mapInPandas(
        _assign_with_d2(cents), schema=f"{id_col} long, w array<long>, cluster int, d2 long"
    )
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count("*").alias("n_vecs"),
            F.sum(id_col).alias("id_checksum"),
            # decimal ladder: per-row d2 < 2^50, so a long SUM would
            # overflow past ~8k rows per cluster at full magnitude —
            # decimal(38,0) is integer-exact to 10^38
            F.sum(F.col("d2").cast("decimal(38,0)")).alias("inertia_q"),
        )
        .select(
            F.col("cluster").cast("long").alias("cluster"),
            "n_vecs",
            "id_checksum",
            "inertia_q",
        )
    )
