"""Round-15 optimization pins: the fused single-pass internals must be
observably identical to the multi-pass formulations they replaced.

- ``bucketing.count_and_distinct`` vs ``count()`` + ``distinct().count()``
  (including NULL and duplicate cases — NULLs collapse to ONE distinct
  value, exactly the ``distinct()`` semantics the refusal checks relied
  on);
- ``kmeans._assign_and_moments`` (one Python eval per fit iteration) vs
  the split ``_assign_with_d2`` -> ``_moments`` chain it replaced: same
  merged per-cluster counts, exact integer sums, and inertia.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from distributed_graph_db_c_spark.operators.bucketing import count_and_distinct


def test_count_and_distinct_matches_two_pass(spark):
    cases = [
        [(1,), (2,), (3,)],
        [(1,), (1,), (2,)],
        [(None,), (1,), (2,)],
        [(None,), (None,), (1,)],
        [],
    ]
    for rows in cases:
        df = spark.createDataFrame(rows, "id int") if rows else (
            spark.createDataFrame([], "id int")
        )
        n, d = count_and_distinct(df, "id")
        assert n == df.count()
        assert d == df.select("id").distinct().count()


def test_fused_assign_moments_matches_split(spark):
    from distributed_graph_db_c_spark.operators.kmeans import (
        _assign_and_moments,
        _assign_with_d2,
        _moments,
        quantized,
    )

    dim = 4
    rows = [
        (i, [float(i % 5) * 0.25, 1.0 - i * 0.01, float(i % 3), 0.5])
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = quantized(df).repartition(3)
    cents = [[0, 1 << 20, 0, 1 << 19], [1 << 20, 0, 1 << 21, 1 << 19]]

    def merge(rows_):
        merged: dict[int, list] = {}
        for r in rows_:
            a = merged.setdefault(int(r["cluster"]), [0, [0] * dim, 0])
            a[0] += int(r["n"])
            for i, v in enumerate(r["s"]):
                a[1][i] += int(v)
            a[2] += int(r["inertia"])
        return merged

    split = merge(
        _moments(
            q.mapInPandas(
                _assign_with_d2(cents),
                schema="vec_id long, w array<long>, cluster int, d2 long",
            ),
            dim,
        )
    )
    fused = merge(
        q.mapInPandas(
            _assign_and_moments(cents, dim),
            schema="cluster int, n long, s array<string>, inertia string",
        ).collect()
    )
    assert split == fused
