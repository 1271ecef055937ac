"""Vector math over ``array<float>`` embedding columns.

Determinism contract: the dot product is a *sequential left fold* over the
array elements, entirely within one row — Spark's ``aggregate`` and
DuckDB's ``list_reduce`` both fold left-to-right, and each float->double
conversion and double multiply/add is IEEE-correctly-rounded, so the two
engines produce bit-identical doubles.  (No decimal ladder needed: unlike
cross-row SUMs, a per-row fold has a fixed order on any partitioning, on
one node or a thousand.)

All JVM higher-order functions — zip_with/aggregate stay inside codegen;
no Python in the brute-force scoring path.
"""

from __future__ import annotations

import pyspark.sql.functions as F


def dot_seq(a: F.Column, b: F.Column) -> F.Column:
    """Sequential-fold dot product -> double (bit-deterministic)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm2_seq(a: F.Column) -> F.Column:
    return F.sqrt(dot_seq(a, a))


def cosine_seq(a: F.Column, b: F.Column) -> F.Column:
    return dot_seq(a, b) / (norm2_seq(a) * norm2_seq(b))


# DuckDB mirror: same left fold via list_reduce (0.0 + x0 == x0 exactly, so
# the missing explicit init cannot change the bits).
def dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(generate_series(1, len({a})), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (acc, x) -> acc + x)"
    )
