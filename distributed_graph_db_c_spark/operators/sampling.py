"""Deterministic content-hash sampling and dataset splitting (training-
pipeline surface, SURVEY.md §2.3 family).

Why not ``df.sample``/``sampleBy``: seeded RNG sampling is deterministic
only for a FIXED partitioning — a repartition, AQE re-plan, or scale-up
silently changes the sample.  Hashing the row KEY makes membership a pure
function of the data: stable across partitionings, engines, runs, and
incremental loads (a new batch's rows join the same split their key maps
to).  That stability is what a reproducible train/val/test split means.

Mechanism: the first 2 hex chars of md5(key) give a uniform bucket in
[0x00, 0xff]; split boundaries are hex-string thresholds compared
LEXICOGRAPHICALLY (identical semantics in every engine — no hex->int cast
that differs between SQL dialects, which is also why the DuckDB oracle
can check these exactly).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _bucket(key_col: str) -> F.Column:
    return F.substring(F.md5(F.col(key_col).cast("string")), 1, 2)


def hash_sample(df: DataFrame, key_col: str, threshold_hex: str) -> DataFrame:
    """Keep rows whose md5-bucket < ``threshold_hex`` (2 lowercase hex
    chars): '1a' keeps ~26/256 ~ 10.2%.  Fraction granularity is 1/256;
    use more prefix chars for finer control."""
    return df.filter(_bucket(key_col) < F.lit(threshold_hex))


def hash_split(
    df: DataFrame,
    key_col: str,
    boundaries: dict[str, str] | None = None,
    split_col: str = "split",
) -> DataFrame:
    """Assign every row a split label by its md5 bucket.  ``boundaries``
    maps label -> exclusive upper hex bound, checked in ascending order;
    the default is ~80/10/10 train/val/test ('cc'=204/256, 'e6'=230/256).
    """
    bounds = boundaries or {"train": "cc", "val": "e6", "test": "zz"}
    b = _bucket(key_col)
    expr = None
    # First matching when-clause wins, so evaluate bounds in ascending hex
    # order regardless of the dict's iteration order — an unordered caller
    # dict must not silently reassign rows to the widest bound.
    for label, hi in sorted(bounds.items(), key=lambda kv: kv[1]):
        cond = b < F.lit(hi)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    return df.withColumn(split_col, expr)


def bucket_sql(key_col: str) -> str:
    """DuckDB fragment computing the identical bucket (oracle side)."""
    return f"substr(md5(CAST({key_col} AS VARCHAR)), 1, 2)"


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    group_col: str,
    thresholds: dict[str, str],
    default_hex: str = "00",
) -> DataFrame:
    """Per-stratum deterministic sampling: each group keeps rows whose
    md5 bucket falls under ITS OWN hex threshold — the domain-mixing /
    rebalancing step of corpus preparation (e.g. keep 80%% of en, 20%%
    of fr), with the same partitioning-stable hash-membership guarantee
    as :func:`hash_sample`.  Groups not in ``thresholds`` keep
    ``default_hex`` (none by default)."""
    b = _bucket(key_col)
    expr = F.lit(default_hex)
    for grp, hi in sorted(thresholds.items()):
        expr = F.when(F.col(group_col) == grp, F.lit(hi)).otherwise(expr)
    return df.filter(b < expr)
