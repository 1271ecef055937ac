"""Fuzzy string join within edit distance 1 — the deletion-neighborhood
(FastSS / SymSpell-style) decomposition, on DataFrames.

A naive fuzzy join is a cross join with a Levenshtein filter: O(|A|x|B|)
distance evaluations — dead at scale.  The deletion-neighborhood identity
makes it an EQUIJOIN: two strings s, t with levenshtein(s, t) <= 1 always
share a member of variants(x) = {x} ∪ {x with one char deleted}:

- s == t:            share s itself
- one substitution:  deleting the differing position from both gives the
                     same string
- one insert/delete: deleting the inserted char from the longer side
                     yields the shorter side verbatim

So: explode both sides into their (len+1) variants, hash-equijoin on the
variant, then verify the survivors with the exact ``levenshtein``
(collisions like "ab"~"ba" pass the variant join but fail verification)
and dedupe.  Work is O(rows x avg_len) variant rows through one exchange
— the same candidates-then-verify shape as the MinHash and LSH dedup
operators in this package.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def deletion_variants(s: F.Column) -> F.Column:
    """array<string>: the string itself plus every single-deletion form."""
    dels = F.transform(
        F.sequence(F.lit(1), F.length(s)),
        lambda i: F.concat(
            F.substring(s, F.lit(1), i - 1),
            F.substring(s, i + 1, F.length(s)),
        ),
    )
    return F.array_distinct(F.concat(F.array(s), dels))


def fuzzy_join_edit1(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
) -> DataFrame:
    """All (left, right) string pairs with levenshtein <= 1, as columns
    ``(left_col, right_col, dist)``.  Inputs should be pre-deduped
    (variants explode per row)."""
    lv = left.select(
        F.col(left_col), F.explode(deletion_variants(F.col(left_col))).alias("_v")
    )
    rv = right.select(
        F.col(right_col), F.explode(deletion_variants(F.col(right_col))).alias("_v")
    )
    return (
        lv.join(rv, "_v")
        .drop("_v")
        .dropDuplicates([left_col, right_col])
        .withColumn("dist", F.levenshtein(F.col(left_col), F.col(right_col)).cast("long"))
        .filter(F.col("dist") <= 1)
    )
