"""Property tests for the deletion-neighborhood fuzzy join: completeness
and precision vs brute-force Levenshtein on random string sets."""

from __future__ import annotations

import random

import pyspark.sql.functions as F

from distributed_graph_db_c_spark.operators.fuzzy import (
    deletion_variants,
    fuzzy_join_edit1,
)


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _random_words(rng, n, alphabet="abcd", lo=1, hi=7):
    return sorted(
        {"".join(rng.choice(alphabet) for _ in range(rng.randint(lo, hi))) for _ in range(n)}
    )


def test_fuzzy_join_matches_bruteforce_on_random_sets(spark):
    # small alphabet forces many near-collisions: the adversarial regime
    rng = random.Random(42)
    left = _random_words(rng, 60)
    right = _random_words(rng, 60)
    ldf = spark.createDataFrame([(w,) for w in left], "q string")
    rdf = spark.createDataFrame([(w,) for w in right], "d string")
    got = {
        (r["q"], r["d"]): r["dist"]
        for r in fuzzy_join_edit1(ldf, rdf, "q", "d").collect()
    }
    want = {
        (a, b): _lev(a, b) for a in left for b in right if _lev(a, b) <= 1
    }
    assert got == want  # completeness AND precision AND exact distances


def test_deletion_variants_shape(spark):
    rows = spark.createDataFrame([("abc",)], "s string").select(
        deletion_variants(F.col("s")).alias("v")
    ).collect()
    assert sorted(rows[0]["v"]) == ["ab", "abc", "ac", "bc"]


def test_empty_and_single_char(spark):
    # "" matches any single char (one insertion) and itself
    ldf = spark.createDataFrame([("",), ("a",)], "q string")
    rdf = spark.createDataFrame([("",), ("a",), ("b",), ("ab",)], "d string")
    got = {(r["q"], r["d"]) for r in fuzzy_join_edit1(ldf, rdf, "q", "d").collect()}
    want = {
        (a, b)
        for a in ["", "a"]
        for b in ["", "a", "b", "ab"]
        if _lev(a, b) <= 1
    }
    assert got == want
