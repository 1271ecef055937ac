"""salted_join must equal the plain join exactly, including duplicate-row
multiplicity, on a deliberately skewed key distribution."""

from __future__ import annotations

from collections import Counter

import pyspark.sql.functions as F

from distributed_graph_db_c_spark.operators.skew import salted_join


def test_salted_join_equals_plain_join(spark):
    # 5000 fact rows, 90% on one hot key; dim has multiplicity (key 1 twice)
    fact = spark.range(5000).select(
        F.when(F.col("id") % 10 < 9, 1).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("fact_id"),
    )
    dim = spark.createDataFrame(
        [(1, "hot"), (1, "hot2"), (41, "cold"), (99, "never")], "k long, label string"
    )
    plain = Counter(tuple(r) for r in fact.join(dim, on="k").collect())
    salted = Counter(
        tuple(r) for r in salted_join(fact, dim, on="k", fact_unique_col="fact_id").collect()
    )
    assert salted == plain
    assert sum(plain.values()) > 9000  # hot key matched twice per fact row
