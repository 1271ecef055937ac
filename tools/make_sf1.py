"""Materialize a synthetic sf1 (~10x sf0.1) under .scratch/sf1 for the
scale-validation spot-run (tools/bench_sf1.py -> BENCH_SF1.md).

Only the five tables the heaviest batch queries touch are built.  Each is
10 offset-keyed copies of the sf0.1 table, perturbed so the WORKLOAD SHAPE
scales honestly instead of degenerating:

- documents: keys offset; each copy's text passes through a distinct
  alphabet-rotation substitution cipher (length-, structure-, and
  within-copy-duplication-preserving) so cross-copy shingle Jaccard is ~0
  — a naive 10x copy would make every doc a 10-clique of near-dups and
  the pair output would grow ~45x/doc instead of the organic ~10x.
- embeddings: keys offset; each copy's vector is cyclically rotated by
  its copy index — norms and within-copy geometry are exactly preserved,
  cross-copy cosine decorrelates, so the LSH bucket load scales ~10x
  instead of every bucket holding 10 identical twins.
- orders / lineitem / customer: keys offset per copy (custkey offsets
  keep orders-per-customer identical — join fan-outs scale, skew shape
  does not change).

This is a PERFORMANCE fixture only — correctness gates never read it.
"""

from __future__ import annotations

import os
import string
import sys

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distributed_graph_db_c_spark.session import get_spark  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "sf1"
)
N_COPIES = 10
KEY_OFF = 1_000_000_000
CUST_OFF = 100_000_000


def rotated_alphabet(i: int) -> str:
    a = string.ascii_lowercase
    return a[i:] + a[:i]


def main() -> None:
    spark = get_spark("make-sf1")
    os.makedirs(DST, exist_ok=True)

    emb_dim = len(
        spark.read.parquet(f"{SRC}/embeddings.parquet").first()["embedding"]
    )

    def copies(table: str, f):
        df = spark.read.parquet(f"{SRC}/{table}.parquet")
        out = f(df, 0)
        for i in range(1, N_COPIES):
            out = out.unionByName(f(df, i))
        out.write.mode("overwrite").parquet(f"{DST}/{table}.parquet")
        print(table, spark.read.parquet(f"{DST}/{table}.parquet").count())

    copies(
        "documents",
        lambda df, i: df.select(
            (F.col("doc_id") + i * KEY_OFF).alias("doc_id"),
            F.translate(
                "text", string.ascii_lowercase, rotated_alphabet(i)
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        ),
    )
    copies(
        "embeddings",
        lambda df, i: df.select(
            (F.col("vec_id") + i * KEY_OFF).alias("vec_id"),
            (
                F.col("embedding")
                if i == 0
                else F.concat(
                    F.slice("embedding", i + 1, emb_dim - i),
                    F.slice("embedding", 1, i),
                )
            ).alias("embedding"),
            "label",
        ),
    )
    copies(
        "customer",
        lambda df, i: df.withColumn("c_custkey", F.col("c_custkey") + i * CUST_OFF),
    )
    copies(
        "orders",
        lambda df, i: df.withColumn(
            "o_orderkey", F.col("o_orderkey") + i * KEY_OFF
        ).withColumn("o_custkey", F.col("o_custkey") + i * CUST_OFF),
    )
    copies(
        "lineitem",
        lambda df, i: df.withColumn("l_orderkey", F.col("l_orderkey") + i * KEY_OFF),
    )
    spark.stop()


if __name__ == "__main__":
    main()
