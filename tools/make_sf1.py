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
- embeddings: keys offset; each copy's vector is multiplied elementwise
  by a copy-specific deterministic ±1 sign pattern — cos(s⊙v, s⊙w) ==
  cos(v, w), so within-copy geometry (and every norm) is EXACTLY
  preserved, while cross-copy cosines get a random ±1 reweighting and
  concentrate near 0.  (A first attempt used cyclic rotation; real
  embeddings are structured enough that rotations stay correlated, which
  manufactured ~17k cross-copy "near-dups" and a fake quadratic blowup.)
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

    # Tiny dimensions pass through UNSCALED (a 10x fixture scales facts,
    # not dims — nation/region are fixed-domain, supplier joins as a
    # broadcast dim everywhere).  Round 7: stream_static_join_enrich
    # failed at sf1 for want of nation.parquet; the dims ride along now.
    import shutil

    for t in ("nation", "region", "supplier"):
        src, dst = f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet"
        if os.path.isdir(src):
            shutil.copytree(src, dst, dirs_exist_ok=True)
        else:
            shutil.copy(src, dst)

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
    import hashlib

    def signs(i: int) -> list[float]:
        # deterministic per (copy, dim) ±1 pattern; copy 0 = identity
        if i == 0:
            return [1.0] * emb_dim
        return [
            1.0
            if hashlib.md5(f"{i}:{k}".encode()).digest()[0] & 1
            else -1.0
            for k in range(emb_dim)
        ]

    copies(
        "embeddings",
        lambda df, i: df.select(
            (F.col("vec_id") + i * KEY_OFF).alias("vec_id"),
            F.zip_with(
                "embedding",
                F.array(*[F.lit(s) for s in signs(i)]),
                lambda x, s: (x * s).cast("float"),
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
    # part: offset keys only — brand/size/price DOMAINS deliberately stay
    # fixed (25 brands, 50 sizes), so the round-6 domain-agg gates
    # (frequent-items, skyline) scale by scan volume while their summary
    # sizes stay constant: the honest shape for a dimension table
    copies(
        "part",
        lambda df, i: df.withColumn("p_partkey", F.col("p_partkey") + i * KEY_OFF),
    )
    # events: offset event AND user keys, timestamps unchanged — 10x the
    # user population with per-user histories intact, so sessionization /
    # funnel / per-user windows scale by key cardinality (the honest
    # shape) rather than by 10x-denser single-user timelines
    copies(
        "events",
        lambda df, i: df.withColumn(
            "event_id", F.col("event_id") + i * KEY_OFF
        ).withColumn("user_id", F.col("user_id") + i * CUST_OFF),
    )
    spark.stop()


if __name__ == "__main__":
    main()
