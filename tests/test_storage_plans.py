"""Plan pins for runtime-pruning storage paths that the generated-record
plan audit can't cover (their plans exist only between a scratch write
and its cleanup)."""

from __future__ import annotations

import pyspark.sql.functions as F

from distributed_graph_db_c_spark.sources.tables import load_table
from distributed_graph_db_c_spark.streaming.sources import cleanup, scratch_dir

SF_DIR = "/root/testdata/sf0.01"


def test_dpp_subquery_in_plan_and_partition_scan_pruned(spark):
    """The priority-partitioned fact joined to a filtered dim must carry
    a dynamicpruning subquery on the partition column, and executing it
    must read only the 2 selected partitions' rows."""
    orders = load_table(spark, SF_DIR, "orders")
    scratch = scratch_dir("dppplan")
    try:
        orders.write.mode("overwrite").partitionBy("o_orderpriority").parquet(
            f"{scratch}/t"
        )
        fact = spark.read.parquet(f"{scratch}/t")
        dim = (
            orders.select("o_orderpriority")
            .distinct()
            .filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        )
        joined = fact.join(F.broadcast(dim), on="o_orderpriority")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" in plan.lower(), plan[:2000]
        # pruning is semantics-invisible: row count == plain filter
        expect = orders.filter(
            F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
        ).count()
        assert joined.count() == expect
    finally:
        cleanup(scratch)
