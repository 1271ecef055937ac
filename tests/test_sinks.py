"""Layout-aware sink: partition dirs exist, read-back equals source,
files are internally sorted (tight row-group stats), file sizes bounded."""

from __future__ import annotations

import glob
import os

import pyspark.sql.functions as F

from distributed_graph_db_c_spark.sinks import write_partitioned
from distributed_graph_db_c_spark.sources.tables import load_table
from distributed_graph_db_c_spark.streaming.sources import cleanup, scratch_dir

SF_DIR = "/root/testdata/sf0.001"


def test_partitioned_sorted_layout(spark):
    scratch = scratch_dir("sink")
    out = f"{scratch}/orders"
    try:
        src = load_table(spark, SF_DIR, "orders")
        write_partitioned(
            src,
            out,
            partition_cols=["o_orderstatus"],
            sort_cols=["o_orderdate"],
            max_records_per_file=500,
        )
        # partition directories per status value
        dirs = {os.path.basename(d) for d in glob.glob(f"{out}/o_orderstatus=*")}
        statuses = {r[0] for r in src.select("o_orderstatus").distinct().collect()}
        assert dirs == {f"o_orderstatus={s}" for s in statuses}
        # read-back fidelity (partition column round-trips via the dir)
        got = spark.read.parquet(out)
        assert sorted(map(tuple, got.select(*src.columns).collect())) == sorted(
            map(tuple, src.collect())
        )
        # maxRecordsPerFile honoured
        for f in glob.glob(f"{out}/o_orderstatus=*/*.parquet"):
            n = spark.read.parquet(f).count()
            assert n <= 500, (f, n)
        # each file internally sorted on the sort column
        a_file = glob.glob(f"{out}/o_orderstatus=*/*.parquet")[0]
        rows = [r[0] for r in spark.read.parquet(a_file).select("o_orderdate").collect()]
        assert rows == sorted(rows)
        # partition pruning visible in the plan
        plan = (
            got.filter(F.col("o_orderstatus") == "F")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # r15: pin the user predicate reaching PartitionFilters — the
        # old isnotnull(o_orderstatus) prefix was an inferred-constraint
        # artifact that vanished with
        # spark.sql.constraintPropagation.enabled=false (session.py);
        # pruning itself rides the EqualTo
        assert "PartitionFilters: [" in plan
        import re as _re

        pf = _re.search(r"PartitionFilters: \[[^\]]*\]", plan).group(0)
        # ADVICE r15: "= F" matched any filter ending in an F-token and
        # would break if the literal ever renders quoted — pin the
        # attribute = literal form (optional quotes) instead
        assert _re.search(r"o_orderstatus#\d+ = '?F'?\b", pf), pf
    finally:
        cleanup(scratch)
