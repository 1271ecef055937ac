"""Z-order layout: the SKIPPING property, measured on real parquet footer
metadata — not just a round trip.  A linear sort on column A leaves every
file's column-B range spanning ~the whole domain (no pruning for B
filters); the Morton layout must leave per-file ranges narrow on BOTH
dimensions."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pyspark.sql.functions as F

from distributed_graph_db_c_spark.operators.zorder import morton_code, write_zordered
from distributed_graph_db_c_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.01"


def _file_ranges(path: str, col: str) -> list[tuple[float, float]]:
    """Per-file (min, max) of ``col`` from parquet footer statistics."""
    out = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        lo = hi = None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        if lo is not None:
            out.append((lo, hi))
    return out


def _mean_span_fraction(ranges: list[tuple[float, float]]) -> float:
    glo = min(r[0] for r in ranges)
    ghi = max(r[1] for r in ranges)
    width = (ghi - glo) or 1
    return sum((hi - lo) / width for lo, hi in ranges) / len(ranges)


def test_morton_code_interleaves_bits(spark):
    df = spark.range(1).select(
        morton_code(F.lit(0b101).cast("long"), F.lit(0b011).cast("long"), bits=3).alias("z")
    )
    # a=101, b=011 -> z bit layout (b2 a2 b1 a1 b0 a0) = 0 1 1 0 1 1
    assert df.first()["z"] == 0b011011


def test_zorder_files_narrow_on_both_dims(spark, tmp_path):
    """Both sort keys must land tight per-file footer ranges under the
    Morton layout, while a plain sort on custkey leaves orderkey (a column
    uncorrelated with it) spanning ~every file.  16 files over sf0.01
    orders; spans are averaged fractions of the global domain."""
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    zpath = str(tmp_path / "z")
    spath = str(tmp_path / "s")
    write_zordered(orders, zpath, "o_custkey", "o_orderkey", n_files=16)
    (
        orders.repartitionByRange(16, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(spath)
    )

    z_cust = _mean_span_fraction(_file_ranges(zpath, "o_custkey"))
    z_key = _mean_span_fraction(_file_ranges(zpath, "o_orderkey"))
    s_cust = _mean_span_fraction(_file_ranges(spath, "o_custkey"))
    s_key = _mean_span_fraction(_file_ranges(spath, "o_orderkey"))

    # linear sort: perfect on its own key, useless on the other
    assert s_cust < 0.2
    assert s_key > 0.8
    # z-order: BOTH dims well under the linear sort's unsorted dim —
    # a range filter on either column prunes most files from stats alone
    assert z_cust < 0.5, z_cust
    assert z_key < 0.5, z_key
    assert z_cust * z_key < s_cust * s_key * 5  # balanced, not degenerate


def test_zorder_roundtrip_preserves_rows(spark, tmp_path):
    orders = load_table(spark, SF_DIR, "orders")
    path = str(tmp_path / "rt")
    write_zordered(orders, path, "o_custkey", "o_orderdate", n_files=8)
    back = spark.read.parquet(path)
    assert back.count() == orders.count()
    a = orders.agg(F.sum("o_orderkey")).first()[0]
    b = back.agg(F.sum("o_orderkey")).first()[0]
    assert a == b
