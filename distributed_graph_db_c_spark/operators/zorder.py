"""Z-order (Morton) layout: multi-column data skipping for parquet.

A sort on ONE column gives tight per-file min/max stats on that column and
useless stats on every other; a filter on a second column then prunes
nothing.  Interleaving the bits of two bucketized sort keys (the Morton
code) makes files cluster in BOTH dimensions at once, so range filters on
either column — or both — skip most files from footer stats alone.  This
is the layout trick behind Delta/Iceberg Z-ORDER compaction, expressed
here as plain codegen column arithmetic + a range-partitioned sorted
write (no table format required; SURVEY.md §2.2 sinks).

The reference has no storage layout control at all (whole-file text
matrices); this is part of the §2.3 scale surface.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def bucketize(col: Column, lo: Column | int, hi: Column | int, bits: int) -> Column:
    """Map a numeric column into [0, 2^bits) by linear min/max scaling —
    the coarse quantization Morton interleaving needs.  lo/hi are the
    column's global min/max (one tiny stats job at write time)."""
    n = (1 << bits) - 1
    span = F.lit(hi).cast("double") - F.lit(lo).cast("double")
    scaled = (col.cast("double") - F.lit(lo).cast("double")) / F.when(
        F.lit(span) > 0, span
    ).otherwise(F.lit(1.0))
    return F.least(
        F.lit(n).cast("long"),
        F.greatest(F.lit(0).cast("long"), F.floor(scaled * n).cast("long")),
    )


def morton_code(a: Column, b: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two bucketized longs:
    bit i of ``a`` lands at position 2i, bit i of ``b`` at 2i+1.
    Pure shift/mask arithmetic — whole-stage codegen, no UDF."""
    code = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        bbit = F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        code = code.bitwiseOR(abit).bitwiseOR(bbit)
    return code


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    bits: int = 16,
    n_files: int = 16,
) -> None:
    """Write ``df`` as parquet laid out by the Morton code of
    (col_a, col_b): range-partition on the code (contiguous z-ranges per
    file) and sort within partitions (tight row-group stats inside each
    file).  One stats job collects the two min/max pairs; everything else
    is a single range-shuffle + local sort — the same cost as a plain
    global sort, spent twice as well."""
    def numeric(name: str) -> Column:
        # temporal columns bucketize by their epoch value (session tz is
        # pinned UTC by the loaders, so this is deterministic)
        dt = dict(df.dtypes)[name]
        if dt.startswith("timestamp"):
            return F.unix_micros(F.col(name).cast("timestamp"))
        if dt == "date":
            return F.unix_date(F.col(name))
        return F.col(name)

    na, nb = numeric(col_a), numeric(col_b)
    lo_a, hi_a, lo_b, hi_b = df.select(
        F.min(na), F.max(na), F.min(nb), F.max(nb)
    ).first()
    z = morton_code(
        bucketize(na, lo_a, hi_a, bits),
        bucketize(nb, lo_b, hi_b, bits),
        bits,
    )
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
