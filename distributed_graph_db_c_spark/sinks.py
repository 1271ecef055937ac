"""Layout-aware parquet sink (SURVEY.md §2.2 sinks row: the reference's
only sink is one matrix text file per graph, primary_server.c:118-128;
this is the engine's general-purpose table sink).

Layout IS the query plan at 100 TB: a table written as
partition-dirs(low-cardinality filter cols) + files sorted on the common
range/equality column gives every future scan partition pruning for free
and min/max row-group statistics tight enough to skip most files — the
poor man's z-order, no table format required.  ``maxRecordsPerFile``
bounds file size so a skewed partition ships many medium files instead of
one unsplittable giant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Write ``df`` as a parquet table partitioned by ``partition_cols``,
    each file internally sorted on ``sort_cols``.

    The repartition on the partition columns makes each task own whole
    output partitions (one writer per partition-dir, not tasks x dirs
    small files); sortWithinPartitions then orders rows inside each task
    so parquet row-group min/max stats on the sort columns are disjoint
    ranges — scans with a ``sort_cols`` predicate skip whole files."""
    out = df.repartition(*partition_cols)
    if sort_cols:
        # partition cols lead the sort: the file writer REQUIRES rows
        # ordered by partition expressions and would otherwise inject its
        # own (unstable) sort, scrambling sort_cols again
        out = out.sortWithinPartitions(*partition_cols, *sort_cols)
    writer = out.write.mode("overwrite").partitionBy(*partition_cols)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)
