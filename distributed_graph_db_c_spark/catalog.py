"""GraphCatalog — named graphs as graph_id-partitioned parquet.

Reference parity (SURVEY.md §2.1 ops 1/2):
- op 1 "add graph"    (primary_server.c:45-157): create-or-overwrite one
  graph file.  Ours: dynamic partition overwrite of one graph_id.
- op 2 "modify graph" (primary_server.c:140-143, file opened "w+" =
  truncate at :65): byte-identical to op 1 — full replace, never a merge.
  So ``put`` IS both ops; no upsert logic exists by design.
- readers-writers isolation (primary_server.c:60,150; secondary_server.c:
  229-234,297-303): free here — parquet snapshot reads over immutable
  files; a reader that already listed its files never sees a concurrent
  overwrite (upgrade path for true ACID: Delta/Iceberg table format).

Scale posture: the catalog is ONE dataset partitioned by graph_id, so a
query on one graph prunes to one partition directory (partition pruning is
visible in the scan's PartitionFilters), and a fleet-wide query (all
graphs) is a single distributed scan.  The reference caps the catalog at
20 graphs x 30 nodes (primary_server.c:22, client.c:15); ours is unbounded.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .schemas import GRAPH_EDGES_SCHEMA, GRAPH_VERTICES_SCHEMA


class GraphCatalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root.rstrip("/")
        self._edges_path = f"{self.root}/edges"
        self._vertices_path = f"{self.root}/vertices"

    # -- write path (reference ops 1 and 2 — "modify" is a full replace) --

    def put(self, graph_id: int, edges: DataFrame, vertices: DataFrame) -> None:
        """Create-or-overwrite one graph.  Dynamic partition overwrite
        touches only this graph_id's partition; other graphs' files are
        never rewritten (the per-file writer lock of primary_server.c:60
        becomes partition-granularity isolation)."""
        spark = self.spark
        self._invalidate_stats()
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # Dynamic overwrite only replaces partitions PRESENT in the incoming
        # data: replacing a graph with an edgeless version (fixture G14
        # shape) writes no edges partition, which would leave the old edges
        # visible.  Detect the empty input (one limit-1 job) and drop the
        # stale partition explicitly.
        if not edges.limit(1).take(1):
            self._drop_partition(self._edges_path, graph_id)
        (
            edges.select(
                F.lit(graph_id).cast("int").alias("graph_id"),
                F.col("src").cast("long"),
                F.col("dst").cast("long"),
            )
            .write.partitionBy("graph_id")
            .mode("overwrite")
            .parquet(self._edges_path)
        )
        (
            vertices.select(
                F.lit(graph_id).cast("int").alias("graph_id"),
                F.col("id").cast("long"),
            )
            .write.partitionBy("graph_id")
            .mode("overwrite")
            .parquet(self._vertices_path)
        )

    def put_all(self, edges: DataFrame, vertices: DataFrame) -> None:
        """Bulk create-or-overwrite of every graph_id present in the input
        (the op-1 counterpart of ``sources.gformat.read_gformat_dir``).
        One dynamic-partition-overwrite job per dataset: only the graph_id
        partitions present in the input are replaced, untouched graphs keep
        their files — same isolation contract as ``put``, without a
        driver-side loop over graphs.

        Contract: a graph whose REPLACEMENT has zero edges writes no edges
        partition here (dynamic overwrite can't express an empty
        partition); call ``put(gid, empty_edges, vertices)`` or ``drop``
        for that case."""
        spark = self.spark
        self._invalidate_stats()
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        (
            edges.select(
                F.col("graph_id").cast("int"),
                F.col("src").cast("long"),
                F.col("dst").cast("long"),
            )
            .write.partitionBy("graph_id")
            .mode("overwrite")
            .parquet(self._edges_path)
        )
        (
            vertices.select(F.col("graph_id").cast("int"), F.col("id").cast("long"))
            .write.partitionBy("graph_id")
            .mode("overwrite")
            .parquet(self._vertices_path)
        )

    @staticmethod
    def _drop_partition(base: str, graph_id: int) -> None:
        import os
        import shutil

        part = f"{base}/graph_id={graph_id}"
        if os.path.exists(part):
            shutil.rmtree(part)

    def drop(self, graph_id: int) -> None:
        """Remove one graph by overwriting its partition with zero rows is
        not expressible via dynamic overwrite; use an explicit partition
        path delete (same effect as the reference never having the file)."""
        self._invalidate_stats()
        for base in (self._edges_path, self._vertices_path):
            self._drop_partition(base, graph_id)

    @staticmethod
    def _invalidate_stats() -> None:
        # Catalog mutations reuse the same scan path, so the traversal
        # auto-dispatchers' memoized edge-count stat (keyed on the analyzed
        # plan) would go stale without an explicit invalidation.
        from .operators.traversal import clear_graph_stats_cache

        clear_graph_stats_cache()

    # -- read path --

    def edges(self, graph_id: int | None = None) -> DataFrame:
        df = self.spark.read.schema(GRAPH_EDGES_SCHEMA).parquet(self._edges_path)
        if graph_id is not None:
            df = df.filter(F.col("graph_id") == graph_id)  # partition-pruned scan
        return df

    def vertices(self, graph_id: int | None = None) -> DataFrame:
        df = self.spark.read.schema(GRAPH_VERTICES_SCHEMA).parquet(self._vertices_path)
        if graph_id is not None:
            df = df.filter(F.col("graph_id") == graph_id)
        return df

    def graph_ids(self) -> list[int]:
        return [
            r["graph_id"]
            for r in self.vertices().select("graph_id").distinct().orderBy("graph_id").collect()
        ]
