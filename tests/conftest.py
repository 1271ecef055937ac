from __future__ import annotations

import pytest
from pyspark.sql import SparkSession

from distributed_graph_db_c_spark.schemas import GRAPH_EDGES_SCHEMA, GRAPH_VERTICES_SCHEMA
from distributed_graph_db_c_spark.session import get_spark

# Golden graph fixtures (FIXTURES.md §A — shapes of the reference's G*.txt
# stored graphs, expressed as 1-based undirected edge lists).
FIXTURE_GRAPHS: dict[int, tuple[int, list[tuple[int, int]]]] = {
    1: (5, [(1, 2), (2, 3), (3, 4), (3, 5)]),     # G1: path + branch
    4: (1, []),                                    # G4: single vertex
    12: (5, [(1, 2), (1, 3), (1, 4), (1, 5)]),     # G12: star, hub 1
    13: (7, [(1, 2), (2, 3), (2, 4), (3, 5), (3, 7), (5, 6)]),  # G13: tree + cycle edge
    14: (3, []),                                   # G14: edgeless
    15: (1, []),                                   # G15: single vertex
    16: (6, [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)]),  # G16: path
}


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    s = get_spark("dgdb-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def fixture_graphs(spark):
    """(edges, vertices) DataFrames holding ALL golden fixtures at once —
    traversals run fleet-wide, which is the scale-relevant shape."""
    edge_rows = []
    vertex_rows = []
    for gid, (n, edges) in FIXTURE_GRAPHS.items():
        for a, b in edges:
            edge_rows.append((gid, a, b))
            edge_rows.append((gid, b, a))
        for v in range(1, n + 1):
            vertex_rows.append((gid, v))
    edges_df = spark.createDataFrame(edge_rows, GRAPH_EDGES_SCHEMA)
    vertices_df = spark.createDataFrame(vertex_rows, GRAPH_VERTICES_SCHEMA)
    return edges_df, vertices_df
