"""Canonical schemas — the single source of truth (SURVEY.md §1.2).

The reference has a fixed implicit schema (an n x n 0/1 matrix per file,
parsed by fscanf at secondary_server.c:283-292); here every dataset gets an
explicit StructType.  Graphs are the GraphX/GraphFrames representation: a
pair of DataFrames (edges + vertices) keyed by ``graph_id`` so one
partitioned parquet dataset holds the whole catalog (reference: directory
of G<i>.txt files, max 20 — ours is unbounded).
"""

from __future__ import annotations

from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

# Edge list, both directions materialized at ingest (undirected graphs,
# SURVEY.md §1.2) so every traversal step is a plain equi-join on src.
GRAPH_EDGES_SCHEMA = StructType(
    [
        StructField("graph_id", IntegerType(), nullable=False),
        StructField("src", LongType(), nullable=False),
        StructField("dst", LongType(), nullable=False),
    ]
)

# Vertex set — needed because isolated vertices (e.g. reference fixture
# G14.txt, 3 nodes, no edges) never appear in the edge list.
GRAPH_VERTICES_SCHEMA = StructType(
    [
        StructField("graph_id", IntegerType(), nullable=False),
        StructField("id", LongType(), nullable=False),
    ]
)

# Reference request model: struct message {long sequence_number; int
# operation_number; char mtext[200];} (client.c:16-21) + the graph payload
# in shared memory.  Ours: a requests DataFrame/stream row per request.
REQUEST_SCHEMA = StructType(
    [
        StructField("seq", LongType(), nullable=False),
        StructField("op", IntegerType(), nullable=False),  # 1 add, 2 modify, 3 dfs, 4 bfs
        StructField("graph_id", IntegerType(), nullable=True),
        StructField("start", LongType(), nullable=True),  # 1-based start vertex (ops 3/4)
    ]
)

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
