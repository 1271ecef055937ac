"""G-format codec: the reference's adjacency-matrix text files <-> edge DataFrames.

Reference on-disk format (written primary_server.c:118-128, parsed
secondary_server.c:283-292): line 1 = node count n, then n rows of n
whitespace-separated 0/1 ints; undirected, 1-based external node ids.

The dense matrix is an *ingest codec only* — the reference itself converts
to an adjacency list before any traversal (secondary_server.c:306-326), so
our processing representation is the edge list.  The parse is expressed as
DataFrame ops (``split`` + ``posexplode``) so cell explosion runs JVM-side.

Row order is positional in this format, so order recovery must not depend
on HOW Spark splits the input: the readers use the text source's
``wholetext`` mode (one row per file, never split) and number lines with
``posexplode`` over an in-row split — correct for any file the codec can
represent (a file must fit one row, the same one-machine bound the dense
matrix already implies; the reference caps graphs at 30 nodes,
client.c:15).  Big graphs enter as edge lists/parquet.  A plain ``text``
read with ``monotonically_increasing_id`` would misnumber rows silently
the moment a file spans two input splits (> maxPartitionBytes).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..schemas import GRAPH_EDGES_SCHEMA, GRAPH_VERTICES_SCHEMA


def _numbered_lines(spark: SparkSession, path_glob: str) -> DataFrame:
    """(file, row_idx, value) with row_idx = position IN the file, derived
    from a wholetext read so numbering is split-independent."""
    return (
        spark.read.text(path_glob, wholetext=True)
        .select(
            F.input_file_name().alias("_file"),
            F.posexplode(F.split("value", r"\r?\n")).alias("row_idx", "line"),
        )
        .filter(F.trim("line") != "")  # trailing newline yields one empty tail element
        .withColumnRenamed("line", "value")
    )


def read_gformat(spark: SparkSession, path: str, graph_id: int) -> tuple[DataFrame, DataFrame]:
    """Parse one G-format file into (edges, vertices) DataFrames.

    Edges come out symmetrized (input matrices are symmetric — undirected
    graphs, SURVEY.md §1.2) so every traversal step is a plain equi-join.
    Vertices cover 1..n so isolated nodes survive (fixture G14: no edges).
    """
    lines = _numbered_lines(spark, path)
    n = lines.filter(F.col("row_idx") == 0).select(F.trim("value").cast("long")).head()[0]

    edges = (
        lines.filter(F.col("row_idx") > 0)
        .select(
            F.col("row_idx").alias("src"),  # 1-based row index == 1-based node id
            F.posexplode(F.split(F.trim("value"), r"\s+")).alias("col_idx", "cell"),
        )
        .filter(F.col("cell") == "1")
        .select(
            F.lit(graph_id).cast("int").alias("graph_id"),
            F.col("src").cast("long"),
            (F.col("col_idx") + 1).cast("long").alias("dst"),
        )
    )
    vertices = spark.range(1, n + 1).select(
        F.lit(graph_id).cast("int").alias("graph_id"), F.col("id").cast("long")
    )
    return edges, vertices


def read_gformat_dir(
    spark: SparkSession, dir_path: str, pattern: str = r"G(\d+)\.txt$"
) -> tuple[DataFrame, DataFrame]:
    """Bulk-ingest a catalog directory of ``G<i>.txt`` files — the
    reference's actual database bootstrap (primary_server.c:49-59: graph
    identity IS the filename, G1..G20).  One distributed wholetext read
    covers every file; graph_id comes from ``regexp_extract`` on the
    filename, so a directory of 100k graph files is still a single job
    with no driver-side loop.

    Per-file line order comes from ``posexplode`` over the in-row line
    split (see module docstring): split-independent, and zero shuffles —
    the old window-per-file approach both shuffled on filename AND
    silently misnumbered rows for any file spanning two input splits.

    Returns (edges, vertices) spanning every matched file, symmetrized the
    same as :func:`read_gformat`.
    """
    lines = _numbered_lines(spark, f"{dir_path.rstrip('/')}/G*.txt").withColumn(
        "graph_id", F.regexp_extract("_file", pattern, 1).cast("int")
    )
    edges = (
        lines.filter(F.col("row_idx") > 0)
        .select(
            "graph_id",
            F.col("row_idx").cast("long").alias("src"),  # 1-based row == node id
            F.posexplode(F.split(F.trim("value"), r"\s+")).alias("col_idx", "cell"),
        )
        .filter(F.col("cell") == "1")
        .select("graph_id", "src", (F.col("col_idx") + 1).cast("long").alias("dst"))
    )
    vertices = (
        lines.filter(F.col("row_idx") == 0)
        .select("graph_id", F.trim("value").cast("long").alias("_n"))
        .filter(F.col("_n") >= 1)
        .select(
            "graph_id",
            F.explode(F.sequence(F.lit(1).cast("long"), F.col("_n"))).alias("id"),
        )
    )
    return edges, vertices


def matrix_to_edges(
    spark: SparkSession, matrix: list[list[int]], graph_id: int
) -> tuple[DataFrame, DataFrame]:
    """Build (edges, vertices) from an in-memory 0/1 matrix (the reference's
    op-1 payload: client ships int[n][n] via shared memory, client.c:131-144).

    Only for small client-supplied graphs (reference caps n at 30,
    client.c:15); large graphs arrive as files or edge lists.
    """
    n = len(matrix)
    rows = [
        (graph_id, i + 1, j + 1) for i in range(n) for j in range(n) if matrix[i][j] == 1
    ]
    edges = spark.createDataFrame(rows, GRAPH_EDGES_SCHEMA)
    vertices = spark.range(1, n + 1).select(
        F.lit(graph_id).cast("int").alias("graph_id"), F.col("id").cast("long")
    )
    return edges, vertices


def write_gformat_dir(edges: DataFrame, vertices: DataFrame, dir_path: str) -> list[int]:
    """Export every graph present in ``vertices`` to ``<dir>/G<i>.txt`` —
    the inverse of :func:`read_gformat_dir`, completing codec round-trip
    parity with the reference's on-disk database.

    Driver-side loop over graphs by design, like :func:`write_gformat`:
    the dense-matrix text codec is only meaningful for graphs that fit on
    one machine (reference cap 30 nodes, client.c:15); a big catalog
    exports as parquet.  Returns the exported graph ids.
    """
    import os

    os.makedirs(dir_path, exist_ok=True)
    gids = [
        r["graph_id"]
        for r in vertices.select("graph_id").distinct().orderBy("graph_id").collect()
    ]
    for gid in gids:
        write_gformat(edges, vertices, gid, os.path.join(dir_path, f"G{gid}.txt"))
    return gids


def write_gformat(edges: DataFrame, vertices: DataFrame, graph_id: int, path: str) -> None:
    """Export one graph back to the reference text codec (round-trip parity).

    Driver-side by design: the format is a dense n x n matrix in one ordered
    text file, only meaningful for graphs that fit on one machine (reference
    cap: 30 nodes, client.c:15).  Scale path is parquet edge lists.
    """
    n = vertices.filter(F.col("graph_id") == graph_id).count()
    present = {
        (r["src"], r["dst"])
        for r in edges.filter(F.col("graph_id") == graph_id).select("src", "dst").collect()
    }
    with open(path, "w") as f:
        f.write(f"{n}\n")
        for i in range(1, n + 1):
            f.write(" ".join("1" if (i, j) in present else "0" for j in range(1, n + 1)) + "\n")
