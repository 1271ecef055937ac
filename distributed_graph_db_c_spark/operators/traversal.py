"""Graph traversal operators (reference ops 3 and 4, SURVEY.md §2.1).

Reference semantics being re-expressed:

- op 4 BFS (secondary_server.c:389-550): level-synchronous traversal from a
  1-based start node, one pthread per popped frontier node pushing unvisited
  neighbours under a mutex (BFShelper :363-387).  The thread races make the
  output order nondeterministic and can emit a vertex twice (visited is set
  only at pop, :521).  Canonical semantics here: each reachable vertex once,
  with its level = shortest-path hop count; canonical order (level, id).

- op 3 DFS "leaf report" (secondary_server.c:209-361): parallel DFS whose
  output is only the base-case vertices (:166) — isolated vertices, or
  vertices whose only neighbour is already visited.  Canonical semantics
  (SURVEY.md §2.1, chosen to match the reference's output *set* exactly):
  vertices reachable from start with degree <= 1, excluding a non-isolated
  start vertex.  SQL-expressible, deterministic.

Scale design: BFS is the textbook BSP/Pregel loop (GraphX, OSDI'14) as
DataFrame ops — one equi-join + anti-join per superstep; the shuffle IS the
synchronization barrier.  All graphs traverse simultaneously (keys are
(graph_id, id)) so a catalog of millions of graphs is one job, and a single
giant graph parallelizes across its edge partitions.  AQE broadcasts the
frontier side automatically while it is small.  ``localCheckpoint`` every
few supersteps truncates lineage so plans do not grow unboundedly — the
standard iterative-algorithm-on-Spark pattern.
"""

from __future__ import annotations

import functools

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_CHECKPOINT_EVERY = 3

# Target rows per cached adjacency partition (~50 MB of (long,long,long)
# rows).  Iterative kernels probe the cached adjacency once per superstep,
# so its partition count sets the per-superstep task floor: size it to the
# data instead of inheriting spark.sql.shuffle.partitions — a 300k-edge
# graph gets 1 partition (1 task/superstep), a 100 TB edge list gets
# hundreds of thousands (capped), each a scannable chunk.
_ADJ_ROWS_PER_PARTITION = 2_000_000
_ADJ_MAX_PARTITIONS = 200_000


def _partitioned_adj(edges: DataFrame) -> DataFrame:
    """(graph_id, id, nb) hash-partitioned on the join key and persisted.

    Partitioned-by-key persistence means every superstep's equi-join
    satisfies its distribution requirement from the cache — the edge set is
    shuffled exactly once for the whole iteration, never per superstep.
    Costs one counting pass up front to size the partition count.
    """
    adj = edges.select("graph_id", F.col("src").alias("id"), F.col("dst").alias("nb"))
    n_edges = adj.count()
    n_part = min(n_edges // _ADJ_ROWS_PER_PARTITION + 1, _ADJ_MAX_PARTITIONS)
    return adj.repartition(n_part, "graph_id", "id").persist()


def bfs(
    edges: DataFrame,
    starts: DataFrame,
    max_level: int | None = None,
    broadcast_threshold: int = 1_000_000,
) -> DataFrame:
    """Multi-source, multi-graph BFS.

    Args:
      edges:  (graph_id, src, dst) with both directions materialized.
      starts: (graph_id, id) — one or many (graph, start-vertex) pairs.
      broadcast_threshold: row count under which the frontier / visited
        sides are broadcast-hinted instead of shuffled.
    Returns:
      (graph_id, id, level) — level 0 for the start vertex, each reachable
      vertex exactly once at its minimum hop distance.

    Shuffle budget per superstep (the thing that matters at 100 TB):
    - The adjacency is shuffled ONCE up front (repartition on the join key)
      and persisted; every superstep's equi-join then satisfies its
      distribution requirement from the cached partitioning — the edge set
      is never re-shuffled, only probed.
    - While the frontier / visited set are small (the common case: BFS from
      a handful of sources), they ride in as broadcast hash joins — the
      superstep moves only the frontier, O(frontier), not O(edges).
    - When a frontier outgrows the threshold (a giant-component sweep on a
      big graph), it falls back to shuffling just that frontier against the
      pre-partitioned adjacency.
    The frontier is materialized (localCheckpoint) every superstep: its
    count doubles as the termination check, lineage stays O(1), and the
    next superstep probes materialized rows instead of recomputing.
    """
    # Rename edge endpoints so every superstep joins by name — avoids the
    # self-lineage column-ambiguity trap of iterative DataFrame loops.
    adj = _partitioned_adj(edges)
    visited = starts.select("graph_id", F.col("id").cast("long").alias("id")).withColumn(
        "level", F.lit(0)
    )
    frontier = visited.localCheckpoint(eager=True)
    f_cnt = frontier.count()
    v_cnt = f_cnt
    level = 0
    while f_cnt > 0:
        if max_level is not None and level >= max_level:
            break
        level += 1
        f_side = F.broadcast(frontier) if f_cnt <= broadcast_threshold else frontier
        neighbours = (
            f_side.select("graph_id", "id")
            .join(adj, on=["graph_id", "id"])
            .select("graph_id", F.col("nb").alias("id"))
            .distinct()
        )
        v_side = F.broadcast(visited) if v_cnt <= broadcast_threshold else visited
        frontier = neighbours.join(v_side, on=["graph_id", "id"], how="left_anti").withColumn(
            "level", F.lit(level)
        )
        frontier = frontier.localCheckpoint(eager=True)
        f_cnt = frontier.count()
        if f_cnt == 0:
            break
        visited = visited.union(frontier)
        v_cnt += f_cnt
        if level % _CHECKPOINT_EVERY == 0:
            visited = visited.localCheckpoint(eager=True)
    visited = visited.localCheckpoint(eager=True)  # result independent of adj cache
    adj.unpersist()
    return visited


def degrees(edges: DataFrame) -> DataFrame:
    """(graph_id, id, degree) for every vertex with at least one edge.
    Edges are symmetrized, so degree(v) = distinct neighbours of v."""
    return (
        edges.select("graph_id", F.col("src").alias("id"), "dst")
        .distinct()
        .groupBy("graph_id", "id")
        .agg(F.count("*").alias("degree"))
    )


def dfs_leaves(edges: DataFrame, starts: DataFrame) -> DataFrame:
    """Reference op 3, canonical semantics (SURVEY.md §2.1): vertices
    reachable from the start with degree <= 1, excluding a non-isolated
    start vertex.  Matches the reference's emitted set on every fixture.

    Pure DataFrame composition: reachability (BFS kernel) + degree
    left-join + filter — no Python in the hot path.
    """
    reachable = bfs(edges, starts).select("graph_id", "id", "level")
    deg = degrees(edges)
    return (
        reachable.join(deg, on=["graph_id", "id"], how="left")
        .withColumn("degree", F.coalesce(F.col("degree"), F.lit(0)))
        .filter(
            (F.col("degree") <= 1)
            & ~((F.col("level") == 0) & (F.col("degree") >= 1))  # non-isolated start excluded
        )
        .select("graph_id", "id")
    )


def dfs_preorder(edges: DataFrame, starts: DataFrame) -> DataFrame:
    """Sequential DFS preorder per graph, neighbours visited in ascending id
    (the deterministic canonicalization of the reference's thread-racing DFS,
    secondary_server.c:183-200 — thread spawn order replaced by sorted order).

    Implementation: grouped-map pandas UDF (``applyInPandas``) — one Arrow
    batch per graph.  Correct tool because a *single* DFS preorder is
    inherently sequential; the parallelism axis is the fleet of graphs
    (reference: one server thread per request — same shape).  Only suitable
    for graphs that fit in one executor's memory; the reference caps graphs
    at 30 nodes (client.c:15), ours comfortably handles millions of edges
    per graph before this needs the big-graph reachability path instead.

    Returns (graph_id, id, pos) with pos = 0-based preorder position.
    """
    tagged = edges.join(
        starts.withColumnRenamed("id", "_start"), on="graph_id", how="inner"
    ).select("graph_id", "src", "dst", "_start")
    # Isolated start vertices have no edges; union a marker row so the group exists.
    marker = starts.select(
        "graph_id",
        F.lit(None).cast("long").alias("src"),
        F.lit(None).cast("long").alias("dst"),
        F.col("id").cast("long").alias("_start"),
    )
    grouped = tagged.unionByName(marker)

    def run_dfs(pdf: pd.DataFrame) -> pd.DataFrame:
        gid = int(pdf["graph_id"].iloc[0])
        start = int(pdf["_start"].iloc[0])
        adj: dict[int, list[int]] = {}
        for s, d in zip(pdf["src"], pdf["dst"]):
            if pd.isna(s):
                continue
            adj.setdefault(int(s), []).append(int(d))
        for v in adj:
            adj[v].sort()
        order: list[int] = []
        seen = {start}
        stack = [(start, iter(adj.get(start, [])))]
        order.append(start)
        while stack:
            v, it = stack[-1]
            advanced = False
            for nb in it:
                if nb not in seen:
                    seen.add(nb)
                    order.append(nb)
                    stack.append((nb, iter(adj.get(nb, []))))
                    advanced = True
                    break
            if not advanced:
                stack.pop()
        return pd.DataFrame(
            {"graph_id": gid, "id": order, "pos": range(len(order))}
        )

    return grouped.groupBy("graph_id").applyInPandas(
        run_dfs, schema="graph_id int, id long, pos long"
    )


def connected_components(edges: DataFrame, vertices: DataFrame, max_iters: int = 50) -> DataFrame:
    """Connected components by iterative min-label propagation (the classic
    Pregel formulation): every vertex starts labelled with its own id; each
    superstep every vertex takes the min of its own and its neighbours'
    labels; converged when the global label sum stops changing (one cheap
    scalar aggregate per superstep — no full comparison join).

    Returns (graph_id, id, component) with component = min vertex id in the
    component.
    """
    adj = _partitioned_adj(edges)
    labels = vertices.select("graph_id", "id", F.col("id").alias("component"))
    prev_sum = None
    for i in range(max_iters):
        msgs = labels.join(adj, on=["graph_id", "id"]).select(
            "graph_id", F.col("nb").alias("id"), "component"
        )
        labels = (
            labels.unionByName(msgs)
            .groupBy("graph_id", "id")
            .agg(F.min("component").alias("component"))
        )
        # Materialize every superstep: the convergence aggregate below would
        # otherwise recompute the un-checkpointed lineage, and the next
        # superstep would recompute it again.
        labels = labels.localCheckpoint(eager=True)
        cur_sum = labels.agg(F.sum("component")).head()[0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    labels = labels.localCheckpoint(eager=True)
    adj.unpersist()
    return labels


def pagerank(
    edges: DataFrame,
    vertices: DataFrame,
    iterations: int = 10,
    scale: int = 10**12,
) -> DataFrame:
    """PageRank with damping 0.85, fixed iteration count, INTEGER
    fixed-point arithmetic (ranks scaled by 10^12, floor division) — so
    the result is bit-identical under any partitioning, any engine, any
    summation order (integer addition is associative; no FP drift).

    The classic Pregel formulation (GraphX paper): one join + groupBy-sum
    per superstep; contributions r(u)//deg(u) flow along edges.  Vertices
    with no in-edges settle at the teleport base.  Returns
    (graph_id, id, rank_scaled) with rank ~ rank_scaled / 10^12.
    """
    adj = _partitioned_adj(edges)
    deg = adj.groupBy("graph_id", "id").agg(F.count("*").alias("degree"))
    # Key-partitioned like adj (join of two key-partitioned sides), so each
    # superstep's contribution join shuffles only the ranks side.
    adj_deg = adj.join(deg, on=["graph_id", "id"]).persist()
    base = vertices.join(
        vertices.groupBy("graph_id").agg(F.count("*").alias("n_g")), on="graph_id"
    ).persist()

    ranks = base.select(
        "graph_id", "id", F.expr(f"CAST({scale} AS BIGINT) DIV n_g").alias("r")
    )
    for i in range(iterations):
        contrib = ranks.join(adj_deg, on=["graph_id", "id"]).select(
            "graph_id", F.col("nb").alias("id"), F.expr("r DIV degree").alias("c")
        )
        sums = contrib.groupBy("graph_id", "id").agg(F.sum("c").alias("s"))
        ranks = base.join(sums, on=["graph_id", "id"], how="left").select(
            "graph_id",
            "id",
            F.expr(
                f"CAST({15 * scale} AS BIGINT) DIV (100 * n_g)"
                " + (85 * coalesce(s, CAST(0 AS BIGINT))) DIV 100"
            ).alias("r"),
        )
        if i % _CHECKPOINT_EVERY == _CHECKPOINT_EVERY - 1:
            ranks = ranks.localCheckpoint(eager=True)
    ranks = ranks.select("graph_id", "id", F.col("r").alias("rank_scaled"))
    ranks = ranks.localCheckpoint(eager=True)
    adj_deg.unpersist()
    adj.unpersist()
    base.unpersist()
    return ranks


def bfs_fleet(edges: DataFrame, starts: DataFrame) -> DataFrame:
    """Fleet-mode BFS: cogrouped-pandas kernel for the MANY-TINY-GRAPHS
    regime — the reference's actual operating point (a catalog of <=30-node
    graphs, client.c:15, served one request per thread).

    ``cogroup(edges, starts).applyInPandas`` hands each graph's edge list
    and its start set to ONE task as Arrow batches; the whole traversal is
    a dict walk in that task — zero supersteps, zero per-level job
    overhead.  The iterative-join :func:`bfs` stays the path for a single
    huge graph (its frontier parallelizes across the cluster; this kernel
    requires each graph to fit in one task's memory).  Same canonical
    semantics as :func:`bfs`: (graph_id, id, level), minimum hop count,
    each reachable vertex once.
    """

    def run_bfs(edges_pdf: pd.DataFrame, starts_pdf: pd.DataFrame) -> pd.DataFrame:
        if starts_pdf.empty:
            return pd.DataFrame({"graph_id": [], "id": [], "level": []})
        gid = int(starts_pdf["graph_id"].iloc[0])
        adj: dict[int, list[int]] = {}
        for s, d in zip(edges_pdf["src"], edges_pdf["dst"]):
            adj.setdefault(int(s), []).append(int(d))
        level = {int(v): 0 for v in starts_pdf["id"]}
        frontier = list(level)
        depth = 0
        while frontier:
            depth += 1
            nxt = []
            for v in frontier:
                for nb in adj.get(v, ()):
                    if nb not in level:
                        level[nb] = depth
                        nxt.append(nb)
            frontier = nxt
        return pd.DataFrame(
            {"graph_id": gid, "id": list(level), "level": list(level.values())}
        )

    return (
        edges.groupBy("graph_id")
        .cogroup(starts.groupBy("graph_id"))
        .applyInPandas(run_bfs, schema="graph_id int, id long, level long")
    )


# Per-graph edge count below which the cogrouped kernel wins: the whole
# graph must fit one task comfortably ((long,long,long) rows; 5M edges is
# ~120 MB raw, well under an executor slot) AND beat superstep scheduling
# overhead (~0.2 s/level in local mode, far more on a busy cluster).
_FLEET_MAX_EDGES = 5_000_000


# Dispatch-stat memo: (applicationId, semanticHash of the analyzed edge
# plan) -> max per-graph edge count.  BFS/PageRank/CC auto-dispatchers all
# consult the same scalar over the same catalog snapshot; without the memo
# every dispatch pays a counting job (3+ per suite run, one per traversal
# at a 100x catalog).  Semantic hashing keys on the PLAN, so a different
# sf_dir (different scan path) misses correctly; catalog MUTATIONS reuse
# the same path, so GraphCatalog.put/put_all/drop invalidate explicitly.
_EDGE_STAT_CACHE: dict[tuple[str, int], int] = {}


def clear_graph_stats_cache() -> None:
    """Invalidate memoized dispatch stats (called by catalog mutators)."""
    _EDGE_STAT_CACHE.clear()


def max_graph_edges(edges: DataFrame, use_cache: bool = True) -> int:
    """Max per-graph edge count — the ONE scalar the auto-dispatchers need.
    Memoized per (session, analyzed plan): repeated traversals over the
    same catalog snapshot pay the aggregate job once.  Callers can still
    pass ``max_edges`` to ``*_auto`` to skip the job entirely, or
    ``use_cache=False`` to force a recount."""
    key: tuple[str, int] | None
    try:
        key = (
            edges.sparkSession.sparkContext.applicationId,
            edges._jdf.queryExecution().analyzed().semanticHash(),
        )
    except Exception:  # Connect or API drift: fall back to uncached
        key = None
    if use_cache and key is not None and key in _EDGE_STAT_CACHE:
        return _EDGE_STAT_CACHE[key]
    row = edges.groupBy("graph_id").count().agg(F.max("count").alias("m")).collect()[0]
    val = 0 if row["m"] is None else int(row["m"])
    if key is not None:
        _EDGE_STAT_CACHE[key] = val
    return val


def bfs_auto(edges: DataFrame, starts: DataFrame, max_edges: int | None = None) -> DataFrame:
    """Kernel dispatch: ONE aggregate decides the physical strategy.

    - every graph small (max per-graph edge count <= _FLEET_MAX_EDGES):
      cogrouped-pandas :func:`bfs_fleet` — whole graph per task, zero
      supersteps.  The reference's entire catalog (20 graphs x <=30 nodes)
      lives here.
    - any giant graph: iterative-join :func:`bfs` — the frontier
      parallelizes across the cluster; depth x per-superstep jobs is the
      price of not fitting one task.

    The two kernels implement identical canonical semantics (property test
    pins them); dispatch changes only the physical plan, exactly like
    Catalyst choosing broadcast vs sort-merge.
    """
    biggest = max_graph_edges(edges) if max_edges is None else max_edges
    if biggest <= _FLEET_MAX_EDGES:
        return bfs_fleet(edges, starts)
    return bfs(edges, starts)


def pagerank_fleet(
    edges: DataFrame,
    vertices: DataFrame,
    iterations: int = 10,
    scale: int = 10**12,
) -> DataFrame:
    """Fleet-mode PageRank: the cogrouped in-task twin of :func:`pagerank`
    for many small graphs (same regime argument as :func:`bfs_fleet`).
    The integer fixed-point recurrence is replayed verbatim with Python
    ints (arbitrary precision, same floor division), so results are
    BIT-IDENTICAL to the iterative-join kernel — pinned by the
    kernel-agreement property test."""

    def run_pr(edges_pdf: pd.DataFrame, verts_pdf: pd.DataFrame) -> pd.DataFrame:
        if verts_pdf.empty:
            return pd.DataFrame({"graph_id": [], "id": [], "rank_scaled": []})
        gid = int(verts_pdf["graph_id"].iloc[0])
        verts = [int(v) for v in verts_pdf["id"]]
        pairs = [(int(s), int(d)) for s, d in zip(edges_pdf["src"], edges_pdf["dst"])]
        deg: dict[int, int] = {}
        for s, _ in pairs:
            deg[s] = deg.get(s, 0) + 1
        n_g = len(verts)
        r = {v: scale // n_g for v in verts}
        for _ in range(iterations):
            sums: dict[int, int] = {}
            for s, d in pairs:
                if s in r:
                    sums[d] = sums.get(d, 0) + r[s] // deg[s]
            r = {
                v: (15 * scale) // (100 * n_g) + (85 * sums.get(v, 0)) // 100
                for v in verts
            }
        return pd.DataFrame(
            {"graph_id": gid, "id": list(r), "rank_scaled": list(r.values())}
        )

    return (
        edges.groupBy("graph_id")
        .cogroup(vertices.groupBy("graph_id"))
        .applyInPandas(run_pr, schema="graph_id int, id long, rank_scaled long")
    )


def pagerank_auto(
    edges: DataFrame,
    vertices: DataFrame,
    iterations: int = 10,
    scale: int = 10**12,
    max_edges: int | None = None,
) -> DataFrame:
    """Kernel dispatch for PageRank, same decision rule as :func:`bfs_auto`:
    all graphs small -> cogrouped in-task kernel; any giant graph -> the
    iterative-join BSP kernel."""
    biggest = max_graph_edges(edges) if max_edges is None else max_edges
    if biggest <= _FLEET_MAX_EDGES:
        return pagerank_fleet(edges, vertices, iterations, scale)
    return pagerank(edges, vertices, iterations, scale)


def connected_components_fleet(edges: DataFrame, vertices: DataFrame) -> DataFrame:
    """Fleet-mode connected components: in-task union-find per graph
    (cogrouped Arrow batches), labels = min vertex id per component —
    identical semantics to the min-label-propagation kernel."""

    def run_cc(edges_pdf: pd.DataFrame, verts_pdf: pd.DataFrame) -> pd.DataFrame:
        if verts_pdf.empty:
            return pd.DataFrame({"graph_id": [], "id": [], "component": []})
        gid = int(verts_pdf["graph_id"].iloc[0])
        parent: dict[int, int] = {int(v): int(v) for v in verts_pdf["id"]}

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for s, d in zip(edges_pdf["src"], edges_pdf["dst"]):
            s, d = int(s), int(d)
            if s not in parent:
                parent[s] = s
            if d not in parent:
                parent[d] = d
            rs, rd = find(s), find(d)
            if rs != rd:
                # union by MIN root so the label is the component minimum
                lo, hi = (rs, rd) if rs < rd else (rd, rs)
                parent[hi] = lo
        ids = list(parent)
        return pd.DataFrame(
            {"graph_id": gid, "id": ids, "component": [find(v) for v in ids]}
        )

    return (
        edges.groupBy("graph_id")
        .cogroup(vertices.groupBy("graph_id"))
        .applyInPandas(run_cc, schema="graph_id int, id long, component long")
    )


def connected_components_auto(
    edges: DataFrame,
    vertices: DataFrame,
    max_iters: int = 50,
    max_edges: int | None = None,
) -> DataFrame:
    """Kernel dispatch for CC, same rule as :func:`bfs_auto`."""
    biggest = max_graph_edges(edges) if max_edges is None else max_edges
    if biggest <= _FLEET_MAX_EDGES:
        return connected_components_fleet(edges, vertices)
    return connected_components(edges, vertices, max_iters)


def sssp(
    edges: DataFrame,
    starts: DataFrame,
    broadcast_threshold: int = 1_000_000,
) -> DataFrame:
    """Weighted single-source (per graph: multi-source) shortest paths —
    BFS generalized from hop counts to NON-NEGATIVE INTEGER edge weights
    (integer so distances are bit-exact under any partitioning; scale real
    weights to fixed-point like :func:`pagerank` does ranks).

    Args:
      edges:  (graph_id, src, dst, w) with both directions materialized
              and w >= 0 (long).
      starts: (graph_id, id).
    Returns:
      (graph_id, id, dist) for every reachable vertex, dist = min total
      weight; starts at 0.

    The frontier-relaxation Bellman-Ford (delta-stepping's degenerate
    form): each superstep relaxes only edges out of vertices whose
    distance IMPROVED last superstep, so settled regions stop costing
    anything — on non-negative weights the improved set empties within
    V-1 supersteps (typically ~weighted diameter).  Same shuffle budget
    as :func:`bfs`: adjacency shuffled once into the persisted key
    partitioning, frontier broadcast while small, one equi-join + one
    min-aggregate per superstep."""
    adj = edges.select(
        "graph_id", F.col("src").alias("id"), F.col("dst").alias("nb"), F.col("w")
    )
    n_edges = adj.count()
    n_part = min(n_edges // _ADJ_ROWS_PER_PARTITION + 1, _ADJ_MAX_PARTITIONS)
    adj = adj.repartition(n_part, "graph_id", "id").persist()

    dist = (
        starts.select("graph_id", F.col("id").cast("long").alias("id"))
        .withColumn("dist", F.lit(0).cast("long"))
        .localCheckpoint(eager=True)
    )
    frontier = dist
    f_cnt = frontier.count()
    d_cnt = f_cnt
    while f_cnt > 0:
        f_side = F.broadcast(frontier) if f_cnt <= broadcast_threshold else frontier
        cand = (
            f_side.join(adj, on=["graph_id", "id"])
            .select(
                "graph_id",
                F.col("nb").alias("id"),
                (F.col("dist") + F.col("w")).alias("dist"),
            )
            .groupBy("graph_id", "id")
            .agg(F.min("dist").alias("dist"))
        )
        cur = dist.select("graph_id", "id", F.col("dist").alias("_old"))
        c_side = F.broadcast(cur) if d_cnt <= broadcast_threshold else cur
        improved = (
            cand.join(c_side, on=["graph_id", "id"], how="left")
            .filter(F.col("_old").isNull() | (F.col("dist") < F.col("_old")))
            .select("graph_id", "id", "dist")
            .localCheckpoint(eager=True)
        )
        f_cnt = improved.count()
        if f_cnt == 0:
            break
        dist = (
            dist.unionByName(improved)
            .groupBy("graph_id", "id")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
        d_cnt = dist.count()
        frontier = improved
    adj.unpersist()
    return dist


def sssp_fleet(edges: DataFrame, starts: DataFrame) -> DataFrame:
    """Fleet-mode SSSP: per-graph Dijkstra (binary heap) in a cogrouped
    Arrow task — the many-tiny-graphs twin of :func:`sssp`, same regime
    argument as :func:`bfs_fleet`.  Python ints, so distances are exact
    and BIT-IDENTICAL to the iterative kernel (kernel-agreement property
    test)."""
    import heapq

    def run_sssp(edges_pdf: pd.DataFrame, starts_pdf: pd.DataFrame) -> pd.DataFrame:
        if starts_pdf.empty:
            return pd.DataFrame({"graph_id": [], "id": [], "dist": []})
        gid = int(starts_pdf["graph_id"].iloc[0])
        adj: dict[int, list[tuple[int, int]]] = {}
        for s, d, w in zip(edges_pdf["src"], edges_pdf["dst"], edges_pdf["w"]):
            adj.setdefault(int(s), []).append((int(d), int(w)))
        dist: dict[int, int] = {}
        heap = [(0, int(v)) for v in starts_pdf["id"]]
        heapq.heapify(heap)
        while heap:
            d, v = heapq.heappop(heap)
            if v in dist:
                continue
            dist[v] = d
            for nb, w in adj.get(v, ()):
                if nb not in dist:
                    heapq.heappush(heap, (d + w, nb))
        return pd.DataFrame(
            {"graph_id": gid, "id": list(dist), "dist": list(dist.values())}
        )

    return (
        edges.groupBy("graph_id")
        .cogroup(starts.groupBy("graph_id"))
        .applyInPandas(run_sssp, schema="graph_id int, id long, dist long")
    )


def sssp_auto(
    edges: DataFrame, starts: DataFrame, max_edges: int | None = None
) -> DataFrame:
    """Kernel dispatch for SSSP, same rule as :func:`bfs_auto`."""
    biggest = max_graph_edges(edges) if max_edges is None else max_edges
    if biggest <= _FLEET_MAX_EDGES:
        return sssp_fleet(edges, starts)
    return sssp(edges, starts)


def toposort_levels(
    edges: DataFrame,
    max_iter: int = 1000,
    broadcast_threshold: int = 1_000_000,
) -> DataFrame:
    """Topological levels of a DAG: (graph_id, id, level) where level(v) =
    the LONGEST path from any root (a vertex with no incoming edge) — the
    dependency-scheduling order (every vertex's level exceeds all its
    predecessors'), which plain BFS level (shortest path) does not give on
    DAGs with reconverging paths.

    Edges are DIRECTED (src -> dst) and must form a DAG; an accidental
    cycle raises instead of spinning.

    Two kernels, dispatched by in-degree (the ``bfs_auto`` pattern):

    - max in-degree <= 1 (a forest of chains/trees — CDC lineage chains,
      the order-chain fixture): POINTER DOUBLING — every vertex keeps
      (ptr, dist-to-ptr) and each round jumps ptr to ptr(ptr), doubling
      the collapsed distance, so a depth-d chain resolves in ceil(log2 d)
      rounds of one self-equijoin each.  Iteration count set by log of
      the depth, not the depth — the difference between 40 supersteps and
      6 at bench scale, and between 10^6 and 20 rounds on a
      million-long lineage chain at 100 TB.
    - general DAGs (reconverging paths => a vertex has many pointers, so
      doubling's state would explode): frontier relaxation — frontier_k =
      vertices ending some k-edge path from a root, final level folded
      with groupBy-max.  Same shuffle discipline as :func:`bfs`
      (once-shuffled persisted adjacency, broadcast frontier, per-step
      localCheckpoint); supersteps = longest path length.

    Kernel agreement on in-degree<=1 inputs is property-pinned in
    tests/test_traversal.py.
    """
    max_indeg_row = (
        edges.groupBy("graph_id", "dst").count().agg(F.max("count")).first()
    )
    max_indeg = max_indeg_row[0] or 0
    if max_indeg <= 1:
        return _toposort_pointer_doubling(
            edges, broadcast_threshold=broadcast_threshold
        )
    return _toposort_relax(edges, max_iter, broadcast_threshold)


def _toposort_pointer_doubling(
    edges: DataFrame,
    max_rounds: int = 63,
    broadcast_threshold: int = 1_000_000,
) -> DataFrame:
    """(graph_id, id, level) for in-degree<=1 DAGs via pointer jumping.

    Invariant: dist(v) = path length from v to ptr(v) (to the root when
    ptr is null).  Init ptr=parent, dist=1 (roots: null, 0); each round
    dist += dist(ptr), ptr = ptr(ptr).  Any finite acyclic chain drains
    in <= 63 rounds (depth < 2^63); a surviving pointer after that is a
    cycle and raises.

    The lookup (target) side is the whole vertex state; while it fits the
    broadcast threshold each round is a broadcast hash join — zero
    shuffle — with a shuffle-HASH (not sort-merge) fallback above it.
    DRAINED rows (ptr resolved to null) leave the join's probe side but
    remain lookup targets — see :func:`_pointer_doubling_loop`."""
    parent = edges.select(
        "graph_id", F.col("dst").cast("long").alias("id"), F.col("src").cast("long").alias("ptr")
    )
    nodes = (
        edges.select("graph_id", F.col("src").cast("long").alias("id"))
        .union(edges.select("graph_id", F.col("dst").cast("long").alias("id")))
        .distinct()
    )
    state = nodes.join(parent, on=["graph_id", "id"], how="left").select(
        "graph_id",
        "id",
        "ptr",
        F.when(F.col("ptr").isNotNull(), F.lit(1)).otherwise(F.lit(0))
        .cast("long")
        .alias("dist"),
    )
    out = _pointer_doubling_loop(
        state,
        payload="dist",
        merged_payload=(F.col("dist") + F.coalesce("t_dist", F.lit(0))),
        err_name="toposort_levels",
        max_rounds=max_rounds,
        broadcast_threshold=broadcast_threshold,
    )
    return out.select("graph_id", "id", F.col("dist").alias("level"))


def _pointer_doubling_loop(
    state: DataFrame,
    payload: str,
    merged_payload,
    err_name: str,
    max_rounds: int,
    broadcast_threshold: int,
) -> DataFrame:
    """Shared pointer-jumping loop over state (graph_id, id, ptr,
    ``payload``): each round every LIVE row (ptr != null) jumps
    ptr -> ptr(ptr) and folds its payload via ``merged_payload`` (an
    expression over the live row's columns and the jump target's t_*
    columns); rows whose pointer resolves to null are DRAINED — they
    stop flowing through the probe side of subsequent rounds (for
    uniform-depth forests most rows drain in the middle rounds, saving
    ~40% of joined rows end-to-end) but remain lookup targets, since a
    live pointer may land on them.

    Join strategy: broadcast of the full state below
    ``broadcast_threshold`` rows, else shuffle-HASH (hinted — the
    sort-merge default pays two sorts per round for slim 4-column rows;
    measured 11.5s vs 9.8s per sf1 chain-roots run).  A maintenance
    repartition to pre-align the target side was measured WORSE (27s:
    localCheckpoint materializes to an RDD scan with
    UnknownPartitioning, so Catalyst cannot reuse the exchange and the
    repartition is pure extra work — the experiment that killed the
    idea is in BENCH_SF1.md round 6)."""
    state = state.localCheckpoint(eager=True)
    n_state = state.count()
    shuffle_regime = n_state > broadcast_threshold
    done_parts = [state.filter(F.col("ptr").isNull())]
    live = state.filter(F.col("ptr").isNotNull())
    n_live = live.count()
    rounds = 0
    while n_live > 0:
        rounds += 1
        if rounds > max_rounds:
            raise ValueError(
                f"{err_name}: pointers alive after {max_rounds} doubling "
                "rounds — the edge set has a cycle"
            )
        # every t_* column renamed: a checkpointed self-join shares expr
        # IDs, and same-named columns in the condition resolve ambiguously
        full = functools.reduce(DataFrame.union, done_parts, live)
        target = full.select(
            F.col("graph_id").alias("t_gid"),
            F.col("id").alias("t_id"),
            F.col("ptr").alias("t_ptr"),
            F.col(payload).alias(f"t_{payload}"),
        )
        t_side = (
            target.hint("shuffle_hash") if shuffle_regime else F.broadcast(target)
        )
        new = (
            live.join(
                t_side,
                on=(F.col("graph_id") == F.col("t_gid"))
                & (F.col("ptr") == F.col("t_id")),
                how="left",
            )
            .select(
                "graph_id",
                "id",
                F.col("t_ptr").alias("ptr"),
                merged_payload.alias(payload),
            )
            .localCheckpoint(eager=True)
        )
        done_parts.append(new.filter(F.col("ptr").isNull()))
        live = new.filter(F.col("ptr").isNotNull())
        n_live = live.count()
    return functools.reduce(DataFrame.union, done_parts)


def _toposort_relax(
    edges: DataFrame,
    max_iter: int = 1000,
    broadcast_threshold: int = 1_000_000,
) -> DataFrame:
    # ids normalized to long exactly like the doubling kernel, so the
    # output schema does not depend on which kernel dispatch picked
    edges = edges.select(
        "graph_id", F.col("src").cast("long").alias("src"), F.col("dst").cast("long").alias("dst")
    )
    adj = _partitioned_adj(edges)
    nodes = (
        edges.select("graph_id", F.col("src").alias("id"))
        .union(edges.select("graph_id", F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()
    has_in = edges.select("graph_id", F.col("dst").alias("id")).distinct()
    frontier = (
        nodes.join(has_in, on=["graph_id", "id"], how="left_anti")
        .withColumn("level", F.lit(0))
        .localCheckpoint(eager=True)
    )
    assigned = frontier
    f_cnt = frontier.count()
    level = 0
    while f_cnt > 0:
        level += 1
        if level > max_iter:
            adj.unpersist()
            raise ValueError(
                f"toposort_levels: frontier alive after {max_iter} supersteps — "
                "the edge set has a cycle (or raise max_iter for a deeper DAG)"
            )
        f_side = F.broadcast(frontier) if f_cnt <= broadcast_threshold else frontier
        frontier = (
            f_side.select("graph_id", "id")
            .join(adj, on=["graph_id", "id"])
            .select("graph_id", F.col("nb").alias("id"))
            .distinct()
            .withColumn("level", F.lit(level))
            .localCheckpoint(eager=True)
        )
        f_cnt = frontier.count()
        if f_cnt > 0:
            assigned = assigned.union(frontier)
            if level % _CHECKPOINT_EVERY == 0:
                assigned = assigned.localCheckpoint(eager=True)
    out = (
        assigned.groupBy("graph_id", "id")
        .agg(F.max("level").alias("level"))
        .localCheckpoint(eager=True)
    )
    adj.unpersist()
    # Every DAG vertex is reachable from some root, so a vertex the
    # frontier never assigned sits on (or behind) a cycle the drained
    # frontier simply never reached — without this check a DISCONNECTED
    # cycle would be silently omitted instead of raising like every
    # other cycle shape does.
    n_assigned = out.count()
    if n_assigned != n_nodes:
        raise ValueError(
            f"toposort_levels: {n_nodes - n_assigned} vertices unreachable "
            "from any root — the edge set has a cycle"
        )
    return out


def forest_roots(
    edges: DataFrame,
    max_rounds: int = 63,
    broadcast_threshold: int = 1_000_000,
) -> DataFrame:
    """(graph_id, id, root) for every vertex of an in-degree<=1 edge set
    (a forest of chains/trees): root = the unique ancestor with no
    incoming edge — the distributed find() of union-find, by the same
    pointer-doubling kernel as :func:`_toposort_pointer_doubling`
    (ceil(log2 depth) self-join rounds).  The representative-lookup
    primitive under CDC lineage resolution ("which original record does
    this chain of amendments descend from"), survivorship, and
    chain-partitioned incremental processing.

    Roots map to themselves; vertices are exactly the edge endpoints
    (an isolated record with no edges has no row — trivially its own
    root).  Raises on a cycle (pointers never drain)."""
    parent = edges.select(
        "graph_id", F.col("dst").cast("long").alias("id"), F.col("src").cast("long").alias("ptr")
    )
    nodes = (
        edges.select("graph_id", F.col("src").cast("long").alias("id"))
        .union(edges.select("graph_id", F.col("dst").cast("long").alias("id")))
        .distinct()
    )
    state = nodes.join(parent, on=["graph_id", "id"], how="left").select(
        "graph_id",
        "id",
        "ptr",
        F.coalesce("ptr", "id").alias("root"),
    )
    out = _pointer_doubling_loop(
        state,
        payload="root",
        merged_payload=F.coalesce("t_root", "root"),
        err_name="forest_roots",
        max_rounds=max_rounds,
        broadcast_threshold=broadcast_threshold,
    )
    return out.select("graph_id", "id", "root")


def kcore(
    edges: DataFrame,
    k: int,
    max_iter: int = 50,
) -> DataFrame:
    """K-CORE decomposition by iterative peeling: repeatedly drop
    vertices with degree < k until the fixpoint; return the surviving
    vertices with their degree INSIDE the core as ``(id, core_degree)``.

    ``edges`` must carry both directions of each undirected edge as
    ``(u, v)`` rows.  Each round is one semi-join restriction + one
    partial-agg degree count over the CURRENT subgraph — work shrinks
    monotonically as vertices peel, and the round count is the peeling
    depth of the graph (bounded by max degree layers, NOT |V|, on the
    dense-community graphs k-core targets; a chain is the adversarial
    case and peels in O(|V|/2) rounds — use the fleet kernel for
    path-shaped graphs).  ``localCheckpoint`` truncates the growing
    lineage each round, the same discipline as ``bfs``.

    The termination test is a count() comparison: keep ⊆ alive always
    holds, so equal counts imply the fixpoint — one cheap action per
    round instead of a subtract.

    No reference citation: the reference's graph surface is 4 traversal
    ops (SURVEY.md §2.1); k-core is driver-mandated extension surface
    (graph analytics beyond parity, §2.3)."""
    alive = edges.select(F.col("u").alias("id")).distinct().localCheckpoint(
        eager=True
    )
    n_alive = alive.count()
    for _ in range(max_iter):
        sub = edges.join(alive.select(F.col("id").alias("u")), "u", "left_semi").join(
            alive.select(F.col("id").alias("v")), "v", "left_semi"
        )
        deg = sub.groupBy("u").agg(F.count("*").alias("core_degree"))
        keep = deg.filter(F.col("core_degree") >= k).localCheckpoint(eager=True)
        n_keep = keep.count()
        if n_keep == n_alive:
            return keep.select(F.col("u").alias("id"), "core_degree")
        alive = keep.select(F.col("u").alias("id"))
        n_alive = n_keep
        if n_alive == 0:
            return keep.select(F.col("u").alias("id"), "core_degree")
    raise RuntimeError(f"kcore: no fixpoint within {max_iter} rounds")


def kcore_fleet(edges: DataFrame, k: int) -> DataFrame:
    """In-task k-core: the whole graph peels inside ONE Arrow kernel via
    the linear-time bucket algorithm (Matula–Beck degeneracy peeling:
    maintain degrees, repeatedly delete any vertex whose degree dropped
    below k — a worklist, not global rounds), so peel DEPTH costs
    nothing.  The iterative :func:`kcore` pays ~1 s of job overhead per
    peeling round; on graphs that fit one task (the co-purchase graph at
    sf0.1 peels ~15 rounds) this kernel is an order of magnitude faster
    — the same regime argument as :func:`bfs_fleet`.  Requires the edge
    list to fit one task's memory; :func:`kcore_auto` dispatches."""

    def peel(pdf: pd.DataFrame) -> pd.DataFrame:
        adj: dict[int, list[int]] = {}
        for u, v in zip(pdf["u"], pdf["v"]):
            adj.setdefault(int(u), []).append(int(v))
        deg = {u: len(nbs) for u, nbs in adj.items()}
        dead = [u for u, d in deg.items() if d < k]
        while dead:
            u = dead.pop()
            if deg.get(u) is None:
                continue
            del deg[u]
            for nb in adj[u]:
                d = deg.get(nb)
                if d is not None:
                    deg[nb] = d - 1
                    if d - 1 == k - 1:
                        dead.append(nb)
        return pd.DataFrame(
            {"id": list(deg.keys()), "core_degree": list(deg.values())}
        )

    return (
        edges.withColumn("_g", F.lit(0))
        .groupBy("_g")
        .applyInPandas(
            lambda pdf: peel(pdf), schema="id long, core_degree long"
        )
    )


def kcore_auto(
    edges: DataFrame,
    k: int,
    fleet_max_edges: int = 2_000_000,
    max_iter: int | None = None,
) -> DataFrame:
    """Kernel dispatch for k-core, mirroring :func:`bfs_auto`: an edge
    count (one cheap action) picks in-task bucket peeling for graphs
    that fit one task, else the distributed per-round loop.  Identical
    semantics either way (kernel-agreement pytest); only the physical
    strategy changes — peel depth is free in-task, while the iterative
    kernel parallelizes each round across the cluster for graphs that
    don't fit.

    ``max_iter`` threads through to the distributed :func:`kcore` loop
    (ADVICE r6: the hardcoded 50-round cap made deep-peeling
    path/tendril-shaped graphs above ``fleet_max_edges`` raise instead
    of converge).  When None the cap derives from the graph itself:
    each peeling round removes at least one vertex or reaches the
    fixpoint, so rounds are bounded by the vertex count, itself bounded
    by the (already counted) directed edge count + isolated-free
    construction — ``n_edges + 1`` rounds can never fire before
    convergence.  50 stays the floor so tiny graphs keep a loud
    runaway-bug detector rather than a vacuous one.

    The edge list is localCheckpoint-materialized BEFORE the dispatch
    count: edge derivation is often the expensive half (the co-purchase
    gate's self-join), and counting a lazy plan then handing the same
    plan to the kernel would compute it twice."""
    edges = edges.localCheckpoint(eager=True)
    n_edges = edges.count()
    if n_edges <= fleet_max_edges:
        return kcore_fleet(edges, k)
    return kcore(edges, k, max_iter=max_iter or max(50, n_edges + 1))


def pairs_to_canonical(
    pairs: DataFrame,
    ids: DataFrame,
    pair_cols: tuple[str, str],
    id_col: str,
) -> DataFrame:
    """SURVIVORSHIP from a near-dup pair list: symmetrize ``pairs``
    (columns ``pair_cols``) into a single-graph edge frame, run
    min-label connected components over the ``ids`` vertex frame
    (column ``id_col``), and return ``(id_col, canonical_id)`` — every
    id mapped to the smallest id in its cluster, singletons to
    themselves.  The shared tail of all three dedup modes (text
    MinHash, embedding cosine, image aHash): the pair generator is the
    mode-specific half, the cluster labeling is identical."""
    a, b = pair_cols
    edges = (
        pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        .unionByName(pairs.select(F.col(b).alias("src"), F.col(a).alias("dst")))
        .select(
            F.lit(0).alias("graph_id"),
            F.col("src").cast("long"),
            F.col("dst").cast("long"),
        )
    )
    vertices = ids.select(
        F.lit(0).alias("graph_id"), F.col(id_col).cast("long").alias("id")
    )
    cc = connected_components_auto(edges, vertices)
    return cc.select(F.col("id").alias(id_col), F.col("component").alias("canonical_id"))
