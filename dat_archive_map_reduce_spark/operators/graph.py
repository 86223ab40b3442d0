"""Distributed graph operators over pair edges.

Near-dup operators (dedup.py) emit PAIRS; a pipeline acting on them
(keep one representative per duplicate group) needs CLUSTERS, i.e. the
connected components of the pair graph. Not in the reference (its view
engine has no graph ops); needed by any training-data dedup pass.
Alongside components live PageRank (iterative rank-table state — link
authority over a doc graph) and degree-oriented triangle counting
(local clustering structure).

Connected-components algorithm: alternating large-star / small-star
(the standard MapReduce-model method; converges in O(log n) rounds on
any graph, each round a constant number of shuffles). No driver-side
graph state — the driver loop only compares a per-round (count,
hash-sum) fingerprint, so a 10^11-edge graph iterates exactly like a
25-edge one. Per-round ``localCheckpoint`` truncates the plan lineage
that otherwise grows linearly (components) or exponentially
(pagerank's twice-consumed rank state) in rounds and overwhelms the
optimizer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """(u, v) with u > v, self-loops dropped, deduped."""
    return (
        edges.select(
            F.greatest(F.col(src), F.col(dst)).alias("u"),
            F.least(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u").isNotNull() & F.col("v").isNotNull() & (F.col("u") != F.col("v")))
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(N(u) ∪ {u})."""
    bidir = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = bidir.groupBy("u").agg(F.least(F.min("v"), F.col("u")).alias("m"))
    # no distinct here: small_star's aggregates dedup anyway, and the
    # extra exchange per round costs more than the duplicate rows
    return (
        bidir.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Connect u and all its (smaller) neighbors to the min neighbor.

    Input is canonical (u > v), so N(u) here is exactly the
    smaller-neighbor set the algorithm calls for.
    """
    mins = e.groupBy("u").agg(F.min("v").alias("m"))
    rewire = (
        e.join(mins, "u")
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    selfedge = mins.select("u", F.col("m").alias("v"))
    return rewire.union(selfedge).filter(F.col("u") != F.col("v")).distinct()


def _fingerprint(e: DataFrame) -> tuple[int, int]:
    """(edge count, order-independent hash sum) — cheap convergence
    probe; one aggregate per round, O(1) rows to the driver."""
    # decimal sum: a long sum of 64-bit hashes overflows under ANSI
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")), F.lit(0)
        ).alias("h"),
    ).first()
    return int(row["n"]), int(row["h"])


def _single_task_components(e: DataFrame) -> DataFrame:
    """Union-find over the whole (small) edge set inside ONE executor
    task — no driver collect, no iteration. Arrow streams every batch
    of the coalesced partition through one mapInPandas call, so the
    union-find state legitimately spans the full edge set; unioning
    the larger root UNDER the smaller keeps every tree's root at the
    component minimum, so labels are identical to the star
    iteration's (component = min node id)."""
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("node", T.LongType(), False),
            T.StructField("component", T.LongType(), False),
        ]
    )

    def _uf(batches):
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:
                parent[x], x = r, parent[x]
            return r

        for pdf in batches:
            for u, v in zip(pdf["u"].to_numpy(), pdf["v"].to_numpy()):
                u, v = int(u), int(v)
                parent.setdefault(u, u)
                parent.setdefault(v, v)
                ru, rv = find(u), find(v)
                if ru != rv:
                    parent[max(ru, rv)] = min(ru, rv)
        nodes = sorted(parent)
        yield pd.DataFrame(
            {"node": nodes, "component": [find(n) for n in nodes]}
        )

    return e.coalesce(1).mapInPandas(_uf, schema=schema)


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    small_graph_edges: int = 1_000_000,
) -> DataFrame:
    """(node, component) for every node incident to an edge, where
    component = the smallest node id in that node's connected
    component. Isolated nodes never appear (callers coalesce).

    Deterministic: component labels are data-derived minima, not
    partition-dependent. ``max_iter`` is a safety rail — alternating
    star provably converges in O(log n) rounds, so 25 covers any
    realistic graph; raise only for adversarial billion-node chains.

    Adaptive algorithm choice: the initial fingerprint already counts
    the canonical edge set, so when it is under ``small_graph_edges``
    the whole graph runs as a SINGLE-TASK union-find (one job, no
    iteration) — after a near-dup pass the pair graph is typically
    tiny relative to the corpus, and each star round costs a fixed
    multi-job latency that dominates outright there (measured: ~6s of
    round overhead for a 25-edge graph). Above the threshold the
    alternating-star rounds run fully distributed; a property test
    pins both paths to the same labels.
    """
    e = _canonical(edges, src, dst).localCheckpoint(eager=True)
    prev = _fingerprint(e)
    if prev[0] <= small_graph_edges:
        return _single_task_components(e)
    for _ in range(max_iter):
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        cur = _fingerprint(e)
        if cur == prev:
            break
        prev = cur
    # converged edge set is a star forest: (node -> component root)
    comps = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = (
        e.select(F.col("v").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    return comps.union(roots).groupBy("node").agg(F.min("component").alias("component"))


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "node",
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 3,
    damping: float = 0.85,
    round_digits: int = 9,
) -> DataFrame:
    """Distributed PageRank (Page et al. 1999) with the rank TABLE as
    state — the kmeans centroid-table pattern applied to an iterative
    graph algorithm. Per iteration: each node sends rank/outdegree
    along its out-edges (one key-join shuffle + one dst aggregation
    shuffle, both with map-side partial combine), dangling mass and
    node count fold to 1-row broadcast scalars, and the new rank is

        r'(v) = (1-d)/n + d * (sum_in contribs(v) + dangling_mass/n)

    Multi-edges contribute once each (they also count in outdegree),
    so a weighted graph encodes as repeated edges. Edges are
    restricted to the node set up front (both endpoints must appear
    in ``nodes``): an edge to an unknown endpoint is dropped BEFORE
    outdegree is computed, so its mass redistributes over the
    source's remaining edges (or the source becomes dangling) and
    total rank stays exactly 1 — without the pre-filter such edges
    would silently leak rank mass out of the system.

    Engine portability: each iteration's ranks round to
    ``round_digits`` decimals — the same per-round quantization that
    makes the distributed-kmeans chain replay exactly in a SQL oracle
    (sum-order float drift is ~1e-16 relative, orders of magnitude
    under the 1e-9 quantum, so both engines land on identical
    quantized ranks every round).

    Scale shape: ranks never exist driver-side or as plan literals;
    the rank table lazily localCheckpoints EVERY round (it feeds two
    consumers per iteration — contributions and dangling mass — so
    un-truncated lineage would double per round), keeping the plan
    O(1) across arbitrary ``n_iter``. 2 data-sized shuffles per
    iteration at any graph size.
    """
    n1 = nodes.select(F.col(node_col).alias("node"))
    tot = n1.agg(F.count(F.lit(1)).alias("n"))
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    # restrict to the node set so rank mass is conserved (see above);
    # loop-invariant, folded into the one-time checkpointed edge table
    e = e.join(n1.withColumnRenamed("node", "src"), "src", "leftsemi").join(
        n1.withColumnRenamed("node", "dst"), "dst", "leftsemi"
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # loop-invariant state checkpoints ONCE (the connected-components
    # recipe): the degree-joined edge table keeps its src hash
    # partitioning, so each iteration's key join reshuffles only the
    # rank table — without this, edges + degrees re-derive and
    # re-exchange every round (measured: 14 static exchanges for 3
    # rounds vs 2 data-sized per round after). LAZY checkpoints: the
    # logical plan truncates at the .localCheckpoint() call either
    # way, but eager=True paid one separate Spark job per checkpoint
    # (6 jobs for 3 rounds — 11.9 s of fixed overhead on a 5k-node
    # graph at sf0.1); lazy defers materialization to the single
    # final action, where each checkpointed RDD computes once and
    # both consumers (contributions + dangling mass) share it.
    e_deg = e.join(outdeg, "src").localCheckpoint(eager=False)
    dangling_nodes = n1.join(
        outdeg.withColumnRenamed("src", "node"), "node", "left_anti"
    ).localCheckpoint(eager=False)
    ranks = n1.crossJoin(F.broadcast(tot)).select(
        "node", F.round(F.lit(1.0) / F.col("n"), round_digits).alias("rank")
    )
    d = F.lit(float(damping))
    for _ in range(n_iter):
        contrib = (
            e_deg.join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("c"))
        )
        dangling = ranks.join(dangling_nodes, "node", "leftsemi").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm")
        )
        ranks = (
            n1.join(contrib.withColumnRenamed("dst", "node"), "node", "left")
            .crossJoin(F.broadcast(tot))
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                F.round(
                    (F.lit(1.0) - d) / F.col("n")
                    + d
                    * (F.coalesce(F.col("c"), F.lit(0.0)) + F.col("dm") / F.col("n")),
                    round_digits,
                ).alias("rank"),
            )
            # the rank table appears TWICE per round (contributions +
            # dangling mass), so lineage doubles each iteration without
            # a per-round checkpoint — 3 un-checkpointed rounds already
            # carry 40 Exchange nodes through analysis. Lazy: the plan
            # truncates now; the RDD computes once at the final action
            # and both next-round consumers share it (eager would add
            # one job per round).
            .localCheckpoint(eager=False)
        )
    return ranks


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle participation counts (node, n_triangles) for
    every node in at least one triangle — the MapReduce triangle
    algorithm of Cohen 2009 / Suri-Vassilvitskii 2011 with
    DEGREE ORIENTATION: each undirected edge points from its
    lower-(degree, id) endpoint to the higher, so every node's
    out-degree is O(sqrt(m)) and the wedge self-join — the step that
    explodes quadratically on hot vertices in the naive id-ordered
    form — generates at most m^(3/2) candidates total regardless of
    skew (a celebrity node with 10^6 neighbors creates zero wedges
    at itself; its wedges distribute across its low-degree
    neighbors).

    Orientation affects only the plan, never the result: a SQL oracle
    may count the same triangles with the naive u<v chain join.
    Shuffles: degree agg, two orientation key joins, the wedge
    self-join, the closing-edge join, and the per-node count — all
    partial-combined or key-partitioned, no driver state.
    """
    e = _canonical(edges, src, dst)  # (u, v) with u > v, deduped
    both = e.select(F.col("u").alias("node")).union(
        e.select(F.col("v").alias("node"))
    )
    deg = both.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    ranked = (
        e.join(deg.withColumnRenamed("node", "u"), "u")
        .withColumnRenamed("deg", "deg_u")
        .join(
            deg.select(
                F.col("node").alias("v"), F.col("deg").alias("deg_v")
            ),
            "v",
        )
    )
    u_first = (F.col("deg_u") < F.col("deg_v")) | (
        (F.col("deg_u") == F.col("deg_v")) & (F.col("u") < F.col("v"))
    )
    oriented = ranked.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("b"),
    )
    o2 = oriented.select(
        F.col("a").alias("a2"), F.col("b").alias("c")
    )
    wedges = oriented.join(
        o2, (F.col("a") == F.col("a2")) & (F.col("b") < F.col("c"))
    ).select("a", "b", "c")
    closing = e.select(
        F.col("u").alias("hi"), F.col("v").alias("lo")
    )
    tri = wedges.join(
        closing,
        (F.col("hi") == F.greatest("b", "c"))
        & (F.col("lo") == F.least("b", "c")),
    ).select("a", "b", "c")
    return (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def kcore_peel(
    edges: DataFrame,
    k: int = 3,
    rounds: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """``rounds`` iterations of k-core peeling (Seidman 1983; the
    Batagelj-Zaveršnik peel expressed as bulk-synchronous rounds):
    repeatedly drop every node whose degree in the SURVIVING subgraph
    is < k, with all drops in a round applied simultaneously. Run to
    a fixed point this yields the k-core — the standard web-graph
    quality/spam signal; a FIXED round count makes the step
    oracle-replayable (the pagerank/kmeans bounded-iteration
    pattern), and each round only ever shrinks the edge set.

    Input edges are treated as undirected and deduplicated (multi-
    edges count once toward degree). Returns (node, degree) for nodes
    surviving all rounds, with their degree in the final subgraph.

    Scale shape per round: one partial-combined degree aggregate +
    two semi-joins of the edge table against the surviving node set
    (node-grain, co-partitioned on the join key) — all integer
    arithmetic, no floats anywhere. The edge table localCheckpoints
    each round (lazily) so plan depth stays O(1) in rounds, the same
    lineage-truncation recipe as pagerank."""
    und = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
    )
    e = (
        und.select("u", "v")
        .union(und.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    for _ in range(rounds):
        deg = e.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.filter(F.col("deg") >= k).select("u")
        e = (
            e.join(keep, "u", "leftsemi")
            .join(keep.withColumnRenamed("u", "v"), "v", "leftsemi")
            .select("u", "v")
            .localCheckpoint(eager=False)
        )
    return (
        e.groupBy("u")
        .agg(F.count(F.lit(1)).alias("degree"))
        .select(F.col("u").alias("node"), "degree")
    )


def doc_link_edges(docs: DataFrame, id_col: str = "doc_id") -> "tuple[DataFrame, DataFrame]":
    """THE synthetic doc-link graph every graph query shares
    (pagerank / triangle count / k-core / label propagation — and
    their oracle CTEs, which replay the same formulas in SQL):
    node u emits 1 + u % 3 directed edges to (u*131071 + j*524287)
    % n for j in 1..3, self-loops dropped. Extracted so a recipe
    tweak cannot silently fork the graph between queries (the four
    Spark bodies previously carried verbatim copies). Returns
    (directed edges as (src, dst), the 1-row total-count DataFrame) —
    callers reuse the count for rank normalization."""
    spark = docs.sparkSession
    tot = docs.agg(F.count(F.lit(1)).alias("n"))
    j = spark.createDataFrame([(1,), (2,), (3,)], "j int")
    dst = (F.col(id_col) * 131071 + F.col("j") * 524287) % F.col("n")
    edges = (
        docs.select(id_col)
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(j))
        .filter(F.col("j") <= 1 + F.col(id_col) % 3)
        .select(F.col(id_col).alias("src"), dst.alias("dst"))
        .filter(F.col("dst") != F.col("src"))
    )
    return edges, tot
