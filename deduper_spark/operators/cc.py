"""Connected components over the verified dup-pair graph.

Generalizes the reference's dupe group (Deduper.kt:225-240): under
exact equality, groups are trivially connected (same hash); under
fuzzy similarity the dup relation is a graph, and a cluster is a
connected component. cluster_id = min member id (union-find label),
which also IS the keep-first survivor (min image_id — the reference's
first-found-row generalized).

Two algorithms:

* alternating large-star/small-star (DEFAULT) — the "two-phase"
  algorithm of Kiveris et al., "Connected Components in MapReduce and
  Beyond" (SoCC'14), also what GraphFrames ships as its default CC.
  Each round rewires edges toward local minima (large-star: every
  node links its larger neighbors to its smallest neighbor;
  small-star: every node links its smaller neighbors to the smallest)
  which CONTRACTS long paths exponentially: O(log d) rounds on a
  chain of diameter d, vs O(d) for plain label propagation. A
  chain-shaped dup graph (consecutive near-dup crawl snapshots) that
  burned 25 shuffles — or hit the fail-hard — under label propagation
  converges in ~log2(d) rounds here. Each phase is one groupBy
  shuffle over the (shrinking) edge list.

* min-label propagation (label_propagation_components) — the plain
  O(diameter) fixpoint, kept for comparison/verification; dup graphs
  are usually clique-ish (diameter 1-3) where it is equally cheap.

Each round localCheckpoint()s so the plan does not grow superlinearly
(SURVEY.md §7 hard part (c)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """(u,v) -> connect every neighbor LARGER than u to u's minimum.

    For each node u with undirected neighborhood N(u):
    m = min(N(u) ∪ {u}); emit (v, m) for v in N(u), v > u.

    r6: the neighborhood minimum is a window aggregate over src — ONE
    hash Exchange per phase instead of the former groupBy + self-join
    pair (guide §2.4: operations keyed the same way share one
    exchange; the join added a second pass plus build/probe work).
    """
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    m = F.least(F.col("src"),
                F.min("dst").over(Window.partitionBy("src")))
    return (
        sym.withColumn("m", m)
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .where(F.col("src") != F.col("dst"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """(u,v) -> connect every neighbor <= u (and u itself) to the min.

    Operates on edges oriented src > dst; for each src u with smaller
    neighbors S(u): m = min(S(u)); emit (v, m) for v in S(u) ∪ {u}.

    r6: same window-over-src form as _large_star (one Exchange, no
    join); (src, m) is emitted per neighbor row instead of once per
    src — the trailing distinct absorbs the duplicates exactly as it
    absorbed the former union's.
    """
    oriented = edges.select(
        F.greatest("src", "dst").alias("src"),
        F.least("src", "dst").alias("dst"),
    ).where(F.col("src") != F.col("dst"))
    m = F.min("dst").over(Window.partitionBy("src"))
    rewired = (
        oriented.withColumn("m", m)
        .select(
            F.explode(
                F.array(
                    F.struct(F.col("dst").alias("src"),
                             F.col("m").alias("dst")),
                    F.struct(F.col("src").alias("src"),
                             F.col("m").alias("dst")),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    return rewired


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    max_iter: int = 50,
    id_type: str = "string",
    algorithm: str = "alternating",
    edges_distinct: bool = False,
) -> DataFrame:
    """edges: (id_l, id_r). nodes: (id) incl. singletons (optional).
    Returns (id, cluster_id) for every node in edges ∪ nodes.

    ``edges_distinct=True`` skips the defensive input distinct — every
    in-engine pair generator ends in a groupBy/distinct on (id_l, id_r)
    so the dedup Exchange here would be a pure repeat (r6)."""
    if algorithm == "label_prop":
        return label_propagation_components(edges, nodes, max_iter)

    e0 = edges.select(
        F.col("id_l").alias("src"), F.col("id_r").alias("dst")
    ).where(F.col("src") != F.col("dst"))
    if not edges_distinct:
        e0 = e0.distinct()
    # lazy: round 1's convergence aggregation materializes e0 together
    # with the first rewire — one fewer job per call (r6)
    e0 = e0.localCheckpoint(eager=False)

    # no up-front emptiness probe (r6): an empty edge set satisfies the
    # fixpoint test in round 0 at the cost of one trivial job, so the
    # dedicated limit(1) action was a job per call on EVERY input
    e = e0
    converged = False
    last_stats = None
    for _it in range(max_iter):
        # lazy localCheckpoint: the convergence aggregation below is
        # the materializing action, so each round costs ONE job for
        # rewire+checkpoint+stats instead of two (r6 — the alternating
        # loop is scheduling-latency-bound on small edge sets and the
        # merged action also skips one full pass at scale)
        e = _small_star(_large_star(e)).localCheckpoint(eager=False)
        # PROVABLE fixpoint test, checked in the SAME round it is
        # reached (an equality check against the previous edge set
        # would burn one extra full iteration): both phases emit edges
        # oriented src > dst, and the fixpoints of the alternating
        # algorithm are exactly star forests — every child points at
        # its one root, roots never appear as src. So converged iff
        #   (a) each src has exactly one edge (count == distinct srcs)
        #   (b) no src ever appears as dst
        # — one aggregation + (when (a) holds) one semi-join probe over
        # the just-checkpointed edges. n_roots rides the same agg so
        # the post-loop label-count assert needs no extra job.
        stats = e.agg(
            F.count("*").alias("n"),
            F.count_distinct("src").alias("n_src"),
            F.count_distinct("dst").alias("n_roots"),
        ).collect()[0]
        last_stats = stats
        if stats["n"] == stats["n_src"]:
            roots_as_src = (
                e.select("dst").join(e.select(F.col("src").alias("dst")),
                                     "dst", "left_semi").limit(1).count()
            )
            if roots_as_src == 0:
                converged = True
                break

    if not converged:
        # silent truncation would split components into WRONG cluster
        # ids and corrupt survivor selection — fail hard
        raise RuntimeError(
            f"connected_components (alternating) did not converge within "
            f"max_iter={max_iter} rounds"
        )

    # star forest: children label with their root, roots with themselves
    roots = e.select(F.col("dst").alias("id")).distinct()
    labels = (
        e.select(F.col("src").alias("id"), F.col("dst").alias("cluster_id"))
        .unionByName(roots.withColumn("cluster_id", F.col("id")))
    )
    # contraction never drops a connected node (every rewiring target is
    # an existing node id, so endpoints(e) ⊆ endpoints(e0)); ASSERT that
    # against one count aggregation over e0. The labeled count needs no
    # job: at the fixpoint srcs are unique and disjoint from dsts, so
    # |labels| = n + n_roots from the convergence stats (r6 — the
    # former labels.count() also re-ran the roots distinct).
    n_labeled = last_stats["n"] + last_stats["n_roots"]
    if last_stats["n"]:
        n_orig = (
            e0.select(F.col("src").alias("id"))
            .unionByName(e0.select(F.col("dst").alias("id")))
            .agg(F.count_distinct("id").alias("n")).collect()[0]["n"]
        )
        if n_labeled != n_orig:
            raise RuntimeError(
                f"connected_components lost nodes during contraction: "
                f"{n_orig} edge endpoints, {n_labeled} labeled"
            )
    out = labels

    if nodes is not None:
        singletons = (
            nodes.select(F.col(nodes.columns[0]).alias("id"))
            .join(out.select("id"), "id", "left_anti")
            .withColumn("cluster_id", F.col("id"))
        )
        out = out.unionByName(singletons)
    return out


def label_propagation_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    max_iter: int = 25,
) -> DataFrame:
    """Plain min-id label propagation to a fixpoint — O(diameter)
    rounds; kept as the verification twin of the alternating
    algorithm (clique-ish dup graphs converge in 2-3 rounds)."""
    sym = (
        edges.select(F.col("id_l").alias("src"), F.col("id_r").alias("dst"))
        .unionByName(
            edges.select(F.col("id_r").alias("src"), F.col("id_l").alias("dst"))
        )
        .distinct()
        .localCheckpoint()
    )

    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
    )

    converged = False
    for _it in range(max_iter):
        # neighbor minimum in one agg, then elementwise min with own
        # label; the changed flag is computed IN the round so the
        # convergence probe is a cheap scan of the round's checkpoint,
        # not an extra join+shuffle
        if _it == 0:
            # label(v) == v initially, so round 0 needs NO label join:
            # min over neighbors' labels == min over neighbor ids
            neigh = (
                sym.groupBy("src").agg(F.min("dst").alias("nmin"))
                .withColumnRenamed("src", "id")
            )
        else:
            neigh = (
                sym.join(labels.withColumnRenamed("id", "dst"), "dst")
                .groupBy("src")
                .agg(F.min("label").alias("nmin"))
                .withColumnRenamed("src", "id")
            )
        stepped = (
            labels.join(neigh, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                ).alias("label"),
                (F.coalesce(F.col("nmin"), F.col("label")) < F.col("label"))
                .alias("__chg"),
            )
            .localCheckpoint()
        )
        labels = stepped.select("id", "label")
        if stepped.where(F.col("__chg")).limit(1).count() == 0:
            converged = True
            break

    if not converged:
        raise RuntimeError(
            f"label_propagation_components did not converge within "
            f"max_iter={max_iter} rounds (component diameter too large)"
        )

    out = labels.withColumnRenamed("label", "cluster_id")
    if nodes is not None:
        singletons = (
            nodes.select(F.col(nodes.columns[0]).alias("id"))
            .join(out.select("id"), "id", "left_anti")
            .withColumn("cluster_id", F.col("id"))
        )
        out = out.unionByName(singletons)
    return out
