"""Near-duplicate cluster assignment: connected components over a candidate
pair list (e.g. MinHash+LSH output), so every document gets a canonical
cluster id (the minimum doc id in its component) and dedup can keep exactly
one survivor per cluster instead of dropping both ends of every pair.

Two algorithms, same output contract (cluster_id = min node id reachable):

* ``star`` (default, the scale path): alternating large-star/small-star
  rounds (Kiveris et al., "Connected Components in MapReduce and Beyond",
  2014 — public algorithm). Each round halves tree heights, so convergence
  is O(log d) rounds even on adversarial long-chain graphs; each half-round
  is one groupBy-min + one join-free projection over the edge list.
* ``label``: iterative min-label propagation. Rounds needed = graph
  diameter — fine for the star-shaped components LSH candidate graphs
  produce (2-4 rounds typical), quadratic-ish wall clock on long chains.

No driver-side graph state in either; per-round results are
``localCheckpoint``-ed so the plan doesn't grow with iteration count
(standard practice for iterative DataFrame algorithms)."""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

logger = logging.getLogger(__name__)


def _large_star(edges: DataFrame) -> DataFrame:
    """One large-star round: every node connects its strictly-larger
    neighbors to the minimum of its neighborhood (incl. itself). Input and
    output are undirected edge lists in canonical (larger, smaller) form;
    internally both directions are materialized for the per-node grouping."""
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("_mn"))
        .select("u", F.least(F.col("u"), F.col("_mn")).alias("m"))
    )
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star round over canonical (larger, smaller) edges: every
    node connects its smaller-or-equal neighbors (and itself) to the
    minimum of that neighborhood. Output stays canonical."""
    canon = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).where(F.col("u") != F.col("v"))
    mins = canon.groupBy("u").agg(F.min("v").alias("m"))
    to_min = canon.join(mins, "u")
    return (
        to_min.where(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .unionByName(mins.select("u", F.col("m").alias("v")))
        .distinct()
    )


def connected_components_star(
    pairs: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """Large-star/small-star component labeling (Kiveris et al. 2014):
    O(log d) rounds on any graph shape, so a 10k-node path converges in
    ~14 rounds where plain label propagation needs 10k. At fixpoint the
    edge set is a star per component, rooted at the component minimum."""
    edges = (
        pairs.select(
            F.greatest(F.col(src_col), F.col(dst_col)).alias("u"),
            F.least(F.col(src_col), F.col(dst_col)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if not edges.head(1):
        # no real edges (pairs empty or all self-pairs): every node that
        # appears is its own singleton cluster
        return (
            pairs.select(F.col(src_col).alias("node"))
            .unionByName(pairs.select(F.col(dst_col).alias("node")))
            .distinct()
            .withColumn("cluster_id", F.col("node"))
        )
    converged = False
    prev_count = edges.count()
    for _ in range(max_iter):
        new_edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        # both sides are distinct canonical sets: equal counts + empty
        # one-way difference <=> identical edge sets (count carried from the
        # previous round — no rescan of the old set)
        new_count = new_edges.count()
        if new_count == prev_count and new_edges.subtract(edges).isEmpty():
            edges = new_edges
            converged = True
            break
        edges, prev_count = new_edges, new_count
    if not converged:
        logger.warning(
            "connected_components_star did not converge in %d rounds; "
            "labels may split components — raise max_iter", max_iter,
        )
    members = edges.select(F.col("u").alias("node"), F.col("v").alias("cluster_id"))
    # every node appearing in pairs gets a row — components' roots and nodes
    # whose only pair was a self-edge (dropped from the edge list) label
    # themselves. At fixpoint every non-root points directly at its root so
    # the min-agg is a semantic no-op; it also guarantees one row per node
    # even when max_iter ran out mid-collapse.
    all_nodes = (
        pairs.select(F.col(src_col).alias("node"))
        .unionByName(pairs.select(F.col(dst_col).alias("node")))
        .distinct()
        .withColumn("cluster_id", F.col("node"))
    )
    return (
        members.unionByName(all_nodes)
        .groupBy("node")
        .agg(F.min("cluster_id").alias("cluster_id"))
    )


def connected_components_driver(
    pairs: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
) -> DataFrame:
    """Driver-side union-find over a BOUNDED edge list — same output
    contract as ``connected_components`` ((node, cluster_id), cluster_id =
    component minimum), built for graphs already known to be small.

    The distributed forms pay ~10–25 Spark jobs of per-iteration overhead
    (checkpoint + convergence count per round) regardless of graph size —
    measured 11 s for a 260k-edge reduced graph whose union-find answer
    costs well under a second. Callers gate on an edge-count threshold
    (see reconcile_survivors_frontier): the collect here is control-plane
    bounded by that gate, NOT a corpus-sized pull."""
    src_field = pairs.schema[src_col]
    rows = pairs.select(src_col, dst_col).collect()
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for r in rows:
        a, b = r[0], r[1]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    label: dict = {}
    for node in parent:
        root = find(node)
        cur = label.get(root)
        if cur is None or node < cur:
            label[root] = node
    out = [(node, label[find(node)]) for node in parent]
    spark = pairs.sparkSession
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("node", src_field.dataType),
            T.StructField("cluster_id", src_field.dataType),
        ]
    )
    return spark.createDataFrame(out, schema)


def connected_components(
    pairs: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iter: int = 25,
    algorithm: str = "star",
) -> DataFrame:
    """(node, cluster_id) for every node appearing in ``pairs``;
    cluster_id = min node id in the connected component.

    ``algorithm="star"`` (default) is the O(log d)-round scale path;
    ``"label"`` is plain min-label propagation (diameter rounds — only
    sensible when components are known to be shallow)."""
    if algorithm == "star":
        return connected_components_star(pairs, src_col, dst_col, max_iter)
    if algorithm != "label":
        raise ValueError(f"unknown algorithm {algorithm!r}: expected 'star' or 'label'")
    edges = (
        pairs.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .unionByName(pairs.select(F.col(dst_col).alias("u"), F.col(src_col).alias("v")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = edges.select(F.col("u").alias("node"), F.col("u").alias("label")).distinct()
    for _ in range(max_iter):
        neighbor_labels = (
            edges.join(labels, edges["v"] == labels["node"])
            .select(F.col("u").alias("node"), "label")
        )
        new_labels = (
            labels.unionByName(neighbor_labels)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        # range exhausted with labels still moving: the labeling is split
        # along chains longer than max_iter — surface it rather than return
        # silently-wrong clusters
        logger.warning(
            "connected_components did not converge in %d rounds (%d labels "
            "still changing); raise max_iter or switch to large-star/"
            "small-star for long-chain graphs",
            max_iter, changed,
        )
    return labels.select(F.col("node"), F.col("label").alias("cluster_id"))


def dedup_clusters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    **minhash_kwargs,
) -> DataFrame:
    """MinHash candidates -> connected components -> (doc_id, cluster_id,
    is_survivor). Only documents that belong to a near-dup cluster appear;
    the survivor is the cluster's minimum doc id."""
    from datalakefoundation_spark.ext.dedup import minhash_dedup_candidates

    pairs = minhash_dedup_candidates(df, text_col, id_col, **minhash_kwargs)
    comp = connected_components(pairs)
    return comp.select(
        F.col("node").alias(id_col),
        "cluster_id",
        (F.col("node") == F.col("cluster_id")).alias("is_survivor"),
    )
