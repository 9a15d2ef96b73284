"""Near-duplicate cluster assignment: connected components over a candidate
pair list (e.g. MinHash+LSH output), so every document gets a canonical
cluster id (the minimum doc id in its component) and dedup can keep exactly
one survivor per cluster instead of dropping both ends of every pair.

Algorithm: iterative min-label propagation. Each round every node takes the
minimum of its own label and its neighbors' labels; the fixpoint (labels
stop changing) assigns each node the minimum node id reachable from it,
which is a complete and deterministic component labeling. Rounds needed =
graph diameter; near-dup components are overwhelmingly small/star-shaped
(a content cluster collides in shared LSH buckets), so 2-4 rounds is
typical. For adversarial long-chain graphs at 100 TB the large-star/
small-star variant (Kiveris et al., "Connected Components in MapReduce and
Beyond") converges in O(log n) rounds with the same per-round shape — one
groupBy shuffle — and can be swapped in without changing callers.

Each round is: edges ⋈ labels (broadcast-or-shuffle equi-join) then a
min-groupBy — no driver-side graph state; per-round results are
``localCheckpoint``-ed so the plan doesn't grow with iteration count
(standard practice for iterative DataFrame algorithms)."""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

logger = logging.getLogger(__name__)


def connected_components(
    pairs: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, cluster_id) for every node appearing in ``pairs``;
    cluster_id = min node id in the connected component."""
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
