"""Near-duplicate cluster assignment: connected components over candidate
pairs (the finisher of every large-scale dedup pipeline — LSH emits pairwise
candidates, but what a 100 TB curation job needs is one canonical doc per
*cluster*, and clusters are the connected components of the pair graph).

Algorithm: iterative hash-to-min label propagation, the MapReduce-classic
formulation (Rastogi et al., "Finding Connected Components in Map-Reduce in
Logarithmic Rounds"). Each round every node adopts the minimum label in its
closed neighborhood; convergence is detected by a scalar aggregate (sum of
labels — strictly decreasing until fixpoint), NOT by collecting data to the
driver. Near-dup graphs are unions of near-cliques (every LSH bucket
contributes a clique), so their diameter is tiny and rounds ≈ 2-3 in
practice; `max_iter` bounds the worst case.

At 100 TB scale per round: one shuffle join (edges ⋈ labels on dst), one
groupBy(src) min, one outer join back — all keyed on doc_id, so AQE can
coalesce/skew-split freely. `localCheckpoint` truncates the growing lineage
each round (the standard iterative-DataFrame pattern; without it the plan
tree doubles every iteration and the driver dies long before the data does).

No reference analog (logzoom has no dedup surface); this extends the
training-data operator set mandated by the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    nodes: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 25,
    eager: bool = True,
) -> DataFrame:
    """(doc_id, cluster_id) for every node; cluster_id = min doc_id reachable
    through the pair graph. Nodes with no pair form singleton clusters.

    ``eager=False`` returns the final lazy plan without the driver-side
    convergence loop materializations (single-round graphs only — tests).
    """
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
    )
    labels = nodes.select(F.col(id_col).alias("node"), F.col(id_col).alias("label"))
    if eager:
        edges = edges.localCheckpoint()
        labels = labels.localCheckpoint()
    prev_sum = None
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, labels.node == nbr_min.src, "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias("label"),
            )
        )
        if not eager:
            labels = new_labels
            break
        new_labels = new_labels.localCheckpoint()  # truncate iterative lineage
        # scalar convergence probe: sum(label) strictly decreases each round
        # until fixpoint (labels only ever move down to the component min)
        cur_sum = new_labels.agg(F.sum("label")).collect()[0][0]
        labels = new_labels
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.select(F.col("node").alias(id_col), F.col("label").alias("cluster_id"))


def dedup_cluster_assign(
    docs: DataFrame,
    pairs: DataFrame,
    max_iter: int = 25,
) -> DataFrame:
    """Canonical-doc assignment: every doc labeled with its near-dup cluster
    id (min doc_id in component) plus `is_canonical` — the row a curation
    pipeline keeps. Composes with ``dedup.lsh_candidate_pairs`` /
    ``dedup.ngram_jaccard_pairs`` as the pair source."""
    cc = connected_components(pairs, docs.select("doc_id"), max_iter=max_iter)
    return cc.select(
        "doc_id",
        "cluster_id",
        (F.col("doc_id") == F.col("cluster_id")).cast("int").alias("is_canonical"),
    )
