"""Near-duplicate cluster assignment: connected components over candidate
pairs (the finisher of every large-scale dedup pipeline — LSH emits pairwise
candidates, but what a 100 TB curation job needs is one canonical doc per
*cluster*, and clusters are the connected components of the pair graph).

Algorithm: iterative hash-to-min label propagation WITH pointer jumping
(the Rastogi et al. "Finding Connected Components in Map-Reduce in
Logarithmic Rounds" acceleration): each round every node adopts the
minimum label in its closed neighborhood, then additionally adopts its
label's OWN label (labels are node ids, so one extra self-join halves the
remaining distance — chains converge in O(log diameter) rounds, not
O(diameter); a 33M-node path fits in the default max_iter=25).
Convergence is detected by a scalar aggregate (count of labels that
CHANGED this round — zero means fixpoint; works for any orderable id
type, numeric or string), NOT by collecting data to the driver. Near-dup
graphs are unions of near-cliques (every LSH bucket contributes a
clique), so rounds ≈ 2-3 in practice; `max_iter` bounds the worst case,
and exhausting it RAISES by default — partially-propagated labels would
silently split one true component into several clusters.

At 100 TB scale per round: one shuffle join (edges ⋈ labels on dst), one
groupBy(src) min, one outer join back — all keyed on doc_id, so AQE can
coalesce/skew-split freely. `localCheckpoint` truncates the growing lineage
each round (the standard iterative-DataFrame pattern; without it the plan
tree doubles every iteration and the driver dies long before the data does).

No reference analog (logzoom has no dedup surface); this extends the
training-data operator set mandated by the build brief.
"""

from __future__ import annotations

import warnings

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
    on_nonconverged: str = "raise",
    driver_max_edges: int = 200_000,
) -> DataFrame:
    """(doc_id, cluster_id) for every node; cluster_id = min doc_id reachable
    through the pair graph. Nodes with no pair form singleton clusters.

    ``eager=False`` returns the final lazy plan without the driver-side
    convergence loop materializations (single-round graphs only — tests).
    ``on_nonconverged``: "raise" (default — partial labels silently split
    one true component into several clusters) or "warn" to return them.

    Bounded-edge fast path: when the pair set holds at most
    ``driver_max_edges`` rows, components are solved by union-find on the
    driver and attached to the (still fully distributed) node table via a
    broadcast map — the same size class and rationale as a broadcast hash
    join (a 200k-edge map is a few MB framed; the node table itself never
    leaves the cluster). The probe is ``head(driver_max_edges + 1)``, so
    a big pair set stops the scan early and falls through to the
    label-propagation loop — no extra full pass, no constant tuned to
    local mode (the switch is on measured edge count, like AQE's
    broadcast demotion). Components are unique, so both paths return
    identical labels by definition; pass ``driver_max_edges=0`` to force
    the distributed loop."""
    if eager and driver_max_edges > 0:
        head = pairs.select(
            F.col(a_col).alias("src"), F.col(b_col).alias("dst")
        ).head(driver_max_edges + 1)
        if len(head) <= driver_max_edges:
            parent: dict = {}

            def find(x):
                root = x
                while parent[root] != root:
                    root = parent[root]
                while parent[x] != root:
                    parent[x], x = root, parent[x]
                return root

            for row in head:
                a, b = row["src"], row["dst"]
                if a is None or b is None:
                    continue  # NULL ids never equi-join in the loop either
                parent.setdefault(a, a)
                parent.setdefault(b, b)
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
            lab = [(x, find(x)) for x in parent]
            spark = pairs.sparkSession
            schema = pairs.select(
                F.col(a_col).alias("node"), F.col(a_col).alias("label")
            ).schema
            lab_df = spark.createDataFrame(lab, schema) if lab else None
            out = nodes.select(F.col(id_col).alias("node"))
            if lab_df is not None:
                out = out.join(F.broadcast(lab_df), "node", "left")
                lab_col = F.coalesce("label", "node")
            else:
                lab_col = F.col("node")
            return out.select(
                F.col("node").alias(id_col), lab_col.alias("cluster_id")
            )
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
    )
    labels = nodes.select(F.col(id_col).alias("node"), F.col(id_col).alias("label"))
    if eager:
        edges = edges.localCheckpoint()
        labels = labels.localCheckpoint()
    converged = not eager
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
                # carry the pre-round label so the convergence probe below
                # is a filter over the checkpointed rows, not another
                # shuffle join per round
                F.col("label").alias("_old"),
            )
        )
        # pointer jump: a label is itself a node id, so adopting the
        # label's own label halves the remaining hop distance each round —
        # this is what makes chain-shaped components converge in
        # O(log diameter) rounds instead of O(diameter)
        jump = new_labels.select(
            F.col("node").alias("_jn"), F.col("label").alias("_jl")
        )
        new_labels = (
            new_labels.join(jump, new_labels.label == jump._jn, "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("_jl", "label")).alias("label"),
                "_old",
            )
        )
        if not eager:
            labels = new_labels.drop("_old")
            break
        new_labels = new_labels.localCheckpoint()  # truncate iterative lineage
        # scalar convergence probe: count labels that moved this round — a
        # type-agnostic fixpoint test (a sum() probe would be NULL for
        # string ids and falsely converge after one hop). The pre-round
        # label rides the checkpointed rows, so this is a shuffle-free
        # filter+count over in-memory data; only one scalar reaches the
        # driver.
        n_changed = new_labels.filter(F.col("label") != F.col("_old")).count()
        labels = new_labels.drop("_old")
        if n_changed == 0:
            converged = True
            break
    if not converged:
        msg = (
            f"connected_components: max_iter={max_iter} exhausted before "
            "fixpoint — labels would split components incompletely"
        )
        if on_nonconverged == "raise":
            raise RuntimeError(msg)
        warnings.warn(msg, RuntimeWarning, stacklevel=2)
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
