"""Connected components over a pair graph — near-dup clusters.

Pair-mining operators (q_k2 Jaccard, q_k3 MinHash, q_k21 embedding
cosine) emit EDGES; an actual dedup pipeline needs CLUSTERS: the
transitive closure of "is a near-dup of", with one canonical document
kept per cluster. This operator labels every node with the minimum id
reachable from it (min-label propagation), the standard MapReduce
formulation (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14 — our loop is their hash-to-min variant).

Scale notes (100 TB): each iteration is one equi-join edges⋈labels on
node id plus a min-aggregate — uniform 8-byte shuffle keys, no string
payloads, partial aggregation map-side. Round count is bounded by the
label-propagation diameter of the largest component; near-dup graphs
are overwhelmingly tiny cliques plus short chains, so 2–4 rounds in
practice (``max_iter`` guards pathological chains). Lineage is cut per
round with ``localCheckpoint`` so the plan does not grow O(iterations)
deep, and convergence is detected with a single scalar aggregate
(labels only ever decrease, so sum(label) is a strictly decreasing
monotone — unchanged sum ⟺ fixed point) rather than a diff join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 50
) -> DataFrame:
    """(id, cluster_id) for every node in ``edges``; cluster_id is the
    min node id in the component. Node ids must be non-null integers."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    sym = sym.localCheckpoint(eager=True)  # reused every round — scan once
    labels = (
        sym.select(F.col("a").alias("id")).distinct().withColumn("lab", F.col("id"))
    ).localCheckpoint(eager=True)
    prev_sum = labels.agg(F.sum("lab")).first()[0]
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["a"] == labels["id"])
            .groupBy(F.col("b").alias("id"))
            .agg(F.min("lab").alias("nlab"))
        )
        labels = (
            labels.join(nbr_min, "id", "left")
            .select("id", F.least("lab", F.coalesce("nlab", "lab")).alias("lab"))
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(F.sum("lab")).first()[0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.select("id", F.col("lab").alias("cluster_id"))


def neardup_clusters(
    pairs: DataFrame, left: str = "d1", right: str = "d2", max_iter: int = 50
) -> DataFrame:
    """(doc_id, cluster_id, csize) from a near-dup pair list; the
    canonical keeper per cluster is ``cluster_id`` itself (min doc_id)."""
    cc = connected_components(pairs, src=left, dst=right, max_iter=max_iter)
    sizes = cc.groupBy("cluster_id").agg(F.count("*").alias("csize"))
    return (
        cc.join(sizes, "cluster_id")
        .select(F.col("id").alias("doc_id"), "cluster_id", "csize")
    )
