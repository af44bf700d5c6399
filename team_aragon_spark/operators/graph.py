"""Connected components — near-dup pairs → dedup clusters.

LSH near-dup operators (text_dedup / similarity) emit PAIRS; an actual
corpus dedup needs CLUSTERS (transitive closure of the pair relation)
and one canonical survivor per cluster.  This is the missing last step
of every large-scale dedup pipeline.

Algorithm: iterative min-label propagation, pure DataFrame ops.  Every
node starts labeled with itself; each round, every node adopts the
minimum label among itself and its neighbors; converged when no label
changes.  Rounds = O(component diameter) — near-dup components are
shallow (dup clusters, not social graphs), so a handful of rounds
suffices; ``max_iter`` bounds the pathological chain.

Scale posture: each round is one shuffle (edges ⋈ labels, groupBy
node).  Labels are persisted per round and the previous round's cache
is released; ``localCheckpoint`` every few rounds truncates the plan
lineage so the job graph doesn't grow quadratically.  This is the
DataFrame-native version of the map-reduce CC algorithms (cf.
Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC 2014); no RDDs, no GraphX dependency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iter: int = 25,
    checkpoint_every: int = 5,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    ``component`` is the minimum node id reachable from it.

    Undirected: each input pair is used in both directions.  Isolated
    nodes (no edges) are the caller's concern — they are their own
    canonical by definition and never appear here.
    """
    sym = edges.select(
        F.col(a_col).alias("src"), F.col(b_col).alias("dst")
    ).union(edges.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
    sym = sym.distinct().persist()

    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .persist()
    )
    labels.count()  # materialize

    for it in range(max_iter):
        # each node's best neighbor label this round
        neighbor_min = (
            sym.join(labels, sym.dst == labels.node)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("component"),
            )
            .persist()
        )
        if it % checkpoint_every == checkpoint_every - 1:
            new_labels = new_labels.localCheckpoint()
        changed = (
            labels.alias("o")
            .join(new_labels.alias("n"), "node")
            .filter(F.col("o.component") != F.col("n.component"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    return labels


def canonical_per_cluster(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "a",
    b_col: str = "b",
) -> DataFrame:
    """Corpus dedup: keep one canonical row (min id) per near-dup
    cluster, plus every row not in any cluster.

    Composes ``connected_components`` over the pair relation with an
    anti-join for the untouched rows — the end-to-end "dedup the
    corpus" operator whose input is any pairs producer (exact Jaccard,
    MinHash-LSH, SimHash, SRP-LSH).
    """
    comp = connected_components(pairs, a_col, b_col)
    keep_clustered = comp.filter(F.col("node") == F.col("component")).select(
        F.col("node").alias(id_col)
    )
    in_any_cluster = comp.select(F.col("node").alias(id_col))
    untouched = df.select(id_col).join(in_any_cluster, on=id_col, how="left_anti")
    keep = keep_clustered.union(untouched)
    return df.join(keep, on=id_col, how="left_semi")
