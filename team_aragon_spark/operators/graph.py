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

# Under this many DISTINCT edges the transitive closure runs as a
# driver-side union-find (one bounded collect, zero per-round jobs);
# above it the distributed min-label propagation runs unchanged.  A
# dedup pair graph is pairs-that-passed-verification — orders of
# magnitude smaller than the corpus — so the gate covers every
# realistic dedup readout while billion-edge graphs keep the
# distributed path.  16 MB of (long, long) rows at the cap: the same
# bounded-collect budget as train_centroids / the top-k shortlist.
_CC_DRIVER_MAX_EDGES = 1_000_000


def _cc_driver_labels(edges: DataFrame, a_col: str, b_col: str):
    """(node, component) via driver union-find, or None above the gate.

    Semantics identical to the distributed propagation: component =
    minimum node id reachable; only nodes appearing in edges appear.
    The collect is LIMIT-bounded (gate + 1 rows) so declining costs one
    truncated job, never an unbounded transfer.
    """
    rows = (
        edges.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
        .distinct()
        .limit(_CC_DRIVER_MAX_EDGES + 1)
        .collect()
    )
    if len(rows) > _CC_DRIVER_MAX_EDGES:
        return None
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in rows:
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp_min: dict = {}
    for n in parent:
        r = find(n)
        m = comp_min.get(r)
        if m is None or n < m:
            comp_min[r] = n
    id_t = edges.schema[a_col].dataType.simpleString()
    return edges.sparkSession.createDataFrame(
        [(n, comp_min[find(n)]) for n in parent],
        f"node {id_t}, component {id_t}",
    )


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

    Physical strategy (values identical either way): under the
    ``_CC_DRIVER_MAX_EDGES`` gate the closure is a driver union-find
    over one bounded collect — a dedup pair relation is tiny next to
    its corpus, and the distributed form pays ~3 scheduled jobs PER
    ROUND for it.  Above the gate the distributed min-label
    propagation below runs unchanged.
    """
    driver = _cc_driver_labels(edges, a_col, b_col)
    if driver is not None:
        return driver
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


def connected_components_star(
    edges: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iter: int = 50,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges`` —
    the exact contract of ``connected_components`` (component = the
    minimum node id reachable, isolated nodes excluded), computed by
    the alternating LARGE-STAR / SMALL-STAR contraction of Kiveris et
    al., "Connected Components in MapReduce and Beyond" (SoCC 2014,
    §3 "two-hashing" alternating algorithm) instead of min-label
    propagation.

    Why a second implementation: min-label propagation needs
    O(component diameter) rounds — fine on shallow dup clusters, but a
    100 TB pair graph can hide long chains (boilerplate variants each
    overlapping only the next).  Large-star/small-star re-wires every
    node to the minimum of a closed neighborhood each round, so chains
    collapse geometrically: O(log n) rounds regardless of diameter.
    Skew posture: a high-degree hub never fans its neighborhood out —
    each step is a groupBy-min on one endpoint followed by a re-emit
    that is linear in the edge list, so hot keys cost one combine-able
    aggregate, not a quadratic join expansion.

    State is the canonically-directed edge list (hi > lo), rewritten
    by both steps; each round materializes via ``localCheckpoint`` (the
    rewrite is total, so lineage would otherwise stack per round) and
    convergence is detected with an order-free set fingerprint
    (count + bit_xor of per-edge xxhash64 — edges are distinct, so the
    xor is a faithful set digest) instead of an edge-set diff join.
    The converged state is a forest of stars rooted at each
    component's minimum — a fixed point of both steps — from which the
    labels read out without further shuffles.
    """
    e = (
        edges.select(
            F.greatest(F.col(a_col), F.col(b_col)).alias("hi"),
            F.least(F.col(a_col), F.col(b_col)).alias("lo"),
        )
        .filter(F.col("hi") != F.col("lo"))
        .distinct()
        .localCheckpoint()
    )

    def _fingerprint(df: DataFrame):
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(hi, lo))").alias("x"),
        ).first()
        return (row["n"], row["x"])

    fp = _fingerprint(e)
    for _ in range(max_iter):
        # large-star: every strictly-larger neighbor of u re-attaches
        # to min(N(u) ∪ {u}).  Emitted edges keep hi > lo by
        # construction (m <= u < v).
        sym = e.select(F.col("hi").alias("u"), F.col("lo").alias("v")).union(
            e.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
        )
        mins = sym.groupBy("u").agg(F.min("v").alias("mv"))
        mins = mins.select("u", F.least(F.col("mv"), F.col("u")).alias("m"))
        large = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
            .distinct()
        )
        # small-star: every smaller neighbor of hi (and hi itself)
        # re-attaches to hi's minimum smaller neighbor.
        smins = large.groupBy("hi").agg(F.min("lo").alias("m"))
        small = (
            large.join(smins, "hi")
            .select(F.col("lo").alias("n"), F.col("m"))
            .union(smins.select(F.col("hi").alias("n"), F.col("m")))
            .filter(F.col("n") != F.col("m"))
            .select(F.col("n").alias("hi"), F.col("m").alias("lo"))
            .distinct()
            .localCheckpoint()
        )
        new_fp = _fingerprint(small)
        prev = e
        e = small
        prev.unpersist()
        if new_fp == fp:
            break
        fp = new_fp
    labels = e.select(
        F.col("hi").alias("node"), F.col("lo").alias("component")
    ).union(
        e.select(F.col("lo").alias("node"), F.col("lo").alias("component")).distinct()
    )
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


def triangle_enumerate(
    edges: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
) -> DataFrame:
    """Enumerate every triangle in the undirected graph as a canonical
    sorted triple ``(n1 < n2 < n3)`` — the degree-oriented
    node-iterator algorithm (Schank & Wagner 2005; the MapReduce
    formulation in Suri & Vassilvitskii, WWW 2011).

    Each undirected edge is ORIENTED from its lower-(degree, id)
    endpoint to the higher one before the wedge join, so every wedge
    is generated exactly once AND the wedge fan-out of a degree-d hub
    is bounded by its higher-ranked neighbors only — on a skewed graph
    (social, trade) that caps per-key join expansion at O(sqrt(|E|))
    instead of O(d_max^2), the classic hub-explosion fix.  Two
    self-equi-joins on the oriented edge relation, no cartesian.

    The result set is orientation-independent (orientation only picks
    WHERE each triangle is counted), so an id-ordered SQL 3-way join
    reproduces it value-for-value — q155's oracle.
    """
    und = (
        edges.select(
            F.least(F.col(a_col), F.col(b_col)).alias("u"),
            F.greatest(F.col(a_col), F.col(b_col)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    # orient low (degree, id) -> high (degree, id); total order, so
    # every edge gets exactly one direction
    lo_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    ori = (
        und.join(F.broadcast(du), "u")
        .join(F.broadcast(dv), "v")
        .select(
            F.when(lo_first, F.col("u")).otherwise(F.col("v")).alias("s"),
            F.when(lo_first, F.col("v")).otherwise(F.col("u")).alias("t"),
        )
    )
    e1 = ori.select(F.col("s").alias("x"), F.col("t").alias("y"))
    e2 = ori.select(F.col("s").alias("y"), F.col("t").alias("z"))
    e3 = ori.select(F.col("s").alias("x"), F.col("t").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])
    # middle node via sort, not x+y+z-least-greatest: the three-way
    # bigint sum can overflow for ids near 2^62 (63-bit hashed ids)
    srt = F.array_sort(F.array("x", "y", "z"))
    return tri.select(
        F.element_at(srt, 1).alias("n1"),
        F.element_at(srt, 2).alias("n2"),
        F.element_at(srt, 3).alias("n3"),
    )


# Under this many DISTINCT edges the k-core peel runs on the driver as
# a vectorized numpy loop over one bounded Arrow transfer (two int64
# columns — 64 MB at the cap, no per-row Row objects); above it the
# distributed incremental-degree peel runs unchanged.  The budget is
# larger than _CC_DRIVER_MAX_EDGES because the transfer is columnar
# (DataFrame.toArrow), not a py4j Row collect.
_KCORE_DRIVER_MAX_EDGES = 4_000_000


def kcore_peel_rounds(pairs: DataFrame, k: int, max_rounds: int):
    """Synchronous k-core peel over an (a, b) distinct-edge relation on
    the driver: ``(removed_rounds, core_nodes)`` — per-round removal
    counts and the surviving node ids — or None above the gate.

    Semantics are EXACTLY the distributed incremental-degree loop
    (q186): round r removes every alive node whose degree within the
    surviving subgraph is < k; neighbors are decremented
    synchronously; early exit when a round removes nothing.  Pinned
    equal to the distributed branch in tests/test_round11_opt.py.

    The collect is LIMIT-bounded (gate + 1 rows) so declining costs
    one truncated columnar job, never an unbounded transfer — the
    _cc_driver_labels discipline, Arrow-shaped.
    """
    import numpy as np

    # Columns selected BY NAME (the documented (a, b) contract) so the
    # Arrow transfer never depends on the caller's column order.  Note
    # for callers: declining costs one truncated pairs job whose work
    # is discarded — the distributed branch recomputes the pair build
    # (persist() there happens after this gate), mirroring the
    # _cc_driver_labels decline note.
    tbl = pairs.select("a", "b").limit(_KCORE_DRIVER_MAX_EDGES + 1).toArrow()
    if tbl.num_rows > _KCORE_DRIVER_MAX_EDGES:
        return None
    a = tbl.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
    b = tbl.column(1).to_numpy(zero_copy_only=False).astype(np.int64)
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ea, eb = inv[: len(a)], inv[len(a) :]
    n = len(nodes)
    deg = np.bincount(ea, minlength=n) + np.bincount(eb, minlength=n)
    alive = np.ones(n, dtype=bool)
    edge_alive = np.ones(len(ea), dtype=bool)
    removed_rounds: list[tuple[int, int]] = []
    for rnd in range(1, max_rounds + 1):
        rem = alive & (deg < k)
        n_rem = int(rem.sum())
        if n_rem == 0:
            break
        removed_rounds.append((rnd, n_rem))
        # an edge dies with its first removed endpoint; its OTHER
        # endpoint is decremented iff it survives this round — the
        # synchronous-peel recomputation, vectorized
        e_rm = edge_alive & (rem[ea] | rem[eb])
        dec = np.concatenate([eb[e_rm & rem[ea]], ea[e_rm & rem[eb]]])
        if dec.size:
            deg = deg - np.bincount(dec, minlength=n)
        alive &= ~rem
        edge_alive &= ~e_rm
    return removed_rounds, nodes[alive]
