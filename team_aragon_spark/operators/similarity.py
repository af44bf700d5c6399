"""Embedding similarity search (north-star extension).

Two tiers:

- ``cosine_topk_bruteforce`` — exact top-k: query-set × corpus join
  with a JVM-side dot product (``zip_with`` + ``aggregate``, all in
  double precision, summed left-to-right so results are bit-stable and
  oracle-comparable).  The query side is broadcast; the corpus is never
  shuffled — the plan is scan → broadcast-nested-loop → per-query top-k.
  At 100 TB corpus scale this is still the right *baseline*: it reads
  the corpus once per query batch, embarrassingly parallel.

- ``ivf_topk`` — the scale path: k-means-lite coarse quantizer (IVF).
  Centroids are trained on a sample (driver-side, tiny), broadcast;
  each corpus vector is assigned to its nearest centroid once
  (narrow); queries probe only ``nprobe`` nearest cells, so the
  candidate set shrinks by ~ncells/nprobe.  Approximate — recall
  depends on nprobe; verified against brute force in tests.

- ``srp_*`` — signed-random-projection (cosine) LSH: Charikar (STOC
  2002) hyperplane rounding; bit-agreement probability 1 - θ/π.  IVF
  coarse quantization follows the inverted-file design popularized by
  Sivic/Zisserman "Video Google" (ICCV 2003) and Jégou et al. (PAMI
  2011).
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from team_aragon_spark.session import ensure_parallelism

# Dot product over two float arrays, accumulated in DOUBLE left-to-right
# (bit-stable, matches an ANSI oracle computing the same order).
_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
    "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
)


def _norm_expr(col: str) -> str:
    return f"sqrt({_DOT.format(a=col, b=col)})"


def cosine_expr(a: str, b: str) -> str:
    # try_divide: a zero-norm vector yields NULL cosine (row drops out
    # of any >= threshold filter) instead of an ANSI 0/0 error.
    return f"try_divide({_DOT.format(a=a, b=b)}, ({_norm_expr(a)} * {_norm_expr(b)}))"


# Above this corpus size the audit-pin shortlist keeps the fully
# distributed brute plan: the shortlist stage materializes the corpus
# matrix on the driver (n x dim doubles, ~100 MB at the cap), which is
# gate-bounded the same way train_centroids' sample collect is.  At
# corpus scale the production kNN is the IVF family (q264/q270); the
# brute operator's job is oracle parity, so only its gate-scale cost
# matters.
_SHORTLIST_MAX_CORPUS = 200_000

# Below this many candidate folds the distributed brute fold is already
# cheaper than the collect + createDataFrame overhead of the shortlist
# (measured: ~4 folds/us JVM-side at dim 64).
_SHORTLIST_MIN_FOLDS = 1_000_000


def _topk_shortlist(c: DataFrame, q: DataFrame, k: int, round_digits: int):
    """Candidate (query_id, neighbor_id) pairs that provably contain
    every exact top-k winner, or None when the distributed brute plan
    must be kept.

    A float64 BLAS matmul computes approximate cosines; every neighbor
    within ``margin`` of the query's k-th best is kept, where margin =
    2.5 * 10^-round_digits + 1e-9 exceeds (a) the rounding granularity
    under which the final ranking compares values (winners are decided
    on round(cos, d), so a winner can trail the k-th raw value by at
    most one grid step) and (b) the worst-case fp divergence between a
    blocked matmul and the JVM's left-to-right fold (~1e-12 at dim 64).
    The survivors are re-scored with the *identical* JVM expression and
    re-ranked by the identical window, so the output rows are
    bit-for-bit the brute-force result — this is the Bloom-filter
    pattern of guide §3.2: an upper-bound proxy prunes, the exact
    predicate decides.

    Falls back (returns None) on: corpus over the gate, empty sides, or
    any zero-norm / non-finite vector (those rows carry NULL cosines
    through try_divide in the exact plan; the shortlist does not model
    NULL ordering, so it declines rather than risk divergence).
    """
    import numpy as np

    # BOTH sides are LIMIT-bounded collects (r11 VERDICT item 1, the
    # _cc_driver_labels / kcore_peel discipline): an oversized side
    # declines to the distributed plan after a truncated transfer of
    # gate + 1 rows, never an unbounded landing on the driver.  The
    # bound doubles as the gate probe, so the under-gate (intended)
    # case pays ONE job per side — the separate c.count() probe job
    # is gone (it was metadata-cheap on parquet but a full pass on a
    # derived corpus relation).
    qrows = q.limit(_SHORTLIST_MAX_CORPUS + 1).collect()
    if not qrows or len(qrows) > _SHORTLIST_MAX_CORPUS:
        return None
    crows = c.limit(_SHORTLIST_MAX_CORPUS + 1).collect()
    if (
        not crows
        or len(crows) > _SHORTLIST_MAX_CORPUS
        or len(qrows) * len(crows) < _SHORTLIST_MIN_FOLDS
    ):
        return None
    cids = [r[0] for r in crows]
    qids = [r[0] for r in qrows]
    C = np.array([r[1] for r in crows], dtype=np.float64)
    Q = np.array([r[1] for r in qrows], dtype=np.float64)
    if not (np.isfinite(C).all() and np.isfinite(Q).all()):
        return None
    cn = np.linalg.norm(C, axis=1)
    qn = np.linalg.norm(Q, axis=1)
    if (cn == 0.0).any() or (qn == 0.0).any():
        return None
    Cn = (C / cn[:, None]).T  # (dim, n) — transposed once for the matmul
    Qn = Q / qn[:, None]
    margin = 2.5 * 10.0 ** (-round_digits) + 1e-9
    cindex = {v: i for i, v in enumerate(cids)}
    n = len(cids)
    out_q: list = []
    out_n: list = []
    block = max(1, 8_000_000 // n)  # ~64 MB of scores per block
    for s in range(0, len(qids), block):
        S = Qn[s : s + block] @ Cn  # (b, n) approximate cosines
        for bi in range(S.shape[0]):
            row = S[bi]
            self_idx = cindex.get(qids[s + bi])
            if self_idx is not None:
                row = row.copy()
                row[self_idx] = -np.inf
            m = n - (1 if self_idx is not None else 0)
            if m <= k:
                idx = np.nonzero(row > -np.inf)[0]
            else:
                thr = np.partition(row, n - k)[n - k] - margin
                idx = np.nonzero(row >= thr)[0]
            out_q.extend([qids[s + bi]] * len(idx))
            out_n.extend(cids[i] for i in idx)
    spark = c.sparkSession
    id_t = c.schema["neighbor_id"].dataType.simpleString()
    return spark.createDataFrame(
        list(zip(out_q, out_n)), f"query_id {id_t}, neighbor_id {id_t}"
    )


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: (query_id, neighbor_id, cosine) with rank <= k per query;
    self-matches excluded.  Similarity is rounded before ranking and
    ties broken by neighbor id, so the result set is fully
    deterministic (and oracle-hashable).

    Physical strategy (values identical either way): under the
    ``_SHORTLIST_MAX_CORPUS`` gate a driver-side BLAS shortlist
    (:func:`_topk_shortlist`) prunes the n*m candidate space to
    ~k-per-query pairs with a provably winner-preserving margin, and
    only those pairs pay the exact JVM fold — the guide-§3.2 "prune
    with a proxy, decide with the exact predicate" shape.  Above the
    gate (true corpus scale) the fully distributed broadcast-nested-
    loop brute plan runs unchanged.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c_raw = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    short = _topk_shortlist(c_raw, q, k, round_digits)
    if short is not None:
        pairs = (
            short.join(F.broadcast(c_raw), "neighbor_id")
            .join(F.broadcast(q), "query_id")
            .filter(F.col("neighbor_id") != F.col("query_id"))
        )
    else:
        c = ensure_parallelism(c_raw)
        pairs = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
    scored = pairs.withColumn(
        "cosine", F.round(F.expr(cosine_expr("__qv", "__cv")), round_digits)
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


def train_centroids(corpus: DataFrame, n_cells: int, vec_col: str = "embedding", sample: int = 2048, iters: int = 5):
    """Driver-side SPHERICAL k-means on a bounded sample → unit centroids.

    The downstream metric is cosine, so clustering happens on the unit
    sphere: sample vectors are L2-normalized, assignment is argmax dot
    product, and each centroid is re-normalized after the mean step —
    plain Euclidean k-means on raw vectors mis-bins long/short vectors
    that point the same way, which costs IVF recall.

    The sample is capped (default 2048 vectors) so driver memory is
    constant regardless of corpus size; at 100 TB you train on an
    equivalent sample, never the full data.

    Sampling is by xxhash64 order, not ``limit()``: a bare limit takes
    whole partitions in order, a badly biased sample on sorted or
    clustered inputs.  Ordering by the vector's hash gives a
    deterministic pseudo-random draw, and ``orderBy().limit(k)`` plans
    as TakeOrderedAndProject — a per-partition k-heap, not a full sort.
    """
    import numpy as np

    rows = corpus.select(vec_col).orderBy(F.xxhash64(vec_col)).limit(sample).collect()
    if not rows:
        return []
    x = np.array([r[0] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    x = x / np.where(norms == 0.0, 1.0, norms)
    rng = np.random.RandomState(42)
    cent = x[rng.choice(len(x), size=min(n_cells, len(x)), replace=False)].copy()
    for _ in range(iters):
        assign = (x @ cent.T).argmax(1)
        for j in range(len(cent)):
            pts = x[assign == j]
            if len(pts):
                m = pts.mean(0)
                n = np.linalg.norm(m)
                if n > 0:
                    cent[j] = m / n
    return [c.tolist() for c in cent]


def assign_cells(df: DataFrame, centroids: list[list[float]], vec_col: str = "embedding", out_col: str = "cell") -> DataFrame:
    """Nearest-centroid (max-cosine) assignment as a pure expression.

    Centroids are unit vectors, so per row the argmax DOT PRODUCT is
    the argmax cosine (the row's own norm is a constant factor).
    Centroids ship inside the plan as an array literal (they are tiny);
    the argmax is a JVM-side loop over ``n_cells`` dot products — no
    shuffle, no UDF.
    """
    cent_lit = (
        "array(" + ", ".join("array(" + ", ".join(repr(v) for v in c) + ")" for c in centroids) + ")"
    )
    dot = (
        f"transform({cent_lit}, c -> aggregate(zip_with(c, {vec_col}, "
        "(x, y) -> x * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (a, v) -> a + v))"
    )
    return df.withColumn("__d", F.expr(dot)).withColumn(
        out_col, F.expr("array_position(__d, array_max(__d)) - 1").cast("int")
    ).drop("__d")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via inverted-file (IVF) coarse quantization.

    Corpus rows join only against queries probing their cell — an
    equi-join on ``cell`` replaces the all-pairs cross join, cutting
    candidate volume by ~``n_cells / nprobe``.
    """
    centroids = train_centroids(corpus, n_cells, vec_col)
    if not centroids:  # empty corpus: empty result, correct schema
        return corpus.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double"
        )
    c = assign_cells(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")), centroids, "__cv"
    )
    q = assign_cells(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")), centroids, "__qv", out_col="__qcell"
    )
    # expand each query to its nprobe nearest cells
    cent_lit = (
        "array(" + ", ".join("array(" + ", ".join(repr(v) for v in c0) + ")" for c0 in centroids) + ")"
    )
    # nprobe cells with the LARGEST dot product (centroids are unit, so
    # argmax dot = argmax cosine); negate for ascending array_sort.
    dots = (
        f"transform({cent_lit}, c -> aggregate(zip_with(c, __qv, "
        "(x, y) -> x * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (a, v) -> a + v))"
    )
    q = (
        q.withColumn("__dots", F.expr(dots))
        .withColumn(
            "cell",
            F.explode(
                F.expr(
                    f"slice(array_sort(transform(__dots, (d, i) -> struct(-d AS d, i))).i, 1, {nprobe})"
                )
            ),
        )
        .select("query_id", "__qv", "cell")
    )
    pairs = c.join(F.broadcast(q), on="cell").filter(F.col("neighbor_id") != F.col("query_id"))
    scored = pairs.withColumn("cosine", F.round(F.expr(cosine_expr("__qv", "__cv")), 4))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


def ivf_blocked_neardup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """Embedding near-dup pairs blocked by IVF cell — the scale path
    q37's all-pairs baseline documents (pairs only form WITHIN a cell).

    Spherical-k-means cell assignment (one projection), then a
    self-equi-join on ``cell``: candidate volume drops from O(n²) to
    sum of per-cell squares (~n²/n_cells for balanced cells), and the
    shuffle key is the cell id, not vector pairs.  Near-dup vectors
    (cosine ≥ ~0.9) sit closer to each other than to any centroid
    boundary in practice; recall on planted near-dups is pinned in
    tests/test_operators.py.  Approximate by design (a pair straddling
    a cell boundary is missed — raise n_cells for precision vs recall).
    """
    centroids = train_centroids(corpus, n_cells, vec_col)
    if not centroids:
        return corpus.sparkSession.createDataFrame([], "a long, b long, cosine double")
    cells = assign_cells(
        ensure_parallelism(corpus.select(F.col(id_col), F.col(vec_col))), centroids, vec_col
    ).persist()
    # Persisted (MEMORY_AND_DISK default): the cell self-join otherwise
    # recomputes n_cells dot products per vector on both branches.
    # Unlike the signature tables this one is corpus-sized (it carries
    # the vectors), so at extreme scale prefer writing the assignment
    # to storage once; for a resident engine the spillable cache is the
    # right default.
    left = cells.select(F.col(id_col).alias("a"), F.col(vec_col).alias("__ea"), "cell")
    right = cells.select(F.col(id_col).alias("b"), F.col(vec_col).alias("__eb"), "cell")
    return (
        left.join(right, on="cell")
        .filter(F.col("a") < F.col("b"))
        .withColumn("cosine", F.round(F.expr(cosine_expr("__ea", "__eb")), round_digits))
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )


def _hyperplanes(n_tables: int, n_bits: int, dim: int, seed: int = 42):
    """Deterministic Gaussian hyperplanes, one set of n_bits per table."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return rng.randn(n_tables, n_bits, dim)


def srp_signatures(
    df: DataFrame,
    n_tables: int = 16,
    n_bits: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Signed-random-projection (cosine) LSH signatures.

    Adds ``(table, sig)`` rows per input row: for each of ``n_tables``
    hash tables, the sign bits of ``n_bits`` Gaussian projections packed
    into one integer bucket key.  Vectors with cosine angle θ agree on
    one bit w.p. 1 - θ/π, so near-parallel vectors collide in some
    table with high probability while random pairs almost never do.

    The projection is a vectorized Pandas UDF — one (batch × dim) @
    (dim × n_tables·n_bits) matrix multiply per Arrow batch.  This is
    the deliberate exception to "stay JVM-side": the equivalent SQL
    expression (nested higher-order lambdas over a hyperplane literal)
    is interpreted per row and measured ~50x slower at sf0.1; a BLAS
    matmul over Arrow batches is the right physical operator for dense
    projections.  The hyperplanes ship in the task closure (a few KB);
    no shuffle, linear scan.
    """
    import numpy as np

    planes = _hyperplanes(n_tables, n_bits, dim, seed).reshape(n_tables * n_bits, dim)
    weights = (np.int64(1) << np.arange(n_bits, dtype=np.int64))

    @F.pandas_udf("array<long>")
    def _sigs(v: pd.Series) -> pd.Series:
        if not len(v):
            return pd.Series([], dtype=object)
        x = np.stack(v.to_numpy())  # (batch, dim)
        bits = (x @ planes.T > 0.0).reshape(len(x), n_tables, n_bits)
        sigs = (bits * weights).sum(axis=2)  # (batch, n_tables)
        return pd.Series(list(sigs))

    df = ensure_parallelism(df)
    return df.withColumn("__sigs", _sigs(F.col(vec_col))).select(
        "*", F.posexplode("__sigs").alias("table", "sig")
    ).drop("__sigs")


def srp_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    n_tables: int = 16,
    n_bits: int | None = None,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
    target_bucket: int = 16,
) -> DataFrame:
    """Embedding near-dup pairs via SRP-LSH blocking + exact verify.

    The 100 TB path for q37's all-pairs cosine: candidates only form
    inside shared (table, sig) buckets — shuffle on bucket keys, never
    O(n²) — then exact cosine filters false positives, so precision is
    1.0 and recall ≈ 1 - (1 - p^n_bits)^n_tables for bit-agreement
    probability p = 1 - θ/π (≈ 0.996 at cosine 0.9 with 16×8).
    Output matches q37: (a, b, cosine), a < b, cosine >= threshold.

    ``n_bits=None`` (the default) ADAPTS bucket count to corpus size:
    ``n_bits = clamp(ceil(log2(n / target_bucket)), 8, 20)``, keeping
    expected bucket occupancy ~``target_bucket`` rows.  This is the
    load-bearing scale knob: with FIXED n_bits the per-bucket count
    grows linearly in n and the candidate joins grows n² — the r5
    100x posture run (200k vectors, 256 buckets/table → ~780/bucket →
    ~1.2e9 candidate pairs) OOMed the JVM exactly this way.  Adaptive
    sizing costs one ``count()`` (metadata-fast on parquet sources)
    and leaves behavior at gate scale unchanged (n=2000 → floor 8
    bits).  Raising n_bits trades tail recall at LOW thresholds; for
    near-dup thresholds (>= 0.9, p >= 0.9) recall stays >= 0.98 up to
    14 bits.

    Cache contract: persists the signature table for the bucket
    self-join; lifetime caller-managed (clear after materializing),
    same as text_dedup.lsh_candidate_pairs.
    """
    vecs = df.select(F.col(id_col), F.col(vec_col))
    if n_bits is None:
        import math

        n = vecs.count()
        n_bits = max(8, min(20, math.ceil(math.log2(max(n, 1) / target_bucket))))
    sigs = srp_signatures(vecs, n_tables, n_bits, dim, vec_col).select(
        F.col(id_col), "table", "sig"
    ).persist()
    # Persisted: the bucket self-join otherwise runs the Arrow-batched
    # projection UDF on both branches (measured — no exchange reuse
    # forms across the rename).  n_tables rows/vec of (id, table, sig)
    # longs, much smaller than the embedding column it derives from.
    left = sigs.select(F.col(id_col).alias("a"), "table", "sig")
    right = sigs.select(F.col(id_col).alias("b"), "table", "sig")
    # Dedupe candidate ids BEFORE touching embeddings: the distinct
    # shuffles bare (a, b) longs, then the (much smaller) unique pair
    # set joins the vectors back — never ship dim-sized arrays per
    # duplicate bucket hit.
    cands = (
        left.join(right, on=["table", "sig"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    emb_a = vecs.select(F.col(id_col).alias("a"), F.col(vec_col).alias("__ea"))
    emb_b = vecs.select(F.col(id_col).alias("b"), F.col(vec_col).alias("__eb"))

    # Vectorized verify: one numpy batch per Arrow chunk.  The expr-based
    # cosine_expr is kept for oracle-compared queries (its left-to-right
    # double accumulation matches ANSI SQL bit-for-bit); this operator
    # has no SQL oracle, so the ~10x-faster BLAS path wins.
    import numpy as np

    @F.pandas_udf("double")
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        if not len(a):
            return pd.Series([], dtype="float64")
        x = np.stack(a.to_numpy()).astype(np.float64)
        y = np.stack(b.to_numpy()).astype(np.float64)
        num = (x * y).sum(axis=1)
        den = np.sqrt((x * x).sum(axis=1)) * np.sqrt((y * y).sum(axis=1))
        return pd.Series(num / den)

    # The vector table is dimension-sized relative to the candidate
    # pairs — broadcast it so neither verify join shuffles the pair
    # set.  (At corpus scales beyond broadcast range, drop the hint
    # and AQE picks shuffle-hash on the pair ids.)
    return (
        cands.join(F.broadcast(emb_a), on="a")
        .join(F.broadcast(emb_b), on="b")
        .withColumn("cosine", F.round(_cos("__ea", "__eb"), round_digits))
        .filter(F.col("cosine") >= F.lit(threshold))
        .select("a", "b", "cosine")
    )


def int8_quant_stats(emb: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Per-vector int8 scalar quantization with reconstruction stats.

    The storage-side half of a 100 TB vector corpus: symmetric int8
    quantization (scale = max|x| / 127) shrinks a float32 embedding
    column 4x before it ever hits the shuffle or the object store,
    and this operator reports exactly what that costs — per-vector
    max absolute reconstruction error and the cosine between the
    original and the dequantized vector.

    Everything is JVM-side array expressions (transform / zip_with /
    aggregate in DOUBLE, summed left-to-right) — no Python boundary,
    bit-stable, oracle-comparable.  Narrow per-row work: no shuffle,
    scales linearly with the corpus.
    """
    dq = "transform(__dv, x -> round(x / __scale) * __scale)"
    return (
        emb.withColumn("__dv", F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))"))
        .withColumn("__scale", F.expr("array_max(transform(__dv, x -> abs(x))) / 127.0"))
        .withColumn("__dq", F.expr(dq))
        .select(
            F.col(id_col),
            F.round(F.col("__scale"), 9).alias("scale"),
            F.round(
                F.expr("array_max(zip_with(__dv, __dq, (a, b) -> abs(a - b)))"), 9
            ).alias("max_abs_err"),
            F.round(F.expr(cosine_expr("__dv", "__dq")), 6).alias("cos_dequant"),
        )
    )


def label_centroid_cosines(
    emb: DataFrame, vec_col: str = "embedding", label_col: str = "label"
) -> DataFrame:
    """Pairwise cosine similarity between per-label centroids.

    The distributed building block of k-means / cluster diagnostics:
    centroids come from ONE partial-aggregated shuffle over
    (label, position) — posexplode is narrow, the avg combines
    map-side, and the reduce state is |labels| x dim cells, tiny no
    matter the corpus size.  The pairwise stage then runs on the
    |labels| x dim table (label a < label b equi-joined on position),
    never touching corpus rows again — at 100 TB the corpus is read
    once, and everything downstream is KB-sized.

    Centroid components are rounded to 6 digits BEFORE the cosine so
    cross-engine accumulation-order ulps in the avg cannot leak into
    the pairwise stage.
    """
    comp = (
        emb.select(label_col, F.posexplode(vec_col).alias("i", "__x"))
        .groupBy(label_col, "i")
        .agg(F.round(F.avg(F.col("__x").cast("double")), 6).alias("c"))
    ).persist()
    # The persist is what makes the "read once" contract true: without
    # it the self-join below re-derives posexplode + avg on BOTH
    # branches (the a/b projections defeat exchange reuse at plan
    # time), doubling the most expensive stage.  The cached table is
    # |labels| x dim rows — KB-sized at any corpus scale — and is
    # caller-managed like the other tiny broadcast-side caches
    # (see operators/corpus.py).
    a = comp.select(
        F.col(label_col).alias("label_a"), F.col("i"), F.col("c").alias("ca")
    )
    b = comp.select(
        F.col(label_col).alias("label_b"), F.col("i"), F.col("c").alias("cb")
    )
    return (
        a.join(b, on="i")
        .filter(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(
            F.sum(F.col("ca") * F.col("cb")).alias("__dot"),
            F.sum(F.col("ca") * F.col("ca")).alias("__na"),
            F.sum(F.col("cb") * F.col("cb")).alias("__nb"),
        )
        .select(
            "label_a",
            "label_b",
            F.round(
                F.try_divide(F.col("__dot"), F.sqrt("__na") * F.sqrt("__nb")), 6
            ).alias("centroid_cos"),
        )
    )


def pq_train(
    corpus: DataFrame,
    m: int = 8,
    ks: int = 16,
    vec_col: str = "embedding",
    sample: int = 2048,
    iters: int = 8,
) -> list[list[list[float]]]:
    """Train product-quantization codebooks (Jégou, Douze, Schmid 2011,
    "Product Quantization for Nearest Neighbor Search"): split the
    vector into ``m`` contiguous subspaces and run EUCLIDEAN k-means
    with ``ks`` centroids independently in each — raw (not normalized)
    space, because PQ reconstructs the vector, unlike the IVF coarse
    quantizer above which only routes by direction.

    Same driver-bounded training discipline as :func:`train_centroids`:
    a deterministic xxhash64-order sample capped at ``sample`` rows is
    the package's only data brought to the driver, so training cost is
    constant at any corpus size; seeded init + fixed iteration count
    make codebooks reproducible run-to-run.  Empty clusters are
    re-seeded from the farthest points (standard k-means repair) so
    all ``ks`` codes stay live.

    Returns ``codebooks[m][ks][dim/m]``.
    """
    import numpy as np

    rows = corpus.select(vec_col).orderBy(F.xxhash64(vec_col)).limit(sample).collect()
    if not rows:
        return []
    x = np.array([r[0] for r in rows], dtype=np.float64)
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    rng = np.random.RandomState(42)
    books: list[list[list[float]]] = []
    for s in range(m):
        xs = x[:, s * sub : (s + 1) * sub]
        k = min(ks, len(xs))
        cent = xs[rng.choice(len(xs), size=k, replace=False)].copy()
        for _ in range(iters):
            d2 = ((xs[:, None, :] - cent[None, :, :]) ** 2).sum(2)
            assign = d2.argmin(1)
            for j in range(k):
                pts = xs[assign == j]
                if len(pts):
                    cent[j] = pts.mean(0)
                else:
                    cent[j] = xs[d2.min(1).argmax()]
        books.append([c.tolist() for c in cent])
    return books


def pq_train_portable(
    corpus: DataFrame,
    m: int = 8,
    ks: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample: int = 2048,
    iters: int = 8,
) -> list[list[list[float]]]:
    """ENGINE-PORTABLE k-means PQ training — every step reproducible by
    a SQL engine, so the whole training loop can be value-oracled
    (q166 replays it as unrolled DuckDB CTEs the way q136 replays BPE
    merges):

    - the training sample is the FIRST ``sample`` rows by ``id_col``
      (at oracle scale that is the whole table; :func:`pq_train` keeps
      the xxhash64-order sample, which stays unbiased when the corpus
      exceeds the cap but is not SQL-reproducible);
    - init is the first ``ks`` sample rows per subspace (deterministic
      data points, not an RNG draw);
    - squared distances accumulate dimension-by-dimension LEFT TO
      RIGHT and are rounded to 9 digits before the argmin (ties ->
      lowest code), so a SQL engine writing the same explicit sum
      chain computes the identical rounded value and the identical
      argmin;
    - updated centroids are round(sum/n, 6) per coordinate — the
      rounding makes the result independent of summation order
      (cross-engine/numpy accumulation ulps sit ~1e-15, far below the
      5e-7 boundary), which is what lets every iteration feed the
      next bit-for-bit in both engines;
    - empty clusters re-seed from the point with the largest rounded
      min-distance (earliest sample row on ties), copied exactly.

    Returns ``codebooks[m][ks][dim/m]`` like :func:`pq_train`.
    """
    import numpy as np

    rows = (
        corpus.select(id_col, vec_col).orderBy(id_col).limit(sample).collect()
    )
    if not rows:
        return []
    x = np.array([r[1] for r in rows], dtype=np.float64)
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    books: list[list[list[float]]] = []
    for s in range(m):
        xs = x[:, s * sub : (s + 1) * sub]
        k = min(ks, len(xs))
        cent = xs[:k].copy()
        for _ in range(iters):
            # left-to-right per-dimension accumulation (matches the
            # explicit sum chain the SQL oracle writes; numpy's
            # pairwise .sum() would group differently at ulp level)
            d2 = np.zeros((len(xs), k))
            for j in range(k):
                d = (xs[:, 0] - cent[j, 0]) ** 2
                for dmn in range(1, sub):
                    d = d + (xs[:, dmn] - cent[j, dmn]) ** 2
                d2[:, j] = d
            d2 = np.round(d2, 9)
            assign = d2.argmin(1)  # first (lowest code) on ties
            mind = d2.min(1)
            far = xs[mind.argmax()]  # first (earliest row) on ties
            for j in range(k):
                pts = xs[assign == j]
                if len(pts):
                    cent[j] = np.round(pts.sum(0) / len(pts), 6)
                else:
                    cent[j] = far
        books.append([c.tolist() for c in cent])
    return books


def pq_assign(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = None,
) -> DataFrame:
    """Encode each vector as ``m`` sub-codes (nearest sub-centroid per
    subspace) plus its total squared reconstruction error — entirely
    as JVM expressions, the :func:`assign_cells` pattern: codebooks
    ship inside the plan as array literals (m*ks*subdim doubles, a few
    KB), the per-row work is an argmin over ``ks`` squared distances
    per subspace inside whole-stage codegen, and the plan is a narrow
    map — no UDF, no shuffle, no Python in the hot path.

    Each subspace's argmin is ONE expression: ``array_min`` over
    (err, idx) structs, whose lexicographic ordering picks the lowest
    index on err ties — and each lands in its own named column so the
    big centroid-literal subtree appears exactly once in the plan.
    (A previous formulation inlined the distance array 6x per
    subspace; Catalyst analysis alone then cost ~14 s per run at any
    data size — expression-tree size is driver-side plan cost, flat
    in rows but paid per query.  This shape runs the same plan in
    ~3 s; CollapseProject keeps the named subtrees single because
    they are non-cheap and multiply referenced.)

    Output: ``(id_col, codes array<int>, sq_err double)``.  Storage
    story: m bytes/vector (codes) vs 4*dim float bytes — 32x for
    dim=64/m=8 — with ``sq_err`` the per-row audit the int8 operator
    (quantize_embeddings_int8) exposes corpus-wide.
    """
    m = len(codebooks)
    sub = len(codebooks[0][0])
    out = df.select(id_col, vec_col)
    for s in range(m):
        cents = (
            "array("
            + ", ".join(
                "array(" + ", ".join(repr(v) for v in c) + ")" for c in codebooks[s]
            )
            + ")"
        )
        sl = f"slice({vec_col}, {s * sub + 1}, {sub})"
        dist = (
            f"aggregate(zip_with(c, {sl}, "
            "(x, y) -> (x - CAST(y AS DOUBLE)) * (x - CAST(y AS DOUBLE))), "
            "CAST(0.0 AS DOUBLE), (a, v) -> a + v)"
        )
        if round_digits is not None:
            # rounded-distance argmin (ties -> lowest code): the
            # portable-training contract, see pq_train_portable
            dist = f"round({dist}, {round_digits})"
        best = (
            f"array_min(zip_with({cents}, sequence(0, {len(codebooks[s]) - 1}), "
            f"(c, i) -> named_struct('err', {dist}, 'i', i)))"
        )
        out = out.withColumn(f"__b_{s}", F.expr(best))
    codes = F.array(*[F.col(f"__b_{s}.i").cast("int") for s in range(m)]).alias("codes")
    err = sum(F.col(f"__b_{s}.err") for s in range(m)).alias("sq_err")
    return out.select(F.col(id_col), codes, err)


def pq_assign_arrow(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    chunk_rows: int = 4096,
) -> DataFrame:
    """Vectorized PQ encode — same contract as :func:`pq_assign`, as a
    numpy kernel over Arrow batches (mapInPandas).

    Why a Python kernel when the JVM expression version exists: the
    encode is ~m*ks*subdim (≈1k) multiply-adds per row, and Spark's
    higher-order functions (transform/zip_with/aggregate) evaluate
    INTERPRETED, per-element, with boxing — measured 17.5 s for 200k
    rows (88 µs/row) on 32 cores.  The same arithmetic as one batched
    numpy broadcast runs the identical result set in well under a
    second — the "UDFs are the slow path" rule inverts precisely when
    the built-in path can't vectorize.  Plan shape is unchanged:
    narrow map, no shuffle; codebooks ride in the closure (a few KB).
    ``chunk_rows`` bounds the (chunk, m, ks) distance tensor to a few
    MB regardless of Arrow batch size.

    Ties break to the lowest code index (np.argmin first-occurrence),
    matching pq_assign's struct-min; equality of the two kernels is
    pinned in tests/test_operators.py.
    """
    import numpy as np

    m = len(codebooks)
    sub = len(codebooks[0][0])
    books = [[list(c) for c in b] for b in codebooks]
    id_type = {f.name: f.dataType.simpleString() for f in df.schema.fields}[id_col]
    out_schema = f"{id_col} {id_type}, codes array<int>, sq_err double"

    def encode(batches):
        import numpy as np
        import pandas as pd

        bk = np.asarray(books, dtype=np.float64)  # (m, ks, sub)
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            for lo in range(0, n, chunk_rows):
                part = pdf.iloc[lo : lo + chunk_rows]
                x = np.array(part[vec_col].tolist(), dtype=np.float64).reshape(
                    len(part), m, sub
                )
                d = ((x[:, :, None, :] - bk[None, :, :, :]) ** 2).sum(-1)  # (n, m, ks)
                codes = d.argmin(2).astype(np.int32)
                err = d.min(2).sum(1)
                yield pd.DataFrame(
                    {
                        id_col: part[id_col].values,
                        "codes": [c.tolist() for c in codes],
                        "sq_err": err,
                    }
                )

    return df.select(id_col, vec_col).mapInPandas(encode, schema=out_schema)


_CELL_KNN_QUERY_BLOCK = 2048


def cell_knn_topk_arrow(
    asg: DataFrame,
    probes: DataFrame,
    k: int,
    query_block: int = _CELL_KNN_QUERY_BLOCK,
) -> DataFrame:
    """Per-(cell, query) top-``k`` cosine candidates as a cogrouped
    numpy kernel — the Arrow-batch twin of the JVM candidate scoring
    inside q264's IVF leave-one-out audit.

    Inputs: ``asg`` (cell, neighbor_id, nlabel, nv, nnorm) — one row
    per corpus vector in its assigned cell; ``probes`` (qcell,
    query_id, tlabel, qv, qnorm) — one row per (query, probed cell);
    the key is named differently per side so callers whose two sides
    descend from one relation dodge the self-join ambiguity check.
    Output: (query_id, tlabel, neighbor_id, nlabel, s4) — the top-k
    per (cell, query) by (s4 DESC, neighbor_id ASC), self-pairs
    excluded, with ``s4 = round(dot / (qnorm * nnorm), 4)``.

    Exactness contract (why this can twin the JVM path): the dot
    accumulates over dimensions in a python loop of vectorized
    numpy adds — per scalar pair the order is ((0 + t1) + t2) + ...,
    bit-identical to the SQL ``aggregate(zip_with(...))`` fold; the
    division sees the SAME precomputed norms.  The one documented
    seam is round-half-up: numpy has no decimal-string HALF_UP, so
    the kernel uses copysign(floor(|x| * 1e4 + 0.5)) — equal to the
    JVM/DuckDB rounding except for doubles whose shortest decimal
    lands exactly on a .00005 boundary, which the equivalence pin
    (tests/test_round8_semantics.py) would surface on a real corpus.
    Hence the REGISTERED twin (q270) is rows-only + pinned-equal to
    the value-oracled q264, the q152/q153 discipline.

    Why Python here: the per-pair interpreted HOF fold measured
    ~18 us/core at 100x (PLANS.md q264 row); one (|cell| x dim)
    matmul-shaped batch per cell runs the same arithmetic at memory
    bandwidth.  Plan shape: ONE cogroup shuffle on cell (the same
    key the JVM join shuffles on), kernel output is k rows per
    (cell, query) — candidates never materialize.

    Memory ceiling: the kernel never holds the full
    |queries| x |members| score matrix — queries are scored in
    ``query_block``-row blocks, bounding the per-task float64
    footprint to ``query_block * |cell|`` doubles (~1.3 GB at
    sqrt-n cells of a 10^10-vector corpus with the default block;
    O(n)-per-cell without the blocking).  Per-pair arithmetic is
    untouched: each (query, member) dot still accumulates dimension
    by dimension in the same IEEE order, so blocking cannot move a
    single output bit.
    """
    import numpy as np

    out_schema = (
        "query_id long, tlabel int, neighbor_id long, nlabel int, s4 double"
    )
    empty = {
        "query_id": np.array([], dtype=np.int64),
        "tlabel": np.array([], dtype=np.int32),
        "neighbor_id": np.array([], dtype=np.int64),
        "nlabel": np.array([], dtype=np.int32),
        "s4": np.array([], dtype=np.float64),
    }

    def fn(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame(empty)
        nv = np.array(left["nv"].tolist(), dtype=np.float64)
        nn = left["nnorm"].to_numpy(dtype=np.float64)
        nid = left["neighbor_id"].to_numpy(dtype=np.int64)
        nlb = left["nlabel"].to_numpy(dtype=np.int32)
        rows_q, rows_t, rows_n, rows_nl, rows_s = [], [], [], [], []
        for lo in range(0, len(right), query_block):
            blk = right.iloc[lo : lo + query_block]
            qv = np.array(blk["qv"].tolist(), dtype=np.float64)
            qn = blk["qnorm"].to_numpy(dtype=np.float64)
            qid = blk["query_id"].to_numpy(dtype=np.int64)
            tlb = blk["tlabel"].to_numpy(dtype=np.int32)
            # exact fold order: ((0 + t1) + t2) + ... per scalar pair
            acc = np.zeros((len(qv), len(nv)), dtype=np.float64)
            for d in range(nv.shape[1]):
                acc += qv[:, d : d + 1] * nv[None, :, d][0]
            cos = acc / (qn[:, None] * nn[None, :])
            s4 = np.copysign(np.floor(np.abs(cos) * 1e4 + 0.5), cos) / 1e4
            for i in range(len(qv)):
                order = np.lexsort((nid, -s4[i]))
                taken = 0
                for j in order:
                    if nid[j] == qid[i]:
                        continue
                    rows_q.append(qid[i])
                    rows_t.append(tlb[i])
                    rows_n.append(nid[j])
                    rows_nl.append(nlb[j])
                    rows_s.append(s4[i, j])
                    taken += 1
                    if taken == k:
                        break
        return pd.DataFrame(
            {
                "query_id": np.array(rows_q, dtype=np.int64),
                "tlabel": np.array(rows_t, dtype=np.int32),
                "neighbor_id": np.array(rows_n, dtype=np.int64),
                "nlabel": np.array(rows_nl, dtype=np.int32),
                "s4": np.array(rows_s, dtype=np.float64),
            }
        )

    return (
        asg.groupBy("cell")
        .cogroup(probes.groupBy("qcell"))
        .applyInPandas(fn, schema=out_schema)
    )


def centroid_top2_arrow(
    base: DataFrame,
    cent_rows,
) -> DataFrame:
    """Top-2 probe cells per vector as a numpy mapInPandas kernel —
    the Arrow twin of q264's centroid-scoring pass (dot every vector
    against every centroid, rank by (round9(cos) DESC, cell ASC),
    keep two).  ``cent_rows`` is the collected centroid slice:
    (cell, vector, norm) triples — sqrt(n)-bounded, rides in the
    task closure (~50 MB at a 10^10-vector corpus, the documented
    ceiling; shard the centroid set if ever past that).

    Same exactness contract as :func:`cell_knn_topk_arrow`: the dot
    accumulates per dimension in the SQL fold's IEEE order and the
    only seam is float half-up rounding, so consumers must be pinned
    engine twins (q270), never value-oracled queries.  Plan shape:
    narrow map over the base projection — the n*sqrt(n) scoring
    never becomes rows and never crosses a shuffle (the JVM path
    shuffles the slim scored triple into its ranking window).
    """
    import numpy as np

    cells = np.array([r[0] for r in cent_rows], dtype=np.int32)
    C = np.array([list(r[1]) for r in cent_rows], dtype=np.float64)
    cn = np.array([r[2] for r in cent_rows], dtype=np.float64)
    order0 = np.argsort(cells, kind="stable")
    cells, C, cn = cells[order0], C[order0], cn[order0]

    def fn(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            V = np.array(pdf["v"].tolist(), dtype=np.float64)
            vn = pdf["vnorm"].to_numpy(dtype=np.float64)
            acc = np.zeros((n, len(cells)), dtype=np.float64)
            for d in range(C.shape[1]):
                acc += V[:, d : d + 1] * C[None, :, d][0]
            cos = acc / (vn[:, None] * cn[None, :])
            s9 = np.copysign(np.floor(np.abs(cos) * 1e9 + 0.5), cos) / 1e9
            # top-2 by (s9 DESC, cell ASC): cells are pre-sorted
            # ascending, so a stable argsort on -s9 breaks ties by cell
            idx = np.argsort(-s9, axis=1, kind="stable")[:, :2]
            vec_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            take = min(2, len(cells))
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(vec_ids, take),
                    "cell": cells[idx[:, :take]].reshape(-1),
                    "rk": np.tile(
                        np.arange(1, take + 1, dtype=np.int32), n
                    ),
                }
            )

    return base.select("vec_id", "v", "vnorm").mapInPandas(
        fn, schema="vec_id long, cell int, rk int"
    )


def centroid_assign_arrow(
    base: DataFrame,
    cent_rows,
    centroid_block: int = 4096,
) -> DataFrame:
    """Nearest-centroid assignment (argmax round9(cos), ties to the
    LOWEST cluster id) as a numpy mapInPandas kernel — the Arrow twin
    of the JVM ``_km_assign`` argmax used by q282/q312, built on
    :func:`centroid_top2_arrow`'s exactness contract: the dot
    accumulates per dimension in the SQL fold's IEEE order, norms are
    PRECOMPUTED JVM-side (``_norm_expr``) on both sides so the
    division sees identical doubles, and the only seam is float
    half-up rounding at the 1e-9 grid — consumers must be pinned
    engine twins of a value-oracled query (the q270 discipline).

    ``base`` carries (vec_id, v, vnorm); ``cent_rows`` is the
    collected (cluster, cv, cnorm) relation — k x dim bounded, rides
    in the task closure (the same O(k*dim) payload the JVM path
    broadcasts).  Output (vec_id, v, vnorm, cluster) passes the
    vector through, so downstream update/prune stages need no
    re-join — the whole pass is a narrow map, no shuffle.

    Memory ceiling: centroids are scored in ``centroid_block``-column
    blocks in ascending-cluster order with a running strict-max, so
    the per-task score matrix is |batch| x block doubles regardless
    of k; strict (>) updates keep the earliest block's winner on
    ties — exactly ties-to-lowest.
    """
    import numpy as np

    cells = np.array([r[0] for r in cent_rows], dtype=np.int32)
    C = np.array([list(r[1]) for r in cent_rows], dtype=np.float64)
    cn = np.array([r[2] for r in cent_rows], dtype=np.float64)
    order0 = np.argsort(cells, kind="stable")
    cells, C, cn = cells[order0], C[order0], cn[order0]

    def fn(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            V = np.array(pdf["v"].tolist(), dtype=np.float64)
            vn = pdf["vnorm"].to_numpy(dtype=np.float64)
            best_s = np.full(n, -np.inf, dtype=np.float64)
            # init to the LOWEST live cluster id, not literal 0: a
            # zero-norm vector scores NaN everywhere (NaN > best is
            # always False), and the JVM twin's max(struct(NULL, nc))
            # resolves such a vector to the lowest cluster — matching
            # that here keeps the seam NaN-free (r10 review finding)
            best_c = np.full(
                n, cells[0] if len(cells) else 0, dtype=np.int32
            )
            for lo in range(0, len(cells), centroid_block):
                Cb = C[lo : lo + centroid_block]
                acc = np.zeros((n, len(Cb)), dtype=np.float64)
                for d in range(Cb.shape[1]):
                    acc += V[:, d : d + 1] * Cb[None, :, d][0]
                cos = acc / (vn[:, None] * cn[None, lo : lo + centroid_block])
                s9 = np.copysign(np.floor(np.abs(cos) * 1e9 + 0.5), cos) / 1e9
                # within the block: first max of a stable argsort on
                # -s9 = ties to the lowest cluster (pre-sorted asc)
                j = np.argmax(s9, axis=1)  # np.argmax returns FIRST max
                s = s9[np.arange(n), j]
                upd = s > best_s  # strict: earlier blocks win ties
                best_s[upd] = s[upd]
                best_c[upd] = cells[lo : lo + centroid_block][j[upd]]
            out = pdf[["vec_id", "v", "vnorm"]].copy()
            out["cluster"] = best_c
            yield out

    return base.select("vec_id", "v", "vnorm").mapInPandas(
        fn, schema="vec_id long, v array<double>, vnorm double, cluster int"
    )


def cluster_dominated_prune_arrow(
    asg: DataFrame,
    threshold: float,
    member_block: int = 2048,
) -> DataFrame:
    """SemDeDup's dominated-rule prune as a per-cluster applyInPandas
    kernel — the Arrow twin of q312's JVM within-cluster pair join:
    a vector is pruned iff some LOWER-vec_id member of its cluster
    has round9(cosine) >= ``threshold``; ``pruned_by`` reports the
    smallest such id (NULL = kept).

    Same exactness contract as :func:`centroid_assign_arrow` (d-order
    dot fold, JVM-precomputed norms, half-up round at 1e-9 the only
    seam).  Plan shape: ONE shuffle on the cluster key (the same key
    the JVM pair join shuffles on); pairs never materialize as rows.

    Memory ceiling: members are sorted by vec_id and scored against
    the full member set in ``member_block``-row column blocks, so the
    per-task matrix is |cluster| x block doubles — sqrt-n clusters of
    a 10^10-vector corpus stay ~1.6 GB at the default block instead
    of |cluster|^2.
    """
    import numpy as np

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        n = len(pdf)
        V = np.array(pdf["v"].tolist(), dtype=np.float64)
        vn = pdf["vnorm"].to_numpy(dtype=np.float64)
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        pruned_by = np.full(n, -1, dtype=np.int64)
        for lo in range(0, n, member_block):
            hi = min(lo + member_block, n)
            acc = np.zeros((n, hi - lo), dtype=np.float64)
            for d in range(V.shape[1]):
                acc += V[:, d : d + 1] * V[None, lo:hi, d][0]
            cos = acc / (vn[:, None] * vn[None, lo:hi])
            s9 = np.copysign(np.floor(np.abs(cos) * 1e9 + 0.5), cos) / 1e9
            # dominance: row i prunes column j iff i < j (global
            # member order == vec_id order) and s9 >= t; the first
            # qualifying row per column is the smallest dominating id
            mask = s9 >= threshold
            # zero out i >= j (self and higher/equal ids)
            rows = np.arange(n)[:, None]
            cols = np.arange(lo, hi)[None, :]
            mask &= rows < cols
            has = mask.any(axis=0)
            first = np.where(has, mask.argmax(axis=0), -1)
            blk = np.full(hi - lo, -1, dtype=np.int64)
            blk[has] = ids[first[has]]
            cur = pruned_by[lo:hi]
            take = has & ((cur == -1) | (blk < cur))
            cur[take] = blk[take]
            pruned_by[lo:hi] = cur
        pb = pd.Series(pruned_by, dtype="Int64")
        pb[pruned_by == -1] = pd.NA
        out = pd.DataFrame(
            {
                "vec_id": ids,
                "cluster": pdf["cluster"].to_numpy(dtype=np.int32),
                "pruned_by": pb,
            }
        )
        return out

    return (
        asg.select("vec_id", "v", "vnorm", "cluster")
        .groupBy("cluster")
        .applyInPandas(fn, schema="vec_id long, cluster int, pruned_by long")
    )
