"""Exact set-similarity self-join via prefix filtering.

Finds every pair of sets whose Jaccard similarity meets a threshold
WITHOUT forming all pairs: the AllPairs/SSJoin prefix-filter family
(Chaudhuri, Ganti & Kaushik, ICDE 2006; Bayardo, Ma & Srikant, WWW
2007).  Items are canonically ordered rarest-first by global
frequency; a set of size n only needs its first ``n - ceil(t*n) + 1``
items as a blocking prefix — any pair with J >= t provably shares at
least one prefix item, so joining on prefix items generates a
candidate superset, and an exact verify pass keeps the result
identical to the brute-force join.  Because frequent items sort LAST
in the canonical order, they are the least likely to enter a prefix,
which is precisely what keeps the blocking buckets (and therefore the
self-join skew) small at corpus scale.

Unlike the MinHash/SimHash operators in ``text_dedup`` this join is
EXACT — no recall assumption — which is why its driver oracle can be
a full brute-force SQL value comparison.

Scale shape: one distinct + one frequency aggregate + one
prefix-bucket self-join + one verify join.  No all-pairs stage exists
at any cardinality; the verify join touches only candidate pairs.
The threshold comparison is pure integer arithmetic
(``inter * denom_scale >= union * num_scale``), so the qualifying
SET of pairs is bit-stable across engines and never hinges on a
float boundary.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# Below this threshold the prefix is >= ~70% of each set, the blocking
# join degenerates toward share-any-item anyway, and the extra stages
# (canonical sort, prefix explode, candidate distinct, array verify)
# are pure overhead: measured on the sf0.1 customer-basket workload at
# t=0.1, the count-join path runs 3.6 s steady vs 9.9 s for the prefix
# path, with bit-identical output.
_PREFIX_MIN_THRESHOLD = 0.3

# Above the threshold knee, "auto" decides from the DATA, not the
# threshold alone (r11; the q300/q314 measured-gate discipline): the
# count path's exact shuffle row count is sum_f f*(f-1)/2 over the
# item-frequency table — one bounded aggregate predicts it perfectly.
# When that fan-out is within _COUNT_FANOUT_FACTOR rows per membership
# row, the graph has no hot item and the count join wins (measured on
# the sf0.1 trigram corpus at t=0.3: fan-out ratio 4.9, count 2.65 s
# vs prefix 5.95 s, bit-identical output); a single hot item (f ~ 1M
# at corpus scale -> 5e11 pairs) blows the ratio past any bound and
# the prefix path — whose rarest-first blocking provably keeps hot
# items OUT of prefixes — stays in charge.  Both paths are exact and
# pinned against brute force in pytest.
_COUNT_FANOUT_FACTOR = 32


def set_similarity_join(
    sets_df: DataFrame,
    id_col: str,
    item_col: str,
    threshold: float,
    strategy: str = "auto",
) -> DataFrame:
    """Exact Jaccard >= threshold pairs over (id, item) membership rows.

    Returns ``(id_a, id_b, n_a, n_b, n_inter, jaccard)`` with
    ``id_a < id_b``, jaccard rounded to 6 digits.  Duplicate
    membership rows are tolerated (a distinct pass runs first).

    ``strategy`` picks the physical plan — both are EXACT:

    - ``"prefix"``: AllPairs prefix-filter blocking + array verify.
      Wins at high thresholds, where the prefix is a small slice of
      each set and hot (frequent) items provably stay out of it.
    - ``"count"``: share-an-item self-join + per-pair intersection
      count.  Fewer stages, no arrays; wins at low thresholds where
      the prefix cannot prune.  Its exposure is a hyper-frequent item
      (quadratic pair fan-out) — exactly what the prefix path avoids,
      so the crossover favors "prefix" again as t grows.
    - ``"auto"``: count below the ``_PREFIX_MIN_THRESHOLD`` knee;
      above it, decided by the MEASURED count-join fan-out
      ``sum_f f*(f-1)/2`` from the item-frequency table (one bounded
      aggregate — the exact row count the count join would shuffle):
      count when it stays within ``_COUNT_FANOUT_FACTOR`` rows per
      membership row (no hot item), prefix otherwise.  The gate reads
      raw (pre-distinct) frequencies — an upper bound, conservative
      toward prefix — so it costs one map-combined aggregate and no
      cache.
    """
    if strategy not in ("auto", "prefix", "count"):
        raise ValueError(f"unknown strategy {strategy!r}")
    t = Fraction(threshold).limit_denominator(10**6)
    members = sets_df.select(
        F.col(id_col).alias("sid"), F.col(item_col).alias("item")
    ).distinct()
    # NOT persisted — measured counter-result (r12): the column
    # renames defeat exchange reuse, so this relation's upstream
    # (q127's orders⋈lineitem basket build) re-derives up to four
    # times per query (plan-verified in plans/r12/q127_before.txt),
    # and a persist() here looked like the guide-§5 fix.  A/B said
    # otherwise at BOTH scales: q127 flat at sf0.1 (3.18 -> 3.13 s)
    # and 41% WORSE at 100x (209.98 -> 296.75 s steady, same box,
    # same method) — caching 60M (sid, item) rows costs more in
    # cache-write + memory churn than four parallel parquet re-scans
    # of the cheap upstream, the same columnar-rescan-beats-caching
    # lesson as q316's r11 token-cache rejection.
    if strategy == "count" or (
        strategy == "auto" and threshold < _PREFIX_MIN_THRESHOLD
    ):
        return _count_join(members, t)
    if strategy == "auto":
        # One map-combined aggregate over the RAW membership rows (no
        # distinct, no cache): duplicate rows only inflate f, so the
        # fan-out estimate is an upper bound — conservative toward the
        # prefix path.  The gate picks a physical strategy only; both
        # branches are exact, so a biased estimate cannot change values.
        # NOTE: this .first() is one extra eager pass over sets_df at
        # DataFrame-construction time; callers whose membership relation
        # is an expensive derivation (e.g. a corpus-wide shingle
        # explode) should persist it around the call.
        # f*(f-1) is estimated in DOUBLE: a hyper-frequent item
        # (f ~ 3e9+, the exact hot-item case this gate exists to
        # detect) overflows the bigint product under ANSI mode and
        # would raise instead of falling back to the prefix path; the
        # gate only picks a strategy, so lossy precision is fine.
        stats = (
            sets_df.groupBy(F.col(item_col).alias("item"))
            .agg(F.count(F.lit(1)).alias("f"))
            .agg(
                F.sum(F.col("f").cast("double") * (F.col("f") - 1)).alias("fan2"),
                F.sum("f").alias("nm"),
            )
            .first()
        )
        if (
            stats.nm
            and stats.fan2 is not None
            and stats.fan2 <= 2 * _COUNT_FANOUT_FACTOR * stats.nm
        ):
            return _count_join(members, t)

    # Canonical order: rarest item first, item value as tie-break so
    # the order (and therefore every prefix) is deterministic.
    freq = members.groupBy("item").agg(F.count(F.lit(1)).alias("item_freq"))
    ranked = members.join(freq, "item")

    # Per set: items sorted canonically + set size.  array_sort on
    # (freq, item) structs gives the rarest-first order JVM-side.
    sets_arr = (
        ranked.groupBy("sid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("item_freq", "item"))),
                lambda s: s["item"],
            ).alias("items"),
            F.count(F.lit(1)).alias("n"),
        )
        # not persisted: see the members counter-result above — the
        # membership persist lost at both scales, and no registered
        # consumer reaches this prefix path on a corpus where the
        # canonical-order build dominates (the containment_join
        # sibling persists because its verify probes it twice AFTER
        # an expensive string-shingle upstream; here the auto gate
        # sends those corpora to the count path).
    )

    # Prefix length n - ceil(t*n) + 1: for J(A,B) >= t the overlap is
    # at least alpha = ceil(t * max(|A|,|B|)), and the alpha-th shared
    # item from the end of the canonical order must sit inside BOTH
    # prefixes (its position in X is <= |X| - alpha + 1).  ceil is
    # computed in EXACT integer arithmetic from the Fraction —
    # float ceil(0.1 * 90) = 10, not 9, and an overshoot of one
    # shortens the prefix enough to miss exact-boundary pairs
    # (e.g. B a 9-subset of a 90-set at t = 0.1).
    # `div` is Spark's integral division, so the computation stays in
    # bigint at every width (a float Divide is only exact while
    # n*numerator < 2^53; limit_denominator(10**6) thresholds with a
    # very large set could in principle cross that bound and shorten a
    # prefix).
    ceil_tn = F.expr(
        f"(CAST(n AS BIGINT) * {t.numerator} + {t.denominator - 1}) "
        f"div {t.denominator}"
    )  # (n*p + q - 1) div q == ceil(n*p/q), exact integer arithmetic
    prefix_len = (F.col("n") - ceil_tn + F.lit(1)).cast("int")
    prefixes = sets_arr.select(
        "sid", F.explode(F.slice("items", F.lit(1), prefix_len)).alias("item")
    )

    cand = (
        prefixes.alias("x")
        .join(prefixes.alias("y"), "item")
        .filter(F.col("x.sid") < F.col("y.sid"))
        .select(F.col("x.sid").alias("id_a"), F.col("y.sid").alias("id_b"))
        .distinct()
    )

    a = sets_arr.select(
        F.col("sid").alias("id_a"),
        F.col("items").alias("items_a"),
        F.col("n").alias("n_a"),
    )
    b = sets_arr.select(
        F.col("sid").alias("id_b"),
        F.col("items").alias("items_b"),
        F.col("n").alias("n_b"),
    )
    inter = F.size(F.array_intersect("items_a", "items_b"))
    union = F.col("n_a") + F.col("n_b") - F.col("n_inter")
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("n_inter", inter)
        # Integer threshold test: inter/union >= p/q  <=>  inter*q >= union*p
        .filter(
            F.col("n_inter") * F.lit(t.denominator) >= union * F.lit(t.numerator)
        )
        .select(
            "id_a",
            "id_b",
            "n_a",
            "n_b",
            "n_inter",
            F.round(F.col("n_inter") / union, 6).alias("jaccard"),
        )
    )


def _count_join(members: DataFrame, t: Fraction) -> DataFrame:
    """Exact low-threshold path: count shared items per candidate pair
    directly from the membership self-join (the pair only exists if it
    shares an item, and the count IS the intersection size), then the
    same integer threshold test.  No canonical sort, no prefix
    explode, no array shuffle."""
    sz = members.groupBy("sid").agg(F.count(F.lit(1)).alias("n"))
    a = members.select(F.col("sid").alias("id_a"), "item")
    b = members.select(F.col("sid").alias("id_b"), "item")
    inter = (
        a.join(b, "item")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sz.select(F.col("sid").alias("id_a"), F.col("n").alias("n_a"))
    sb = sz.select(F.col("sid").alias("id_b"), F.col("n").alias("n_b"))
    union = F.col("n_a") + F.col("n_b") - F.col("n_inter")
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(F.col("n_inter") * F.lit(t.denominator) >= union * F.lit(t.numerator))
        .select(
            "id_a",
            "id_b",
            "n_a",
            "n_b",
            "n_inter",
            F.round(F.col("n_inter") / union, 6).alias("jaccard"),
        )
    )


def containment_join(
    sets_df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "sid",
    item_col: str = "item",
) -> DataFrame:
    """Exact DIRECTED containment join: pairs ``(id_a, id_b)`` with
    ``|A ∩ B| / |A| >= threshold`` — the subset/quotation relation
    (q158) that symmetric Jaccard misses entirely.

    Three EXACT prunes compose (all preserve the full result set —
    each is a provable superset argument, pinned against brute force
    in pytest):

    - **Asymmetric prefix filter**: if the overlap is
      ``alpha = ceil(t * |A|)``, A's FIRST common item (canonical
      rarest-first order) lies among its first ``|A| - alpha + 1``
      items (~10% at t = 0.9), so only those probe.
    - **Length filter**: ``|B| >= alpha`` — B cannot supply
      ``alpha`` common items otherwise.
    - **Positional filter** (PPJoin, Xiao et al., WWW 2008): a join
      row matching A's position ``i`` against B's position ``j`` can
      witness at most ``1 + min(|A| - i, |B| - j)`` common items.
      For a qualifying pair this bound holds at the FIRST common
      item — which the prefix filter guarantees is one of the joined
      rows — so dropping rows below ``alpha`` never drops a
      qualifying pair.
    - **Bitsignature filter**: each set carries a 1024-bit bloom of
      its item hashes (16 longs, built as ONE map-combined bit_or
      aggregate); for a candidate row,
      ``sum_k bit_count(sa_k & ~sb_k)`` is a LOWER bound on
      ``|A \\ B|`` (every such bit is set only by items of A that
      cannot be in B), so rejecting when it exceeds
      ``|A| - alpha`` is exact.  Applied MAP-SIDE via two broadcast
      joins onto the raw prefix-join output — no candidate pair
      shuffles before this filter.

    Why all four: measured on the dense 100x corpus (300k distinct
    shingles over 500k docs, mean df 114, median set size 68 with a
    short-set tail), prefix blocking alone emits 295M raw
    candidates; + positional/length filters still 150M distinct —
    and sample-verification showed only ~0.03% of those are TRUE
    pairs (~42k), the promiscuity coming from short sets (n=11 →
    one allowed miss, but a shared shingle with any long set passes
    the positional test).  The array verify on 150M pairs shuffled
    ~90 GB and never finished.  The bitsignature kills essentially
    every false candidate at ~35 codegen ops per row before the
    distinct, collapsing the verify join to the true-pair scale.
    At this corpus size the signature relation (500k x 136 B = 68
    MB) broadcasts; at extreme scale it becomes a compact shuffle
    join — 4x narrower rows than shipping the item arrays.

    The naive count-join spelling (count shared items over the full
    membership self-join) is what the q158 DuckDB ORACLE uses —
    legitimately, because the driver compares results, not plans; at
    engine scale it did not complete (quadratic hot-shingle
    fan-out).

    Returns ``(a, b, n_inter, n_a, containment)`` with the threshold
    applied in exact integer arithmetic (``n_inter * q >= n_a * p``).
    Cache contract: persists the per-set sorted-array relation for
    the two verify branches; lifetime caller-managed, as in
    :func:`set_similarity_join`.
    """
    t = Fraction(threshold).limit_denominator(10**6)
    members = sets_df.select(
        F.col(id_col).alias("sid"), F.col(item_col).alias("item")
    ).distinct()
    freq = members.groupBy("item").agg(F.count(F.lit(1)).alias("item_freq"))
    ranked = members.join(freq, "item")
    sets_arr = (
        ranked.groupBy("sid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("item_freq", "item"))),
                lambda s: s["item"],
            ).alias("items"),
            F.count(F.lit(1)).alias("n"),
        )
        .persist()
    )
    # 1024-bit bloom signature per set: ONE map-combined bit_or
    # aggregate over the membership rows, 16 long columns (no arrays,
    # no HOFs — the signature build and the popcount filter below both
    # stay inside whole-stage codegen).
    # derived from the PERSISTED sorted-set relation, not from
    # `members` — the members lineage would re-run the whole upstream
    # item build (for string shingles, the expensive part) a second
    # time (measured +2.8 s at sf0.1 on the q158 string path)
    sigs = (
        sets_arr.select(
            "sid", F.explode("items").alias("item")
        )
        .select("sid", F.expr("pmod(xxhash64(item), 1024)").alias("__bit"))
        .groupBy("sid")
        .agg(
            *[
                F.expr(
                    f"bit_or(if(__bit div 64 = {k}, "
                    f"shiftleft(1L, CAST(__bit % 64 AS INT)), 0L))"
                ).alias(f"__s{k}")
                for k in range(16)
            ]
        )
    )
    ceil_tn = F.expr(
        f"(CAST(n AS BIGINT) * {t.numerator} + {t.denominator - 1}) "
        f"div {t.denominator}"
    )
    prefix_len = (F.col("n") - ceil_tn + F.lit(1)).cast("int")
    # 1-based positions ride along for the positional filter; alpha
    # (the required overlap) rides on the A side.
    a_pref = sets_arr.select(
        F.col("sid").alias("a"),
        F.col("n").alias("__na"),
        ceil_tn.alias("__alpha"),
        F.posexplode(F.slice("items", F.lit(1), prefix_len)).alias("__i0", "item"),
    )
    b_full = sets_arr.select(
        F.col("sid").alias("b"),
        F.col("n").alias("__nb"),
        F.posexplode("items").alias("__j0", "item"),
    )
    siga = sigs.select(
        F.col("sid").alias("a"),
        *[F.col(f"__s{k}").alias(f"__sa{k}") for k in range(16)],
    )
    sigb = sigs.select(
        F.col("sid").alias("b"),
        *[F.col(f"__s{k}").alias(f"__sb{k}") for k in range(16)],
    )
    # bits set by A but absent from B's signature can only come from
    # items of A that are NOT in B (items in A∩B always find their
    # bit in sigB), so this popcount sum lower-bounds |A \ B|
    miss_lb = sum(
        F.expr(f"bit_count(__sa{k} & ~__sb{k})") for k in range(16)
    )
    cand = (
        a_pref.join(b_full, "item")
        .filter(
            (F.col("a") != F.col("b"))
            # length filter: B must be able to supply alpha items
            & (F.col("__nb") >= F.col("__alpha"))
            # positional filter: best-case remaining overlap through
            # this witness is 1 + min(n_a - i, n_b - j)
            & (
                F.lit(1)
                + F.least(
                    F.col("__na") - (F.col("__i0") + 1),
                    F.col("__nb") - (F.col("__j0") + 1),
                )
                >= F.col("__alpha")
            )
        )
        # map-side bitsignature reject BEFORE any pair shuffles
        .join(F.broadcast(siga), "a")
        .join(F.broadcast(sigb), "b")
        .filter(miss_lb <= F.col("__na") - F.col("__alpha"))
        .select("a", "b")
        .distinct()
    )
    av = sets_arr.select(
        F.col("sid").alias("a"), F.col("items").alias("items_a"), F.col("n").alias("n_a")
    )
    bv = sets_arr.select(F.col("sid").alias("b"), F.col("items").alias("items_b"))
    return (
        cand.join(av, "a")
        .join(bv, "b")
        .withColumn("n_inter", F.size(F.array_intersect("items_a", "items_b")))
        .filter(
            F.col("n_inter") * F.lit(t.denominator) >= F.col("n_a") * F.lit(t.numerator)
        )
        .select(
            "a",
            "b",
            F.col("n_inter").cast("bigint").alias("n_inter"),
            F.col("n_a").cast("bigint").alias("n_a"),
            F.round(F.col("n_inter") / F.col("n_a"), 6).alias("containment"),
        )
    )
