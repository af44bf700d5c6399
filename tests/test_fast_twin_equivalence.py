"""Fast engine twins must never silently diverge from their
value-verified oracle pins.

q152 (xxhash64 winnowing) and q153 (token-combine MinHash) are
rows-only in the driver because their hash VALUES are engine-specific.
Positions/argmins differ across hash families by construction, so
"q152's positions == q133's" is not a checkable property.  The pin
used here is stronger: ONE pure-Python model of each selection
machinery (the winnowing window-argmin with the (hash, -pos)
encoding; the 8-permutation xor-fold MinHash) reproduces BOTH twins'
full outputs exactly on the sf0.001 corpus —

- the md5 twins (q133 / q63) from the raw text alone (md5 is
  computable in Python), and
- the fast twins (q152 / q153) from Spark-collected per-token
  xxhash64 values (the only engine-specific input),

so the two twins provably run the SAME selection semantics and can
only differ in the gram/shingle hash function, which is exactly the
documented contract.
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import functions as F

from team_aragon_spark.plans import star_queries as SQ
from tests.conftest import SF_SMOKE

MASK32 = 0xFFFFFFFF


def _tokens(text: str) -> list[str]:
    t = text.strip()
    return re.split(r"\s+", t) if t else [""]


def _winnow_select(gram_hashes: list[int], w: int = 4, M: int = 1 << 20):
    """The portable_winnowing_fingerprints selection: per window of w
    consecutive gram hashes, min of ``h * M + (M - 1 - pos)``; emit
    the distinct (pos, hash) set."""
    n = len(gram_hashes)
    enc = [h * M + (M - 1 - pos) for pos, h in enumerate(gram_hashes, start=1)]
    out = set()
    for s in range(n - w + 1):
        me = min(enc[s : s + w])
        out.add((M - 1 - me % M, me // M))
    return out


def _minhash_fold(vals: list[int], consts) -> list[int | None]:
    """q63/q153's 8-permutation xor-fold: per constant, min over the
    distinct shingle values of (v ^ c); empty input folds to NULL."""
    if not vals:
        return [None] * len(consts)
    return [min(v ^ c for v in vals) for c in consts]


def _collect_docs_with_token_hashes(spark):
    """(doc_id, text, th) — th is Spark's xxhash64 per token masked to
    32 bits, the single engine-specific input of the fast twins."""
    th = "transform(split(trim(text), '\\\\s+'), t -> xxhash64(t) & 4294967295)"
    rows = (
        SQ._t(spark, SF_SMOKE, "documents")
        .select("doc_id", "text", F.expr(th).alias("th"))
        .collect()
    )
    return [(r.doc_id, r.text, list(r.th)) for r in rows]


def test_winnowing_twins_share_selection_machinery(spark):
    """One Python winnowing selector reproduces q133 (md5 grams, from
    raw text) AND q152 (token-hash polynomial grams, from Spark token
    hashes) exactly, row for row, on the sf0.001 corpus."""
    docs = _collect_docs_with_token_hashes(spark)
    k = 5

    expect_md5, expect_fast = set(), set()
    for doc_id, text, th in docs:
        toks = _tokens(text)
        if len(toks) < k:
            continue
        md5_grams = [
            int(
                hashlib.md5(
                    " ".join(toks[i : i + k]).encode()
                ).hexdigest()[:8],
                16,
            )
            for i in range(len(toks) - k + 1)
        ]
        fast_grams = []
        for i in range(len(th) - k + 1):
            acc = th[i]
            for j in range(1, k):
                acc = acc * 31 + th[i + j]
            fast_grams.append(acc & MASK32)
        for pos, h in _winnow_select(md5_grams):
            expect_md5.add((doc_id, pos, h))
        for pos, h in _winnow_select(fast_grams):
            expect_fast.add((doc_id, pos, h))

    got_md5 = {
        (r.doc_id, r.pos, r.hash)
        for r in SQ.QUERY_REGISTRY["q133_portable_winnowing"]
        .fn(spark, SF_SMOKE)
        .collect()
    }
    got_fast = {
        (r.doc_id, r.pos, r.hash)
        for r in SQ.QUERY_REGISTRY["q152_winnowing_fast"]
        .fn(spark, SF_SMOKE)
        .collect()
    }
    assert got_md5 == expect_md5
    assert got_fast == expect_fast
    assert expect_md5 and expect_fast


def test_minhash_twins_share_fold_machinery(spark):
    """One Python xor-fold reproduces q63 (md5 shingle values, from
    raw text) AND q153 (token-combine shingle values, from Spark token
    hashes) exactly on the sf0.001 corpus — including the NULL rows
    for sub-3-token documents."""
    docs = _collect_docs_with_token_hashes(spark)
    consts = SQ._Q63_PERM_CONSTS
    mask60 = SQ._Q63_MASK

    expect_md5, expect_fast = set(), set()
    for doc_id, text, th in docs:
        toks = _tokens(text)
        if len(toks) < 3:
            sh_md5, sh_fast = [], []
        else:
            sh_md5 = list(
                dict.fromkeys(
                    " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
                )
            )
            sh_fast = list(
                dict.fromkeys(
                    ((th[i] * 31 + th[i + 1]) * 31 + th[i + 2]) & mask60
                    for i in range(len(th) - 2)
                )
            )
        vals_md5 = [
            int(hashlib.md5(s.encode()).hexdigest()[16:31], 16) for s in sh_md5
        ]
        for perm, m in enumerate(_minhash_fold(vals_md5, consts)):
            expect_md5.add((doc_id, perm, m))
        for perm, m in enumerate(_minhash_fold(sh_fast, consts)):
            expect_fast.add((doc_id, perm, m))

    got_md5 = {
        (r.doc_id, r.perm, r.minhash)
        for r in SQ.QUERY_REGISTRY["q63_md5_minhash_signatures"]
        .fn(spark, SF_SMOKE)
        .collect()
    }
    got_fast = {
        (r.doc_id, r.perm, r.minhash)
        for r in SQ.QUERY_REGISTRY["q153_minhash_signatures_fast"]
        .fn(spark, SF_SMOKE)
        .collect()
    }
    assert got_md5 == expect_md5
    assert got_fast == expect_fast
    assert expect_md5 and expect_fast
