"""Scalar / expression function library.

All helpers return JVM-side column expressions (or SQL fragments for
the expression-string builders) — nothing here executes Python per
row.  The reference's entire scalar surface is ROUND + arithmetic
(SURVEY.md §2.G); everything beyond that is north-star extension.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from team_aragon_spark.operators.similarity import cosine_expr
from team_aragon_spark.operators.text_dedup import shingle_expr

# GPT-2-ish pretokenizer approximation: leading-space word pieces,
# numbers split per digit, punctuation runs.  A deterministic,
# regex-only stand-in for BPE pretokenization (the merge table itself
# is model-specific); counts correlate with BPE token counts.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]+"


def bpe_ish_token_count(col: str) -> Column:
    """Approximate BPE token count via the pretokenizer regex.

    Spark's SQL string parser consumes one level of backslash escaping
    (unlike ANSI/DuckDB string literals), so the pattern is re-escaped
    before embedding.
    """
    pattern = BPE_ISH_PATTERN.replace("\\", "\\\\")
    return F.size(F.expr(f"regexp_extract_all({col}, '{pattern}', 0)")).cast("long")


def md5_60bit_sql(expr: str) -> str:
    """Spark SQL fragment: engine-portable 60-bit digest of ``expr``
    (lower 15 hex chars of md5 as a non-negative BIGINT).

    This is the cross-engine determinism contract used wherever a
    value must hash identically in Spark and the DuckDB oracle — the
    seeded random walks (q327) and the JSONL source-consistency
    digest (q325) route through these builders; q63's portable
    MinHash predates them and keeps its fused per-shingle form
    inline.  xxhash64 is cheaper but
    engine-specific; md5 is bit-identical everywhere.  60 bits keeps
    the value strictly inside BIGINT (no sign wrap), and bit_xor /
    modulo arithmetic over it is overflow-free under ANSI mode.
    ``tests/test_operators.py::test_md5_60bit_portable_contract``
    pins Spark == DuckDB on a corpus of adversarial strings.
    """
    return f"cast(conv(substr(md5({expr}), 17, 15), 16, 10) as bigint)"


def md5_60bit_duckdb(expr: str) -> str:
    """DuckDB twin of :func:`md5_60bit_sql` — byte-identical values."""
    return f"CAST(('0x' || substr(md5({expr}), 17, 15))::UBIGINT AS BIGINT)"


def ratio_of_sums(num: Column, den: Column, digits: int = 6) -> Column:
    """SUM(expr)/SUM(expr) with NULL-propagating terms (A5 semantics:
    a row with a NULL term drops out of that SUM, exactly as in SQL).
    try_divide: a zero/NULL denominator group yields NULL, matching
    ANSI SQL, instead of raising under Spark 4's ANSI mode."""
    return F.round(F.try_divide(F.sum(num), F.sum(den)), digits)


def rolling_hash_fingerprints(
    col: str, window: int = 8, keep_every: int = 16, tok_col: str | None = None
) -> Column:
    """Winnowing-style document fingerprint set.

    Polynomial rolling hash over ``window``-token char-joined grams via
    xxhash64, keeping hashes ≡ 0 (mod keep_every) — a deterministic
    ~1/keep_every sample of positions, robust to local edits (the
    classic MOSS/winnowing trick, computed as one array expression).

    ``tok_col`` names a PRE-MATERIALIZED token-array column; without
    it the tokenizer is inlined and the interpreted ``slice`` lambda
    re-tokenizes the document once per gram position (O(tokens x
    grams) per doc — the shingle_relation hazard).  Hot callers should
    project ``split(trim(col), '\\\\s+')`` into a column first and pass
    its name.
    """
    tok = tok_col or rf"split(trim({col}), '\\s+')"
    # if-guard: texts shorter than the window yield an empty gram set
    # (sequence(1, 0) is descending [1, 0] in Spark; slice at 0 throws).
    grams = (
        f"if(size({tok}) < {window}, array(), "
        f"transform(sequence(1, size({tok}) - {window - 1}), "
        f"i -> xxhash64(concat_ws(' ', slice({tok}, i, {window})))))"
    )
    return F.expr(f"array_sort(array_distinct(filter({grams}, h -> pmod(h, {keep_every}) = 0)))")


__all__ = [
    "BPE_ISH_PATTERN",
    "bpe_ish_token_count",
    "cosine_expr",
    "ratio_of_sums",
    "rolling_hash_fingerprints",
    "shingle_expr",
]
