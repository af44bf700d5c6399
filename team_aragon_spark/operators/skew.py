"""Skew mitigation utilities for hot-key joins.

AQE's skew-join splitting (on by default, see session.py) handles most
skew at runtime by subdividing oversized shuffle partitions.  Explicit
salting remains the tool for the pathological case AQE can't fix:
ONE key so hot that even a split partition pins a single join task
(e.g. a null-ish default id owning 10% of a 100 TB fact table).

``salted_join`` spreads each hot key over ``n_salts`` shuffle
partitions: the big side gets a deterministic per-row salt, the small
side is replicated once per salt value, and the join key becomes
(key, salt).  Cost: small side × n_salts rows shuffled — cheap when
the small side is dimension-sized.  Semantics are identical to the
plain join (proven in tests) because every (big-row, small-row) key
match meets in exactly one salt bucket.

The salt is ``xxhash64`` of the big side's whole row (deterministic,
no rand()), so retries/speculative tasks produce identical output —
required for exactly-once sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join robust to hot keys on the big side.

    ``big`` rows are salted deterministically; ``small`` is exploded
    ``n_salts``× so every salt bucket holds a full copy of each key's
    small-side rows.  Join type semantics ('inner', 'left') follow the
    plain join.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts)).cast("int")
    big_s = big.withColumn(_SALT, salt)
    small_s = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return big_s.join(small_s, on=on + [_SALT], how=how).drop(_SALT)
