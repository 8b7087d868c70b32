"""Skew-mitigation utilities (SURVEY.md "optimize for scale").

AQE's skew-join handling (enabled in the session factory) splits
oversized partitions at runtime and is the first line of defense.
``salted_join`` is the explicit fallback for joins AQE can't fix —
e.g. one hot key holding >50% of a 100 TB fact table, where even a
split partition re-concentrates on the same reducer in a later stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join with the hot-key salt trick.

    The (large, skewed) ``left`` side gets a uniform salt in
    [0, salt); the (smaller, but not broadcastable) ``right`` side is
    replicated ``salt`` times via explode. The join key becomes
    (on, salt) so one hot key spreads over ``salt`` reducers. Salt is
    derived from a hash of the whole left row (deterministic, no RNG
    state — re-running the plan yields the same assignment).

    Cost model: right side is scanned/shuffled ``salt`` times — use
    only when the skew stall exceeds that. ``how`` supports inner and
    left joins (semantics of right-outer under replication are wrong
    by construction).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    lsalt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt)).cast("int")
    left_s = left.withColumn("__salt__", lsalt)
    right_s = right.withColumn(
        "__salt__", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return left_s.join(right_s, on=[on, "__salt__"], how=how).drop("__salt__")
