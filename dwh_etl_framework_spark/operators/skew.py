"""Skew-resistant salted join (100 TB concern; SURVEY §4 shuffle notes).

AQE's skew-join splitting handles most skew at runtime, but a *planned*
salted join is still the tool when one hot key dominates (the classic
power-law user_id): the left side gets a deterministic salt in [0, n); the
right side is replicated n ways; the join key becomes (key, salt), so the
hot key's rows spread over n reducers instead of one.

Semantics are identical to the plain join (the oracle for x18 is the
unsalted SQL join) — only the physical distribution changes.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    num_salts: int = 8,
) -> DataFrame:
    """Join with the left side's hot keys spread over ``num_salts`` buckets.

    The left salt is derived deterministically from the whole row hash (any
    distribution is correct; determinism keeps runs reproducible). The
    right side is exploded ×num_salts — use only when right is much smaller
    than the skewed left, or the replication dominates.
    """
    on = list(on)
    if how not in ("inner", "left", "left_semi", "left_anti"):
        # right/full outer would emit every unmatched RIGHT row once per
        # salt replica — num_salts copies instead of one. Left-side joins
        # are safe: each left row carries exactly one salt.
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, not {how!r}"
        )
    l_salted = left.withColumn(
        _SALT, F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(num_salts))
    )
    r_salted = right.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)).cast("array<bigint>"))
    )
    return l_salted.join(r_salted, on=on + [_SALT], how=how).drop(_SALT)
