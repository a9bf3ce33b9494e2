"""Range (interval) join without a theta join (SURVEY §2b R28-adjacent).

Joining facts to interval dimensions (``lo <= x < hi``) is a classic Spark
pain point: the naive formulation is a BroadcastNestedLoopJoin (O(n·m))
because there's no equality key. This operator manufactures one: intervals
are exploded into fixed-width buckets, facts hash to their bucket, and the
join becomes an equi-join on bucket + a residual BETWEEN filter.

Cost: |intervals| × (width/bucket) replicated rows (small — dimension side)
buys an O(n) shuffle-hash join on the fact side. Bucket width should be
chosen ≈ median interval length; wider intervals just replicate a few more
rows. This is the standard banding trick (same family as the LSH bands).
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET = "__range_bucket"


def _known_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's size estimate for a plan, or None when unknowable.

    Stats-less plans (e.g. ``createDataFrame`` → Scan ExistingRDD) report
    ``spark.sql.defaultSizeInBytes`` (Long.Max-ish) — treat anything that
    large as "unknown" rather than "huge"."""
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        size = int(str(stats.sizeInBytes()))
    except Exception:  # py4j surface changed / connect-only session
        return None
    if size >= (1 << 62):
        return None
    return size


def range_join(
    facts: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    how: str = "inner",
    broadcast_intervals: bool = True,
    broadcast_size_limit: int = 256 << 20,
) -> DataFrame:
    """Join each fact row to interval rows with ``lo <= value < hi``.

    NOTE: the interval side is BROADCAST by default — a genuinely large
    interval table must either fit each executor's memory or be passed
    with ``broadcast_intervals=False`` (the guard below catches the case
    where Catalyst KNOWS the side is big, but a stats-less huge frame is
    the caller's responsibility).

    Both sides may have arbitrary payload columns; the bucket key is
    internal. ``how='left'`` keeps unmatched facts (NULL interval payload).

    ``broadcast_intervals`` (default) pins the exploded INTERVAL side as the
    broadcast build side. Without the hint, a stats-less interval frame
    (e.g. ``createDataFrame`` output: Scan ExistingRDD, unknown size) makes
    Catalyst broadcast the FACT side instead — harmless-looking at test SF,
    fatal at 100 TB (the fact table doesn't fit in a HashedRelation). Set
    False only for genuinely huge interval tables, which then shuffle on
    the bucket key.

    Safety valve: when Catalyst DOES know the interval side's size (parquet
    scans report file bytes) and it exceeds ``broadcast_size_limit``
    (default 256 MiB, pre-explode), the hint is dropped with a warning and
    the join degrades to a bucket-key shuffle instead of a broadcast OOM.
    """
    f_b = facts.withColumn(
        _BUCKET, F.floor(F.col(value_col) / F.lit(bucket_width)).cast("long")
    )
    lo_bucket = F.floor(F.col(lo_col) / F.lit(bucket_width)).cast("long")
    # hi is exclusive: a hi exactly on a bucket boundary does not reach into
    # that bucket
    hi_bucket = F.floor((F.col(hi_col) - F.lit(1e-9)) / F.lit(bucket_width)).cast(
        "long"
    )
    i_b = intervals.withColumn(
        _BUCKET,
        F.explode(
            # sequence(start, stop) runs DESCENDING when stop < start, so a
            # degenerate interval (hi <= lo, or NULL bounds) would fan out
            # spurious bucket rows proportional to the inversion gap — the
            # residual BETWEEN discards them, but only after paying the
            # shuffle. Drop such intervals before the explode instead.
            F.when(F.col(hi_col) > F.col(lo_col), F.sequence(lo_bucket, hi_bucket))
            .otherwise(F.array().cast("array<long>"))
        ),
    )
    if broadcast_intervals:
        known = _known_size_bytes(intervals)
        if known is not None and known > broadcast_size_limit:
            warnings.warn(
                f"range_join: interval side is ~{known >> 20} MiB "
                f"(> broadcast_size_limit {broadcast_size_limit >> 20} MiB); "
                "dropping the broadcast hint — the join will shuffle on the "
                "bucket key instead",
                stacklevel=2,
            )
        else:
            i_b = F.broadcast(i_b)
    if how == "inner":
        joined = f_b.join(i_b, on=_BUCKET, how="inner").filter(
            (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
        )
        return joined.drop(_BUCKET)
    if how == "left":
        # surrogate row id for the unmatched-facts anti-join: joining back
        # on the fact columns themselves would mis-handle NULLs (NULL=NULL
        # is never true → matched rows with any NULL column would ALSO
        # appear as "missing" and come out twice)
        rid = "__range_rid"
        # materialize the id assignment: both the matched and missing
        # branches consume f_id, and monotonically_increasing_id is only
        # stable if the two branches don't independently recompute it
        # (nondeterministic upstream order would assign different ids)
        f_id = f_b.withColumn(rid, F.monotonically_increasing_id()).localCheckpoint(
            eager=True
        )
        joined = f_id.join(i_b, on=_BUCKET, how="inner").filter(
            (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
        )
        matched = joined.drop(_BUCKET)
        missing = f_id.drop(_BUCKET).join(
            matched.select(rid).distinct(), on=rid, how="left_anti"
        )
        for c in intervals.columns:
            missing = missing.withColumn(c, F.lit(None).cast(dict(intervals.dtypes)[c]))
        return matched.unionByName(missing.select(*matched.columns)).drop(rid)
    raise ValueError(f"unsupported how={how!r}")
