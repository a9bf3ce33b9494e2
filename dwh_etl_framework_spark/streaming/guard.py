"""Shared run-scoped batch-id re-delivery guard for foreachBatch folds.

Every SUM-style fold (histogram, CMS, document-frequency, entity stats)
persists ``__last_batch_id`` + ``__run_id`` in the same atomically
published state version as its counters, so re-executed micro-batches
(at-least-once delivery) are detected and skipped. The check lived
copy-pasted in four modules; this is the single implementation.

``run_id`` scopes the batch id (the Delta-style (appId, version)
transaction pattern): foreachBatch batch_ids restart at 0 whenever the
stream gets a FRESH checkpoint, so comparing ids across checkpoint
generations is meaningless — a DIFFERENT stored run_id accepts the
incoming batch and re-stamps the state.

ADVICE r9 #4: a state table carrying ``__last_batch_id`` but a missing
or NULL ``__run_id`` (older writer, manual repair) used to compare
``None == run_id`` → False and silently DISABLE the guard, re-SUMming
the batch into the counters on re-delivery. That state is
guard-unknown: we cannot tell whether the batch was applied, so the
only safe move for non-idempotent counters is to refuse loudly and name
the repair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

GUARD_COLS = ("__last_batch_id", "__run_id")


class GuardStateError(RuntimeError):
    """Persisted fold state whose re-delivery guard cannot be trusted."""


def check_batch_guard(
    stored: DataFrame | None, batch_id: int, run_id: str
) -> tuple[bool, DataFrame | None]:
    """Decide whether a micro-batch was already applied to ``stored``.

    Returns ``(skip, counters)`` where ``skip`` is True for a detected
    re-execution and ``counters`` is the state with the guard columns
    stripped (``None`` for first-run). Raises :class:`GuardStateError`
    when the state carries a batch-id but no interpretable run-id —
    re-applying could double-count, skipping could drop a batch, so
    neither is silently chosen.
    """
    from pyspark.sql import functions as F

    if stored is None or "__last_batch_id" not in stored.columns:
        return False, stored
    if "__run_id" not in stored.columns:
        raise GuardStateError(
            "fold state has __last_batch_id but no __run_id column "
            "(written by an older guard?) — cannot tell whether batch "
            f"{batch_id} was applied. Repair: stamp a __run_id column "
            "onto the state, or clear the state and replay the stream "
            "from a fresh checkpoint."
        )
    head = stored.select(
        F.max("__last_batch_id").alias("b"),
        F.any_value("__run_id").alias("r"),
    ).first()
    if head["b"] is not None and head["r"] is None:
        raise GuardStateError(
            "fold state carries __last_batch_id="
            f"{head['b']} but a NULL __run_id — guard-unknown state "
            f"(manual repair?). Cannot tell whether batch {batch_id} "
            "was applied; stamp the state's __run_id or clear it and "
            "replay from a fresh checkpoint."
        )
    skip = (
        head["r"] == run_id
        and head["b"] is not None
        and batch_id <= head["b"]
    )
    return skip, stored.drop(*GUARD_COLS)


def stamp_guard(state: DataFrame, batch_id: int, run_id: str) -> DataFrame:
    """Attach the guard columns for the atomic publish (single-file
    state tables — callers coalesce(1) by convention)."""
    from pyspark.sql import functions as F

    return state.withColumn("__last_batch_id", F.lit(batch_id)).withColumn(
        "__run_id", F.lit(run_id)
    )
