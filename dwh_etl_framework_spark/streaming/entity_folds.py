"""Streaming twin of the entity-resolution golden record (x101).

The batch x101 (queries/wave16.py) resolves fuzzy natural keys into
entities and elects a golden row per entity. This module maintains the
same resolution CONTINUOUSLY over an append-only row stream, with state
that stays VOCABULARY-sized no matter how many rows arrive — the
100 TB property the batch plan's tiers already have:

- **value stats** — one row per distinct value: row count (SUM-merged,
  run-scoped batch-id guard — the ``fold_dfreq_batch`` discipline),
  stable node id ``vid`` = MIN key over every row carrying the value
  (MIN is idempotent and order-free, so the streamed vid converges to
  the batch pipeline's global min regardless of arrival order), and
  the value's best survivorship struct (MAX-merged — idempotent).
- **edges** — qualifying value pairs (levenshtein ≤ k), set-union
  merged. Each micro-batch discovers exactly the pairs that involve a
  NEW value via ``edit_distance_pairs_cross`` (probe = values first
  seen this batch, index = every value seen so far): under append-only
  ingest every unordered value pair has a unique "later value" batch,
  so the union over batches equals the one-shot value self-join — the
  ``cascade_audit`` losslessness argument, applied to edit distance.

The entity report (cluster, member count, golden key) is computed at
READ time: connected components + one aggregate over the
vocabulary-sized state. The stream never runs CC; ingest cost per batch
is probe-vs-index, never corpus-rescan.

Crash discipline: edges publish BEFORE the guarded stats write. A crash
between the two re-runs the batch — the edge set-union is a fixed point
and the stats guard still sees the old batch id, so the re-run applies
exactly once. Both states are crash-atomic via ``StreamMasterState``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dwh_etl_framework_spark.operators.editjoin import edit_distance_pairs_cross
from dwh_etl_framework_spark.operators.graph import dedup_clusters
from dwh_etl_framework_spark.streaming.merge import StreamMasterState
from dwh_etl_framework_spark.streaming.guard import check_batch_guard, stamp_guard


def batch_value_stats(
    batch: DataFrame, val_col: str, key_col: str, price_col: str
) -> DataFrame:
    """One batch's per-value contribution: (val, n_rows, vid, best)
    where ``best`` = struct(max price, negated min-key tiebreak) — the
    x101 survivorship struct, MAX-mergeable across batches."""
    return (
        batch.filter(F.col(val_col).isNotNull())
        .groupBy(F.col(val_col).alias("val"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min(key_col).alias("vid"),
            F.max(
                F.struct(
                    F.col(price_col).alias("p"),
                    (-F.col(key_col)).alias("nk"),
                )
            ).alias("best"),
        )
    )


def update_value_stats(
    state: DataFrame | None, contrib: DataFrame
) -> DataFrame:
    """Merge a batch contribution into the per-value stats (pure
    function): SUM row counts, MIN vids, MAX survivorship structs."""
    if state is None:
        return contrib
    return (
        state.unionByName(contrib)
        .groupBy("val")
        .agg(
            F.sum("n_rows").cast("long").alias("n_rows"),
            F.min("vid").alias("vid"),
            F.max("best").alias("best"),
        )
    )


def fold_entity_batch(
    stats_state: StreamMasterState,
    edges_state: StreamMasterState,
    batch_df: DataFrame,
    batch_id: int,
    val_col: str,
    key_col: str,
    price_col: str,
    k: int = 1,
    run_id: str = "",
) -> bool:
    """Apply one micro-batch exactly once. Returns False on a skipped
    re-execution (run-scoped batch-id guard, carried by the stats
    state; the edge write is idempotent so it needs no guard and runs
    first — see the module crash-discipline note)."""
    if not batch_df.head(1):
        return False
    skip, stats = check_batch_guard(stats_state.read(), batch_id, run_id)
    if skip:
        return False

    # ---- edges first (idempotent set-union) ----
    batch_vals = (
        batch_df.filter(F.col(val_col).isNotNull())
        .select(F.col(val_col).alias("val"))
        .distinct()
    )
    known_vals = (
        stats.select("val") if stats is not None else None
    )
    all_vals = (
        batch_vals if known_vals is None
        else known_vals.unionByName(batch_vals).distinct()
    )
    new_vals = (
        batch_vals if known_vals is None
        else batch_vals.join(known_vals, "val", "left_anti")
    )
    new_edges = edit_distance_pairs_cross(
        new_vals, all_vals, "val", "val", k=k
    ).select(F.col("id_a").alias("val_a"), F.col("id_b").alias("val_b"))
    old_edges = edges_state.read()
    merged_edges = (
        new_edges if old_edges is None
        else old_edges.unionByName(new_edges)
    ).dropDuplicates(["val_a", "val_b"])
    edges_state.write(merged_edges.coalesce(1))

    # ---- stats second (guarded SUM/MIN/MAX merge) ----
    contrib = batch_value_stats(batch_df, val_col, key_col, price_col)
    merged = update_value_stats(stats, contrib)
    stats_state.write(stamp_guard(merged, batch_id, run_id).coalesce(1))
    return True


def stream_entity_resolution(
    stream: DataFrame,
    stats_state: StreamMasterState,
    edges_state: StreamMasterState,
    checkpoint_dir: str,
    val_col: str,
    key_col: str,
    price_col: str,
    k: int = 1,
):
    """Maintain the vocabulary-sized entity-resolution state
    continuously. Returns the StreamingQuery."""

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        fold_entity_batch(
            stats_state, edges_state, batch_df, batch_id,
            val_col, key_col, price_col, k, run_id=checkpoint_dir,
        )

    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def current_entities(
    stats_state: StreamMasterState,
    edges_state: StreamMasterState,
) -> DataFrame | None:
    """The live entity report from the persisted state: one row per
    entity — (entity_cluster, n_members, golden_key) — identical to the
    batch x101 result projected to entity grain over all rows ever
    streamed. Connected components + one aggregate, all over
    vocabulary-sized tables; None before the first batch lands."""
    stored = stats_state.read()
    if stored is None:
        return None
    drop = [c for c in ("__last_batch_id", "__run_id") if c in stored.columns]
    stats = stored.drop(*drop) if drop else stored
    edges = edges_state.read()
    vid_of = stats.select("val", "vid")
    if edges is None:
        labels = stats.select("vid", F.col("vid").alias("entity_cluster"))
    else:
        vedges = (
            edges.join(
                vid_of.select(F.col("val").alias("val_a"), F.col("vid").alias("doc_a")),
                "val_a",
            )
            .join(
                vid_of.select(F.col("val").alias("val_b"), F.col("vid").alias("doc_b")),
                "val_b",
            )
            .select("doc_a", "doc_b")
        )
        labels = dedup_clusters(stats.select("vid"), vedges, "vid").select(
            "vid", F.col("cluster").alias("entity_cluster")
        )
    return (
        stats.join(labels, "vid")
        .groupBy("entity_cluster")
        .agg(
            F.sum("n_rows").cast("long").alias("n_members"),
            F.max("best").alias("__g"),
        )
        .select(
            "entity_cluster",
            "n_members",
            (-F.col("__g.nk")).alias("golden_key"),
        )
    )
