#!/usr/bin/env python
"""End-to-end LLM training-corpus curation: the §2c operators composed
into one pipeline, the way a data team would actually chain them.

    raw documents
      → exact dedup               (operators/dedup.exact_dedup — x01)
      → near-dup screen           (minhash LSH cascade — x02b/x03)
      → semantic dedup            (SemDeDup over embeddings — x81)
      → quality gate              (length/repetition heuristics — x08/x19)
      → importance selection      (DSIR-style integer ppm — x83)
      → length-bucketed packing   (pad-waste-aware batches — x85)

Each stage is the SAME DataFrame plan the oracle-checked registry query
runs; this script only wires them together and prints the funnel. Run:

    python examples/corpus_curation/run.py [sf_dir]

(defaults to /root/testdata/sf0.001 — finishes in ~30 s on local[*]).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from pyspark.sql import functions as F

from dwh_etl_framework_spark.operators import dedup, similarity
from dwh_etl_framework_spark.queries.registry import fixtures
from dwh_etl_framework_spark.session import SessionFactory


def curate(spark, sf_dir: str):
    """Returns (funnel, packed): stage-by-stage counts and the final
    batch plan. Pure DataFrames — callable from tests."""
    t = fixtures(spark, sf_dir)
    funnel = {"raw": t.documents.count()}

    # 1. exact dedup: lowest-id survivor per identical text (x01)
    survivors = dedup.exact_dedup(t.documents, "text", "doc_id").select(
        "doc_id"
    )
    docs = t.documents.join(survivors, "doc_id", "left_semi")
    funnel["after_exact_dedup"] = docs.count()

    # 2. near-dup screen: LSH candidates → exact Jaccard verify (x02b);
    #    drop the higher-id member of every verified pair
    pairs = dedup.lsh_jaccard_cascade(
        docs, "text", "doc_id", threshold=0.5
    ).select(F.col("doc_b").alias("doc_id")).distinct()
    docs = docs.join(pairs, "doc_id", "left_anti")
    funnel["after_near_dedup"] = docs.count()

    # 3. semantic dedup: embeddings share the doc id space in the fixture
    #    (vec_id == doc_id); keep docs whose vector survives SemDeDup (x81)
    cents = t.embeddings.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid_vec"),
    )
    kept_vecs = (
        similarity.semantic_dedup(t.embeddings, cents, tau=0.4)
        .filter(F.col("is_kept"))
        .select(F.col("vec_id").alias("doc_id"))
    )
    docs = docs.join(kept_vecs, "doc_id", "left_semi")
    funnel["after_semantic_dedup"] = docs.count()

    # 4. quality gate: token count + repetition (distinct-token ratio)
    gated = (
        docs.withColumn("toks", F.split("text", " "))
        .withColumn("n_tok", F.size("toks"))
        .withColumn(
            "uniq_ratio_ppm",
            F.expr(
                "CAST(size(array_distinct(toks)) * 1000000 DIV size(toks)"
                " AS BIGINT)"
            ),
        )
        .filter((F.col("n_tok") >= 10) & (F.col("uniq_ratio_ppm") >= 200000))
    )
    funnel["after_quality_gate"] = gated.count()

    # 5. DSIR-style selection toward the src0 distribution (x83 shape):
    #    one token-keyed aggregate, weights broadcast back
    toks = gated.select(
        "doc_id", "source", F.explode("toks").alias("token")
    )
    counts = toks.groupBy("token").agg(
        F.expr(
            "CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("cnt_tgt"),
        F.count(F.lit(1)).cast("long").alias("cnt_all"),
    ).localCheckpoint(eager=False)
    weights = counts.select(
        "token",
        F.expr("CAST(cnt_tgt * 1000000 DIV cnt_all AS BIGINT)").alias("w"),
    )
    overall = F.broadcast(
        counts.agg(
            F.expr("CAST(SUM(cnt_tgt) * 1000000 DIV SUM(cnt_all) AS BIGINT)")
            .alias("overall_ppm")
        )
    )
    selected = (
        toks.join(F.broadcast(weights), "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tok"),
            F.sum("w").cast("long").alias("score"),
        )
        .crossJoin(overall)
        .filter(F.expr("score DIV n_tok >= overall_ppm"))
        .select("doc_id", "n_tok")
    )
    funnel["after_dsir_selection"] = selected.count()

    # 6. length-bucketed batches (x85 shape): batch ids inside 8-token
    #    buckets — the input-pipeline handoff
    packed = selected.selectExpr(
        "doc_id",
        "n_tok",
        "LEAST(n_tok DIV 8, 15) AS bucket",
        "CAST((row_number() OVER (PARTITION BY LEAST(n_tok DIV 8, 15)"
        " ORDER BY doc_id) - 1) DIV 8 AS BIGINT) AS batch_id",
    )
    funnel["batches"] = packed.select("bucket", "batch_id").distinct().count()
    return funnel, packed


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = SessionFactory(app_name="corpus-curation-example").build()
    spark.sparkContext.setLogLevel("ERROR")
    funnel, _ = curate(spark, sf_dir)
    for stage, n in funnel.items():
        print(f"{stage:>22s}: {n}")
    spark.stop()


if __name__ == "__main__":
    main()
