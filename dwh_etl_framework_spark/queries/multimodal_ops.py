"""Multimodal query-surface entries (X4) wired to operators/multimodal.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dwh_etl_framework_spark.operators import multimodal
from dwh_etl_framework_spark.queries.registry import fixtures, query


@query(
    "x11_binary_columns",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS n_bytes,
           sha256(text) AS content_sha,
           lower(hex(CAST(substring(text, 1, 8) AS BLOB))) AS head_hex
    FROM documents
    """,
)
def x11_binary_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 opaque binary columns with typed metadata: encode → byte length,

    content hash, head bytes — the JVM-side half of the multimodal model
    (hashes/lengths never leave the executors as Python objects)."""
    t = fixtures(spark, sf_dir)
    blob = F.encode(F.col("text"), "UTF-8")
    return t.documents.select(
        "doc_id",
        F.octet_length(blob).alias("n_bytes"),
        F.sha2(blob, 256).alias("content_sha"),
        F.lower(F.hex(F.encode(F.substring("text", 1, 8), "UTF-8"))).alias(
            "head_hex"
        ),
    )


@query("x12_media_features", oracle=None)
def x12_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 decode/feature-extract via mapInPandas (Arrow batches).

    The decode is a deterministic STUB (no codec libs in this container —
    operators/multimodal.decode_media marks where the real decoder goes);
    the Spark plumbing (schema, batching, partition-parallel UDF) is real.
    No SQL oracle: mapInPandas is not SQL-expressible; exact values are
    asserted in tests/test_multimodal.py."""
    t = fixtures(spark, sf_dir)
    media = multimodal.attach_media_columns(t.documents, "text")
    return multimodal.decode_media(media).orderBy("doc_id")
