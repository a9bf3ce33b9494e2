"""Third-wave coverage: grouped-map applyInPandas (R27), csv/orc source

round-trips (F4/F5), map functions (R25), TF-IDF scoring, deterministic
sampling and histogram bucketing for training-data curation (X3/X1)."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dwh_etl_framework_spark.queries.registry import fixtures, query


@query(
    "r27d_grouped_map",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(SUM(l_linenumber) OVER (
               PARTITION BY l_orderkey ORDER BY l_linenumber ASC, l_extendedprice ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS running_line_sum
    FROM lineitem
    WHERE l_orderkey < 500
    """,
)
def r27d_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R27 grouped-map applyInPandas: per-order running integer cumsum

    computed in pandas (int64-exact ⇒ oracle-checkable against the SQL
    window). The grouped-map path is the Spark-native form of the
    reference's per-group python steps."""
    t = fixtures(spark, sf_dir)

    def cumsum(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["l_linenumber", "l_extendedprice"])
        pdf["running_line_sum"] = pdf["l_linenumber"].astype("int64").cumsum()
        return pdf[["l_orderkey", "l_linenumber", "running_line_sum"]]

    return (
        t.lineitem.filter(F.col("l_orderkey") < 500)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .groupBy("l_orderkey")
        .applyInPandas(
            cumsum, "l_orderkey long, l_linenumber int, running_line_sum long"
        )
    )


@query(
    "f04_csv_roundtrip",
    oracle="""
    SELECT r_regionkey, r_name FROM region
    """,
)
def f04_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 csv-scan (reference: header=true inferred CSV,

    airflow_etl.py:351-353): write region as headered CSV, register it back
    through the same SourceSpec path a pipeline dependency would use."""
    import tempfile

    from dwh_etl_framework_spark.sources.registry import SourceSpec, load_source

    t = fixtures(spark, sf_dir)
    path = f"{tempfile.gettempdir()}/dwh_etl_framework_spark_f04"
    t.region.coalesce(1).write.mode("overwrite").option("header", True).csv(path)
    spec = SourceSpec(alias="region_csv", format="csv", path=path)
    return load_source(spark, spec).select("r_regionkey", "r_name")


@query(
    "f05_orc_roundtrip",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    """,
)
def f05_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 orc-scan (the reference's checkpoint-cache re-read format,

    connector.py:48-49): nation → ORC → back."""
    import tempfile

    from dwh_etl_framework_spark.sources.registry import SourceSpec, load_source

    t = fixtures(spark, sf_dir)
    path = f"{tempfile.gettempdir()}/dwh_etl_framework_spark_f05"
    t.nation.write.mode("overwrite").orc(path)
    spec = SourceSpec(alias="nation_orc", format="orc", path=path)
    return load_source(spark, spec).select("n_nationkey", "n_name", "n_regionkey")


@query(
    "r25c_map_fns",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
           array_to_string(list_sort(json_keys(props)), ',') AS prop_keys,
           CAST(len(json_keys(props)) AS INTEGER) AS n_props
    FROM events
    WHERE event_id < 200
    """,
)
def r25c_map_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R25/R26 map functions: parse props JSON into a MapType column, then

    map_keys/map_values/element_at. Map columns never appear in the output
    (map ordering is engine-specific) — keys are sorted into a string."""
    t = fixtures(spark, sf_dir)
    m = F.from_json("props", "map<string,string>")
    return t.events.filter(F.col("event_id") < 200).select(
        "event_id",
        F.element_at(m, "k").cast("bigint").alias("k_value"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("prop_keys"),
        F.size(F.map_keys(m)).alias("n_props"),
    )


@query(
    "x15_tfidf",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS term_count FROM toks GROUP BY 1, 2
    ),
    doc_len AS (
        SELECT doc_id, COUNT(*) AS doc_tokens FROM toks GROUP BY 1
    ),
    df AS (
        SELECT term, COUNT(DISTINCT doc_id) AS doc_freq FROM toks GROUP BY 1
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT t.doc_id, t.term,
           t.term_count,
           (CAST(t.term_count AS DOUBLE) / l.doc_tokens)
               * (CAST(n.n_docs AS DOUBLE) / d.doc_freq) AS tfidf_ratio
    FROM tf t
    JOIN doc_len l ON t.doc_id = l.doc_id
    JOIN df d ON t.term = d.term
    CROSS JOIN n
    WHERE t.doc_id < 50
    """,
)
def x15_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 TF-IDF-style term scoring, pure relational (explode + three joins;

    document frequency join is broadcastable — vocabulary ≪ corpus). The
    idf uses a raw N/df ratio instead of log() because libm log is not
    bit-portable across engines; ranking behavior is identical."""
    t = fixtures(spark, sf_dir)
    toks = t.documents.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    # lineage cut (the x65 rule) + refinement aggregates: tf is the only
    # consumer of the corpus explode; doc_len (Σ term_count per doc) and
    # df (rows per term — tf is already distinct per (doc, term)) derive
    # from the tf table, so the text column is scanned ONCE instead of
    # three explode clones (plan-audited round 6)
    tf = (
        toks.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("term_count"))
        .localCheckpoint(eager=False)
    )
    doc_len = tf.groupBy("doc_id").agg(
        F.sum("term_count").alias("doc_tokens")
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    n_docs = t.documents.count()
    return (
        tf.join(doc_len, "doc_id")
        .join(F.broadcast(df_), "term")
        .filter(F.col("doc_id") < 50)
        .select(
            "doc_id",
            "term",
            "term_count",
            (
                (F.col("term_count").cast("double") / F.col("doc_tokens"))
                * (F.lit(float(n_docs)) / F.col("doc_freq"))
            ).alias("tfidf_ratio"),
        )
    )


@query(
    "x16_deterministic_sample",
    oracle="""
    SELECT doc_id, lang
    FROM documents
    WHERE substring(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 2) < '29'
    """,
)
def x16_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1-adjacent deterministic sampling for training-data curation:

    content-hash-prefix sampling (md5 < '29' ≈ 16% rate) is reproducible
    across engines, runs, and partitionings — unlike ``df.sample`` whose
    RNG is partition-dependent. The salt (doc_id) keeps identical texts
    independently sampled."""
    t = fixtures(spark, sf_dir)
    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("text")))
    return t.documents.filter(F.substring(h, 1, 2) < "29").select("doc_id", "lang")


@query(
    "x17_length_histogram",
    oracle="""
    SELECT CAST(CASE WHEN n_chars >= 600 THEN 13
                     ELSE floor(n_chars / 50.0) + 1 END AS INTEGER) AS bucket,
           COUNT(*) AS n_docs,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars
    FROM documents
    GROUP BY 1
    """,
)
def x17_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 corpus length histogram (fixed-width buckets, width_bucket

    semantics spelled out as a CASE — this DuckDB build lacks the builtin) —
    the standard first look at a new training corpus; one map + one small
    agg at any scale."""
    t = fixtures(spark, sf_dir)
    bucket = (
        F.when(F.col("n_chars") >= 600, F.lit(13))
        .otherwise(F.floor(F.col("n_chars") / 50.0) + 1)
        .cast("int")
    )
    return (
        t.documents.select(bucket.alias("bucket"), "n_chars")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )
