"""Python execution surface (R27, the generalization of the reference's

python-file step F13, ``airflow_etl.py:627-641``): UDTF, grouped-agg pandas
UDF — each with a SQL oracle proving the Python path agrees with the
relational semantics. Arrow-batched throughout; no row-at-a-time UDFs."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from dwh_etl_framework_spark.queries.registry import fixtures, query


@udtf(returnType="token string, pos int")
class TokenizeUDTF:
    """Python UDTF (Spark 3.5+/4): one row per token with its position."""

    def eval(self, text: str):
        if text is None:
            return
        for i, tok in enumerate(text.split(" ")):
            yield tok, i


@query(
    "r27b_python_udtf",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               unnest(string_split(text, ' ')) AS token,
               unnest(generate_series(0, len(string_split(text, ' ')) - 1))
                   AS pos
        FROM documents
        WHERE doc_id < 100
    )
    SELECT doc_id, token, CAST(pos AS INTEGER) AS pos FROM toks
    """,
)
def r27b_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R27 Python UDTF: tokenize documents into (token, pos) rows via a

    lateral join — the UDTF form of the reference's arbitrary-python step."""
    fixtures(spark, sf_dir)
    spark.udtf.register("tokenize_udtf", TokenizeUDTF)
    return spark.sql(
        """
        SELECT d.doc_id, t.token, t.pos
        FROM documents d, LATERAL tokenize_udtf(d.text) t
        WHERE d.doc_id < 100
        """
    )


@query(
    "r27c_grouped_agg_udf",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(l_linenumber) AS BIGINT) AS line_sum,
           COUNT(*) AS n_lines
    FROM lineitem
    GROUP BY l_orderkey
    """,
)
def r27c_grouped_agg_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R27 grouped-aggregate pandas UDF (Arrow-batched UDAF): integer sum

    per group — exact, so the Python aggregation is oracle-checkable."""
    t = fixtures(spark, sf_dir)

    @pandas_udf("long")
    def line_sum(v: pd.Series) -> int:
        return int(v.sum())

    @pandas_udf("long")
    def line_count(v: pd.Series) -> int:
        return int(len(v))

    # Spark disallows mixing grouped-agg pandas UDFs with JVM aggregates in
    # one agg — both legs are pandas UDFs here.
    return t.lineitem.groupBy("l_orderkey").agg(
        line_sum("l_linenumber").alias("line_sum"),
        line_count("l_linenumber").alias("n_lines"),
    )
