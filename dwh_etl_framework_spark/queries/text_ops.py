"""Text-analysis operators (SURVEY.md §2c X3 / north-star): language-ID,

quality scoring, token counting, document fingerprinting — all over the
``documents`` fixture, all JVM-side expressions (no UDFs in the hot path).
Document text is single-space-separated tokens, so ``split(text, ' ')``
tokenization is identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dwh_etl_framework_spark.queries.registry import fixtures, query

# language marker words for the n-gram/stopword heuristic (deterministic,
# mirrored verbatim in the oracle SQL)
_EN = ("the", "a", "of", "and", "is")
_DATA = ("data", "table", "row", "column", "query")


def _sql_list(words) -> str:
    return ", ".join(f"'{w}'" for w in words)


@query(
    "x07_lang_id",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang,
               CAST(len(list_filter(string_split(text, ' '),
                    x -> x IN ({_sql_list(_EN)}))) AS INTEGER) AS en_score,
               CAST(len(list_filter(string_split(text, ' '),
                    x -> x IN ({_sql_list(_DATA)}))) AS INTEGER) AS data_score,
               CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens
        FROM documents
    )
    SELECT doc_id, lang, en_score, data_score, n_tokens,
           CASE WHEN en_score * 20 >= n_tokens THEN 'en'
                WHEN data_score * 10 >= n_tokens THEN 'data-heavy'
                ELSE 'unknown' END AS predicted_lang
    FROM scored
    """,
)
def x07_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 language-ID heuristic: stopword-marker densities → predicted

    class. Pure higher-order array expressions (filter over the token
    array), whole-stage-codegen'd; at 100 TB this is a map-only pass."""
    t = fixtures(spark, sf_dir)
    toks = F.split("text", " ")
    en = F.size(F.filter(toks, lambda x: x.isin(*_EN)))
    data = F.size(F.filter(toks, lambda x: x.isin(*_DATA)))
    n = F.size(toks)
    return t.documents.select(
        "doc_id",
        "lang",
        en.alias("en_score"),
        data.alias("data_score"),
        n.alias("n_tokens"),
        F.when(en * 20 >= n, "en")
        .when(data * 10 >= n, "data-heavy")
        .otherwise("unknown")
        .alias("predicted_lang"),
    )


@query(
    "x08_quality_score",
    oracle="""
    WITH s AS (
        SELECT doc_id, n_chars,
               CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
               CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER)
                   AS n_unique_tokens,
               CAST(length(replace(text, ' ', '')) AS INTEGER) AS n_nonspace
        FROM documents
    )
    SELECT doc_id, n_chars, n_tokens, n_unique_tokens,
           CAST(n_unique_tokens AS DOUBLE) / n_tokens AS uniq_ratio,
           CAST(n_nonspace AS DOUBLE) / n_tokens AS mean_token_len,
           (CAST(n_unique_tokens AS DOUBLE) / n_tokens) * 0.7
               + (CASE WHEN n_tokens >= 20 THEN 1.0 ELSE 0.0 END) * 0.3
               AS quality_score
    FROM s
    """,
)
def x08_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 quality scoring: lexical-diversity + length heuristics composed

    into a score. All double arithmetic is written in the same operation
    order on both sides ⇒ IEEE-identical results."""
    t = fixtures(spark, sf_dir)
    toks = F.split("text", " ")
    n_tokens = F.size(toks)
    n_unique = F.size(F.array_distinct(toks))
    n_nonspace = F.length(F.regexp_replace("text", " ", ""))
    uniq_ratio = n_unique.cast("double") / n_tokens
    return t.documents.select(
        "doc_id",
        "n_chars",
        n_tokens.alias("n_tokens"),
        n_unique.alias("n_unique_tokens"),
        uniq_ratio.alias("uniq_ratio"),
        (n_nonspace.cast("double") / n_tokens).alias("mean_token_len"),
        (
            uniq_ratio * 0.7
            + F.when(n_tokens >= 20, 1.0).otherwise(0.0) * 0.3
        ).alias("quality_score"),
    )


@query(
    "x09_token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))
                AS INTEGER) AS bpe_ish_tokens,
           CAST(length(text) AS INTEGER) AS n_chars_exact
    FROM documents
    """,
)
def x09_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 token counting: whitespace tokens + a BPE-ish regex tokenizer

    (letter runs | digit runs | single punctuation). Simple character-class
    regexes behave identically in Java regex and DuckDB's RE2."""
    t = fixtures(spark, sf_dir)
    return t.documents.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("ws_tokens"),
        F.regexp_count("text", F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]")).alias(
            "bpe_ish_tokens"
        ),
        F.length("text").alias("n_chars_exact"),
    )


@query(
    "x10_fingerprint",
    oracle="""
    WITH fp AS (
        SELECT doc_id,
               md5(lower(trim(regexp_replace(text, ' +', ' ', 'g')))) AS fingerprint
        FROM documents
    )
    SELECT fingerprint,
           COUNT(*) AS n_docs,
           MIN(doc_id) AS first_doc_id
    FROM fp
    GROUP BY fingerprint
    """,
)
def x10_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 document fingerprinting: md5 over whitespace-normalized lowercased

    text; grouping on the fingerprint finds exact-after-normalization
    duplicates (the cheap tier of the dedup cascade in dedup_ops)."""
    t = fixtures(spark, sf_dir)
    norm = F.lower(F.trim(F.regexp_replace("text", " +", " ")))
    return (
        t.documents.select("doc_id", F.md5(norm).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("first_doc_id"))
    )


@query(
    "x27_vocabulary",
    oracle="""
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS term FROM documents
    ),
    counted AS (
        SELECT term, COUNT(*) AS term_freq FROM toks
        WHERE term NOT IN ('the', 'a', 'of', 'and', 'is')
        GROUP BY term
    )
    SELECT term, term_freq,
           CAST(row_number() OVER (ORDER BY term_freq DESC, term ASC) AS INTEGER)
               AS rank
    FROM counted
    ORDER BY term_freq DESC, term ASC
    LIMIT 30
    """,
)
def x27_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 corpus vocabulary: top-30 terms by frequency after stopword

    removal — the first artifact of tokenizer training. Explode + one
    count shuffle + TakeOrderedAndProject; total order via (freq DESC,
    term ASC). The top-30 cut happens FIRST (TakeOrderedAndProject — no
    global sort), and only the 30 survivors are ranked, so the rank
    window never sees the full term set (at corpus scale a global
    row_number before the limit would drag every distinct term into one
    task)."""
    t = fixtures(spark, sf_dir)
    stop = ("the", "a", "of", "and", "is")
    counted = (
        t.documents.select(F.explode(F.split("text", " ")).alias("term"))
        .filter(~F.col("term").isin(*stop))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("term_freq"))
    )
    top = counted.orderBy(
        F.col("term_freq").desc(), F.col("term").asc()
    ).limit(30)
    w = Window.orderBy(F.col("term_freq").desc(), F.col("term").asc())
    return (
        top.withColumn("rank", F.row_number().over(w))
        .orderBy(F.col("term_freq").desc(), F.col("term").asc())
    )
