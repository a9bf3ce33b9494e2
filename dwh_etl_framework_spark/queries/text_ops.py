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


@query(
    "x28_repetition_metrics",
    oracle="""
    WITH w AS (
        SELECT doc_id,
               string_split(text, ' ') AS words,
               1.0 - CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                   / len(string_split(text, ' ')) AS dup_word_frac,
               CAST(list_aggregate(list_transform(string_split(text, ' '),
                        w -> length(w)), 'sum') AS DOUBLE)
                   / len(string_split(text, ' ')) AS mean_word_len
        FROM documents
    ),
    b AS (
        SELECT doc_id, dup_word_frac, mean_word_len,
               unnest(list_transform(range(1, len(words)),
                      i -> words[i] || ' ' || words[i+1])) AS bigram
        FROM w
    ),
    c AS (
        SELECT doc_id, bigram, min(dup_word_frac) AS dup_word_frac,
               min(mean_word_len) AS mean_word_len, count(*) AS cnt
        FROM b GROUP BY doc_id, bigram
    )
    SELECT doc_id,
           CAST(sum(cnt) AS BIGINT) AS n_bigrams,
           CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE)
               AS top_bigram_ratio,
           min(dup_word_frac) AS dup_word_frac,
           min(mean_word_len) AS mean_word_len
    FROM c GROUP BY doc_id
    """,
)
def x28_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 Gopher-style repetition/quality metrics per document: most-common-

    bigram frequency ratio, duplicate-word fraction, mean word length —
    the standard cheap filters a pretraining curation pass applies before
    any model-based scoring.

    Scale shape: one map pass computes the per-doc scalars with array
    HOFs (no explode needed for those), then bigrams explode into the
    (doc_id, bigram) count — the only shuffles are the two hash
    aggregations, both keyed by doc_id(+bigram), both with map-side
    partial aggregation. The per-doc scalars ride through the aggregates
    as min() so no re-join with the source is needed. No windows, no UDFs.
    """
    t = fixtures(spark, sf_dir)
    words = F.split("text", " ")
    dup = (
        F.lit(1.0)
        - F.size(F.array_distinct(words)).cast("double") / F.size(words)
    )
    mean_wlen = (
        F.expr(
            "aggregate(transform(split(text, ' '), w -> length(w)), "
            "cast(0 as bigint), (a, x) -> a + x)"
        ).cast("double")
        / F.size(words)
    )
    # Guard docs with < 2 words: sequence(1, 0) yields the DESCENDING
    # array [1, 0] (not empty), and element_at(words, 0) then throws
    # INVALID_ARRAY_INDEX_IN_ELEMENT_AT, aborting the whole job.  The
    # DuckDB oracle simply emits no row for such docs, so the empty
    # array (explode -> no rows) is the matching behavior.  Same
    # pitfall-guard as x29's 5-gram expression below.
    bigrams = F.expr(
        "CASE WHEN size(split(text, ' ')) >= 2 THEN "
        "transform(sequence(1, size(split(text, ' ')) - 1), "
        "i -> concat(element_at(split(text, ' '), i), ' ', "
        "element_at(split(text, ' '), i + 1))) "
        "ELSE array() END"
    )
    exploded = t.documents.select(
        "doc_id",
        dup.alias("dup_word_frac"),
        mean_wlen.alias("mean_word_len"),
        F.explode(bigrams).alias("bigram"),
    )
    counted = exploded.groupBy("doc_id", "bigram").agg(
        F.min("dup_word_frac").alias("dup_word_frac"),
        F.min("mean_word_len").alias("mean_word_len"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return counted.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_bigrams"),
        (F.max("cnt").cast("double") / F.sum("cnt").cast("double")).alias(
            "top_bigram_ratio"
        ),
        F.min("dup_word_frac").alias("dup_word_frac"),
        F.min("mean_word_len").alias("mean_word_len"),
    )


@query(
    "x37_rare_token_score",
    oracle="""
    WITH dt AS (
        SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents
    ),
    df AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS df FROM dt GROUP BY tok
    )
    SELECT dt.doc_id,
           CAST(count(*) AS BIGINT) AS n_distinct,
           CAST(sum(df.df) AS BIGINT) AS sum_df,
           CAST(sum(df.df) AS DOUBLE) / count(*) AS mean_df,
           CAST(sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hapax
    FROM dt JOIN df ON df.tok = dt.tok
    GROUP BY dt.doc_id
    """,
)
def x37_rare_token_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 rare-token quality signal WITHOUT libm: per document, the mean

    corpus document-frequency of its distinct tokens plus its hapax count
    — a log-free stand-in for unigram-LM surprisal (docs full of
    corpus-rare tokens score low mean_df / high hapax; boilerplate scores
    high mean_df). All reductions are BIGINT so the oracle matches
    bit-for-bit; one double division at the end.

    Scale shape: distinct (doc, token) pairs explode once; the df table is
    vocabulary-sized (≪ corpus, Zipf) so the join back broadcasts at real
    scale; two partial-agg shuffles."""
    t = fixtures(spark, sf_dir)
    dt = t.documents.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("tok")
        # round-7 lineage cut (x65/x87 rule): dt feeds the df aggregate AND
        # the join-back — uncut, the split+array_distinct+explode subtree
        # is cloned and documents.parquet scans twice. A/B MEASURED the
        # cut faster at sf1 (1.2s vs 1.5s warm): array_distinct makes the
        # subtree expensive enough that materializing beats re-running.
    ).localCheckpoint(eager=False)
    df = dt.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    return (
        dt.join(df, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum("df").alias("sum_df"),
            (F.sum("df").cast("double") / F.count(F.lit(1))).alias("mean_df"),
            F.sum((F.col("df") == 1).cast("bigint")).alias("n_hapax"),
        )
    )


@query(
    "x29_decontamination",
    oracle="""
    WITH w AS (
        SELECT doc_id, source, string_split(text, ' ') AS words FROM documents
    ),
    g AS (
        SELECT doc_id, source,
               unnest(list_transform(range(1, len(words) - 3),
                      i -> array_to_string(words[i:i+4], ' '))) AS gram
        FROM w
    ),
    train AS (SELECT DISTINCT doc_id, gram FROM g WHERE source <> 'src0'),
    bench AS (SELECT DISTINCT gram FROM g WHERE source = 'src0')
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN gram IN (SELECT gram FROM bench)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
           CAST(sum(CASE WHEN gram IN (SELECT gram FROM bench)
                    THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS containment
    FROM train GROUP BY doc_id
    """,
)
def x29_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3/X1 benchmark decontamination: per training document, the fraction

    of its distinct 5-gram shingles that appear anywhere in a held-out
    benchmark set (here: ``source = 'src0'``) — the containment score used
    to drop eval-set leakage from a pretraining corpus.

    Scale shape: both sides dedup their grams map-side (``array_distinct``
    before the explode), the benchmark gram set is DISTINCT-ed and then
    hash-joined; at real scale the benchmark side is tiny relative to the
    corpus so Catalyst broadcasts it and the training side never
    shuffles — the only exchange is the final per-doc count. Documents
    shorter than 5 words contribute no grams on either engine (the Spark
    side guards the descending-``sequence`` pitfall: sequence(1, 0) would
    yield [1, 0], not empty)."""
    t = fixtures(spark, sf_dir)
    grams = F.expr(
        "CASE WHEN size(split(text, ' ')) >= 5 THEN "
        "array_distinct(transform(sequence(1, size(split(text, ' ')) - 4), "
        "i -> array_join(slice(split(text, ' '), i, 5), ' '))) "
        "ELSE array() END"
    )
    # round-7 audit: the two scans explode DISJOINT source slices, so no
    # compute is duplicated — a shared-explode localCheckpoint was A/B
    # MEASURED slower at sf1 (13.8s disjoint vs 15.6s cut): the
    # materialization costs more than the one extra pruned text read.
    train = t.documents.filter(F.col("source") != "src0").select(
        "doc_id", F.explode(grams).alias("gram")
    )
    bench = (
        t.documents.filter(F.col("source") == "src0")
        .select(F.explode(grams).alias("gram"))
        .distinct()
    )
    hits = train.join(bench.withColumn("hit", F.lit(1)), "gram", "left")
    return hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hit"),
        (
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("double")
            / F.count(F.lit(1))
        ).alias("containment"),
    )
