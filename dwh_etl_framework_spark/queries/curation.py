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

from pyspark.sql import DataFrame, SparkSession, Window
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
    # round-7 lineage cut (x65/x87 rule): fp feeds the survivor aggregate
    # AND the join-back — uncut, the normalize+md5 over the full text runs
    # twice and documents.parquet scans twice. A/B MEASURED the cut 1.8x
    # faster at sf1 (1.8s vs 3.2s warm): full-text regex+md5 is the
    # expensive-subtree case where materializing wins.
    fp = t.documents.withColumn(
        "fingerprint", F.md5(normalize_text(F.col("text")))
    ).localCheckpoint(eager=False)
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


@query(
    "x30_train_test_split",
    oracle="""
    WITH assigned AS (
        SELECT source, n_chars,
               CASE WHEN substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                        THEN 'train'
                    WHEN substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2) < 'f3'
                        THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    )
    SELECT split, source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM assigned GROUP BY split, source
    """,
)
def x30_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-bucketed train/val/test split (~90/5/5 via md5

    hex-prefix thresholds 0xe6/0xf3), audited per source. The assignment is
    a pure function of doc_id — reproducible across engines, runs, repartitions,
    and incremental corpus growth (a new doc never flips an old
    doc's split, unlike percent_rank or sample()). Map-only pass + one
    partial-agg shuffle on (split, source)."""
    t = fixtures(spark, sf_dir)
    h2 = F.substring(
        F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 2
    )
    assigned = t.documents.select(
        "source",
        "n_chars",
        F.when(h2 < "e6", "train").when(h2 < "f3", "val").otherwise("test").alias(
            "split"
        ),
    )
    return assigned.groupBy("split", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


#: per-source sampling rates for x33, expressed as 6-hex-digit md5-prefix
#: thresholds (rate r ⇒ keep docs whose md5 prefix < floor(r·16⁶) as hex).
#: String comparison of hex prefixes is engine-portable; 'zzzzzz' sorts
#: after every hex string ⇒ keep-all.
_SAMPLE_RATES: dict[str, float] = {"src0": 1.0, "src1": 0.5, "src2": 0.25}
_DEFAULT_RATE = 0.125


def _rate_threshold(rate: float) -> str:
    if rate >= 1.0:
        return "zzzzzz"
    return format(int(rate * 16**6), "06x")


@query(
    "x33_stratified_sample",
    oracle=f"""
    SELECT doc_id, source, n_chars
    FROM documents
    WHERE substring(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 6)
          < CASE source
              WHEN 'src0' THEN '{_rate_threshold(1.0)}'
              WHEN 'src1' THEN '{_rate_threshold(0.5)}'
              WHEN 'src2' THEN '{_rate_threshold(0.25)}'
              ELSE '{_rate_threshold(_DEFAULT_RATE)}'
            END
    """,
)
def x33_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 deterministic stratified sampling: each source is downsampled at

    its own rate (the corpus-mixing knob of a pretraining data recipe —
    e.g. keep all of a high-quality source, an eighth of a crawl) by
    comparing a per-doc md5 prefix against the rate's hex threshold.
    Like x30 the assignment is a pure function of doc_id: stable under
    corpus growth, repartitioning, and engine choice — none of which holds
    for ``df.sample()``. Map-only pass; no shuffle at any scale."""
    t = fixtures(spark, sf_dir)
    h6 = F.substring(
        F.md5(F.concat(F.lit("sample:"), F.col("doc_id").cast("string"))), 1, 6
    )
    threshold = None
    for src, rate in _SAMPLE_RATES.items():
        clause = (F.col("source") == src, F.lit(_rate_threshold(rate)))
        threshold = (
            F.when(*clause) if threshold is None else threshold.when(*clause)
        )
    threshold = threshold.otherwise(F.lit(_rate_threshold(_DEFAULT_RATE)))
    return t.documents.filter(h6 < threshold).select(
        "doc_id", "source", "n_chars"
    )


@query(
    "x34_quality_percentile_gate",
    oracle="""
    WITH scored AS (
        SELECT doc_id, source,
               CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                   / len(string_split(text, ' ')) AS uniq_ratio
        FROM documents
    ),
    ranked AS (
        SELECT doc_id, source, uniq_ratio,
               percent_rank() OVER (
                   PARTITION BY source
                   ORDER BY uniq_ratio ASC, doc_id ASC
               ) AS pr
        FROM scored
    )
    SELECT doc_id, source, uniq_ratio, pr
    FROM ranked WHERE pr >= 0.25
    """,
)
def x34_quality_percentile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 relative quality gate: drop each source's bottom quartile by

    lexical diversity (distinct-token ratio) — the "filter relative to the
    source's own distribution" pattern real curation uses when absolute
    thresholds would gut some sources and pass everything in others.
    percent_rank carries RANK semantics over a unique key (ratio, doc_id)
    so both engines agree exactly. One shuffle (per-source window); the
    per-doc scoring is map-side."""
    t = fixtures(spark, sf_dir)
    toks = F.split("text", " ")
    scored = t.documents.select(
        "doc_id",
        "source",
        (
            F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
        ).alias("uniq_ratio"),
    )
    w = Window.partitionBy("source").orderBy(
        F.col("uniq_ratio").asc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("pr", F.percent_rank().over(w))
        .filter(F.col("pr") >= 0.25)
        .select("doc_id", "source", "uniq_ratio", "pr")
    )


@query(
    "x36_token_shards",
    oracle="""
    WITH sized AS (
        SELECT doc_id, source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               md5(CAST(doc_id AS VARCHAR)) AS h
        FROM documents
    ),
    packed AS (
        SELECT doc_id, source, n_tokens,
               CAST(SUM(n_tokens) OVER (
                   PARTITION BY source ORDER BY h ASC, doc_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cum_tokens
        FROM sized
    )
    SELECT doc_id, source, n_tokens, cum_tokens,
           CAST(floor((cum_tokens - n_tokens) / 2000.0) AS BIGINT) AS shard
    FROM packed
    """,
)
def x36_token_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 token-budget shard packing: assign each document to a ~2000-token

    training shard within its source — the step that turns a curated
    corpus into fixed-budget training files. Order is md5(doc_id) (a
    deterministic shuffle, so shards are content-mixed, not ingest-ordered)
    and the shard id is floor(preceding-cumsum / budget): a doc starts a
    new shard when the budget is already consumed. One window shuffle per
    source; at 100 TB you run it per (source, date) partition so no single
    ordering gets huge."""
    t = fixtures(spark, sf_dir)
    sized = t.documents.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("h").asc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        sized.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .withColumn(
            "shard",
            F.floor(
                (F.col("cum_tokens") - F.col("n_tokens")) / F.lit(2000.0)
            ).cast("bigint"),
        )
        .select("doc_id", "source", "n_tokens", "cum_tokens", "shard")
    )


@query(
    "x31_per_source_cap",
    oracle="""
    WITH ranked AS (
        SELECT doc_id, source, n_chars,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5(text) ASC, doc_id ASC
               ) AS rk
        FROM documents
    )
    SELECT doc_id, source, n_chars, CAST(rk AS INTEGER) AS rk
    FROM ranked WHERE rk <= 20
    """,
)
def x31_per_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsampling: cap each source at 20 documents,

    selected by content-hash order (deterministic, unbiased by ingest
    order — md5(text) is a uniform shuffle within the source). The
    rank<=20 filter rewrites to WindowGroupLimit, so each map partition
    prunes to its local top-20 per source BEFORE the shuffle — the same
    skew-robust plan shape as the journal merge (tests/test_skew.py); a
    source with a billion rows ships ~20 rows per upstream partition, not
    a billion."""
    t = fixtures(spark, sf_dir)
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("text")).asc(), F.col("doc_id").asc()
    )
    return (
        t.documents.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 20)
        .select("doc_id", "source", "n_chars", "rk")
    )
