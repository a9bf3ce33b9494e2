"""Document chunking and corpus-statistics LM scoring (SURVEY.md §2c X3 /
north-star training-data ops).

Two operators a pretraining pipeline runs right after curation:

- **x38_doc_chunking** — fixed token-window chunking with overlap, the
  step that turns variable-length documents into model-context-sized
  training rows. Pure array expressions (split → sequence of starts →
  posexplode → slice), whole-stage-codegen'd: at 100 TB this is a
  map-only pass with zero shuffles — the output explodes ~n_tokens/stride
  rows per doc but never leaves its input partition.
- **x39_bigram_lm_score** — corpus-frequency language-model scoring:
  every document scored by the mean corpus frequency of its bigrams
  (low score = atypical/noisy text — the cheap statistical stand-in for
  a trained-LM perplexity filter). All arithmetic is exact integers
  (counts and integer division at micro precision), so the score is
  bit-identical across engines and partitionings.

Document text is single-space-separated tokens (see text_ops.py), so
``split(text, ' ')`` tokenization is identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dwh_etl_framework_spark.queries.registry import fixtures, query

#: chunk geometry: 32-token windows starting every 24 tokens (8-token
#: overlap keeps context across chunk boundaries)
CHUNK_TOKENS = 32
CHUNK_STRIDE = 24


@query(
    "x38_doc_chunking",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS w,
               len(string_split(text, ' ')) AS n
        FROM documents
    ),
    starts AS (
        SELECT doc_id, w, n, unnest(generate_series(1, n, {CHUNK_STRIDE})) AS start
        FROM toks
    )
    SELECT doc_id,
           CAST((start - 1) // {CHUNK_STRIDE} AS INTEGER) AS chunk_idx,
           array_to_string(w[start:least(start + {CHUNK_TOKENS - 1}, n)], ' ')
               AS chunk_text,
           CAST(least(start + {CHUNK_TOKENS - 1}, n) - start + 1 AS INTEGER)
               AS n_chunk_tokens
    FROM starts
    """,
)
def x38_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 token-window chunking: split each document into 32-token chunks

    every 24 tokens (8-token overlap). Start offsets come from
    ``sequence(1, n_tokens, stride)`` and each chunk is a ``slice`` of the
    token array — all JVM array expressions, no UDFs, no shuffle: the
    explode multiplies rows in place, so at 100 TB this is a map-only
    pass whose output is written back partition-local (chunk rows inherit
    the parent doc's partition)."""
    t = fixtures(spark, sf_dir)
    toks = F.split("text", " ")
    starts = F.sequence(F.lit(1), F.size(toks), F.lit(CHUNK_STRIDE))
    exploded = t.documents.select(
        "doc_id",
        toks.alias("__w"),
        F.posexplode(starts).alias("chunk_idx", "__start"),
    )
    chunk = F.slice(F.col("__w"), F.col("__start"), CHUNK_TOKENS)
    return exploded.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).cast("int").alias("n_chunk_tokens"),
    )


@query(
    "x39_bigram_lm_score",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    bg AS (
        SELECT doc_id, w[i] || ' ' || w[i + 1] AS bigram
        FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS i
              FROM toks WHERE len(w) >= 2)
    ),
    cnt AS (SELECT bigram, COUNT(*) AS c FROM bg GROUP BY bigram),
    doc AS (
        SELECT bg.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               CAST(SUM(cnt.c) AS BIGINT) AS bigram_freq_sum
        FROM bg JOIN cnt USING (bigram) GROUP BY bg.doc_id
    )
    SELECT doc_id, n_bigrams, bigram_freq_sum,
           CAST((bigram_freq_sum * 1000000) // n_bigrams AS BIGINT)
               AS score_micro
    FROM doc
    """,
)
def x39_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 corpus-statistics LM scoring: score_micro = mean corpus frequency

    of the document's bigrams, in exact micro units (floor(1e6·Σcnt/n) via
    integer division — engine-portable, unlike float log-prob sums). Low
    score ⇒ bigrams rarely seen elsewhere ⇒ likely noise; the cheap,
    trainable-artifact-free stand-in for a perplexity filter.

    Docs under 2 tokens produce no bigrams and are excluded (same
    short-doc guard as x28; the DuckDB oracle drops them identically).

    Scale shape: one explode (map-only) feeds (a) the bigram-count
    aggregate — map-side partial combine, one shuffle on bigram — and
    (b) the frequency-lookup join, also keyed on bigram, so AQE can reuse
    the exchange; then one per-doc aggregate. At 100 TB the count table is
    vocabulary²-bounded and heavily skew-free (bigrams hash-distribute
    well); a trimmed top-K count table would broadcast instead."""
    t = fixtures(spark, sf_dir)
    toks = F.split("text", " ")
    docs = t.documents.filter(F.size(toks) >= 2).select(
        "doc_id", toks.alias("__w")
    )
    bigrams = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("__w") - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at("__w", i), F.element_at("__w", i + 1)
                ),
            )
        ).alias("bigram"),
        # round-7 lineage cut (x65/x87 rule): bigrams feeds the count
        # aggregate AND the lookup join — uncut, the split+transform+
        # explode subtree is cloned and documents.parquet scans twice.
        # A/B MEASURED the cut 1.6x faster at sf1 (3.4s vs 5.5s warm):
        # the per-position concat transform dominates, so materializing
        # the bigram table wins (the x87 pattern).
    ).localCheckpoint(eager=False)
    counts = bigrams.groupBy("bigram").agg(
        F.count(F.lit(1)).alias("__c")
    )
    return (
        bigrams.join(counts, on="bigram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.sum("__c").cast("bigint").alias("bigram_freq_sum"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "bigram_freq_sum",
            F.expr("(bigram_freq_sum * 1000000) div n_bigrams")
            .cast("bigint")
            .alias("score_micro"),
        )
    )


#: x51: collocations need at least this many occurrences (PMI of rare
#: pairs is noise) and the report keeps the top-K scored pairs.
PMI_MIN_COUNT = 5
PMI_TOP_K = 100


@query(
    "x51_token_pmi",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    uni AS (
        SELECT unnest(w) AS tok FROM toks
    ),
    uc AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS c FROM uni GROUP BY tok
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM uni),
    bg AS (
        SELECT w[i] AS tok_a, w[i + 1] AS tok_b
        FROM (
            SELECT w, unnest(generate_series(1, len(w) - 1)) AS i
            FROM toks WHERE len(w) >= 2
        )
    ),
    bc AS (
        SELECT tok_a, tok_b, CAST(count(*) AS BIGINT) AS c_ab
        FROM bg GROUP BY tok_a, tok_b
        HAVING count(*) >= {PMI_MIN_COUNT}
    )
    SELECT tok_a, tok_b, c_ab,
           CAST(CAST(bc.c_ab AS HUGEINT) * n.n * 1000000
                // (CAST(ua.c AS HUGEINT) * ub.c) AS BIGINT) AS pmi_ratio_fp
    FROM bc, n
    JOIN uc ua ON ua.tok = bc.tok_a
    JOIN uc ub ON ub.tok = bc.tok_b
    ORDER BY pmi_ratio_fp DESC, tok_a, tok_b
    LIMIT {PMI_TOP_K}
    """,
)
def x51_token_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 collocation extraction: the top-100 adjacent token pairs by a

    PMI-style lift ratio — P(a,b)/(P(a)P(b)) as the exact integer
    ``c_ab·N·10⁶ / (c_a·c_b)`` (log-free: libm log differs across
    engines at the last ulp, the rational score is bit-exact; the
    ordering is the same because log is monotone). Pairs under 5
    occurrences are dropped (rare-pair PMI is noise). The corpus-stat
    a curation pipeline mines for boilerplate phrases and multi-word
    expressions worth protecting during tokenization.

    Scale shape: the unigram-count table is vocabulary-sized and
    broadcasts onto the (already aggregated, HAVING-trimmed) bigram
    table twice; the wide exchanges are the two count aggregates, both
    map-side combinable; the final top-100 is TakeOrderedAndProject
    (per-partition heads merged on the driver), never a global sort.
    128-bit intermediates (DECIMAL(38,0) / HUGEINT) keep ``c_ab·N·10⁶``
    exact at any corpus size — it overflows BIGINT past N≈3·10⁶ tokens."""
    t = fixtures(spark, sf_dir)
    toks = F.split("text", " ")
    docs = t.documents.select("doc_id", toks.alias("__w"))
    uni = docs.select(F.explode("__w").alias("tok"))
    # lineage cut (the x65 rule): uc feeds THREE consumers (ua, ub,
    # n_total) — uncut, Catalyst clones the corpus explode per consumer
    # (4 text scans, plan-audited round 6). n_total = Σc over the
    # vocabulary table: same value as counting the explode, zero scans.
    uc = (
        uni.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    n_total = uc.agg(F.sum("c").alias("n"))
    bc = (
        docs.filter(F.size("__w") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("__w") - 1),
                    lambda i: F.struct(
                        F.element_at("__w", i).alias("tok_a"),
                        F.element_at("__w", i + 1).alias("tok_b"),
                    ),
                )
            ).alias("p")
        )
        .select("p.tok_a", "p.tok_b")
        .groupBy("tok_a", "tok_b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= PMI_MIN_COUNT)
    )
    ua = uc.select(F.col("tok").alias("tok_a"), F.col("c").alias("c_a"))
    ub = uc.select(F.col("tok").alias("tok_b"), F.col("c").alias("c_b"))
    scored = (
        bc.join(F.broadcast(ua), "tok_a")
        .join(F.broadcast(ub), "tok_b")
        .crossJoin(F.broadcast(n_total))
        .select(
            "tok_a",
            "tok_b",
            "c_ab",
            F.expr(
                "CAST(CAST(c_ab AS DECIMAL(38,0)) * n * 1000000"
                " div (CAST(c_a AS DECIMAL(38,0)) * c_b) AS BIGINT)"
            ).alias("pmi_ratio_fp"),
        )
    )
    return scored.orderBy(
        F.desc("pmi_ratio_fp"), "tok_a", "tok_b"
    ).limit(PMI_TOP_K)
