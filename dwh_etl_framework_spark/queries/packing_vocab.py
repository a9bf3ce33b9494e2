"""Sequence packing, cross-document n-gram duplication, vocabulary coverage
(SURVEY.md §2c X1/X3 / north-star training-data ops).

Three operators a pretraining pipeline runs between curation and
tokenization:

- **x44_sequence_pack** — concat-and-cut example packing: documents are
  concatenated per source stream in doc_id order and cut into fixed
  token-budget training sequences; each document reports the pack it
  starts in, its token offset inside that pack, and whether it straddles
  a pack boundary. One window cumsum per source partition — at 100 TB
  the shuffle is keyed on the (bounded-cardinality) source column and the
  arithmetic never leaves the partition.
- **x45_dup_ngram_rate** — cross-document duplicate n-gram rate (the
  Gopher/RefinedWeb corpus-repetition signal): the fraction of each
  document's distinct 5-gram shingles that also occur in at least one
  OTHER document. Complements x28 (repetition WITHIN a doc) — this is
  repetition ACROSS the corpus, the signal that catches boilerplate and
  template farms that per-doc metrics miss. Shingle-keyed shuffle whose
  key space is bounded by the distinct-shingle vocabulary (Zipf ≪ corpus).
- **x46_lang_vocab_confidence** — language-vocabulary coverage: the
  per-language top-100 token vocabulary (by corpus frequency), then each
  document scored by the ppm fraction of its tokens inside its own
  language's vocabulary. A low score flags mislabeled-language or
  noise documents (the cheap stand-in for a lang-ID confidence model).
  The vocabulary is |langs|×100 rows → broadcast join; exact integer ppm.

All reductions are BIGINT (bit-identical across engines/partitionings);
document text is single-space-separated tokens (see text_ops.py), so
``split(text, ' ')`` ≡ DuckDB ``string_split``.

Reference parity note: the reference (airflow_etl.py) has no LLM-pipeline
tier at all — these extend the engine beyond it, per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dwh_etl_framework_spark.queries.registry import fixtures, query

#: x44 geometry: 2048-token training sequences (a typical context budget).
PACK_TOKENS = 2048

#: x45 shingle width (the classic 5-gram duplication signal).
DUP_NGRAM = 5

#: x46 vocabulary size per language.
VOCAB_K = 100


@query(
    "x44_sequence_pack",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    cum AS (
        SELECT doc_id, source, n_tokens,
               COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS cum_before
        FROM toks
    )
    SELECT doc_id, source, n_tokens,
           CAST(cum_before // {PACK_TOKENS} AS BIGINT) AS pack_id,
           CAST(cum_before % {PACK_TOKENS} AS BIGINT) AS pack_offset,
           (cum_before // {PACK_TOKENS})
               <> ((cum_before + n_tokens - 1) // {PACK_TOKENS})
               AS spans_packs
    FROM cum
    """,
)
def x44_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 concat-and-cut sequence packing: per source stream (doc_id order)

    documents are laid end-to-end and cut every 2048 tokens; each doc
    reports its starting pack, offset, and whether it straddles a cut.
    One running-sum window partitioned by source — the packing decision
    for a document depends only on the tokens before it in its own
    stream, so the operator is deterministic under any executor layout
    and needs exactly one shuffle (on source)."""
    t = fixtures(spark, sf_dir)
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = t.documents.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    ).withColumn("cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    b = F.lit(PACK_TOKENS)
    return cum.select(
        "doc_id",
        "source",
        "n_tokens",
        F.expr(f"cum_before div {PACK_TOKENS}").alias("pack_id"),
        (F.col("cum_before") % b).alias("pack_offset"),
        (
            F.expr(f"cum_before div {PACK_TOKENS}")
            != F.expr(f"(cum_before + n_tokens - 1) div {PACK_TOKENS}")
        ).alias("spans_packs"),
    )


@query(
    "x45_dup_ngram_rate",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS w,
               len(string_split(text, ' ')) AS n
        FROM documents
        WHERE len(string_split(text, ' ')) >= {DUP_NGRAM}
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               array_to_string(
                   w[start:start + {DUP_NGRAM - 1}], ' ') AS shingle
        FROM (
            SELECT doc_id, w,
                   unnest(generate_series(1, n - {DUP_NGRAM - 1})) AS start
            FROM toks
        )
    ),
    df AS (
        SELECT shingle, CAST(count(*) AS BIGINT) AS n_docs
        FROM sh GROUP BY shingle
    )
    SELECT sh.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN df.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_shared,
           CAST(sum(CASE WHEN df.n_docs > 1 THEN 1 ELSE 0 END) * 1000000
                // count(*) AS BIGINT) AS shared_ppm
    FROM sh JOIN df ON df.shingle = sh.shingle
    GROUP BY sh.doc_id
    """,
)
def x45_dup_ngram_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 cross-document duplicate 5-gram rate: for each document (≥5

    tokens), the count and ppm fraction of its distinct 5-gram shingles
    that occur in at least one other document — the corpus-level
    boilerplate signal per-doc repetition metrics (x28) cannot see.

    Scale shape: distinct (doc, shingle) pairs explode once; the shingle
    document-frequency table groups on the shingle key (vocabulary-sized,
    Zipf ≪ corpus) and joins back on the same key, so the exchange is
    reused; integer ppm at the end keeps the result engine-exact."""
    t = fixtures(spark, sf_dir)
    toks = t.documents.select(
        "doc_id", F.split("text", " ").alias("w")
    ).withColumn("n", F.size("w")).filter(F.col("n") >= DUP_NGRAM)
    sh = toks.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.col("n") - (DUP_NGRAM - 1)),
                    lambda s: F.concat_ws(" ", F.slice("w", s, DUP_NGRAM)),
                )
            )
        ).alias("shingle"),
        # round-7 audit: sh feeds the df aggregate AND the join-back, so
        # Catalyst clones the explode subtree (2 parquet scans) — but the
        # A/B MEASURED the localCheckpoint cut SLOWER at both SFs
        # (sf1 warm 9.0s uncut vs 10.3s cut): materializing the wide
        # (doc_id, 5-gram) table costs more than re-running the explode.
        # Unlike x87 (md5-heavy subtree, cut wins 2x) the clone stays.
    )
    df = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("n_docs"))
    shared = F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0)).cast("bigint")
    return (
        sh.join(df, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            shared.alias("n_shared"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_shared",
            F.expr("n_shared * 1000000 div n_shingles").alias("shared_ppm"),
        )
    )


@query(
    "x46_lang_vocab_confidence",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
        FROM documents
    ),
    freq AS (
        SELECT lang, tok, CAST(count(*) AS BIGINT) AS cnt
        FROM tok GROUP BY lang, tok
    ),
    vocab AS (
        SELECT lang, tok FROM (
            SELECT lang, tok,
                   row_number() OVER (
                       PARTITION BY lang ORDER BY cnt DESC, tok ASC
                   ) AS rn
            FROM freq
        ) WHERE rn <= {VOCAB_K}
    )
    SELECT t.doc_id,
           any_value(t.lang) AS lang,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN v.tok IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_in_vocab,
           CAST(sum(CASE WHEN v.tok IS NOT NULL THEN 1 ELSE 0 END) * 1000000
                // count(*) AS BIGINT) AS in_vocab_ppm
    FROM tok t
    LEFT JOIN vocab v ON v.lang = t.lang AND v.tok = t.tok
    GROUP BY t.doc_id
    """,
)
def x46_lang_vocab_confidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 language-vocabulary coverage: build each language's top-100

    token vocabulary by corpus frequency (deterministic tiebreak on the
    token), then score every document by the exact ppm fraction of its
    tokens that fall inside its own language's vocabulary. Low coverage
    flags mislabeled-language or noise documents.

    Scale shape: one (lang, token) partial-agg shuffle builds the
    frequency table; the vocabulary is |langs|×100 rows and broadcasts to
    the per-token probe, so the scoring pass is map-side; final per-doc
    agg shuffles on doc_id. Integer ppm keeps both engines bit-equal."""
    t = fixtures(spark, sf_dir)
    tok = t.documents.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("tok")
        # round-7 audit: tok feeds the frequency aggregate AND the probe
        # (cloned subtree, 2 scans) — the A/B MEASURED the checkpoint cut
        # slower (bench sf0.1 1.43x, sf1 warm 2.6s uncut vs 3.1s cut):
        # a bare token explode re-runs cheaper than its table
        # materializes. The clone stays (contrast x37/x39, where the
        # distinct/bigram transform makes the cut win).
    )
    freq = tok.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    rn = F.row_number().over(
        Window.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("tok"))
    )
    vocab = (
        freq.withColumn("rn", rn)
        .filter(F.col("rn") <= VOCAB_K)
        .select(F.col("lang").alias("vlang"), F.col("tok").alias("vtok"))
    )
    probed = tok.join(
        F.broadcast(vocab),
        (F.col("lang") == F.col("vlang")) & (F.col("tok") == F.col("vtok")),
        "left",
    ).select("doc_id", "lang", "tok", "vtok")
    hit = F.sum(F.when(F.col("vtok").isNotNull(), 1).otherwise(0)).cast("bigint")
    return (
        probed.groupBy("doc_id")
        .agg(
            F.any_value(F.col("lang")).alias("lang"),
            F.count(F.lit(1)).alias("n_tokens"),
            hit.alias("n_in_vocab"),
        )
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            "n_in_vocab",
            F.expr("n_in_vocab * 1000000 div n_tokens").alias("in_vocab_ppm"),
        )
    )
