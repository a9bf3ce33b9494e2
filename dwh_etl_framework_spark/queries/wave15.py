"""Round-9 wave 15: fuzzy entity resolution and ranked retrieval.

**x99_edit_distance_join** — the PassJoin-lite segment-pigeonhole join
(operators/editjoin.py): every customer-name pair within levenshtein
distance 1, found WITHOUT the O(n²) name cross-product. The oracle IS
the naive self-join, so the driver's hash certifies the segment filter
lossless (the x94 proof pattern applied to edit distance). This is the
entity-resolution primitive the reference's journal-merge protocol
(airflow_etl.py:131-223) presupposes clean keys for — real warehouses
run fuzzy name/address matching first, and the reference has no fuzzy
tier at all.

**x100_bm25_topk** — BM25 ranked retrieval (Robertson/Spärck Jones
Okapi BM25) over the documents corpus for a fixed query, the targeted
subset-selection primitive of a training-data pipeline ("give me the
top-k docs about X"). Float determinism (the registry rules): the only
cross-row reductions are integer COUNTs and a conditional MAX — the
per-term scores combine in ONE fixed-order scalar addition, so both
engines evaluate the identical IEEE expression tree. The idf uses the
raw Robertson ratio (N-df+0.5)/(df+0.5) WITHOUT the log wrapper — libm
log is not bit-portable across engines (the x15 rule); log is monotone,
so ranking is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dwh_etl_framework_spark.operators import editjoin
from dwh_etl_framework_spark.queries.registry import fixtures, query

_EDIT_JOIN_SQL = """
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS dist
    FROM customer a
    JOIN customer b
      ON a.c_custkey < b.c_custkey
     AND levenshtein(a.c_name, b.c_name) <= 1
    """


@query("x99_edit_distance_join", oracle=_EDIT_JOIN_SQL)
def x99_edit_distance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 fuzzy entity resolution: all customer-name pairs within edit

    distance 1 via the segment-pigeonhole filter — index k+1=2 segments
    per name, probe substrings in a ±1 position window, verify one JVM
    levenshtein per DISTINCT candidate. The oracle is the naive O(n²)
    levenshtein self-join: hash equality proves the filter drops no
    qualifying pair. Uncapped (``max_segment_df=None``) — the TPC-H
    constant ``Customer#`` prefix makes segment 0 corpus-degenerate,
    exactly the adversarial shape the cap exists for, and the oracled
    entry must fail loudly rather than silently change contract."""
    t = fixtures(spark, sf_dir)
    return editjoin.edit_distance_pairs(t.customer, "c_name", "c_custkey", k=1)


_EDIT_JOIN_SAMPLED_SQL = """
    WITH c AS (SELECT * FROM customer WHERE c_custkey % 100 = 0)
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS dist
    FROM c a
    JOIN c b
      ON a.c_custkey < b.c_custkey
     AND levenshtein(a.c_name, b.c_name) <= 1
    """


@query("x99s_edit_join_sampled", oracle=_EDIT_JOIN_SAMPLED_SQL)
def x99s_edit_join_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 sf1 twin of x99 (the x02s convention): the same uncapped

    segment-pigeonhole join over the ``c_custkey % 100 = 0`` customer
    sample, so the naive oracle stays DuckDB-sized at sf1 (1.5k names →
    ~1.1M verify pairs) while the operator's scale evidence — segment
    keys shuffle, names never cross-product — is exercised on sf1's
    wider key space (SF1_EXCLUDED maps x99 here)."""
    t = fixtures(spark, sf_dir)
    sample = t.customer.filter(F.col("c_custkey") % 100 == 0)
    return editjoin.edit_distance_pairs(sample, "c_name", "c_custkey", k=1)


#: BM25 parameters (the Robertson defaults) and the fixed query terms.
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TERMS = ("spark", "merge", "window")

_BM25_SQL = """
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    dl AS (
        SELECT doc_id, COUNT(*) AS n_tokens FROM toks GROUP BY doc_id
    ),
    stats AS (
        SELECT COUNT(*) AS n_docs, SUM(n_tokens) AS tot FROM dl
    ),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS tf
        FROM toks WHERE term IN ('spark', 'merge', 'window')
        GROUP BY doc_id, term
    ),
    df AS (
        SELECT term, COUNT(*) AS doc_freq FROM tf GROUP BY term
    ),
    scored AS (
        SELECT t.doc_id, t.term,
               ((CAST(s.n_docs - d.doc_freq AS DOUBLE) + 0.5)
                    / (CAST(d.doc_freq AS DOUBLE) + 0.5))
               * ((CAST(t.tf AS DOUBLE) * 2.2)
                    / (CAST(t.tf AS DOUBLE)
                       + 1.2 * (0.25 + 0.75 * (CAST(l.n_tokens AS DOUBLE)
                            / (CAST(s.tot AS DOUBLE) / s.n_docs)))))
                   AS score
        FROM tf t
        JOIN dl l ON t.doc_id = l.doc_id
        JOIN df d ON t.term = d.term
        CROSS JOIN stats s
    ),
    pivoted AS (
        SELECT doc_id,
               COALESCE(MAX(CASE WHEN term = 'spark' THEN score END), 0.0)
                   AS s_spark,
               COALESCE(MAX(CASE WHEN term = 'merge' THEN score END), 0.0)
                   AS s_merge,
               COALESCE(MAX(CASE WHEN term = 'window' THEN score END), 0.0)
                   AS s_window
        FROM scored GROUP BY doc_id
    ),
    ranked AS (
        SELECT p.doc_id, l.n_tokens, p.s_spark, p.s_merge, p.s_window,
               (p.s_spark + p.s_merge) + p.s_window AS bm25,
               row_number() OVER (
                   ORDER BY (p.s_spark + p.s_merge) + p.s_window DESC,
                            p.doc_id
               ) AS rk
        FROM pivoted p JOIN dl l ON p.doc_id = l.doc_id
    )
    SELECT doc_id, n_tokens, s_spark, s_merge, s_window, bm25,
           CAST(rk AS INTEGER) AS rk
    FROM ranked WHERE rk <= 20
    """


@query("x100_bm25_topk", oracle=_BM25_SQL)
def x100_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 BM25 ranked retrieval: top-20 documents for the fixed query

    {spark, merge, window}, k1=1.2, b=0.75, raw-ratio idf (no log —
    bit-portability, the x15 rule). Scale shape: the corpus explode is
    consumed ONCE into the tf table (lineage cut); doc lengths derive
    from a digest-free count; the 3-row df table broadcasts; the final
    top-20 is one window over docs-that-match-any-term, which the
    optimizer runs as a WindowGroupLimit. Float determinism: the only
    double reduction is a conditional MAX (order-insensitive); the
    per-term scores add in one fixed-order scalar expression."""
    t = fixtures(spark, sf_dir)
    toks = t.documents.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    # one pass over the corpus: per-doc total counts, then the term-
    # filtered tf — both derive from the same explode, materialized once
    counts = (
        toks.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    dl = counts.groupBy("doc_id").agg(F.sum("tf").alias("n_tokens"))
    tf = counts.filter(F.col("term").isin(*_BM25_TERMS))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("tot")
    ).first()
    n_docs, tot = int(stats["n_docs"]), int(stats["tot"])
    avgdl = float(tot) / n_docs  # exact int sum, ONE double division

    k1, b = _BM25_K1, _BM25_B
    idf = (
        (F.lit(n_docs) - F.col("doc_freq")).cast("double") + F.lit(0.5)
    ) / (F.col("doc_freq").cast("double") + F.lit(0.5))
    norm = (F.col("tf").cast("double") * F.lit(k1 + 1.0)) / (
        F.col("tf").cast("double")
        + F.lit(k1)
        * (
            F.lit(1.0 - b)
            + F.lit(b) * (F.col("n_tokens").cast("double") / F.lit(avgdl))
        )
    )
    scored = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(df_), "term")
        .select("doc_id", "term", (idf * norm).alias("score"))
    )

    def term_col(term: str):
        return F.coalesce(
            F.max(F.when(F.col("term") == term, F.col("score"))),
            F.lit(0.0),
        ).alias(f"s_{term}")

    pivoted = scored.groupBy("doc_id").agg(*[term_col(tm) for tm in _BM25_TERMS])
    bm25 = (F.col("s_spark") + F.col("s_merge")) + F.col("s_window")
    w = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    return (
        pivoted.join(dl, "doc_id")
        .withColumn("bm25", bm25)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 20)
        .select("doc_id", "n_tokens", "s_spark", "s_merge", "s_window", "bm25", "rk")
    )
