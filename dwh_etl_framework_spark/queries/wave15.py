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

**x100_hybrid_rrf** — hybrid retrieval via reciprocal-rank fusion
(Cormack/Clarke/Büttcher, SIGIR 2009): the sparse ranking (x69's
integer-exact BM25) and the dense ranking (x05's decimal-exact cosine
vs the vec_id=0 query vector) fused as Σ 1/(60+rank). This is the
retrieval shape a modern training-data pipeline actually runs —
keyword recall OR semantic recall alone each miss documents the other
finds; RRF is the standard parameter-free combiner. Both input
rankings are already bit-portable (integer bm25_ppm; fixed-point dot
products with IEEE-exact sqrt/div), ranks are integers, and the fused
score is two single divisions added in ONE fixed order — the whole
composition hashes across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dwh_etl_framework_spark.operators import editjoin, similarity
from dwh_etl_framework_spark.queries.registry import fixtures, query
from dwh_etl_framework_spark.queries.wave7 import BM25_TERMS

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


_EDIT_VALUES_SQL = """
    WITH vals AS (
        SELECT p_name AS v, CAST(COUNT(*) AS BIGINT) AS n
        FROM part GROUP BY p_name
    )
    SELECT a.v AS val_a, b.v AS val_b,
           CAST(levenshtein(a.v, b.v) AS INTEGER) AS dist,
           a.n AS n_a, b.n AS n_b, a.n * b.n AS n_pairs
    FROM vals a
    JOIN vals b
      ON a.v < b.v AND levenshtein(a.v, b.v) <= 1
    """


@query("x99b_edit_join_values", oracle=_EDIT_VALUES_SQL)
def x99b_edit_join_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 value-level fuzzy matching — the 100 TB shape for dirty

    low-cardinality columns: collapse to DISTINCT part names first (one
    map-side-combinable aggregate; edit distance depends only on the
    values), run the segment-pigeonhole join over the value universe,
    and carry multiplicities (``n_pairs`` = the row-pair count the
    id-level expansion would emit). Distinct-first keeps the whole
    pipeline linear in vocabulary + qualifying value pairs no matter how
    many rows share each value — the id-level x99 over the same column
    would be quadratic in cluster sizes BY DEFINITION (3.9M row pairs at
    sf0.1 from 64 distinct names). The oracle is the naive levenshtein
    self-join over the distinct values, so the hash again certifies the
    filter lossless."""
    t = fixtures(spark, sf_dir)
    return editjoin.edit_distance_value_pairs(t.part, "p_name", k=1)


#: RRF depth (how deep each ranking contributes) and the fused top-k.
_RRF_DEPTH = 50
_RRF_K = 60  # the SIGIR-2009 constant
_RRF_TOPK = 20

_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_TERMS)

#: sparse half = x69's integer-exact BM25 oracle verbatim (wave7.py),
#: restricted to doc_id <> 0 so both rankings rank the same universe
#: (vec 0 IS the dense query); dense half = x05's fixed-point cosine
#: oracle generalized to depth 50. Fusion: full outer join of the two
#: rank lists, Σ 1/(60+rank), missing side contributes 0.
_RRF_SQL = f"""
    WITH toks AS (
        SELECT doc_id,
               len(string_split(text, ' ')) AS dl,
               unnest(string_split(text, ' ')) AS tok
        FROM documents WHERE doc_id <> 0
    ),
    tf AS (
        SELECT doc_id, MAX(dl) AS dl, tok, CAST(COUNT(*) AS BIGINT) AS tf
        FROM toks WHERE tok IN ({_BM25_TERMS_SQL})
        GROUP BY doc_id, tok
    ),
    corpus AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
                   // CAST(COUNT(*) AS BIGINT) AS avgdl_fp
        FROM documents WHERE doc_id <> 0
    ),
    idf AS (
        SELECT tok,
               (2 * c.n_docs - 2 * COUNT(DISTINCT doc_id) + 1) * 1000000
                   // (2 * COUNT(DISTINCT doc_id) + 1) AS idf_ppm
        FROM tf, corpus c
        GROUP BY tok, c.n_docs
    ),
    bm25 AS (
        SELECT tf.doc_id,
               CAST(SUM(idf.idf_ppm * 22 * tf.tf * c.avgdl_fp
                   // (10 * tf.tf * c.avgdl_fp + 3 * c.avgdl_fp + 9 * tf.dl)
               ) AS BIGINT) AS bm25_ppm
        FROM tf JOIN idf USING (tok), corpus c
        GROUP BY tf.doc_id
    ),
    sparse AS (
        SELECT doc_id,
               CAST(row_number() OVER (ORDER BY bm25_ppm DESC, doc_id ASC)
                    AS INTEGER) AS rank_sparse
        FROM bm25
        ORDER BY rank_sparse LIMIT {_RRF_DEPTH}
    ),
    q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
    e_exp AS (
        SELECT vec_id, embedding,
               unnest(generate_series(1, len(embedding))) AS i
        FROM embeddings WHERE vec_id <> 0
    ),
    dots AS (
        SELECT e.vec_id,
               SUM(CAST(floor(CAST(e.embedding[i] AS DOUBLE)
                              * CAST(q.qe[i] AS DOUBLE) * 1e12) AS BIGINT)) AS dot,
               SUM(CAST(floor(CAST(e.embedding[i] AS DOUBLE)
                              * CAST(e.embedding[i] AS DOUBLE) * 1e12) AS BIGINT)) AS na
        FROM e_exp e, q
        GROUP BY 1
    ),
    qn AS (
        SELECT SUM(CAST(floor(CAST(qe[i] AS DOUBLE)
                              * CAST(qe[i] AS DOUBLE) * 1e12) AS BIGINT)) AS nb
        FROM (SELECT qe, unnest(generate_series(1, len(qe))) AS i FROM q)
    ),
    dense AS (
        SELECT vec_id AS doc_id,
               CAST(row_number() OVER (
                   ORDER BY CAST(dot AS DOUBLE)
                       / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE)))
                       DESC, vec_id ASC) AS INTEGER) AS rank_dense
        FROM dots, qn
        ORDER BY rank_dense LIMIT {_RRF_DEPTH}
    ),
    fused AS (
        SELECT COALESCE(s.doc_id, d.doc_id) AS doc_id,
               s.rank_sparse, d.rank_dense,
               COALESCE(1.0 / CAST({_RRF_K} + s.rank_sparse AS DOUBLE), 0.0)
                   + COALESCE(1.0 / CAST({_RRF_K} + d.rank_dense AS DOUBLE), 0.0)
                   AS rrf_score
        FROM sparse s FULL OUTER JOIN dense d ON s.doc_id = d.doc_id
    )
    SELECT doc_id, rank_sparse, rank_dense, rrf_score,
           CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id ASC)
                AS INTEGER) AS rk
    FROM fused
    ORDER BY rk LIMIT {_RRF_TOPK}
    """


@query("x100_hybrid_rrf", oracle=_RRF_SQL)
def x100_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2/X3 hybrid retrieval: reciprocal-rank fusion of the sparse

    (x69 integer-exact BM25, terms {vector, stream, spark}) and dense
    (x05 decimal-exact cosine vs the vec_id=0 query vector) rankings,
    each to depth 50, fused as Σ 1/(60+rank) and cut to the top 20.
    Keyword-only retrieval misses semantic matches and vice versa; RRF
    is the standard parameter-free combiner (Cormack et al., SIGIR'09).
    Scale shape: both rankings end in TakeOrderedAndProject (depth-50
    cut, no global sort of the corpus); the fusion joins two 50-row
    tables — driver-trivial regardless of corpus size. Determinism:
    integer bm25_ppm, fixed-point dots with IEEE-exact sqrt/division,
    integer ranks, and the fused score is two single divisions added in
    one fixed order — the x15/x69 bit-portability rules end to end."""
    t = fixtures(spark, sf_dir)
    docs = t.documents.filter(F.col("doc_id") != 0)

    # ---- sparse half: x69's integer BM25 (wave7.py expressions) ----
    toks = docs.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("dl"),
        F.explode(F.split("text", " ")).alias("tok"),
    ).filter(F.col("tok").isin(*BM25_TERMS))
    tf = toks.groupBy("doc_id", "tok").agg(
        F.max("dl").alias("dl"), F.count(F.lit(1)).alias("tf")
    ).localCheckpoint(eager=False)
    corpus = docs.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.expr(
            "CAST(SUM(size(split(text, ' '))) AS BIGINT) DIV COUNT(*)"
        ).alias("avgdl_fp"),
    ).localCheckpoint(eager=False)
    idf = (
        tf.crossJoin(F.broadcast(corpus))
        .groupBy("tok", "n_docs")
        .agg(F.countDistinct("doc_id").alias("df"))
        .select(
            "tok",
            F.expr(
                "(2 * n_docs - 2 * df + 1) * 1000000 DIV (2 * df + 1)"
            ).alias("idf_ppm"),
        )
    )
    bm25 = (
        tf.join(F.broadcast(idf), "tok")
        .crossJoin(F.broadcast(corpus))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.expr(
                    "idf_ppm * 22 * tf * avgdl_fp"
                    " DIV (10 * tf * avgdl_fp + 3 * avgdl_fp + 9 * dl)"
                )
            ).cast("long").alias("bm25_ppm")
        )
    )
    sparse = (
        bm25.orderBy(F.desc("bm25_ppm"), F.asc("doc_id"))
        .limit(_RRF_DEPTH)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.desc("bm25_ppm"), F.asc("doc_id")))
            .alias("rank_sparse"),
        )
    )

    # ---- dense half: x05's decimal-exact cosine, depth 50 ----
    qv = t.embeddings.filter(F.col("vec_id") == 0)
    dense = (
        similarity.brute_force_topk(
            t.embeddings.filter(F.col("vec_id") != 0), qv,
            k=_RRF_DEPTH, exact=True,
        )
        .select(
            F.col("vec_id").alias("doc_id"),
            F.row_number()
            .over(Window.orderBy(F.desc("cosine_sim"), F.asc("vec_id")))
            .alias("rank_dense"),
        )
    )

    # ---- fusion: two ≤50-row tables, Σ 1/(60+rank) ----
    rrf = F.coalesce(
        F.lit(1.0) / (F.lit(_RRF_K) + F.col("rank_sparse")).cast("double"),
        F.lit(0.0),
    ) + F.coalesce(
        F.lit(1.0) / (F.lit(_RRF_K) + F.col("rank_dense")).cast("double"),
        F.lit(0.0),
    )
    fused = (
        sparse.join(dense, "doc_id", "full_outer")
        .withColumn("rrf_score", rrf)
    )
    return (
        fused.withColumn(
            "rk",
            F.row_number().over(Window.orderBy(F.desc("rrf_score"), F.asc("doc_id"))),
        )
        .filter(F.col("rk") <= _RRF_TOPK)
        .select("doc_id", "rank_sparse", "rank_dense", "rrf_score", "rk")
    )
