"""Corpus mixing, product quantization, and cross-source overlap
(SURVEY.md §2c X2/X3 north-star training-data ops).

Three operators from the data-recipe layer of a pretraining pipeline:

- **x41_temperature_mix** — temperature-based language rebalancing
  (multinomial sampling with alpha=0.5, the mT5/XLM-R recipe): each
  language is kept at a rate proportional to ``count^(alpha-1)``, i.e.
  ``sqrt(c_min/c_l)``, so the rarest language keeps (almost) everything
  and dominant languages are downsampled toward balance. Selection is a
  pure function of doc_id (md5 threshold, like x33), so the sample is
  stable under corpus growth, repartitioning, and engine choice.
- **x42_product_quantize** — product quantization (PQ): the embedding is
  split into 4 sub-vectors of 16 dims; each sub-vector is coded as the id
  of its nearest codebook centroid (deterministic codebook: the first 16
  vectors, mirroring x06c's IVF coarse codebook). 64 dims × 4 bytes
  become 4 codes — the memory layout ANN systems (FAISS IVFPQ) use at
  100 TB. All distances are fixed-point BIGINT sums (per-element floor
  before the reduction), so assignment ties and totals are
  engine-portable and the whole operator is value-oracled.
- **x43_source_overlap** — pairwise vocabulary Jaccard between sources:
  the corpus-composition diagnostic that tells a recipe author which
  crawls/sources are near-copies of each other before they spend dedup
  compute. Exact integers end-to-end (ppm via integer division).
"""

from __future__ import annotations

from types import SimpleNamespace

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dwh_etl_framework_spark.queries.registry import fixtures, query

#: md5-prefix hash space: 6 hex chars = 16^6 buckets
_HASH_SPACE = 16 ** 6

#: PQ geometry: 64-dim embeddings → 4 sub-vectors × 16 dims, 16 centroids
_PQ_M = 4
_PQ_SUBDIM = 16
_PQ_K = 16


@query(
    "x41_temperature_mix",
    oracle=f"""
    WITH c AS (SELECT lang, COUNT(*) AS cl FROM documents GROUP BY lang),
    m AS (SELECT MIN(cl) AS cmin FROM c),
    r AS (
        SELECT lang,
               CAST(least({_HASH_SPACE - 1}, floor(
                   sqrt(CAST(cmin AS DOUBLE) / CAST(cl AS DOUBLE))
                   * {_HASH_SPACE})) AS BIGINT) AS rate_fp
        FROM c, m
    )
    SELECT d.doc_id, d.lang, r.rate_fp
    FROM documents d JOIN r USING (lang)
    WHERE substring(md5('mix:' || CAST(d.doc_id AS VARCHAR)), 1, 6)
          < lower(lpad(hex(r.rate_fp), 6, '0'))
    """,
)
def x41_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 temperature sampling (alpha=0.5): keep each language at rate

    ``sqrt(c_min/c_l)`` — rare languages kept whole, dominant ones
    downsampled toward balance (the multilingual-mixing recipe of
    mT5/XLM-R, reference parity: SURVEY.md §2c X3 sampling tier). The
    rate is converted to a fixed-point threshold in the md5-prefix hash
    space so the keep decision is an exact string comparison both engines
    evaluate identically; ``sqrt``/``/``/``*`` are all IEEE
    correctly-rounded, so rate_fp is bit-identical too.

    Scale shape: one tiny map-side-combined count shuffle (|langs| rows),
    then the rates table broadcasts onto a map-only filter of the corpus —
    no data shuffle at any corpus size."""
    t = fixtures(spark, sf_dir)
    counts = t.documents.groupBy("lang").agg(F.count(F.lit(1)).alias("cl"))
    # global min via an unpartitioned window over the |langs|-row counts
    # table (not a second corpus scan + cross join): the whole-table window
    # is safe because its input is already aggregate-sized.
    rates = counts.withColumn(
        "cmin", F.min("cl").over(Window.partitionBy())
    ).select(
        "lang",
        F.least(
            F.lit(_HASH_SPACE - 1),
            F.floor(
                F.sqrt(
                    F.col("cmin").cast("double") / F.col("cl").cast("double")
                )
                * _HASH_SPACE
            ),
        )
        .cast("bigint")
        .alias("rate_fp"),
    )
    h6 = F.substring(
        F.md5(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))), 1, 6
    )
    return (
        t.documents.join(F.broadcast(rates), "lang")
        .filter(h6 < F.lower(F.lpad(F.hex(F.col("rate_fp")), 6, "0")))
        .select("doc_id", "lang", "rate_fp")
    )


#: Shared oracle CTE: PQ assignment per (vec_id, subspace) — reused by
#: x42 (encoding) and x53 (code-bucket dedup).
PQ_BEST_CTE = f"""
    WITH v AS (SELECT vec_id, embedding FROM embeddings),
    c AS (SELECT vec_id AS cid, embedding AS cvec
          FROM embeddings WHERE vec_id < {_PQ_K}),
    s AS (SELECT unnest(generate_series(1, {_PQ_M})) AS s),
    i AS (SELECT unnest(generate_series(1, {_PQ_SUBDIM})) AS i),
    d AS (
        SELECT v.vec_id, s.s, c.cid,
               SUM(CAST(floor(
                   (CAST(v.embedding[(s.s-1)*{_PQ_SUBDIM} + i.i] AS DOUBLE)
                    - CAST(c.cvec[(s.s-1)*{_PQ_SUBDIM} + i.i] AS DOUBLE))
                   * (CAST(v.embedding[(s.s-1)*{_PQ_SUBDIM} + i.i] AS DOUBLE)
                      - CAST(c.cvec[(s.s-1)*{_PQ_SUBDIM} + i.i] AS DOUBLE))
                   * 1e12) AS BIGINT)) AS dist
        FROM v, c, s, i
        GROUP BY 1, 2, 3
    ),
    best AS (
        SELECT vec_id, s, cid AS code, dist FROM (
            SELECT vec_id, s, cid, dist,
                   row_number() OVER (
                       PARTITION BY vec_id, s
                       ORDER BY dist ASC, cid ASC
                   ) AS rn
            FROM d
        ) WHERE rn = 1
    )
"""


@query(
    "x42_product_quantize",
    oracle=PQ_BEST_CTE
    + """
    SELECT vec_id,
           array_to_string(list(CAST(code AS INTEGER) ORDER BY s), '|')
               AS codes,
           CAST(SUM(dist) AS BIGINT) AS err_fp
    FROM best GROUP BY vec_id
    """,
)
def x42_product_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 product quantization: 64-dim embedding → 4 codes (one per 16-dim

    sub-vector, nearest of 16 deterministic codebook centroids by
    fixed-point squared L2, ties to the smaller centroid id) plus the
    total quantization error. The IVFPQ compression step: 256 bytes of
    floats become 4 codes before ANN indexing.

    Scale shape: ZERO corpus shuffles. The codebook (one tiny aggregate
    job over k=16 rows) folds into a single array-of-arrays row that
    broadcasts onto the corpus; each vector's m×k distance matrix is
    materialized once as an intermediate column (so the fixed-point fold
    runs exactly once per cell, not per reference), and codes/error are
    pure array expressions over it — a map-only pass whose output stays
    partition-local, exactly what IVFPQ encoding at 100 TB needs.
    Distances are BIGINT sums of per-element floors (order-free), so
    codes, ties (``array_position`` takes the first ⇒ smallest centroid
    id, matching the oracle's ``ORDER BY dist, cid``) and err_fp are
    engine-exact."""
    t = fixtures(spark, sf_dir)
    return pq_encode(t.embeddings)


def pq_encode(embeddings: DataFrame) -> DataFrame:
    """PQ-encode ``embeddings`` → (vec_id, codes '|'-joined, err_fp).

    Shared by x42 (the encoding itself) and x53 (code-bucket coarse
    dedup). See x42's docstring for the plan-shape analysis."""
    t = SimpleNamespace(embeddings=embeddings)
    dbl = lambda c: F.transform(c, lambda x: x.cast("double"))  # noqa: E731
    # one row: the 16 centroid vectors ordered by centroid id
    codebook = (
        t.embeddings.filter(F.col("vec_id") < _PQ_K)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("vec_id").alias("cid"),
                        dbl("embedding").alias("v"),
                    )
                )
            ).alias("cb")
        )
        .select(F.transform("cb", lambda x: x["v"]).alias("cb"))
    )

    def subdist(vec, cvec, s):
        """Fixed-point squared L2 between sub-vectors of subspace s."""
        start = (s - 1) * _PQ_SUBDIM + 1
        return F.aggregate(
            F.zip_with(
                F.slice(vec, start, _PQ_SUBDIM),
                F.slice(cvec, start, _PQ_SUBDIM),
                lambda a, b: F.floor((a - b) * (a - b) * F.lit(1e12)),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    with_dmat = t.embeddings.crossJoin(F.broadcast(codebook)).select(
        "vec_id",
        F.transform(
            F.sequence(F.lit(1), F.lit(_PQ_M)),
            lambda s: F.transform(
                F.col("cb"), lambda c: subdist(dbl("embedding"), c, s)
            ),
        ).alias("__dmat"),
    )
    # codes ship '|'-joined: the driver's pandas canonicalizer cannot sort
    # raw array columns (same contract as x40's int8 codes).
    return with_dmat.select(
        "vec_id",
        F.concat_ws(
            "|",
            F.transform(
                "__dmat",
                lambda row: (
                    F.array_position(row, F.array_min(row)) - 1
                ).cast("int"),
            ),
        ).alias("codes"),
        F.aggregate(
            "__dmat",
            F.lit(0).cast("long"),
            lambda acc, row: acc + F.array_min(row),
        )
        .cast("bigint")
        .alias("err_fp"),
    )


@query(
    "x43_source_overlap",
    oracle="""
    WITH tok AS (
        SELECT DISTINCT source, token FROM (
            SELECT source, unnest(string_split(text, ' ')) AS token
            FROM documents
        )
    ),
    n AS (SELECT source, COUNT(*) AS nv FROM tok GROUP BY source),
    pair AS (
        SELECT a.source AS source_a, b.source AS source_b,
               COUNT(*) AS inter
        FROM tok a JOIN tok b
          ON a.token = b.token AND a.source < b.source
        GROUP BY 1, 2
    )
    SELECT source_a, source_b, CAST(inter AS BIGINT) AS inter,
           CAST(na.nv + nb.nv - inter AS BIGINT) AS union_size,
           CAST(inter * 1000000 // (na.nv + nb.nv - inter) AS BIGINT)
               AS jaccard_ppm
    FROM pair
    JOIN n na ON na.source = pair.source_a
    JOIN n nb ON nb.source = pair.source_b
    """,
)
def x43_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1/X3 cross-source vocabulary overlap: pairwise Jaccard similarity

    of the distinct-token sets of every source pair — the composition
    diagnostic that surfaces near-copy sources before dedup compute is
    spent on them. Jaccard ships as exact ppm (integer division).

    Scale shape: one distinct shuffle on (source, token), then a
    token-keyed self-join whose per-token fan-out is bounded by
    |sources|² pairs — never corpus-quadratic — and a pair-keyed
    aggregate over at most |sources|² groups; the per-source vocabulary
    sizes broadcast back onto that tiny result."""
    t = fixtures(spark, sf_dir)
    # lineage cut (the x65 rule): tok feeds three consumers (n + both
    # join sides) — uncut, Catalyst clones the explode+distinct per
    # consumer (4 corpus text scans, plan-audited round 6); cut, the
    # vocabulary-sized distinct table materializes once
    tok = (
        t.documents.select(
            "source", F.explode(F.split("text", " ")).alias("token")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = tok.groupBy("source").agg(F.count(F.lit(1)).alias("nv"))
    a = tok.select(F.col("source").alias("source_a"), "token")
    b = tok.select(F.col("source").alias("source_b"), "token")
    pair = (
        a.join(b, "token")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    na = n.select(F.col("source").alias("source_a"), F.col("nv").alias("na"))
    nb = n.select(F.col("source").alias("source_b"), F.col("nv").alias("nb"))
    union_size = F.col("na") + F.col("nb") - F.col("inter")
    return (
        pair.join(F.broadcast(na), "source_a")
        .join(F.broadcast(nb), "source_b")
        .select(
            "source_a",
            "source_b",
            F.col("inter").cast("bigint").alias("inter"),
            union_size.cast("bigint").alias("union_size"),
            F.expr("inter * 1000000 div (na + nb - inter)")
            .cast("bigint")
            .alias("jaccard_ppm"),
        )
    )
