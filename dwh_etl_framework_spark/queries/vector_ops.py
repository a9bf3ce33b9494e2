"""Similarity-search query-surface entries (X2) wired to

operators/similarity.py, over the ``embeddings`` fixture (64-dim float)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dwh_etl_framework_spark.operators import similarity
from dwh_etl_framework_spark.queries.registry import fixtures, query

_DIM = 64


@query(
    "x05_cosine_topk",
    oracle="""
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
    e_exp AS (
        SELECT vec_id, label, embedding,
               unnest(generate_series(1, len(embedding))) AS i
        FROM embeddings WHERE vec_id <> 0
    ),
    dots AS (
        SELECT e.vec_id, e.label,
               SUM(CAST(floor(CAST(e.embedding[i] AS DOUBLE)
                              * CAST(q.qe[i] AS DOUBLE) * 1e12) AS BIGINT)) AS dot,
               SUM(CAST(floor(CAST(e.embedding[i] AS DOUBLE)
                              * CAST(e.embedding[i] AS DOUBLE) * 1e12) AS BIGINT)) AS na
        FROM e_exp e, q
        GROUP BY 1, 2
    ),
    qn AS (
        SELECT SUM(CAST(floor(CAST(qe[i] AS DOUBLE)
                              * CAST(qe[i] AS DOUBLE) * 1e12) AS BIGINT)) AS nb
        FROM (SELECT qe, unnest(generate_series(1, len(qe))) AS i FROM q)
    )
    SELECT vec_id, label,
           CAST(dot AS DOUBLE)
               / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE)))
               AS cosine_sim
    FROM dots, qn
    ORDER BY cosine_sim DESC, vec_id ASC
    LIMIT 10
    """,
)
def x05_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 brute-force cosine top-10 against the vec_id=0 query vector.

    JVM-side zip_with products with DECIMAL accumulation (bit-reproducible
    across engines — see operators/similarity._dot_exact), final division in
    double, TakeOrderedAndProject top-k. The double fast path is
    x05b; bench uses this same plan shape."""
    t = fixtures(spark, sf_dir)
    qv = t.embeddings.filter(F.col("vec_id") == 0)
    return (
        similarity.brute_force_topk(
            t.embeddings.filter(F.col("vec_id") != 0),
            qv,
            k=10,
            exact=True,
        )
        .select("vec_id", "label", "cosine_sim")
    )


@query("x05b_cosine_topk_fast", oracle=None)
def x05b_cosine_topk_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 brute-force top-10, double-precision fast path (the plan you run

    at 100 TB). No oracle: double reduction order is engine-specific;
    tests/test_similarity.py asserts it returns the same ids as x05."""
    t = fixtures(spark, sf_dir)
    qv = t.embeddings.filter(F.col("vec_id") == 0)
    return similarity.brute_force_topk(
        t.embeddings.filter(F.col("vec_id") != 0), qv, k=10, exact=False
    ).select("vec_id", "label", "cosine_sim")


@query("x06_embedding_near_dup", oracle=None)
def x06_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1/X2 embedding near-duplicate pairs (cosine ≥ 0.9) via

    random-hyperplane LSH buckets — exact cosine only inside buckets.
    No oracle (bucket assignment is implementation-defined);
    tests/test_similarity.py checks recall ≥ 0.8 against brute force on
    planted near-duplicates. NOTE: on the driver fixtures this returns 0
    rows BY DESIGN — the synthetic embeddings' max pairwise cosine is ≈0.5,
    i.e. the corpus genuinely has no near-dups; the operator's behavior is
    proven by the planted-duplicate test."""
    t = fixtures(spark, sf_dir)
    return similarity.lsh_near_dup_pairs(
        t.embeddings, dim=_DIM, n_planes=12, n_tables=3, threshold=0.9
    ).orderBy("id_a", "id_b")


@query(
    "x06d_embedding_near_dup_portable",
    oracle="""
    WITH ev AS (
        SELECT vec_id, embedding,
               unnest(generate_series(1, len(embedding))) AS i
        FROM embeddings
    ),
    fx AS (
        SELECT vec_id, i,
               CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e12) AS BIGINT) AS v
        FROM ev
    ),
    coef AS (
        SELECT t.t, j.j, d.d,
               CASE WHEN (strpos('0123456789abcdef',
                                 substr(md5(CAST(t.t AS VARCHAR) || '|' ||
                                            CAST(j.j AS VARCHAR) || '|' ||
                                            CAST(d.d AS VARCHAR)), 1, 1)) - 1)
                         & 1 = 1
                    THEN 1 ELSE -1 END AS s
        FROM (SELECT unnest(generate_series(0, 3)) AS t) t,
             (SELECT unnest(generate_series(0, 5)) AS j) j,
             (SELECT unnest(generate_series(1, 64)) AS d) d
    ),
    proj AS (
        SELECT f.vec_id, c.t, c.j, SUM(c.s * f.v) AS p
        FROM fx f JOIN coef c ON c.d = f.i
        GROUP BY 1, 2, 3
    ),
    buckets AS (
        SELECT vec_id, t,
               CAST(SUM((CASE WHEN p >= 0 THEN 1 ELSE 0 END) << j)
                    AS INTEGER) AS bucket
        FROM proj GROUP BY vec_id, t
    ),
    cands AS (
        SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        FROM buckets a
        JOIN buckets b ON a.t = b.t AND a.bucket = b.bucket
                       AND a.vec_id < b.vec_id
    ),
    dots AS (
        SELECT c.id_a, c.id_b,
               SUM(CAST(floor(CAST(ea.embedding[ea.i] AS DOUBLE)
                              * CAST(eb.embedding[ea.i] AS DOUBLE) * 1e12)
                        AS BIGINT)) AS dot
        FROM cands c
        JOIN ev ea ON ea.vec_id = c.id_a
        JOIN ev eb ON eb.vec_id = c.id_b AND eb.i = ea.i
        GROUP BY 1, 2
    ),
    nrm AS (
        SELECT vec_id,
               SUM(CAST(floor(CAST(embedding[i] AS DOUBLE)
                              * CAST(embedding[i] AS DOUBLE) * 1e12)
                        AS BIGINT)) AS n2
        FROM ev GROUP BY vec_id
    )
    SELECT d.id_a, d.id_b,
           CAST(d.dot AS DOUBLE)
               / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
               AS cosine_sim
    FROM dots d
    JOIN nrm na ON na.vec_id = d.id_a
    JOIN nrm nb ON nb.vec_id = d.id_b
    WHERE CAST(d.dot AS DOUBLE)
          / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) >= 0.4
    """,
)
def x06d_embedding_near_dup_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1/X2 embedding near-dup with PORTABLE hyperplanes (md5-derived ±1

    Rademacher signs, exact int64 fixed-point projections): bucket
    assignment, the bucket self-join and the fixed-point cosine filter are
    reproduced value-for-value by the oracle, so the vector near-dup shape
    is hash-checked by the driver. Threshold 0.4 (the synthetic corpus'
    cosine ceiling is ≈0.51) so the result is non-empty; the production
    gaussian twin x06 keeps its planted-duplicate recall tests."""
    t = fixtures(spark, sf_dir)
    return similarity.lsh_near_dup_pairs_portable(
        t.embeddings, dim=_DIM, n_planes=6, n_tables=4, threshold=0.4
    )


@query(
    "x06c_ivf_topk_exact",
    oracle="""
    WITH nrm AS (
        SELECT vec_id,
               SUM(CAST(floor(CAST(embedding[i] AS DOUBLE)
                              * CAST(embedding[i] AS DOUBLE) * 1e12)
                        AS BIGINT)) AS n2
        FROM (SELECT vec_id, embedding,
                     unnest(generate_series(1, len(embedding))) AS i
              FROM embeddings)
        GROUP BY vec_id
    ),
    ee AS (
        SELECT vec_id, embedding,
               unnest(generate_series(1, len(embedding))) AS i
        FROM embeddings WHERE vec_id <> 0
    ),
    c AS (
        SELECT vec_id AS centroid_id, embedding AS cvec
        FROM embeddings WHERE vec_id < 16
    ),
    q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
    vc AS (
        SELECT ee.vec_id, c.centroid_id,
               SUM(CAST(floor(CAST(ee.embedding[ee.i] AS DOUBLE)
                              * CAST(c.cvec[ee.i] AS DOUBLE) * 1e12)
                        AS BIGINT)) AS dot
        FROM ee, c GROUP BY 1, 2
    ),
    assigned AS (
        SELECT vec_id, centroid_id FROM (
            SELECT vc.vec_id, vc.centroid_id,
                   row_number() OVER (
                       PARTITION BY vc.vec_id
                       ORDER BY CAST(vc.dot AS DOUBLE)
                                / (sqrt(CAST(nv.n2 AS DOUBLE))
                                   * sqrt(CAST(nc.n2 AS DOUBLE))) DESC,
                                vc.centroid_id ASC
                   ) AS rn
            FROM vc
            JOIN nrm nv ON nv.vec_id = vc.vec_id
            JOIN nrm nc ON nc.vec_id = vc.centroid_id
        ) WHERE rn = 1
    ),
    cq AS (
        SELECT c.centroid_id,
               SUM(CAST(floor(CAST(c.cvec[d.i] AS DOUBLE)
                              * CAST(q.qe[d.i] AS DOUBLE) * 1e12)
                        AS BIGINT)) AS dot
        FROM c, q, (SELECT unnest(generate_series(1, 64)) AS i) d
        GROUP BY 1
    ),
    probe AS (
        SELECT cq.centroid_id
        FROM cq
        JOIN nrm nc ON nc.vec_id = cq.centroid_id
        CROSS JOIN (SELECT n2 AS nq FROM nrm WHERE vec_id = 0) qn
        ORDER BY CAST(cq.dot AS DOUBLE)
                 / (sqrt(CAST(nc.n2 AS DOUBLE)) * sqrt(CAST(nq AS DOUBLE))) DESC,
                 cq.centroid_id ASC
        LIMIT 4
    ),
    vq AS (
        SELECT ee.vec_id,
               SUM(CAST(floor(CAST(ee.embedding[ee.i] AS DOUBLE)
                              * CAST(q.qe[ee.i] AS DOUBLE) * 1e12)
                        AS BIGINT)) AS dot
        FROM ee, q
        WHERE ee.vec_id IN (SELECT a.vec_id FROM assigned a
                            JOIN probe p ON a.centroid_id = p.centroid_id)
        GROUP BY 1
    )
    SELECT vq.vec_id, a.centroid_id,
           CAST(vq.dot AS DOUBLE)
               / (sqrt(CAST(nv.n2 AS DOUBLE)) * sqrt(CAST(qn.nq AS DOUBLE)))
               AS cosine_sim
    FROM vq
    JOIN assigned a ON a.vec_id = vq.vec_id
    JOIN nrm nv ON nv.vec_id = vq.vec_id
    CROSS JOIN (SELECT n2 AS nq FROM nrm WHERE vec_id = 0) qn
    ORDER BY cosine_sim DESC, vq.vec_id ASC
    LIMIT 10
    """,
)
def x06c_ivf_topk_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 IVF ANN, exact-arithmetic flavor: every cosine (assignment, probe,

    final ranking) uses the fixed-point reduction with id tie-breaks, so
    the whole inverted-list pipeline — codebook assignment, 4-probe, top-10
    — is reproduced value-for-value by the SQL oracle (the double fast
    path x06b keeps its recall tests)."""
    t = fixtures(spark, sf_dir)
    centroids = t.embeddings.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid_vec"),
    )
    qv = t.embeddings.filter(F.col("vec_id") == 0)
    return similarity.ivf_topk(
        t.embeddings.filter(F.col("vec_id") != 0),
        qv,
        centroids,
        k=10,
        n_probe=4,
        exact=True,
    )


@query(
    "x32_knn_join",
    oracle="""
    WITH ev AS (
        SELECT vec_id, embedding,
               unnest(generate_series(1, len(embedding))) AS i
        FROM embeddings
    ),
    nrm AS (
        SELECT vec_id,
               SUM(CAST(floor(CAST(embedding[i] AS DOUBLE)
                              * CAST(embedding[i] AS DOUBLE) * 1e12)
                        AS BIGINT)) AS n2
        FROM ev GROUP BY vec_id
    ),
    dots AS (
        SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
               SUM(CAST(floor(CAST(q.embedding[q.i] AS DOUBLE)
                              * CAST(e.embedding[q.i] AS DOUBLE) * 1e12)
                        AS BIGINT)) AS dot
        FROM ev q JOIN ev e ON e.i = q.i AND e.vec_id <> q.vec_id
        WHERE q.vec_id < 50
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT d.query_id, d.neighbor_id,
               CAST(d.dot AS DOUBLE)
                   / (sqrt(CAST(nq.n2 AS DOUBLE)) * sqrt(CAST(ne.n2 AS DOUBLE)))
                   AS cosine_sim,
               row_number() OVER (
                   PARTITION BY d.query_id
                   ORDER BY CAST(d.dot AS DOUBLE)
                            / (sqrt(CAST(nq.n2 AS DOUBLE))
                               * sqrt(CAST(ne.n2 AS DOUBLE))) DESC,
                            d.neighbor_id ASC
               ) AS rk
        FROM dots d
        JOIN nrm nq ON nq.vec_id = d.query_id
        JOIN nrm ne ON ne.vec_id = d.neighbor_id
    )
    SELECT query_id, neighbor_id, cosine_sim, CAST(rk AS INTEGER) AS rk
    FROM ranked WHERE rk <= 3
    """,
)
def x32_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 k-NN join: top-3 cosine neighbors from the whole corpus for each

    of the first 50 vectors (a query batch), exact fixed-point arithmetic
    so the oracle reproduces every similarity bit-for-bit. The query batch
    broadcasts; scoring is a map over corpus partitions and the rank<=k
    filter rewrites to WindowGroupLimit (per-partition top-k pruned before
    the one query_id-keyed shuffle). The corpus-×-corpus scale path is
    x32b (IVF candidate lists)."""
    t = fixtures(spark, sf_dir)
    return similarity.knn_join(
        t.embeddings,
        t.embeddings.filter(F.col("vec_id") < 50),
        k=3,
        exact=True,
    )


@query("x32b_knn_join_ivf", oracle=None)
def x32b_knn_join_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 approximate k-NN SELF-join: every vector's top-3 neighbors among

    vectors sharing one of its 4 probed IVF lists — the O(n·probe·list)
    shape a corpus-×-corpus neighbor search runs at 100 TB instead of the
    O(n²) brute force. No oracle (candidate sets are codebook-dependent);
    tests/test_similarity.py asserts recall vs the exact x32 join."""
    t = fixtures(spark, sf_dir)
    centroids = t.embeddings.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid_vec"),
    )
    return similarity.knn_join_ivf(
        t.embeddings, centroids, k=3, n_probe=4
    )


@query("x35_kmeans_ivf_topk", oracle=None)
def x35_kmeans_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 the full trained-ANN pipeline: Lloyd's k-means codebook

    (operators/similarity.train_kmeans_codebook — one Spark job per
    iteration, convergence via observe) feeding ivf_topk. No oracle
    (double means are engine-local, like any trained artifact);
    tests/test_similarity.py pins convergence, membership totals and
    planted-cluster recall."""
    t = fixtures(spark, sf_dir)
    codebook = similarity.train_kmeans_codebook(
        t.embeddings, n_centroids=8, max_iter=4
    )
    qv = t.embeddings.filter(F.col("vec_id") == 0)
    return similarity.ivf_topk(
        t.embeddings.filter(F.col("vec_id") != 0),
        qv,
        codebook.select("centroid_id", "centroid_vec"),
        k=10,
        n_probe=3,
    )


@query(
    "x40_embedding_quantize",
    oracle="""
    WITH m AS (
        SELECT vec_id, embedding,
               list_aggregate(list_transform(embedding,
                   x -> abs(CAST(x AS DOUBLE))), 'max') AS mx
        FROM embeddings
    )
    SELECT vec_id,
           CAST(floor(mx * 1e12) AS BIGINT) AS scale_fp,
           array_to_string(list_transform(embedding,
               x -> CAST(CASE WHEN mx > 0
                    THEN floor(CAST(x AS DOUBLE) / mx * 127)
                    ELSE 0 END AS INTEGER)), '|') AS q_embedding,
           CAST(list_aggregate(list_transform(embedding,
               x -> CAST(floor(
                   (CAST(x AS DOUBLE)
                    - CASE WHEN mx > 0
                          THEN floor(CAST(x AS DOUBLE) / mx * 127)
                          ELSE 0 END * mx / 127)
                   * (CAST(x AS DOUBLE)
                      - CASE WHEN mx > 0
                            THEN floor(CAST(x AS DOUBLE) / mx * 127)
                            ELSE 0 END * mx / 127)
                   * 1e18) AS BIGINT)), 'sum') AS BIGINT) AS err_fp
    FROM m
    """,
)
def x40_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 int8 scalar quantization: per-vector symmetric scale (max |v|),

    q_i = floor(v_i/scale·127) ∈ [-127,127], plus the squared
    reconstruction error — the 4× storage/bandwidth cut an embedding
    store applies before ANN indexing at 100 TB. Map-only JVM array
    expressions, zero shuffles. Every emitted number is engine-portable:
    the scale and error ship as fixed-point int64 (per-element floor
    before the sum, so the reduction is order-free), and the quantized
    codes are exact by construction; the whole operator is value-checked
    by the DuckDB oracle. The int8 codes ship '|'-joined as a string —
    the driver's pandas canonicalizer cannot sort raw array columns
    (unhashable lists), so portable queries serialize arrays to scalars,
    same as x36/x38."""
    t = fixtures(spark, sf_dir)
    v = F.transform("embedding", lambda x: x.cast("double"))
    with_m = t.embeddings.select(
        "vec_id",
        v.alias("__v"),
        F.array_max(F.transform(v, F.abs)).alias("__mx"),
    )
    mx = F.col("__mx")
    q_of = lambda x: F.when(  # noqa: E731 — shared by q/err expressions
        mx > 0, F.floor(x / mx * 127)
    ).otherwise(F.lit(0))
    err_term = lambda x: F.floor(  # noqa: E731
        (x - q_of(x) * mx / 127) * (x - q_of(x) * mx / 127) * F.lit(1e18)
    )
    return with_m.select(
        "vec_id",
        F.floor(mx * F.lit(1e12)).cast("bigint").alias("scale_fp"),
        F.concat_ws(
            "|", F.transform(F.col("__v"), lambda x: q_of(x).cast("int"))
        ).alias("q_embedding"),
        F.aggregate(
            F.transform(F.col("__v"), err_term),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        .cast("bigint")
        .alias("err_fp"),
    )


@query("x06b_ivf_topk", oracle=None)
def x06b_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 IVF-style ANN top-10: coarse centroids (first 16 vectors as a

    deterministic codebook), probe the 4 nearest lists. At ingest scale the
    table is partitioned by centroid ⇒ partition pruning is the index.
    Recall vs brute force is asserted in tests/test_similarity.py."""
    t = fixtures(spark, sf_dir)
    centroids = (
        t.embeddings.filter(F.col("vec_id") < 16)
        .select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("centroid_vec"),
        )
    )
    qv = t.embeddings.filter(F.col("vec_id") == 0)
    return similarity.ivf_topk(
        t.embeddings.filter(F.col("vec_id") != 0), qv, centroids, k=10, n_probe=4
    )
