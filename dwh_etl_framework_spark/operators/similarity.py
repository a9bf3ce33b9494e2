"""Vector similarity search over embedding columns (SURVEY.md §2c X2).

Two tiers, mirroring what a 100 TB embedding store needs:

- **Brute-force top-k** — exact cosine against a query vector, computed
  JVM-side with zip_with/aggregate (no Python, no shuffle until the final
  top-k, which plans as TakeOrderedAndProject). Linear scan; the right
  baseline and the verifier for the ANN tier.
- **Random-hyperplane LSH (SimHash-for-vectors)** — deterministic
  hyperplanes → sign-bit signatures → bucket join. Only vectors sharing a
  bucket are compared: sublinear candidate generation for near-duplicate
  mining and ANN with tunable recall (more tables ⇒ higher recall).
  An IVF variant (coarse quantizer = seed vectors) is in ``ivf_topk``.

Exact-arithmetic variants (`*_exact`) push every reduction through DECIMAL
so results are bit-reproducible across engines/partitionings — used by the
DuckDB-oracle checks; the double variants are the fast path for bench.
"""

from __future__ import annotations

import itertools
import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dwh_etl_framework_spark.operators.bucket_cap import cap_bucket_size

#: unique Observation names across repeated trainer calls in one session
_OBS_SEQ = itertools.count()


def _dot_double(a: Column, b: Column) -> Column:
    """Σ a_i*b_i in double (fast path; JVM fold, deterministic in-order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


#: fixed-point scale for engine-portable exact reductions: each double term
#: is floored to an integer number of 1e-12 units (the double multiply and
#: floor are IEEE-identical everywhere), then summed in exact int64.
#: Double→DECIMAL casts are NOT portable (Spark rounds the shortest decimal
#: repr, DuckDB the binary value), hence fixed-point instead of decimal.
FIXED_POINT_SCALE = 1e12


def _dot_fixed(a: Column, b: Column) -> Column:
    """Σ floor(a_i*b_i * 1e12) as int64 — bit-reproducible across engines

    and reduction orders; ~12 significant digits, plenty for cosine."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: F.floor(
                x.cast("double") * y.cast("double") * F.lit(FIXED_POINT_SCALE)
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column, exact: bool = False) -> Column:
    """Cosine similarity; ``exact=True`` uses the fixed-point reduction so

    the value is identical under any partitioning/engine (oracle path)."""
    dot = _dot_fixed if exact else _dot_double
    num = dot(a, b).cast("double")
    den_a = F.sqrt(dot(a, a).cast("double"))
    den_b = F.sqrt(dot(b, b).cast("double"))
    return num / (den_a * den_b)


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = False,
) -> DataFrame:
    """Exact top-k by cosine. ``query_vec`` is a 1-row DataFrame with the

    vector under ``vec_col`` — broadcast-cross-joined (1 row ⇒ no blowup),
    then scored JVM-side and TakeOrderedAndProject'd. Ties broken by id for
    a total order."""
    q = F.broadcast(query_vec.select(F.col(vec_col).alias("__qvec")))
    scored = embeddings.crossJoin(q).withColumn(
        "cosine_sim", cosine(F.col(vec_col), F.col("__qvec"), exact=exact)
    )
    return (
        scored.orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc())
        .limit(k)
        .drop("__qvec")
    )


def knn_join(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = False,
) -> DataFrame:
    """X2 k-NN join: top-``k`` cosine neighbors from ``embeddings`` for

    EVERY row of ``queries`` (the batch generalization of
    ``brute_force_topk``; self-join when both sides are the corpus).
    Returns (query_id, neighbor_id, cosine_sim, rk), rk 1..k, total order
    via (cosine DESC, neighbor_id ASC).

    Scale shape: the QUERY side is broadcast (a query batch is small
    relative to a 100 TB corpus), so scoring is an embarrassingly parallel
    map over corpus partitions — no corpus shuffle. The rank<=k filter
    rewrites to WindowGroupLimit: each partition prunes to its local top-k
    per query BEFORE the single (query_id)-keyed exchange, so the shuffle
    ships ≤ partitions·queries·k rows, never the corpus. For
    corpus-×-corpus self-joins at scale use ``knn_join_ivf`` — brute force
    is O(|corpus|·|queries|) by construction.
    """
    from pyspark.sql import Window

    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
        )
    )
    scored = (
        embeddings.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col)
        )
        .join(q, F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine_sim", cosine(F.col(vec_col), F.col("__qvec"), exact=exact)
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rk")
    )


def knn_join_ivf(
    embeddings: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = False,
) -> DataFrame:
    """X2 approximate k-NN SELF-join at corpus scale: every vector finds

    its top-``k`` neighbors among vectors whose inverted list (nearest
    centroid) is one of the vector's ``n_probe`` closest lists.

    Scale shape — this is the shape a corpus-×-corpus k-NN actually runs
    at 100 TB, where brute force is O(n²):

    1. one broadcast-codebook map pass ranks centroids per vector (no
       shuffle, same collapsed-array argmax as ``ivf_topk``);
    2. the candidate side keeps its top-1 list (each vector indexed
       once), the query side explodes its ``n_probe`` lists;
    3. ONE equi-join on ``centroid_id`` (at ingest the table is
       partitioned by centroid, so this is partition-pruned, not
       shuffled) generates ~n_probe·|list| candidates per query instead
       of n;
    4. exact cosine re-rank inside candidates, WindowGroupLimit top-k.

    Recall is tunable via n_probe/codebook size; asserted vs brute force
    in tests/test_similarity.py.
    """
    from pyspark.sql import Window

    cent_arr = F.broadcast(
        centroids.agg(
            F.collect_list(
                F.struct(F.col("centroid_id"), F.col("centroid_vec"))
            ).alias("__cents")
        )
    )
    # array_sort on struct(neg_sim, centroid_id) sorts ascending — negated
    # sim first ⇒ the probe list is the n_probe HIGHEST-cosine centroids,
    # ties broken by lowest centroid_id (same order ivf_topk's argmax uses)
    with_lists = (
        embeddings.crossJoin(cent_arr)
        .withColumn(
            "__scored",
            F.transform(
                F.col("__cents"),
                lambda c: F.struct(
                    (-cosine(F.col(vec_col), c["centroid_vec"], exact=exact)).alias(
                        "neg_sim"
                    ),
                    c["centroid_id"].alias("centroid_id"),
                ),
            ),
        )
        .withColumn(
            "__probe",
            F.expr(
                f"transform(slice(array_sort(__scored), 1, {int(n_probe)}), "
                "s -> s.centroid_id)"
            ),
        )
        .select(F.col(id_col), F.col(vec_col), F.col("__probe"))
        .localCheckpoint(eager=True)  # both join sides read it
    )
    cand = with_lists.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__nvec"),
        F.col("__probe")[0].alias("centroid_id"),  # indexed under top-1 list
    )
    qry = with_lists.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        F.explode("__probe").alias("centroid_id"),
    )
    pairs = (
        qry.join(cand, on="centroid_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn(
            "cosine_sim", cosine(F.col("__qvec"), F.col("__nvec"), exact=exact)
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rk")
    )


def train_kmeans_codebook(
    embeddings: DataFrame,
    n_centroids: int,
    max_iter: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tol_changed: int = 0,
) -> DataFrame:
    """Train an IVF codebook with Lloyd's k-means on DataFrames — the

    ingest-time step that makes ``ivf_topk``/``knn_join_ivf`` recall good
    on REAL corpora (cluster structure), instead of seeding the codebook
    with arbitrary vectors.

    Spark-first shape, one job per iteration:

    - **assign**: broadcast the collapsed codebook array, per-row argmax —
      embarrassingly parallel, zero shuffle (same pattern as ``ivf_topk``);
    - **update**: posexplode dims → two-level partial aggregation
      ((centroid, dim) sums, then per-centroid array re-assembly via
      sort_array+collect_list) — the only shuffles, both map-side-combined;
    - **convergence**: the number of vectors that switched centroid rides
      the update job as an ``observe`` metric (no second job, same trick
      as operators/graph).

    Deterministic: initial centroids are the ``n_centroids`` lowest-id
    vectors, ties in assignment break to the lowest centroid id, and means
    are double (IEEE, but iteration-stable within one engine — the trained
    codebook is engine-local state, like any ML artifact; queries over it
    get rows-only/recall evidence, not value oracles).

    Returns (centroid_id, centroid_vec, n_members).
    """
    from pyspark.sql import Observation, Window

    centroids = (
        embeddings.orderBy(F.col(id_col).asc())
        .limit(n_centroids)
        .select(
            (
                F.row_number().over(Window.orderBy(F.col(id_col).asc())) - 1
            ).alias("centroid_id"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias(
                "centroid_vec"
            ),
        )
        .localCheckpoint(eager=True)
    )
    vecs = embeddings.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__v"),
    ).localCheckpoint(eager=True)

    prev_assign = None
    for it in range(max_iter):
        cent_arr = F.broadcast(
            centroids.agg(
                F.collect_list(
                    F.struct(F.col("centroid_id"), F.col("centroid_vec"))
                ).alias("__cents")
            )
        )
        scored = F.transform(
            F.col("__cents"),
            lambda c: F.struct(
                cosine(F.col("__v"), c["centroid_vec"]).alias("sim_c"),
                (-c["centroid_id"]).alias("neg_id"),
            ),
        )
        assigned = (
            vecs.crossJoin(cent_arr)
            .withColumn("__best", F.array_max(scored))
            .select(
                id_col, "__v", (-F.col("__best.neg_id")).alias("centroid_id")
            )
        )
        if prev_assign is not None:
            obs = Observation(f"kmeans_changed_{it}_{next(_OBS_SEQ)}")
            assigned = assigned.join(
                prev_assign.select(
                    F.col(id_col), F.col("centroid_id").alias("__prev")
                ),
                on=id_col,
                how="left",
            ).observe(
                obs,
                F.coalesce(
                    F.sum(
                        (F.col("centroid_id") != F.col("__prev")).cast("long")
                    ),
                    F.lit(0),
                ).alias("changed"),
            ).drop("__prev")
        else:
            obs = None
        assigned = assigned.localCheckpoint(eager=True)
        # update step: per-(centroid, dim) partial sums, then re-assemble
        dims = assigned.select(
            "centroid_id", F.posexplode("__v").alias("dim", "val")
        )
        per_dim = dims.groupBy("centroid_id", "dim").agg(
            F.sum("val").alias("s"), F.count(F.lit(1)).alias("n")
        )
        new_centroids = (
            per_dim.groupBy("centroid_id")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("dim", F.col("s"), F.col("n")))
                    ),
                    lambda t: t["s"] / t["n"].cast("double"),
                ).alias("centroid_vec"),
                F.max("n").alias("n_members"),
            )
            .localCheckpoint(eager=True)
        )
        centroids = new_centroids.select(
            "centroid_id", "centroid_vec", "n_members"
        )
        if obs is not None and obs.get["changed"] <= tol_changed:
            break
        prev_assign = assigned.select(id_col, "centroid_id")
    return centroids


def _hyperplanes(dim: int, n_planes: int, seed: int = 7) -> list[list[float]]:
    """Deterministic pseudo-gaussian hyperplanes (Box-Muller over an LCG) —

    no numpy/RNG state, reproducible everywhere."""
    state = seed

    def nxt() -> float:
        nonlocal state
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        return (state >> 11) / float(1 << 52)  # uniform in [0,1)

    planes = []
    for _ in range(n_planes):
        row = []
        while len(row) < dim:
            u1, u2 = max(nxt(), 1e-12), nxt()
            mag = math.sqrt(-2.0 * math.log(u1))
            row.append(mag * math.cos(2 * math.pi * u2))
            if len(row) < dim:
                row.append(mag * math.sin(2 * math.pi * u2))
        planes.append(row)
    return planes


def hyperplane_signature(
    vec_col: Column, dim: int, n_planes: int = 16, seed: int = 7
) -> Column:
    """n_planes sign bits packed into a BIGINT bucket id (JVM-side only)."""
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(_hyperplanes(dim, n_planes, seed)):
        proj = _dot_double(vec_col, F.array(*[F.lit(w) for w in plane]))
        bit = F.when(proj >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = sig.bitwiseOR(F.shiftleft(bit, i))
    return sig


def lsh_near_dup_pairs(
    embeddings: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    n_tables: int = 2,
    threshold: float = 0.9,
    max_bucket_size: int | None = 5000,
    bucket_observation=None,
) -> DataFrame:
    """X1/X2 embedding near-dup mining: bucket by hyperplane signature

    (n_tables independent tables to boost recall), exact cosine only inside
    buckets, keep pairs ≥ threshold.

    ``max_bucket_size`` bounds the per-bucket self-join: a degenerate
    ``(table_idx, bucket)`` group (e.g. millions of zero vectors all
    signing to bucket 0) would otherwise explode as size². Oversized
    buckets are dropped (``operators.bucket_cap``); pass an
    ``Observation`` as ``bucket_observation`` for drop metrics."""
    with_buckets_src = embeddings
    with_buckets = with_buckets_src.select(
        F.col(id_col),
        F.col(vec_col),
        F.posexplode(
            F.array(
                *[
                    hyperplane_signature(F.col(vec_col), dim, n_planes, seed=7 + t)
                    for t in range(n_tables)
                ]
            )
        ).alias("table_idx", "bucket"),
    ).localCheckpoint(eager=True)  # referenced by both join sides
    if max_bucket_size is not None:
        with_buckets = cap_bucket_size(
            with_buckets,
            ["table_idx", "bucket"],
            max_bucket_size,
            observation=bucket_observation,
        )
    a = with_buckets.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"),
        "table_idx", "bucket",
    )
    b = with_buckets.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"),
        "table_idx", "bucket",
    )
    return (
        a.join(b, on=["table_idx", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("cosine_sim", cosine(F.col("vec_a"), F.col("vec_b")))
        .filter(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", "cosine_sim")
    )


def _portable_sign(t: int, j: int, d: int) -> int:
    """±1 Rademacher coefficient from bit 0 of the first hex nibble of

    md5("t|j|d") — computable identically from Python hashlib (plan build
    time) and SQL md5() (oracle side)."""
    import hashlib

    nib = int(hashlib.md5(f"{t}|{j}|{d}".encode()).hexdigest()[0], 16)
    return 1 if nib & 1 else -1


def lsh_near_dup_pairs_portable(
    embeddings: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    n_tables: int = 4,
    threshold: float = 0.4,
    max_bucket_size: int | None = 5000,
    bucket_observation=None,
) -> DataFrame:
    """X1/X2 embedding near-dup mining, cross-engine-reproducible flavor:

    hyperplanes are ±1 Rademacher vectors derived from md5 (``_portable_sign``)
    and projections are EXACT int64 fixed-point sums (Σ s·floor(v_d·1e12)),
    so bucket assignment, candidate pairs and the fixed-point cosine filter
    are all reproduced value-for-value by a SQL oracle. The gaussian-double
    production twin is ``lsh_near_dup_pairs`` (recall-tested); this one
    exists so the driver can hash-check the bucket-join near-dup shape.
    """
    fx = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.lit(FIXED_POINT_SCALE)),
    )
    buckets = []
    for t in range(n_tables):
        bucket = F.lit(0)
        for j in range(n_planes):
            signs = F.array(
                *[F.lit(_portable_sign(t, j, d)) for d in range(1, dim + 1)]
            )
            proj = F.aggregate(
                F.zip_with(fx, signs, lambda v, s: v * s.cast("long")),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
            bit = F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0))
            bucket = bucket + F.shiftleft(bit, j)
        buckets.append(bucket.cast("int"))
    with_buckets = embeddings.select(
        F.col(id_col),
        F.col(vec_col),
        F.posexplode(F.array(*buckets)).alias("table_idx", "bucket"),
    ).localCheckpoint(eager=True)  # referenced by both join sides
    if max_bucket_size is not None:
        with_buckets = cap_bucket_size(
            with_buckets,
            ["table_idx", "bucket"],
            max_bucket_size,
            observation=bucket_observation,
        )
    a = with_buckets.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"),
        "table_idx", "bucket",
    )
    b = with_buckets.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"),
        "table_idx", "bucket",
    )
    return (
        a.join(b, on=["table_idx", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("cosine_sim", cosine(F.col("vec_a"), F.col("vec_b"), exact=True))
        .filter(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", "cosine_sim")
    )


def nearest_centroid(
    df: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    exact: bool = False,
) -> DataFrame:
    """Assign each row its nearest centroid WITHOUT a shuffle: the codebook

    is collapsed into a single array-of-structs row, broadcast to every
    input partition (1-row nested-loop join), and the argmax is a per-row
    array_max over struct(sim, -centroid_id) — max struct = highest sim,
    then lowest centroid_id, matching a (sim DESC, id ASC) row_number
    tie-break without the full-table hash Exchange a window would insert.
    At scale this is the ingest-time pass that decides a table's centroid
    partitioning; it must stay embarrassingly parallel. ``centroids`` is
    (centroid_id, centroid_vec). Returns ``df`` + ``centroid_id``.

    ``_spread`` (round 15): fixture-scale single-file inputs otherwise
    evaluate EVERY per-row argmax (k interpreted fixed-point cosines per
    row) on one task; at corpus scale inputs already arrive in many
    splits and the repartition is a no-op. Row order never reaches a
    result: every consumer ranks/aggregates by explicit keys."""
    from dwh_etl_framework_spark.operators.dedup import _spread

    df = _spread(df)
    cent_arr = F.broadcast(
        centroids.agg(
            F.collect_list(
                F.struct(F.col("centroid_id"), F.col("centroid_vec"))
            ).alias("__cents")
        )
    )
    scored = F.transform(
        F.col("__cents"),
        lambda c: F.struct(
            cosine(F.col(vec_col), c["centroid_vec"], exact=exact).alias("sim_c"),
            (-c["centroid_id"]).alias("neg_id"),
        ),
    )
    return (
        df.crossJoin(cent_arr)
        .withColumn("__best", F.array_max(scored))
        .withColumn("centroid_id", -F.col("__best.neg_id"))
        .drop("__cents", "__best")
    )


def semantic_dedup(
    embeddings: DataFrame,
    centroids: DataFrame,
    tau: float,
    cap: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = False,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,

    arXiv:2303.09540): cluster the corpus around a coarse codebook, then
    compare pairs ONLY within a cluster and drop every non-minimal member
    of any pair with cosine ≥ ``tau``. The cluster decomposition turns the
    quadratic whole-corpus pair problem into Σ|cluster|² — with k ≈ √N
    centroids the expected work is O(N^1.5), and each cluster's pair block
    is independent (embarrassingly parallel after one centroid-keyed
    exchange).

    Degenerate-cluster guard (the x79 convention): membership is capped at
    ``cap`` rows per cluster, deterministically by ``id_col`` order, so a
    pathological codebook can never re-open the quadratic hole; rows past
    the cap are reported with ``member_rank > cap`` and excluded from the
    pair stage (kept, never compared — the conservative direction for a
    dedup screen: false-keep, never false-drop).

    Returns (id, centroid_id, member_rank, is_kept); ``is_kept`` is False
    iff some lower-id capped member of the same cluster has cosine ≥ tau.
    """
    from pyspark.sql import Window

    assigned = nearest_centroid(
        embeddings.select(id_col, vec_col), centroids, vec_col=vec_col, exact=exact
    )
    w = Window.partitionBy("centroid_id").orderBy(F.col(id_col).asc())
    # lineage cut (the x65 convention): members feeds THREE consumers (the
    # output join plus both pair sides) — without the cut Catalyst clones
    # the scan+assignment subtree per consumer and the corpus is read and
    # argmax-assigned three times (observed in the round-6 plan audit).
    members = assigned.withColumn(
        "member_rank", F.row_number().over(w)
    ).localCheckpoint(eager=False)
    capped = members.filter(F.col("member_rank") <= cap)
    a = capped.select(
        F.col("centroid_id"),
        F.col(id_col).alias("__ida"),
        F.col(vec_col).alias("__va"),
    )
    b = capped.select(
        F.col("centroid_id"),
        F.col(id_col).alias("__idb"),
        F.col(vec_col).alias("__vb"),
    )
    # the within-cluster pair block: one centroid-keyed shuffle, then the
    # cosine is a JVM-side zip_with/aggregate over the joined rows — no
    # Python, no second exchange (both sides share the centroid_id key).
    dropped = (
        a.join(b, on="centroid_id")
        .filter(F.col("__ida") < F.col("__idb"))
        .withColumn(
            "__cos", cosine(F.col("__va"), F.col("__vb"), exact=exact)
        )
        .filter(F.col("__cos") >= F.lit(tau))
        .select(F.col("__idb").alias(id_col))
        .distinct()
    )
    # dropped is provably ≤ cap·|centroids| rows (only capped members can
    # be a pair's right element), so pin the broadcast — the corpus-sized
    # left side must never shuffle for this join.
    return (
        members.join(
            F.broadcast(dropped.withColumn("__dropped", F.lit(True))),
            on=id_col,
            how="left",
        )
        .select(
            id_col,
            "centroid_id",
            "member_rank",
            F.coalesce(~F.col("__dropped"), F.lit(True)).alias("is_kept"),
        )
    )


def ivf_topk(
    embeddings: DataFrame,
    query_vec: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = False,
) -> DataFrame:
    """X2 IVF-style ANN: vectors are pre-assigned to their nearest centroid

    (inverted lists = partitions); the query scores only the ``n_probe``
    nearest lists. ``centroids`` is (centroid_id, centroid_vec) — small,
    broadcast everywhere. At scale the assignment is computed once at
    ingest and the table is *partitioned by centroid_id* so a query reads
    only n_probe partitions (partition pruning does the index lookup).

    ``exact=True`` scores every cosine (assignment, probe, final) with the
    fixed-point reduction, making the whole pipeline bit-reproducible for
    the DuckDB oracle; every ranking has an id tie-break, so the result is
    fully deterministic.
    """
    assigned = nearest_centroid(
        embeddings, centroids, vec_col=vec_col, exact=exact
    ).select(id_col, vec_col, "centroid_id")
    q = F.broadcast(query_vec.select(F.col(vec_col).alias("__qvec")))
    probe = (
        centroids.crossJoin(q)
        .withColumn("sim_q", cosine(F.col("centroid_vec"), F.col("__qvec"), exact=exact))
        .orderBy(F.col("sim_q").desc(), F.col("centroid_id").asc())
        .limit(n_probe)
        .select("centroid_id")
    )
    return (
        assigned.join(F.broadcast(probe), on="centroid_id")
        .crossJoin(q)
        .withColumn("cosine_sim", cosine(F.col(vec_col), F.col("__qvec"), exact=exact))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, "centroid_id", "cosine_sim")
    )


def kcenter_greedy(
    df: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Farthest-point (k-center greedy) coreset selection — the
    2-approximation to the k-center cover, the standard diversity-first
    data-selection pass (Sener & Savarese, "Active Learning for CNNs: A
    Core-Set Approach", ICLR 2018): seed with the lowest id, then k-1
    times pick the point FARTHEST from the selected set and fold its
    distances into the per-point minimum.

    Distances are squared L2 in the repo's exact fixed-point discipline
    (per-term ``floor((aᵢ-bᵢ)²·1e12)`` folded as BIGINT — engine-stable,
    so the whole greedy trajectory is deterministic and DuckDB-oracle-
    able; ties break on the id). Returns ``(sel_rank, <id_col>,
    covered_d2)`` where covered_d2 is the selected point's distance to
    the prior set (NULL for the seed) — the non-increasing coverage-
    radius sequence.

    Scale shape: k-1 iterations, each ONE map pass over the corpus
    (the candidate's min-distance column updates against a single
    LITERAL center — no join, no shuffle) plus one TakeOrdered scalar.
    Driver traffic is k rows total; the corpus never leaves executors.
    At 100 TB this is k linear scans — the price of the greedy
    guarantee — and the per-iteration localCheckpoint keeps the plan
    flat instead of k-deep."""
    if k < 1:
        raise ValueError("k must be >= 1")
    spark = df.sparkSession
    # NULL ids can neither be selected nor excluded (NULL != x is NULL),
    # so they leave the pool up front; the feasibility guard counts
    # DISTINCT ids — duplicate-id rows vanish together when their id is
    # selected, so rows alone overstate the selectable pool (review r11)
    pts = (
        df.select(id_col, vec_col)
        .filter(F.col(id_col).isNotNull())
        .localCheckpoint(eager=True)
    )
    n = pts.select(id_col).distinct().count()
    if n < k:
        raise ValueError(
            f"kcenter_greedy asked for k={k} centers from {n} distinct "
            "non-null ids — a smaller pool cannot yield k selections"
        )
    seed = pts.orderBy(F.col(id_col).asc()).first()
    dim = len(seed[vec_col])
    id_type = dict(pts.dtypes)[id_col]

    def d2_to(center) -> F.Column:
        terms = []
        for i in range(dim):
            diff = F.col(vec_col).getItem(i).cast("double") - F.lit(
                float(center[i])
            )
            terms.append(F.floor(diff * diff * F.lit(1e12)).cast("long"))
        total = terms[0]
        for t in terms[1:]:
            total = total + t
        return total

    selected = [(1, seed[id_col], None)]
    # selected ids leave the candidate pool (duplicate POINTS at
    # distance 0 may still be chosen — correct greedy behavior — but an
    # already-selected ID must never repeat; without the filter an
    # all-zero tail would re-pick the seed, review r11)
    cur = pts.filter(F.col(id_col) != F.lit(seed[id_col])).withColumn(
        "__md", d2_to(seed[vec_col])
    )
    for rank in range(2, k + 1):
        cur = cur.localCheckpoint(eager=True)
        nxt = cur.orderBy(F.col("__md").desc(), F.col(id_col).asc()).first()
        selected.append((rank, nxt[id_col], int(nxt["__md"])))
        cur = cur.filter(F.col(id_col) != F.lit(nxt[id_col])).withColumn(
            "__md", F.least(F.col("__md"), d2_to(nxt[vec_col]))
        )
    return spark.createDataFrame(
        selected, f"sel_rank int, {id_col} {id_type}, covered_d2 long"
    )
