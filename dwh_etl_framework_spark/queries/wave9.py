"""Round-6 wave-5 operators: semantic dedup, data-layout planning, and
importance-weighted data selection.

- **x81_semantic_dedup** — SemDeDup (Abbas et al. 2023, arXiv:2303.09540):
  coarse k-means-style clustering bounds the pair problem to within-cluster
  blocks; non-minimal members of any pair with cosine ≥ τ are dropped.
  The published LLM-corpus curation step between exact dedup (x01) and
  MinHash near-dup (x03): it removes *semantic* duplicates that share no
  n-grams at all.
- **x82_zorder_layout** — Z-order (Morton) interleaving of two query
  columns into one sort key, then range-sliced into files; per-file
  min/max zone maps + a probe showing which files a 2-D predicate can
  skip. The data-layout pass behind Delta/Iceberg ``OPTIMIZE ZORDER BY``,
  expressed as pure integer arithmetic so the DuckDB oracle is
  bit-identical.
- **x83_dsir_weights** — importance-weighted data selection in the DSIR
  family (Xie et al. 2023, arXiv:2302.03169): token-level target/corpus
  frequency ratios (exact integer ppm) summed per document; documents
  whose mean token weight beats the corpus-wide target share are
  selected. The hashed-feature generalization runs the same two
  exchanges.
- **f28_compaction_plan** — small-file compaction planning: a file
  inventory (metadata, O(#files) — never the data) is packed into
  size-quantized bins by a running-sum window, the same shape Spark's own
  ``FilePartition`` packing and Delta ``OPTIMIZE`` binning use.

All outputs are integer/boolean/string-only — canonicalizer-safe by the
DRIVER_WINDOW schema lint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dwh_etl_framework_spark.operators import similarity
from dwh_etl_framework_spark.queries.registry import fixtures, query

#: x81: codebook = embeddings with vec_id < K (deterministic coarse
#: quantizer — the trained-codebook path is x35); membership capped per
#: cluster (degenerate-cluster guard); pairs ≥ TAU are semantic dups.
SEMDEDUP_K = 16
SEMDEDUP_CAP = 64
SEMDEDUP_TAU = 0.4

#: x82: bit width of each interleaved dimension (2·21 = 42 result bits,
#: comfortably BIGINT); number of target files; the probe predicate.
Z_BITS = 21
Z_FILES = 64
PROBE_CK_LO, PROBE_CK_HI = 1000, 2000
PROBE_DAY_LO, PROBE_DAY_HI = 0, 365

#: x83: the target distribution is the 'src0' slice of the corpus.
DSIR_TARGET = "src0"

#: f28: target bytes per compacted output file.
COMPACT_TARGET = 16384


def _fixed_dot(a: str, b: str) -> str:
    """DuckDB fragment: Σ floor(a_i·b_i·1e12) as BIGINT (the portable
    fixed-point reduction — operators/similarity._dot_fixed)."""
    return (
        f"SUM(CAST(floor(CAST({a} AS DOUBLE) * CAST({b} AS DOUBLE) * 1e12)"
        " AS BIGINT))"
    )


_X81_ORACLE = f"""
    WITH ee AS (
        SELECT vec_id, embedding,
               unnest(generate_series(1, len(embedding))) AS i
        FROM embeddings
    ),
    nrm AS (
        SELECT vec_id, {_fixed_dot('embedding[i]', 'embedding[i]')} AS n2
        FROM ee GROUP BY vec_id
    ),
    c AS (
        SELECT vec_id AS centroid_id, embedding AS cvec
        FROM embeddings WHERE vec_id < {SEMDEDUP_K}
    ),
    vc AS (
        SELECT ee.vec_id, c.centroid_id,
               {_fixed_dot('ee.embedding[ee.i]', 'c.cvec[ee.i]')} AS dot
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
    members AS (
        SELECT vec_id, centroid_id,
               row_number() OVER (
                   PARTITION BY centroid_id ORDER BY vec_id
               ) AS member_rank
        FROM assigned
    ),
    pairs AS (
        SELECT a.vec_id AS va, b.vec_id AS vb,
               {_fixed_dot('ea.embedding[ea.i]', 'eb.embedding[eb.i]')} AS dot
        FROM members a
        JOIN members b
          ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
        JOIN ee ea ON ea.vec_id = a.vec_id
        JOIN ee eb ON eb.vec_id = b.vec_id AND eb.i = ea.i
        WHERE a.member_rank <= {SEMDEDUP_CAP}
          AND b.member_rank <= {SEMDEDUP_CAP}
        GROUP BY 1, 2
    ),
    dropped AS (
        SELECT DISTINCT p.vb AS vec_id
        FROM pairs p
        JOIN nrm na ON na.vec_id = p.va
        JOIN nrm nb ON nb.vec_id = p.vb
        WHERE CAST(p.dot AS DOUBLE)
              / (sqrt(CAST(na.n2 AS DOUBLE))
                 * sqrt(CAST(nb.n2 AS DOUBLE))) >= {SEMDEDUP_TAU}
    )
    SELECT m.vec_id, m.centroid_id, m.member_rank,
           (d.vec_id IS NULL) AS is_kept
    FROM members m LEFT JOIN dropped d ON d.vec_id = m.vec_id
"""


@query("x81_semantic_dedup", oracle=_X81_ORACLE)
def x81_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1/X2 semantic deduplication (SemDeDup): coarse-quantize the corpus

    onto {SEMDEDUP_K} codebook vectors (broadcast argmax, zero-shuffle
    assignment — the x06c convention), then drop the non-minimal member of
    every within-cluster pair with exact cosine ≥ {SEMDEDUP_TAU}.

    Scale shape: pairs exist only inside a cluster — one centroid-keyed
    exchange, then Σ|cluster|² independent pair blocks (k ≈ √N ⇒ O(N^1.5)
    total work); membership is hard-capped at {SEMDEDUP_CAP} per cluster
    (deterministic by vec_id; uncompared overflow rows are KEPT — the
    conservative direction for a dedup screen), so a degenerate codebook
    can never re-open the quadratic hole. All cosines are the fixed-point
    reduction, so the oracle matches bit-for-bit."""
    t = fixtures(spark, sf_dir)
    centroids = t.embeddings.filter(F.col("vec_id") < SEMDEDUP_K).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid_vec"),
    )
    return similarity.semantic_dedup(
        t.embeddings,
        centroids,
        tau=SEMDEDUP_TAU,
        cap=SEMDEDUP_CAP,
        exact=True,
    )


def _z_expr(x: str, y: str, div: str) -> str:
    """Morton interleave of two non-negative BIGINTs, low {Z_BITS} bits
    each, as pure integer arithmetic (portable across Spark's ``DIV`` and
    DuckDB's ``//`` — no dialect-specific bit intrinsics)."""
    terms = []
    for i in range(Z_BITS):
        terms.append(f"(({x} {div} {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({y} {div} {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


_X82_DAY_DUCK = "datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))"
_X82_ORACLE = f"""
    WITH keyed AS (
        SELECT o_orderkey, o_custkey,
               CAST({_X82_DAY_DUCK} AS BIGINT) AS day_nr,
               CAST({_z_expr('o_custkey', f'CAST({_X82_DAY_DUCK} AS BIGINT)', '//')}
                    AS BIGINT) AS zval
        FROM orders
    ),
    filed AS (
        SELECT o_custkey, day_nr,
               ntile({Z_FILES}) OVER (ORDER BY zval, o_orderkey) AS file_id
        FROM keyed
    )
    SELECT file_id,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(o_custkey) AS min_ck, MAX(o_custkey) AS max_ck,
           MIN(day_nr) AS min_day, MAX(day_nr) AS max_day,
           (MIN(o_custkey) > {PROBE_CK_HI} OR MAX(o_custkey) < {PROBE_CK_LO}
            OR MIN(day_nr) > {PROBE_DAY_HI} OR MAX(day_nr) < {PROBE_DAY_LO})
               AS probe_skips
    FROM filed
    GROUP BY file_id
"""


@query("x82_zorder_layout", oracle=_X82_ORACLE)
def x82_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-layout engineering: Z-order (Morton) clustering of orders on

    (o_custkey, order-day), sliced into {Z_FILES} equal files, with
    per-file min/max zone maps and a 2-D probe predicate
    (custkey ∈ [{PROBE_CK_LO},{PROBE_CK_HI}] ∧ day ∈
    [{PROBE_DAY_LO},{PROBE_DAY_HI}]) showing which files the zone maps
    skip — the pass behind Delta/Iceberg ``OPTIMIZE ZORDER BY``. A
    linear (single-column) sort clusters one dimension and scatters the
    other; the Morton curve keeps BOTH selective, which is the whole
    point of the layout.

    The interleave is {Z_BITS}-bit pure integer arithmetic (no dialect
    bit intrinsics), so the DuckDB oracle is bit-identical. Scale shape:
    the production write path is ``repartitionByRange(zval)`` + sorted
    write (range exchange, no global window); the ntile assignment here
    is the deterministic oracle twin of that range slicing, and the
    zone-map audit itself is a metadata-sized aggregate."""
    t = fixtures(spark, sf_dir)
    day_nr = "CAST(datediff(o_orderdate, DATE '1995-01-01') AS BIGINT)"
    keyed = t.orders.select(
        "o_orderkey",
        "o_custkey",
        F.expr(day_nr).alias("day_nr"),
        F.expr(f"CAST({_z_expr('o_custkey', day_nr, 'DIV')} AS BIGINT)").alias(
            "zval"
        ),
    )
    filed = keyed.withColumn(
        "file_id", F.ntile(Z_FILES).over(Window.orderBy("zval", "o_orderkey"))
    )
    return filed.groupBy("file_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min("o_custkey").alias("min_ck"),
        F.max("o_custkey").alias("max_ck"),
        F.min("day_nr").alias("min_day"),
        F.max("day_nr").alias("max_day"),
        (
            (F.min("o_custkey") > PROBE_CK_HI)
            | (F.max("o_custkey") < PROBE_CK_LO)
            | (F.min("day_nr") > PROBE_DAY_HI)
            | (F.max("day_nr") < PROBE_DAY_LO)
        ).alias("probe_skips"),
    )


_X83_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, source, unnest(string_split(text, ' ')) AS token
        FROM documents
    ),
    counts AS (
        SELECT token,
               CAST(SUM(CASE WHEN source = '{DSIR_TARGET}' THEN 1 ELSE 0 END)
                    AS BIGINT) AS cnt_tgt,
               CAST(COUNT(*) AS BIGINT) AS cnt_all
        FROM toks GROUP BY token
    ),
    w AS (
        SELECT token, CAST(cnt_tgt * 1000000 // cnt_all AS BIGINT)
                          AS weight_ppm
        FROM counts
    ),
    ov AS (
        SELECT CAST(SUM(cnt_tgt) * 1000000 // SUM(cnt_all) AS BIGINT)
                   AS overall_ppm
        FROM counts
    ),
    scored AS (
        SELECT t.doc_id, t.source,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(w.weight_ppm) AS BIGINT) AS score_ppm
        FROM toks t JOIN w ON w.token = t.token
        GROUP BY 1, 2
    )
    SELECT s.doc_id, s.source, s.n_tokens, s.score_ppm,
           CAST(s.score_ppm // s.n_tokens AS BIGINT) AS mean_weight_ppm,
           (s.score_ppm // s.n_tokens >= ov.overall_ppm) AS selected
    FROM scored s CROSS JOIN ov
"""


@query("x83_dsir_weights", oracle=_X83_ORACLE)
def x83_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 importance-weighted data selection (DSIR family): each token's

    weight is its target-share ratio target_count·10⁶ DIV corpus_count
    (exact integer ppm — the hashed-n-gram variant changes only the
    grouping key), a document scores the sum over its tokens, and it is
    selected when its mean token weight beats the corpus-wide target
    share. Approximates sampling toward the '{DSIR_TARGET}' distribution
    without training a classifier.

    Scale shape: two exchanges total — one token-keyed aggregate builds
    the weight table (vocabulary-sized ≪ corpus, broadcast back), one
    doc-keyed aggregate scores documents; the corpus-share scalar is a
    1-row pinned broadcast (the quality.py convention). All-integer ⇒
    bit-reproducible under any partitioning."""
    t = fixtures(spark, sf_dir)
    toks = t.documents.select(
        "doc_id", "source", F.explode(F.split("text", " ")).alias("token")
    )
    # one token-keyed aggregate carries BOTH counts; the corpus-wide share
    # then reduces the vocab-sized table instead of re-scanning the corpus
    # (round-6 plan audit: the naive third scan was a full corpus pass).
    counts = toks.groupBy("token").agg(
        F.expr(
            f"CAST(SUM(CASE WHEN source = '{DSIR_TARGET}' THEN 1 ELSE 0 END)"
            " AS BIGINT)"
        ).alias("cnt_tgt"),
        F.count(F.lit(1)).cast("long").alias("cnt_all"),
    ).localCheckpoint(eager=False)
    weights = counts.select(
        "token",
        F.expr("CAST(cnt_tgt * 1000000 DIV cnt_all AS BIGINT)").alias(
            "weight_ppm"
        ),
    )
    overall = F.broadcast(
        counts.agg(
            F.expr(
                "CAST(SUM(cnt_tgt) * 1000000 DIV SUM(cnt_all) AS BIGINT)"
            ).alias("overall_ppm")
        )
    )
    scored = (
        toks.join(F.broadcast(weights), on="token")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("weight_ppm").cast("long").alias("score_ppm"),
        )
    )
    return scored.crossJoin(overall).select(
        "doc_id",
        "source",
        "n_tokens",
        "score_ppm",
        F.expr("CAST(score_ppm DIV n_tokens AS BIGINT)").alias("mean_weight_ppm"),
        F.expr("score_ppm DIV n_tokens >= overall_ppm").alias("selected"),
    )


_F28_ORACLE = f"""
    WITH files AS (
        SELECT event_type, CAST(ts AS DATE) AS file_date,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(length(props) + length(event_type) + 16) AS BIGINT)
                   AS bytes
        FROM events
        GROUP BY 1, 2
    ),
    binned AS (
        SELECT *,
               CAST(COALESCE(SUM(bytes) OVER (
                   ORDER BY event_type, file_date
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) // {COMPACT_TARGET} AS BIGINT) AS bin_id
        FROM files
    )
    SELECT bin_id,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(n_rows) AS BIGINT) AS bin_rows,
           CAST(SUM(bytes) AS BIGINT) AS bin_bytes,
           MIN(event_type || '|' || CAST(file_date AS VARCHAR)) AS first_file,
           MAX(event_type || '|' || CAST(file_date AS VARCHAR)) AS last_file
    FROM binned
    GROUP BY bin_id
"""


@query("f28_compaction_plan", oracle=_F28_ORACLE)
def f28_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planner: the (event_type, day) file inventory

    is packed into ~{COMPACT_TARGET}-byte bins by quantizing the running
    byte total — bin = cum_bytes_before DIV target — exactly the shape of
    Spark's ``FilePartition`` packing and Delta ``OPTIMIZE`` binning.

    Scale shape: the planner's input is file METADATA (#files rows, built
    here by one metadata-sized aggregate standing in for a catalog
    listing), never the data, so the single-partition running-sum window
    is planning work measured in KB — the plan's bins then drive an
    embarrassingly parallel rewrite. Deterministic: inventory ordered by
    (event_type, day), integer byte sums."""
    t = fixtures(spark, sf_dir)
    files = t.events.groupBy(
        "event_type", F.to_date("ts").alias("file_date")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.length("props") + F.length("event_type") + F.lit(16))
        .cast("long")
        .alias("bytes"),
    )
    w = (
        Window.orderBy("event_type", "file_date")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    binned = (
        files.withColumn("cum_before", F.coalesce(F.sum("bytes").over(w), F.lit(0)))
        .withColumn(
            "bin_id",
            F.expr(f"CAST(cum_before DIV {COMPACT_TARGET} AS BIGINT)"),
        )
    )
    file_key = F.concat_ws(
        "|", F.col("event_type"), F.col("file_date").cast("string")
    )
    return binned.groupBy("bin_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum("n_rows").cast("long").alias("bin_rows"),
        F.sum("bytes").cast("long").alias("bin_bytes"),
        F.min(file_key).alias("first_file"),
        F.max(file_key).alias("last_file"),
    )
