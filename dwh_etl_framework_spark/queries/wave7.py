"""Round-6 wave-3 operators: retrieval scoring, robust scaling, skew
profiling, a hand-rolled bloom-filter join prefilter, and epoch shuffling.

- **x69_bm25_topk** — BM25 relevance of a fixed query term set over the
  corpus, top-50 docs. Fixed-point and log-free: the idf ratio
  ``(N-df+0.5)/(df+0.5)`` is kept rational (the x51 rule — libm ``log``
  differs across engines in the last ulp; the ranking is unchanged
  because log is monotone) and every division is integer ``DIV`` with a
  documented floor-compose convention.
- **x70_robust_scale** — per-source median/MAD robust z-score of doc
  length with a 3-MAD clip flag: the outlier winsorization step a
  curation pipeline runs before mixing length-sensitive quality signals
  across sources with different length regimes.
- **x71_key_skew_profile** — per event-type key-skew report over user
  counts: distinct keys, max-key share, exact Gini coefficient. This is
  the *shuffle-planning* diagnostic for the 100 TB path: it tells you
  which groupBy keys need salting (x18) before they hit a real cluster.
- **x72_bloom_prefilter_join** — a bloom filter built with plain Spark
  expressions (xxhash64 k-seeds → bit positions → per-word ``bit_or``
  into a 1024×64-bit array, collected once and inlined as a literal),
  applied as a map-only probe-side prefilter ahead of an exact join.
  The container's Spark build does not expose ``bloom_filter_agg`` SQL
  (round-6 env probe), so this closes the gap with our own operator.
  The oracle is the PLAIN join — which proves end-to-end that the
  filter admits no false negatives (false positives are removed by the
  exact join that follows, exactly how a runtime bloom join filter is
  deployed).
- **x73_epoch_shuffle** — deterministic per-epoch training-order
  assignment: every doc gets, for each epoch, a 16-way shard (first
  md5 hex digit) and a position within the shard (md5 order). This is
  how a 100 TB corpus is "shuffled" for training without a global sort:
  shards are independent sorted units (one window partition each), and
  the permutation is reproducible from the key alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dwh_etl_framework_spark.queries.registry import fixtures, query

#: x69: the fixed query term set (present across the fixture corpus with
#: distinct document frequencies) and the result cap.
BM25_TERMS = ("vector", "stream", "spark")
BM25_TOPK = 50

#: x70: clip at 3 MADs from the per-source median.
MAD_CLIP = 3

#: x72: bloom geometry — m = 1024 words × 64 bits = 65536 bits, k = 4
#: seeded xxhash64 probes. For the build side here (≤ ~30k keys at sf1)
#: the expected FPR is ≤ ~2%; the exact join removes those.
BLOOM_WORDS = 1024
BLOOM_SEEDS = (0, 1, 2, 3)

#: x73: epochs materialized per doc.
SHUFFLE_EPOCHS = (0, 1)

_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_TERMS)


@query(
    "x69_bm25_topk",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               len(string_split(text, ' ')) AS dl,
               unnest(string_split(text, ' ')) AS tok
        FROM documents
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
        FROM documents
    ),
    idf AS (
        SELECT tok,
               (2 * c.n_docs - 2 * COUNT(DISTINCT doc_id) + 1) * 1000000
                   // (2 * COUNT(DISTINCT doc_id) + 1) AS idf_ppm
        FROM tf, corpus c
        GROUP BY tok, c.n_docs
    ),
    scored AS (
        SELECT tf.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_terms_hit,
               CAST(SUM(idf.idf_ppm * 22 * tf.tf * c.avgdl_fp
                   // (10 * tf.tf * c.avgdl_fp + 3 * c.avgdl_fp + 9 * tf.dl)
               ) AS BIGINT) AS bm25_ppm
        FROM tf JOIN idf USING (tok), corpus c
        GROUP BY tf.doc_id
    )
    SELECT doc_id, n_terms_hit, bm25_ppm,
           CAST(row_number() OVER (ORDER BY bm25_ppm DESC, doc_id ASC)
                AS BIGINT) AS rk
    FROM scored
    ORDER BY rk LIMIT {BM25_TOPK}
    """,
)
def x69_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 retrieval scoring: BM25 (k1=1.2, b=0.75) of a fixed term set,

    top-50 docs. Everything is integer: with ``a = avgdl_fp = T DIV N``
    the per-(doc,term) score is

        idf_ppm  = (2N - 2df + 1)·10⁶ DIV (2df + 1)
        score    = idf_ppm·22·tf·a DIV (10·tf·a + 3·a + 9·dl)

    (the ×2/×10·a clears the 0.5 / 0.25·k1·b rationals; the floor-compose
    convention — floor(idf) before the tf quotient — is part of the
    operator's definition so both engines agree bit-for-bit; magnitudes
    stay < 4·10¹⁷ through sf1, inside int64). Scale shape: one token
    explode filtered to the term set (predicate before the shuffle), the
    corpus aggregate and the |terms|-row idf table broadcast, the per-doc
    sum shuffles on doc_id once, and the global top-50 lowers to
    TakeOrderedAndProject — no single-partition sort of the corpus.
    Reference parity: the reference has no retrieval scorer; this extends
    the X3 text tier (SURVEY §2c)."""
    t = fixtures(spark, sf_dir)
    toks = t.documents.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("dl"),
        F.explode(F.split("text", " ")).alias("tok"),
    ).filter(F.col("tok").isin(*BM25_TERMS))
    # `tf` (≤ |terms| rows per matching doc) feeds both idf and scored —
    # cut it too, or the token explode over text runs twice.
    tf = toks.groupBy("doc_id", "tok").agg(
        F.max("dl").alias("dl"), F.count(F.lit(1)).alias("tf")
    ).localCheckpoint(eager=False)
    # lineage cut at the SMALL table (the x65 rule): the 1-row corpus
    # aggregate feeds three consumers (idf + scored's crossJoin + its own
    # broadcast); uncut, Catalyst clones the whole text-scanning subtree
    # per consumer and documents.parquet scans 3×.
    corpus = t.documents.agg(
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
    scored = (
        tf.join(F.broadcast(idf), "tok")
        .crossJoin(F.broadcast(corpus))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms_hit"),
            F.sum(
                F.expr(
                    "idf_ppm * 22 * tf * avgdl_fp"
                    " DIV (10 * tf * avgdl_fp + 3 * avgdl_fp + 9 * dl)"
                )
            ).alias("bm25_ppm"),
        )
    )
    top = scored.orderBy(
        F.col("bm25_ppm").desc(), F.col("doc_id").asc()
    ).limit(BM25_TOPK)
    return top.withColumn(
        "rk",
        F.row_number().over(
            Window.orderBy(F.col("bm25_ppm").desc(), F.col("doc_id").asc())
        ).cast("long"),
    )


def group_median(df: DataFrame, col: str, out: str) -> DataFrame:
    """Exact per-source median via window-sort middles (x70's recipe):

    average of the rows at positions (n+1) DIV 2 and n DIV 2 + 1 under a
    (value, doc_id) sort per source. Integer middle-row arithmetic on
    purpose: the double spelling ``(cnt+1)/2`` silently never matches for
    even n (it is x.5), which picked only the upper middle — a bug the
    round-6 sf1 sweep caught (sources hold 2500 docs at sf1 but 25 at
    sf0.01, so every smaller SF masked it)."""
    w = Window.partitionBy("source").orderBy(F.col(col).asc(), F.col("doc_id").asc())
    wc = Window.partitionBy("source")
    ranked = df.select(
        "source",
        F.col(col).alias("_v"),
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(wc).alias("_cnt"),
    )
    return (
        ranked.filter(
            (F.col("_rn") == F.expr("(_cnt + 1) DIV 2"))
            | (F.col("_rn") == F.expr("_cnt DIV 2 + 1"))
        )
        .groupBy("source")
        .agg(F.avg("_v").alias(out))
    )


@query(
    "x70_robust_scale",
    oracle=f"""
    WITH med AS (
        SELECT source, median(n_chars) AS med
        FROM documents GROUP BY source
    ),
    dev AS (
        SELECT d.doc_id, d.source, d.n_chars, m.med,
               abs(d.n_chars - m.med) AS dev
        FROM documents d JOIN med m USING (source)
    ),
    mad AS (
        SELECT source, median(dev) AS mad FROM dev GROUP BY source
    )
    SELECT v.doc_id, v.source, v.n_chars, v.med, m.mad,
           CASE WHEN m.mad > 0
                THEN CAST(floor((v.n_chars - v.med) * 1000000 / m.mad)
                          AS BIGINT)
           END AS z_ppm,
           v.dev > {MAD_CLIP} * m.mad AS is_clipped
    FROM dev v JOIN mad m USING (source)
    """,
)
def x70_robust_scale(
    spark: SparkSession, sf_dir: str, *, lineage_cut: bool = True
) -> DataFrame:
    """X3 robust scaling: per-source median/MAD z-score of doc length

    with a 3-MAD clip flag. The median is computed the scale-honest way:
    NOT via Spark's ``percentile`` aggregate (which buffers every group
    value in executor memory — an OOM at 100 TB) but as the average of
    the two middle elements under a per-source window sort (row_number +
    count over the same partition ⇒ one exchange, and window sorts spill
    to disk). The MAD reuses the identical recipe on |x−med|. Both
    medians land on exact .0/.5 doubles (integer inputs), the z-score is
    one subtraction, one multiply and one division in IEEE double —
    identical op order on both engines — so floor() agrees bit-for-bit.
    Joins of the ~|sources|-row median/MAD tables broadcast."""
    t = fixtures(spark, sf_dir)
    base = t.documents.select("doc_id", "source", "n_chars")
    med = group_median(base.withColumn("n_chars", F.col("n_chars").cast("double")), "n_chars", "med")
    # lineage cut at `dev` (the x65 rule): it feeds both the MAD median
    # and the final projection — uncut, each consumer re-scans documents
    # and re-runs the first median window. Five numeric columns per doc,
    # far smaller than a re-scan.
    dev = base.join(F.broadcast(med), "source").select(
        "doc_id",
        "source",
        "n_chars",
        "med",
        F.abs(F.col("n_chars") - F.col("med")).alias("dev"),
    )
    if lineage_cut:
        dev = dev.localCheckpoint(eager=False)
    mad = group_median(dev, "dev", "mad")
    return dev.join(F.broadcast(mad), "source").select(
        "doc_id",
        "source",
        "n_chars",
        "med",
        "mad",
        F.when(
            F.col("mad") > 0,
            F.floor((F.col("n_chars") - F.col("med")) * 1000000 / F.col("mad")),
        ).alias("z_ppm"),
        (F.col("dev") > MAD_CLIP * F.col("mad")).alias("is_clipped"),
    )


@query(
    "x71_key_skew_profile",
    oracle="""
    WITH c AS (
        SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY event_type, user_id
    ),
    ranked AS (
        SELECT event_type, c,
               CAST(row_number() OVER (
                   PARTITION BY event_type ORDER BY c ASC, user_id ASC
               ) AS BIGINT) AS i,
               CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        FROM c
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(c) AS BIGINT) AS n_events,
           MAX(c) AS max_user_events,
           CAST(MAX(c) * 1000000 // SUM(c) AS BIGINT) AS top_share_ppm,
           CAST(SUM((2 * i - n - 1) * c) * 1000000 // (MAX(n) * SUM(c))
               AS BIGINT) AS gini_ppm
    FROM ranked
    GROUP BY event_type
    """,
)
def x71_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-planning diagnostic: per event-type skew of the per-user

    key distribution — distinct keys, heaviest-key ppm share, and the
    exact Gini coefficient Σ(2i−n−1)·cᵢ / (n·Σc) over counts ranked
    ascending (ties broken by user_id; equal counts make the numerator
    tie-order invariant, so the tiebreak is for engine determinism, not
    semantics). This is the report that decides which keys get the x18
    salted-join treatment before a 1000-executor run. All math is
    integer. Shape: one (type,user) count shuffle, a type-partitioned
    rank window, and a final type agg that reuses the window's
    partitioning — two exchanges total, no collect."""
    t = fixtures(spark, sf_dir)
    c = t.events.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("c").asc(), F.col("user_id").asc()
    )
    wp = Window.partitionBy("event_type")
    ranked = c.select(
        "event_type",
        "c",
        F.row_number().over(w).cast("long").alias("i"),
        F.count(F.lit(1)).over(wp).cast("long").alias("n"),
    )
    return ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("c").alias("n_events"),
        F.max("c").alias("max_user_events"),
        F.expr("MAX(c) * 1000000 DIV SUM(c)").alias("top_share_ppm"),
        F.expr(
            "SUM((2 * i - n - 1) * c) * 1000000 DIV (MAX(n) * SUM(c))"
        ).alias("gini_ppm"),
    )


@query(
    "x72_bloom_prefilter_join",
    oracle="""
    SELECT n.n_name,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY n.n_name
    """,
)
def x72_bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hand-rolled bloom-filter join prefilter (this Spark build exposes

    no ``bloom_filter_agg`` SQL — round-6 env probe): build side =
    BUILDING-segment customer keys, k=4 seeded xxhash64 probes into
    m=65536 bits packed as 1024 longs via per-word ``bit_or``; the ≤8 KiB
    filter is collected once (the x35 broadcast-centroid convention: a
    small bounded artifact may cross the driver) and inlined as an array
    literal, so the probe over orders is MAP-ONLY — four element_at/
    shift/mask expressions, no join, no shuffle. Survivors (~segment
    share + FPR ≈ 2%) then run the exact join. At 100 TB this is the
    classic semi-join reduction: the probe side never shuffles rows the
    build side cannot match. The oracle is the PLAIN three-table join —
    hash-equality proves the filter admits no false negatives and that
    the exact join removed every false positive."""
    t = fixtures(spark, sf_dir)
    cust = t.customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey", "c_nationkey"
    )
    words = (
        cust.select(
            F.explode(
                F.array(
                    *[
                        F.pmod(
                            F.xxhash64(F.col("c_custkey"), F.lit(seed)),
                            F.lit(BLOOM_WORDS * 64),
                        )
                        for seed in BLOOM_SEEDS
                    ]
                )
            ).alias("pos")
        )
        .select(
            (F.col("pos") / 64).cast("int").alias("word"),
            (F.col("pos") % 64).cast("int").alias("bit"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), bit))").alias("w"))
        .collect()
    )
    filt = [0] * BLOOM_WORDS
    for r in words:
        filt[r["word"]] = r["w"]
    arr = F.array(*[F.lit(w).cast("long") for w in filt])

    def _hit(seed):
        # shiftright() only takes a literal shift count, so the per-row
        # bit test is an expr: element_at picks the 64-bit word, getbit
        # tests the in-word position. `arr` is the inlined filter.
        pos = F.pmod(F.xxhash64(F.col("o_custkey"), F.lit(seed)), F.lit(BLOOM_WORDS * 64))
        word = F.element_at(arr, (pos / 64).cast("int") + 1)
        return F.expr("getbit(_w{0}, _b{0}) = 1".format(seed)), word, (pos % 64).cast("int")

    pre = t.orders
    conds = []
    for seed in BLOOM_SEEDS:
        cond, word, bit = _hit(seed)
        pre = pre.withColumn(f"_w{seed}", word).withColumn(f"_b{seed}", bit)
        conds.append(cond)
    probe = conds[0]
    for cond in conds[1:]:
        probe = probe & cond
    pre = pre.filter(probe).drop(
        *[c for seed in BLOOM_SEEDS for c in (f"_w{seed}", f"_b{seed}")]
    )
    return (
        pre.join(F.broadcast(cust), pre.o_custkey == cust.c_custkey)
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )


@query(
    "x73_epoch_shuffle",
    oracle=f"""
    WITH h AS (
        SELECT doc_id, e.epoch,
               md5(CAST(doc_id AS VARCHAR) || ':' || CAST(e.epoch AS VARCHAR))
                   AS h
        FROM documents,
             (SELECT unnest([{", ".join(str(e) for e in SHUFFLE_EPOCHS)}])
                     AS epoch) e
    )
    SELECT doc_id, CAST(epoch AS INTEGER) AS epoch,
           substring(h, 1, 1) AS shard,
           CAST(row_number() OVER (
               PARTITION BY epoch, substring(h, 1, 1)
               ORDER BY h ASC, doc_id ASC
           ) AS BIGINT) AS pos
    FROM h
    """,
)
def x73_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-order assignment: per epoch, each doc gets

    a 16-way shard (first md5 hex digit of ``doc_id:epoch``) and a
    position within the shard (md5 order, doc_id tiebreak). The point of
    the shape: a 100 TB corpus is never globally sorted — the shuffle
    is hash-sharded and each (epoch, shard) sorts independently in one
    window partition (spilling, parallel across 16·|epochs| partitions;
    widen the digit count to scale shard parallelism). Reproducible from
    the key alone: re-running on a grown corpus preserves nothing (by
    design — epoch orders are regenerated per corpus snapshot), but
    re-running on the SAME corpus is bit-identical, which is what
    training-data lineage audits need."""
    t = fixtures(spark, sf_dir)
    h = t.documents.select(
        "doc_id",
        F.explode(F.array(*[F.lit(e) for e in SHUFFLE_EPOCHS])).alias("epoch"),
    ).select(
        "doc_id",
        "epoch",
        F.md5(
            F.concat_ws(":", F.col("doc_id").cast("string"), F.col("epoch").cast("string"))
        ).alias("h"),
    )
    w = Window.partitionBy("epoch", F.substring("h", 1, 1)).orderBy(
        F.col("h").asc(), F.col("doc_id").asc()
    )
    return h.select(
        "doc_id",
        F.col("epoch").cast("int").alias("epoch"),
        F.substring("h", 1, 1).alias("shard"),
        F.row_number().over(w).cast("long").alias("pos"),
    )
