"""Round-6 training-data operators (SURVEY.md §2c X1/X2/X3 extensions).

Six components a pretraining-data pipeline runs between curation and
training, each fixture-honest and value-oracled:

- **x53_pq_code_dedup** — coarse embedding dedup by PQ code equality:
  vectors sharing all 4 product-quantization codes land in one bucket
  (the "quantize then exact-match" near-dup screen ANN systems run
  before the expensive verify tier). Reuses x42's encoder.
- **x54_bpe_merge_step** — one BPE training iteration: find the globally
  most frequent adjacent token pair, apply the merge corpus-wide
  (leftmost non-overlapping, the BPE greedy rule), report per-doc token
  counts before/after. The tokenizer-induction inner loop.
- **x55_chunk_dedup** — exact dedup at CHUNK granularity (x38's window
  geometry, md5 digests): catches repeated boilerplate blocks inside
  otherwise-distinct documents — what a RAG index dedups on.
- **x57_mutual_knn_graph** — per-node in-degree and mutual-edge count of
  the exact top-3 cosine graph over a node sample: hubness / mutuality
  QA before ANN index construction.
- **x56_quality_decile_calibration** — per-language deciles of a
  vocabulary-richness score: the calibration matrix a curation team
  reads before picking per-language quality thresholds (x34 applies one
  threshold; this shows the whole distribution).
- **x58_mix_epoch_plan** — temperature mix planner: given per-source
  token counts and a global token budget, plan per-source sampled
  tokens (alpha=0.5 temperature weights) and the implied epoch count
  (how many passes over a source the sampler needs — >1e6 ppm means
  upsampling). The recipe table a data-mixing run executes.
- **x59_event_payload_profile** — per-event-type numeric profile of the
  JSON payload (n, sum, min/max, exact p50/p90 via rank — no
  interpolation, so quantiles are engine-portable integers).
- **x60_shingle_containment** — asymmetric containment |A∩B|/|A| over
  word-5-gram shingles: catches doc-inside-doc duplication that
  symmetric Jaccard (x02) under-scores. Correctness tier: at scale the
  LSH cascade (x02b) feeds candidate pairs; the full shingle self-join
  here is oracle-checkable on fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dwh_etl_framework_spark.operators import similarity
from dwh_etl_framework_spark.queries.chunking_lm import (
    CHUNK_STRIDE as _CHUNK_STRIDE,
    CHUNK_TOKENS as _CHUNK_TOKENS,
)
from dwh_etl_framework_spark.queries.mixing_pq import PQ_BEST_CTE, pq_encode
from dwh_etl_framework_spark.queries.registry import fixtures, query

#: x54: merged tokens are glued with this marker (not a space, so a
#: merged pair can't re-match inside the same iteration).
BPE_GLUE = "+"

#: x56: decile count.
N_TILES = 10

#: x57: node-set bound and k for the mutual-kNN graph.
KNN_GRAPH_NODES = 200
KNN_GRAPH_K = 3

#: x58: global token budget the mix is planned against, and the
#: temperature (alpha=0.5 ⇒ sqrt weights, the mT5/XLM-R recipe x41 uses
#: per-language — here per-source and budgeted).
MIX_BUDGET_TOKENS = 10**9

#: x60: containment is reported for pairs at or above this ppm threshold,
#: over docs with at least this many shingles.
CONTAIN_MIN_PPM = 500_000
CONTAIN_MIN_SHINGLES = 5


@query(
    "x53_pq_code_dedup",
    oracle=PQ_BEST_CTE
    + """
    , enc AS (
        SELECT vec_id,
               array_to_string(list(CAST(code AS INTEGER) ORDER BY s), '|')
                   AS codes
        FROM best GROUP BY vec_id
    )
    SELECT codes,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           MIN(vec_id) AS keep_vec_id
    FROM enc GROUP BY codes
    """,
)
def x53_pq_code_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 coarse near-dup screen: bucket vectors by their full PQ code

    word; identical codes ⇒ the vectors agree subspace-by-subspace at
    codebook resolution, the cheap first tier of embedding dedup (exact
    cosine runs only inside buckets, which x06d's capped-bucket machinery
    already covers). ``keep_vec_id`` = smallest id is the canonical
    survivor, the same rule as x01's exact-dedup tier.

    Scale shape: the PQ encode is map-only (x42); the bucket aggregate
    shuffles a ~10-byte code string per vector — never the embedding —
    with map-side partial aggregation. The same "shuffle the digest, not
    the payload" rule as x01's md5 exact dedup."""
    t = fixtures(spark, sf_dir)
    return pq_encode(t.embeddings).groupBy("codes").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.min("vec_id").alias("keep_vec_id"),
    )


@query(
    "x54_bpe_merge_step",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    bg AS (
        SELECT w[i] AS tok_a, w[i + 1] AS tok_b
        FROM (
            SELECT w, unnest(generate_series(1, len(w) - 1)) AS i
            FROM toks WHERE len(w) >= 2
        )
    ),
    top AS (
        SELECT tok_a, tok_b, CAST(count(*) AS BIGINT) AS pair_count
        FROM bg GROUP BY tok_a, tok_b
        ORDER BY pair_count DESC, tok_a, tok_b
        LIMIT 1
    )
    SELECT d.doc_id,
           t.tok_a AS merge_a, t.tok_b AS merge_b, t.pair_count,
           CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
           CAST(len(string_split(trim(replace(
               ' ' || d.text || ' ',
               ' ' || t.tok_a || ' ' || t.tok_b || ' ',
               ' ' || t.tok_a || '{BPE_GLUE}' || t.tok_b || ' ')), ' '))
               AS BIGINT) AS n_tokens_merged
    FROM documents d, top t
    """,
)
def x54_bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 one BPE training iteration: the globally most frequent adjacent

    token pair (ties: lexicographic, total order) is merged corpus-wide
    and each document reports its token count before/after — the inner
    loop a tokenizer trainer repeats vocab-size times. The merge itself
    is a leftmost non-overlapping string replace over the
    space-delimited text, which IS the BPE greedy rule: both engines'
    ``replace`` scan left-to-right and consume matches, so "a a a" with
    merge (a,a) yields [a+a, a] identically.

    Scale shape: the pair count is one map-side-combinable aggregate
    (the x51 shape); the winning pair is a TakeOrderedAndProject to one
    row, broadcast-cross-joined onto a map-only corpus rewrite. Per
    iteration: one shuffle of pair digests, zero shuffles of text."""
    t = fixtures(spark, sf_dir)
    toks = F.split("text", " ")
    pairs = (
        t.documents.filter(F.size(toks) >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - 1),
                    lambda i: F.struct(
                        F.element_at(toks, i).alias("tok_a"),
                        F.element_at(toks, i + 1).alias("tok_b"),
                    ),
                )
            ).alias("p")
        )
        .select("p.tok_a", "p.tok_b")
        .groupBy("tok_a", "tok_b")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .orderBy(F.desc("pair_count"), "tok_a", "tok_b")
        .limit(1)
    )
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    pattern = F.concat(
        F.lit(" "), F.col("tok_a"), F.lit(" "), F.col("tok_b"), F.lit(" ")
    )
    merged = F.concat(
        F.lit(" "),
        F.col("tok_a"),
        F.lit(BPE_GLUE),
        F.col("tok_b"),
        F.lit(" "),
    )
    return t.documents.crossJoin(F.broadcast(pairs)).select(
        "doc_id",
        F.col("tok_a").alias("merge_a"),
        F.col("tok_b").alias("merge_b"),
        "pair_count",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.split(F.trim(F.replace(padded, pattern, merged)), " "))
        .cast("bigint")
        .alias("n_tokens_merged"),
    )


@query(
    "x55_chunk_dedup",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS w,
               len(string_split(text, ' ')) AS n
        FROM documents
    ),
    starts AS (
        SELECT doc_id, w, n,
               unnest(generate_series(1, n, {_CHUNK_STRIDE})) AS start
        FROM toks
    ),
    chunks AS (
        SELECT doc_id,
               CAST((start - 1) // {_CHUNK_STRIDE} AS INTEGER) AS chunk_idx,
               md5(array_to_string(
                   w[start:least(start + {_CHUNK_TOKENS - 1}, n)], ' '))
                   AS digest
        FROM starts
    )
    SELECT digest,
           CAST(COUNT(*) AS BIGINT) AS n_copies,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           MIN(doc_id) AS keep_doc_id
    FROM chunks
    GROUP BY digest HAVING COUNT(*) >= 2
    """,
)
def x55_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1/X3 chunk-level exact dedup: the x38 chunking geometry (32-token

    windows every 24) digested with md5 and grouped — the dedup a RAG /
    retrieval index runs at CHUNK granularity, where document-level dedup
    (x01) misses repeated boilerplate blocks inside otherwise-distinct
    documents. Reports each duplicated chunk with its copy count, how
    many distinct documents carry it, and the canonical (min-doc_id)
    survivor.

    Scale shape: chunking is map-only (x38); only the 32-char md5 digest
    shuffles into the map-side-combined group — text never leaves its
    input partition (the x01 digest rule at chunk granularity)."""
    t = fixtures(spark, sf_dir)
    toks = F.split("text", " ")
    starts = F.sequence(F.lit(1), F.size(toks), F.lit(_CHUNK_STRIDE))
    chunks = t.documents.select(
        "doc_id",
        toks.alias("__w"),
        F.posexplode(starts).alias("chunk_idx", "__start"),
    ).select(
        "doc_id",
        F.md5(
            F.array_join(
                F.slice(F.col("__w"), F.col("__start"), _CHUNK_TOKENS), " "
            )
        ).alias("digest"),
    )
    return (
        chunks.groupBy("digest")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .filter(F.col("n_copies") >= 2)
    )


@query(
    "x56_quality_decile_calibration",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang,
               CAST(len(list_distinct(string_split(text, ' '))) * 1000000
                    // len(string_split(text, ' ')) AS BIGINT) AS score_ppm
        FROM documents
    ),
    tiled AS (
        SELECT lang, score_ppm,
               ntile({N_TILES}) OVER (
                   PARTITION BY lang ORDER BY score_ppm, doc_id
               ) AS decile
        FROM scored
    )
    SELECT lang, CAST(decile AS INTEGER) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(score_ppm) AS min_score_ppm,
           MAX(score_ppm) AS max_score_ppm
    FROM tiled GROUP BY lang, decile
    """,
)
def x56_quality_decile_calibration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X3 quality calibration matrix: per-language deciles of a

    vocabulary-richness score (distinct-token ppm — integer-exact), with
    each decile's doc count and score range. The distribution a curation
    team inspects before committing to per-language thresholds; x34
    applies one percentile cut, this exposes all ten. ``ntile`` is given
    a total order (score, doc_id) so both engines tile identically.

    Scale shape: the score is map-only; one language-keyed exchange
    feeds the ntile window, and the (lang, decile) aggregate is a
    refinement of that partitioning — AQE plans no second wide exchange
    of the doc rows (the x47 pattern)."""
    t = fixtures(spark, sf_dir)
    toks = F.split("text", " ")
    scored = t.documents.select(
        "doc_id",
        "lang",
        F.expr(
            "CAST(size(array_distinct(split(text, ' '))) * 1000000"
            " div size(split(text, ' ')) AS BIGINT)"
        ).alias("score_ppm"),
    )
    w = Window.partitionBy("lang").orderBy("score_ppm", "doc_id")
    return (
        scored.withColumn("decile", F.ntile(N_TILES).over(w))
        .groupBy("lang", "decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("score_ppm").alias("min_score_ppm"),
            F.max("score_ppm").alias("max_score_ppm"),
        )
        .select(
            "lang",
            F.col("decile").cast("int").alias("decile"),
            "n_docs",
            "min_score_ppm",
            "max_score_ppm",
        )
    )


@query(
    "x57_mutual_knn_graph",
    oracle=f"""
    WITH ev AS (
        SELECT vec_id, embedding,
               unnest(generate_series(1, len(embedding))) AS i
        FROM embeddings WHERE vec_id < {KNN_GRAPH_NODES}
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
        GROUP BY 1, 2
    ),
    edges AS (
        SELECT query_id, neighbor_id FROM (
            SELECT d.query_id, d.neighbor_id,
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
        ) WHERE rk <= {KNN_GRAPH_K}
    ),
    ind AS (
        SELECT neighbor_id AS vec_id, CAST(COUNT(*) AS BIGINT) AS in_degree
        FROM edges GROUP BY neighbor_id
    ),
    mut AS (
        SELECT a.query_id AS vec_id, CAST(COUNT(*) AS BIGINT) AS n_mutual
        FROM edges a JOIN edges b
          ON b.query_id = a.neighbor_id AND b.neighbor_id = a.query_id
        GROUP BY a.query_id
    )
    SELECT n.vec_id,
           CAST({KNN_GRAPH_K} AS BIGINT) AS out_degree,
           COALESCE(ind.in_degree, 0) AS in_degree,
           COALESCE(mut.n_mutual, 0) AS n_mutual
    FROM nrm n
    LEFT JOIN ind USING (vec_id)
    LEFT JOIN mut USING (vec_id)
    """,
)
def x57_mutual_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 k-NN graph health: over a node set (vec_id < 200), the exact

    top-3 cosine graph's per-node in-degree and mutual-edge count. ANN
    index QA: hub nodes (huge in-degree) and low mutuality predict poor
    recall before any index is built; kNN-graph symmetrization is also
    the first step of graph-based ANN (HNSW/NSG) construction. Cosines
    are exact fixed-point (the x32 convention) and every rank has an id
    tie-break, so edges — and therefore all three degree counts — are
    engine-identical integers.

    Scale shape: reuses ``similarity.knn_join`` (query side broadcast,
    rank≤k lowered to WindowGroupLimit before the one query-keyed
    exchange); the edge table is k·|nodes| rows, so the in-degree
    aggregate and the mutual self-join are index-sized, never
    corpus-sized. At full scale the node set is the IVF/HNSW entry-point
    sample, not the corpus."""
    t = fixtures(spark, sf_dir)
    nodes = t.embeddings.filter(F.col("vec_id") < KNN_GRAPH_NODES)
    # lineage cut at the SMALL table (the x65 rule): `edges` is
    # k·|nodes| rows but feeds three consumers (in-degree, both sides of
    # the mutual semi-join) — uncut, Catalyst clones the whole kNN
    # scoring subtree per consumer and embeddings.parquet scans 7×
    # (round-6 audit).
    edges = similarity.knn_join(
        nodes, nodes, k=KNN_GRAPH_K, exact=True
    ).select("query_id", "neighbor_id").localCheckpoint(eager=False)
    ind = edges.groupBy(F.col("neighbor_id").alias("vec_id")).agg(
        F.count(F.lit(1)).alias("in_degree")
    )
    rev = edges.select(
        F.col("query_id").alias("neighbor_id"),
        F.col("neighbor_id").alias("query_id"),
    )
    mut = (
        edges.join(rev, ["query_id", "neighbor_id"], "left_semi")
        .groupBy(F.col("query_id").alias("vec_id"))
        .agg(F.count(F.lit(1)).alias("n_mutual"))
    )
    return (
        nodes.select("vec_id")
        .join(ind, "vec_id", "left")
        .join(mut, "vec_id", "left")
        .select(
            "vec_id",
            F.lit(KNN_GRAPH_K).cast("bigint").alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).cast("bigint").alias("in_degree"),
            F.coalesce("n_mutual", F.lit(0)).cast("bigint").alias("n_mutual"),
        )
    )


@query(
    "x58_mix_epoch_plan",
    oracle=f"""
    WITH c AS (
        SELECT source,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source
    ),
    w AS (
        SELECT source, n_tokens,
               CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000)
                    AS BIGINT) AS w_fp
        FROM c
    ),
    s AS (SELECT CAST(SUM(w_fp) AS BIGINT) AS w_total FROM w)
    SELECT source, n_tokens,
           CAST(CAST({MIX_BUDGET_TOKENS} AS HUGEINT) * w_fp // w_total
                AS BIGINT) AS planned_tokens,
           CAST(CAST({MIX_BUDGET_TOKENS} AS HUGEINT) * w_fp * 1000000
                // (w_total * n_tokens) AS BIGINT) AS epochs_ppm
    FROM w, s
    """,
)
def x58_mix_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 mix planner: allocate a global token budget across sources by

    temperature weights (alpha=0.5 ⇒ weight ∝ sqrt(tokens), the x41
    recipe applied to sources and made budget-concrete). ``epochs_ppm``
    > 1e6 means the source must be upsampled (multiple passes), < 1e6
    subsampled — the one number a sampler needs per source. All exact:
    sqrt is IEEE-correctly-rounded and identical in both engines, the
    ×1e6 fixed-pointing floors it, and the budget splits use 128-bit
    integer arithmetic (overflows BIGINT at budget·w_fp ≈ 10²¹).

    Scale shape: one map-side-combined per-source token-count aggregate
    (|sources| rows), then arithmetic over that tiny table — the
    whole-table window for the weight total is aggregate-sized, never
    corpus-sized. The corpus itself is scanned once, map-only."""
    t = fixtures(spark, sf_dir)
    c = t.documents.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("n_tokens")
    )
    w = c.withColumn(
        "w_fp",
        F.floor(F.sqrt(F.col("n_tokens").cast("double")) * 1000000).cast(
            "bigint"
        ),
    ).withColumn("w_total", F.sum("w_fp").over(Window.partitionBy()))
    return w.select(
        "source",
        "n_tokens",
        F.expr(
            f"CAST(CAST({MIX_BUDGET_TOKENS} AS DECIMAL(38,0)) * w_fp"
            " div w_total AS BIGINT)"
        ).alias("planned_tokens"),
        F.expr(
            f"CAST(CAST({MIX_BUDGET_TOKENS} AS DECIMAL(38,0)) * w_fp"
            " * 1000000 div (CAST(w_total AS DECIMAL(38,0)) * n_tokens)"
            " AS BIGINT)"
        ).alias("epochs_ppm"),
    )


@query(
    "x59_event_payload_profile",
    oracle="""
    WITH k AS (
        SELECT event_id, event_type,
               CAST(json_extract(props, '$.k') AS BIGINT) AS k
        FROM events
    ),
    ranked AS (
        SELECT event_type, k,
               row_number() OVER (
                   PARTITION BY event_type ORDER BY k, event_id
               ) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM k
    )
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n_events,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           MIN(k) AS min_k, MAX(k) AS max_k,
           CAST(MAX(CASE WHEN rn = (n - 1) // 2 + 1 THEN k END)
                AS BIGINT) AS p50_k,
           CAST(MAX(CASE WHEN rn = ((n - 1) * 9) // 10 + 1 THEN k END)
                AS BIGINT) AS p90_k
    FROM ranked GROUP BY event_type
    """,
)
def x59_event_payload_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R26/X3 JSON payload profiling: per event type, numeric stats of the

    ``props.k`` payload including EXACT discrete p50/p90 — the quantile
    is the value at rank floor((n-1)·p)+1 under a total order (k,
    event_id), computed by rank comparison instead of engine quantile
    functions (whose interpolation rules differ); every output is an
    exact integer. The payload-drift monitor an event warehouse runs per
    load.

    Scale shape: one event_type-keyed exchange shared by the rank and
    count windows and the final aggregate (partitioning refinement, the
    x47 pattern); JSON extraction is map-side before the shuffle, and
    only (type, k) ever shuffles — not props."""
    t = fixtures(spark, sf_dir)
    k = t.events.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
    )
    wo = Window.partitionBy("event_type").orderBy("k", "event_id")
    wa = Window.partitionBy("event_type")
    ranked = k.withColumn("rn", F.row_number().over(wo)).withColumn(
        "n", F.count(F.lit(1)).over(wa)
    )
    p50_rank = F.expr("(n - 1) div 2 + 1")
    p90_rank = F.expr("((n - 1) * 9) div 10 + 1")
    return ranked.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n_events"),
        F.sum("k").cast("bigint").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.max(F.when(F.col("rn") == p50_rank, F.col("k")))
        .cast("bigint")
        .alias("p50_k"),
        F.max(F.when(F.col("rn") == p90_rank, F.col("k")))
        .cast("bigint")
        .alias("p90_k"),
    )


@query(
    "x60_shingle_containment",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
                    || ' ' || t[i+4] AS shingle
        FROM (
            SELECT doc_id, t, unnest(generate_series(1, len(t) - 4)) AS i
            FROM toks WHERE len(t) >= 5
        )
    ),
    sizes AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh
        FROM sh GROUP BY doc_id
    ),
    ov AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(COUNT(*) AS BIGINT) AS n_common
        FROM sh a JOIN sh b
          ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT ov.doc_a, ov.doc_b, ov.n_common,
           CAST(ov.n_common * 1000000 // sa.n_sh AS BIGINT)
               AS containment_ppm
    FROM ov
    JOIN sizes sa ON sa.doc_id = ov.doc_a
    WHERE sa.n_sh >= {CONTAIN_MIN_SHINGLES}
      AND ov.n_common * 1000000 // sa.n_sh >= {CONTAIN_MIN_PPM}
    """,
)
def x60_shingle_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 asymmetric containment |A∩B|/|A| over word-5-gram shingles:

    flags documents mostly CONTAINED in another (quotes, page-in-page,
    partial crawls) that symmetric Jaccard under-scores — containment of
    A in B can be 1.0 while J(A,B) ≈ |A|/|B| is tiny. Reported per
    direction (doc_a's containment in doc_b ≠ the reverse).

    Scale shape: correctness tier, same contract as x02 — the shingle
    equi-join is Σ·df² over shingle frequencies and is never run on the
    full corpus at scale; the LSH cascade (x02b/x03) feeds candidate
    pairs and this metric then scores only candidates (the
    ``dedup.ngram_jaccard_pairs`` left-semi pattern). The shingle
    explode shuffles 40-byte shingle digests, never text."""
    t = fixtures(spark, sf_dir)
    toks = F.split("text", " ")
    sh = (
        t.documents.filter(F.size(toks) >= 5)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - 4),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at(toks, i),
                        F.element_at(toks, i + 1),
                        F.element_at(toks, i + 2),
                        F.element_at(toks, i + 3),
                        F.element_at(toks, i + 4),
                    ),
                )
            ).alias("shingle"),
        )
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    ov = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") != F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), "n_sh")
    return (
        ov.join(sa, "doc_a")
        .filter(F.col("n_sh") >= CONTAIN_MIN_SHINGLES)
        .withColumn(
            "containment_ppm",
            F.expr("CAST(n_common * 1000000 div n_sh AS BIGINT)"),
        )
        .filter(F.col("containment_ppm") >= CONTAIN_MIN_PPM)
        .select("doc_a", "doc_b", "n_common", "containment_ppm")
    )
