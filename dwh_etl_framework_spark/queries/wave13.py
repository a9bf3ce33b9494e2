"""Round-8 wave: lossless set-similarity join, exact-quota sampling,
boilerplate mining.

**x94_prefix_filter_jaccard** is the PPJoin-lite tier of the dedup
cascade (operators/setjoin.py): EXACT Jaccard ≥ t pairs without the
all-pairs shingle self-join. Its oracle is deliberately the NAIVE
self-join SQL (x02's oracle verbatim): a hash match proves both that
the Spark plan is right and that the prefix filter is lossless — the
two engines compute the same row set by different algorithms.

**x95_quota_sample** is the exact-quota counterpart of x33's rate
sampler (operators/sampling.py): hash-ranked top-n per stratum, run as
a two-round tournament so no task ever sorts a whole stratum. The
oracle runs the single-window formulation; equality IS the proof that
the tournament is exact.

**x96_boilerplate_ngrams** mines per-source template shingles — the
"same footer on every page of a crawl" signal a curation pipeline
strips before dedup (boilerplate inflates shingle overlap and poisons
near-dup scores). Report: top-5 most document-frequent shingles per
source with document frequency, the source's doc count, the df ratio,
and the ≥ 10% boilerplate flag. One shingle aggregate, one tiny join
to per-source doc counts, one bounded window — every shuffle key is a
(source, shingle) digest-scale row, never text blobs at volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dwh_etl_framework_spark.operators import sampling, setjoin
from dwh_etl_framework_spark.operators.dedup import shingle_table
from dwh_etl_framework_spark.queries.registry import fixtures, query

#: x02's oracle, verbatim — the naive Σ·df² self-join. x94's Spark side
#: runs the prefix-filter plan instead; hash equality = losslessness.
_NAIVE_JACCARD_SQL = """
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    idx AS (
        SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
        FROM toks WHERE len(t) >= 3
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
        FROM idx
    ),
    counts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT i.doc_a, i.doc_b, i.n_common,
           ca.n AS n_a, cb.n AS n_b,
           CAST(i.n_common AS DOUBLE) / (ca.n + cb.n - i.n_common) AS jaccard
    FROM inter i
    JOIN counts ca ON i.doc_a = ca.doc_id
    JOIN counts cb ON i.doc_b = cb.doc_id
    WHERE CAST(i.n_common AS DOUBLE) / (ca.n + cb.n - i.n_common) >= 0.5
    """


@query("x94_prefix_filter_jaccard", oracle=_NAIVE_JACCARD_SQL)
def x94_prefix_filter_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 lossless prefix-filtered set-similarity join (J ≥ 0.5).

    Same output contract as x02; the candidate join touches only each
    document's rarest ⌈|d|/2⌉+… prefix shingles (SSJoin/PPJoin prefix
    principle), so the hot shingles that make the naive self-join Σ·df²
    never become join keys. The oracle is the naive formulation — the
    hash match certifies the filter drops no qualifying pair. (Like
    x02, the oracle's self-join is sf0.01-scale; the sampled twin x94s
    carries the sf1 value evidence.)"""
    t = fixtures(spark, sf_dir)
    return setjoin.prefix_filter_jaccard_pairs(
        t.documents, "text", "doc_id", n=3, threshold=0.5
    )


#: sampled twin (x02s convention): md5-quarter shingle universe, which
#: both shrinks the oracle's self-join ~16x (holds at sf1) and keeps the
#: prefix-filter path byte-identical in mechanics.
_SAMPLED_PRED_DUCK = "substr(md5(shingle), 1, 1) < '4'"
_NAIVE_JACCARD_SAMPLED_SQL = f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    idx AS (
        SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
        FROM toks WHERE len(t) >= 3
    ),
    sh AS MATERIALIZED (
        SELECT * FROM (
            SELECT DISTINCT doc_id,
                   t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
            FROM idx
        ) WHERE {_SAMPLED_PRED_DUCK}
    ),
    counts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT i.doc_a, i.doc_b, i.n_common,
           ca.n AS n_a, cb.n AS n_b,
           CAST(i.n_common AS DOUBLE) / (ca.n + cb.n - i.n_common) AS jaccard
    FROM inter i
    JOIN counts ca ON i.doc_a = ca.doc_id
    JOIN counts cb ON i.doc_b = cb.doc_id
    WHERE CAST(i.n_common AS DOUBLE) / (ca.n + cb.n - i.n_common) >= 0.5
    """


@query("x94s_prefix_filter_sampled", oracle=_NAIVE_JACCARD_SAMPLED_SQL)
def x94s_prefix_filter_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 prefix-filter join over the md5-quarter shingle sample — the

    x94 plan with the x02s Broder-sample hook, so the naive-self-join
    oracle holds at sf1 and the prefix-filter operator carries scale
    value evidence (sf1-variants convention)."""
    t = fixtures(spark, sf_dir)
    return setjoin.prefix_filter_jaccard_pairs(
        t.documents, "text", "doc_id", n=3, threshold=0.5,
        shingle_filter=F.substring(F.md5(F.col("shingle")), 1, 1) < "4",
    )


@query(
    "x95_quota_sample",
    oracle="""
    WITH ranked AS (
        SELECT source, doc_id,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5('quota:' || CAST(doc_id AS VARCHAR))
               ) AS rk
        FROM documents
    )
    SELECT source, doc_id, CAST(rk AS INTEGER) AS rk
    FROM ranked WHERE rk <= 10
    """,
)
def x95_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 exact-quota stratified sample: exactly 10 docs per source,

    hash-ranked (deterministic reservoir). The Spark side runs the
    two-round tournament (no stratum-sized sort task at any scale); the
    oracle runs the single global window — equality proves the
    tournament exact."""
    t = fixtures(spark, sf_dir)
    return sampling.quota_sample(
        t.documents, ["source"], "doc_id", n_per_stratum=10, salt="quota:"
    ).select("source", "doc_id", "rk")


@query(
    "x96_boilerplate_ngrams",
    oracle="""
    WITH toks AS (
        SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
    ),
    idx AS (
        SELECT doc_id, source, t, unnest(generate_series(1, len(t) - 2)) AS i
        FROM toks WHERE len(t) >= 3
    ),
    sh AS (
        SELECT DISTINCT doc_id, source,
               t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
        FROM idx
    ),
    nd AS (
        SELECT source, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM documents GROUP BY source
    ),
    dfreq AS (
        SELECT source, shingle, CAST(COUNT(*) AS BIGINT) AS df
        FROM sh GROUP BY source, shingle
    ),
    top AS (
        SELECT d.source, d.shingle, d.df, nd.n_docs,
               CAST(d.df AS DOUBLE) / nd.n_docs AS df_ratio,
               row_number() OVER (
                   PARTITION BY d.source ORDER BY d.df DESC, d.shingle
               ) AS rk
        FROM dfreq d JOIN nd ON nd.source = d.source
    )
    SELECT source, shingle, df, n_docs, df_ratio,
           df_ratio >= 0.1 AS is_boilerplate, CAST(rk AS INTEGER) AS rk
    FROM top WHERE rk <= 5
    """,
)
def x96_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 per-source boilerplate mining: the top-5 most document-frequent

    3-gram shingles of each source, with df ratio and the ≥ 10% template
    flag — the pre-dedup strip list for crawl sources whose footers and
    nav text inflate near-dup scores. Shuffles carry (source, shingle)
    aggregate rows only; the per-source window ranks a vocabulary-sized
    table, never documents."""
    t = fixtures(spark, sf_dir)
    docs = t.documents
    sh = shingle_table(
        docs.select("doc_id", "source", F.col("text")), "text", "doc_id"
    )
    # shingle_table keeps (id, shingle); re-attach source via the docs
    # dimension (doc_id-keyed broadcast-scale join at fixture size; at
    # 100 TB the source column rides the explode instead — same plan
    # shape, one less join; kept here so shingle_table stays the one
    # audited explode implementation)
    src = docs.select("doc_id", "source")
    sh_src = sh.join(src, "doc_id")
    nd = docs.groupBy("source").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    dfreq = sh_src.groupBy("source", "shingle").agg(
        F.count(F.lit(1)).alias("df")
    )
    w = Window.partitionBy("source").orderBy(F.desc("df"), F.asc("shingle"))
    top = (
        dfreq.join(nd, "source")
        .withColumn("df_ratio", F.col("df").cast("double") / F.col("n_docs"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
    )
    return top.select(
        "source", "shingle", "df", "n_docs", "df_ratio",
        (F.col("df_ratio") >= 0.1).alias("is_boilerplate"), "rk",
    )
