"""Round-11 env-probe productization (VERDICT r10 #8): the standing
re-probe found THREE new engine surfaces live in this Spark build —
the VARIANT type, string collations, and Python UDTF polymorphic
``analyze()`` — and, per the r34/f37 precedent, each becomes an
oracled registry entry the same round it is found.

The oracles run DIFFERENT (classic) SQL in DuckDB — JSON string
functions for VARIANT, lower() for collations, split for the UDTF —
so the driver hash certifies the NEW surface against the portable
semantics it claims to implement.

Reference anchor: the reference's transform tier is raw ``spark.sql``
(``airflow_etl.py:251``); these entries keep that surface current as
the engine grows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dwh_etl_framework_spark.queries.registry import fixtures, query

#: r49 — VARIANT ingestion: JSON text → parse_json → typed variant_get
#: extraction, then a grouped exact-cents aggregate over the extracted
#: fields. The open-schema ingestion path every event pipeline wants:
#: at 100 TB the variant binary encoding shreds at the scan and the
#: typed accessor pushes into the columnar reader, where a raw JSON
#: string re-parses per access.
_R49_SPARK = """
WITH raw AS (
    SELECT o_orderkey AS id,
           '{"status":"' || o_orderstatus || '","cents":'
               || CAST(CAST(floor(o_totalprice * 100) AS BIGINT) AS STRING)
               || ',"pri":"' || o_orderpriority || '"}' AS js
    FROM orders
),
v AS (SELECT id, parse_json(js) AS var FROM raw)
SELECT variant_get(var, '$.status', 'string') AS status,
       variant_get(var, '$.pri', 'string') AS pri,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(variant_get(var, '$.cents', 'long')) AS BIGINT) AS cents
FROM v
GROUP BY 1, 2
ORDER BY status, pri
"""

_R49_ORACLE = """
WITH raw AS (
    SELECT o_orderkey AS id,
           '{"status":"' || o_orderstatus || '","cents":'
               || CAST(CAST(floor(o_totalprice * 100) AS BIGINT) AS STRING)
               || ',"pri":"' || o_orderpriority || '"}' AS js
    FROM orders
)
SELECT json_extract_string(js, '$.status') AS status,
       json_extract_string(js, '$.pri') AS pri,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(json_extract(js, '$.cents') AS BIGINT)) AS BIGINT)
           AS cents
FROM raw
GROUP BY 1, 2
ORDER BY status, pri
"""


@query("r49_variant_json", oracle=_R49_ORACLE)
def r49_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R-tier, NEW engine surface: the VARIANT type end-to-end —
    ``parse_json`` to the binary variant encoding, ``variant_get`` with
    a type argument for schema-on-read extraction, grouped exact-cents
    aggregation over the extracted fields. The DuckDB oracle computes
    the same result from the raw JSON text (json_extract), so the hash
    certifies the variant path against plain-JSON semantics — the r26
    upgrade for the open-schema ingestion tier.

    Scale shape: parse + typed access are map-side; the only exchange
    is the (status, pri)-keyed aggregate (≤ 15 groups, partial
    map-side). Found live by the round-11 env probe."""
    fixtures(spark, sf_dir)
    return spark.sql(_R49_SPARK)


#: r50 — collations: case-insensitive equality and DISTINCT without
#: lower() rewrites. The mixed-case segment column is synthesized
#: deterministically (odd keys lowercase).
_R50_SPARK = """
WITH seggy AS (
    SELECT c_custkey, c_nationkey,
           CASE WHEN c_custkey % 2 = 0 THEN c_mktsegment
                ELSE lower(c_mktsegment) END AS seg
    FROM customer
)
SELECT n.n_name AS n_name,
       CAST(COUNT(CASE WHEN s.seg = 'BuIlDiNg' COLLATE UTF8_LCASE
                       THEN 1 END) AS BIGINT) AS n_building,
       CAST(COUNT(DISTINCT s.seg COLLATE UTF8_LCASE) AS BIGINT)
           AS n_segments_ci
FROM seggy s
JOIN nation n ON n.n_nationkey = s.c_nationkey
GROUP BY n.n_name
ORDER BY n_name
"""

_R50_ORACLE = """
WITH seggy AS (
    SELECT c_custkey, c_nationkey,
           CASE WHEN c_custkey % 2 = 0 THEN c_mktsegment
                ELSE lower(c_mktsegment) END AS seg
    FROM customer
)
SELECT n.n_name AS n_name,
       CAST(COUNT(CASE WHEN lower(s.seg) = 'building' THEN 1 END)
            AS BIGINT) AS n_building,
       CAST(COUNT(DISTINCT lower(s.seg)) AS BIGINT) AS n_segments_ci
FROM seggy s
JOIN nation n ON n.n_nationkey = s.c_nationkey
GROUP BY n.n_name
ORDER BY n_name
"""


@query("r50_collated_segments", oracle=_R50_ORACLE)
def r50_collated_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R-tier, NEW engine surface: string collations — case-insensitive
    equality (``= 'BuIlDiNg' COLLATE UTF8_LCASE``) and collated
    COUNT(DISTINCT), no lower() rewrite on the data path. The oracle IS
    the lower() rewrite, so the hash certifies the collation semantics
    equal the classic normalization for this alphabet.

    Scale shape: the collated comparison evaluates in the scan filter /
    aggregate exactly like a binary comparison (no extra projection of
    a normalized copy — at 100 TB that saves materializing a shadow
    column per case-insensitive predicate). Found live by the round-11
    env probe."""
    fixtures(spark, sf_dir)
    return spark.sql(_R50_SPARK)


#: x108 — k-center greedy coreset (farthest-point sampling), the
#: diversity-first data-selection pass. The oracle UNROLLS the k-step
#: greedy recursion as a CTE chain (aggregates are not allowed in a
#: recursive CTE's recursive term, so unrolling is the portable form);
#: distances use the repo's exact fixed-point fold, so ONE driver hash
#: certifies the whole selection trajectory — seed, every argmax, every
#: tie-break, every running minimum.
_X108_K = 6


def _d2_lambda(p: str, c: str) -> str:
    """Squared-L2 in exact fixed point as a DuckDB list fold (1-based)."""
    diff = (
        f"(CAST({p}.embedding[i] AS DOUBLE) - CAST({c}.embedding[i] AS DOUBLE))"
    )
    return (
        "CAST(list_sum(list_transform(generate_series(1, 64), "
        f"i -> CAST(floor({diff} * {diff} * 1e12) AS BIGINT))) AS BIGINT)"
    )


def _x108_oracle(k: int = _X108_K) -> str:
    parts = [
        "WITH pts AS (SELECT vec_id, embedding FROM embeddings)",
        "c1 AS (SELECT vec_id, embedding FROM pts ORDER BY vec_id LIMIT 1)",
        (
            # already-selected points leave the candidate pool (WHERE
            # vec_id <> center), mirroring kcenter_greedy's no-repeat
            # invariant: on a degenerate corpus whose remaining max
            # distance is 0 the argmax must pick a FRESH id, never
            # re-pick the seed riding along at md=0 (ADVICE r11, low)
            "m1 AS (SELECT p.vec_id, p.embedding, "
            + _d2_lambda("p", "c")
            + " AS md FROM pts p, c1 c WHERE p.vec_id <> c.vec_id)"
        ),
    ]
    for j in range(2, k + 1):
        parts.append(
            f"c{j} AS (SELECT vec_id, embedding, md FROM m{j - 1} "
            "ORDER BY md DESC, vec_id LIMIT 1)"
        )
        if j < k:
            parts.append(
                f"m{j} AS (SELECT p.vec_id, p.embedding, "
                f"LEAST(p.md, {_d2_lambda('p', 'c')}) AS md "
                f"FROM m{j - 1} p, c{j} c WHERE p.vec_id <> c.vec_id)"
            )
    selects = [
        "SELECT 1 AS sel_rank, vec_id, CAST(NULL AS BIGINT) AS covered_d2 FROM c1"
    ] + [
        f"SELECT {j} AS sel_rank, vec_id, CAST(md AS BIGINT) AS covered_d2 FROM c{j}"
        for j in range(2, k + 1)
    ]
    return (
        ",\n".join(parts)
        + "\n"
        + "\nUNION ALL\n".join(selects)
        + "\nORDER BY sel_rank"
    )


@query("x108_kcenter_coreset", oracle=_x108_oracle())
def x108_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2-tier data selection: k-center greedy (farthest-point) coreset
    over the embedding corpus — ``operators/similarity.kcenter_greedy``.
    The selected ids ARE the maximally-diverse k-subset (greedy
    2-approximation of the k-center cover); covered_d2 is the
    non-increasing coverage-radius trajectory. The DuckDB oracle
    unrolls the same greedy recursion as a CTE chain over identical
    fixed-point arithmetic, so the hash certifies seed choice, every
    argmax, every tie-break and every running minimum at once.

    Scale shape: k-1 single-pass map updates against literal centers
    (no join, no shuffle, k scalar TakeOrdereds) — the linear-scans-
    times-k cost the greedy guarantee demands, embarrassingly parallel
    at any corpus size."""
    t = fixtures(spark, sf_dir)
    from dwh_etl_framework_spark.operators.similarity import kcenter_greedy

    return kcenter_greedy(t.embeddings, _X108_K)


def _f38_oracle() -> str:
    from dwh_etl_framework_spark.queries.wave17 import _JOINS, _decision_sql_one

    return _decision_sql_one(*_JOINS[0])


@query("f38_metadata_join_decision", oracle=_f38_oracle())
def f38_metadata_join_decision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F17+planner composition: the x105 broadcast-vs-shuffle decision
    served ENTIRELY from landed table metadata — both sides' sketches
    are written at sink time (``sources/sinks.write_table_with_sketches``,
    the ``landing: sketch_keys`` config surface), read back merge-on-
    read, and fed to the same ``decision_table`` plan. The oracle is
    x105's SQL for the identical join computed from the RAW tables, so
    one driver hash certifies the whole persistence loop: fragment
    write, underscore-dir invisibility, SUM merge-on-read, width
    round-trip, and the decision arithmetic.

    Scale shape: after the one-time landing, the decision costs two
    ≤ d·w counter-table reads — at 100 TB neither input is scanned; a
    per-day landed warehouse answers broadcast-vs-shuffle for any join
    from metadata alone."""
    import hashlib
    import tempfile

    from dwh_etl_framework_spark.queries.wave16 import JOINSIZE_W
    from dwh_etl_framework_spark.queries.wave17 import decision_table
    from dwh_etl_framework_spark.sources.sinks import (
        read_table_sketch,
        write_table_with_sketches,
    )

    t = fixtures(spark, sf_dir)
    # path isolated per (sf_dir, session): a concurrent run at another
    # scale factor (parity sweep + driver) must not overwrite these
    # fragments mid-read (review r11)
    tag = hashlib.md5(
        f"{sf_dir}:{spark.sparkContext.applicationId}".encode()
    ).hexdigest()[:12]
    base = f"{tempfile.gettempdir()}/dwh_etl_framework_spark_f38_{tag}"
    write_table_with_sketches(
        t.lineitem, f"{base}/lineitem", ["l_partkey"],
        mode="overwrite", w=JOINSIZE_W,
    )
    write_table_with_sketches(
        t.part, f"{base}/part", ["p_partkey"],
        mode="overwrite", w=JOINSIZE_W,
    )
    lsk, _ = read_table_sketch(spark, f"{base}/lineitem", "l_partkey")
    rsk, _ = read_table_sketch(spark, f"{base}/part", "p_partkey")
    return decision_table(
        lsk.localCheckpoint(eager=True),
        rsk.localCheckpoint(eager=True),
        "lineitem_part",
    )


#: r52 — collated JOIN keys: the equi-join plans as a hash-family join
#: (SortMergeJoin — probed, NOT a nested loop) even though key
#: equality is case-insensitive. r50 covers collated filter/DISTINCT;
#: this is the join path.
_R52_SPARK = """
WITH seggy AS (
    SELECT c_custkey,
           CASE WHEN c_custkey % 2 = 0 THEN c_mktsegment
                ELSE lower(c_mktsegment) END AS seg
    FROM customer
),
dim AS (
    SELECT DISTINCT
           concat(upper(substring(c_mktsegment, 1, 1)),
                  lower(substring(c_mktsegment, 2))) AS seg_tc,
           CAST(length(c_mktsegment) AS INT) AS seg_len
    FROM customer
)
SELECT lower(s.seg) AS segment, d.seg_len AS seg_len,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM seggy s
JOIN dim d ON s.seg COLLATE UTF8_LCASE = d.seg_tc COLLATE UTF8_LCASE
GROUP BY lower(s.seg), d.seg_len
ORDER BY segment
"""

_R52_ORACLE = """
WITH seggy AS (
    SELECT c_custkey,
           CASE WHEN c_custkey % 2 = 0 THEN c_mktsegment
                ELSE lower(c_mktsegment) END AS seg
    FROM customer
),
dim AS (
    SELECT DISTINCT
           concat(upper(substring(c_mktsegment, 1, 1)),
                  lower(substring(c_mktsegment, 2))) AS seg_tc,
           CAST(length(c_mktsegment) AS INT) AS seg_len
    FROM customer
)
SELECT lower(s.seg) AS segment, d.seg_len AS seg_len,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM seggy s
JOIN dim d ON lower(s.seg) = lower(d.seg_tc)
GROUP BY lower(s.seg), d.seg_len
ORDER BY segment
"""


@query("r52_collated_join", oracle=_R52_ORACLE)
def r52_collated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R-tier, NEW engine surface: case-insensitive equality as a JOIN
    key (``ON a COLLATE UTF8_LCASE = b COLLATE UTF8_LCASE``) — the
    title-cased dim matches both casings of the fact's segment without
    either side materializing a normalized copy. Plan probed: Spark
    keeps a hash-family equi-join (SortMergeJoin), not a nested loop —
    pinned in tests/test_wave20.py. Oracle is the lower()-rewrite join.

    Scale shape: the collation folds into the join key's hash/order,
    so the exchange count equals the binary-key plan's; at 100 TB this
    deletes the shadow lower(key) projection a collation-less engine
    shuffles."""
    fixtures(spark, sf_dir)
    return spark.sql(_R52_SPARK)


#: r51 — Python UDTF with a polymorphic ``analyze()``: the output
#: schema (number of word columns) is computed at PLAN time from a
#: constant argument. r27b's UDTF had a fixed 2-column signature; this
#: is the table-function-generics surface.
def _make_split_udtf():
    from pyspark.sql.functions import udtf

    class SplitWords:
        @staticmethod
        def analyze(text, n):
            from pyspark.sql.types import (
                IntegerType,
                StringType,
                StructField,
                StructType,
            )
            from pyspark.sql.udtf import AnalyzeResult

            k = int(n.value)  # constant-folded at plan time
            return AnalyzeResult(
                StructType(
                    [StructField("n_words", IntegerType())]
                    + [StructField(f"w{i + 1}", StringType()) for i in range(k)]
                )
            )

        def eval(self, text, n):
            words = (text or "").split(" ")
            out = [len(words)] + [
                words[i] if i < len(words) else None for i in range(int(n))
            ]
            yield tuple(out)

    return udtf(SplitWords)


_R51_ORACLE = """
SELECT p_partkey,
       CAST(len(string_split(p_name, ' ')) AS INT) AS n_words,
       string_split(p_name, ' ')[1] AS w1,
       string_split(p_name, ' ')[2] AS w2
FROM part
ORDER BY p_partkey
"""


@query("r51_udtf_polymorphic_split", oracle=_R51_ORACLE)
def r51_udtf_polymorphic_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R-tier, NEW engine surface: Python UDTF whose ``analyze()``
    derives the output schema from a constant argument at plan time —
    ``split_words(p_name, 2)`` plans a (n_words, w1, w2) schema, and
    ``split_words(p_name, 3)`` would plan four columns from the SAME
    registration (pinned in tests/test_wave20.py). The r27 Arrow-UDF
    tier's missing generics. Oracle: DuckDB string_split indexing.

    Scale shape: one LATERAL per row, Arrow-batched like every Python
    surface in this repo; no shuffle (the ORDER BY is the driver
    hash's determinism sort, dropped in production use). Found live by
    the round-11 env probe."""
    fixtures(spark, sf_dir)
    spark.udtf.register("split_words", _make_split_udtf())
    return spark.sql(
        """
        SELECT p.p_partkey, s.n_words, s.w1, s.w2
        FROM part p, LATERAL split_words(p.p_name, 2) s
        ORDER BY p.p_partkey
        """
    )
