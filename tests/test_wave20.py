"""Round-11 env-probe productizations (r49 variant, r50 collations,
r51 polymorphic UDTF): surface-specific pins beyond the hash parity
that runs in test_oracle_parity / tools/run_parity.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from dwh_etl_framework_spark.queries.registry import fixtures
from dwh_etl_framework_spark.queries.wave20 import (
    _make_split_udtf,
    r49_variant_json,
    r50_collated_segments,
    r51_udtf_polymorphic_split,
)
from tests.conftest import SF_DIR


def test_r49_variant_typed_access_matches_direct_columns(spark):
    """The variant round-trip loses nothing: re-deriving the same
    aggregate from the raw columns matches the variant_get path."""
    t = fixtures(spark, SF_DIR)
    got = {
        (r["status"], r["pri"]): (r["n_orders"], r["cents"])
        for r in r49_variant_json(spark, SF_DIR).collect()
    }
    want_rows = (
        t.orders.groupBy(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("pri"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents"),
        )
        .collect()
    )
    want = {(r["status"], r["pri"]): (r["n"], r["cents"]) for r in want_rows}
    assert got == want and got


def test_variant_column_roundtrips_through_parquet(spark, tmp_path):
    """The VARIANT type survives a parquet write/read (the storage shape
    the r49 docstring's scale claim rests on): typed extraction after
    the roundtrip equals extraction before it."""
    df = spark.sql(
        "SELECT id, parse_json('{\"a\":' || CAST(id AS STRING) ||"
        " ',\"s\":\"v' || CAST(id AS STRING) || '\"}') AS var"
        " FROM range(20)"
    )
    before = spark.createDataFrame(
        df.selectExpr(
            "id",
            "variant_get(var, '$.a', 'long') AS a",
            "variant_get(var, '$.s', 'string') AS s",
        ).collect()
    ).collect()
    path = str(tmp_path / "var_tbl")
    df.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path).selectExpr(
        "id",
        "variant_get(var, '$.a', 'long') AS a",
        "variant_get(var, '$.s', 'string') AS s",
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, before))


def test_r50_collated_distinct_counts_casefold_classes(spark):
    """Every nation sees ≤ 5 case-insensitive segment classes even
    though the raw column carries up to 10 case variants."""
    t = fixtures(spark, SF_DIR)
    rows = r50_collated_segments(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_segments_ci"] <= 5
    # raw (case-sensitive) distinct exceeds the collated distinct overall
    raw = (
        t.customer.select(
            F.when(F.col("c_custkey") % 2 == 0, F.col("c_mktsegment"))
            .otherwise(F.lower("c_mktsegment"))
            .alias("seg")
        )
        .distinct()
        .count()
    )
    assert raw == 10  # 5 upper + 5 lower variants exist in the synth data


def test_r52_collated_join_keeps_equi_join_plan(spark):
    """The collated join key must plan as a hash-family equi-join, not
    degrade to a nested loop over the case-insensitive comparison."""
    from dwh_etl_framework_spark.queries.wave20 import r52_collated_join

    df = r52_collated_join(spark, SF_DIR)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "MergeJoin" in plan or "HashJoin" in plan
    rows = {r["segment"]: r["n_customers"] for r in df.collect()}
    assert len(rows) == 5
    t = fixtures(spark, SF_DIR)
    assert sum(rows.values()) == t.customer.count()


def test_r51_analyze_is_polymorphic_across_arguments(spark):
    """The SAME registration plans different schemas per call site:
    n=2 → (n_words, w1, w2); n=3 → (n_words, w1, w2, w3)."""
    fixtures(spark, SF_DIR)
    spark.udtf.register("split_words_t", _make_split_udtf())
    two = spark.sql("SELECT s.* FROM part p, LATERAL split_words_t(p.p_name, 2) s")
    three = spark.sql("SELECT s.* FROM part p, LATERAL split_words_t(p.p_name, 3) s")
    assert two.columns == ["n_words", "w1", "w2"]
    assert three.columns == ["n_words", "w1", "w2", "w3"]
    r = three.limit(5).collect()
    assert all(row["w3"] is None for row in r if row["n_words"] == 2)


def test_x108_guards_small_corpus_and_never_repeats_ids(spark):
    """Review r11: k > n raises instead of silently padding; an
    all-duplicates corpus (every distance 0) still yields k DISTINCT
    ids with covered_d2 = 0 — never a re-selected center."""
    import pytest as _pytest

    from dwh_etl_framework_spark.operators.similarity import kcenter_greedy

    dup = spark.createDataFrame(
        [(i, [1.0, 2.0]) for i in range(4)],
        "vec_id long, embedding array<float>",
    )
    with _pytest.raises(ValueError, match="k=10"):
        kcenter_greedy(dup, 10)
    sel = kcenter_greedy(dup, 4).collect()
    assert [r["vec_id"] for r in sel] == [0, 1, 2, 3]
    assert all(r["covered_d2"] == 0 for r in sel[1:])
    # duplicate-id rows vanish together when selected, and NULL ids
    # leave the pool — the guard counts distinct non-null ids, so k=3
    # over {1,1,2,2,NULL} raises instead of crashing mid-scan
    messy = spark.createDataFrame(
        [(1, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0]),
         (2, [2.0, 0.0]), (None, [3.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    with _pytest.raises(ValueError, match="2 distinct"):
        kcenter_greedy(messy, 3)
    ok = kcenter_greedy(messy, 2).collect()
    assert [r["vec_id"] for r in ok] == [1, 2]


def test_x108_greedy_property_and_radius_monotone(spark):
    """Direct recomputation of the farthest-point invariants: each
    selected point is the true argmax of min-distance to the prior set
    (ties to lowest id), and the coverage radius never increases."""
    import math

    from dwh_etl_framework_spark.operators.similarity import kcenter_greedy

    t = fixtures(spark, SF_DIR)
    pts = {
        r["vec_id"]: list(r["embedding"])
        for r in t.embeddings.limit(200).collect()
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in pts.items()], "vec_id long, embedding array<float>"
    )
    sel = kcenter_greedy(df, 5).collect()
    assert [r["sel_rank"] for r in sel] == [1, 2, 3, 4, 5]
    assert sel[0]["vec_id"] == min(pts) and sel[0]["covered_d2"] is None

    def d2(a, b):
        return sum(
            math.floor(
                (float(a[i]) - float(b[i])) * (float(a[i]) - float(b[i])) * 1e12
            )
            for i in range(len(a))
        )

    chosen = [sel[0]["vec_id"]]
    for row in sel[1:]:
        md = {
            vid: min(d2(v, pts[c]) for c in chosen)
            for vid, v in pts.items()
            if vid not in chosen
        }
        best = max(md.values())
        want_id = min(vid for vid, m in md.items() if m == best)
        assert (row["vec_id"], row["covered_d2"]) == (want_id, best)
        chosen.append(want_id)
    radii = [r["covered_d2"] for r in sel[1:]]
    assert radii == sorted(radii, reverse=True)


def test_r51_word_columns_match_split(spark):
    t = fixtures(spark, SF_DIR)
    got = {r["p_partkey"]: (r["w1"], r["w2"])
           for r in r51_udtf_polymorphic_split(spark, SF_DIR).collect()}
    want = {
        r["p_partkey"]: (r["s"][0], r["s"][1] if len(r["s"]) > 1 else None)
        for r in t.part.select(
            "p_partkey", F.split("p_name", " ").alias("s")
        ).collect()
    }
    assert got == want


def test_x108_oracle_matches_operator_on_degenerate_corpus(spark):
    """ADVICE r11 (low): the unrolled-CTE oracle must mirror the
    operator's no-repeat invariant. On a corpus whose remaining max
    distance hits 0 mid-trajectory (duplicates outnumber distinct
    locations), an oracle that leaves selected points in the candidate
    pool re-picks the seed at md=0 where Spark picks a fresh id."""
    import duckdb
    import pandas as pd

    from dwh_etl_framework_spark.operators.similarity import kcenter_greedy
    from dwh_etl_framework_spark.queries.wave20 import _x108_oracle

    locs = {
        "A": [0.0] * 64,
        "B": [1.0] + [0.0] * 63,
        "C": [0.0, 2.0] + [0.0] * 62,
    }
    # ids 0,1 at A; 2,3 at B; 4 at C — after 3 selections every
    # remaining candidate sits at md=0
    corpus = [(0, locs["A"]), (1, locs["A"]), (2, locs["B"]),
              (3, locs["B"]), (4, locs["C"])]
    df = spark.createDataFrame(corpus, "vec_id long, embedding array<float>")
    got = [
        (r["sel_rank"], r["vec_id"], r["covered_d2"])
        for r in kcenter_greedy(df, 5).collect()
    ]
    assert len({v for _, v, _ in got}) == 5  # no repeats, by construction

    con = duckdb.connect()
    emb = pd.DataFrame(
        {"vec_id": [c[0] for c in corpus], "embedding": [c[1] for c in corpus]}
    )
    con.register("embeddings", emb)
    want = [
        (int(r[0]), int(r[1]), None if r[2] is None else int(r[2]))
        for r in con.sql(_x108_oracle(5)).fetchall()
    ]
    assert got == want
    assert len({v for _, v, _ in want}) == 5  # the oracle-side invariant


def test_udtf_plans_arrow_batched(spark):
    """VERDICT r11 #2: the docstring's Arrow claim is load-bearing — the
    session conf must plan UDTFs as ArrowEvalPythonUDTF (Arrow batch
    transfer), not row-pickled BatchEvalPythonUDTF."""
    fixtures(spark, SF_DIR)
    spark.udtf.register("split_words_a", _make_split_udtf())
    df = spark.sql(
        "SELECT s.* FROM part p, LATERAL split_words_a(p.p_name, 2) s"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPythonUDTF" in plan
    assert "BatchEvalPythonUDTF" not in plan
