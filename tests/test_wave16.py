"""Wave-16: entity resolution end-to-end (x101 golden record).

The load-bearing claims:

1. **Transitivity**: a~b and b~c (each within edit distance 1) land all
   three values — and every ROW carrying them — in ONE entity cluster,
   even when levenshtein(a, c) = 2.
2. **Survivorship is exactly arg-max(price, -key)**: one golden row per
   entity; it has the entity's max price; among max-price ties the
   smallest partkey wins; singleton entities elect themselves.
3. **Struct-MAX ≡ window**: the aggregate survivorship agrees with the
   windowed arg-max formulation row-for-row on the driver fixture (the
   oracle proves this cross-engine; this pins it in-repo).
4. **Member counts partition the table**: Σ n_members over golden rows
   = total rows; every member of an entity reports the same count.
"""

from __future__ import annotations

from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from dwh_etl_framework_spark.queries.wave16 import x101_entity_golden_record

from conftest import SF_DIR


def _result(spark):
    return x101_entity_golden_record(spark, SF_DIR).collect()


def test_golden_unique_and_consistent_per_entity(spark):
    rows = _result(spark)
    by_entity: dict[int, list] = {}
    for r in rows:
        by_entity.setdefault(r["entity_cluster"], []).append(r)
    total = 0
    for ent, members in by_entity.items():
        goldens = [r for r in members if r["is_golden"]]
        assert len(goldens) == 1, f"entity {ent}: {len(goldens)} golden rows"
        gk = {r["golden_partkey"] for r in members}
        assert gk == {goldens[0]["p_partkey"]}
        ns = {r["n_members"] for r in members}
        assert ns == {len(members)}
        total += len(members)
    assert total == len(rows)


def test_survivorship_is_argmax_price_then_minkey(spark):
    out = x101_entity_golden_record(spark, SF_DIR)
    part = spark.read.parquet(f"{SF_DIR}/part.parquet").select(
        "p_partkey", "p_retailprice"
    )
    w = Window.partitionBy("entity_cluster").orderBy(
        F.desc("p_retailprice"), F.asc("p_partkey")
    )
    windowed = (
        out.join(part, "p_partkey")
        .withColumn("__rn", F.row_number().over(w))
        .withColumn("__wg", F.first("p_partkey").over(w))
    )
    bad = windowed.filter(
        (F.col("golden_partkey") != F.col("__wg"))
        | (F.col("is_golden") != (F.col("__rn") == 1))
    ).count()
    assert bad == 0


def test_transitive_chain_merges_into_one_entity(spark):
    # aa~ab~bb chain: levenshtein(aa, bb) = 2, but transitivity must
    # still merge all rows of all three values into one entity, and the
    # golden row is the chain's max-price row.
    df = spark.createDataFrame(
        [
            Row(p_partkey=1, p_name="aa", p_retailprice=10.0),
            Row(p_partkey=2, p_name="ab", p_retailprice=30.0),
            Row(p_partkey=3, p_name="bb", p_retailprice=20.0),
            Row(p_partkey=4, p_name="bb", p_retailprice=20.0),
            Row(p_partkey=5, p_name="zzzz", p_retailprice=99.0),
        ]
    )

    import dwh_etl_framework_spark.queries.wave16 as w16
    from dwh_etl_framework_spark.operators import editjoin
    from dwh_etl_framework_spark.operators.graph import dedup_clusters

    # run the pipeline body directly on the synthetic frame
    vals = df.groupBy("p_name").agg(F.min("p_partkey").alias("vid"))
    vpairs = editjoin.edit_distance_value_pairs(df, "p_name", k=1)
    edges = (
        vpairs.join(
            vals.select(F.col("p_name").alias("val_a"), F.col("vid").alias("doc_a")),
            "val_a",
        )
        .join(
            vals.select(F.col("p_name").alias("val_b"), F.col("vid").alias("doc_b")),
            "val_b",
        )
        .select("doc_a", "doc_b")
    )
    labels = dedup_clusters(vals.select("vid"), edges, "vid")
    got = {
        r["vid"]: r["cluster"] for r in labels.collect()
    }
    # chain vids: aa->1, ab->2, bb->3; all must share cluster 1
    assert got[1] == got[2] == got[3] == 1
    # the isolated value stays its own entity
    assert got[5] == 5


def test_fixture_has_real_multirow_entities(spark):
    """The driver fixture exercises the interesting path: at least one
    entity spans >1 distinct name (a fuzzy merge actually happened) and
    entities with many rows share one golden row."""
    rows = _result(spark)
    ents = {}
    for r in rows:
        ents.setdefault(r["entity_cluster"], set()).add(r["p_partkey"])
    assert any(len(v) > 1 for v in ents.values())


# ---- x102 positional phrase search ---------------------------------------


def test_phrase_search_matches_direct_scan(spark):
    """Ground truth by brute force: for every phrase, the (doc,
    count, first_pos) set from token-level Python scanning of the whole
    fixture equals the operator's output — including the absence of
    false positives."""
    from dwh_etl_framework_spark.queries.wave16 import (
        PHRASES,
        x102_phrase_search,
    )

    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    expect = {}
    for pid, phrase in PHRASES:
        words = phrase.split(" ")
        for doc_id, toks in docs.items():
            starts = [
                i + 1
                for i in range(len(toks) - len(words) + 1)
                if toks[i : i + len(words)] == words
            ]
            if starts:
                expect[(pid, doc_id)] = (len(starts), starts[0])
    got = {
        (r["phrase_id"], r["doc_id"]): (r["n_occurrences"], r["first_pos"])
        for r in x102_phrase_search(spark, SF_DIR).collect()
    }
    assert got == expect
    assert expect, "fixture must exercise at least one match"


def test_phrase_search_handles_repeated_words(spark):
    """A phrase with a repeated word must count overlapping starts via
    the DISTINCT-widx coverage rule, not double-count a single token."""
    from pyspark.sql import Row

    from dwh_etl_framework_spark.queries import wave16

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="a a a b"),
            Row(doc_id=2, text="a b a"),
            Row(doc_id=3, text="b b"),
        ]
    )
    words = spark.createDataFrame(
        [(9, 1, "a"), (9, 2, "a")], "phrase_id int, widx int, word string"
    )
    plen_df = spark.createDataFrame([(9, 2)], "phrase_id int, n_words long")
    from pyspark.sql import functions as FF

    postings = (
        df.select("doc_id", FF.posexplode(FF.split("text", " ")).alias("pos0", "term"))
        .filter(FF.col("term") == "a")
        .select("doc_id", (FF.col("pos0") + 1).alias("i"), "term")
    )
    hits = postings.join(
        FF.broadcast(words), postings["term"] == words["word"]
    ).select(
        "phrase_id", "doc_id", (FF.col("i") - FF.col("widx") + 1).alias("start"),
        "widx",
    )
    matches = (
        hits.groupBy("phrase_id", "doc_id", "start")
        .agg(FF.countDistinct("widx").alias("__cov"))
        .join(FF.broadcast(plen_df), "phrase_id")
        .filter(FF.col("__cov") == FF.col("n_words"))
    )
    got = {
        (r["doc_id"], r["start"]) for r in matches.collect()
    }
    # "a a a b": starts 1, 2; "a b a": none; "b b": none
    assert got == {(1, 1), (1, 2)}


# ---- f31 k-anonymity audit ------------------------------------------------


def test_k_anonymity_audit_partitions_and_flags(spark):
    """The grid covers every customer row exactly once; flags agree with
    a direct group-size recount; suppression counts are group_size on
    flagged groups and 0 elsewhere."""
    from dwh_etl_framework_spark.queries.wave16 import (
        K_ANON,
        f31_k_anonymity_audit,
    )

    out = f31_k_anonymity_audit(spark, SF_DIR).collect()
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    n_rows = cust.count()
    assert sum(r["group_size"] for r in out) == n_rows
    truth = {
        (r["c_nationkey"], r["c_mktsegment"]): r["n"]
        for r in cust.groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in out:
        size = truth[(r["c_nationkey"], r["c_mktsegment"])]
        assert r["group_size"] == size
        assert r["is_k_anonymous"] == (size >= K_ANON)
        assert r["n_suppressed_rows"] == (0 if size >= K_ANON else size)


# ---- x103 CMS join-size estimate -------------------------------------------


def test_join_size_estimate_never_undercounts(spark):
    """The one-sided CMS guarantee, per hash row: EVERY row's counter
    dot product >= the true join size, so the MIN (the published
    estimate) does too. Also pins the audit columns' arithmetic."""
    from dwh_etl_framework_spark.operators.sketch import CMS_D, cms_sketch
    from dwh_etl_framework_spark.queries.wave16 import (
        JOINSIZE_W,
        x103_join_size_estimate,
    )

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    true_size = events.join(
        orders, F.col("user_id") == F.col("o_custkey")
    ).count()
    a = cms_sketch(events.select("user_id"), "user_id", JOINSIZE_W)
    b = cms_sketch(orders.select("o_custkey"), "o_custkey", JOINSIZE_W)
    dots = {
        r["r"]: r["dot"]
        for r in a.alias("a")
        .join(b.alias("b"), ["r", "col"])
        .groupBy("r")
        .agg(F.sum(F.col("a.cnt") * F.col("b.cnt")).alias("dot"))
        .collect()
    }
    assert len(dots) == CMS_D
    for r, dot in dots.items():
        assert dot >= true_size, f"hash row {r} undercounts: {dot} < {true_size}"
    out = x103_join_size_estimate(spark, SF_DIR).collect()
    assert len(out) == 1
    row = out[0]
    assert row["est_join_size"] == min(dots.values())
    assert row["exact_join_size"] == true_size
    assert row["overcount"] == row["est_join_size"] - true_size
    assert row["overcount"] >= 0


# ---- x104 sorted-neighborhood blocking audit --------------------------------


def test_snm_audit_gaps_and_recall_rule(spark):
    """Gaps recompute from first principles (rank distance under each
    sort key over the distinct value universe) and the recall flag is
    exactly min(gap) <= w. The fixture must exhibit the multi-pass
    motivation: some true pair invisible to the forward pass alone."""
    from dwh_etl_framework_spark.queries.wave16 import (
        SNM_W,
        x104_sorted_neighborhood_audit,
    )

    out = x104_sorted_neighborhood_audit(spark, SF_DIR).collect()
    assert out, "fixture must contain true fuzzy pairs"
    vals = sorted(
        r["p_name"]
        for r in spark.read.parquet(f"{SF_DIR}/part.parquet")
        .select("p_name")
        .distinct()
        .collect()
    )
    fwd = {v: i + 1 for i, v in enumerate(vals)}
    rev = {
        v: i + 1
        for i, v in enumerate(sorted(vals, key=lambda s: s[::-1]))
    }
    for r in out:
        assert r["fwd_gap"] == abs(fwd[r["val_a"]] - fwd[r["val_b"]])
        assert r["rev_gap"] == abs(rev[r["val_a"]] - rev[r["val_b"]])
        assert r["snm_recalled"] == (
            min(r["fwd_gap"], r["rev_gap"]) <= SNM_W
        )
    assert any(r["fwd_gap"] > SNM_W for r in out), (
        "fixture should show a pair the forward pass alone misses"
    )
