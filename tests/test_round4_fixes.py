"""Regression tests for the round-4 ADVICE findings, each pinned to the

exact failure scenario the advisor identified."""

from __future__ import annotations

import os

import duckdb
import pytest

from conftest import SF_DIR


@pytest.fixture()
def short_doc_sf_dir(spark, tmp_path):
    """An sf_dir whose ``documents`` table contains degenerate short docs

    (0/1/2-word texts) that the driver fixtures (min 10 words/doc) never
    produce. All other tables symlink to the real fixtures."""
    for t in (
        "region nation customer supplier part orders lineitem events "
        "embeddings".split()
    ):
        os.symlink(f"{SF_DIR}/{t}.parquet", tmp_path / f"{t}.parquet")
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = [
        (1, ""),
        (2, "one"),
        (3, "two words"),
        (4, "three plain words"),
        (5, "the the the the the the"),
    ]
    table = pa.table(
        {
            "doc_id": pa.array([i for i, _ in texts], pa.int64()),
            "text": pa.array([t for _, t in texts], pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(
                ["src1", "src1", "src2", "src2", "src3"], pa.string()
            ),
            "n_chars": pa.array([len(t) for _, t in texts], pa.int64()),
        }
    )
    pq.write_table(table, tmp_path / "documents.parquet")
    return str(tmp_path)


def _compare_vs_oracle(spark, name, sf_dir):
    from dwh_etl_framework_spark.queries import QUERIES

    qd = QUERIES[name]
    sdf = qd.fn(spark, sf_dir)
    con = duckdb.connect()
    try:
        from dwh_etl_framework_spark.sources.registry import FIXTURE_TABLES

        for t in FIXTURE_TABLES:
            con.sql(
                f"CREATE OR REPLACE VIEW {t} AS "
                f"SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        duck = con.sql(qd.oracle)
        duck_rows = sorted(duck.fetchall())
        duck_cols = list(duck.columns)
    finally:
        con.close()
    cols = sdf.columns
    spark_rows = sorted(tuple(r) for r in sdf.select(*duck_cols).collect())
    assert sorted(cols) == sorted(duck_cols)
    assert spark_rows == pytest.approx(duck_rows)
    return spark_rows


def test_x28_short_docs_match_oracle_instead_of_crashing(
    spark, short_doc_sf_dir
):
    """ADVICE r4 (medium): x28 on docs with < 2 words previously threw

    INVALID_ARRAY_INDEX_IN_ELEMENT_AT (sequence(1, 0) is the DESCENDING
    [1, 0], and element_at(words, 0) is an error) and aborted the job;
    the DuckDB oracle instead emits no row for such docs. The guarded
    bigram expression must make both engines agree."""
    rows = _compare_vs_oracle(
        spark, "x28_repetition_metrics", short_doc_sf_dir
    )
    # docs 1 ("" -> 1 empty token) and 2 (one word) emit nothing;
    # docs 3-5 (>= 2 words) each produce a row
    doc_ids = {r[0] for r in rows}
    assert doc_ids == {3, 4, 5}


def test_x29_short_docs_still_green(spark, short_doc_sf_dir):
    """x29 already guarded the same pitfall — keep it green on the same

    degenerate fixture so the two guards can't drift apart."""
    _compare_vs_oracle(spark, "x29_decontamination", short_doc_sf_dir)


def test_lsh_degenerate_bucket_is_capped_and_observable(spark):
    """VERDICT r3 carry-forward: one pathological (band_idx, band_hash)

    bucket (here: 60 identical docs colliding in every band) must not go
    quadratic — with the cap below the bucket size, all its pairs are
    dropped, the drop is observable via the Observation metrics, and
    honest near-dup pairs in small buckets still surface."""
    from pyspark.sql import Observation

    from dwh_etl_framework_spark.operators import dedup

    base = "w" + " w".join(str(i) for i in range(30))
    rows = [(i, "junk junk junk junk junk junk junk junk") for i in range(60)]
    rows += [(1000, base + " tail_a"), (1001, base + " tail_b")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = dedup.minhash_signatures(docs, "text", "doc_id", n=3, k=64)

    obs = Observation("lsh_cap")
    pairs = dedup.lsh_candidate_pairs(
        sigs,
        "doc_id",
        bands=16,
        rows_per_band=4,
        est_threshold=0.5,
        max_bucket_size=50,
        bucket_observation=obs,
    ).collect()
    ids = {(r.doc_a, r.doc_b) for r in pairs}
    assert (1000, 1001) in ids  # honest near-dup pair survives
    assert not any(a < 60 and b < 60 for a, b in ids)  # junk pairs dropped
    metrics = obs.get
    assert metrics["dropped_buckets"] >= 1
    assert metrics["dropped_rows"] >= 60
    assert metrics["largest_bucket"] == 60


def test_lsh_cap_off_and_generous_cap_keep_all_pairs(spark):
    """The cap must be a no-op when buckets are under it (oracle fixtures

    rely on this) and when disabled entirely."""
    from dwh_etl_framework_spark.operators import dedup

    base = "w" + " w".join(str(i) for i in range(30))
    docs = spark.createDataFrame(
        [(i, base + f" tail_{i % 3}") for i in range(12)],
        "doc_id long, text string",
    )
    sigs = dedup.minhash_signatures(docs, "text", "doc_id", n=3, k=64)
    uncapped = sorted(
        (r.doc_a, r.doc_b)
        for r in dedup.lsh_candidate_pairs(
            sigs, "doc_id", max_bucket_size=None
        ).collect()
    )
    capped = sorted(
        (r.doc_a, r.doc_b)
        for r in dedup.lsh_candidate_pairs(
            sigs, "doc_id", max_bucket_size=5000
        ).collect()
    )
    assert uncapped == capped and len(uncapped) > 0


def test_simhash_degenerate_chunk_is_capped(spark):
    from dwh_etl_framework_spark.operators import dedup

    rows = [(i, "junk junk junk junk junk junk") for i in range(60)]
    base = " ".join(f"tok{i}" for i in range(40))
    # identical text => hamming 0: the honest pair lives in a size-2 bucket
    rows += [(1000, base), (1001, base)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fps = dedup.simhash(docs, "text", "doc_id")
    pairs = dedup.simhash_pairs(
        fps, "doc_id", max_hamming=3, max_bucket_size=50
    ).collect()
    ids = {(r.doc_a, r.doc_b) for r in pairs}
    assert not any(a < 60 and b < 60 for a, b in ids)
    assert (1000, 1001) in ids


def test_embedding_degenerate_bucket_is_capped(spark):
    from pyspark.sql import Observation

    from dwh_etl_framework_spark.operators import similarity

    dim = 8
    junk = [(i, [0.0] * dim) for i in range(60)]  # all sign to one bucket
    near = [
        (1000, [1.0, 0.5, -0.25, 0.75, 0.1, -0.6, 0.3, 0.9]),
        (1001, [1.0, 0.5, -0.25, 0.75, 0.1, -0.6, 0.3, 0.89]),
    ]
    emb = spark.createDataFrame(
        junk + near, "vec_id long, embedding array<double>"
    )
    obs = Observation("emb_cap")
    pairs = similarity.lsh_near_dup_pairs(
        emb,
        dim,
        threshold=0.99,
        max_bucket_size=50,
        bucket_observation=obs,
    ).collect()
    ids = {(r.id_a, r.id_b) for r in pairs}
    assert ids == {(1000, 1001)}
    assert obs.get["dropped_buckets"] >= 1


def test_cc_runs_one_job_per_iteration(spark):
    """VERDICT r3 item 4: the convergence count must ride the propagation

    job as an observe metric, not run as a second join+count job — long
    chains pay 2× the scheduling otherwise. A 0-1-2-...-7 chain needs 7
    propagation iterations + 1 to detect fixpoint; with the 2 setup
    checkpoints (edges, initial labels) the whole call must stay within
    iterations + 3 jobs (the old shape was 2 per iteration)."""
    from dwh_etl_framework_spark.operators.graph import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(7)], "doc_a long, doc_b long"
    )
    sc = spark.sparkContext
    # AQE materializes every shuffle stage as its own job, which hides the
    # 1-vs-2-jobs-per-iteration distinction this test pins — count without it
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    sc.setJobGroup("cc_job_count", "cc job-count probe")
    try:
        labels = {
            r.node: r.component
            for r in connected_components(chain, max_iter=20).collect()
        }
    finally:
        sc.setJobGroup(None, None)
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert labels == {i: 0 for i in range(8)}
    jobs = sc.statusTracker().getJobIdsForGroup("cc_job_count")
    # 8 iterations + 2 setup checkpoints + the final collect
    assert len(jobs) <= 8 + 3, (
        f"{len(jobs)} jobs for 8 iterations — convergence count is running "
        "as a separate job again"
    )


def test_cc_long_chain_converges(spark):
    from dwh_etl_framework_spark.operators.graph import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "doc_a long, doc_b long"
    )
    labels = {
        r.node: r.component
        for r in connected_components(chain, max_iter=40).collect()
    }
    assert labels == {i: 0 for i in range(31)}


def test_driver_memory_default_adapts_to_host(monkeypatch):
    """ADVICE r4 (low): the driver-heap default must not be an

    unconditional 16g — on a small host that fails JVM startup. It scales
    with physical RAM, clamps to [1g, 16g], and the env var wins."""
    from dwh_etl_framework_spark.session import _default_driver_memory

    monkeypatch.delenv("SPARK_GRAFT_DRIVER_MEMORY", raising=False)
    real_sysconf = os.sysconf

    def fake_sysconf(name, _vals={}):
        if name == "SC_PAGE_SIZE":
            return 4096
        if name == "SC_PHYS_PAGES":
            return _vals["pages"]
        return real_sysconf(name)

    import dwh_etl_framework_spark.session as sess

    monkeypatch.setattr(sess.os, "sysconf", fake_sysconf)
    fake_sysconf.__defaults__[0]["pages"] = (8 * 1024**3) // 4096  # 8 GiB host
    assert _default_driver_memory() == "4g"
    fake_sysconf.__defaults__[0]["pages"] = (256 * 1024**3) // 4096  # 256 GiB
    assert _default_driver_memory() == "16g"  # capped
    fake_sysconf.__defaults__[0]["pages"] = (1 * 1024**3) // 4096  # 1 GiB host
    assert _default_driver_memory() == "1g"  # floored
    monkeypatch.setenv("SPARK_GRAFT_DRIVER_MEMORY", "12g")
    assert _default_driver_memory() == "12g"  # explicit override wins
