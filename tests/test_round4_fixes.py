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
