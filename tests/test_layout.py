"""Layout tier: portable Z-value arithmetic, zone-map landing, pruned reads.

The oracled queries (wave23) certify the end-to-end pipeline against
DuckDB; these tests pin the properties the queries rely on — cross-engine
arithmetic equality, the pruning SUPERSET contract on random intervals,
the fail-loud coverage check, and the Z-order pruning gain itself.
"""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from dwh_etl_framework_spark.operators.layout import (
    interleave2_sql,
    norm_sql,
    range_fragment_sql,
    zorder_fragment_sql,
    zvalue_py,
)
from dwh_etl_framework_spark.sources.zonemaps import (
    ZONEMAP_DIR,
    land_fragment_with_zonemap,
    read_table_pruned,
    write_table_with_zonemaps,
)


def test_interleave_sql_matches_python_in_both_engines(spark):
    """The generated Z-value text evaluates identically in Spark SQL and
    DuckDB and equals the pure-Python reference interleave — the property
    every wave23 oracle comparison presupposes."""
    rng = random.Random(111)
    pairs = [(rng.randrange(256), rng.randrange(256)) for _ in range(200)]
    expected = [zvalue_py(x, y, 8) for x, y in pairs]
    expr = interleave2_sql("x", "y", 8)
    values = ", ".join(f"({x}, {y})" for x, y in pairs)
    sql = f"SELECT {expr} AS z FROM (VALUES {values}) AS t(x, y)"
    got_spark = [r["z"] for r in spark.sql(sql).collect()]
    got_duck = [r[0] for r in duckdb.sql(sql).fetchall()]
    assert got_spark == expected
    assert got_duck == expected


def test_norm_and_fragment_sql_bounds(spark):
    """Normalization clamps out-of-range values into edge cells and the
    fragment ids stay inside [0, 2^frag_bits) — correctness never depends
    on the design-time bounds (norm_sql docstring)."""
    nd = norm_sql("v", 100, 1000, 256)
    frag = range_fragment_sql("nd", 8, 4)
    rows = spark.sql(
        f"SELECT v, {frag} AS f FROM "
        f"(SELECT v, {nd} AS nd FROM (VALUES (-500), (100), (599), (1099),"
        " (999999)) AS t(v))"
    ).collect()
    by_v = {r["v"]: r["f"] for r in rows}
    assert by_v[-500] == 0 and by_v[100] == 0
    assert by_v[999999] == 15 and by_v[1099] == 15
    assert 0 <= by_v[599] <= 15


def _land_demo(spark, tmp_path, n=4000, frag_bits=4):
    """Land a two-column demo table under a range layout with zone maps."""
    rng = random.Random(7)
    rows = [(i, rng.randrange(10_000), rng.randrange(10_000)) for i in range(n)]
    df = spark.createDataFrame(rows, "id BIGINT, a BIGINT, b BIGINT")
    nd = norm_sql("a", 0, 10_000, 256)
    frag = range_fragment_sql("nd", 8, frag_bits)
    df.createOrReplaceTempView("layout_demo")
    landed = spark.sql(
        f"SELECT id, a, b, {frag} AS __fragment FROM "
        f"(SELECT *, {nd} AS nd FROM layout_demo)"
    )
    path = str(tmp_path / "demo")
    write_table_with_zonemaps(landed, path, ["a", "b"])
    return df, path


def test_pruned_read_is_a_superset_on_random_intervals(spark, tmp_path):
    """Property: for seeded random (a, b) intervals, pruned-read + exact
    filter ≡ full-table exact filter. Pruning may keep extra fragments,
    never lose rows."""
    df, path = _land_demo(spark, tmp_path)
    rng = random.Random(23)
    for _ in range(8):
        a1 = rng.randrange(9_000); a2 = a1 + rng.randrange(200, 3_000)
        b1 = rng.randrange(9_000); b2 = b1 + rng.randrange(200, 3_000)
        pruned, info = read_table_pruned(
            spark, path, {"a": (a1, a2), "b": (b1, b2)}
        )
        got = sorted(
            r["id"]
            for r in pruned.where(
                F.col("a").between(a1, a2) & F.col("b").between(b1, b2)
            ).collect()
        )
        want = sorted(
            r["id"]
            for r in df.where(
                F.col("a").between(a1, a2) & F.col("b").between(b1, b2)
            ).collect()
        )
        assert got == want
        assert 0 <= info["fragments_kept"] <= info["fragments_total"]


def test_pruned_read_refuses_uncovered_fragment(spark, tmp_path):
    """Fail-loud coverage: a data fragment missing from the zone map (or
    vice versa) must raise — a silent miss would DROP that fragment's rows
    from every pruned scan."""
    import shutil

    _, path = _land_demo(spark, tmp_path)
    frags = sorted(
        p.name for p in (tmp_path / "demo").iterdir()
        if p.name.startswith("__fragment=")
    )
    # extra data fragment the map has never seen
    shutil.copytree(
        tmp_path / "demo" / frags[0], tmp_path / "demo" / "__fragment=999"
    )
    with pytest.raises(IOError, match="does not cover"):
        read_table_pruned(spark, path, {"a": (0, 100)})
    shutil.rmtree(tmp_path / "demo" / "__fragment=999")
    # data fragment deleted out from under the map
    shutil.rmtree(tmp_path / "demo" / frags[0])
    with pytest.raises(IOError, match="does not cover"):
        read_table_pruned(spark, path, {"a": (0, 100)})


def test_pruned_read_unknown_stats_column(spark, tmp_path):
    _, path = _land_demo(spark, tmp_path)
    with pytest.raises(ValueError, match="no zone-map stats"):
        read_table_pruned(spark, path, {"nope": (0, 1)})


def test_pruned_read_empty_keep_returns_empty_with_schema(spark, tmp_path):
    _, path = _land_demo(spark, tmp_path)
    pruned, info = read_table_pruned(spark, path, {"a": (10**7, 10**7 + 5)})
    assert info["fragments_kept"] == 0
    assert pruned.count() == 0
    assert set(pruned.columns) == {"id", "a", "b"}


def test_zonemap_dir_invisible_to_plain_reads(spark, tmp_path):
    """The metadata rides inside the table dir without polluting plain
    scans (the _sketches convention)."""
    df, path = _land_demo(spark, tmp_path)
    assert spark.read.parquet(path).count() == df.count()
    assert (tmp_path / "demo" / ZONEMAP_DIR).exists()


def test_fragment_reland_replaces_data_and_map_row(spark, tmp_path):
    """Incremental re-land (the write_partition_with_sketches protocol):
    one fragment's data AND its zone-map row are replaced idempotently;
    other fragments are untouched; pruning stays a superset under the
    fragment's NEW bounds."""
    df, path = _land_demo(spark, tmp_path)
    landed = spark.read.parquet(path)
    n_total = landed.count()
    n_frag3 = landed.where("__fragment = 3").count()
    n_others = n_total - n_frag3
    _, before = read_table_pruned(spark, path, {"b": (100_000, 100_001)})
    assert before["fragments_kept"] == 0
    # replace fragment 3 with rows whose b is far outside its old bounds
    replacement = spark.createDataFrame(
        [(90_001 + i, 2_100, 100_000) for i in range(5)],
        "id BIGINT, a BIGINT, b BIGINT",
    ).withColumn("__fragment", F.lit(3).cast("bigint"))
    frag = land_fragment_with_zonemap(replacement, path, ["a", "b"])
    assert frag == 3
    pruned, info = read_table_pruned(spark, path, {"b": (100_000, 100_001)})
    assert info["fragments_kept"] == 1
    assert sorted(r["id"] for r in pruned.collect()) == [
        90_001 + i for i in range(5)
    ]
    # the replaced fragment serves the new rows; others are untouched
    full = spark.read.parquet(path)
    assert full.where("__fragment = 3").count() == 5
    assert full.where("__fragment != 3").count() == n_others
    # idempotent: re-running the same fragment landing changes nothing
    land_fragment_with_zonemap(replacement, path, ["a", "b"])
    assert spark.read.parquet(path).where("__fragment = 3").count() == 5
    assert spark.read.parquet(path).count() == n_others + 5


def test_fragment_reland_validation(spark, tmp_path):
    _, path = _land_demo(spark, tmp_path)
    two = spark.createDataFrame(
        [(1, 1, 1, 0), (2, 2, 2, 1)], "id BIGINT, a BIGINT, b BIGINT, __fragment BIGINT"
    )
    with pytest.raises(ValueError, match="exactly one fragment"):
        land_fragment_with_zonemap(two, path, ["a", "b"])
    one = two.where("__fragment = 0")
    with pytest.raises(ValueError, match="do not match the landed"):
        land_fragment_with_zonemap(one, path, ["a"])


def test_pending_marker_refuses_reads_and_relands(spark, tmp_path):
    """A crashed fragment re-land leaves a _pending_ marker: pruned reads
    and further re-lands refuse until a landing republishes — the stale
    map row must never silently bound new data."""
    _, path = _land_demo(spark, tmp_path)
    (tmp_path / "demo" / ZONEMAP_DIR / "_pending_deadbeef").touch()
    with pytest.raises(IOError, match="crashed mid-span"):
        read_table_pruned(spark, path, {"a": (0, 100)})
    one = spark.createDataFrame(
        [(1, 1, 1, 0)], "id BIGINT, a BIGINT, b BIGINT, __fragment BIGINT"
    )
    with pytest.raises(IOError, match="crashed mid-span"):
        land_fragment_with_zonemap(one, path, ["a", "b"])
    (tmp_path / "demo" / ZONEMAP_DIR / "_pending_deadbeef").unlink()
    # bulk republish clears the inconsistency
    df, _ = _land_demo(spark, tmp_path)
    read_table_pruned(spark, path, {"a": (0, 100)})


def test_zorder_prunes_where_range_layout_cannot(spark, tmp_path):
    """The pinned gain behind x111: on a 2-D box the Z-order layout keeps
    FEWER fragments than a single-column range layout, and on the
    off-column predicate the range layout keeps everything while Z-order
    still prunes."""
    rng = random.Random(31)
    rows = [(i, rng.randrange(10_000), rng.randrange(10_000)) for i in range(6000)]
    base = spark.createDataFrame(rows, "id BIGINT, a BIGINT, b BIGINT")
    base.createOrReplaceTempView("zg_demo")
    na, nb = norm_sql("a", 0, 10_000, 256), norm_sql("b", 0, 10_000, 256)
    zval = interleave2_sql("na", "nb", 8)
    linear = spark.sql(
        f"SELECT id, a, b, {range_fragment_sql('na', 8, 6)} AS __fragment "
        f"FROM (SELECT *, {na} AS na FROM zg_demo)"
    )
    zed = spark.sql(
        f"SELECT id, a, b, {zorder_fragment_sql('zval', 8, 6)} AS __fragment "
        f"FROM (SELECT *, {zval} AS zval FROM "
        f"(SELECT *, {na} AS na, {nb} AS nb FROM zg_demo))"
    )
    lp, zp = str(tmp_path / "lin"), str(tmp_path / "zed")
    write_table_with_zonemaps(linear, lp, ["a", "b"])
    write_table_with_zonemaps(zed, zp, ["a", "b"])
    box = {"a": (4_000, 5_200), "b": (4_000, 5_200)}
    _, lin_box = read_table_pruned(spark, lp, box)
    _, z_box = read_table_pruned(spark, zp, box)
    assert z_box["fragments_kept"] < lin_box["fragments_kept"]
    off = {"b": (4_000, 5_200)}
    _, lin_off = read_table_pruned(spark, lp, off)
    _, z_off = read_table_pruned(spark, zp, off)
    assert lin_off["fragments_kept"] == lin_off["fragments_total"]
    assert z_off["fragments_kept"] < z_off["fragments_total"]


def test_zonemap_compaction_resets_map_to_one_row_per_fragment(
    spark, tmp_path
):
    """VERDICT r12 item 2: N re-lands append N superseding rows; compact
    rewrites the flat map to latest-gen only (rows == fragment count),
    pruning decisions are IDENTICAL before/after, and a post-compaction
    re-land continues cleanly from the reset generation."""
    from dwh_etl_framework_spark.sources.zonemaps import (
        compact_table_zonemaps,
    )

    df, path = _land_demo(spark, tmp_path)
    n_frags = len(
        spark.read.parquet(path).select("__fragment").distinct().collect()
    )
    # five re-lands of fragment 3 → five superseded generations in the map
    for i in range(5):
        replacement = spark.createDataFrame(
            [(90_001 + j, 2_100, 100_000 + i) for j in range(5)],
            "id BIGINT, a BIGINT, b BIGINT",
        ).withColumn("__fragment", F.lit(3).cast("bigint"))
        land_fragment_with_zonemap(replacement, path, ["a", "b"])
    probes = [
        {"b": (100_000, 100_010)},
        {"a": (0, 2_000)},
        {"a": (2_000, 2_200), "b": (0, 10_000)},
    ]
    before = [read_table_pruned(spark, path, p) for p in probes]
    assert before[0][1]["map_rows"] == n_frags + 5  # growth is visible
    stats = compact_table_zonemaps(spark, path)
    assert stats == {"rows_before": n_frags + 5, "rows_after": n_frags}
    after = [read_table_pruned(spark, path, p) for p in probes]
    for (bdf, binfo), (adf, ainfo) in zip(before, after):
        assert binfo["fragments_kept"] == ainfo["fragments_kept"]
        assert binfo["fragments_total"] == ainfo["fragments_total"]
        assert sorted(r["id"] for r in bdf.collect()) == sorted(
            r["id"] for r in adf.collect()
        )
        assert ainfo["map_rows"] == n_frags  # one row per fragment again
    # generation counter restarts: the next re-land appends gen 1 and wins
    replacement = spark.createDataFrame(
        [(95_001, 2_100, 500_000)], "id BIGINT, a BIGINT, b BIGINT"
    ).withColumn("__fragment", F.lit(3).cast("bigint"))
    land_fragment_with_zonemap(replacement, path, ["a", "b"])
    pruned, info = read_table_pruned(spark, path, {"b": (500_000, 500_000)})
    assert info["fragments_kept"] == 1
    assert [r["id"] for r in pruned.collect()] == [95_001]


def test_zonemap_compaction_aborts_on_concurrent_reland(
    spark, tmp_path, monkeypatch
):
    """ADVICE r13: a re-land that appends a superseding generation AFTER
    compaction's collect but BEFORE its overwrite must abort the
    compaction loudly (re-checked row count), never be silently
    swallowed by the rewrite. Simulated by racing a REAL
    land_fragment_with_zonemap right after the collect."""
    from dwh_etl_framework_spark.sources import zonemaps as zm

    _, path = _land_demo(spark, tmp_path)
    real = zm._current_zonemap

    raced = []

    def collect_then_race(spark_, path_):
        out = real(spark_, path_)
        if not raced:  # once: the racer's own landing resolves the map too
            raced.append(True)
            replacement = spark.createDataFrame(
                [(97_001, 2_100, 700_000)], "id BIGINT, a BIGINT, b BIGINT"
            ).withColumn("__fragment", F.lit(3).cast("bigint"))
            land_fragment_with_zonemap(replacement, path, ["a", "b"])
        return out

    monkeypatch.setattr(zm, "_current_zonemap", collect_then_race)
    with pytest.raises(IOError, match="changed during compaction"):
        zm.compact_table_zonemaps(spark, path)
    monkeypatch.setattr(zm, "_current_zonemap", real)
    # the racer's superseding row survived and still wins the read
    pruned, info = read_table_pruned(spark, path, {"b": (700_000, 700_000)})
    assert [r["id"] for r in pruned.collect()] == [97_001]
    # compaction succeeds once no writer races it
    assert zm.compact_table_zonemaps(spark, path)["rows_after"] > 0


def test_zonemap_compaction_refuses_pending_marker(spark, tmp_path):
    from dwh_etl_framework_spark.sources.sinks import PENDING_PREFIX
    from dwh_etl_framework_spark.sources.zonemaps import (
        compact_table_zonemaps,
    )

    _, path = _land_demo(spark, tmp_path)
    marker = tmp_path / "demo" / ZONEMAP_DIR / f"{PENDING_PREFIX}deadbeef"
    marker.write_text("")
    with pytest.raises(IOError, match="pending"):
        compact_table_zonemaps(spark, path)
    marker.unlink()
    assert compact_table_zonemaps(spark, path)["rows_after"] > 0
