"""Journal-merge semantics (F19-F21) — property-style tests per SURVEY.md

§5.2/§5.4: random journal histories vs a hand-computed Python oracle, plus
edge cases (tie-breaking, all-historic, delta/full agreement).
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from dwh_etl_framework_spark.operators.merge import (
    JournalSpec,
    flip_journal_state,
    merge_delta,
    merge_full,
    stamp_journal_columns,
)

SPEC = JournalSpec(primary_key=("account_id", "balance_date"))
T0 = datetime(2024, 1, 1)


def make_journal(seed: int, n_keys: int = 40, max_versions: int = 5):
    """Random history per FIXTURES.md §B: colliding __transform_dt on ~10%

    of keys to exercise the __load_dt/__seqno tie-breakers."""
    rng = random.Random(seed)
    rows = []
    seq = 0
    for key in range(n_keys):
        n_ver = rng.randint(1, max_versions)
        collide = rng.random() < 0.3
        for v in range(n_ver):
            tdt = T0 + timedelta(hours=0 if collide else rng.randint(0, 100))
            rows.append(
                Row(
                    account_id=key,
                    balance_date=f"2024-01-{1 + key % 28:02d}",
                    balance=float(rng.randint(0, 10_000)),
                    __transform_dt=tdt,
                    __load_dt=T0 + timedelta(minutes=rng.randint(0, 1000)),
                    __seqno=(seq := seq + 1),
                    __record_state=rng.choice(["A", "A", "A", "H"]),
                )
            )
    return rows


def python_latest(rows, states=None):
    """Oracle: latest row per PK under (transform DESC, load DESC, seqno ASC)."""
    best = {}
    for r in rows:
        if states is not None and r["__record_state"] not in states:
            continue
        k = (r.account_id, r.balance_date)
        cand = (-r["__transform_dt"].timestamp(), -r["__load_dt"].timestamp(), r["__seqno"])
        if k not in best or cand < best[k][0]:
            best[k] = (cand, r)
    return {k: v[1].balance for k, v in best.items()}


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_merge_full_matches_python_oracle(spark, seed):
    rows = make_journal(seed)
    journal = spark.createDataFrame(rows)
    got = {
        (r.account_id, r.balance_date): r.balance
        for r in merge_full(journal, SPEC).collect()
    }
    assert got == python_latest(rows)


@pytest.mark.parametrize("seed", [1, 2])
def test_merge_delta_upserts_only_active(spark, seed):
    rows = make_journal(seed)
    journal = spark.createDataFrame(rows)
    # master: stale value -1 for every key 0..19, plus key 999 untouched
    master_rows = [
        Row(account_id=k, balance_date=f"2024-01-{1 + k % 28:02d}", balance=-1.0)
        for k in range(20)
    ] + [Row(account_id=999, balance_date="2024-01-01", balance=-1.0)]
    master = spark.createDataFrame(master_rows)
    got = {
        (r.account_id, r.balance_date): r.balance
        for r in merge_delta(master, journal, SPEC).collect()
    }
    expected = {
        (r.account_id, r.balance_date): r.balance for r in master_rows
    }  # start from master…
    expected.update(python_latest(rows, states={"A"}))  # …upsert latest Active
    assert got == expected
    assert got[(999, "2024-01-01")] == -1.0  # untouched key survives


def test_full_and_delta_agree_from_empty_master(spark):
    """On an all-Active journal, delta merge from empty master ≡ full merge."""
    rows = [r for r in make_journal(7) ]
    all_active = [
        Row(**{**r.asDict(), "__record_state": "A"}) for r in rows
    ]
    journal = spark.createDataFrame(all_active)
    empty_master = spark.createDataFrame([], merge_full(journal, SPEC).schema)
    full = {(r.account_id, r.balance_date): r.balance
            for r in merge_full(journal, SPEC).collect()}
    delta = {(r.account_id, r.balance_date): r.balance
             for r in merge_delta(empty_master, journal, SPEC).collect()}
    assert full == delta


def test_tie_breaking_exact_order(spark):
    """Equal transform_dt → higher load_dt wins; equal both → LOWER seqno wins

    (__seqno ASC — the reference's exact ordering, airflow_etl.py:172)."""
    rows = [
        Row(account_id=1, balance_date="d", balance=10.0,
            __transform_dt=T0, __load_dt=T0, __seqno=5, __record_state="A"),
        Row(account_id=1, balance_date="d", balance=20.0,
            __transform_dt=T0, __load_dt=T0, __seqno=2, __record_state="A"),
        Row(account_id=1, balance_date="d", balance=30.0,
            __transform_dt=T0, __load_dt=T0 + timedelta(hours=1), __seqno=9,
            __record_state="A"),
        Row(account_id=2, balance_date="d", balance=40.0,
            __transform_dt=T0, __load_dt=T0, __seqno=1, __record_state="H"),
    ]
    journal = spark.createDataFrame(rows)
    got = {r.account_id: r.balance for r in merge_full(journal, SPEC).collect()}
    # key 1: load_dt tie-break → balance 30; key 2: 'H' still counts in full
    assert got == {1: 30.0, 2: 40.0}


def test_state_flip(spark):
    rows = [
        Row(account_id=1, balance_date="d", balance=1.0,
            __transform_dt=T0, __load_dt=T0, __seqno=1, __record_state="A"),
        Row(account_id=2, balance_date="d", balance=2.0,
            __transform_dt=T0, __load_dt=T0, __seqno=2, __record_state="H"),
    ]
    flipped = flip_journal_state(spark.createDataFrame(rows))
    states = {r.account_id: r["__record_state"] for r in flipped.collect()}
    assert states == {1: "H", 2: "H"}


def test_stamp_journal_columns(spark):
    df = spark.createDataFrame([Row(account_id=1, balance=5.0)])
    stamped = stamp_journal_columns(df, datetime(2024, 6, 1), load_dt=T0)
    row = stamped.collect()[0]
    assert row["__record_state"] == "A"
    assert row["__transform_dt"] == datetime(2024, 6, 1)
    assert row["__load_dt"] == T0
    assert isinstance(row["__seqno"], int)
    # distinct seqnos across rows of one write
    df2 = spark.createDataFrame([Row(account_id=i, balance=0.0) for i in range(50)])
    seqnos = [r["__seqno"] for r in stamp_journal_columns(df2, T0, load_dt=T0).collect()]
    assert len(set(seqnos)) == len(seqnos)


def python_asof(rows, as_of):
    """Oracle: latest row per PK among versions with __transform_dt <= T."""
    vis = [r for r in rows if r["__transform_dt"] <= as_of]
    return python_latest(vis)


@pytest.mark.parametrize("seed", [1, 2])
def test_as_of_read_matches_python_oracle(spark, seed):
    from dwh_etl_framework_spark.operators.merge import as_of_read

    rows = make_journal(seed)
    df = spark.createDataFrame(rows)
    for hours in (0, 10, 50, 200):
        t = T0 + timedelta(hours=hours)
        got = {
            (r["account_id"], r["balance_date"]): r["balance"]
            for r in as_of_read(df, SPEC, F.lit(t)).collect()
        }
        assert got == python_asof(rows, t), (seed, hours)


def test_as_of_now_equals_merge_full(spark):
    from dwh_etl_framework_spark.operators.merge import as_of_read

    rows = make_journal(7)
    df = spark.createDataFrame(rows)
    latest = {
        (r["account_id"], r["balance_date"]): r["balance"]
        for r in merge_full(df, SPEC).collect()
    }
    now = T0 + timedelta(days=365)
    asof = {
        (r["account_id"], r["balance_date"]): r["balance"]
        for r in as_of_read(df, SPEC, F.lit(now)).collect()
    }
    assert asof == latest


def test_as_of_visibility_is_monotone(spark):
    """Key sets only grow as T advances, and a key's version stamp is
    non-decreasing in T."""
    from dwh_etl_framework_spark.operators.merge import as_of_read

    rows = make_journal(11)
    df = spark.createDataFrame(rows)
    prev_keys: set = set()
    prev_vdt: dict = {}
    for hours in (5, 40, 120, 300):
        t = T0 + timedelta(hours=hours)
        out = as_of_read(df, SPEC, F.lit(t)).collect()
        keys = {(r["account_id"], r["balance_date"]) for r in out}
        vdt = {
            (r["account_id"], r["balance_date"]): r["__transform_dt"]
            for r in out
        }
        assert prev_keys <= keys
        for k in prev_vdt:
            assert vdt[k] >= prev_vdt[k]
        prev_keys, prev_vdt = keys, vdt


def test_pit_join_selects_exactly_the_valid_version(spark):
    """Every fact pairs with AT MOST one version, and it is precisely
    the latest version with valid_from <= ts (the as_of_read answer at
    the fact's timestamp) — joining is_current instead would disagree
    wherever history moved on."""
    from dwh_etl_framework_spark.operators.merge import (
        as_of_read,
        pit_join,
        scd2_intervals,
    )

    rows = make_journal(3)
    journal = spark.createDataFrame(rows)
    dim = scd2_intervals(journal, SPEC)
    facts = spark.createDataFrame(
        [
            Row(fk=k, fbd=f"2024-01-{1 + k % 28:02d}",
                ts=T0 + timedelta(hours=h))
            for k in range(0, 40, 3)
            for h in (1, 60, 250)
        ]
    )
    joined = pit_join(
        facts,
        dim.withColumnRenamed("account_id", "dk").withColumnRenamed(
            "balance_date", "dbd"
        ),
        "fk",
        "dk",
        "ts",
    ).filter(F.col("fbd") == F.col("dbd"))
    got = {
        (r["fk"], r["fbd"], r["ts"]): r["balance"] for r in joined.collect()
    }
    assert len(got) == joined.count()  # at most one version per fact
    # cross-check every fact against the time-travel read at its ts
    for h in (1, 60, 250):
        t = T0 + timedelta(hours=h)
        asof = {
            (r["account_id"], r["balance_date"]): r["balance"]
            for r in as_of_read(journal, SPEC, F.lit(t)).collect()
        }
        for k in range(0, 40, 3):
            key = (k, f"2024-01-{1 + k % 28:02d}")
            want = asof.get(key)
            have = got.get((k, key[1], t))
            assert have == want, (k, h, have, want)


def test_change_feed_is_the_diff_of_two_asof_reads(spark):
    """INSERT keys are exactly after-minus-before; UPDATE keys are
    exactly the common keys whose value moved; unchanged keys are
    absent; new_balance always equals the after-state."""
    from dwh_etl_framework_spark.operators.merge import change_feed

    rows = make_journal(5)
    journal = spark.createDataFrame(rows)
    t1, t2 = T0 + timedelta(hours=20), T0 + timedelta(hours=120)
    before = python_asof(rows, t1)
    after = python_asof(rows, t2)
    feed = change_feed(journal, SPEC, F.lit(t1), F.lit(t2), ["balance"]).collect()
    got = {}
    for r in feed:
        got[(r["account_id"], r["balance_date"])] = (
            r["old_balance"],
            r["new_balance"],
            r["change_type"],
        )
    want = {}
    for k, v in after.items():
        if k not in before:
            want[k] = (None, v, "INSERT")
        elif before[k] != v:
            want[k] = (before[k], v, "UPDATE")
    assert got == want


def test_change_feed_null_value_semantics(spark):
    """ADVICE r9 #1: key presence comes from a presence marker, never
    from a value column's nullness. A pre-existing key whose surviving
    old version holds NULL is UPDATE (not INSERT); NULL→value and
    value→NULL transitions are emitted; NULL→NULL is suppressed."""
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from dwh_etl_framework_spark.operators.merge import change_feed

    spec = JournalSpec(primary_key=("k",))
    schema = StructType(
        [
            StructField("k", IntegerType()),
            StructField("v", DoubleType()),
            StructField("__transform_dt", TimestampType()),
            StructField("__load_dt", TimestampType()),
            StructField("__seqno", IntegerType()),
            StructField("__record_state", StringType()),
        ]
    )
    t_before = T0 + timedelta(days=1)
    t_inside = T0 + timedelta(days=5)
    mk = lambda k, v, t, seq: (k, v, t, t, seq, "A")
    rows = [
        # k=1: NULL before the window, 5.0 inside → UPDATE NULL→5.0
        mk(1, None, t_before, 1),
        mk(1, 5.0, t_inside, 2),
        # k=2: 7.0 before, NULL inside → UPDATE 7.0→NULL
        mk(2, 7.0, t_before, 3),
        mk(2, None, t_inside, 4),
        # k=3: NULL before, unchanged → suppressed
        mk(3, None, t_before, 5),
        # k=4: first seen inside the window, with NULL value → INSERT
        mk(4, None, t_inside, 6),
        # k=5: 1.0 before, unchanged → suppressed
        mk(5, 1.0, t_before, 7),
    ]
    journal = spark.createDataFrame(rows, schema)
    feed = change_feed(
        journal,
        spec,
        F.lit(T0 + timedelta(days=2)),
        F.lit(T0 + timedelta(days=9)),
        ["v"],
    ).collect()
    got = {r["k"]: (r["old_v"], r["new_v"], r["change_type"]) for r in feed}
    assert got == {
        1: (None, 5.0, "UPDATE"),
        2: (7.0, None, "UPDATE"),
        4: (None, None, "INSERT"),
    }


def test_interval_change_feed_equals_journal_change_feed(spark):
    """f35 ≡ f34: the diff computed from SCD2 intervals equals the diff
    of two as-of reads, including tie groups (empty intervals never
    match) and NULL-value transitions."""
    from dwh_etl_framework_spark.operators.merge import (
        change_feed,
        change_feed_from_intervals,
        scd2_intervals,
    )

    rows = make_journal(23)
    journal = spark.createDataFrame(rows)
    t1, t2 = T0 + timedelta(hours=20), T0 + timedelta(hours=120)
    via_journal = change_feed(journal, SPEC, F.lit(t1), F.lit(t2), ["balance"])
    via_intervals = change_feed_from_intervals(
        scd2_intervals(journal, SPEC), SPEC, F.lit(t1), F.lit(t2), ["balance"]
    )
    key = lambda r: (r["account_id"], r["balance_date"])
    a = {key(r): tuple(r) for r in via_journal.collect()}
    b = {key(r): tuple(r) for r in via_intervals.collect()}
    assert a == b and a
