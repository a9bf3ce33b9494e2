"""Journal→master merge protocol as oracle-checked queries (F19-F21).

The fixtures carry no journal table, so one is derived deterministically
from ``lineitem``: each line row is a "version" of its order —
PK = l_orderkey, __transform_dt = l_shipdate, __load_dt = l_shipdate,
__seqno = l_linenumber, __record_state = 'A' unless l_returnflag='R' (→'H').
That reproduces the exact shape the reference merges
(``airflow_etl.py:154-223``) including tie-breaking on colliding
__transform_dt (many lines share a ship date).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dwh_etl_framework_spark.operators.merge import (
    JournalSpec,
    flip_journal_state,
    merge_delta,
    merge_full,
)
from dwh_etl_framework_spark.queries.registry import fixtures, query

_SPEC = JournalSpec(primary_key=("account_id",))

_JOURNAL_SQL = """
    SELECT l_orderkey AS account_id,
           l_extendedprice AS balance,
           l_shipdate AS __transform_dt,
           l_shipdate AS __load_dt,
           -- (orderkey, linenumber, shipdate) is NOT unique in the synthetic
           -- fixture; fold the payload into the seqno so the merge ordering
           -- is total (floor(price*100) is IEEE-identical in both engines)
           CAST(l_linenumber AS BIGINT) * 10000000000
               + CAST(floor(l_extendedprice * 100) AS BIGINT) AS __seqno,
           CASE WHEN l_returnflag = 'R' THEN 'H' ELSE 'A' END AS __record_state
    FROM lineitem
"""


def _journal(spark: SparkSession) -> DataFrame:
    return spark.sql(_JOURNAL_SQL)


@query(
    "f19_merge_full",
    oracle=f"""
    WITH journal AS ({_JOURNAL_SQL}),
    ranked AS (
        SELECT account_id, balance,
               row_number() OVER (
                   PARTITION BY account_id
                   ORDER BY __transform_dt DESC, __load_dt DESC, __seqno ASC
               ) AS rnk
        FROM journal
    )
    SELECT account_id, balance FROM ranked WHERE rnk = 1
    """,
)
def f19_merge_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F19 full merge (airflow_etl.py:154-178): master := latest version per

    PK over ALL journal states, ordered __transform_dt DESC, __load_dt DESC,
    __seqno ASC. One shuffle on the PK; AQE splits skewed keys."""
    fixtures(spark, sf_dir)
    return merge_full(_journal(spark), _SPEC)


@query(
    "f20_merge_delta",
    oracle=f"""
    WITH journal AS ({_JOURNAL_SQL}),
    master AS (
        SELECT o_orderkey AS account_id, o_totalprice AS balance FROM orders
    ),
    active AS (SELECT * FROM journal WHERE __record_state = 'A'),
    kept AS (
        SELECT m.* FROM master m
        WHERE NOT EXISTS (SELECT 1 FROM active a WHERE a.account_id = m.account_id)
    ),
    upserts AS (
        SELECT account_id, balance FROM (
            SELECT account_id, balance,
                   row_number() OVER (
                       PARTITION BY account_id
                       ORDER BY __transform_dt DESC, __load_dt DESC, __seqno ASC
                   ) AS rnk
            FROM active
        ) WHERE rnk = 1
    )
    SELECT * FROM kept UNION ALL SELECT * FROM upserts
    """,
)
def f20_merge_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F20 delta merge / upsert (airflow_etl.py:179-214): delete master rows

    whose PK has Active journal rows (anti-join), insert latest Active per
    PK. Master here = orders (same key domain). The distinct-changed-keys
    side is one load cycle — broadcastable at any realistic scale."""
    fixtures(spark, sf_dir)
    master = spark.sql(
        "SELECT o_orderkey AS account_id, o_totalprice AS balance FROM orders"
    )
    return merge_delta(master, _journal(spark), _SPEC)


@query(
    "f21_state_flip",
    oracle=f"""
    WITH journal AS ({_JOURNAL_SQL})
    SELECT account_id, __seqno,
           CASE WHEN __record_state = 'A' THEN 'H' ELSE __record_state END
               AS __record_state
    FROM journal
    """,
)
def f21_state_flip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F21 journal state flip 'A'→'H' after merge (airflow_etl.py:216-223)."""
    fixtures(spark, sf_dir)
    return flip_journal_state(_journal(spark)).select(
        "account_id", "__seqno", "__record_state"
    )


@query(
    "f22_journal_compaction",
    oracle=f"""
    WITH journal AS ({_JOURNAL_SQL}),
    ranked AS (
        SELECT account_id, balance, __seqno, __record_state,
               row_number() OVER (
                   PARTITION BY account_id
                   ORDER BY __transform_dt DESC, __load_dt DESC, __seqno ASC
               ) AS rnk
        FROM journal
    )
    SELECT account_id, balance, __seqno, __record_state
    FROM ranked WHERE rnk <= 2
    """,
)
def f22_journal_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Journal compaction (operators/merge.compact_journal): retain the 2

    newest versions per PK, dropping older history — the maintenance pass
    that bounds merge input at scale (the reference never deletes journal
    rows)."""
    from dwh_etl_framework_spark.operators.merge import compact_journal

    fixtures(spark, sf_dir)
    return compact_journal(_journal(spark), _SPEC, keep_versions=2).select(
        "account_id", "balance", "__seqno", "__record_state"
    )


#: as-of timestamp for the oracled time-travel read — mid-range of the
#: synthetic journal's __transform_dt (l_shipdate spans 1992-1998), so
#: roughly half the versions are visible and many keys resolve to an
#: OLDER version than the current master's.
AS_OF_DT = "1995-06-30"


@query(
    "f32_time_travel_read",
    oracle=f"""
    WITH journal AS ({_JOURNAL_SQL}),
    vis AS (
        SELECT * FROM journal WHERE __transform_dt <= DATE '{AS_OF_DT}'
    ),
    ranked AS (
        SELECT account_id, balance, __transform_dt,
               row_number() OVER (
                   PARTITION BY account_id
                   ORDER BY __transform_dt DESC, __load_dt DESC, __seqno ASC
               ) AS rnk
        FROM vis
    )
    SELECT account_id, balance, __transform_dt AS version_dt
    FROM ranked WHERE rnk = 1
    """,
)
def f32_time_travel_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-tier time travel: the master AS OF {AS_OF_DT} reconstructed

    from the journal (operators/merge.as_of_read) — one time filter +
    the same latest-per-key rank as merge_full, with the surviving
    version's ``__transform_dt`` kept as the version stamp. The filter
    pushes down to the journal scan (partition-pruned on a
    date-partitioned journal), so a past state costs LESS than the
    current rebuild. The reference keeps full journal history but has
    no replay operator; this closes the audit/backfill gap its
    protocol implies."""
    fixtures(spark, sf_dir)
    from dwh_etl_framework_spark.operators.merge import as_of_read
    from pyspark.sql import functions as F

    return as_of_read(
        _journal(spark), _SPEC, F.lit(AS_OF_DT).cast("date")
    ).withColumnRenamed("__transform_dt", "version_dt")


#: change-feed window for the oracled entry: two mid-history years
#: (journal __transform_dt spans 1995-2001), so the fixture exercises
#: BOTH change types — keys first seen inside the window (INSERT) and
#: keys whose latest version moved (UPDATE).
CDF_FROM = "1996-06-30"
CDF_TO = "1998-06-30"


@query(
    "f34_change_feed",
    oracle=f"""
    WITH journal AS ({_JOURNAL_SQL}),
    before AS (
        SELECT account_id, balance FROM (
            SELECT account_id, balance,
                   row_number() OVER (
                       PARTITION BY account_id
                       ORDER BY __transform_dt DESC, __load_dt DESC,
                                __seqno ASC
                   ) AS rnk
            FROM journal WHERE __transform_dt <= DATE '{CDF_FROM}'
        ) WHERE rnk = 1
    ),
    after AS (
        SELECT account_id, balance FROM (
            SELECT account_id, balance,
                   row_number() OVER (
                       PARTITION BY account_id
                       ORDER BY __transform_dt DESC, __load_dt DESC,
                                __seqno ASC
                   ) AS rnk
            FROM journal WHERE __transform_dt <= DATE '{CDF_TO}'
        ) WHERE rnk = 1
    )
    SELECT COALESCE(a.account_id, b.account_id) AS account_id,
           b.balance AS old_balance,
           a.balance AS new_balance,
           CASE WHEN b.account_id IS NULL THEN 'INSERT'
                ELSE 'UPDATE' END AS change_type
    FROM after a
    LEFT JOIN before b ON a.account_id = b.account_id
    WHERE b.account_id IS NULL OR (a.balance IS DISTINCT FROM b.balance)
    """,
)
def f34_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-tier change data feed: the NET per-key changes between two

    journal timestamps — new keys flagged INSERT, changed values
    UPDATE, unchanged keys omitted (the no-op-suppressing change feed a
    downstream incremental consumer wants, computed from the SAME
    journal the merges read; the reference's stubbed delta extract
    shape, answered retroactively for ANY [T1, T2]). Built as
    as_of_read(T2) ⟕ as_of_read(T1): both sides are one pushdown-able
    time filter + the merge_full rank, joined on the PK — three
    PK-keyed exchanges total, AQE-skew-splittable, no history ever
    crosses the network beyond each side's surviving version. The
    append-only journal means DELETEs cannot exist ('H' marks
    consumed-by-merge, not removal — f21); a retention protocol would
    add them as a third branch. Key presence is tested via an explicit
    marker column (NOT via old_balance nullness — a pre-existing key
    whose surviving version carries a NULL value column must be UPDATE,
    not INSERT) and value change uses null-safe IS DISTINCT FROM so
    NULL↔value transitions are emitted (ADVICE r9 #1)."""
    fixtures(spark, sf_dir)
    from dwh_etl_framework_spark.operators.merge import change_feed

    return change_feed(
        _journal(spark),
        _SPEC,
        F.lit(CDF_FROM).cast("date"),
        F.lit(CDF_TO).cast("date"),
        ["balance"],
    )


@query(
    "f35_interval_change_feed",
    oracle=f"""
    WITH journal AS ({_JOURNAL_SQL}),
    iv AS (
        SELECT account_id, balance,
               __transform_dt AS valid_from,
               lead(__transform_dt) OVER (
                   PARTITION BY account_id
                   ORDER BY __transform_dt ASC, __load_dt ASC, __seqno DESC
               ) AS valid_to
        FROM journal
    ),
    before AS (
        SELECT account_id, balance FROM iv
        WHERE valid_from <= DATE '{CDF_FROM}'
          AND (valid_to IS NULL OR valid_to > DATE '{CDF_FROM}')
    ),
    after AS (
        SELECT account_id, balance FROM iv
        WHERE valid_from <= DATE '{CDF_TO}'
          AND (valid_to IS NULL OR valid_to > DATE '{CDF_TO}')
    )
    SELECT a.account_id AS account_id,
           b.balance AS old_balance,
           a.balance AS new_balance,
           CASE WHEN b.account_id IS NULL THEN 'INSERT'
                ELSE 'UPDATE' END AS change_type
    FROM after a
    LEFT JOIN before b ON a.account_id = b.account_id
    WHERE b.account_id IS NULL OR (a.balance IS DISTINCT FROM b.balance)
    """,
)
def f35_interval_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-tier: the f34 change feed served from the MATERIALIZED SCD2
    interval table instead of re-ranking the journal — two
    interval-containment filters (pushdown-able; zero windows at read
    time) + the same presence-marker diff. Output ≡ f34 by the
    half-open-interval/as-of equivalence (empty tie intervals can never
    match — the pit_join guarantee), which this oracle certifies
    end-to-end. The streaming tier serves the same read from the
    continuously maintained ``streaming/scd2`` state
    (tests/test_stream_scd2.py twin): derive intervals once, answer
    time travel, PIT joins AND change feeds from one history table —
    the lakehouse CDF read path (Delta change-data-feed shape) built
    on parquet."""
    fixtures(spark, sf_dir)
    from dwh_etl_framework_spark.operators.merge import (
        change_feed_from_intervals,
        scd2_intervals,
    )

    iv = scd2_intervals(_journal(spark), _SPEC)
    return change_feed_from_intervals(
        iv,
        _SPEC,
        F.lit(CDF_FROM).cast("date"),
        F.lit(CDF_TO).cast("date"),
        ["balance"],
    )


@query(
    "f36_right_to_erasure",
    oracle=f"""
    WITH journal AS ({_JOURNAL_SQL}),
    kept AS (
        SELECT * FROM journal WHERE account_id % 97 <> 0
    ),
    ranked AS (
        SELECT account_id, balance,
               row_number() OVER (
                   PARTITION BY account_id
                   ORDER BY __transform_dt DESC, __load_dt DESC, __seqno ASC
               ) AS rnk
        FROM kept
    )
    SELECT account_id, balance FROM ranked WHERE rnk = 1
    """,
)
def f36_right_to_erasure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-tier deletion protocol: hard-erase every version of the
    requested PKs from the journal (operators/merge.erase_journal_keys
    — one broadcast anti-join rewrite), then rebuild the master; the
    erased keys are gone from EVERY read — current, time-travel,
    intervals, change feed. The reference's journal only ever flips
    'A'→'H' (consumed, airflow_etl.py:216-223) and can never delete;
    this is the GDPR-shaped operation an append-only warehouse needs,
    done as the same partition-rewrite pass as compaction. The erasure
    set here is the deterministic fixture predicate account_id % 97 = 0
    (request-list-sized in production)."""
    fixtures(spark, sf_dir)
    from dwh_etl_framework_spark.operators.merge import erase_journal_keys

    j = _journal(spark)
    erase = j.select("account_id").filter(
        F.col("account_id") % 97 == 0
    ).distinct()
    return merge_full(erase_journal_keys(j, _SPEC, erase), _SPEC)
