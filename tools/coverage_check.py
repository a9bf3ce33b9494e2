#!/usr/bin/env python
"""Guard against doc rot: every query name mentioned in COVERAGE.md must

exist in the registry, and every registry entry must be mentioned in
COVERAGE.md. Run in CI/pre-commit; exits nonzero on drift."""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dwh_etl_framework_spark.queries import (  # noqa: E402
    DRIVER_WINDOW,
    QUERIES,
    SF1_EXCLUDED,
    SF1_SWEEP,
    WINDOW_EVER,
)

#: queries that MUST receive driver correctness evidence every round
#: (VERDICT r1 finding #1: registration order decides evidence).
CRITICAL = [
    "f19_merge_full",
    "f20_merge_delta",
    "f21_state_flip",
    "r28_asof_join",
    # r26_json_extract rotated out of the window in round 6 (VERDICT r5
    # item 2) after five straight green rounds; its oracle stays in the
    # local parity suite + PARITY_r{NN}.
    "r30_tumbling_window",
    "x01_exact_dedup",
    "x03b_minhash_lsh_portable",
    "x05_cosine_topk",
    "x20_dedup_clusters",
]


def check_driver_window() -> list[str]:
    """The driver checks only the first 50 registry entries; make sure the
    critical operators sit inside that prefix."""
    problems = []
    prefix = list(QUERIES)[:50]
    if prefix != DRIVER_WINDOW[:50]:
        problems.append(
            f"first-50 registry prefix != DRIVER_WINDOW: {prefix[:5]}..."
        )
    outside = [n for n in CRITICAL if n not in prefix]
    if outside:
        problems.append(f"critical queries outside the driver's first-50: {outside}")
    return problems


def check_post_window_evidence() -> list[str]:
    """Every query OUTSIDE the driver's first-50 window must carry local
    regression evidence: a DuckDB oracle (exercised by
    tests/test_oracle_parity.py and tools/run_parity.py) or, for rows-only
    queries, a dedicated pytest that names it (ADVICE r2: the production
    twins pushed past slot 50 must not rely on nothing)."""
    problems = []
    tests_dir = Path(__file__).resolve().parent.parent / "tests"
    test_text = "\n".join(
        p.read_text() for p in sorted(tests_dir.glob("test_*.py"))
    )
    post_window = list(QUERIES)[50:]
    for name in post_window:
        if QUERIES[name].oracle is not None:
            continue  # local parity suite covers it
        # rows-only: require the query name (or its operator module) in tests
        if name not in test_text:
            problems.append(
                f"rows-only query {name!r} is outside the driver window and "
                "not named in any tests/test_*.py"
            )
    return problems


def _driver_ran() -> set[str]:
    """Union of every query name with a CORRECTNESS_r*.json driver row —
    the one artifact scan three checkers share (review r13: it was
    copy-pasted three ways; a format change must land once)."""
    import json

    repo = Path(__file__).resolve().parent.parent
    ran: set[str] = set()
    for artifact in sorted(repo.glob("CORRECTNESS_r*.json")):
        ran |= set(json.loads(artifact.read_text()))
    return ran


def check_window_exit_evidence() -> list[str]:
    """No query may exit DRIVER_WINDOW without driver evidence (VERDICT r6
    item 2: x51/x52 — plus f06/x53/x56/x59, found auditing the artifacts —
    entered and left the window between driver runs, ending with zero
    CORRECTNESS rows ever). Two-sided ledger invariant:

      1. every current window member must be in ``WINDOW_EVER`` (so
         rotating a query IN forces appending it to the ledger);
      2. every ledger member NOT currently in the window must appear in
         at least one ``CORRECTNESS_r*.json`` (so rotating a query OUT
         before the driver has run it fails CI).
    """
    problems = []
    untracked = sorted(set(DRIVER_WINDOW) - WINDOW_EVER)
    if untracked:
        problems.append(
            f"DRIVER_WINDOW entrants missing from WINDOW_EVER ledger: {untracked}"
        )
    never_run_exits = sorted(WINDOW_EVER - set(DRIVER_WINDOW) - _driver_ran())
    if never_run_exits:
        problems.append(
            "queries exited DRIVER_WINDOW without ever receiving a "
            f"CORRECTNESS_r* row: {never_run_exits} — rotate them back in "
            "before removing them"
        )
    return problems


def check_plans_quoted_times_fresh() -> list[str]:
    """PLANS.md quotes measured wall times in its audited sections
    (``- **<query> (N s)**``). VERDICT r9 'what's wrong' #1: a section
    kept quoting a pre-optimization time after the measured query
    changed, silently eroding trust in the plan ledger. Any quoted time
    for a query present in BENCH_local.json must sit within 3x of the
    current official number in either direction (machine noise and
    cold/warm deltas are real; a 3x divergence means the section
    predates a reshape and must be re-stamped)."""
    import json
    import re

    repo = Path(__file__).resolve().parent.parent
    plans = repo / "PLANS.md"
    bench = repo / "BENCH_local.json"
    if not plans.exists() or not bench.exists():
        return []
    official = json.loads(bench.read_text()).get("queries", {})
    problems = []
    for name, quoted in re.findall(
        r"^- \*\*([a-z0-9_]+) \((\d+(?:\.\d+)?) s", plans.read_text(), re.M
    ):
        if name not in official:
            continue
        q, o = float(quoted), float(official[name])
        if o > 0 and not (o / 3 <= q <= o * 3):
            problems.append(
                f"PLANS.md quotes {q} s for {name} but BENCH_local.json "
                f"measures {o} s — the audited section predates a plan "
                "change; re-stamp it"
            )
    return problems


def check_parity_artifact_fresh() -> list[str]:
    """The newest PARITY_r*.json must cover EVERY registry entry (VERDICT
    r3 item 2: the artifact silently went stale when new queries were
    registered after it was generated). Regenerate with
    ``python tools/run_parity.py <round>`` whenever this fires."""
    import json

    repo = Path(__file__).resolve().parent.parent
    artifacts = sorted(repo.glob("PARITY_r*.json"))
    if not artifacts:
        return ["no PARITY_r*.json artifact exists — run tools/run_parity.py"]
    latest = artifacts[-1]
    covered = set(json.loads(latest.read_text()))
    missing = sorted(set(QUERIES) - covered)
    if missing:
        return [
            f"{latest.name} is stale: registry entries without parity "
            f"evidence: {missing} — rerun tools/run_parity.py"
        ]
    return []


def check_sf1_sweep_evidence() -> list[str]:
    """Claimed sf1 evidence must exist as artifact rows (VERDICT r8 #1:
    the round-8 rotation note claimed wave-13 queries rode 'the sf1
    sweep' while PARITY_sf1.json predated them — claims and artifacts
    must not diverge). Three-way invariant:

      1. every SF1_SWEEP member has a GREEN row in PARITY_sf1.json;
      2. PARITY_sf1.json contains no row outside SF1_SWEEP (a stale
         artifact covering renamed/retired queries fails too);
      3. every SF1_EXCLUDED entry maps to a registered twin that is
         itself in the sweep (the excluded operator's scale evidence
         actually exists somewhere).
    """
    import json

    repo = Path(__file__).resolve().parent.parent
    artifact = repo / "PARITY_sf1.json"
    if not artifact.exists():
        return ["PARITY_sf1.json missing — run the sf1 sweep "
                "(tools/run_parity.py --subset <SF1_SWEEP> --out PARITY_sf1.json)"]
    rows = json.loads(artifact.read_text())
    problems = []
    missing = sorted(SF1_SWEEP - set(rows))
    if missing:
        problems.append(
            f"SF1_SWEEP members without a PARITY_sf1.json row: {missing} — "
            "regenerate the sf1 artifact"
        )
    extra = sorted(set(rows) - SF1_SWEEP)
    if extra:
        problems.append(
            f"PARITY_sf1.json rows outside SF1_SWEEP: {extra} — stale artifact"
        )
    red = sorted(
        n for n in SF1_SWEEP & set(rows)
        if rows[n].get("err") or rows[n].get("hash_match") is not True
    )
    if red:
        problems.append(f"non-green PARITY_sf1.json rows: {red}")
    bad_twins = sorted(
        f"{k} -> {v}" for k, v in SF1_EXCLUDED.items()
        if v not in QUERIES or v not in SF1_SWEEP
    )
    if bad_twins:
        problems.append(
            f"SF1_EXCLUDED twins not registered or not in the sweep: {bad_twins}"
        )
    return problems


def check_rotation_queue() -> list[str]:
    """Never-windowed oracled queries must carry a written rotation
    schedule (VERDICT r11 item 3): each one either sits in
    ``ROTATION_QUEUE`` with a target round, or in ``ROTATION_EXEMPT``
    with a documented reason (the sf1 sampled twins), or already has
    driver evidence (WINDOW_EVER membership / a CORRECTNESS row). A new
    oracled query therefore cannot be registered without scheduling its
    driver evidence — prose queues drift, a checked set cannot."""
    from dwh_etl_framework_spark.queries import ROTATION_EXEMPT, ROTATION_QUEUE

    problems = []
    driver_ran = _driver_ran()
    scheduled = set(ROTATION_QUEUE) | ROTATION_EXEMPT
    unscheduled = sorted(
        n for n, q in QUERIES.items()
        if q.oracle is not None
        and n not in WINDOW_EVER
        and n not in driver_ran
        and n not in scheduled
    )
    if unscheduled:
        problems.append(
            "oracled queries with no driver evidence and no rotation "
            f"schedule: {unscheduled} — add them to ROTATION_QUEUE (with a "
            "target round) or ROTATION_EXEMPT (with a reason)"
        )
    stale = sorted(set(ROTATION_QUEUE) & (WINDOW_EVER | driver_ran))
    if stale:
        problems.append(
            f"ROTATION_QUEUE members that already have driver evidence: "
            f"{stale} — drop them from the queue"
        )
    ghosts = sorted((set(ROTATION_QUEUE) | ROTATION_EXEMPT) - set(QUERIES))
    if ghosts:
        problems.append(f"rotation schedule names not in the registry: {ghosts}")
    return problems


def check_window_ever_complete() -> list[str]:
    """WINDOW_EVER must mean what its docstring says (VERDICT r12 "what's
    wrong" #2: x67 had a CORRECTNESS_r06 row but was missing from the
    ledger, and check_rotation_queue only passed via its driver_ran
    fallback): every query name appearing in ANY CORRECTNESS_r*.json
    artifact must be listed in WINDOW_EVER — the ledger is self-checking,
    not fallback-rescued."""
    problems = []
    unledgered = sorted(_driver_ran() - WINDOW_EVER)
    if unledgered:
        problems.append(
            "queries with CORRECTNESS_r* driver rows missing from the "
            f"WINDOW_EVER ledger: {unledgered} — append them"
        )
    return problems


def main() -> int:
    text = Path(__file__).resolve().parent.parent.joinpath("COVERAGE.md").read_text()
    mentioned = set(re.findall(r"`([frx]\d{2}[a-z0-9_]*)`", text))
    registered = set(QUERIES)
    ghost = sorted(mentioned - registered)
    missing = sorted(registered - mentioned)
    if ghost:
        print(f"COVERAGE.md mentions unknown queries: {ghost}")
    if missing:
        print(f"registry entries missing from COVERAGE.md: {missing}")
    if ghost or missing:
        return 1
    n_oracles = sum(1 for q in QUERIES.values() if q.oracle)
    claimed = re.search(r"(\d+) `queries\(\)` entries, (\d+) with value oracles", text)
    if claimed and (int(claimed.group(1)), int(claimed.group(2))) != (
        len(QUERIES),
        n_oracles,
    ):
        print(
            f"COVERAGE.md totals {claimed.groups()} != actual "
            f"({len(QUERIES)}, {n_oracles})"
        )
        return 1
    window_problems = (
        check_driver_window()
        + check_post_window_evidence()
        + check_window_exit_evidence()
        + check_window_ever_complete()
        + check_rotation_queue()
        + check_parity_artifact_fresh()
        + check_sf1_sweep_evidence()
        + check_plans_quoted_times_fresh()
    )
    if window_problems:
        for p in window_problems:
            print(p)
        return 1
    print(
        f"COVERAGE.md consistent: {len(QUERIES)} queries, {n_oracles} oracles; "
        f"driver window pinned ({len(DRIVER_WINDOW)} slots, "
        f"{len(CRITICAL)} critical inside)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
