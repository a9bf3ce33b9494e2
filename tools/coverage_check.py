#!/usr/bin/env python
"""Guard against doc rot: every query name mentioned in COVERAGE.md must

exist in the registry, and every registry entry must be mentioned in
COVERAGE.md. Run in CI/pre-commit; exits nonzero on drift."""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dwh_etl_framework_spark.queries import QUERIES  # noqa: E402


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
    print(f"COVERAGE.md consistent: {len(QUERIES)} queries, {n_oracles} oracles")
    return 0


if __name__ == "__main__":
    sys.exit(main())
