#!/usr/bin/env python
"""Run the example pipeline end-to-end: config.yaml → dependencies → steps

→ journal write → delta merge → state flip. Mirrors the reference's
transform_db lifecycle (SURVEY.md §3 EP2) in ~15 lines of user code.

    python examples/customer_orders/run.py
"""

from __future__ import annotations

import sys
from datetime import datetime
from pathlib import Path

HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(HERE.parent.parent))

from dwh_etl_framework_spark import Pipeline, get_session, load_pipeline_config


def main() -> None:
    config = load_pipeline_config(HERE / "config.yaml")
    with get_session(app_name="example-customer-orders") as spark:
        pipe = Pipeline(
            spark=spark,
            table=config.tables[0],
            variable_resolver={"MIN_PRICE": 0.0}.__getitem__,
            sql_base_dir=str(HERE),  # sql_file paths resolve vs the config dir
        )
        master = pipe.run(
            read_mode="full",
            write_mode="append",
            merge_mode="delta",
            transform_dt=datetime(2024, 1, 1),
        )
        for step, d in pipe.last_join_decisions.items():
            print(
                f"join plan [{step}]: {d.strategy} "
                f"(n_left={d.n_left} n_right={d.n_right} "
                f"est_join_rows={d.est_join_rows})"
            )
        print(f"master rows: {master.count()}")
        master.orderBy("o_custkey").show(5)


if __name__ == "__main__":
    main()
