#!/usr/bin/env python
"""Round-15 optimization profiler.

For each named query: build the DataFrame (fn phase — includes any eager
localCheckpoints and driver-side scalar jobs), capture
``explain("formatted")``, then time the noop-sink write (the bench's
timed region) over N reps. Reports fn_sec / write_sec medians separately
so work hiding in the untimed fn phase is visible (the bench times only
the write, bench.py:265-269 — methodology unchanged this round, but the
OPTIMIZATION target is fn+write TOTAL, not the timed half alone).

Usage:
    python tools/profile_r15.py x94_prefix_filter_jaccard x97_... \
        [--reps 3] [--sf-dir /root/testdata/sf0.1] [--plans-dir plans/r15] \
        [--suffix before]
"""

from __future__ import annotations

import argparse
import gc
import json
import statistics
import sys
import time
from contextlib import redirect_stdout
from io import StringIO
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dwh_etl_framework_spark.queries import QUERIES  # noqa: E402
from dwh_etl_framework_spark.session import SessionFactory  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    spark = SessionFactory(app_name="r15-profile").build()
    spark.sparkContext.setLogLevel("ERROR")

    # same warm-up discipline as bench.py
    for warm in ["r01_projection", "r02b_scalar_subquery", "r22b_string_more"]:
        try:
            QUERIES[warm].fn(spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass

    out: dict[str, dict] = {}
    for name in args.names:
        fn_times, wr_times = [], []
        plan_txt = None
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            df = QUERIES[name].fn(spark, args.sf_dir)
            t1 = time.perf_counter()
            if plan_txt is None:
                buf = StringIO()
                with redirect_stdout(buf):
                    df.explain("formatted")
                plan_txt = buf.getvalue()
            t2 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.perf_counter()
            fn_times.append(t1 - t0)
            wr_times.append(t3 - t2)
            gc.collect()
        rec = {
            "fn_med": round(statistics.median(fn_times), 3),
            "write_med": round(statistics.median(wr_times), 3),
            "total_med": round(
                statistics.median([a + b for a, b in zip(fn_times, wr_times)]), 3
            ),
            "fn_all": [round(x, 3) for x in fn_times],
            "write_all": [round(x, 3) for x in wr_times],
        }
        out[name] = rec
        if args.plans_dir:
            pdir = Path(args.plans_dir)
            pdir.mkdir(parents=True, exist_ok=True)
            (pdir / f"{name}_{args.suffix}.txt").write_text(plan_txt)
        print(f"{name}: fn={rec['fn_med']}s write={rec['write_med']}s "
              f"total={rec['total_med']}s", flush=True)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
