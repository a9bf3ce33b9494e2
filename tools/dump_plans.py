#!/usr/bin/env python
"""Regenerate PLANS.md: audited physical plans for the headline queries.

Usage: python tools/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dwh_etl_framework_spark.queries import QUERIES  # noqa: E402
from dwh_etl_framework_spark.session import SessionFactory  # noqa: E402

AUDIT = {
    "r02_filter": "All 8 predicate conjuncts pushed into the parquet scan; ReadSchema pruned to 6 of 11 columns.",
    "r16_agg_pricing_summary": "Partial (map-side) + final HashAggregate around one 2-key shuffle; ship-date filter pushed to the scan.",
    "r14_inner_join_agg": "nation/customer broadcast at this SF (AQE decides; flips to sort-merge when they outgrow the threshold); lineitem⋈orders shuffles once on orderkey.",
    "f20_merge_delta": "Window dedup + left-anti join: one hash shuffle on the PK; the distinct-changed-keys side broadcasts.",
    "r09_sort_topk": "TakeOrderedAndProject: per-partition top-25 merged on the driver, no global sort.",
    "x05b_cosine_topk_fast": "1-row query vector broadcast (BroadcastNestedLoopJoin), cosine in JVM higher-order fns, TakeOrderedAndProject top-k.",
    "r04_top1_per_group": "Single WindowExec over one hash shuffle of the group key (the journal-merge core).",
    "x44_sequence_pack": "One exchange on the bounded source key, then Window cumsum + map-side projects — the packing decision never leaves the partition.",
    "x45_dup_ngram_rate": "Shingle doc-frequency agg joined back on the same shingle key; AQE broadcasts the df table at this SF and flips to a key-co-located sort-merge (one reusable exchange) when it outgrows the threshold.",
    "x46_lang_vocab_confidence": "Top-100 vocab via partial+final WindowGroupLimit (never sorts the full freq table), broadcast to the token probe; per-doc agg is partial (map-side) before its one doc_id shuffle.",
    "x47_sessionize": "lag + running-sum windows and the session aggregate share one user-keyed sort/exchange; no second wide shuffle of event rows.",
    "x49_embedding_outliers": "Dims explode map-side; centroid (|labels|x64) and per-label mean (|labels|) tables broadcast back; wide exchanges are only the two keyed partial aggregates.",
    "x51_token_pmi": "Unigram counts broadcast twice onto the HAVING-trimmed bigram table, 1-row N cross-broadcasts, top-100 is TakeOrderedAndProject (per-partition heads, no global sort); PMI ratio in DECIMAL(38,0).",
}

HEADER = [
    "# PLANS — audited physical plans at sf0.1 (local[32], AQE on)",
    "",
    "Generated from `.explain('formatted')`; regenerate with `python tools/dump_plans.py`.",
    "What to look for, per the 100 TB design goals in README.md: filters in",
    "`PushedFilters`, pruned `ReadSchema`, broadcasts only on dimension-sized",
    "inputs, one shuffle per agg/merge, `TakeOrderedAndProject` for top-k.",
    "",
]


#: Everything below this line in PLANS.md is hand-written per-round audit
#: (rounds 6-10 plan probes, A/B measurements, quoted times the coverage
#: check freshness-guards). Regeneration must PRESERVE it — a bare
#: write_text here once risked silently destroying hundreds of lines of
#: audit ledger.
MANUAL_MARKER = (
    "<!-- MANUAL-AUDITS: dump_plans.py preserves everything below this line -->"
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = SessionFactory(app_name="plan-dump").build()
    spark.sparkContext.setLogLevel("ERROR")
    out = list(HEADER)
    for name, note in AUDIT.items():
        df = QUERIES[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        tree = buf.getvalue().split("\n\n")[0]
        out.append(f"## {name}\n\n{note}\n\n```\n{tree}\n```\n")
    spark.stop()
    path = Path(__file__).resolve().parent.parent / "PLANS.md"
    manual = ""
    if path.exists() and MANUAL_MARKER in (existing := path.read_text()):
        manual = existing[existing.index(MANUAL_MARKER):]
    path.write_text("\n".join(out) + ("\n" + manual if manual else ""))
    print(
        "PLANS.md regenerated"
        + (" (manual audit sections preserved)" if manual else "")
    )


if __name__ == "__main__":
    main()
