"""Regenerate PLANS.md: formatted physical plans for the headline
queries with the scale-relevant properties called out.

Usage: python scripts/dump_plans.py  (writes PLANS.md at the repo root)
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rustcheatersdatapipeline_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entry  # noqa: E402

SF = "/root/testdata/sf0.01"

#: query → what to look for in its plan
ANNOTATED = {
    "q4": "filter pushed to the parquet scan (PushedFilters: StringContains)",
    "q15": "bounded dim broadcast via explicit hint; the population-scaled customer side compiles to SMJ and AQE promotes it to broadcast from runtime sizes (static estimates are untrusted — see session.py)",
    "q22": "map-side partial_count before the exchange",
    "q23": "TakeOrderedAndProject — top-k without a global sort",
    "dedup_minhash_lsh": (
        "banded equi-join candidates; verify join carries NO broadcast hint "
        "(AQE picks the strategy from runtime sizes)"
    ),
    "ann_lsh_search": (
        "bucket equality join — candidates bounded per bucket, no all-pairs; "
        "signature computed in whole-stage codegen (no Python)"
    ),
    "doc_fingerprint": (
        "zero-shuffle winnowing: array expressions only, one Exchange for the "
        "final ORDER BY"
    ),
    "events_sessionize": "one shuffle on user_id shared by both window passes",
    "dedup_ngram_jaccard": (
        "df(g) as a window count over one g-exchange of the shingle table "
        "(round-8: replaces the former groupBy+join that shuffled the same "
        "rows by g twice); per-doc size and prefix rank share one doc_id "
        "exchange"
    ),
    "dsir_resample": (
        "bucket score table joined back on an equi key; the only non-equi "
        "joins are the two single-row totals grids; selection is "
        "TakeOrderedAndProject over integer Gumbel keys"
    ),
    "mixture_token_budget_sample": (
        "r11 skew-safe form: the corpus tokenizes ONCE into a checkpointed "
        "narrow projection (both ExistingRDD scans are that materialization "
        "— no parquet rescan); the admission threshold aggregates per "
        "(lang, quality-level) and rides a BROADCAST join, so the ranking "
        "window sorts only ~budget-sized survivors — a 99%-one-language "
        "corpus cannot serialize the stage (measured: skew gate 0.36x)"
    ),
    "hybrid_search_rrf": (
        "union of the two arms' top-k + one per-(query,doc) hash aggregate; "
        "both BroadcastNestedLoopJoins have bounded broadcast sides (kNN "
        "query set; 1-row bm25 stats) — never corpus x corpus"
    ),
}


def main() -> None:
    spark = get_spark(cpus="8")
    spark.sparkContext.setLogLevel("ERROR")
    qs = dict(entry.queries())
    from rustcheatersdatapipeline_spark.plans import queries as _Q
    from rustcheatersdatapipeline_spark.plans import retrieval as _R
    from rustcheatersdatapipeline_spark.plans import training as _T

    qs.update(_Q.TESTS_ONLY_QUERIES)
    qs.update(_T.TESTS_ONLY_QUERIES)
    qs.update(_R.TESTS_ONLY_QUERIES)
    out = [
        "# PLANS — physical plans of the headline queries\n",
        "Regenerate with `python scripts/dump_plans.py` (sf0.01 inputs; the",
        "plan SHAPE is scale-independent even though sizes are not).",
        "Properties pinned mechanically in `tests/test_plan_shape.py`.\n",
    ]
    for name, note in ANNOTATED.items():
        df = qs[name](spark, SF)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        # operator tree + the scan-evidence lines from the detail section
        tree = plan.split("\n\n")[0]
        evidence = [
            ln.strip()
            for ln in plan.splitlines()
            if ln.strip().startswith(("PushedFilters:", "ReadSchema:"))
        ]
        ev = ("\n" + "\n".join(evidence)) if evidence else ""
        out.append(f"## {name}\n\n*{note}*\n\n```\n{tree}{ev}\n```\n")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PLANS.md"), "w") as fh:
        fh.write("\n".join(out))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
