"""Validate the bench calibration ruler against the judge's method.

The judge adjudicates host weather by the MEDIAN per-query ratio on
UNTOUCHED plans between two bench readings (plans whose code did not
change cannot legitimately move, so their median ratio IS the window's
inflation). The r13 ruler (bench.py frozen 10-query ruler, scan/job
probes as diagnostics) claims to measure the same statistic inside a
single run; this script checks the claim:

    python scripts/validate_calibration.py CANDIDATE.json REFERENCE.json \
        [--changed q1,dedup_cluster,...] [--tolerance 0.15]

It reports

- the untouched-plan median ratio candidate/reference (the truth),
- the candidate's job-probe host_factor relative to the reference's
  (readings before r13 carry no job probe; their factor defaults to
  the value recorded in the file, else 1.0),
- the relative deviation between the two, PASS/FAIL vs tolerance.

Exit code 0 iff within tolerance — usable as a pinning check after any
protocol reading (SCALE.md "Calibration protocol (r13)" records runs).
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys


def _load(path: str) -> dict:
    with open(path) as f:
        txt = f.read()
    # accept either a bare bench line or the driver's BENCH_r{N}.json
    # wrapper ({"parsed": {...}})
    obj = json.loads(txt)
    if "parsed" in obj and isinstance(obj["parsed"], dict):
        obj = obj["parsed"]
    if "queries" not in obj:
        raise SystemExit(f"{path}: no 'queries' block")
    return obj


def _host_factor(obj: dict) -> float | None:
    cal = obj.get("calibration") or {}
    # r13+ files: host_factor IS the query-ruler factor; r12 files:
    # scan-probe host_factor (known-misleading, still usable as a
    # coarse reference); earlier files: none
    if "host_factor" in cal:
        return float(cal["host_factor"])
    return None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("candidate")
    ap.add_argument("reference")
    ap.add_argument(
        "--changed",
        default="",
        help="comma-separated query names whose plans changed between the "
        "two readings (excluded from the untouched median)",
    )
    ap.add_argument("--tolerance", type=float, default=0.15)
    args = ap.parse_args()

    cand, ref = _load(args.candidate), _load(args.reference)
    changed = {q for q in args.changed.split(",") if q}
    common = sorted(
        (set(cand["queries"]) & set(ref["queries"])) - changed
    )
    if len(common) < 10:
        print(f"only {len(common)} untouched queries in common — too few")
        return 2
    ratios = sorted(cand["queries"][q] / ref["queries"][q] for q in common)
    untouched_median = statistics.median(ratios)

    cf, rf = _host_factor(cand), _host_factor(ref)
    if cf is None:
        print("candidate has no calibration block")
        return 2
    factor_ratio = cf / (rf if rf else 1.0)
    dev = abs(factor_ratio - untouched_median) / untouched_median

    print(
        json.dumps(
            {
                "n_untouched": len(common),
                "untouched_median_ratio": round(untouched_median, 4),
                "untouched_p25_p75": [
                    round(ratios[len(ratios) // 4], 4),
                    round(ratios[(3 * len(ratios)) // 4], 4),
                ],
                "candidate_host_factor": cf,
                "reference_host_factor": rf,
                "factor_ratio": round(factor_ratio, 4),
                "relative_deviation": round(dev, 4),
                "tolerance": args.tolerance,
                "verdict": "PASS" if dev <= args.tolerance else "FAIL",
            },
            indent=1,
        )
    )
    return 0 if dev <= args.tolerance else 1


if __name__ == "__main__":
    sys.exit(main())
