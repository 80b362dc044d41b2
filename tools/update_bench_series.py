"""Regenerate BENCH_SERIES.json — the canary-normalized per-query
reference values bench.py's suspect check compares against.

Reads BENCH_DETAIL.json (the last full local bench run) and divides
each query's best-of-N by that run's PRE canary ratio, so the stored
reference is expressed at the recorded-baseline box speed; at bench
time the expectation is re-scaled by the CURRENT pre ratio
(expected_now = series_value * drift_pre). Refresh it after a bench
run whose bracket reads clean (pre ≈ post, both inside the
CANARY_BASELINE no-drift band) — refreshing from a drifted run would
bake the drift into the expectations and blind the suspect check to
exactly the windows it exists to catch.

Usage: python tools/update_bench_series.py
"""

from __future__ import annotations

import json
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> None:
    detail = json.loads((REPO / "BENCH_DETAIL.json").read_text())
    canary = detail.get("drift_canary") or {}
    # r8+ shape: {"pre": {...}, "post": {...}}; pre-r8: flat dict
    pre = canary.get("pre", canary)
    post = canary.get("post") or {}
    ratio = pre.get("ratio") or 1.0
    out = {
        "recorded": (
            f"normalized from BENCH_DETAIL.json at sf={detail.get('sf')}"
            f", bracket pre={pre.get('ratio')} post={post.get('ratio')}"
            " — per-query best-of-N divided by the PRE ratio, so values"
            " are at recorded-baseline box speed"
        ),
        "queries": {
            name: round(sec / ratio, 3)
            for name, sec in detail["queries"].items()
        },
    }
    (REPO / "BENCH_SERIES.json").write_text(
        json.dumps(out, indent=2) + "\n"
    )
    print(f"wrote {len(out['queries'])} reference values "
          f"(pre ratio {ratio})")


if __name__ == "__main__":
    main()
