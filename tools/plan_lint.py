"""Registry-wide physical-plan linter.

Builds the physical plan of EVERY registry query at sf0.001 and
asserts three repo-wide invariants mechanically, instead of per-query
claims:

- no ``BatchEvalPython`` anywhere: row-at-a-time Python UDFs are
  banned from every data path (Arrow forms — ArrowEvalPython /
  MapInPandas / FlatMapGroupsInPandas — are the sanctioned Python
  boundary and are counted, not flagged);
- no ``CartesianProduct``: every cross join in the repo must be a
  broadcast of a parameter-sized frame (which plans as
  BroadcastNestedLoopJoin), never a shuffled cartesian;
- no UNADJUDICATED unpartitioned window (r4 verdict #2): a
  ``Window`` node with an empty partition spec — ordered or not —
  moves every input row to ONE task, the scale-killer class that
  produced r4's only weak finding. Every query whose plan contains
  one must carry a whitelist adjudication naming the parameter-sized
  frame the window actually runs over (distinct-value table,
  hour/day grid, offsets / carry-in table, top-k head,
  symbol-universe-bounded frame, ...), and the adjudication pins the
  exact SITE COUNT — growing a new global window inside a
  whitelisted query re-trips the lint.
  A corpus-sized unpartitioned window must be rewritten with the
  two-level prefix scan (``operators/rank.py``) instead of
  whitelisted.

Writes PLAN_LINT.md with the verdict, the per-query global-window
adjudication table, and the Python-boundary inventory. Iterative
queries execute their driver-side fixpoint loops during plan
construction — that is expected; the linter inspects the FINAL
returned plan of each.

Usage: python tools/plan_lint.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"

#: query -> (expected site count, why its unpartitioned window(s) are
#: parameter-sized, i.e. the window input is NEVER the corpus).
#: Adjudications are size-CLASS claims a reviewer can check against the
#: query source; the pinned count makes the adjudication PER-SITE — a
#: whitelisted query that grows a new global window trips the lint
#: instead of inheriting a stale blanket approval.
GLOBAL_WINDOW_WHITELIST: dict[str, tuple[int, str]] = {
    "concurrent_intervals_profile": (1,
        "day-grid carry-in offsets: one row per day — the "
        "parameter-sized level of its own two-level sweep"
    ),
    "cumulative_unique_users": (1,
        "#days frame: running sum over per-day first-seen counts "
        "(docstring: 'tiny by construction', never the event log)"
    ),
    "curriculum_quality_order": (3,
        "prefix-scan offsets tables only: per-richness-value counts "
        "(domain bounded by tokens-per-doc) and the 10x256 "
        "(decile, md5-prefix) cell table; corpus rows are windowed "
        "exclusively per-cell (r4 verdict #1 fix)"
    ),
    "kaplan_meier_conversion": (2,
        "life table: one row per discrete hour up to the censor "
        "horizon (docstring: horizon+1 rows max)"
    ),
    "kruskal_wallis_event_types": (1,
        "pooled distinct-value counts table — the rank construction "
        "never windows raw rows"
    ),
    "lang_temperature_mix": (4,
        "per-language mixture table (language-universe-bounded); all "
        "4 sites — temperature normalizers and totals — run over the "
        "same #languages-row frame"
    ),
    "largest_remainder_allocation": (3,
        "per-nation allocation table (nation-universe-bounded, 25 "
        "rows at any SF); all 3 sites — total, floor-sum, and the "
        "remainder rank — run over the same 25-row frame"
    ),
    "pareto_customer_revenue": (1,
        "prefix-scan offsets table only: one row per revenue band "
        "(64 broadcast-percentile buckets); customer rows are "
        "windowed exclusively per-band (operators/rank.py step 3)"
    ),
    "gini_customer_revenue": (1,
        "prefix-scan offsets table only: one row per revenue band "
        "(64 broadcast-percentile buckets); customer rows are "
        "windowed exclusively per-band (operators/rank.py step 3)"
    ),
    "portfolio_equal_weight_summary": (1,
        "portfolio-level hourly grid: one row per hour after the "
        "per-hour aggregate"
    ),
    "rolling_pair_correlation": (1,
        "hourly grid: one row per hour after the per-hour aggregate"
    ),
    "skyline_parts": (1,
        "cross-bucket prefix-min heads: one row per price bucket — "
        "the parameter-sized level of its own two-level decomposition"
    ),
    "benford_first_digit": (1,
        "digit-universe frame: the share denominator runs over the "
        "9-row first-digit count table"
    ),
    "histogram2d_qty_price": (1,
        "bin-grid frame: the density denominator runs over the "
        "(qty_bin x price_bin) cell table, bounded by the fixed grid"
    ),
    "partition_pruning_stats": (1,
        "partition-listing frame: one row per date partition of the "
        "layout under inspection"
    ),
    "psi_price_drift": (1,
        "PSI bin table: the early/late share denominators run over "
        "the fixed decile-bin frame"
    ),
    "rank_tests_panel": (1,
        "pooled and per-pair distinct-value counts tables — the "
        "shared rank construction never windows raw rows"
    ),
}


def _window_nodes(plan: str) -> list[tuple[bool, bool]]:
    """(has_partition, has_order) for every Window node in the plan.

    A Window node prints its top-level bracket groups as
    ``Window [funcs], [part], [order]`` (partitioned+ordered),
    ``Window [funcs], [order]`` (UNPARTITIONED ordered — the flagged
    shape), or ``Window [funcs], [part]`` (partition-only running
    frame). Ordering groups are recognizable by ``ASC``/``DESC``
    sort-direction tokens; partition groups never carry them.
    """
    out = []
    for line in plan.splitlines():
        idx = line.find("Window [")
        if idx < 0:
            continue
        rest = line[idx + len("Window "):]
        groups: list[str] = []
        depth = 0
        cur: list[str] = []
        for ch in rest:
            if ch == "[":
                depth += 1
                if depth == 1:
                    cur = []
                    continue
            elif ch == "]":
                depth -= 1
                if depth == 0:
                    groups.append("".join(cur))
                    continue
            if depth >= 1:
                cur.append(ch)
        groups = groups[:3]
        if len(groups) <= 1:
            # ``Window [funcs]`` — no partition, no order: the
            # whole-input running frame still moves every row to one
            # task, same class as the ordered form
            out.append((False, False))
            continue

        def _ordered(g: str) -> bool:
            return " ASC" in g or " DESC" in g

        if len(groups) == 3:
            out.append((True, True))
        elif _ordered(groups[1]):
            out.append((False, True))  # Window [funcs], [order]
        else:
            out.append((True, False))  # Window [funcs], [part]
    return out


def main() -> int:
    from stock_trend_predictor_spark import get_spark
    from stock_trend_predictor_spark.plans import REGISTRY

    spark = get_spark(
        app_name="plan-lint",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    flagged: list[tuple[str, str]] = []
    arrow_users: list[tuple[str, list[str]]] = []
    global_windows: list[tuple[str, int, str]] = []
    errors: list[tuple[str, str]] = []
    t0 = time.time()
    for name in sorted(REGISTRY):
        try:
            df = REGISTRY[name].fn(spark, SF)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # pragma: no cover - report, don't die
            errors.append((name, str(e)[:200]))
            continue
        if "CartesianProduct" in plan:
            flagged.append((name, "CartesianProduct"))
        if "BatchEvalPython" in plan:
            flagged.append((name, "BatchEvalPython (row-at-a-time UDF)"))
        n_unpart = sum(
            1
            for has_part, _ in _window_nodes(plan)
            if not has_part
        )
        if n_unpart:
            pin = GLOBAL_WINDOW_WHITELIST.get(name)
            if pin is None:
                flagged.append(
                    (
                        name,
                        f"{n_unpart} unpartitioned Window node(s) "
                        "with no whitelist adjudication",
                    )
                )
            elif pin[0] != n_unpart:
                flagged.append(
                    (
                        name,
                        f"{n_unpart} unpartitioned Window node(s) but "
                        f"the whitelist adjudicates exactly {pin[0]} — "
                        "re-adjudicate the new site(s)",
                    )
                )
            else:
                global_windows.append((name, n_unpart, pin[1]))
        kinds = sorted(
            {
                k
                for k in (
                    "ArrowEvalPython",
                    "MapInPandas",
                    "FlatMapGroupsInPandas",
                )
                if k in plan
            }
        )
        if kinds:
            arrow_users.append((name, kinds))

    stale = sorted(
        set(GLOBAL_WINDOW_WHITELIST)
        - {n for n, _, _ in global_windows}
        - {n for n, _ in errors}
    )

    lines = [
        "# PLAN_LINT — registry-wide physical-plan invariants",
        "",
        f"Checked {len(REGISTRY)} queries at {SF} "
        f"in {time.time() - t0:.0f}s.",
        "",
        "Invariants: no `BatchEvalPython` (row-at-a-time Python UDF) "
        "in any data path; no `CartesianProduct` (every cross join "
        "must broadcast a parameter-sized side); no unpartitioned "
        "`Window` (ordered or not) over an unadjudicated frame "
        "(every global-window site must name the parameter-sized "
        "table it runs over with its exact site count pinned, or be "
        "rewritten with the two-level prefix scan in "
        "`operators/rank.py`).",
        "",
        f"**Violations: {len(flagged)}**"
        + ("" if not flagged else " — MUST FIX"),
        "",
    ]
    for name, why in flagged:
        lines.append(f"- VIOLATION `{name}`: {why}")
    if errors:
        lines.append("")
        lines.append(f"Plan-construction errors: {len(errors)}")
        for name, e in errors:
            lines.append(f"- ERROR `{name}`: {e}")
    lines += [
        "",
        f"## Global-window adjudications ({len(global_windows)} queries)",
        "",
        "Every unpartitioned Window (ordered or not) in the registry, with the "
        "parameter-sized frame it actually sorts (none touches the "
        "corpus):",
        "",
        "| query | sites | frame adjudication |",
        "|---|---|---|",
    ]
    for name, n, reason in global_windows:
        lines.append(f"| `{name}` | {n} | {reason} |")
    if stale:
        lines.append("")
        lines.append(
            "Stale whitelist entries (no unpartitioned window found — "
            "remove): " + ", ".join(f"`{n}`" for n in stale)
        )
    lines += [
        "",
        f"## Sanctioned Arrow boundaries ({len(arrow_users)} queries use "
        "vectorized Python; everything else is pure JVM)",
        "",
    ]
    for name, kinds in arrow_users:
        lines.append(f"- `{name}`: {', '.join(kinds)}")
    lines.append("")
    with open("/root/repo/PLAN_LINT.md", "w") as f:
        f.write("\n".join(lines))
    print(
        f"checked={len(REGISTRY)} violations={len(flagged)} "
        f"errors={len(errors)} global_windows={len(global_windows)} "
        f"stale_whitelist={len(stale)} arrow_users={len(arrow_users)}"
    )
    spark.stop()
    return 1 if flagged or errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
