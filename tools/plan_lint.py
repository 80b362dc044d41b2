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
- no UNADJUDICATED unpartitioned window (r4 verdict #2): an ordered
  ``Window`` node with an empty partition spec moves every input row
  to ONE task — the scale-killer class that produced r4's only weak
  finding. Every query whose plan contains one must carry a
  whitelist adjudication naming the parameter-sized frame the window
  actually runs over (distinct-value table, hour/day grid, offsets /
  carry-in table, top-k head, symbol-universe-bounded frame, ...).
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

#: query -> why its unpartitioned ordered window(s) are parameter-sized,
#: i.e. the window input is NEVER the corpus. Adjudications are
#: size-CLASS claims a reviewer can check against the query source.
GLOBAL_WINDOW_WHITELIST: dict[str, str] = {
    "concurrent_intervals_profile": (
        "day-grid carry-in offsets: one row per day — the "
        "parameter-sized level of its own two-level sweep"
    ),
    "cumulative_unique_users": (
        "#days frame: running sum over per-day first-seen counts "
        "(docstring: 'tiny by construction', never the event log)"
    ),
    "curriculum_quality_order": (
        "prefix-scan offsets tables only: per-richness-value counts "
        "(domain bounded by tokens-per-doc) and the 10x256 "
        "(decile, md5-prefix) cell table; corpus rows are windowed "
        "exclusively per-cell (r4 verdict #1 fix)"
    ),
    "kaplan_meier_conversion": (
        "life table: one row per discrete hour up to the censor "
        "horizon (docstring: horizon+1 rows max)"
    ),
    "kruskal_wallis_event_types": (
        "pooled distinct-value counts table — the rank construction "
        "never windows raw rows"
    ),
    "lang_temperature_mix": (
        "per-language mixture table (language-universe-bounded)"
    ),
    "largest_remainder_allocation": (
        "per-nation allocation table (nation-universe-bounded, 25 "
        "rows at any SF)"
    ),
    "pareto_customer_revenue": (
        "prefix-scan offsets table only: one row per revenue band "
        "(64 broadcast-percentile buckets); customer rows are "
        "windowed exclusively per-band (operators/rank.py step 3)"
    ),
    "gini_customer_revenue": (
        "prefix-scan offsets table only: one row per revenue band "
        "(64 broadcast-percentile buckets); customer rows are "
        "windowed exclusively per-band (operators/rank.py step 3)"
    ),
    "portfolio_equal_weight_summary": (
        "portfolio-level hourly grid: one row per hour after the "
        "per-hour aggregate"
    ),
    "rolling_pair_correlation": (
        "hourly grid: one row per hour after the per-hour aggregate"
    ),
    "skyline_parts": (
        "cross-bucket prefix-min heads: one row per price bucket — "
        "the parameter-sized level of its own two-level decomposition"
    ),
    "rank_tests_panel": (
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
        if "WindowGroupLimit" in line[:idx + 7]:
            continue  # rank-pushdown helper; the Window node follows
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
            for has_part, has_order in _window_nodes(plan)
            if has_order and not has_part
        )
        if n_unpart:
            reason = GLOBAL_WINDOW_WHITELIST.get(name)
            if reason is None:
                flagged.append(
                    (
                        name,
                        f"{n_unpart} unpartitioned ordered Window node(s) "
                        "with no whitelist adjudication",
                    )
                )
            else:
                global_windows.append((name, n_unpart, reason))
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
        "ordered `Window` over an unadjudicated frame (every "
        "global-window site must name the parameter-sized table it "
        "runs over, or be rewritten with the two-level prefix scan "
        "in `operators/rank.py`).",
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
        "Every unpartitioned ordered Window in the registry, with the "
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
