"""Registry-wide physical-plan linter.

Builds the physical plan of EVERY registry query at sf0.001 and
asserts two repo-wide invariants mechanically, instead of per-query
claims:

- no ``BatchEvalPython`` anywhere: row-at-a-time Python UDFs are
  banned from every data path (Arrow forms — ArrowEvalPython /
  MapInPandas / FlatMapGroupsInPandas — are the sanctioned Python
  boundary and are counted, not flagged);
- no ``CartesianProduct``: every cross join in the repo must be a
  broadcast of a parameter-sized frame (which plans as
  BroadcastNestedLoopJoin), never a shuffled cartesian.

Writes PLAN_LINT.md with the verdict and per-query Python-boundary
inventory. Iterative queries execute their driver-side fixpoint loops
during plan construction — that is expected; the linter inspects the
FINAL returned plan of each.

Usage: python tools/plan_lint.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


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

    lines = [
        "# PLAN_LINT — registry-wide physical-plan invariants",
        "",
        f"Checked {len(REGISTRY)} queries at {SF} "
        f"in {time.time() - t0:.0f}s.",
        "",
        "Invariants: no `BatchEvalPython` (row-at-a-time Python UDF) "
        "in any data path; no `CartesianProduct` (every cross join "
        "must broadcast a parameter-sized side).",
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
        f"Sanctioned Arrow boundaries ({len(arrow_users)} queries use "
        "vectorized Python; everything else is pure JVM):",
        "",
    ]
    for name, kinds in arrow_users:
        lines.append(f"- `{name}`: {', '.join(kinds)}")
    lines.append("")
    with open("/root/repo/PLAN_LINT.md", "w") as f:
        f.write("\n".join(lines))
    print(
        f"checked={len(REGISTRY)} violations={len(flagged)} "
        f"errors={len(errors)} arrow_users={len(arrow_users)}"
    )
    spark.stop()
    return 1 if flagged or errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
