"""Round-over-round bench comparison.

Usage: python tools/bench_delta.py OLD.json NEW.json
Prints a per-query delta table (markdown) and flags regressions >1.3x.
Note: this box shows 30%+ run-to-run load variance — treat flags as
prompts to re-measure both sides, not verdicts.
"""

import json
import sys


def _load(path: str) -> dict:
    d = json.load(open(path))
    # driver-recorded BENCH_r{N}.json wraps the bench line in "parsed"
    return d.get("parsed", d)


def main(old_path: str, new_path: str) -> int:
    old = _load(old_path)
    new = _load(new_path)
    oq, nq = old.get("queries", {}), new.get("queries", {})
    flagged = []
    print(f"| query | {old_path} | {new_path} | ratio |")
    print("|---|---|---|---|")
    for name in sorted(set(oq) | set(nq)):
        a, b = oq.get(name), nq.get(name)
        if a is None or b is None or a == 0:
            print(f"| {name} | {a} | {b} | — |")
            continue
        r = b / a
        mark = " **⚠**" if r > 1.3 else ""
        if r > 1.3:
            flagged.append(name)
        print(f"| {name} | {a:.3f} | {b:.3f} | {r:.2f}{mark} |")
    print(
        f"| **total** | {old.get('value')} | {new.get('value')} | "
        f"{(new.get('value') / old.get('value')):.2f} |"
    )
    if flagged:
        print(f"\nregressions >1.3x: {flagged}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
