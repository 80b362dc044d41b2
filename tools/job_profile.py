"""Per-JOB time breakdown for one registry query (r11 measurement tool).

Usage:
    python tools/job_profile.py NAME [NAME...]

Runs each named query once under bench-identical conf (local[$SPARK_GRAFT_CPUS],
shuffle.partitions=$SPARK_GRAFT_CPUS, noop sink) with the Spark event log
enabled, then parses the event log and prints every Spark job's wall time and
description, plus gaps (driver-side time between jobs). This is the §1
"which stage is the time going to" view for a multi-job operator (folds,
Lloyd loops, CC) where one query runs dozens of jobs.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main(argv: list[str]) -> int:
    names = [a for a in argv[1:] if not a.startswith("--")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    evdir = tempfile.mkdtemp(prefix="stp-evlog-")

    from stock_trend_predictor_spark import get_spark
    from stock_trend_predictor_spark.plans import REGISTRY

    spark = get_spark(
        app_name="stp-job-profile",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "16g",
            "spark.eventLog.enabled": "true",
            "spark.eventLog.compress": "false",
            "spark.eventLog.dir": evdir,
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    warm = REGISTRY["flagship_movement_rate"]
    warm.fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
        "overwrite"
    ).save()

    marks: dict[str, tuple[float, float]] = {}
    for name in names:
        q = REGISTRY[name]
        spark.sparkContext.setJobDescription(f"Q:{name}")
        t0 = time.time()
        q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        t1 = time.time()
        spark.sparkContext.setJobDescription(None)
        marks[name] = (t0, t1)
        print(f"== {name}: {t1 - t0:.2f}s total ==", flush=True)

    app_id = spark.sparkContext.applicationId
    spark.stop()

    # parse the event log (Spark 4 rolling layout: a dir of events_* files)
    root = Path(evdir) / app_id
    if not root.exists():
        root = Path(evdir) / f"eventlog_v2_{app_id}"
    files = [root] if root.is_file() else sorted(root.glob("events_*"))
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}

    def _lines():
        for f in files:
            with open(f) as fh:
                yield from fh

    for line in _lines():
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        if ev.get("Event") == "SparkListenerJobStart":
            props = ev.get("Properties", {}) or {}
            infos = ev.get("Stage Infos") or []
            site = infos[-1]["Stage Name"] if infos else ""
            jobs[ev["Job ID"]] = {
                "start": ev["Submission Time"] / 1000.0,
                "desc": props.get("spark.job.description", ""),
                "callsite": site,
                "nstages": len(infos),
                "stageids": [i["Stage ID"] for i in infos],
            }
        elif ev.get("Event") == "SparkListenerJobEnd":
            j = jobs.get(ev["Job ID"])
            if j is not None:
                j["end"] = ev["Completion Time"] / 1000.0
        elif ev.get("Event") == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            if "Completion Time" in si and "Submission Time" in si:
                stages[si["Stage ID"]] = {
                    "name": si["Stage Name"],
                    "dur": (si["Completion Time"] - si["Submission Time"])
                    / 1000.0,
                    "ntasks": si.get("Number of Tasks", 0),
                }

    for name, (t0, t1) in marks.items():
        mine = sorted(
            (
                (jid, j)
                for jid, j in jobs.items()
                if "end" in j and t0 - 0.5 <= j["start"] <= t1 + 0.5
            ),
            key=lambda kv: kv[1]["start"],
        )
        print(f"\n==== {name}: {t1 - t0:.2f}s wall, {len(mine)} jobs ====")
        prev_end = t0
        job_sum = 0.0
        gap_sum = 0.0
        for jid, j in mine:
            gap = j["start"] - prev_end
            dur = j["end"] - j["start"]
            job_sum += dur
            gap_sum += max(0.0, gap)
            d = j["desc"]
            d = d[2 + d.find("| "):] if "| " in d else d
            tag = (d + " @ " + j["callsite"].split(" at ")[-1]).strip()
            print(
                f"  [{jid:4d}] +{j['start'] - t0:7.2f}s "
                f"gap={max(0.0, gap):5.2f}s dur={dur:6.2f}s "
                f"st={j.get('nstages', 0):2d}  {tag[:100]}"
            )
            if dur >= 1.0:
                for sid in j.get("stageids", []):
                    s = stages.get(sid)
                    if s:
                        print(
                            f"        stage {sid}: {s['dur']:.2f}s "
                            f"tasks={s['ntasks']}  {s['name'][:90]}"
                        )
            prev_end = max(prev_end, j["end"])
        print(
            f"  -- jobs={job_sum:.2f}s gaps(driver)={gap_sum:.2f}s "
            f"tail={t1 - prev_end:.2f}s"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
