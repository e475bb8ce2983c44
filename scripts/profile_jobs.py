"""Per-job wall-clock breakdown for a catalog entry, via the Spark
event log — the local[32] stand-in for the Spark UI's Jobs page
(guide §1.1/§7.1: decide WHERE the time goes before touching code).

Usage: python scripts/profile_jobs.py <entry> [sf_dir] [n_runs]

Runs the entry once to compile (warmup), then ``n_runs`` timed
noop-sink runs in the same session, then prints every job of the LAST
timed run: wall ms, task-time ms, peak concurrent stages, and the job
group/description when present. Job boundaries correspond 1:1 with
driver-side actions, so a long gap between jobs is driver work.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    log_dir = tempfile.mkdtemp(prefix="spark_events_")
    from etl_mark1_spark import get_spark
    from etl_mark1_spark.catalog import QUERIES

    spark = get_spark(app_name=f"profile-{name}", driver_memory="24g",
                      extra_conf={"spark.eventLog.enabled": "true",
                                  "spark.eventLog.dir": log_dir,
                                  "spark.eventLog.compress": "false",
                                  "spark.eventLog.rolling.enabled": "false"})
    spark.range(1).count()

    def run() -> float:
        t0 = time.monotonic()
        df = QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    run()  # compile pass
    marks = []
    for i in range(n_runs):
        spark.sparkContext.setJobDescription(f"timed-{i}")
        t = run()
        spark.sparkContext.setJobDescription(None)
        marks.append(t)
        print(f"timed run {i}: {t:.2f}s")

    spark.stop()
    # parse the single event-log file
    path = os.path.join(log_dir, os.listdir(log_dir)[0])
    if os.path.isdir(path):  # Spark 4 rolling event-log layout
        path = next(os.path.join(path, f) for f in sorted(os.listdir(path))
                    if f.startswith("events_"))
    jobs: dict[int, dict] = {}
    stage_info: dict[int, dict] = {}
    for line in open(path):
        ev = json.loads(line)
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            props = ev.get("Properties") or {}
            jobs[ev["Job ID"]] = {
                "start": ev["Submission Time"],
                "desc": props.get("spark.job.description", ""),
                "stages": [s["Stage ID"] for s in ev["Stage Infos"]],
            }
        elif e == "SparkListenerJobEnd":
            jobs.setdefault(ev["Job ID"], {}).update(end=ev["Completion Time"])
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            stage_info[si["Stage ID"]] = {
                "name": si["Stage Name"].split("\n")[0][:70],
                "tasks": si["Number of Tasks"],
                "ms": (si.get("Completion Time", 0)
                       - si.get("Submission Time", 0)),
            }
    last = f"timed-{n_runs - 1}"
    sel = {jid: j for jid, j in jobs.items() if j.get("desc") == last}
    if not sel:
        sel = jobs
    t0 = min(j["start"] for j in sel.values())
    print(f"\n{'job':>4} {'t+ms':>7} {'wall':>7}  stages (completed only)")
    prev_end = None
    for jid in sorted(sel):
        j = sel[jid]
        wall = j.get("end", j["start"]) - j["start"]
        gap = "" if prev_end is None else f" (gap {j['start'] - prev_end}ms)"
        prev_end = j.get("end", j["start"])
        sts = [f"s{sid}:{stage_info[sid]['ms']}ms/{stage_info[sid]['tasks']}t"
               for sid in j["stages"] if sid in stage_info]
        print(f"{jid:>4} {j['start']-t0:>7} {wall:>7}  {' '.join(sts)}{gap}")
        for sid in j["stages"]:
            if sid in stage_info and stage_info[sid]["ms"] > 150:
                print(f"      >150ms  s{sid} {stage_info[sid]['name']}")


if __name__ == "__main__":
    main()
