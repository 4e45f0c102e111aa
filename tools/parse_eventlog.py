"""Parse a Spark event log into per-job / per-stage wall + task metrics.

Usage: python tools/parse_eventlog.py <eventlog-file-or-dir> [minsec]
Prints, grouped by job description: job wall, and each stage's wall,
task-time sum, GC, shuffle read/write bytes, input bytes, records.
"""

from __future__ import annotations

import json
import os
import sys


def main() -> int:
    path = sys.argv[1]
    minsec = float(sys.argv[2]) if len(sys.argv) > 2 else 0.3
    if os.path.isdir(path):
        files = sorted(
            (os.path.join(path, f) for f in os.listdir(path) if not f.startswith(".")),
            key=os.path.getmtime,
        )
        path = files[-1]
    jobs = {}        # jobId -> {desc, t0, t1, stages:[...]}
    stages = {}      # stageId -> accum
    stage_job = {}
    for line in open(path):
        try:
            e = json.loads(line)
        except json.JSONDecodeError:
            continue
        ev = e.get("Event")
        if ev == "SparkListenerJobStart":
            jid = e["Job ID"]
            desc = e.get("Properties", {}).get("spark.job.description", "")
            jobs[jid] = {"desc": desc, "t0": e["Submission Time"], "t1": None, "stages": []}
            for sid in e.get("Stage IDs", []):
                stage_job[sid] = jid
        elif ev == "SparkListenerJobEnd":
            jid = e["Job ID"]
            if jid in jobs:
                jobs[jid]["t1"] = e["Completion Time"]
        elif ev == "SparkListenerStageSubmitted":
            si = e["Stage Info"]
            stages[si["Stage ID"]] = {
                "name": si["Stage Name"], "tasks": si["Number of Tasks"],
                "t0": None, "t1": None, "run": 0, "gc": 0, "cpu": 0,
                "sr": 0, "sw": 0, "inp": 0, "recs": 0, "spill": 0,
            }
        elif ev == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            s = stages.get(si["Stage ID"])
            if s:
                s["t0"] = si.get("Submission Time")
                s["t1"] = si.get("Completion Time")
        elif ev == "SparkListenerTaskEnd":
            sid = e["Stage ID"]
            s = stages.get(sid)
            tm = e.get("Task Metrics") or {}
            if s and tm:
                s["run"] += tm.get("Executor Run Time", 0)
                s["cpu"] += tm.get("Executor CPU Time", 0) / 1e6
                s["gc"] += tm.get("JVM GC Time", 0)
                s["sr"] += (tm.get("Shuffle Read Metrics") or {}).get("Remote Bytes Read", 0) + (
                    tm.get("Shuffle Read Metrics") or {}).get("Local Bytes Read", 0)
                s["sw"] += (tm.get("Shuffle Write Metrics") or {}).get("Shuffle Bytes Written", 0)
                s["inp"] += (tm.get("Input Metrics") or {}).get("Bytes Read", 0)
                s["recs"] += (tm.get("Input Metrics") or {}).get("Records Read", 0)
                s["spill"] += tm.get("Disk Bytes Spilled", 0)

    for jid in sorted(jobs):
        j = jobs[jid]
        if j["t1"] is None:
            continue
        wall = (j["t1"] - j["t0"]) / 1000
        if wall < minsec:
            continue
        print(f"job {jid} [{j['desc']}] wall={wall:.2f}s")
        for sid, s in sorted(stages.items()):
            if stage_job.get(sid) != jid or s["t1"] is None:
                continue
            swall = (s["t1"] - s["t0"]) / 1000
            if swall < minsec / 3:
                continue
            print(
                f"  stage {sid} wall={swall:6.2f}s tasks={s['tasks']:4d} "
                f"run={s['run']/1000:7.1f}s cpu={s['cpu']/1000:7.1f}s gc={s['gc']/1000:5.1f}s "
                f"in={s['inp']/2**20:8.1f}MB sr={s['sr']/2**20:7.1f}MB sw={s['sw']/2**20:7.1f}MB "
                f"spill={s['spill']/2**20:6.1f}MB  {s['name'][:70]}"
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
