#!/usr/bin/env python
"""Summarize a Spark event-log dir: per-stage wall / task / CPU / GC /
shuffle / spill metrics, sorted by wall time. Usage:

    python tools/stage_report.py <eventLog.dir> [topN]

Works with rolling event logs (events_* files, optionally zstd)."""

from __future__ import annotations

import collections
import glob
import json
import os
import statistics
import subprocess
import sys


def load_lines(logdir: str) -> list[str]:
    dds = sorted(glob.glob(os.path.join(logdir, "eventlog*")))
    target = dds[-1] if dds else logdir
    lines: list[str] = []
    for p in sorted(glob.glob(os.path.join(target, "events_*"))):
        with open(p, "rb") as f:
            head = f.read(4)
        if head[:4] == b"\x28\xb5\x2f\xfd":
            out = subprocess.run(["zstd", "-dc", p], capture_output=True)
            lines += out.stdout.decode(errors="replace").splitlines()
        else:
            lines += open(p, errors="replace").read().splitlines()
    if not lines and os.path.isfile(target):
        lines = open(target, errors="replace").read().splitlines()
    return lines


def report(logdir: str, top: int = 25) -> None:
    stages = {}
    tasks = collections.defaultdict(list)
    for line in load_lines(logdir):
        try:
            ev = json.loads(line)
        except Exception:
            continue
        if not isinstance(ev, dict):
            continue
        e = ev.get("Event")
        if e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            stages[si["Stage ID"]] = (
                si["Stage Name"].split("\n")[0][:46],
                si["Number of Tasks"],
                si.get("Submission Time", 0),
                si.get("Completion Time", 0),
            )
        elif e == "SparkListenerTaskEnd":
            m = ev.get("Task Metrics") or {}
            sh_r = (m.get("Shuffle Read Metrics") or {})
            sh_w = (m.get("Shuffle Write Metrics") or {})
            ti = ev["Task Info"]
            tasks[ev["Stage ID"]].append(
                dict(
                    wall=(ti["Finish Time"] - ti["Launch Time"]) / 1000,
                    cpu=m.get("Executor CPU Time", 0) / 1e9,
                    run=m.get("Executor Run Time", 0) / 1000,
                    gc=m.get("JVM GC Time", 0) / 1000,
                    in_bytes=(m.get("Input Metrics") or {}).get("Bytes Read", 0),
                    out_bytes=(m.get("Output Metrics") or {}).get("Bytes Written", 0),
                    shr=sh_r.get("Local Bytes Read", 0) + sh_r.get("Remote Bytes Read", 0),
                    shw=sh_w.get("Shuffle Bytes Written", 0),
                    spill=m.get("Disk Bytes Spilled", 0),
                )
            )
    rows = []
    for sid, (nm, nt, sub, comp) in stages.items():
        ts = tasks.get(sid, [])
        if not ts:
            continue
        walls = [t["wall"] for t in ts]
        rows.append(
            dict(
                sid=sid,
                name=nm,
                ntasks=nt,
                wall=(comp - sub) / 1000,
                sum_run=sum(t["run"] for t in ts),
                sum_cpu=sum(t["cpu"] for t in ts),
                gc=sum(t["gc"] for t in ts),
                med=statistics.median(walls),
                mx=max(walls),
                in_gb=sum(t["in_bytes"] for t in ts) / 1e9,
                shr_gb=sum(t["shr"] for t in ts) / 1e9,
                shw_gb=sum(t["shw"] for t in ts) / 1e9,
                spill_gb=sum(t["spill"] for t in ts) / 1e9,
            )
        )
    rows.sort(key=lambda r: -r["wall"])
    print(
        f"{'sid':>4} {'wall':>7} {'tasks':>5} {'sumRun':>8} {'sumCPU':>8} {'gc':>6} "
        f"{'medT':>6} {'maxT':>6} {'inGB':>6} {'shrGB':>6} {'shwGB':>6} {'spill':>6}  name"
    )
    for r in rows[:top]:
        print(
            f"{r['sid']:>4} {r['wall']:>7.1f} {r['ntasks']:>5} {r['sum_run']:>8.1f} "
            f"{r['sum_cpu']:>8.1f} {r['gc']:>6.1f} {r['med']:>6.1f} {r['mx']:>6.1f} "
            f"{r['in_gb']:>6.2f} {r['shr_gb']:>6.2f} {r['shw_gb']:>6.2f} "
            f"{r['spill_gb']:>6.2f}  {r['name']}"
        )


if __name__ == "__main__":
    report(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 25)
