"""Per-query job/stage decomposition for optimization work (guide §1/§7).

Runs one or more registry queries to the noop sink in a warmed session with
the UI enabled, then reads the REST API and prints, per query:

- wall seconds (median of --n runs, first run listed separately),
- per-run job count and the per-job wall/stage breakdown of the LAST run:
  job duration, stage task-time sum, shuffle read/write bytes, input rows,
- the "scheduling gap": wall minus the sum of job durations (driver-side
  think time between jobs — the cost knob for iterative BSP loops), and
  within jobs, job duration minus stage task time / cores (task-parallel
  deficit).

This answers "where does the time actually go" for queries whose wall is
many small sequential stages — the Spark UI's per-stage view flattened
into one terminal table.

Usage: python tools/query_profile.py [--sf-dir DIR] [--n 3] Q [Q ...]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_expenses_spark.plans import REGISTRY  # noqa: E402
from etl_expenses_spark.session import get_spark  # noqa: E402
from etl_expenses_spark.sources.readers import TESTDATA_TABLES, load_table  # noqa: E402

UI = "http://localhost:4040"


def _get(path: str):
    with urllib.request.urlopen(f"{UI}{path}", timeout=30) as r:
        return json.load(r)


def _app_id() -> str:
    apps = _get("/api/v1/applications")
    ours = [a for a in apps if a.get("name") == "query-profile"]
    return (ours or apps)[0]["id"]


def profile(name: str, spark, sf_dir: str, n_runs: int) -> None:
    q = REGISTRY[name]
    app = _app_id()

    def cpu_stat():
        f = open("/proc/stat").readline().split()
        return list(map(int, f[1:]))

    walls = []
    steals = []
    for i in range(n_runs):
        jobs_before = {j["jobId"] for j in _get(f"/api/v1/applications/{app}/jobs")}
        c0 = cpu_stat()
        t0 = time.perf_counter()
        q.build(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        c1 = cpu_stat()
        walls.append(wall)
        steals.append((c1[7] - c0[7]) / 100.0)
    # decompose the LAST run
    jobs = [
        j
        for j in _get(f"/api/v1/applications/{app}/jobs")
        if j["jobId"] not in jobs_before
    ]
    jobs.sort(key=lambda j: j["jobId"])
    stages = {
        s["stageId"]: s
        for s in _get(f"/api/v1/applications/{app}/stages?status=complete")
    }

    def ms(ts: str) -> float:
        from datetime import datetime

        return datetime.strptime(ts[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()

    total_job = 0.0
    rows = []
    for j in jobs:
        dur = ms(j["completionTime"]) - ms(j["submissionTime"])
        total_job += dur
        tt = sr = sw = inrec = srr = 0
        nstage = 0
        for sid in j["stageIds"]:
            s = stages.get(sid)
            if not s:
                continue
            nstage += 1
            tt += s["executorRunTime"]
            sr += s["shuffleReadBytes"]
            sw += s["shuffleWriteBytes"]
            srr += s["shuffleReadRecords"]
            inrec += s["inputRecords"]
        rows.append(
            (j["jobId"], dur, nstage, j["numTasks"], tt / 1000.0, inrec, srr,
             sr, sw, (j.get("description") or j.get("name") or "")[:70])
        )
    med = statistics.median(walls)
    print(f"\n=== {name}: wall median {med:.3f}s  runs={['%.3f' % w for w in walls]}"
          f"  steal_s={['%.1f' % s for s in steals]}")
    print(f"    jobs={len(jobs)} sum(job_dur)={total_job:.3f}s  "
          f"gap(wall-jobs)={walls[-1] - total_job:.3f}s")
    print(f"    {'job':>4} {'dur_s':>7} {'stg':>4} {'tasks':>6} {'tasktime_s':>10}"
          f" {'in_rec':>10} {'sh_rd_rec':>10} {'sh_rd_MB':>9} {'sh_wr_MB':>9}")
    for r in rows:
        print(
            f"    {r[0]:>4} {r[1]:>7.3f} {r[2]:>4} {r[3]:>6} {r[4]:>10.2f}"
            f" {r[5]:>10} {r[6]:>10} {r[7] / 1e6:>9.2f} {r[8] / 1e6:>9.2f}  {r[9]}"
        )


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    n_runs = 3
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--sf-dir":
            sf_dir = args[i + 1]
            i += 2
        elif args[i] == "--n":
            n_runs = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1
    spark = get_spark(
        "query-profile",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4040"},
    )
    for t in TESTDATA_TABLES:
        load_table(spark, sf_dir, t).count()
    for name in names:
        # no setJobDescription: the default job name is the action callsite,
        # which is what maps a job back to the operator code
        profile(name, spark, sf_dir, n_runs)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
