"""Per-job wall-clock profile for registry queries (guide §1).

Runs each named query once warm (sf0.001 warmup pass first), acting via
count() exactly like bench.py, with the Spark event log enabled; then
parses the event log to attribute wall time to jobs (description = the
call site's setJobDescription, else the action) and stages.

Usage: SPARK_GRAFT_SF_DIR=... python tools/profile_phases.py <name> [...]

Prints, per query: total wall, number of jobs, and the top jobs by
duration with their descriptions + stage shuffle bytes -- the "where is
the time going" table the optimization guide asks for before touching
anything.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from automated_review_analysis_pipeline_spark.registry import QUERIES  # noqa: E402
from automated_review_analysis_pipeline_spark.session import get_spark  # noqa: E402

WARMUP_SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    evdir = tempfile.mkdtemp(prefix="arap_eventlog_")
    spark = get_spark(app_name="arap-profile-phases", extra_confs={
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": evdir,
        "spark.eventLog.compress": "false",
        "spark.eventLog.rolling.enabled": "false",
    })
    spark.sparkContext.setLogLevel("ERROR")
    from automated_review_analysis_pipeline_spark.plan_cache import (
        release_plan_caches,
    )

    for name in names:  # warmup: codegen/Arrow hot, fixtures built
        try:
            QUERIES[name](spark, WARMUP_SF_DIR).count()
        except Exception as e:  # noqa: BLE001
            print(f"warmup {name} failed: {e}", file=sys.stderr)
        release_plan_caches()

    marks: list[tuple[str, float, float]] = []
    for name in names:
        t0 = time.time()
        QUERIES[name](spark, sf_dir).count()
        marks.append((name, t0 * 1000, time.time() * 1000))
        release_plan_caches()

    app_id = spark.sparkContext.applicationId
    spark.stop()

    ev_path = os.path.join(evdir, app_id)
    if not os.path.exists(ev_path):  # rolling-v2 layout fallback
        import glob
        cands = glob.glob(os.path.join(evdir, f"*{app_id}*", "events_*")) \
            or glob.glob(os.path.join(evdir, f"*{app_id}*"))
        ev_path = cands[0]
    if ev_path.endswith(".zstd"):
        import subprocess
        raw = subprocess.run(["zstd", "-dc", ev_path],
                             capture_output=True, check=True).stdout
        lines_src = raw.decode().splitlines()
    else:
        lines_src = open(ev_path)
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    if True:
        for line in lines_src:
            e = json.loads(line)
            et = e.get("Event")
            if et == "SparkListenerJobStart":
                jobs[e["Job ID"]] = {
                    "t0": e["Submission Time"],
                    "desc": (e.get("Properties") or {}).get(
                        "spark.job.description", ""),
                    "stages": [s["Stage ID"]
                               for s in e.get("Stage Infos", [])],
                }
            elif et == "SparkListenerJobEnd":
                if e["Job ID"] in jobs:
                    jobs[e["Job ID"]]["t1"] = e["Completion Time"]
            elif et == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                stages[si["Stage ID"]] = {
                    "name": si["Stage Name"],
                    "tasks": si["Number of Tasks"],
                }

    for name, m0, m1 in marks:
        q_jobs = [(jid, j) for jid, j in jobs.items()
                  if "t1" in j and j["t0"] >= m0 and j["t1"] <= m1]
        q_jobs.sort(key=lambda kv: -(kv[1]["t1"] - kv[1]["t0"]))
        total_job_ms = sum(j["t1"] - j["t0"] for _, j in q_jobs)
        print(f"\n## {name}: wall {(m1 - m0) / 1000:.2f}s, "
              f"{len(q_jobs)} jobs ({total_job_ms / 1000:.2f}s in jobs, "
              f"{(m1 - m0 - total_job_ms) / 1000:.2f}s gaps/driver)")
        for jid, j in q_jobs[:14]:
            dur = (j["t1"] - j["t0"]) / 1000
            sdesc = []
            for sid in j["stages"]:
                if sid in stages:
                    s = stages[sid]
                    sdesc.append(f"{s['name'].splitlines()[0][:48]}"
                                 f"[{s['tasks']}t]")
            print(f"  {dur:6.2f}s job {jid}  {j['desc'][:60]}  "
                  f"{' | '.join(sdesc[:4])}")


if __name__ == "__main__":
    main()
