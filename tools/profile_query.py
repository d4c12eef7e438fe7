#!/usr/bin/env python3
"""Per-query time attribution for optimization work (guide §1/§7):
runs named bench queries through the noop sink in a UI-enabled session
and prints, for each, where the wall time went — per-stage task time
vs DRIVER GAPS (time inside the query window covered by no running
job: Catalyst analysis, AQE re-planning, collect processing, job
submission latency). The bench itself keeps the UI off; this tool is
the measurement harness the optimization rounds use to decide WHAT to
change, not part of the driver contract.

Usage: python tools/profile_query.py q1 [q2 ...] [--sf DIR] [--reps N]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

UI_PORT = 4055


def _api(path: str):
    with urllib.request.urlopen(f"http://localhost:{UI_PORT}/api/v1/{path}") as r:
        return json.load(r)


def _ms(iso: str) -> float:
    # REST timestamps: "2026-08-18T00:00:00.000GMT"
    from datetime import datetime, timezone

    return (
        datetime.strptime(iso.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z")
        .astimezone(timezone.utc)
        .timestamp()
    )


def profile(names: list[str], sf_dir: str, reps: int) -> None:
    from flink_kafka_spark.caching import release_all
    from flink_kafka_spark.queries import all_queries
    from flink_kafka_spark.session import get_spark

    spark = get_spark(
        app_name="profile",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": str(UI_PORT)},
    )
    registry = all_queries()
    app_id = spark.sparkContext.applicationId

    # one warm pass (codegen/parquet-reader init), not measured
    for name in names:
        registry[name].fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
        release_all()
        spark.catalog.clearCache()

    for name in names:
        walls = []
        for rep in range(reps):
            spark.sparkContext.setJobDescription(f"profile:{name}:{rep}")
            t0 = time.time()
            registry[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            wall = time.time() - t0
            t1 = time.time()
            release_all()
            spark.catalog.clearCache()
            walls.append((t0, t1, wall))
        spark.sparkContext.setJobDescription(None)

        # attribute the LAST rep (steady state) via the REST API
        t0, t1, wall = walls[-1]
        jobs = [
            j
            for j in _api(f"applications/{app_id}/jobs")
            if j.get("description", "").startswith(f"profile:{name}:{reps - 1}")
        ]
        jobs.sort(key=lambda j: _ms(j["submissionTime"]))
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        stages = {
            s["stageId"]: s
            for s in _api(f"applications/{app_id}/stages?status=complete")
            if s["stageId"] in stage_ids
        }
        # driver gaps: query window minus union of job [submit, complete]
        covered = 0.0
        prev_end = t0
        for j in jobs:
            js, je = _ms(j["submissionTime"]), _ms(j["completionTime"])
            covered += max(0.0, min(je, t1) - max(js, prev_end))
            prev_end = max(prev_end, je)
        gaps = wall - covered
        n_tasks = sum(s["numTasks"] for s in stages.values())
        run_ms = sum(s["executorRunTime"] for s in stages.values())
        print(
            f"\n=== {name}: wall {wall:.3f}s (all reps: "
            f"{[round(w, 3) for *_, w in walls]}), {len(jobs)} jobs, "
            f"{len(stages)} stages, {n_tasks} tasks, "
            f"executorRunTime {run_ms / 1000:.2f}s, driver gaps {gaps:.2f}s"
        )
        ranked = sorted(
            stages.values(),
            key=lambda s: _ms(s["completionTime"]) - _ms(s["firstTaskLaunchedTime"])
            if s.get("firstTaskLaunchedTime")
            else 0,
            reverse=True,
        )
        for s in ranked[:12]:
            dur = (
                _ms(s["completionTime"]) - _ms(s["firstTaskLaunchedTime"])
                if s.get("firstTaskLaunchedTime")
                else 0.0
            )
            nm = s["name"].split("\n")[0][:60]
            print(
                f"  stage {s['stageId']:>5} {dur:6.3f}s tasks={s['numTasks']:<3} "
                f"run={s['executorRunTime'] / 1000:6.2f}s "
                f"shR={s['shuffleReadBytes'] >> 10}K shW={s['shuffleWriteBytes'] >> 10}K "
                f" {nm}"
            )
        if "--sql" in sys.argv:
            _sql_nodes(app_id, t0, t1)


def _sql_nodes(app_id: str, t0: float, t1: float) -> None:
    """Operator-level attribution: SQL executions submitted inside the
    query window, their plan nodes ranked by reported operator time."""
    import re

    execs = [
        e
        for e in _api(f"applications/{app_id}/sql?length=200&planDescription=false")
        if t0 <= _ms(e["submissionTime"]) / 1 <= t1 or (
            _ms(e["submissionTime"]) >= t0 and e.get("status") != "RUNNING"
            and _ms(e["submissionTime"]) <= t1
        )
    ]
    def total_sec(metrics, keys=("time total", "total time", "duration")):
        out = 0.0
        for m in metrics:
            if any(k in m["name"] for k in keys):
                v = m["value"].split("\n")[0].strip()
                mm = re.match(r"([\d.]+)\s*(ms|s|m|h)", v)
                if mm:
                    mul = {"ms": 0.001, "s": 1.0, "m": 60.0, "h": 3600.0}[mm.group(2)]
                    out += float(mm.group(1)) * mul
        return out

    nodes = []
    for e in execs:
        for n in e.get("nodes", []):
            sec = total_sec(n.get("metrics", []))
            rows = next(
                (
                    m["value"]
                    for m in n.get("metrics", [])
                    if m["name"] == "number of output rows"
                ),
                "",
            )
            if sec > 0.005:
                nodes.append((sec, e["id"], n["nodeName"], rows.split("\n")[0]))
    nodes.sort(reverse=True)
    print("  -- SQL plan nodes by operator time --")
    for sec, eid, nm, rows in nodes[:15]:
        print(f"  {sec:7.2f}s  exec={eid:<4} rows={rows:<12} {nm[:70]}")


if __name__ == "__main__":
    sf_dir = "/root/testdata/sf0.1"
    reps = 3
    names: list[str] = []
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        if argv[i] == "--sf":
            sf_dir, i = argv[i + 1], i + 2
        elif argv[i] == "--reps":
            reps, i = int(argv[i + 1]), i + 2
        elif argv[i] == "--sql":
            i += 1
        else:
            names.append(argv[i])
            i += 1
    profile(names, sf_dir, reps)
