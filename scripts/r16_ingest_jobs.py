#!/usr/bin/env python
"""Per-Spark-job decomposition of the stream_ingest_dedup micro-batch
loop (guide §1.1/§1.5): runs the query once with the UI enabled and
dumps every job (id, description, duration) from the REST API, so the
fixed per-batch driver-job overhead is measured, not guessed.

Usage: python scripts/r16_ingest_jobs.py
"""
from __future__ import annotations

import json
import sys
import time
import urllib.request
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
import os  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from distributed_query_engine_spark.registry import all_queries  # noqa: E402
from distributed_query_engine_spark.session import get_spark  # noqa: E402
from distributed_query_engine_spark.streaming import ops  # noqa: E402

spark = get_spark("r16-ingest-jobs", extra_conf={"spark.ui.enabled": "true"})
spark.sparkContext.setLogLevel("ERROR")
ui = spark.sparkContext.uiWebUrl

fn = all_queries()["stream_ingest_dedup"]

# warm-up (staging, store build fingerprints etc.)
spark.sparkContext.setJobDescription("ingest warmup")
fn(spark, SF).write.format("noop").mode("overwrite").save()
print(f"warmup done, exec_ms={ops.LAST_RUN_EXEC_MS.get('ingest_dedup')}")

with urllib.request.urlopen(f"{ui}/api/v1/applications") as r:
    app_id = json.load(r)[0]["id"]


def jobs_after(job_floor: int) -> list[dict]:
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/jobs?status=succeeded"
    ) as r:
        js = json.load(r)
    return sorted(
        (j for j in js if j["jobId"] > job_floor), key=lambda j: j["jobId"]
    )


floor = max((j["jobId"] for j in jobs_after(-1)), default=-1)

spark.sparkContext.setJobDescription(None)
t0 = time.perf_counter()
df = fn(spark, SF)
df.write.format("noop").mode("overwrite").save()
wall = time.perf_counter() - t0
exec_ms = ops.LAST_RUN_EXEC_MS.get("ingest_dedup")
print(f"measured pass: wall={wall:.2f}s exec_sum={exec_ms/1000:.2f}s")

from datetime import datetime  # noqa: E402


def dur(j):
    fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
    try:
        a = datetime.strptime(j["submissionTime"], fmt)
        b = datetime.strptime(j["completionTime"], fmt)
        return (b - a).total_seconds()
    except Exception:
        return -1.0


def stage_names(ids):
    out = []
    for sid in ids:
        try:
            with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app_id}/stages/{sid}"
            ) as r:
                ss = json.load(r)
            s = ss[0]
            out.append(
                f"s{sid}[{s['numTasks']}t {s['name'].splitlines()[0][:60]}]"
            )
        except Exception:
            out.append(f"s{sid}[?]")
    return " ".join(out)


total = 0.0
for j in jobs_after(floor):
    d = dur(j)
    total += max(d, 0)
    desc = " | ".join(
        ln.strip()
        for ln in (j.get("description") or j["name"]).splitlines()
        if ln.strip()
    )
    batch = desc.split("batch = ")[-1] if "batch = " in desc else "-"
    detail = stage_names(j["stageIds"]) if d > 0.25 else ""
    print(f"job {j['jobId']:4d} b{batch:>2s} {d:7.3f}s  stages={len(j['stageIds']):2d}  {detail}")
print(f"sum of job durations: {total:.2f}s  (wall {wall:.2f}s)")
