#!/usr/bin/env python
"""Optimization-round measurement harness (guide §1).

Per query: one discarded warm-up, then N timed passes where the action
is the NOOP SINK (`df.write.format("noop")` — computes every column of
every row, unlike the bench's historical `.count()` which lets the
optimizer prune; guide §1.4), plus one count-timed pass for
comparability with the official bench protocol. Captures
`.explain("formatted")` to plans/r16/<name>_<tag>.txt and prints a
compact JSON line per query plus a trailing summary.

Usage:
  python scripts/r16_measure.py --tag before [name ...]
  (default names = bench.py's BENCH_QUERIES)
"""
from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

from distributed_query_engine_spark.registry import all_queries  # noqa: E402
from distributed_query_engine_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--tag", default="before", help="plan-file suffix")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--no-plans", action="store_true",
                    help="skip writing plan files")
    ap.add_argument("names", nargs="*")
    ns = ap.parse_args()

    import bench  # noqa: E402  (for BENCH_QUERIES / _EXEC_MS_LINES)

    names = ns.names or list(bench.BENCH_QUERIES)
    queries = all_queries()
    plan_dir = ROOT / "plans" / "r16"
    plan_dir.mkdir(parents=True, exist_ok=True)

    spark = get_spark(app_name="r16-measure")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict] = {}
    for name in names:
        fn = queries[name]
        sc = spark.sparkContext
        sc.setJobDescription(f"r16-measure warmup: {name}")
        t0 = time.perf_counter()
        df = fn(spark, ns.sf_dir)
        df.write.format("noop").mode("overwrite").save()
        warm = time.perf_counter() - t0
        if not ns.no_plans:
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            (plan_dir / f"{name}_{ns.tag}.txt").write_text(plan)
        noop_secs = []
        for i in range(ns.passes):
            sc.setJobDescription(f"r16-measure noop {i}: {name}")
            t0 = time.perf_counter()
            df = fn(spark, ns.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            sec = time.perf_counter() - t0
            if name in bench._EXEC_MS_LINES:
                from distributed_query_engine_spark.streaming import ops
                exec_ms = ops.LAST_RUN_EXEC_MS.get(bench._EXEC_MS_LINES[name])
                if exec_ms:
                    sec = exec_ms / 1000.0
            noop_secs.append(round(sec, 4))
        sc.setJobDescription(f"r16-measure count: {name}")
        t0 = time.perf_counter()
        n = fn(spark, ns.sf_dir).count()
        count_sec = round(time.perf_counter() - t0, 4)
        results[name] = {
            "noop_median": round(statistics.median(noop_secs), 4),
            "noop_min": min(noop_secs),
            "noop_passes": noop_secs,
            "count_sec": count_sec,
            "rows": n,
            "warm_sec": round(warm, 4),
        }
        print(json.dumps({name: results[name]}), flush=True)
    out = ROOT / ".tmp" / f"r16_measure_{ns.tag}.json"
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(
        {"sf_dir": ns.sf_dir, "results": results}, indent=1))
    total = round(sum(r["noop_median"] for r in results.values()), 4)
    print(json.dumps({"noop_total": total, "file": str(out)}))
    spark.stop()


if __name__ == "__main__":
    main()
