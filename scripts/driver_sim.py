#!/usr/bin/env python
"""Local mirror of the driver's correctness gate at sf0.01: run every
(or a named subset of) `queries()` entry on a vanilla session and
compare repr-exactly against its `oracle_sql()` on DuckDB — stricter
than the driver's type-sensitive value hash, so a green sweep here
implies a green driver row.

Usage:
  python scripts/driver_sim.py                 # all queries
  python scripts/driver_sim.py --unverified    # only names without a
                                               # counting green driver row
  python scripts/driver_sim.py name1 name2 ... # explicit subset
  python scripts/driver_sim.py --unverified name1 ...  # union of both
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import os

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

import duckdb

from distributed_query_engine_spark.session import get_spark
from distributed_query_engine_spark import registry

SF = os.environ.get("DQE_SIM_SF", "/root/testdata/sf0.01")

spark = get_spark("driver-sim")
spark.sparkContext.setLogLevel("ERROR")
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

qs, oracles = registry.all_queries(), registry.all_oracles()
# r9 ADVICE: parse flags separately so --unverified composes with an
# explicit name subset (it used to be treated as a query name unless it
# was the SOLE argument, reporting ERR).
import argparse

ap = argparse.ArgumentParser(description=__doc__)
ap.add_argument("--unverified", action="store_true",
                help="include every name without a counting green driver row")
ap.add_argument("names", nargs="*", help="explicit query names to run")
ns = ap.parse_args()
names = list(ns.names)
if ns.unverified:
    rows = registry._latest_driver_rows()
    names += [n for n in qs
              if n not in names and not registry._verified_green(n, rows)]
if not names and not ns.unverified:
    names = list(qs)

fails, n_ok = [], 0
for name in names:
    try:
        fn = qs[name]  # inside try: a typo'd name prints ERR, not a crash
        df = fn(spark, SF)
        srows = [tuple(r) for r in df.collect()]
        if name not in oracles:
            print(f"ROWS {name} {len(srows)}", flush=True)
            n_ok += 1
            continue
        rel = con.sql(oracles[name])
        drows = rel.fetchall()
        scols = [c.lower() for c in df.columns]
        dcols = [c.lower() for c in rel.columns]
        oi = sorted(range(len(scols)), key=lambda i: scols[i])
        od = sorted(range(len(dcols)), key=lambda i: dcols[i])
        ss = sorted(tuple(repr(r[i]) for i in oi) for r in srows)
        dd = sorted(tuple(repr(r[i]) for i in od) for r in drows)
        ok = (sorted(scols) == sorted(dcols)) and ss == dd
        print(("OK   " if ok else "MISM ") + f"{name} {len(srows)}",
              flush=True)
        if ok:
            n_ok += 1
        else:
            fails.append(name)
            if sorted(scols) != sorted(dcols):
                print(f"  cols spark={sorted(scols)} duck={sorted(dcols)}")
            else:
                for a, b in zip(ss, dd):
                    if a != b:
                        print(f"  spark={a}\n  duck ={b}")
                        break
                if len(ss) != len(dd):
                    print(f"  rowcount spark={len(ss)} duck={len(dd)}")
    except Exception as ex:
        print("ERR  ", name, str(ex).split("\n")[0][:200], flush=True)
        fails.append(name)
print(f"SIM OK: {n_ok}/{len(names)} FAILURES: {fails}")
spark.stop()
sys.exit(1 if fails else 0)
