#!/usr/bin/env python
"""Registry-wide single-partition audit (VERDICT r11 item 1): build the
physical plan of EVERY registered query and flag each
``Exchange SinglePartition`` that is not provably reduced-grain.

Classification per occurrence (tree string: parents above, children
below at deeper indent):

- OK if the nearest parent (walking up) is a HashAggregate /
  ObjectHashAggregate / SortAggregate — the merge step of an aggregate
  whose input was already partially reduced map-side;
- OK if the nearest parent Sort is on the internal ``_pp_pid`` key —
  the partition-count-sized offsets window of the two-pass prefix scan;
- OK if the exchange's own child subtree contains a final aggregate
  (the relation being globalized was already reduced to group grain
  before the exchange);
- otherwise FLAGGED: a fact-grain single-task sort/window.

Usage: python scripts/plan_gate.py [name ...]   (default: all)
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import os

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

from distributed_query_engine_spark import registry
from distributed_query_engine_spark.session import get_spark

SF = os.environ.get("DQE_GATE_SF", "/root/testdata/sf0.001")


def _indent(line: str) -> int:
    return len(line) - len(line.lstrip(" :+-*"))


def single_partition_violations(plan: str) -> list[str]:
    """Return one diagnostic string per fact-grain Exchange
    SinglePartition in ``plan`` (empty = clean)."""
    lines = plan.splitlines()
    out = []
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" not in ln:
            continue
        # (1) walk UP to the nearest consumer: aggregate merge is fine,
        # a Sort is fine only on the _pp_pid offsets key.
        verdict = None
        for j in range(i - 1, -1, -1):
            up = lines[j]
            if (
                "HashAggregate" in up
                or "ObjectHashAggregate" in up
                or "SortAggregate" in up
            ):
                verdict = "ok"
                break
            if "Sort [" in up:
                verdict = "ok" if "_pp_pid" in up else "sort"
                break
        if verdict == "ok":
            continue
        # (2) reduced-before-globalize: the exchange's child subtree
        # (deeper-indented lines immediately below) already contains a
        # final aggregate, so the globalized relation is group-grain.
        base = _indent(ln)
        child_reduced = False
        for k in range(i + 1, len(lines)):
            if _indent(lines[k]) <= base and lines[k].strip():
                break
            if "Aggregate" in lines[k]:
                child_reduced = True
                break
        if child_reduced:
            continue
        out.append(f"line {i}: {ln.strip()[:120]}")
    return out


def main() -> int:
    spark = get_spark("plan-gate")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.all_queries()
    names = sys.argv[1:] or list(qs)
    flagged, errs = {}, {}
    for name in names:
        try:
            df = qs[name](spark, SF)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # surface, don't die mid-sweep
            errs[name] = repr(e)[:200]
            continue
        v = single_partition_violations(plan)
        if v:
            flagged[name] = v
            print(f"FLAG {name}: {v}", flush=True)
    print(f"\nGATE: {len(names) - len(flagged) - len(errs)} clean / "
          f"{len(flagged)} flagged / {len(errs)} errored of {len(names)}")
    for n, e in errs.items():
        print(f"ERR  {n}: {e}")
    return 1 if (flagged or errs) else 0


if __name__ == "__main__":
    raise SystemExit(main())
