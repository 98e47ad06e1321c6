"""Registry-wide de-globalization gate (VERDICT r11 item 1): no
registered query may plan a fact-grain ``Exchange SinglePartition`` —
every occurrence must be the merge step of an already-reduced aggregate,
the two-pass prefix scan's partition-count-sized ``_pp_pid`` offsets
window, or a globalization of a relation its own subtree already
reduced to group grain. This generalizes the per-query assertions in
test_plans.py (pareto / interval / rfm / ntile / zorder) into an
invariant over the WHOLE registry, so a future query that sneaks in an
unpartitioned window over fact rows fails CI, not a 100× scale-up.

The classifier lives in scripts/plan_gate.py (also runnable standalone
against any sf dir); here it runs over every query's executed plan at
the unit SF. Plans only — nothing is executed beyond what a query's
own staging does at build time.
"""

from __future__ import annotations

import pytest

# slow tier (r16): registry-wide plan walk (~3 min); excluded from the default run (pytest.ini)
pytestmark = pytest.mark.slow

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from plan_gate import single_partition_violations  # noqa: E402

from distributed_query_engine_spark.registry import all_queries  # noqa: E402


def test_no_fact_grain_single_partition_anywhere(spark, sf_dir):
    flagged: dict[str, list[str]] = {}
    errs: dict[str, str] = {}
    for name, fn in all_queries().items():
        try:
            plan = (
                fn(spark, sf_dir)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as e:  # collect, so ONE failure names them all
            errs[name] = repr(e)[:200]
            continue
        v = single_partition_violations(plan)
        if v:
            flagged[name] = v
    assert not errs, errs
    assert not flagged, flagged
