#!/usr/bin/env python
"""Cardinality-estimate audit for the bench plans (r15, VERDICT r14
item 7): walk each query's FINAL adaptive physical plan after
execution and, at every exchange, put Catalyst's pre-runtime estimate
(the exchange child's logical-stats sizeInBytes / rowCount) next to
the runtime truth (the exchange's dataSize / row metrics), flagging
>10x misestimates in either direction.

WHY bytes and why it matters: AQE re-plans from the runtime
MapOutputStatistics BELOW each exchange, so a misestimate below an
exchange is self-healing — but everything AQE decides for work ABOVE
the exchange (coalescing, broadcast demotion) is sized by those bytes,
and the r14 trap class (candidate fan-out amplified 100x above a tiny
exchange, collapsed to one partition) is exactly a plan whose cost
lives where no statistic sees it. This harness makes the gap visible
per plan BEFORE it OOMs at 100 TB: a >10x row/bytes misestimate on an
exchange input is either benign (Catalyst's multiplicative join-size
guess, corrected at runtime by AQE) or the next scale trap (a
constant-folded filter estimate hiding a hot key). The BASELINE.md r15
table records the verdict per flagged exchange.

Usage: python scripts/card_audit.py [SF_DIR] [name ...]
Writes .tmp/card_audit_<sf>.json and prints a per-query summary.
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import os

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

EXCHANGES = ("ShuffleExchangeExec", "BroadcastExchangeExec")


def walk(node, depth=0, out=None):
    """Flatten the executed plan, unwrapping AQE stage wrappers to the
    live trees they finalized."""
    if out is None:
        out = []
    name = node.getClass().getSimpleName()
    out.append((depth, name, node))
    if name == "AdaptiveSparkPlanExec":
        walk(node.executedPlan(), depth + 1, out)
        return out
    if name.endswith("QueryStageExec"):
        walk(node.plan(), depth + 1, out)
        return out
    ch = node.children()
    for i in range(ch.size()):
        walk(ch.apply(i), depth + 1, out)
    return out


def metric(node, *names):
    try:
        it = node.metrics().iterator()
        vals = {}
        while it.hasNext():
            kv = it.next()
            vals[kv._1()] = kv._2().value()
        for n in names:
            if n in vals:
                return vals[n]
    except Exception:
        pass
    return None


def logical_stats(node):
    """(est_bytes, est_rows|None) from the node's logical link."""
    try:
        ll = node.logicalLink()
        if not ll.isDefined():
            return None, None
        st = ll.get().stats()
        rc = st.rowCount()
        return int(str(st.sizeInBytes())), (
            int(str(rc.get())) if rc.isDefined() else None
        )
    except Exception:
        return None, None


def audit_query(df):
    """Execute and report every exchange's estimate-vs-actual.

    Execution must run THIS DataFrame's own QueryExecution — a
    noop-sink write or .rdd round-trip plans a fresh one, leaving the
    walked plan's metrics at zero (the first cut of this harness
    reported 0 actual rows everywhere)."""
    df.collect()
    nodes = walk(df._jdf.queryExecution().executedPlan())
    report = []
    for i, (depth, name, node) in enumerate(nodes):
        if name not in EXCHANGES:
            continue
        actual_bytes = metric(node, "dataSize")
        actual_rows = metric(node, "numOutputRows", "shuffleRecordsWritten")
        # the exchange's INPUT estimate is its child subtree's logical
        # stats — descend through the codegen/adapter wrappers (which
        # carry no logicalLink) to the FIRST linked descendant
        est_bytes, est_rows = None, None
        for d2, n2, node2 in nodes[i + 1:]:
            if d2 <= depth:
                break
            est_bytes, est_rows = logical_stats(node2)
            if est_bytes is not None:
                break
        ratio = None
        if est_rows is not None and actual_rows:
            ratio = est_rows / max(actual_rows, 1)
        elif est_bytes is not None and actual_bytes is not None:
            actual_eff = actual_bytes
            if name == "BroadcastExchangeExec":
                # the build-side HashedRelation carries a ~1 MiB
                # allocation floor; comparing a 7 KiB dimension
                # estimate against it is a harness artifact, not a
                # misestimate (first cut flagged every small dim x0.0)
                actual_eff = max(actual_bytes - (1 << 20), 1)
            ratio = est_bytes / max(actual_eff, 1)
        # Direction matters: an OVERestimate (est >> actual) can only
        # cost performance (a broadcast not chosen; AQE re-sizes the
        # downstream from runtime bytes anyway) — Catalyst's
        # multiplicative join-size guess makes these routine. An
        # UNDERestimate (est << actual) is the dangerous class: join
        # strategies are picked from the estimate BEFORE runtime, so a
        # relation 10x bigger than believed can be wrongly broadcast
        # or single-partitioned — the r14 fan-out trap's family.
        direction = None
        if ratio is not None and ratio > 10:
            direction = "over"
        elif ratio is not None and ratio < 0.1:
            direction = "under"
        report.append(
            {
                "exchange": name,
                "est_bytes": est_bytes,
                "est_rows": est_rows,
                "actual_bytes": actual_bytes,
                "actual_rows": actual_rows,
                "ratio": None if ratio is None else round(ratio, 2),
                "flag": direction is not None,
                "direction": direction,
            }
        )
    return report


def main():
    from distributed_query_engine_spark.session import get_spark

    import __spark_entry__ as E

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("card-audit")
    spark.sparkContext.setLogLevel("ERROR")
    import bench

    queries = E.queries()
    names = sys.argv[2:] or [n for n in bench.BENCH_QUERIES if n in queries]
    out = {}
    for name in names:
        try:
            rep = audit_query(queries[name](spark, sf))
        except Exception as ex:  # streaming lines have no single plan
            print(f"{name}: SKIP ({str(ex).splitlines()[0][:80]})")
            continue
        flags = [r for r in rep if r["flag"]]
        under = [r for r in flags if r["direction"] == "under"]
        out[name] = rep
        print(
            f"{name}: {len(rep)} exchanges, {len(flags)} flagged"
            f" ({len(under)} UNDER) "
            + "; ".join(
                f"{r['exchange']}@x{r['ratio']}[{r['direction']}]"
                for r in flags[:4]
            )
        )
    dst = Path(__file__).resolve().parents[1] / ".tmp" / (
        "card_audit_" + Path(sf).name + ".json"
    )
    dst.write_text(json.dumps(out, indent=1))
    nflag = sum(1 for rep in out.values() for r in rep if r["flag"])
    nunder = sum(
        1
        for rep in out.values()
        for r in rep
        if r["direction"] == "under"
    )
    nex = sum(len(rep) for rep in out.values())
    print(
        f"TOTAL: {nex} exchanges audited, {nflag} flagged >10x "
        f"({nunder} underestimates) -> {dst}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
