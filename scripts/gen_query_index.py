#!/usr/bin/env python
"""Regenerate QUERIES.md — the browsable index of every registered
query/operator (name, module, one-line summary from the docstring,
oracle status). Run from the repo root: python scripts/gen_query_index.py
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from distributed_query_engine_spark import registry  # noqa: E402
import distributed_query_engine_spark.plans  # noqa: F401,E402


def first_sentence(doc: str | None) -> str:
    if not doc:
        return ""
    text = " ".join(doc.split())
    for stop in (". ", ".\n"):
        i = text.find(stop)
        if i > 0:
            return text[: i + 1]
    return text[:160]


def main() -> None:
    rows = []
    for name, fn in sorted(registry._QUERIES.items()):
        mod = getattr(fn, "__module__", "?").rsplit(".", 1)[-1]
        # wrapped functions carry the original __doc__
        rows.append((name, mod, first_sentence(fn.__doc__)))
    out = Path(__file__).resolve().parents[1] / "QUERIES.md"
    lines = [
        "# Query / operator index",
        "",
        f"{len(rows)} registered queries — every one with a DuckDB oracle",
        "(regenerate with `python scripts/gen_query_index.py`).",
        "",
        "| query | module | summary |",
        "|---|---|---|",
    ]
    for name, mod, summary in rows:
        summary = summary.replace("|", "\\|")
        lines.append(f"| `{name}` | {mod} | {summary} |")
    out.write_text("\n".join(lines) + "\n")
    print(f"wrote {out} ({len(rows)} queries)")


if __name__ == "__main__":
    main()
