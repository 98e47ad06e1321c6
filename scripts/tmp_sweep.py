#!/usr/bin/env python
"""Startup sweep for `.tmp/` accumulation (VERDICT r11 item 4): the
gitignored staging dir collects per-round scratch — driver-sim logs,
copied one-off scripts, dead-pid run dirs, interrupted `.build-*`
index scratch — that nothing ever reads again (386 MB by r12).

Default (safe while other processes run):
  - root-level `*.log` / `*.err` / `*.txt` / `*.py` scratch files
    older than MAX_AGE_H hours (live runs keep writing; age guards
    a concurrent session's fresh log),
  - `.build-*` index scratch whose pid is dead (interrupted builds;
    live builders are left alone),
  - dead-pid run dirs via the existing streaming sweep
    (`_sweep_dead_pid_dirs` — signature stores, foreachBatch sinks).

`--deep` additionally removes REGENERABLE artifact dirs: staged
derivatives (`<staging_key>/`, `bucketed_*`) and scale-up slices
(`sf1*`) — everything any query rebuilds on demand. Never run --deep
while another session is mid-flight against the same repo.

Usage: python scripts/tmp_sweep.py [--deep] [--dry-run]
"""
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TMP = Path(__file__).resolve().parents[1] / ".tmp"
MAX_AGE_H = 6


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


def main() -> None:
    deep = "--deep" in sys.argv
    dry = "--dry-run" in sys.argv
    if not TMP.is_dir():
        print("no .tmp dir — nothing to sweep")
        return
    freed, kept = 0, 0
    cutoff = time.time() - MAX_AGE_H * 3600

    def rm(p: Path, why: str):
        nonlocal freed
        sz = sum(
            f.stat().st_size for f in ([p] if p.is_file() else p.rglob("*"))
            if f.is_file()
        )
        freed += sz
        print(f"{'would remove' if dry else 'removed'} {p} ({why}, {sz >> 10} KiB)")
        if not dry:
            shutil.rmtree(p) if p.is_dir() else p.unlink()

    for p in sorted(TMP.iterdir()):
        if p.is_file() and p.suffix in {".log", ".err", ".txt", ".py"}:
            if p.stat().st_mtime < cutoff:
                rm(p, "stale scratch file")
            else:
                kept += 1
        elif p.is_dir() and deep and (
            p.name.startswith("bucketed_")
            or p.name.startswith("sf")
            or "-" in p.name  # <staging_key> artifact dirs (name-hash)
        ):
            rm(p, "regenerable staged artifact (--deep)")

    # interrupted .build-* index scratch (pid-suffixed; dead pid = safe)
    for p in TMP.rglob(".build-*"):
        pid = p.name.rsplit("-", 1)[-1]
        if pid.isdigit() and not _pid_alive(int(pid)):
            rm(p, "dead-pid index scratch")

    # dead-pid run dirs (signature stores, foreachBatch sinks, ckpts)
    try:
        from distributed_query_engine_spark.streaming.ops import (
            _sweep_dead_pid_dirs,
        )

        n = 0 if dry else _sweep_dead_pid_dirs()
        print(f"dead-pid run dirs swept: {n}")
    except Exception as e:  # streaming module needs no JVM, but be safe
        print(f"pid-dir sweep skipped: {e!r}")

    print(f"freed {freed >> 20} MiB; kept {kept} recent files")


if __name__ == "__main__":
    main()
