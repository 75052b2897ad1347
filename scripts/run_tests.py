#!/usr/bin/env python
"""Chunked test runner: the full suite in a few FRESH pytest processes.

Why not one `pytest tests/`: a single 350-test process accumulates XLA CPU
client state for the whole run and has twice died with a hard SIGABRT
("Fatal Python error: Aborted") at ~90% — inside a test that passes alone
(seen round 3 at ~92% and again 2026-08-19 in test_winograd_under_dp_sharding).
Chunk boundaries give each group a fresh interpreter, bound the blast
radius of such a crash, and make long runs resumable.

Why not pytest-xdist: the suite builds one 8-virtual-device CPU mesh per
process (platform_guard re-exec); workers sharing a host would oversubscribe
the single core anyway. Chunks run sequentially.

Usage:
  python scripts/run_tests.py            # full suite, chunked
  python scripts/run_tests.py --quick    # quick lane: -m "not slow"
  python scripts/run_tests.py --from-chunk 3   # resume after a crash
Extra pytest args pass through after `--`.
"""

import argparse
import glob
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Alphabetical chunks of tests/test_*.py, sized so no chunk dominates
# wall-clock (the heavy families — e2e parity, winograd, cli — are spread).
N_CHUNKS = 6


def chunks():
    files = sorted(glob.glob(os.path.join(REPO, "tests", "test_*.py")))
    out = [[] for _ in range(N_CHUNKS)]
    for i, f in enumerate(files):
        out[i % N_CHUNKS].append(os.path.relpath(f, REPO))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help='add -m "not slow"')
    ap.add_argument("--from-chunk", type=int, default=1,
                    help="1-based chunk to resume from")
    ap.add_argument("--durations", type=int, default=0,
                    help="per-chunk --durations=N report")
    ap.add_argument("rest", nargs="*", help="extra pytest args after --")
    args = ap.parse_args()

    groups = chunks()
    t0 = time.time()
    failed = []
    for i, group in enumerate(groups, 1):
        if i < args.from_chunk or not group:
            continue
        cmd = [sys.executable, "-m", "pytest", "-q", *group]
        if args.quick:
            cmd += ["-m", "not slow"]
        if args.durations:
            cmd += [f"--durations={args.durations}"]
        cmd += args.rest
        print(f"[run_tests] chunk {i}/{len(groups)}: {len(group)} files",
              flush=True)
        rc = subprocess.run(cmd, cwd=REPO).returncode
        # pytest rc 5 = no tests collected (all deselected in quick lane)
        if rc not in (0, 5):
            failed.append((i, rc))
            print(f"[run_tests] chunk {i} FAILED rc={rc}", flush=True)
    dt = time.time() - t0
    if failed:
        print(f"[run_tests] FAILED chunks: {failed} ({dt:.0f}s)")
        return 1
    print(f"[run_tests] all chunks green in {dt:.0f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
