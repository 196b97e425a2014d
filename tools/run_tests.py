#!/usr/bin/env python
"""Chunked CI runner: the full suite, one pytest subprocess per test file.

Why: a single-process ``python -m pytest tests/ -q`` accumulates hundreds of
XLA:CPU compiled executables and segfaults at ~90% inside
``backend_compile_and_load`` (reproduced 3/3 in round 4 — see VERDICT.md
"What's weak" #1).  Every crash site passes in isolation, so the fix is
process isolation at file granularity: each test file gets a fresh
interpreter and a fresh XLA backend, and the runner aggregates results.

Usage:
    python tools/run_tests.py              # full suite
    python tools/run_tests.py -x          # stop at first failing file
    python tools/run_tests.py tests/test_sound.py tests/test_filters.py
    python tools/run_tests.py -k pattern  # forwarded to every pytest call

Exit code 0 iff every file's pytest run exits 0 (or 5 == "no tests
collected", which only happens under -k).  Prints a per-file table on
stderr and ONE summary line on stdout:
    TOTAL: <passed> passed, <failed> failed, <skipped> skipped in <secs>s
"""

import argparse
import pathlib
import re
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent

# Tally keys as pytest prints them in its summary line.
KEYS = ("passed", "failed", "errors", "error", "skipped",
        "xfailed", "xpassed", "warnings")


def run_file(path: pathlib.Path, extra: list, timeout: int):
    cmd = [sys.executable, "-m", "pytest", str(path), "-q",
           "-p", "no:cacheprovider"] + extra
    t0 = time.perf_counter()
    try:
        proc = subprocess.run(
            cmd, cwd=str(REPO), capture_output=True, text=True,
            timeout=timeout)
        rc, out = proc.returncode, proc.stdout + proc.stderr
    except subprocess.TimeoutExpired as e:
        rc = 124
        out = ((e.stdout or b"").decode(errors="replace")
               + (e.stderr or b"").decode(errors="replace")
               + f"\n*** TIMEOUT after {timeout}s ***")
    dt = time.perf_counter() - t0
    counts = {}
    summary_tail = "\n".join(out.splitlines()[-5:])
    for n, key in re.findall(r"(\d+) (\w+)", summary_tail):
        if key in KEYS:
            counts[key] = counts.get(key, 0) + int(n)
    return rc, counts, dt, out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="*", help="test files (default: all)")
    ap.add_argument("-x", "--exitfirst", action="store_true",
                    help="stop at the first failing FILE")
    ap.add_argument("-k", dest="keyword", default=None)
    ap.add_argument("--timeout", type=int, default=1800,
                    help="per-file timeout seconds (default 1800)")
    args = ap.parse_args()

    if args.files:
        files = [pathlib.Path(f) for f in args.files]
    else:
        files = sorted((REPO / "tests").glob("test_*.py"))
    extra = []
    if args.keyword:
        extra += ["-k", args.keyword]

    t_start = time.perf_counter()
    total = {"passed": 0, "failed": 0, "skipped": 0}
    bad_files = []
    for path in files:
        rc, counts, dt, out = run_file(path, extra, args.timeout)
        # pytest rc 5 = no tests collected (benign under -k filters)
        ok = rc == 0 or (rc == 5 and args.keyword)
        counts.setdefault("passed", 0)
        for k in total:
            total[k] += counts.get(k, 0)
        total["failed"] += counts.get("errors", 0) + counts.get("error", 0)
        mark = "ok " if ok else "FAIL"
        print(f"{mark} {path.name:<36} rc={rc:<3} "
              f"{counts.get('passed', 0):>4} passed "
              f"{counts.get('failed', 0) or ''}"
              f"{' failed' if counts.get('failed') else '':<7} "
              f"{dt:7.1f}s", file=sys.stderr, flush=True)
        if not ok:
            bad_files.append(path.name)
            # Show the subprocess tail so failures are diagnosable from
            # the runner's output alone.
            tail = "\n".join(out.splitlines()[-40:])
            print(tail, file=sys.stderr, flush=True)
            if args.exitfirst:
                break

    dt_all = time.perf_counter() - t_start
    ok_all = not bad_files
    print(f"TOTAL: {total['passed']} passed, {total['failed']} failed, "
          f"{total['skipped']} skipped in {dt_all:.0f}s"
          + ("" if ok_all else f"  [failing files: {', '.join(bad_files)}]"),
          flush=True)
    return 0 if ok_all else 1


if __name__ == "__main__":
    sys.exit(main())
