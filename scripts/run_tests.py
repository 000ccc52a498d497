#!/usr/bin/env python
"""Run the test suite as N sequential pytest shards (one process each).

A single ~25-minute pytest process segfaulted once at ~95% inside JAX's
persistent compile-cache write (compilation_cache.put_executable_and_time,
during test_train_loop) — the crashing file passes in isolation, so the
failure is a long-process environment interaction (likely RSS pressure on
this 1-core host). Sharding bounds per-process lifetime and RSS: a crash
loses one shard's report instead of the whole suite's, and every shard
reuses the persistent jax compilation cache (tests/.jax_cache, set up by
tests/conftest.py), so warm total time is unchanged.

Shards run SEQUENTIALLY on purpose: two compile-heavy JAX processes on
this 1-core host make the 8-virtual-device CPU collectives flake
(CLAUDE.md). Files are split round-robin over the sorted listing so new
test files are included automatically and heavy files spread out.

Usage: python scripts/run_tests.py [--shards 3] [extra pytest args...]
"""

import argparse
import glob
import os
import subprocess
import sys


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--shards", type=int, default=3)
    args, extra = ap.parse_known_args()
    tests_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             os.pardir, "tests")
    files = sorted(os.path.relpath(p)
                   for p in glob.glob(os.path.join(tests_dir, "test_*.py")))
    if not files:
        print("no test files found", file=sys.stderr)
        return 2
    shards = [files[i::args.shards] for i in range(args.shards)]
    pytest_args = extra or ["-q"]
    failed = []
    for i, shard in enumerate(shards):
        print(f"=== shard {i + 1}/{args.shards} ({len(shard)} files) ===",
              flush=True)
        r = subprocess.run([sys.executable, "-m", "pytest",
                            *pytest_args, *shard])
        if r.returncode:
            failed.append(i + 1)
    if failed:
        print(f"FAILED shards: {failed}", file=sys.stderr)
        return 1
    print(f"all {args.shards} shards passed ({len(files)} files)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
