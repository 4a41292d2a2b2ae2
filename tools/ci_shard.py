#!/usr/bin/env python
"""Deterministic test-file sharding for CI (no pytest-shard dependency).

Usage: python tools/ci_shard.py SHARD NSHARDS [extra pytest args...]

Collects tests/test_*.py sorted by name, assigns files round-robin by size
rank (largest files spread across shards so wall-clock balances), and runs
the shard's files under one pytest invocation. Mirrors the reference's
matrixed CI (/root/reference/.github/workflows/ci.yml:159-231) without
needing plugins.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path


def shard_files(shard: int, nshards: int, tests_dir: Path) -> list[Path]:
    files = sorted(tests_dir.glob("test_*.py"))
    # largest-first round-robin keeps shard wall-clocks comparable
    by_size = sorted(files, key=lambda p: -p.stat().st_size)
    return sorted(p for i, p in enumerate(by_size) if i % nshards == shard)


def main() -> int:
    shard, nshards = int(sys.argv[1]), int(sys.argv[2])
    extra = sys.argv[3:]
    tests_dir = Path(__file__).resolve().parent.parent / "tests"
    files = shard_files(shard, nshards, tests_dir)
    if not files:
        print(f"shard {shard}/{nshards}: no files")
        return 0
    print(f"shard {shard}/{nshards}: {len(files)} files")
    cmd = [sys.executable, "-m", "pytest", "-q", *extra, *map(str, files)]
    return subprocess.call(cmd)


if __name__ == "__main__":
    raise SystemExit(main())
