#!/usr/bin/env python
"""Isolated per-query FLOOR timings (VERDICT_r08 item 6).

The canonical BENCH_FULL.json records one in-suite number per query, which
makes regressions hostage to sweep position and shared-host noise windows
(`asia_market_share_by_year`'s r7/r8 history). This tool maintains the
sibling artifact BENCH_FLOORS.json: for each requested query, the MIN of
N isolated executions in a FRESH process (fresh JVM, suite-free — no
cross-query residue at all), with the run's steal%% and canary recorded so
a noisy window is visible in the artifact itself. Regression calls in
PLAN/VERDICT should cite floors, not sweep positions.

Usage:
    python tools/floor_bench.py [query ...]        # explicit names
    python tools/floor_bench.py --top20            # top-20 heaviest in BENCH_FULL.json
    FLOOR_REPS=6 python tools/floor_bench.py ...   # reps (default 6)

Timing engine: bench.py itself (BENCH_QUERIES subset + BENCH_REPEATS +
BENCH_RETIME_ABOVE_SEC=0 → every query re-timed to the min), so floors and
sweep numbers share one measurement implementation.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FLOORS_PATH = os.path.join(REPO, "BENCH_FLOORS.json")
FULL_PATH = os.path.join(REPO, "BENCH_FULL.json")


def _top20() -> list[str]:
    with open(FULL_PATH) as f:
        full = json.load(f)
    q = full["queries"]
    return sorted(q, key=lambda n: -q[n])[:20]


def main() -> None:
    args = [a for a in sys.argv[1:] if a]
    if args == ["--top20"]:
        names = _top20()
    elif args:
        names = args
    else:
        print("usage: floor_bench.py [--top20 | query ...]", file=sys.stderr)
        sys.exit(2)
    reps = int(os.environ.get("FLOOR_REPS", "6"))

    with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tf:
        part_path = tf.name
    env = dict(
        os.environ,
        BENCH_QUERIES=",".join(names),
        BENCH_REPEATS=str(reps),
        BENCH_RETIME_ABOVE_SEC="0",
        BENCH_FULL_PATH=part_path,
    )
    print(f"# floor run: {len(names)} queries x {reps} reps", file=sys.stderr)
    subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")], env=env, check=True
    )
    with open(part_path) as f:
        part = json.load(f)
    os.unlink(part_path)

    floors: dict = {}
    if os.path.exists(FLOORS_PATH):
        with open(FLOORS_PATH) as f:
            floors = json.load(f)
    stamp = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    for name, sec in part["queries"].items():
        floors[name] = {
            "floor_sec": sec,
            "reps": reps,
            "steal_pct": part.get("query_steal_pct", {}).get(name),
            "run_canary_ms": part.get("canary_ms"),
            "at": stamp,
        }
    with open(FLOORS_PATH, "w") as f:
        json.dump(floors, f, indent=1, sort_keys=True)
    worst = sorted(part["queries"].items(), key=lambda kv: -kv[1])[:10]
    print(json.dumps({"floors_updated": len(part["queries"]),
                      "heaviest": dict(worst),
                      "canary_ms": part.get("canary_ms"),
                      "host_steal_pct": part.get("host_steal_pct")}))


if __name__ == "__main__":
    main()
