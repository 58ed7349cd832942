#!/usr/bin/env python
"""Diff two BENCH_FULL.json files with noise context.

Usage: python tools/compare_bench.py OLD.json NEW.json [--top N]

Prints per-query deltas sorted by absolute regression, with each file's
host-steal and speed-canary readings so a "regression" caused by a noisy
window (canary inflated) isn't mistaken for an engine change. Queries only
in one file are listed separately (added/removed).
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    return d


def main() -> None:
    argv = sys.argv[1:]
    top = 20
    if "--top" in argv:
        i = argv.index("--top")
        top = int(argv[i + 1])
        del argv[i : i + 2]
    if len(argv) != 2:
        print(__doc__)
        sys.exit(2)
    args = argv
    old, new = load(args[0]), load(args[1])
    oq, nq = old.get("queries", {}), new.get("queries", {})
    print(
        f"old: total={old.get('value')}s n={len(oq)} "
        f"steal={old.get('host_steal_pct')}% canary={old.get('canary_ms')}"
    )
    print(
        f"new: total={new.get('value')}s n={len(nq)} "
        f"steal={new.get('host_steal_pct')}% canary={new.get('canary_ms')}"
    )
    c_old, c_new = old.get("canary_ms"), new.get("canary_ms")
    if c_old and c_new:
        ratio = (sum(c_new) / len(c_new)) / (sum(c_old) / len(c_old))
        if not 0.8 <= ratio <= 1.25:
            print(
                f"!! canary ratio {ratio:.2f} — machine speed differed between "
                "runs; treat per-query deltas as noise-dominated"
            )
    shared = sorted(
        (n for n in nq if n in oq), key=lambda n: -(nq[n] - oq[n])
    )
    print(f"\nworst regressions (of {len(shared)} shared):")
    for n in shared[:top]:
        d = nq[n] - oq[n]
        if d <= 0:
            break
        print(f"  {n}: {oq[n]:.2f}s -> {nq[n]:.2f}s (+{d:.2f})")
    print("\nbest improvements:")
    for n in reversed(shared[-top:]):
        d = nq[n] - oq[n]
        if d >= 0:
            break
        print(f"  {n}: {oq[n]:.2f}s -> {nq[n]:.2f}s ({d:.2f})")
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    if added:
        print(f"\nadded ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")


if __name__ == "__main__":
    main()
