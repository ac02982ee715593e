"""Report driver-window freshness: which of the first-50 registry
entries (the driver's correctness window) have ever been driver-graded,
and which registry entries have NEVER been — the bookkeeping behind the
per-round window rotation (VERDICT r7 #5: rotate ~20-30
never-driver-verified entries into the window each round, keeping one
representative per family).

Usage: python scripts/window_report.py
Reads every committed CORRECTNESS_r*.json (driver windows) in the repo
root; the full-registry CORRECTNESS_local_r*.json artifacts are local
evidence, not driver gradings, so they are deliberately excluded.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from salesforce_plugin_spark.conformance import QUERIES  # noqa: E402


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seen: set[str] = set()
    rounds = []
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        if "local" in os.path.basename(path):
            continue
        m = re.search(r"r(\d+)", os.path.basename(path))
        with open(path) as fh:
            keys = set(json.load(fh).keys())
        rounds.append((int(m.group(1)), len(keys)))
        seen |= keys

    keys = list(QUERIES)
    window = keys[:50]
    fresh = [k for k in window if k not in seen]
    never = [k for k in keys if k not in seen]
    print(f"registry: {len(keys)} entries; driver windows seen: "
          f"{[r for r, _ in rounds]}")
    print(f"ever driver-graded: {len(seen)}")
    print(f"current window: {len(window) - len(fresh)} previously graded, "
          f"{len(fresh)} fresh this round")
    if fresh:
        print("  fresh:", ", ".join(fresh))
    print(f"never driver-graded (rotation candidates): {len(never)}")
    # group candidates by conformance module for family-aligned swaps
    by_mod: dict[str, list[str]] = {}
    for k in never:
        mod = QUERIES[k].__module__.rsplit(".", 1)[-1]
        by_mod.setdefault(mod, []).append(k)
    for mod in sorted(by_mod):
        names = by_mod[mod]
        head = ", ".join(names[:8]) + (" …" if len(names) > 8 else "")
        print(f"  {mod}: {len(names)} ({head})")


if __name__ == "__main__":
    main()
