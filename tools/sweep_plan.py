#!/usr/bin/env python
"""Plan the next round's _SWEEP_ORDER rotation from official records.

The driver's correctness gate sweeps the first 50 registry keys each
round, so coverage accumulates only if the rotation is driven by the
official CORRECTNESS_r*.json files — not by hand-counted comments
(round 3's comment undercounted the backlog 19 vs 23).

Prints three lists:
  - never-swept keys (no official entry in any round) — front these;
  - keys whose latest official entry is oldest — re-confirm next;
  - keys currently inside the top-50 fold, for cross-checking.

  python tools/sweep_plan.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakehouse_automation_spark.queries import REGISTRY  # noqa: E402


def official_rounds() -> dict[str, int]:
    """Map key -> latest round number with an official entry."""
    latest: dict[str, int] = {}
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        for key in json.load(open(path)):
            latest[key] = max(latest.get(key, 0), rnd)
    return latest


def main() -> None:
    keys = list(REGISTRY)
    latest = official_rounds()
    never = [k for k in keys if k not in latest]
    by_age = sorted((k for k in keys if k in latest), key=lambda k: latest[k])

    print(f"registry: {len(keys)} keys; officially swept: {len(latest)}")
    print(f"\nnever swept ({len(never)}):")
    for k in never:
        print(f"  {k}")
    print("\noldest official entries (re-confirm candidates):")
    for k in by_age[:30]:
        print(f"  r{latest[k]}  {k}")
    print("\ncurrent top-50 fold:")
    for i, k in enumerate(keys[:50]):
        mark = "NEW" if k not in latest else f"r{latest[k]}"
        print(f"  {i + 1:2d}. [{mark:>3s}] {k}")

    from lakehouse_automation_spark.queries import _NEXT_SWEEP_QUEUE
    if _NEXT_SWEEP_QUEUE:
        print("\ndeclared next-round queue front (_NEXT_SWEEP_QUEUE):")
        for k in _NEXT_SWEEP_QUEUE:
            print(f"  {k}")


if __name__ == "__main__":
    main()
