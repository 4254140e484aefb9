"""Print the suggested next-round _SWEEP_PRIORITY head.

The driver's per-round CORRECTNESS sweep covers the first ~50 registered
queries, so `empdia_iceberg_spark/__init__.py:_SWEEP_PRIORITY` must rotate
every round (rotation policy in its comment). This tool does the
bookkeeping: it unions all CORRECTNESS_r*.json driver rows and prints

  1. names that STILL have no driver row (current registry order — which
     already encodes the kernels-before-plain-SQL risk ordering), then
  2. previously-swept names ordered by the round of their latest row
     (stalest first)

so the next head-of-list is a copy-paste away. Names whose code changed
in the current round must be moved to the very front by hand.

Usage: python tools/next_sweep.py [head_n]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import empdia_iceberg_spark  # noqa: F401  (populates the registry)
from empdia_iceberg_spark import registry


def main() -> None:
    head_n = int(sys.argv[1]) if len(sys.argv) > 1 else 55
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest_round: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)", os.path.basename(f))
        rnd = int(m.group(1)) if m else 0
        with open(f) as fh:
            for name in json.load(fh):
                latest_round[name] = max(latest_round.get(name, 0), rnd)

    names = list(registry.specs())
    never = [n for n in names if n not in latest_round]
    stale = sorted(
        (n for n in names if n in latest_round), key=lambda n: latest_round[n]
    )
    print(f"# registered={len(names)} swept={len(latest_round)} never={len(never)}")
    print(f"# suggested head (first {head_n}; prepend this round's changed code):")
    for n in (never + stale)[:head_n]:
        tag = "never" if n not in latest_round else f"r{latest_round[n]}"
        print(f'    "{n}",  # {tag}')


if __name__ == "__main__":
    main()
