"""Driver-window rotation planner.

The external driver's correctness harness checks only the FIRST 50
entries of ``queries()``; ``gate._DRIVER_ORDER`` pins that window.  With
more registered gates than window rows, coverage is a rotation schedule:
each round the window should hold (a) gates that have never had a driver
row, (b) gates whose last driver row is stalest, and (c) a band of
long-green sentinels for cross-round regression continuity.

This script reads every CORRECTNESS_r*.json in the repo root plus the
current registry order and prints:

  * per-gate driver history (last round green / red / never checked),
  * a proposed next-round _DRIVER_ORDER (paste-ready Python list),
  * the debt count (gates with no driver row at all).

Run at round start, after the driver drops CORRECTNESS_r{N}.json:

    python tools/rotate_window.py [--window 50] [--sentinels 12]

Pure planning tool: prints a proposal, never edits gate.py.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cantera_table_spark import gate  # noqa: E402

# Families whose long-green members make good sentinels: one per major
# subsystem keeps a regression in any subsystem driver-visible even in
# rounds when its newer gates are out of window.
SENTINEL_PREFS = [
    "q01_", "corr01", "tpch_q3", "dd13", "f32_02", "in01", "dp02",
    "x02", "p01", "set01", "st04", "dd07", "sim04", "tx06", "ds01",
    "mm06", "ir01", "ev04",
]


def load_history(repo_root: str) -> dict[str, dict[int, bool]]:
    """gate name -> {round: hash_match} across all CORRECTNESS files."""
    hist: dict[str, dict[int, bool]] = {}
    for path in sorted(glob.glob(os.path.join(repo_root,
                                              "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            data = json.load(f)
        for name, row in data.items():
            ok = bool(row.get("hash_match")) and not row.get("err")
            hist.setdefault(name, {})[rnd] = ok
    return hist


def propose(window: int, n_sentinels: int) -> tuple[list[str], dict]:
    repo_root = os.path.join(os.path.dirname(__file__), "..")
    hist = load_history(repo_root)
    registry = list(gate._QUERIES)

    never = [n for n in registry if n not in hist]
    last_green = {n: max((r for r, ok in hist[n].items() if ok),
                         default=None)
                  for n in registry if n in hist}
    red_now = [n for n, rs in hist.items()
               if n in registry and rs and not rs[max(rs)]]

    # stalest first among the checked gates (never-green sorts first)
    checked = sorted((n for n in registry if n in hist),
                     key=lambda n: (last_green[n] is not None,
                                    last_green[n] or 0,
                                    registry.index(n)))

    sentinels = []
    for pref in SENTINEL_PREFS:
        for n in registry:
            if n.startswith(pref) and last_green.get(n) is not None:
                sentinels.append(n)
                break
        if len(sentinels) >= n_sentinels:
            break

    priority: list[str] = []
    for group in (never, red_now, checked):
        for n in group:
            if n not in priority:
                priority.append(n)
    # sentinels must land INSIDE the window even when debt is large:
    # fill the non-sentinel slots by priority first, then append every
    # sentinel (a sentinel that is also never/red simply rides along in
    # the priority region and frees a slot)
    sent_set = set(sentinels)
    non_sent = [n for n in priority if n not in sent_set]
    head = non_sent[:max(0, window - len(sentinels))] + sentinels
    head = head[:window]
    tail = [n for n in priority if n not in head]
    stats = {
        "registry": len(registry),
        "never_checked": len(never),
        "red_at_last_check": len(red_now),
        "window": window,
        "out_of_window": max(0, len(registry) - window),
        "sentinels": sentinels,
    }
    return head + tail, stats


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--window", type=int, default=50)
    ap.add_argument("--sentinels", type=int, default=12)
    args = ap.parse_args()

    order, stats = propose(args.window, args.sentinels)
    print(json.dumps(stats, indent=2))
    print("\n# proposed _DRIVER_ORDER (first %d = driver window):"
          % args.window)
    print("_DRIVER_ORDER = [")
    for i, n in enumerate(order[:args.window]):
        marker = "  # --- window ends here" if i == args.window - 1 else ""
        print(f'    "{n}",{marker}')
    print("]")


if __name__ == "__main__":
    main()
