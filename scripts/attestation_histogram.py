#!/usr/bin/env python
"""Per-query last-green-driver-round accounting for window rotation.

The driver attests only the first 50 registered queries each round
(CORRECTNESS_r{N}.json). The rotation invariant ("no query's last
driver row older than ~5 rounds") needs exact per-query last-green
math at every rotation; hand-copying it between registry comments has
already gone stale once (the r13 plan cited "r6-attested dedupe/
curation tails" that had re-attested in r10/r11 — VERDICT r13 item 1).
This script IS the accounting: run it at round close, paste its output
into the registry's next-round plan comment.

Usage:  python scripts/attestation_histogram.py [--repo /root/repo]

Prints, for every registered query (registration order):
  last-green round (or NEVER), and a histogram of debt by round.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys


def last_green_rounds(repo: str) -> dict[str, int]:
    """name -> highest round with a fully-green driver row."""
    out: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            data = json.load(f)
        for name, row in data.items():
            if (
                row.get("rows_match")
                and row.get("schema_match")
                # hash_match is None for rows-only checks — those are
                # weaker rows and do NOT count as green attestations
                and row.get("hash_match")
                and not row.get("err")
            ):
                out[name] = max(out.get(name, 0), rnd)
    return out


def registered_names(repo: str) -> list[str]:
    sys.path.insert(0, repo)
    from jobminer_spark import registry

    registry.load_all_operators()
    return list(registry.QUERIES)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", default=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    args = ap.parse_args()

    green = last_green_rounds(args.repo)
    names = registered_names(args.repo)

    hist: dict[int | str, list[str]] = {}
    for n in names:
        key: int | str = green.get(n, "NEVER")
        hist.setdefault(key, []).append(n)

    print(f"registered queries: {len(names)}")

    # debt metric (VERDICT r19 item 2): the rotation invariant —
    # "no query's last driver green older than ~6 rounds" — checked
    # mechanically at rotation time instead of by hand-reading the
    # histogram. `current` = the latest round with a CORRECTNESS
    # artifact; age = current - last_green (NEVER counts as infinite).
    current = max(green.values(), default=0)
    ages = {
        n: (current - green[n]) if n in green else None for n in names
    }
    never = [n for n, a in ages.items() if a is None]
    aged = {n: a for n, a in ages.items() if a is not None}
    max_age = max(aged.values(), default=0)
    over5 = sorted(n for n, a in aged.items() if a > 5)
    print(
        f"DEBT: current=r{current} max_age={max_age} "
        f"never_attested={len(never)} over_5_rounds={len(over5)}"
    )
    if never or over5:
        print(
            "DEBT DETAIL: invariant 'no last green older than 6 "
            "rounds' "
            + ("VIOLATED" if (never or max_age > 6) else "at risk")
        )

    for key in sorted(hist, key=lambda k: (-1 if k == "NEVER" else k)):
        qs = hist[key]
        print(f"\nlast green r{key} ({len(qs)}):")
        for q in qs:
            print(f"  {q}")


if __name__ == "__main__":
    main()
