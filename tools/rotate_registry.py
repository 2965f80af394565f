"""Compute the next round's registry rotation for the driver gate.

The driver's CORRECTNESS_r{N}.json records at most the first ~50
``queries()`` keys, so each round the registry front-loads keys that have
never appeared in ANY prior CORRECTNESS file (cumulative-union
verification — see README.md). This tool diffs the registry against all
CORRECTNESS_r*.json files and prints:

  1. the keys verified in some prior round (count),
  2. the never-verified keys in current registry order — the list to paste
     into ``_NEVER_DRIVER_VERIFIED`` in giranking_spark/queries/__init__.py
     (first 50 become next round's gate set).

Run at the START of a round, after the driver has written the previous
round's CORRECTNESS file.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod


def main() -> None:
    stale = "--stale" in sys.argv
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    verified: set[str] = set()
    last_round: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        n = int(os.path.basename(path).split("_r")[1].split(".")[0])
        recs = json.load(open(path))
        keys = [k for k, v in recs.items() if isinstance(v, dict)]
        verified |= set(keys)
        for k in keys:
            last_round[k] = n
        print(f"# {os.path.basename(path)}: {len(keys)} keys", file=sys.stderr)
    order = list(entrymod.queries())
    never = [k for k in order if k not in verified]
    print(f"# verified so far: {len(verified & set(order))}/{len(order)}; "
          f"never-verified: {len(never)}", file=sys.stderr)
    if "--hist" in sys.argv:
        # staleness histogram for the BASELINE.md round summary: keys per
        # latest-driver-check round (never-verified keys bucket as r0)
        hist: dict[int, int] = {}
        for k in order:
            hist[last_round.get(k, 0)] = hist.get(last_round.get(k, 0), 0) + 1
        print("staleness histogram (latest driver check -> keys):")
        for rnd in sorted(hist):
            label = f"r{rnd}" if rnd else "never"
            print(f"  {label}: {hist[rnd]}")
        return
    if stale and not never:
        # STALENESS mode (round 9+): every key has a driver row, so the
        # gate front-loads the keys whose last check is oldest (the 50-key
        # cap then re-verifies them this round). Rank/agg/norm families
        # sort first within a round so the core engine is re-checked most
        # often.
        def prio(k: str):
            fams = ("rank_", "linkrank", "hostrank", "agg_", "norm_",
                    "graph_", "host_")
            fam = next((i for i, p in enumerate(fams) if k.startswith(p)),
                       len(fams))
            return (last_round.get(k, 0), fam, k)

        ordered = sorted((k for k in order), key=prio)[:50]
        print("# oldest-checked 50 (paste as the stale tail):",
              file=sys.stderr)
        print("_STALE_GATE = [")
        for k in ordered:
            print(f'    "{k}",  # last r{last_round.get(k, 0)}')
        print("]")
        return
    print("_NEVER_DRIVER_VERIFIED = [")
    for k in never:
        print(f'    "{k}",')
    print("]")


if __name__ == "__main__":
    main()
