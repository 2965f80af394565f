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
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    verified: set[str] = set()
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        recs = json.load(open(path))
        keys = [k for k, v in recs.items() if isinstance(v, dict)]
        verified |= set(keys)
        print(f"# {os.path.basename(path)}: {len(keys)} keys", file=sys.stderr)
    order = list(entrymod.queries())
    never = [k for k in order if k not in verified]
    print(f"# verified so far: {len(verified & set(order))}/{len(order)}; "
          f"never-verified: {len(never)}", file=sys.stderr)
    print("_NEVER_DRIVER_VERIFIED = [")
    for k in never:
        print(f'    "{k}",')
    print("]")


if __name__ == "__main__":
    main()
