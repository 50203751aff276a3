#!/usr/bin/env python
"""Age-driven rotation ledger (VERDICT r9 item 2).

Derives, from the committed CORRECTNESS_r*.json driver records, the last
round each registered query was driver-GREEN (rows+schema+hash all
matching, no error), and writes it to
``multiagent_form_schema_etl_spark/plans/rotation_ledger.json`` -- the
committed artifact ``plans.registry.ordered_query_names()`` reads to order
the post-PRIORITY window stalest-first, so driver re-confirmation ages stay
bounded now that the never-checked backlog is zero.

Run after each round's CORRECTNESS_r{N}.json lands:
    python tools/rotation.py            # rewrite the ledger
    python tools/rotation.py --show     # print stalest-first cohorts
"""

from __future__ import annotations

import argparse
import collections
import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEDGER = os.path.join(
    REPO, "multiagent_form_schema_etl_spark", "plans",
    "rotation_ledger.json")


def build() -> dict[str, int]:
    last_green: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(f.rsplit("_r", 1)[1].split(".")[0])
        for name, rec in json.load(open(f)).items():
            ok = (rec.get("err") is None and rec.get("rows_match")
                  and rec.get("schema_match") is not False
                  and rec.get("hash_match") is not False)
            if ok:
                last_green[name] = max(last_green.get(name, 0), rnd)
    return dict(sorted(last_green.items()))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--show", action="store_true")
    a = ap.parse_args()
    ledger = build()
    if a.show:
        by_round = collections.defaultdict(list)
        for n, r in ledger.items():
            by_round[r].append(n)
        for r in sorted(by_round):
            print(f"r{r}: {len(by_round[r])} queries")
            for n in sorted(by_round[r]):
                print(f"  {n}")
        return
    with open(LEDGER, "w") as fh:
        json.dump(ledger, fh, indent=0, sort_keys=True)
        fh.write("\n")
    print(f"wrote {LEDGER}: {len(ledger)} queries, "
          f"stalest round {min(ledger.values(), default=0)}")


if __name__ == "__main__":
    main()
