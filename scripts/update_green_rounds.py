"""Merge the driver CORRECTNESS_r*.json artifacts into GREEN_ROUNDS.json.

The driver's per-round correctness artifact is capped (observed: exactly 50
rows in r03 and r04 while queries() registers 72+), so which queries get a
fresh driver row is decided by dict order in __spark_entry__.queries().
This ledger records, per query, the latest round with a fully-green driver
row (rows+schema+hash, no err); queries() orders entries by
rounds-since-last-green (never-green first), so the capped artifact always
spends its rows on the entries with the stalest evidence and every query
gets a green row at least every ceil(n_queries / cap) rounds.

Run after each round's artifact lands:  python scripts/update_green_rounds.py
"""

from __future__ import annotations

import glob
import json
import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEDGER = os.path.join(ROOT, "GREEN_ROUNDS.json")


def is_green(row: dict) -> bool:
    return bool(
        row.get("rows_match")
        and row.get("schema_match")
        and row.get("hash_match", True)
        and not row.get("err")
    )


def main() -> None:
    last_green: dict[str, int] = {}
    merged: list[int] = []
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.load(open(path))
        except (OSError, json.JSONDecodeError):
            continue
        merged.append(rnd)
        for name, row in rows.items():
            if isinstance(row, dict) and is_green(row):
                last_green[name] = max(last_green.get(name, 0), rnd)
    out = {
        "_doc": "latest driver round with a fully-green row per query; "
        "consumed by __spark_entry__.queries() for stalest-first rotation",
        "rounds_merged": merged,
        "last_green": dict(sorted(last_green.items())),
    }
    json.dump(out, open(LEDGER, "w"), indent=1)
    print(f"wrote {LEDGER}: rounds={merged}, {len(last_green)} queries with a green row")


if __name__ == "__main__":
    main()
