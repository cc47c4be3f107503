"""Regenerate BASELINE_OPERATIVE.json from a BENCH_FULL.json run.

The operative baseline is the single machine-readable query -> seconds
table bench.py compares against (round-2 verdict item #9). Regenerate it
only from a CLEAN full-suite run (no concurrent load); pass --merge to
keep the faster of (existing, new) per query instead of replacing — use
that when the new run is known-noisy.

Usage: python tools/make_operative_baseline.py [--merge] [bench_full.json]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--merge"]
    merge = "--merge" in sys.argv[1:]
    src = args[0] if args else os.path.join(REPO, "BENCH_FULL.json")
    with open(src) as fh:
        full = json.load(fh)
    queries = dict(full["queries"])
    out_path = os.path.join(REPO, "BASELINE_OPERATIVE.json")
    if merge and os.path.exists(out_path):
        with open(out_path) as fh:
            old = json.load(fh).get("queries", {})
        for q, t in old.items():
            if q in queries:
                queries[q] = min(queries[q], t)
            else:
                queries[q] = t
    with open(out_path, "w") as fh:
        json.dump(
            {
                "protocol": (
                    "per-query median inside one clean `python bench.py` "
                    f"session, sf={full.get('sf')}, reps={full.get('reps')}"
                ),
                "generated_from": os.path.basename(src),
                "total": round(sum(queries.values()), 3),
                "queries": {q: queries[q] for q in sorted(queries)},
            },
            fh,
            indent=1,
        )
    print(f"wrote {out_path}: {len(queries)} queries, "
          f"total {round(sum(queries.values()), 1)}s")


if __name__ == "__main__":
    main()
