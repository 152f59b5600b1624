"""Compute the NEXT round's _GATE_FRONT candidates from driver history.

The driver gates only the first 50 ``queries()`` entries per round, and
the judge requires every registry entry to carry a driver green within
the last two rounds. This tool turns the rotation from hand-arithmetic
(error-prone at 100 entries — see the r7 window-overflow note in
queries.py) into a mechanical read-out:

    python tools/gate_rotation.py            # plan for the next round
    python tools/gate_rotation.py --window 50

It reports, in priority order:
  1. entries with NO driver green ever (new or still-red — must front);
  2. entries whose last green is two-or-more rounds old by next round
     (must front to keep the two-round rule);
  3. the remainder, oldest-green-first (fill the window; whatever
     overflows should be the longest-streak stable entries, named in
     _GATE_DEFERRED with a reason).
Entries whose CODE changed since their last green must be fronted too —
computed mechanically from GATE_MANIFEST.json (tools/gate_manifest.py,
committed on final code each round); entries missing from the manifest
are treated as changed.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def last_green_by_entry(repo_root: str) -> tuple[dict[str, int], int]:
    """(entry -> last round with a passing driver row, latest round seen).
    A 'green' is hash_match, or — for the weaker rows-only checks, which
    record hash_match as None (never False) — rows_match with no error.
    hash_match=False is a REAL driver red even when rows matched (the r4
    SUM-rendering failures had exactly that shape) and must re-front."""
    last: dict[str, int] = {}
    latest = 0
    for path in sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        latest = max(latest, rnd)
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            if row.get("hash_match") or (
                row.get("hash_match") is None
                and row.get("err") is None
                and row.get("rows_match")
            ):
                last[name] = max(last.get(name, 0), rnd)
    return last, latest


def main() -> None:
    window = 50
    if "--window" in sys.argv:
        window = int(sys.argv[sys.argv.index("--window") + 1])
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    import sketchlib.queries_data  # noqa: F401 — registers pipeline queries
    from sketchlib.queries import REGISTRY

    last, latest = last_green_by_entry(repo_root)
    next_round = latest + 1
    names = list(REGISTRY)

    from gate_manifest import changed_entries

    chg, man_missing = changed_entries()
    # manifest-missing entries that HAVE a green are code the manifest
    # never attested — treat as changed (never-green ones front anyway)
    changed = sorted(set(chg) | {n for n in man_missing if n in last})

    never = [n for n in names if n not in last]
    # two-round rule: by next_round, anything last green <= next_round - 2
    # would be stale without a fresh row
    stale = sorted(
        (n for n in names if n in last and last[n] <= next_round - 2),
        key=lambda n: (last[n], n),
    )
    moved = sorted(
        n for n in changed if n in last and last[n] > next_round - 2
    )
    fresh = sorted(
        (n for n in names if n in last and last[n] > next_round - 2
         and n not in moved),
        key=lambda n: (last[n], n),
    )

    must = never + stale + moved
    print(f"registry entries: {len(names)}; latest CORRECTNESS round: r{latest}; "
          f"planning r{next_round}; window: {window}")
    print(f"\nMUST front ({len(must)}):")
    for n in never:
        print(f"  {n}  (never green)")
    for n in stale:
        tag = " + code changed" if n in changed else ""
        print(f"  {n}  (last green r{last[n]}{tag})")
    for n in moved:
        print(f"  {n}  (last green r{last[n]}, CODE CHANGED since manifest)")
    overflow = len(must) - window
    if overflow > 0:
        print(f"\n!! must-front overflows the window by {overflow} — defer the "
              "longest-streak stable entries explicitly in _GATE_DEFERRED")
    else:
        room = window - len(must)
        print(f"\nfill remaining {room} slots oldest-green-first:")
        for n in fresh[:room]:
            print(f"  {n}  (last green r{last[n]})")
        print(f"\nleft outside the window ({len(fresh) - room}), freshest greens:")
        for n in fresh[room:]:
            print(f"  {n}  (last green r{last[n]})")
    if not os.path.exists(
        os.path.join(repo_root, "GATE_MANIFEST.json")
    ):
        print("\n!! GATE_MANIFEST.json missing — changed-set unavailable; run "
              "`python tools/gate_manifest.py --update` on final code and "
              "commit it.")


if __name__ == "__main__":
    main()
