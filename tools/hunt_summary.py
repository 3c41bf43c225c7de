"""Summarize a hunt jsonl: per (par, suite, turns) the validated-leg
floor, repro spread, and the best assemblable N->4N pairs.

Usage: python tools/hunt_summary.py [BENCH/hunt_r5.jsonl] [--turns N]
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "BENCH/hunt_r5.jsonl"
    want_turns = None
    if "--turns" in sys.argv:
        want_turns = int(sys.argv[sys.argv.index("--turns") + 1])
    legs: dict[tuple, list[dict]] = {}
    for line in open(path):
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        if d.get("mode") != "leg" or d.get("status") != "ok":
            continue
        if want_turns and d.get("turns") != want_turns:
            continue
        key = (d.get("turns"), d["suite"], d["par"])
        legs.setdefault(key, []).append(d)

    floors: dict[tuple, dict] = {}
    for key in sorted(legs, key=lambda k: (k[0] or 0, k[1], k[2])):
        ls = legs[key]
        val = [x for x in ls if x.get("validated")]
        walls = sorted(x["wall"] for x in val)
        allw = sorted(x["wall"] for x in ls)
        repro = ""
        if len(walls) >= 2:
            spread = (walls[1] - walls[0]) / walls[0] * 100
            repro = f" repro2={walls[1]:.2f} (+{spread:.1f}%)"
        print(
            f"turns={key[0]} {key[1]} par={key[2]}: "
            f"{len(val)}/{len(ls)} validated, floor="
            f"{walls[0] if walls else None}{repro} all_min={allw[0]:.2f}"
        )
        if walls:
            floors[key] = min(val, key=lambda x: x["wall"])

    print("\nassemblable pairs (validated floors):")
    for (t, s, lo_par), lo in sorted(floors.items()):
        hi_key = (t, s, lo_par * 4)
        if hi_key in floors:
            hi = floors[hi_key]
            eff = (hi["tps"] / lo["tps"]) / 4
            print(
                f"turns={t} {s} {lo_par}:{lo_par * 4} "
                f"lo={lo['wall']}s hi={hi['wall']}s eff={eff:.3f}"
            )


if __name__ == "__main__":
    main()
