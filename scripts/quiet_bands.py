"""Regenerate bench.py's _SF1_QUIET_BANDS (r15, VERDICT r14 ask #2) or
_HEADLINE_QUIET_BANDS (r16) literal from the committed calm bench
artifacts.

Usage:
    python scripts/quiet_bands.py [--headline] [artifact.json ...]

With no artifact arguments, uses the standing calm-reference set.
Prints the dict body ready to paste into bench.py. lo = per-row
minimum across the artifacts' sf1 (or headline ``queries``) sections;
hi = 1.5 * lo (the era gate's _ERA_TOL) — see the band comments in
bench.py for the spot-checks against BASELINE.md's settled narrative
bands.
"""

from __future__ import annotations

import json
import os
import sys

DEFAULT_CALM = [
    "BENCH_full_r12_calm.json",
    "BENCH_full_r13_calm.json",
    "BENCH_full_r13_calm2.json",
    "BENCH_full_r14_calm.json",
    "BENCH_full_r14_calm3.json",
]


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    args = [a for a in sys.argv[1:] if a != "--headline"]
    headline = "--headline" in sys.argv[1:]
    section, var = ("queries", "_HEADLINE_QUIET_BANDS") if headline else (
        "sf1", "_SF1_QUIET_BANDS")
    paths = args or [os.path.join(root, f) for f in DEFAULT_CALM]
    rows: dict[str, list[float]] = {}
    for p in paths:
        with open(p) as f:
            d = json.load(f)
        for k, v in d.get(section, {}).items():
            if isinstance(v, (int, float)):
                rows.setdefault(k, []).append(float(v))
    print(f"{var}: dict[str, tuple[float, float]] = {{")
    for k in sorted(rows):
        lo = min(rows[k])
        print(f'    "{k}": ({lo}, {round(1.5 * lo, 3)}),')
    print("}")


if __name__ == "__main__":
    main()
