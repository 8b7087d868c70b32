"""Compare two bench_results JSON files: per-query warm ratio vs the
data-scale factor. Round-2 VERDICT item 1: every query should scale
linear-ish (ratio within ~10-15x for a 10x input) or carry an
explanation.

Usage: python tools/compare_bench.py bench_results_sf0.1.json \
           bench_results_sf1.json [scale_factor=10]
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    small = json.load(open(sys.argv[1]))
    big = json.load(open(sys.argv[2]))
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0

    sw, bw = small["queries_warm"], big["queries_warm"]
    rows = []
    for name in sw:
        if name not in bw:
            continue
        ratio = bw[name] / sw[name] if sw[name] > 0 else float("inf")
        rows.append((ratio, name, sw[name], bw[name]))
    rows.sort(reverse=True)

    print(f"{'query':<34} {'small':>7} {'big':>8} {'ratio':>7}")
    flagged = 0
    for ratio, name, s, b in rows:
        flag = " <-- >1.5x-linear" if ratio > 1.5 * factor else ""
        if flag:
            flagged += 1
        print(f"{name:<34} {s:>7.2f} {b:>8.2f} {ratio:>6.1f}x{flag}")
    print(
        f"\ntotal warm: {small['total_warm_sec']:.1f}s -> "
        f"{big['total_warm_sec']:.1f}s "
        f"({big['total_warm_sec'] / small['total_warm_sec']:.1f}x for "
        f"{factor:.0f}x data); {flagged} queries over 1.5x-linear"
    )
    # window-drift normalization (round-11, VERDICT r10 #5): when both
    # stamps carry canary blocks, their pure-JVM canary means estimate
    # the window speed ratio on code that never changed — divide it
    # out before reading a total as a regression. ONLY valid when the
    # two stamps share a scale factor: the canary queries scan
    # lineitem, so cross-SF their ratio includes real data growth and
    # dividing it out would launder a genuine scaling regression as
    # window drift.
    cs, cb = small.get("canary"), big.get("canary")
    if cs and cb and cs.get("mean_sec") and cb.get("mean_sec"):
        if small.get("sf") == big.get("sf"):
            win = cb["mean_sec"] / cs["mean_sec"]
            raw = big["total_warm_sec"] / small["total_warm_sec"]
            print(
                f"canary: {cs['mean_sec']:.2f}s -> {cb['mean_sec']:.2f}s "
                f"(window ratio {win:.3f}); canary-normalized total ratio "
                f"{raw / win:.2f}x"
            )
        else:
            print(
                f"canary blocks present but sf differs "
                f"({small.get('sf')} vs {big.get('sf')}) — canary "
                f"normalization is same-SF only (canaries scan data too); "
                f"skipping"
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
