#!/usr/bin/env python3
"""Round-over-round bench diff: per-query time and shuffle-byte deltas
between two committed bench artifacts. Usage:
  python3 tools/bench_diff.py bench/r07.json bench/r08.json [min_delta_sec]
Prints queries added/removed, the total delta, and every query whose
time moved more than min_delta_sec (default 0.3), worst regressions
first — the adjudication the truncated stdout tails of rounds 3-6 made
impossible.
"""
import json
import sys


def main():
    a_path, b_path = sys.argv[1], sys.argv[2]
    min_delta = float(sys.argv[3]) if len(sys.argv) > 3 else 0.3
    a = json.load(open(a_path))
    b = json.load(open(b_path))
    qa, qb = a["queries"], b["queries"]
    sa, sb = a.get("shuffle_bytes", {}), b.get("shuffle_bytes", {})
    added = sorted(set(qb) - set(qa))
    removed = sorted(set(qa) - set(qb))
    common = sorted(set(qa) & set(qb))
    print(f"{a_path}: {a['value']:.1f}s / {len(qa)} queries   "
          f"{b_path}: {b['value']:.1f}s / {len(qb)} queries")
    if added:
        t = sum(qb[q] for q in added)
        print(f"added ({t:.1f}s): " + ", ".join(f"{q} {qb[q]:.2f}s" for q in added))
    if removed:
        print("removed: " + ", ".join(removed))
    common_delta = sum(qb[q] - qa[q] for q in common)
    print(f"common-query delta: {common_delta:+.1f}s over {len(common)} queries")
    moved = [(qb[q] - qa[q], q) for q in common if abs(qb[q] - qa[q]) >= min_delta]
    for d, q in sorted(moved, reverse=True):
        sh = ""
        if q in sa and q in sb and max(sa[q], sb[q]) > 0:
            sh = f"  shuffle {sa[q]/1e6:.2f}->{sb[q]/1e6:.2f} MB"
        print(f"  {q:30s} {qa[q]:7.2f}s -> {qb[q]:7.2f}s  ({d:+.2f}s){sh}")
    if not moved:
        print(f"  (no query moved >= {min_delta}s)")


if __name__ == "__main__":
    main()
