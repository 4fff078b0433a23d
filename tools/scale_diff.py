#!/usr/bin/env python3
"""Scale-slope report: compare two bench artifacts at different scale
factors (e.g. sf0.1 vs the ScaleData-derived sf1) and flag queries whose
cost grows superlinearly in the data. Usage:
  python3 tools/scale_diff.py <small.json> <big.json> [factor=10]

Per query prints wall x, cpu x (load-immune), shuffle x; the summary
counts queries past `flag = 1.5 * factor` on cpu or shuffle — the
superlinear suspects worth an .explain().
"""
import sys, json

def main():
    small = json.load(open(sys.argv[1]))
    big = json.load(open(sys.argv[2]))
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    flag = 1.5 * factor
    qs = sorted(set(small.get("queries", {})) & set(big.get("queries", {})))
    rows, suspects = [], []
    for q in qs:
        if q.startswith("_"):
            continue
        ws, wb = small["queries"].get(q, 0), big["queries"].get(q, 0)
        if ws is None or wb is None or ws < 0 or wb < 0:
            continue  # failed entries are negative
        cs = small.get("cpu_ms", {}).get(q, 0)
        cb = big.get("cpu_ms", {}).get(q, 0)
        ss = small.get("shuffle_bytes", {}).get(q, 0)
        sb = big.get("shuffle_bytes", {}).get(q, 0)
        wall_x = wb / ws if ws > 0 else float("inf")
        cpu_x = cb / cs if cs > 0 else float("nan")
        shf_x = sb / ss if ss > 0 else (float("nan") if sb == 0 else float("inf"))
        rows.append((q, ws, wb, wall_x, cpu_x, shf_x))
        # cpu is the load-immune signal; shuffle is the plan signal.
        # sub-100ms-cpu queries are all fixed overhead — exempt.
        if (cs > 100 and cpu_x == cpu_x and cpu_x > flag) or \
           (ss > 65536 and shf_x == shf_x and shf_x > flag):
            suspects.append(q)
    rows.sort(key=lambda r: -(r[4] if r[4] == r[4] else 0))
    print(f"{'query':34} {'wall_s':>7} {'wall_b':>7} {'wallx':>6} "
          f"{'cpux':>6} {'shufx':>6}")
    for q, ws, wb, wx, cx, sx in rows:
        print(f"{q:34} {ws:7.2f} {wb:7.2f} {wx:6.1f} {cx:6.1f} {sx:6.1f}")
    tot_s = sum(r[1] for r in rows)
    tot_b = sum(r[2] for r in rows)
    print(f"\ntotal wall {tot_s:.1f}s -> {tot_b:.1f}s "
          f"({tot_b / tot_s:.1f}x for {factor:.0f}x data) over {len(rows)} queries")
    print(f"superlinear suspects (cpu or shuffle > {flag:.0f}x): "
          f"{suspects if suspects else 'none'}")

if __name__ == "__main__":
    main()
