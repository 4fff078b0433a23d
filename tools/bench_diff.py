#!/usr/bin/env python3
"""Round-over-round bench diff: per-query deltas between committed bench
artifacts. Two modes:

  python3 tools/bench_diff.py A.json B.json [min_delta_sec]
    Wall-clock diff of two artifacts (queries added/removed, total
    delta, movers) — the original adjudication view. Load-sensitive.

  python3 tools/bench_diff.py --cpu A.json B.json [... more.json] [--ratio 1.5]
    LOAD-IMMUNE regression gate over a SERIES of artifacts: compares
    per-query cpu_ms of the LAST artifact against the minimum of every
    earlier one (the best-known cost for that query) and prints every
    query at >= ratio (default 1.5x) — executor CPU stays flat under
    scheduler queueing, so these are code regressions, not machine
    load. Exit code 1 when offenders exist, so a round drive can gate
    on it.

The series gate exists because two consecutive rounds shipped headline
walls inflated ~12% by driver-machine load (131s vs an idle 117s twin);
cpu_ms is the cross-round signal, wall is advisory.
"""
import json
import sys

# queries below this floor are noise-dominated (JIT, listener-drain
# jitter); a 1.5x blowup of 80ms is not a regression signal
MIN_CPU_MS = 150


def load(path):
    return json.load(open(path))


def cpu_series(paths, ratio, normalize=False):
    arts = [(p, load(p)) for p in paths]
    missing = [p for p, a in arts if "cpu_ms" not in a]
    if missing:
        sys.exit(f"no cpu_ms in: {missing} (pre-r11 artifact?)")
    # subset artifacts (SPARK_GRAFT_ONLY runs — the leaders_* scale
    # probes) carry an "only" tag: their _shared_stage_build row and
    # amortization profile are not full-workload peers, so mixing one
    # into a best-of history would poison the baseline. Refuse loudly.
    subset = [p for p, a in arts if a.get("only")]
    if subset:
        sys.exit(f"subset artifacts (tagged \"only\") cannot join a --cpu "
                 f"history: {subset}")
    *hist, (bp, b) = arts
    if not hist:
        sys.exit("--cpu needs at least two artifacts")
    best = {}   # query -> (cpu_ms, artifact) best known before the last
    for p, a in hist:
        for q, c in a["cpu_ms"].items():
            if c > 0 and (q not in best or c < best[q][0]):
                best[q] = (c, p)
    # --normalize: even executor CPU is not host-immune — hypervisor
    # steal / frequency scaling inflates EVERY query's on-CPU cost by a
    # near-uniform factor (measured in round 12: identical code + data
    # re-benched 1.5-1.7x across the board, reproduced under both sbt
    # and bare-java JVMs). The uniform shift is the host; a REGRESSION
    # is a query that moved relative to the rest. Divide each ratio by
    # the median ratio over common queries before applying the gate.
    shift = 1.0
    if normalize:
        rs = sorted(c / best[q][0] for q, c in b["cpu_ms"].items()
                    if q in best and c >= MIN_CPU_MS and best[q][0] > 0)
        if rs:
            shift = rs[len(rs) // 2]
    offenders = []
    for q, c in sorted(b["cpu_ms"].items()):
        if q in best and c >= MIN_CPU_MS and best[q][0] > 0:
            r = c / best[q][0] / shift
            if r >= ratio:
                offenders.append((r, q, best[q], c))
    print(f"cpu gate: {bp} vs best-of {len(hist)} earlier artifact(s); "
          f"ratio >= {ratio}, floor {MIN_CPU_MS}ms"
          + (f", host-shift normalization /{shift:.2f}" if normalize else ""))
    new = sorted(set(b["cpu_ms"]) - set(best))
    if new:
        print(f"new queries (no history): {', '.join(new)}")
    for r, q, (bc, bpth), c in sorted(offenders, reverse=True):
        print(f"  REGRESSION {q:30s} {bc:8d}ms ({bpth}) -> {c:8d}ms  ({r:.2f}x)")
    if not offenders:
        print("  no cpu regression >= ratio")
    total_b = sum(c for c in b["cpu_ms"].values() if c > 0)
    print(f"total cpu_ms (last artifact): {total_b} over {len(b['cpu_ms'])} entries")
    sys.exit(1 if offenders else 0)


def wall_diff(a_path, b_path, min_delta):
    a, b = load(a_path), load(b_path)
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


def main():
    args = sys.argv[1:]
    if args and args[0] == "--cpu":
        args = args[1:]
        ratio = 1.5
        normalize = False
        if "--normalize" in args:
            normalize = True
            args.remove("--normalize")
        if "--ratio" in args:
            i = args.index("--ratio")
            ratio = float(args[i + 1])
            args = args[:i] + args[i + 2:]
        cpu_series(args, ratio, normalize)
    else:
        a_path, b_path = args[0], args[1]
        min_delta = float(args[2]) if len(args) > 2 else 0.3
        wall_diff(a_path, b_path, min_delta)


if __name__ == "__main__":
    main()
