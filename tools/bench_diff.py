#!/usr/bin/env python
"""Bench regression gate: compare a fresh bench_detail.json against
the committed baseline sidecar (same protocol: per-query medians of 5
at the same SF) and flag per-query regressions beyond a threshold.

The medians-of-5 protocol (round 7) made per-query numbers stable
enough to diff; this tool is the follow-through — run it at round
close BEFORE committing the new sidecar:

    python bench.py                      # writes bench_detail.json
    python tools/bench_diff.py           # vs git HEAD's sidecar
    python tools/bench_diff.py old.json new.json [threshold]

Exit code 1 when any common query regressed beyond the threshold
(default 1.5x median), so it can gate a commit. New/removed queries
are listed, never flagged (coverage changes are deliberate).

--full switches to the FULL-REGISTRY sidecar (bench_full.json,
written by tools/bench_full.py): single-sample / no-warmup numbers,
so the default threshold is looser (2.5x) and the noise floor higher
(0.2s) — that sweep is a tripwire for the ~190 queries the headline
protocol never times, not a steady-state statistic.

Queries tagged "class": "ground_truth" in the sidecar (deliberate
exact-enumeration eval harnesses: the containment/prefix-filter
verification joins, the LSH eval) are diffed and REPORTED but never
gate the exit code — their cost is the point, and they are ~40% of
the full-sweep wall time, so one noisy sample must not fail a
commit (VERDICT r9 #4).

    python tools/bench_diff.py --full            # vs HEAD's sidecar
    python tools/bench_diff.py --full old new [threshold]
"""

from __future__ import annotations

import json
import subprocess
import sys

DEFAULT_THRESHOLD = 1.5
# medians under this are dominated by fixed per-query harness noise
# (session codegen, JIT warmup scatter) — a ratio over ~50ms floors
# is not a signal
MIN_SEC = 0.05
# single-sample full-sweep protocol: looser gate, higher floor
FULL_THRESHOLD = 2.5
FULL_MIN_SEC = 0.2


def _load_committed(path: str = "bench_detail.json") -> dict:
    blob = subprocess.check_output(["git", "show", f"HEAD:{path}"])
    return json.loads(blob)


def main() -> int:
    argv = list(sys.argv[1:])
    full = "--full" in argv
    if full:
        argv.remove("--full")
    default_path = "bench_full.json" if full else "bench_detail.json"
    default_threshold = FULL_THRESHOLD if full else DEFAULT_THRESHOLD
    min_sec = FULL_MIN_SEC if full else MIN_SEC
    if len(argv) >= 2:
        old = json.load(open(argv[0]))
        new = json.load(open(argv[1]))
        threshold = float(argv[2]) if len(argv) > 2 else default_threshold
    else:
        old = _load_committed(default_path)
        new = json.load(open(default_path))
        threshold = float(argv[0]) if len(argv) > 0 else default_threshold

    # warn on mismatch OR on a missing sf key in either file — a
    # sidecar without an sf stamp could be from any scale factor, so
    # silence would let incomparable ratios gate the commit (ADVICE r8)
    if old.get("sf") != new.get("sf"):
        print(
            f"WARNING: sf mismatch or missing (old {old.get('sf')} vs "
            f"new {new.get('sf')}) — ratios are not comparable"
        )
    oq, nq = old["queries"], new["queries"]
    # the NEW sidecar's classes are the current registry's intent; the
    # old sidecar is only a fallback for diffs against pre-class
    # sidecars — unioning both would let a stale ground_truth tag keep
    # exempting a query after it is reclassified to pipeline
    cls = new.get("classes", old.get("classes", {}))
    gt = {n for n, c in cls.items() if c == "ground_truth"}
    common = sorted(set(oq) & set(nq))
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))

    regressions, improvements, gt_moves = [], [], []
    for name in common:
        a, b = oq[name], nq[name]
        if max(a, b) < min_sec:
            continue
        ratio = b / a if a > 0 else float("inf")
        if ratio > threshold:
            (gt_moves if name in gt else regressions).append(
                (ratio, name, a, b)
            )
        elif ratio < 1 / threshold:
            improvements.append((ratio, name, a, b))

    print(
        f"bench_diff: {len(common)} common queries, "
        f"sum {sum(oq[n] for n in common):.2f}s -> "
        f"{sum(nq[n] for n in common):.2f}s "
        f"({sum(nq[n] for n in common) / max(sum(oq[n] for n in common), 1e-9):.3f}x), "
        f"threshold {threshold}x"
    )
    for ratio, name, a, b in sorted(regressions, reverse=True):
        print(f"  REGRESSED {ratio:5.2f}x  {name}: {a:.3f}s -> {b:.3f}s")
    for ratio, name, a, b in sorted(gt_moves, reverse=True):
        print(
            f"  ground-truth class (informational) {ratio:5.2f}x  "
            f"{name}: {a:.3f}s -> {b:.3f}s"
        )
    for ratio, name, a, b in sorted(improvements):
        print(f"  improved  {ratio:5.2f}x  {name}: {a:.3f}s -> {b:.3f}s")
    if added:
        print(f"  new queries (not compared): {', '.join(added)}")
    if removed:
        print(f"  removed queries: {', '.join(removed)}")
    if regressions:
        print(f"FAIL: {len(regressions)} quer{'y' if len(regressions)==1 else 'ies'} regressed beyond {threshold}x")
        return 1
    print("OK: no per-query regression beyond threshold")
    return 0


if __name__ == "__main__":
    sys.exit(main())
