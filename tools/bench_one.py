#!/usr/bin/env python
"""Time individual registry queries with the bench protocol (noop sink,
1 warmup, median of N timed samples) and optionally dump their
.explain("formatted") output to plans/r10/<name>_<tag>.txt.

The optimization-round workhorse (guide §1: measure first, isolate with
the noop sink, label jobs, capture plans). Uses the same get_spark
session as bench.py so timings are comparable with bench_detail.json.

Usage:
  python tools/bench_one.py q1_pricing_summary sim_neardup_lsh_buckets
  python tools/bench_one.py --plan before q1_pricing_summary
  python tools/bench_one.py --samples 3 --sf /root/testdata/sf0.1 NAME...
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    samples = 3
    plan_tag = None
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--sf":
            sf_dir = args[i + 1]
            i += 2
        elif a == "--samples":
            samples = int(args[i + 1])
            i += 2
        elif a == "--plan":
            plan_tag = args[i + 1]
            i += 2
        else:
            names.append(a)
            i += 1

    from workshop3_etl_spark.plans import registry
    from workshop3_etl_spark.session import get_spark

    spark = get_spark(app_name="bench_one")
    all_queries = registry.queries()
    selected = []
    for n in names:
        if n in all_queries:
            selected.append(n)
        else:
            matches = sorted(k for k in all_queries if k.startswith(n))
            if not matches:
                print(f"no query matches {n!r}", file=sys.stderr)
                return 2
            selected.extend(matches)

    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r11"),
    )
    for name in selected:
        fn = all_queries[name]
        if plan_tag:
            os.makedirs(plans_dir, exist_ok=True)
            # Stub the checkpoint materializers during the plan build
            # (dump_plans.py's fidelity recipe) so the dumped plan is
            # the real pre-checkpoint pipeline, then restore so the
            # TIMED runs execute the genuine code path.
            stubbed: list[tuple[object, str, object]] = []
            pending: list = []

            def _passthrough(result, *frames):
                pending.extend(frames)
                return result

            for mod_name, mod in list(sys.modules.items()):
                if mod_name.startswith("workshop3_etl_spark") and hasattr(
                    mod, "materialize_and_release"
                ):
                    stubbed.append(
                        (mod, "materialize_and_release",
                         mod.materialize_and_release)
                    )
                    mod.materialize_and_release = _passthrough
                if mod_name == "workshop3_etl_spark.sources.lakehouse" and hasattr(
                    mod, "tracked_local_checkpoint"
                ):
                    stubbed.append(
                        (mod, "tracked_local_checkpoint",
                         mod.tracked_local_checkpoint)
                    )
                    mod.tracked_local_checkpoint = lambda df: df
            try:
                df = fn(spark, sf_dir)
                txt = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
            finally:
                for mod, attr, orig in stubbed:
                    setattr(mod, attr, orig)
            for fr in pending:
                try:
                    fr.unpersist()
                except Exception:
                    pass
            path = os.path.join(plans_dir, f"{name}_{plan_tag}.txt")
            with open(path, "w", encoding="utf-8") as f:
                f.write(txt)
            print(f"# plan -> {path}", file=sys.stderr)
        if samples == 0:  # plan-only mode
            continue
        spark.sparkContext.setJobDescription(f"warmup: {name}")
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs: list[float] = []
        for k in range(samples):
            spark.sparkContext.setJobDescription(f"timed[{k}]: {name}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        med = statistics.median(runs)
        print(
            f"{name}: median={med:.3f}s min={min(runs):.3f}"
            f" max={max(runs):.3f} n={samples}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
