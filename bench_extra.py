"""Per-operator measurement harness (guide §1.4) — NOT the driver
bench: times EVERY registered gate query with the noop sink so the
computation is measured without the collect/compare machinery, and
writes {name: best_sec} JSON for the optimization round's checklist.

Usage:
  python bench_extra.py [--sf DIR] [--trials N] [--out PATH] [name ...]

bench.py stays the frozen driver-contract bench; this file exists so
optimization work can cite per-operator numbers (OPTIMIZATION_r08.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    args = sys.argv[1:]
    sf = "/root/testdata/sf0.1"
    trials = 2
    out_path = None
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf = args[i + 1]; i += 2
        elif args[i] == "--trials":
            trials = int(args[i + 1]); i += 2
        elif args[i] == "--out":
            out_path = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1

    from spatialsketch_spark.config import get_spark
    from spatialsketch_spark.gate import GATE_QUERIES
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench_extra", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    todo = names or list(GATE_QUERIES)
    out: dict[str, float] = {}
    errs: dict[str, str] = {}
    budget = float(os.environ.get("BENCH_EXTRA_TIMEOUT", "75"))
    t_all = time.time()
    import threading
    for name in todo:
        fn = GATE_QUERIES[name][0]
        sc = spark.sparkContext
        sc.setJobGroup(f"bx:{name}", name)
        # watchdog: a gate that blows the per-gate budget is CANCELLED
        # and recorded as a timeout — one pathological operator must
        # not stall the whole sweep (it becomes a finding instead)
        timer = threading.Timer(
            budget, lambda: sc.cancelJobGroup(f"bx:{name}"))
        timer.daemon = True
        timer.start()
        try:
            t0 = time.time()
            fn(spark, sf).write.format("noop").mode("overwrite").save()
            first = time.time() - t0
            best = None
            for _ in range(max(trials - 1, 0)):
                if time.time() - t0 > budget:
                    break
                t1 = time.time()
                fn(spark, sf).write.format("noop").mode("overwrite") \
                    .save()
                dt = time.time() - t1
                best = dt if best is None or dt < best else best
            out[name] = round(best if best is not None else first, 3)
            print(f"{name}: {out[name]} (first {round(first, 3)})",
                  flush=True)
        except Exception as exc:          # keep sweeping; report at end
            if not timer.is_alive():
                errs[name] = f"TIMEOUT>{budget}s"
            else:
                errs[name] = repr(exc)[:200]
            print(f"{name}: ERROR {errs[name]}", flush=True)
        finally:
            timer.cancel()
            sc.setJobGroup("", "")
            sc.setJobDescription(None)
    res = {"sf_dir": sf, "cpus": cpus, "trials": trials,
           "wall_s": round(time.time() - t_all, 1),
           "queries": dict(sorted(out.items(), key=lambda kv: -kv[1])),
           **({"errors": errs} if errs else {})}
    if out_path:
        with open(out_path, "w") as f:
            json.dump(res, f, indent=1)
    print(json.dumps({k: res[k] for k in ("sf_dir", "cpus", "wall_s")}))
    spark.stop()


if __name__ == "__main__":
    main()
