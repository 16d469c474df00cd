"""Multi-JVM deployment probe for the HEADLINE operators: sketch build
and PIP join (VERDICT r6 task 5).

The r6 minhash probe established the method: a single fat local[32]
JVM under-scales allocation-heavy work, but a real cluster runs one
executor JVM per 8-16 cores, so the deployment-relevant scaling axis
is EXECUTOR-DOUBLING — two concurrent pinned local[16] JVMs on
disjoint input halves vs one 16-core JVM (and, for contrast, one
32-thread JVM on the full input). This script applies the identical
protocol to the two north-rule operators:

- sketch build: build_sketch_df(cm, zorder mode) -> noop sink. The
  build IS a shuffle (z-order range partition + cell merge), so each
  JVM shuffles only within itself — exactly what per-executor
  map-side combine does on a cluster before the final merge exchange.
- PIP join: pip_join(events, POLYGONS, broadcast) -> noop sink. Pure
  codegen map work; the broadcast is per-JVM, as on a cluster.

Protocol traps inherited from r6 (BENCH_SCALING.json round6 notes):
the input is PRE-MATERIALIZED parquet (fixture arithmetic must not
pollute the timed job) and the timed job contains NO extra
repartition — file splits give each JVM its natural partitioning.

Usage:  BUILD_REP=160 python scripts/scaling_build_multijvm.py
        (first run materializes dist/build_events_rep{REP}; ~16M rows
        at REP=160 over the sf0.1 tables)
"""

import json
import os
import subprocess
import sys
import time

REP = int(os.environ.get("BUILD_REP", "160"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EVENTS = os.path.join(ROOT, "dist", f"build_events_rep{REP}")
N_FILES = 64          # even count -> clean disjoint halves


def prep():
    sys.path.insert(0, ROOT)
    from spatialsketch_spark.config import get_spark
    sys.path.insert(0, ROOT)
    import bench
    spark = get_spark(cpus=32)
    from spatialsketch_spark.gate import N
    ev = bench.replicated_events(spark, SF_DIR, N, REP)
    ev.repartition(N_FILES).write.mode("overwrite").parquet(EVENTS)
    spark.stop()


def event_files() -> list:
    return sorted(os.path.join(EVENTS, f) for f in os.listdir(EVENTS)
                  if f.endswith(".parquet"))


def run_leg(cpus: int, half: int | None) -> dict:
    sys.path.insert(0, ROOT)
    from pyspark.sql import functions as F
    from spatialsketch_spark.config import SketchConfig, get_spark
    from spatialsketch_spark.gate import MIN_LEVEL, N, POLYGONS
    from spatialsketch_spark.geo.build import build_sketch_df
    from spatialsketch_spark.geo.events import ITEM_DOMAIN
    from spatialsketch_spark.geo.joins import pip_join

    spark = get_spark(cpus=cpus)
    spark.conf.set("spark.sql.shuffle.partitions", str(cpus))
    files = event_files()
    if half is not None:
        files = files[half::2]
    ev = spark.read.parquet(*files)
    n_rows = ev.count()
    cfg = SketchConfig.realistic(n=N, eps=0.1, delta=0.05,
                                 item_domain=ITEM_DOMAIN)
    # warm passes: JIT the codegen + shuffle paths (bench.py protocol)
    build_sketch_df(ev.limit(50_000), cfg, "cm", MIN_LEVEL,
                    mode="zorder").write.format("noop") \
        .mode("overwrite").save()
    pip_join(ev.limit(100_000), POLYGONS, "broadcast").write \
        .format("noop").mode("overwrite").save()

    def timed(df) -> float:
        best = None
        for _ in range(2):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t = time.time() - t0
            best = t if best is None else min(best, t)
        return best

    t_build = timed(build_sketch_df(ev, cfg, "cm", MIN_LEVEL,
                                    mode="zorder"))
    t_pip = timed(pip_join(ev, POLYGONS, "broadcast"))
    spark.stop()
    return {"cpus": cpus, "rows": n_rows,
            "build_wall_s": round(t_build, 3),
            "build_rows_per_s": round(n_rows / t_build, 1),
            "pip_wall_s": round(t_pip, 3),
            "pip_rows_per_s": round(n_rows / t_pip, 1)}


def main():
    if "--prep" in sys.argv:
        prep()
        return
    if "--leg" in sys.argv:
        i = sys.argv.index("--leg")
        cpus = int(sys.argv[i + 1])
        half = sys.argv[i + 2]
        half = None if half == "all" else int(half)
        print(json.dumps(run_leg(cpus, half)))
        return

    if not os.path.isdir(EVENTS):
        prep()
        time.sleep(30)      # let the prep's page churn settle

    def spawn(cores: str, cpus: int, half: str):
        cmd = [sys.executable, os.path.abspath(__file__),
               "--leg", str(cpus), half]
        if os.path.exists("/usr/bin/taskset"):
            cmd = ["taskset", "-c", cores] + cmd
        return subprocess.Popen(cmd, stdout=subprocess.PIPE,
                                stderr=subprocess.PIPE, text=True)

    def leg_result(p):
        out, err = p.communicate()
        lines = [l for l in out.splitlines() if l.startswith("{")]
        if p.returncode != 0 or not lines:
            sys.stderr.write(err[-4000:])
            raise SystemExit(f"leg failed rc={p.returncode}")
        return json.loads(lines[-1])

    out = {}
    # single 16-core JVM, full input (the per-executor anchor)
    out["single_jvm_16c"] = leg_result(spawn("0-15", 16, "all"))
    time.sleep(30)
    # single 32-thread JVM, full input (the fat-JVM contrast point)
    out["single_jvm_32t"] = leg_result(spawn("0-31", 32, "all"))
    time.sleep(30)
    # two concurrent 16-core JVMs, disjoint halves + disjoint cores
    t0 = time.time()
    pa = spawn("0-15", 16, "0")
    pb = spawn("16-31", 16, "1")
    ra = leg_result(pa)
    rb = leg_result(pb)
    wall = time.time() - t0
    dual = {"jvm_a": ra, "jvm_b": rb,
            "wall_s_everything": round(wall, 1)}
    for op in ("build", "pip"):
        combined = ra[f"{op}_rows_per_s"] + rb[f"{op}_rows_per_s"]
        solo = out["single_jvm_16c"][f"{op}_rows_per_s"]
        dual[f"combined_{op}_rows_per_s"] = round(combined, 1)
        dual[f"{op}_executor_doubling_eff"] = round(
            combined / (2 * solo), 3) if solo else None
    out["dual_jvm_16c_each"] = dual
    print(json.dumps({"build_pip_multijvm": out}))


if __name__ == "__main__":
    main()
