"""N-vs-4N scaling evidence for the sequence-packing operator.

The polygon-query phase of `bench.py --scaling` is fixed-cost-floor
bound and the build phase is DRAM-ceiling bound (BASELINE.md); sequence
packing is the third regime — a window-sort + codegen-tokenize pipeline
(shuffle-bound with JVM compute), i.e. the shape most curation ops at
100 TB actually have. This script replicates the sf0.1 documents table
R× (deterministic re-keying), runs the fused tokenize→pack plan with a
FIXED shard count (identical logical job at both parallelism levels),
and reports rows/s at local[8] (taskset-pinned) vs local[32].

Usage:  python scripts/scaling_packing.py            # both legs + efficiency
        python scripts/scaling_packing.py --cpus 8   # one leg (subprocess mode)
"""

import json
import os
import subprocess
import sys
import time

REP = int(os.environ.get("PACK_REP", "300"))
SEQ_LEN = 1024
SHARDS = 64          # fixed across legs: same logical job, 5 langs x 64
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_leg(cpus: int) -> dict:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from pyspark.sql import functions as F

    from spatialsketch_spark.config import get_spark
    from spatialsketch_spark.pipeline import packing
    from spatialsketch_spark.pipeline.dedup import norm_text_col

    spark = get_spark(cpus=cpus)
    spark.conf.set("spark.sql.shuffle.partitions", str(cpus * 4))
    # a ~200 MB shuffle at the 64 MB default advisory size would let
    # AQE coalesce the window stage to ~3 tasks — fine at cluster
    # scale, under-parallelized for a measurement this small
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
                   "2m")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # replicate via per-partition explode (distributed from the first
    # stage — a crossJoin against range() would stream the whole
    # replication out of the source's single parquet partition, a
    # serial stage that Amdahl-caps the measurement)
    big = (docs.repartition(cpus * 4)
           .withColumn("rep", F.explode(F.sequence(F.lit(0),
                                                   F.lit(REP - 1))))
           .withColumn("doc_id", F.col("doc_id") * REP + F.col("rep"))
           .select("doc_id", "lang", "text"))
    # fused plan: tokenize inline (the scale-correct shape — no second
    # pass over the text, no join)
    d = big.withColumn(
        "n_tokens",
        F.size(F.split(norm_text_col(F.col("text")), " ")).cast("bigint"))
    packed = packing.pack_sequences(
        d.select("doc_id", "lang", "n_tokens"), SEQ_LEN, "n_tokens",
        ["lang"], shards=SHARDS)
    n_rows = docs.count() * REP
    # JIT/codegen warm pass on a slice
    packed.limit(1).write.format("noop").mode("overwrite").save()
    best = None
    for _ in range(2):
        t0 = time.time()
        packed.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    spark.stop()
    return {"cpus": cpus, "rows": n_rows, "wall_s": round(best, 3),
            "rows_per_s": round(n_rows / best, 1)}


def main():
    if "--cpus" in sys.argv:
        cpus = int(sys.argv[sys.argv.index("--cpus") + 1])
        print(json.dumps(run_leg(cpus)))
        return
    results = {}
    for cpus in (8, 32):
        if results:
            time.sleep(45)
        cmd = [sys.executable, os.path.abspath(__file__), "--cpus",
               str(cpus)]
        if os.path.exists("/usr/bin/taskset"):
            cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
        out = subprocess.run(cmd, capture_output=True, text=True,
                             check=True)
        line = [l for l in out.stdout.splitlines()
                if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
    eff = (results[32]["rows_per_s"] / results[8]["rows_per_s"]) / 4.0
    print(json.dumps({"packing_scaling": {
        "cpus_8": results[8], "cpus_32": results[32],
        "pack_scaling_efficiency_8_to_32": round(eff, 3)}}))


if __name__ == "__main__":
    main()
