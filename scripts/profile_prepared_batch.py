#!/usr/bin/env python
"""Decompose the FRESH-600-query batch floor and A/B the prepared-batch
candidates (VERDICT r4 task 2): AQE off for probe plans, driver-side
partial folding (skip groupBy shuffle + qid-fill join), both."""
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from spatialsketch_spark.config import SketchConfig, get_spark  # noqa: E402
from spatialsketch_spark.gate import MIN_LEVEL, N, POLYGONS  # noqa: E402
from spatialsketch_spark.geo.build import SketchStore  # noqa: E402
from spatialsketch_spark.geo.events import ITEM_DOMAIN  # noqa: E402
from spatialsketch_spark.geo.query import (QuerySpec, RESULT_SCHEMA,  # noqa: E402
                                           SpatialSketchEngine,
                                           _additive_estimator)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("profile-prep", cpus=32, shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
spark.range(0, 32000, 1, 32).mapInPandas(
    lambda it: (p for p in it), "id long").write.format("noop").mode("overwrite").save()

from bench import replicated_events  # noqa: E402
ev = replicated_events(spark, SF_DIR, N, 20).cache()
ev.count()
cfg = SketchConfig.realistic(n=N, eps=0.1, delta=0.05, item_domain=ITEM_DOMAIN)
store = SketchStore.build(spark, ev, cfg, "cm", MIN_LEVEL, mode="zorder")
eng = SpatialSketchEngine(store)

def mk_queries(seed):
    queries, qid = [], 0
    for i in range(100):
        for p_idx, poly in enumerate(POLYGONS):
            dx = ((i * 997 + p_idx * 131 + seed * 37) % 64) * 16
            dy = ((i * 641 + p_idx * 313 + seed * 53) % 64) * 16
            item = (i * 7 + p_idx + seed) % ITEM_DOMAIN
            queries.append(QuerySpec.from_shape(qid, poly, "count", x_off=dx, y_off=dy)); qid += 1
            queries.append(QuerySpec.from_shape(qid, poly, "freq", item=item, x_off=dx, y_off=dy)); qid += 1
    return queries

def arm_baseline(qs):
    return {r["qid"]: r["est"] for r in eng.query(qs).collect()}

def arm_driverfold(qs):
    m_all = eng._matched(qs)
    m = m_all.where(F.col("qkind").isin(["freq", "count"])).select(
        "qid", "coverage", "qkind", "item", "item_end", "t0", "val_sum",
        F.when(F.col("qkind") == "count", F.lit(None))
        .otherwise(F.col("payload")).alias("payload"))
    partial = m.mapInPandas(
        _additive_estimator(store.cfg, store.kind, with_counts=True),
        schema=RESULT_SCHEMA)
    sums = defaultdict(int)
    for r in partial.collect():
        sums[r["qid"]] += r["est"]
    return {q.qid: sums.get(q.qid, 0) for q in qs}

def with_aqe(flag, fn, qs):
    old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", str(flag).lower())
    try:
        return fn(qs)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)

arms = {
    "base_aqe": lambda qs: with_aqe(True, arm_baseline, qs),
    "base_noaqe": lambda qs: with_aqe(False, arm_baseline, qs),
    "fold_aqe": lambda qs: with_aqe(True, arm_driverfold, qs),
    "fold_noaqe": lambda qs: with_aqe(False, arm_driverfold, qs),
}
# warm
_ = arms["base_aqe"](mk_queries(999)[:6])
ref = None
best = {k: 1e9 for k in arms}
for trial in range(4):
    for name, fn in arms.items():
        qs = mk_queries(trial * 10 + hash(name) % 7)
        t0 = time.time()
        out = fn(qs)
        dt = time.time() - t0
        best[name] = min(best[name], dt)
        print(f"trial={trial} {name}: {dt:.3f}s  ({600/dt:.0f} q/s)", flush=True)
        # cross-check answers between arms on the same seed set
        chk = arm_baseline(qs) if name != "base_aqe" and trial == 0 else None
        if chk is not None and chk != out:
            print(f"  !! MISMATCH vs baseline in {name}")
print({k: round(v, 3) for k, v in best.items()},
      {k: round(600 / v) for k, v in best.items()})
spark.stop()
