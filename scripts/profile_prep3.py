#!/usr/bin/env python
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F
from spatialsketch_spark.config import SketchConfig, get_spark
from spatialsketch_spark.gate import MIN_LEVEL, N, POLYGONS
from spatialsketch_spark.geo.build import SketchStore
from spatialsketch_spark.geo.events import ITEM_DOMAIN
from spatialsketch_spark.geo.query import (QuerySpec, RESULT_SCHEMA,
                                           SpatialSketchEngine,
                                           _additive_estimator)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("profile-prep3", cpus=32, shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
spark.range(0, 32000, 1, 32).mapInPandas(
    lambda it: (p for p in it), "id long").write.format("noop").mode("overwrite").save()
from bench import replicated_events
ev = replicated_events(spark, SF_DIR, N, 20).cache(); ev.count()
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
spark.conf.set("spark.sql.adaptive.enabled", "false")
_ = eng.query(mk_queries(999)[:6]).collect()
for trial in range(3):
    qs = mk_queries(trial * 13 + 3)
    t0 = time.time()
    m_all = eng._matched(qs)
    m = m_all.where(F.col("qkind").isin(["freq", "count"])).select(
        "qid", "coverage", "qkind", "item", "item_end", "t0", "val_sum",
        F.when(F.col("qkind") == "count", F.lit(None))
        .otherwise(F.col("payload")).alias("payload"))
    partial = m.mapInPandas(
        _additive_estimator(store.cfg, store.kind, with_counts=True),
        schema=RESULT_SCHEMA)
    t_build = time.time() - t0
    t0 = time.time()
    partial._jdf.queryExecution().executedPlan()
    t_plan = time.time() - t0
    t0 = time.time(); rows = partial.collect(); t_exec1 = time.time() - t0
    t0 = time.time(); rows = partial.collect(); t_exec2 = time.time() - t0
    print(f"trial={trial}: build={t_build:.3f} plan={t_plan:.3f} "
          f"exec1={t_exec1:.3f} exec2={t_exec2:.3f}", flush=True)
spark.stop()
