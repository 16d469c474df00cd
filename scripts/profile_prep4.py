#!/usr/bin/env python
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from spatialsketch_spark.config import SketchConfig, get_spark
from spatialsketch_spark.gate import MIN_LEVEL, N, POLYGONS
from spatialsketch_spark.geo.build import SketchStore
from spatialsketch_spark.geo.events import ITEM_DOMAIN
from spatialsketch_spark.geo.query import QuerySpec, SpatialSketchEngine
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("profile-prep4", cpus=32, shuffle_partitions=32)
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
eng.query_values(mk_queries(999)[:6])
best = 1e9
for trial in range(5):
    qs = mk_queries(trial * 7 + 2)
    t0 = time.time()
    out = eng.query_values(qs)
    dt = time.time() - t0
    best = min(best, dt)
    print(f"trial={trial}: {dt:.3f}s ({600/dt:.0f} q/s)", flush=True)
    if trial == 0:
        want = {int(r["qid"]): int(r["est"]) for r in eng.query(qs).collect()}
        print("  equality:", "OK" if want == out else "MISMATCH", flush=True)
print(f"best: {best:.3f}s = {600/best:.0f} q/s")
spark.stop()
