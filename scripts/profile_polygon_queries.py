#!/usr/bin/env python
"""Decompose the headline polygon_queries wall at sf0.1 into: driver
cover expansion, Arrow createDataFrame, broadcast materialization, and
per-class consumer jobs — evidence for the batch fixed-cost floor and
for targeting the right component (VERDICT r4 task 3)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from spatialsketch_spark.config import SketchConfig, get_spark  # noqa: E402
from spatialsketch_spark.gate import MIN_LEVEL, N, POLYGONS  # noqa: E402
from spatialsketch_spark.geo.build import SketchStore  # noqa: E402
from spatialsketch_spark.geo.events import ITEM_DOMAIN  # noqa: E402
from spatialsketch_spark.geo.query import QuerySpec, SpatialSketchEngine  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_PLACEMENTS = int(os.environ.get("BENCH_PLACEMENTS", "100"))

from bench import replicated_events  # noqa: E402

spark = get_spark("profile", cpus=32, shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
spark.range(0, 32000, 1, 32).mapInPandas(
    lambda it: (p for p in it), "id long").write.format("noop").mode("overwrite").save()

ev = replicated_events(spark, SF_DIR, N, 20).cache()
n = ev.count()
cfg = SketchConfig.realistic(n=N, eps=0.1, delta=0.05, item_domain=ITEM_DOMAIN)
store = SketchStore.build(spark, ev, cfg, "cm", MIN_LEVEL, mode="zorder")
eng = SpatialSketchEngine(store)

queries = []
qid = 0
for i in range(N_PLACEMENTS):
    for p_idx, poly in enumerate(POLYGONS):
        dx = ((i * 997 + p_idx * 131) % 64) * 16
        dy = ((i * 641 + p_idx * 313) % 64) * 16
        item = (i * 7 + p_idx) % ITEM_DOMAIN
        queries.append(QuerySpec.from_shape(qid, poly, "count", x_off=dx, y_off=dy)); qid += 1
        queries.append(QuerySpec.from_shape(qid, poly, "freq", item=item, x_off=dx, y_off=dy)); qid += 1

eng.query(queries[:6]).collect()   # warm

for trial in range(3):
    t0 = time.time()
    cov_df = eng._matched(queries)
    t_cover_df = time.time() - t0   # matched-plan assembly (incl. cover)

    # separate: numpy expansion alone
    from spatialsketch_spark.core.dyadic import cover_2d_np
    t0 = time.time()
    rects, meta = [], []
    for q in queries:
        for r in q.ranges:
            rects.append(r)
    out = cover_2d_np(rects, cfg.levels - 1, store.min_level)
    t_np = time.time() - t0
    n_cover = len(out[0])

    t0 = time.time()
    res = eng.query(queries).collect()
    t_total = time.time() - t0

    counts_only = [q for q in queries if q.qkind == "count"]
    t0 = time.time()
    eng.query(counts_only).collect()
    t_counts = time.time() - t0

    freq_only = [q for q in queries if q.qkind == "freq"]
    t0 = time.time()
    eng.query(freq_only).collect()
    t_freq = time.time() - t0

    print(f"trial={trial} cover_rows={n_cover} t_np={t_np:.3f} "
          f"t_cover_df={t_cover_df:.3f} t_total={t_total:.3f} "
          f"t_counts_only={t_counts:.3f} t_freq_only={t_freq:.3f} "
          f"qps={len(queries)/t_total:.1f}", flush=True)

spark.stop()
