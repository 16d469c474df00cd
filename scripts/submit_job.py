#!/usr/bin/env python
"""spark-submit entry point (north_rule packaging path).

    spark-submit --master local[8] \
        --py-files dist/spatialsketch_spark.zip \
        scripts/submit_job.py --sf-dir /root/testdata/sf0.001 \
        --store /tmp/sketch_store

Builds (or resumes from) the sketch store and answers the fixture
polygon counts; prints one JSON line. The package arrives via
--py-files only — this script must not rely on the repo being on the
PYTHONPATH of the executors.
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--store", default=None,
                    help="persisted store path (enables resume)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    spark = SparkSession.builder.appName("spatialsketch-submit").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from spatialsketch_spark.config import SketchConfig
    from spatialsketch_spark.gate import MIN_LEVEL, N, POLYGONS
    from spatialsketch_spark.geo.build import SketchStore
    from spatialsketch_spark.geo.events import ITEM_DOMAIN, derive_geo_events
    from spatialsketch_spark.geo.query import QuerySpec, SpatialSketchEngine

    t0 = time.time()
    cfg = SketchConfig.exact_mode(item_domain=ITEM_DOMAIN, n=N)
    ev = derive_geo_events(spark, args.sf_dir, N)
    if args.store:
        store = SketchStore.build_or_load(spark, ev, cfg, "exact",
                                          MIN_LEVEL, args.store)
    else:
        store = SketchStore.build(spark, ev, cfg, "exact", MIN_LEVEL)
    eng = SpatialSketchEngine(store)
    qs = [QuerySpec.from_shape(i, p, "count")
          for i, p in enumerate(POLYGONS)]
    rows = {int(r["qid"]): int(r["est"])
            for r in eng.query(qs).orderBy("qid").collect()}
    print(json.dumps({
        "polygon_counts": rows,
        "sketch_cells": store.manifest.get("metrics", {}).get("sketch_cells"),
        "resumed": store.manifest.get("metrics", {}).get(
            "build_wall_s") is not None,
        "wall_s": round(time.time() - t0, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
