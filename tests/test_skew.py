"""Hot-cell skew stress: Zipf(1.3) coordinates concentrate most events
in a few cells (the reference's Table-4 worst case). Both build modes
must stay correct and agree; the partials mode bounds any single cell's
merge fan-in to #partitions."""

import numpy as np
from pyspark.sql import functions as F

from spatialsketch_spark.config import SketchConfig
from spatialsketch_spark.core.kernels import make_kernel
from spatialsketch_spark.geo.build import SketchStore, build_sketch_df
from spatialsketch_spark.geo.query import QuerySpec, SpatialSketchEngine
from spatialsketch_spark.sources.synthetic import zipf_stream

N = 64


def test_skewed_build_modes_agree_and_answer_exactly(spark):
    ev = zipf_stream(spark, 30000, n=N, item_domain=200, alpha=1.3,
                     seed=11, zipf_axes="item,coord").cache()
    # verify the stream is actually skewed: top cell holds >10% of events
    top = (ev.groupBy("x", "y").count().orderBy(F.desc("count"))
           .first()["count"])
    assert top > 900   # uniform expectation would be ~7 events/cell

    cfg = SketchConfig.exact_mode(item_domain=256, n=N)
    a = build_sketch_df(ev, cfg, "exact", 0, mode="partials")
    b = build_sketch_df(ev, cfg, "exact", 0, mode="zorder")
    k = make_kernel("exact", cfg)
    pa = {(r["grid_key"], r["cell"]): r["payload"] for r in a.collect()}
    pb = {(r["grid_key"], r["cell"]): r["payload"] for r in b.collect()}
    assert pa.keys() == pb.keys()
    for key in list(pa)[:500]:
        sa, sb = k.deserialize(pa[key]), k.deserialize(pb[key])
        np.testing.assert_array_equal(sa["items"], sb["items"])

    store = SketchStore.build(spark, ev, cfg, "exact", 0)
    eng = SpatialSketchEngine(store)
    hot = ev.groupBy("x", "y").count().orderBy(F.desc("count")).first()
    hx, hy = hot["x"], hot["y"]
    got = {r["qid"]: r["est"] for r in eng.query(
        [QuerySpec(0, [(hx, hy, hx, hy)], "count"),
         QuerySpec(1, [(0, 0, N - 1, N - 1)], "freq", item=0)]).collect()}
    assert got[0] == hot["count"]
    assert got[1] == ev.filter(F.col("item") == 0).count()
