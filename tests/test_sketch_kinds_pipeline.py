"""Realistic (lossy) sketch kinds through the full Spark pipeline:
CM / FM / BF / ECM / dyadic-CM stores built by the same build path,
queried through the same cover machinery, asserting the reference's
error envelopes (Tech Report Table 3 classes)."""

import pytest
from pyspark.sql import functions as F

from spatialsketch_spark.config import SketchConfig
from spatialsketch_spark.geo.build import SketchStore
from spatialsketch_spark.geo.events import ITEM_DOMAIN, derive_geo_events
from spatialsketch_spark.geo.query import QuerySpec, SpatialSketchEngine

from conftest import SF_UNIT

N = 64
RNG = [(8, 8, 55, 40)]


@pytest.fixture(scope="module")
def events(spark):
    return derive_geo_events(spark, SF_UNIT, N).cache()


def region(events):
    return events.filter(F.col("x").between(8, 55) & F.col("y").between(8, 40))


def test_fm_distinct_envelope(spark, events):
    cfg = SketchConfig.realistic(n=N, eps=0.4, delta=0.05,
                                 item_domain=ITEM_DOMAIN)
    store = SketchStore.build(spark, events, cfg, "fm", 0)
    eng = SpatialSketchEngine(store)
    est = eng.query([QuerySpec(0, RNG, "distinct")]).collect()[0]["est"]
    truth = region(events).select("item").distinct().count()
    assert 0.25 * truth <= est <= 4.0 * truth  # FM powers-of-2 envelope


def test_bf_membership_no_false_negatives(spark, events):
    cfg = SketchConfig.realistic(n=N, eps=0.1, delta=0.05,
                                 item_domain=ITEM_DOMAIN)
    store = SketchStore.build(spark, events, cfg, "bf", 0)
    eng = SpatialSketchEngine(store)
    present = [r["item"] for r in
               region(events).select("item").distinct().limit(10).collect()]
    qs = [QuerySpec(i, RNG, "member", item=int(it))
          for i, it in enumerate(present)]
    got = {r["qid"]: r["est"] for r in eng.query(qs).collect()}
    assert all(got[i] == 1 for i in range(len(present))), "BF false negative"


def test_cm_l2_pipeline(spark, events):
    cfg = SketchConfig.realistic(n=N, eps=0.02, delta=0.01,
                                 item_domain=ITEM_DOMAIN)
    store = SketchStore.build(spark, events, cfg, "cm", 0)
    eng = SpatialSketchEngine(store)
    est = eng.query([QuerySpec(0, RNG, "l2")]).collect()[0]["est"]
    truth = (region(events).groupBy("item").agg(F.sum("value").alias("c"))
             .agg(F.sum(F.col("c") * F.col("c"))).collect()[0][0])
    assert est >= truth
    assert est <= 2.0 * truth


def test_ecm_window_pipeline(spark, events):
    cfg = SketchConfig.realistic(n=N, eps=0.2, delta=0.2, ecm_eps=0.125,
                                 item_domain=ITEM_DOMAIN)
    store = SketchStore.build(spark, events, cfg, "ecm", 3)
    eng = SpatialSketchEngine(store)
    item = region(events).groupBy("item").count() \
        .orderBy(F.desc("count")).first()["item"]
    aligned = [(8, 8, 55, 47)]
    # align the region to the min_level=3 blocks for pure window error
    qs = [QuerySpec(0, [(8, 8, 55, 47)], "window", item=int(item), t0=0),
          QuerySpec(1, [(8, 8, 55, 47)], "window", item=int(item), t0=500)]
    got = {r["qid"]: r["est"] for r in eng.query(qs).collect()}
    t_all = events.filter(
        F.col("x").between(8, 55) & F.col("y").between(8, 47)
        & (F.col("item") == item))
    truth0 = t_all.count()
    truth1 = t_all.filter(F.col("ts") >= 500).count()
    assert got[0] >= truth0          # CM-style overestimate
    assert got[0] <= truth0 + 0.35 * events.count()
    assert abs(got[1] - truth1) <= max(4, 0.5 * got[0])


def test_dcm_item_range_pipeline(spark, events):
    cfg = SketchConfig(n=N, eps=0.1, delta=0.05, item_domain=ITEM_DOMAIN,
                       dcm_exact_levels=9)   # all-exact levels -> exact
    store = SketchStore.build(spark, events, cfg, "dcm", 0)
    eng = SpatialSketchEngine(store)
    qs = [QuerySpec(0, RNG, "range_freq", item=10, item_end=30),
          QuerySpec(1, RNG, "range_freq", item=0, item_end=255)]
    got = {r["qid"]: r["est"] for r in eng.query(qs).collect()}
    t = region(events)
    assert got[0] == t.filter(F.col("item").between(10, 30)).count()
    assert got[1] == t.count()


def test_elastic_freq_pipeline(spark, events):
    """B9 analogue end-to-end: an 'elastic' store built by the same
    build path answers region+item frequency with the heavy/light
    composition — never underestimating, and validated against CM at
    the same budget in test_kernels."""
    cfg = SketchConfig.realistic(n=N, eps=0.1, delta=0.05,
                                 item_domain=ITEM_DOMAIN)
    store = SketchStore.build(spark, events, cfg, "elastic", 0)
    eng = SpatialSketchEngine(store)
    items = [3, 17, 42, 200]
    qs = [QuerySpec(i, RNG, "freq", item=it) for i, it in enumerate(items)]
    got = {r["qid"]: r["est"] for r in eng.query(qs).collect()}
    n_stream = events.count()
    for i, it in enumerate(items):
        truth = (region(events).filter(F.col("item") == it)
                 .agg(F.sum("value")).collect()[0][0]) or 0
        assert got[i] >= truth, (it, got[i], truth)
        assert got[i] - truth <= 0.5 * n_stream
    # count queries remain exact (val_sum path, kernel-independent)
    cnt = eng.query([QuerySpec(9, RNG, "count")]).collect()[0]["est"]
    assert cnt == region(events).agg(F.sum("value")).collect()[0][0]
    # dispatch validation: unsupported kinds rejected for this store
    import pytest as _pytest
    with _pytest.raises(ValueError):
        eng.query([QuerySpec(0, RNG, "distinct")])
