"""Synthetic generators (determinism, distribution shape), query-set
generation + golden cache roundtrip, error-metric operators, and the
reservoir-sampling accuracy baseline (reference C13, kept as a
~20-line test baseline per SURVEY.md §7)."""

import pytest
from pyspark.sql import functions as F

from spatialsketch_spark.core.partitioner import rect_shape
from spatialsketch_spark.geo.metrics import (
    error_metrics, membership_confusion, summarize_errors,
)
from spatialsketch_spark.geo.queryset import (
    generate_query_set, read_query_cache, write_query_cache,
)
from spatialsketch_spark.sources.synthetic import (
    uniform_stream, zipf_stream, quantize_lonlat,
)


def test_uniform_stream_determinism(spark):
    a = uniform_stream(spark, 5000, n=64, item_domain=100, seed=1,
                       parallelism=4).collect()
    b = uniform_stream(spark, 5000, n=64, item_domain=100, seed=1,
                       parallelism=16).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    xs = [r["x"] for r in a]
    assert 0 <= min(xs) and max(xs) <= 63
    # roughly uniform: every quartile populated
    for lo in (0, 16, 32, 48):
        assert sum(lo <= v < lo + 16 for v in xs) > 800


def test_zipf_stream_skew(spark):
    df = zipf_stream(spark, 20000, n=64, item_domain=10000, alpha=1.3,
                     seed=2, zipf_axes="item")
    top = (df.groupBy("item").count().orderBy(F.desc("count"))
           .limit(1).collect()[0])
    assert top["item"] == 0          # rank-1 item dominates
    assert top["count"] > 2000       # heavy head (zipf 1.3)


def test_quantize_lonlat(spark):
    df = spark.createDataFrame([(-180.0, -90.0), (0.0, 0.0), (179.9, 89.9)],
                               "longitude DOUBLE, latitude DOUBLE")
    q = quantize_lonlat(df, n=4096).collect()
    assert (q[0]["x"], q[0]["y"]) == (0, 0)
    assert q[1]["x"] == 2047
    assert q[2]["x"] == 4093 and q[2]["y"] == 4092  # floor of fractional cell


def test_query_set_generation_and_cache(spark, tmp_path):
    ev = uniform_stream(spark, 20000, n=64, item_domain=50, seed=3).cache()
    shape = rect_shape(-0.5, -0.5, 31.5, 31.5, n=64)
    shape.max_x_offset = 32
    shape.max_y_offset = 32
    recs = generate_query_set(ev, shape, n_queries=20, min_gt=1)
    assert len(recs) == 20
    for r in recs:
        assert r.groundtruth >= 1
        assert r.l1 >= r.groundtruth
        assert r.n_stream == 20000
        # verify one record's ground truth against Spark SQL
    r = recs[0]
    truth = ev.filter(
        F.col("x").between(r.x_offset, r.x_offset + 31)
        & F.col("y").between(r.y_offset, r.y_offset + 31)
        & (F.col("item") == r.item)).count()
    assert truth == r.groundtruth
    p = str(tmp_path / "qs" / "cache.csv")
    write_query_cache(p, recs)
    assert read_query_cache(p) == recs


def test_error_metrics_and_confusion(spark):
    res = spark.createDataFrame(
        [(0, 110, 100, 1000, 10000), (1, 90, 100, 1000, 10000),
         (2, 5, 0, 1000, 10000)],
        "qid LONG, est LONG, groundtruth LONG, l1 LONG, n_stream LONG")
    m = {r["qid"]: r for r in error_metrics(res).collect()}
    assert m[0]["errRel"] == pytest.approx(0.1)
    assert m[1]["errN"] == pytest.approx(0.001)
    assert m[2]["errRel"] is None          # undefined for gt=0
    s = summarize_errors(res)
    assert s["n"] == 3 and s["errL1"] == pytest.approx((10 + 10 + 5) / 3 / 1000)

    conf = membership_confusion(spark.createDataFrame(
        [(1, 1), (1, 0), (0, 1), (0, 0), (1, 1)],
        "est LONG, expected_member LONG"))
    assert conf["tp"] == 2 and conf["fp"] == 1 and conf["fn"] == 1
    assert conf["fpr"] == pytest.approx(0.5)
    assert conf["precision"] == pytest.approx(2 / 3)


def test_reservoir_sampling_baseline(spark):
    """C13 baseline: uniform sample + scaled exact agg approximates the
    sketch answers (ReservoirSampling.cpp:49-62 semantics)."""
    ev = uniform_stream(spark, 50000, n=64, item_domain=20, seed=4).cache()
    frac = 0.1
    sample = ev.sample(fraction=frac, seed=7)
    est = sample.filter(F.col("x").between(0, 31)
                        & (F.col("item") == 5)).count() / frac
    truth = ev.filter(F.col("x").between(0, 31)
                      & (F.col("item") == 5)).count()
    assert abs(est - truth) <= 0.25 * truth + 20
