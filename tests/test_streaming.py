"""Structured-Streaming sketch ingestion: incremental file-source
micro-batches -> append-only sketch partials -> queries match the batch
oracle at every point; compaction changes nothing."""

import pytest
from pyspark.sql import functions as F

from spatialsketch_spark.config import SketchConfig
from spatialsketch_spark.geo.events import ITEM_DOMAIN, derive_geo_events
from spatialsketch_spark.geo.query import QuerySpec, SpatialSketchEngine
from spatialsketch_spark.streaming.sketch_stream import StreamingSketch

from conftest import SF_UNIT

N = 64
EVENT_SCHEMA = "ts BIGINT, item BIGINT, x BIGINT, y BIGINT, value BIGINT"


def truth(events, item=None):
    df = events.filter(F.col("x").between(0, 63) & F.col("y").between(0, 63))
    if item is not None:
        df = df.filter(F.col("item") == item)
    return df.count()


@pytest.mark.parametrize("compact", [False, True])
def test_streaming_matches_batch(spark, tmp_path, compact):
    ev = derive_geo_events(spark, SF_UNIT, N).cache()
    first = ev.filter(F.col("ts") < 500)
    second = ev.filter(F.col("ts") >= 500)

    src = str(tmp_path / "stream_src")
    first.write.mode("overwrite").parquet(src)

    cfg = SketchConfig.exact_mode(item_domain=ITEM_DOMAIN, n=N)
    ss = StreamingSketch(spark, cfg, "exact", 0, str(tmp_path / "sk"))
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    q = ss.start(stream)
    q.awaitTermination(120)

    eng = SpatialSketchEngine(ss.as_store())
    full = [(0, 0, 63, 63)]
    got = eng.query([QuerySpec(0, full, "count")]).collect()[0]["est"]
    assert got == first.count()

    # append more files -> incremental micro-batch picks up only new data
    second.write.mode("append").parquet(src)
    q2 = ss.start(spark.readStream.schema(EVENT_SCHEMA).parquet(src))
    q2.awaitTermination(120)

    if compact:
        ss.compact()
        # exactly one row per cell after compaction
        dup = (ss.sketch_df().groupBy("grid_key", "cell").count()
               .where("count > 1").count())
        assert dup == 0

    eng = SpatialSketchEngine(ss.as_store())
    qs = [QuerySpec(0, full, "count"),
          QuerySpec(1, full, "freq", item=3),
          QuerySpec(2, [(8, 8, 40, 40)], "distinct"),
          QuerySpec(3, full, "window", item=3, t0=700)]
    got = {r["qid"]: r["est"] for r in eng.query(qs).collect()}
    assert got[0] == ev.count()
    assert got[1] == truth(ev, 3)
    reg = ev.filter(F.col("x").between(8, 40) & F.col("y").between(8, 40))
    assert got[2] == reg.select("item").distinct().count()
    assert got[3] == ev.filter((F.col("item") == 3)
                               & (F.col("ts") >= 700)).count()
