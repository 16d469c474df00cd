"""Z-order layout operator (geo/layout.py)."""

from pyspark.sql import functions as F

from conftest import SF_UNIT


def test_zorder_bucket_is_spatial_block(spark):
    """The locality contract: with 64 buckets on the 4096 grid, an
    event's bucket is EXACTLY the Morton code of its (x div 512,
    y div 512) block — range-bucketing by zval therefore stores each
    512×512 spatial block contiguously, which is what turns a
    rectangle query into a handful of contiguous scan ranges at
    100 TB."""
    from spatialsketch_spark.gate import N
    from spatialsketch_spark.geo.events import derive_geo_events
    from spatialsketch_spark.geo.layout import zorder_col

    geo = derive_geo_events(spark, SF_UNIT, N, spread=False)
    width = (1 << 24) // 64
    bad = (geo.withColumn("zval", zorder_col(F.col("x"), F.col("y")))
           .withColumn("bucket", F.expr(f"zval div {width}"))
           .withColumn("blk", zorder_col(F.expr("x div 512"),
                                         F.expr("y div 512")))
           .where(F.col("bucket") != F.col("blk")).count())
    assert bad == 0


def test_zorder_layout_prunes_partitions(spark, tmp_path):
    """The 100 TB claim made concrete: write the events bucket-
    partitioned by Morton block, rewrite a rectangle query with
    `zorder_rect_buckets` (bucket IN (...) + the residual rect
    predicate), and the scan must (a) show the bucket predicate as a
    PartitionFilter — static partition pruning, only matching
    directories listed/read — and (b) return exactly the full-scan
    answer."""
    from spatialsketch_spark.gate import N
    from spatialsketch_spark.geo.events import derive_geo_events
    from spatialsketch_spark.geo.layout import (zorder_col,
                                                zorder_rect_buckets)

    geo = derive_geo_events(spark, SF_UNIT, N, spread=False)
    width = (1 << 24) // 64
    out = str(tmp_path / "zsorted")
    (geo.withColumn("zval", zorder_col(F.col("x"), F.col("y")))
        .withColumn("bucket", F.expr(f"zval div {width}"))
        .drop("zval")
        .write.partitionBy("bucket").mode("overwrite").parquet(out))
    t = spark.read.parquet(out)
    x1, y1, x2, y2 = 700, 900, 1800, 2600
    rect = (F.col("x").between(x1, x2) & F.col("y").between(y1, y2))
    bks = zorder_rect_buckets(x1, y1, x2, y2)
    assert 0 < len(bks) < 64
    pruned = t.where(F.col("bucket").isin(bks) & rect)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan.split(
        "PartitionFilters", 1)[1][:200]
    assert pruned.count() == t.where(rect).count()


def test_zorder_codegen_no_python_stage(spark):
    from spatialsketch_spark.gate import N
    from spatialsketch_spark.geo.layout import q_zorder_layout

    p = q_zorder_layout(spark, SF_UNIT, N)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
