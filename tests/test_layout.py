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


def test_zorder_codegen_no_python_stage(spark):
    from spatialsketch_spark.gate import N
    from spatialsketch_spark.geo.layout import q_zorder_layout

    p = q_zorder_layout(spark, SF_UNIT, N)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
