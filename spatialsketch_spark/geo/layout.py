"""Z-order (Morton) data layout — the standard lakehouse clustering
primitive for spatial data (Delta/Iceberg `ZORDER BY`-class): map each
event's (x, y) grid cell to its Morton code so that sorting or
range-bucketing by the code stores spatially-near events together,
turning rectangle queries into a handful of contiguous scan ranges
instead of a full-table read.

The reference engine has no layout surface at all (single-process,
whole-stream in memory); at 100 TB the layout IS the difference
between a partition-pruned scan and touching every file, which is why
this ships as a first-class gated operator.

Everything is integer arithmetic shared bit-for-bit with the DuckDB
oracle: the bit interleave is the classic parallel bit-spread (four
mask-and-shift stages per coordinate, shifts expressed as multiplies
by powers of two so the same arithmetic runs on both engines), fully
inside whole-stage codegen — no UDF, no shuffle before the final
per-bucket aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .events import derive_geo_events, geo_events_sql

# Parallel bit-spread masks (public-domain Morton-code construction,
# e.g. Stanford Bit Twiddling Hacks): after the four stages a 12-bit
# coordinate occupies the even bit positions of a 24-bit word.
_SPREAD = [(256, 0x00FF00FF), (16, 0x0F0F0F0F),
           (4, 0x33333333), (2, 0x55555555)]

ZORDER_BITS = 12          # grid is N=4096
DEFAULT_BUCKETS = 64


def zorder_col(x, y):
    """Morton code of two grid coordinates as a codegen Column."""
    def spread(v):
        for mul, mask in _SPREAD:
            v = v.bitwiseOR(v * mul).bitwiseAND(F.lit(mask))
        return v
    return spread(x).bitwiseOR(spread(y) * 2)


def zorder_layout(geo: DataFrame,
                  buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    """Range-bucket the event stream by Morton code: bucket = the top
    log2(buckets) interleaved bits, which is EXACTLY a square spatial
    block (for 64 buckets on a 4096 grid: the (x div 512, y div 512)
    block) — the locality property pytest pins. One map-side pass plus
    one ≤`buckets`-group aggregation.

    -> (bucket, n_events, z_min, z_max)."""
    if buckets & (buckets - 1) or buckets <= 0:
        raise ValueError("buckets must be a power of two")
    width = (1 << (2 * ZORDER_BITS)) // buckets
    return (geo.withColumn("zval", zorder_col(F.col("x"), F.col("y")))
            .withColumn("bucket", F.expr(f"zval div {width}"))
            .groupBy("bucket")
            .agg(F.count("*").cast("bigint").alias("n_events"),
                 F.min("zval").cast("bigint").alias("z_min"),
                 F.max("zval").cast("bigint").alias("z_max")))


def q_zorder_layout(spark: SparkSession, sf_dir: str, n: int,
                    buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    return zorder_layout(derive_geo_events(spark, sf_dir, n),
                         buckets).orderBy("bucket")


def _spread_sql(v: str) -> str:
    for mul, mask in _SPREAD:
        v = f"((({v}) | ({v}) * {mul}) & {mask})"
    return v


def oracle_zorder_layout(n: int,
                         buckets: int = DEFAULT_BUCKETS) -> str:
    width = (1 << (2 * ZORDER_BITS)) // buckets
    return f"""
WITH geo AS ({geo_events_sql(n)}),
z AS (SELECT ({_spread_sql('x')} | {_spread_sql('y')} * 2) AS zval
      FROM geo)
SELECT CAST(zval // {width} AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MIN(zval) AS BIGINT) AS z_min,
       CAST(MAX(zval) AS BIGINT) AS z_max
FROM z GROUP BY 1 ORDER BY 1
"""


def _spread_py(v: int) -> int:
    for mul, mask in _SPREAD:
        v = (v | v * mul) & mask
    return v


def zorder_rect_buckets(x1: int, y1: int, x2: int, y2: int,
                        buckets: int = DEFAULT_BUCKETS) -> list[int]:
    """Reader-side rewrite for a z-ordered layout: the bucket ids a
    rectangle query touches (each bucket is one square spatial block,
    so this is just the Morton codes of the overlapped block range).
    Appending `bucket IN (...)` to the rect predicate turns the scan
    into static partition pruning — only the matching partitions of a
    bucket-partitioned table are listed and read, which is the entire
    point of the layout at 100 TB. Pure driver arithmetic, O(#blocks
    overlapped)."""
    import math
    side = int(math.isqrt(buckets))
    if side * side != buckets:
        raise ValueError("buckets must be a perfect square")
    blk = (1 << ZORDER_BITS) // side
    out = set()
    for bx in range(int(x1) // blk, int(x2) // blk + 1):
        for by in range(int(y1) // blk, int(y2) // blk + 1):
            out.add(_spread_py(bx) | (_spread_py(by) << 1))
    return sorted(out)
