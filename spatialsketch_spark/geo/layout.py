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
    import math
    side = int(math.isqrt(buckets)) if buckets > 0 else 0
    if buckets <= 0 or side * side != buckets or buckets & (buckets - 1):
        # a non-square power of two (e.g. 32) would make buckets 2:1
        # rectangles — still valid ranges, but the square-block
        # contract documented here and the zorder_rect_buckets reader
        # rewrite both assume squares; require what we promise
        raise ValueError("buckets must be a perfect-square power of "
                         "two (4, 16, 64, 256, ...)")
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
    # strict input validation (ADVICE r6): a reversed rect would
    # silently return [] and, as the documented `bucket IN (...)`
    # reader rewrite, silently read ZERO rows; out-of-grid coords
    # would emit nonexistent bucket ids. Mirror zorder_layout's
    # strictness and fail loudly instead.
    x1, y1, x2, y2 = int(x1), int(y1), int(x2), int(y2)
    if x1 > x2 or y1 > y2:
        raise ValueError(
            f"reversed rect ({x1},{y1})-({x2},{y2}): need x1<=x2, y1<=y2")
    lim = 1 << ZORDER_BITS
    if min(x1, y1) < 0 or max(x2, y2) >= lim:
        raise ValueError(
            f"rect ({x1},{y1})-({x2},{y2}) outside the z-order grid "
            f"[0, {lim})")
    blk = lim // side
    out = set()
    for bx in range(int(x1) // blk, int(x2) // blk + 1):
        for by in range(int(y1) // blk, int(y2) // blk + 1):
            out.add(_spread_py(bx) | (_spread_py(by) << 1))
    return sorted(out)


# 64-bit parallel bit-spread (20-bit coordinate -> even positions of a
# 40-bit word), same construction as _SPREAD one stage wider.
_SPREAD64 = [(1 << 16, 0x0000FFFF0000FFFF), (1 << 8, 0x00FF00FF00FF00FF),
             (16, 0x0F0F0F0F0F0F0F0F), (4, 0x3333333333333333),
             (2, 0x5555555555555555)]

GEOHASH_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"
GEOHASH_BITS = 20          # lon/lat index resolution (2^20 per axis)
GEOHASH_CHARS = 8          # 8 chars x 5 bits = 40 = 2 x 20


def geohash_col(lon_idx, lat_idx):
    """Standard geohash (base32, MSB-first lon/lat bit alternation
    starting with lon) of integer grid indices lon_idx, lat_idx in
    [0, 2^20): 8 characters = the full 40 interleaved bits, so this is
    the exact public geohash of the grid point (pytest pins it against
    a reference bisection encoder). All codegen: two 5-stage bit
    spreads, then one substring lookup per character."""
    def spread(v):
        for mul, mask in _SPREAD64:
            v = v.bitwiseOR(v * mul).bitwiseAND(F.lit(mask))
        return v
    gh = spread(lat_idx).bitwiseOR(spread(lon_idx) * 2)
    chars = [F.substring(F.lit(GEOHASH_B32),
                         (F.shiftright(gh, 35 - 5 * j)
                          .bitwiseAND(F.lit(31)) + 1).cast("int"), 1)
             for j in range(GEOHASH_CHARS)]
    return F.concat(*chars)


def _spread64_sql(v: str) -> str:
    for mul, mask in _SPREAD64:
        v = f"((({v}) | ({v}) * {mul}) & {mask})"
    return v


def geohash_sql(lon_idx: str, lat_idx: str) -> str:
    """The same geohash as ANSI SQL text (DuckDB oracle side)."""
    gh = f"({_spread64_sql(lat_idx)} | {_spread64_sql(lon_idx)} * 2)"
    chars = " || ".join(
        f"substr('{GEOHASH_B32}', "
        f"CAST((({gh} >> {35 - 5 * j}) & 31) + 1 AS INT), 1)"
        for j in range(GEOHASH_CHARS))
    return f"({chars})"


def q_geohash_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geohash rollup gate: events -> the same deterministic integer
    lon/lat indices the spherical gates use (sources/geocells.py
    lonlat_sql multipliers) -> standard 8-char geohash -> per-4-char-
    prefix counts + min/max hash. One map-side pass + one bounded
    aggregation; the geohash itself is pinned against a reference
    bisection encoder in tests/test_layout.py."""
    m = 1 << GEOHASH_BITS
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    kx = F.expr(f"((event_id % {m}) * 2654435761) % {m}")
    ky = F.expr(f"((event_id % {m}) * 2246822519 + user_id * 97) % {m}")
    return (ev.select(geohash_col(kx, ky).alias("gh"))
            .groupBy(F.substring("gh", 1, 4).alias("gh4"))
            .agg(F.count("*").cast("bigint").alias("cnt"),
                 F.min("gh").alias("gh_min"),
                 F.max("gh").alias("gh_max")))


def oracle_geohash_rollup() -> str:
    m = 1 << GEOHASH_BITS
    kx = f"((event_id % {m}) * 2654435761) % {m}"
    ky = f"((event_id % {m}) * 2246822519 + user_id * 97) % {m}"
    gh = geohash_sql(kx, ky)
    return f"""
WITH g AS (SELECT {gh} AS gh FROM events)
SELECT substr(gh, 1, 4) AS gh4, CAST(COUNT(*) AS BIGINT) AS cnt,
       MIN(gh) AS gh_min, MAX(gh) AS gh_max
FROM g GROUP BY 1 ORDER BY 1
"""
