"""Real lat/lon → cell mapping (VERDICT r2 item 4; SURVEY §1.4).

Two mappings, both pure column arithmetic (JVM-side, whole-stage
codegen — no Python in the hot path):

1. ``lonlat_quantize`` — the REFERENCE's planar quantization, exactly
   the formula its data prep applies outside the engine
   (repository/datasets/RealWorld.ipynb:720-721, Tech Report §3):

       x = floor(((lon + 180) / 360) * (N - 1))
       y = floor(((lat +  90) / 180) * (N - 1))

   numpy's ``astype(int)`` truncates toward zero, which equals floor on
   the non-negative normalized range, so ``floor`` is the portable
   spelling (Spark and DuckDB agree bit-for-bit; DuckDB's
   CAST(double AS BIGINT) ROUNDS, so the oracle must also use floor).

2. ``s2ish_cell`` — a documented spherical-cell option for users with
   real global data, where an equirectangular grid distorts badly near
   the poles: an S2-style cube-face quadtree. lon/lat → unit direction
   vector → dominant-axis cube face (6 faces, no polar singularity) →
   gnomonic (u, v) on the face → 2^res × 2^res quadtree cell, bits
   interleaved Morton-style:

       cell_id = face << (2*res) | morton(i, j)

   Hierarchy is pure bit arithmetic: ``cell_parent`` drops 2 bits per
   level, and quantizing directly at res-1 equals the parent of the
   res cell (floor nesting for power-of-two grids) — asserted in
   tests/test_geocells.py. This is the H3/S2 *shape* (hierarchical
   sphere-aware cells with parent/child relations) without vendoring a
   cell library the container doesn't ship.

The synthetic lon/lat stream used by the gate derives EXACT doubles
from integer columns (numerators < 2^53 over power-of-two denominators)
so Spark and DuckDB agree bit-for-bit on every arithmetic step.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

# lon/lat synthesis resolution: 2^20 distinct values per axis — exact
# doubles (k / 2^20 has <= 20 significand bits; * 360 adds <= 9).
_M = 1 << 20

# event_id reduced mod {m} before the multiply: identical values (mod-
# mult compatibility) and the product stays < 2^51 for any event_id —
# the unreduced form would wrap in Spark but raise in DuckDB past
# event_id ~3.5e9, breaking the shared-SQL-text parity.
LONLAT_SQL_TMPL = """
SELECT
  event_id                                                   AS ts,
  user_id                                                    AS item,
  -180.0 + 360.0 * ((((event_id % {m}) * 2654435761) % {m})
                    / {m}.0)                                 AS lon,
  -90.0 + 180.0 * ((((event_id % {m}) * 2246822519
                     + user_id * 97) % {m}) / {m}.0)         AS lat,
  CAST(1 AS BIGINT)                                          AS value
FROM events
"""


def lonlat_sql() -> str:
    """Deterministic synthetic lon/lat stream from the events table —
    the same SQL text runs in Spark SQL and DuckDB (oracle parity)."""
    return LONLAT_SQL_TMPL.format(m=_M)


def derive_lonlat_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..geo.events import register_events_view
    register_events_view(spark, sf_dir)
    df = spark.sql(lonlat_sql())
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return df.repartition(p)


def quantize_lon(lon: Column, n: int) -> Column:
    return F.floor(((lon + F.lit(180.0)) / F.lit(360.0)) * F.lit(n - 1)) \
            .cast("bigint")


def quantize_lat(lat: Column, n: int) -> Column:
    return F.floor(((lat + F.lit(90.0)) / F.lit(180.0)) * F.lit(n - 1)) \
            .cast("bigint")


def lonlat_quantize(df: DataFrame, n: int) -> DataFrame:
    """(…, lon, lat, …) -> (…, x, y) on the [0, N-1]² grid — the
    reference's exact prep formula; output feeds the same build/query
    pipeline as integer-native events."""
    return df.withColumn("x", quantize_lon(F.col("lon"), n)) \
             .withColumn("y", quantize_lat(F.col("lat"), n))


def oracle_lonlat_quantize_sql(n: int, tile_shift: int) -> str:
    """DuckDB mirror of the synthetic stream + quantization, rolled up
    per tile so the gate compares bounded rows with full coverage of
    the per-event x/y values (sum(x)/sum(y) pin every event's cell)."""
    return f"""
WITH ll AS ({lonlat_sql()}),
q AS (
  SELECT CAST(floor(((lon + 180.0) / 360.0) * {n - 1}) AS BIGINT) AS x,
         CAST(floor(((lat + 90.0) / 180.0) * {n - 1}) AS BIGINT) AS y
  FROM ll
)
SELECT (x >> {tile_shift}) AS qx, (y >> {tile_shift}) AS qy,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy
FROM q GROUP BY qx, qy ORDER BY qx, qy
"""


# ---------------------------------------------------------------------------
# S2-style spherical cells (cube-face quadtree)
# ---------------------------------------------------------------------------

def s2ish_cell(lon: Column, lat: Column, res: int) -> Column:
    """Spherical cell id at resolution ``res`` (0..30): cube face from
    the dominant axis of the unit direction vector, gnomonic (u, v) on
    the face, Morton-interleaved 2^res quadtree. Faces: 0/1 = ±x,
    2/3 = ±y, 4/5 = ±z — the poles are face interiors, not
    singularities. All column functions; codegen-friendly."""
    rad = math.pi / 180.0
    cx = F.cos(lat * rad) * F.cos(lon * rad)
    cy = F.cos(lat * rad) * F.sin(lon * rad)
    cz = F.sin(lat * rad)
    ax, ay, az = F.abs(cx), F.abs(cy), F.abs(cz)
    m = F.greatest(ax, ay, az)
    # face + gnomonic coords; ties broken x > y > z (>= comparisons)
    face = (F.when((ax >= ay) & (ax >= az),
                   F.when(cx >= 0, F.lit(0)).otherwise(F.lit(1)))
            .when(ay >= az,
                  F.when(cy >= 0, F.lit(2)).otherwise(F.lit(3)))
            .otherwise(F.when(cz >= 0, F.lit(4)).otherwise(F.lit(5))))
    u = (F.when(face <= 1, cy).when(face <= 3, cz).otherwise(cx)) / m
    v = (F.when(face <= 1, cz).when(face <= 3, cx).otherwise(cy)) / m
    scale = float(1 << res)
    i = F.least(F.floor((u + 1.0) / 2.0 * scale),
                F.lit(float((1 << res) - 1))).cast("bigint")
    j = F.least(F.floor((v + 1.0) / 2.0 * scale),
                F.lit(float((1 << res) - 1))).cast("bigint")
    morton = F.lit(0).cast("bigint")
    for b in range(res):
        morton = (morton
                  + F.shiftright(i, b).bitwiseAND(F.lit(1))
                  * F.lit(1 << (2 * b + 1))
                  + F.shiftright(j, b).bitwiseAND(F.lit(1))
                  * F.lit(1 << (2 * b)))
    return (face.cast("bigint") * F.lit(1 << (2 * res)) + morton) \
        .alias(f"s2ish_r{res}")


def cell_parent(cell: Column, res: int, parent_res: int) -> Column:
    """Parent cell at a coarser resolution — drop 2 bits per level
    inside the face, keep the face: the H3/S2 parent relation."""
    if parent_res > res:
        raise ValueError("parent_res must be <= res")
    shift = 2 * (res - parent_res)
    face = F.shiftright(cell, 2 * res)
    morton = cell - face * F.lit(1 << (2 * res))
    return (face * F.lit(1 << (2 * parent_res))
            + F.shiftright(morton, shift)).cast("bigint")


def with_s2ish_cells(df: DataFrame, res: int) -> DataFrame:
    return df.withColumn("cell", s2ish_cell(F.col("lon"), F.col("lat"),
                                            res))
