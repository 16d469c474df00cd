"""Trajectory analytics + multi-resolution tile pyramids over the
geo-event stream — the two spatio-temporal rollups a tiling engine
serves next to range queries (reference scope: the dyadic level pyramid,
SpatialSketch.cpp level loop / Technical Report §3; per-entity
trajectories have no reference counterpart — LLM-geo-pipeline scope).

Both are pure integer arithmetic over the derived ⟨ts, item, x, y,
value⟩ tuples, so the DuckDB oracles compare bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

PYRAMID_SHIFTS = (4, 6, 8, 10)


def trajectory_stats(ev: DataFrame) -> DataFrame:
    """Per-entity trajectory rollup: order each item's points by ts and
    report path length (L1), bounding box, net displacement and point
    count — the standard movement-analytics shape (GPS track QA, robot
    telemetry, user-movement audit).

    Plan: ONE shuffle on item; the window sort is per-item and the
    follow-up aggregate reuses the same hash partitioning (no second
    exchange — Catalyst sees the child ordering). At cluster scale the
    entity key is high-cardinality (users/devices), so per-partition
    sort state stays bounded; a single hot entity would need the
    session-split treatment in pipeline/temporal.py, not this op.

    -> (item, n_points, path_l1, x_min, x_max, y_min, y_max, net_l1).
    """
    w = Window.partitionBy("item").orderBy("ts")
    step = (F.abs(F.col("x") - F.lag("x").over(w))
            + F.abs(F.col("y") - F.lag("y").over(w)))
    return (ev.select("item", "ts", "x", "y")
            .withColumn("_step", step)
            .groupBy("item")
            .agg(F.count("*").cast("bigint").alias("n_points"),
                 F.coalesce(F.sum("_step"), F.lit(0)).cast("bigint")
                 .alias("path_l1"),
                 F.min("x").cast("bigint").alias("x_min"),
                 F.max("x").cast("bigint").alias("x_max"),
                 F.min("y").cast("bigint").alias("y_min"),
                 F.max("y").cast("bigint").alias("y_max"),
                 (F.abs(F.max_by("x", "ts") - F.min_by("x", "ts"))
                  + F.abs(F.max_by("y", "ts") - F.min_by("y", "ts")))
                 .cast("bigint").alias("net_l1"))
            .select(F.col("item").cast("bigint"), "n_points", "path_l1",
                    "x_min", "x_max", "y_min", "y_max", "net_l1"))


def oracle_trajectory_stats(geo_cte: str) -> str:
    return f"""
WITH geo AS ({geo_cte}),
steps AS (
  SELECT item, ts, x, y,
         abs(x - LAG(x) OVER (PARTITION BY item ORDER BY ts))
       + abs(y - LAG(y) OVER (PARTITION BY item ORDER BY ts)) AS step
  FROM geo
)
SELECT CAST(item AS BIGINT) AS item,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       CAST(COALESCE(SUM(step), 0) AS BIGINT) AS path_l1,
       CAST(MIN(x) AS BIGINT) AS x_min, CAST(MAX(x) AS BIGINT) AS x_max,
       CAST(MIN(y) AS BIGINT) AS y_min, CAST(MAX(y) AS BIGINT) AS y_max,
       CAST(abs(arg_max(x, ts) - arg_min(x, ts))
          + abs(arg_max(y, ts) - arg_min(y, ts)) AS BIGINT) AS net_l1
FROM steps GROUP BY item ORDER BY item
"""


def multires_rollup(ev: DataFrame,
                    shifts: tuple = PYRAMID_SHIFTS) -> DataFrame:
    """Tile-pyramid densities: per-cell value sums at a ladder of
    resolutions (cell side 2^shift) — the materialized pyramid a map
    renderer or an H3-style multi-res index serves (the engine's dyadic
    level set, made queryable as data).

    Plan shape is the part that matters at 100 TB: ONLY the finest
    level aggregates the raw stream (one shuffle, map-side combined);
    every coarser level re-aggregates the PREVIOUS level's output,
    whose row count shrinks ~4^Δshift per step — the classic
    hierarchical-rollup cascade, never re-scanning the source. The
    DuckDB oracle recomputes each level independently from the raw
    stream, so the gate also proves the cascade == flat equivalence.

    -> (shift, cx, cy, n), one row per non-empty cell per level.
    """
    if list(shifts) != sorted(shifts):
        raise ValueError("shifts must ascend (coarsening cascade)")
    s0 = shifts[0]
    cur = (ev.groupBy(F.shiftright("x", s0).alias("cx"),
                      F.shiftright("y", s0).alias("cy"))
           .agg(F.sum("value").alias("n")))
    levels = [cur.select(F.lit(s0).cast("bigint").alias("shift"),
                         F.col("cx").cast("bigint"),
                         F.col("cy").cast("bigint"),
                         F.col("n").cast("bigint"))]
    prev = s0
    for s in shifts[1:]:
        d = s - prev
        cur = (cur.groupBy(F.shiftright("cx", d).alias("cx"),
                           F.shiftright("cy", d).alias("cy"))
               .agg(F.sum("n").alias("n")))
        levels.append(cur.select(F.lit(s).cast("bigint").alias("shift"),
                                 F.col("cx").cast("bigint"),
                                 F.col("cy").cast("bigint"),
                                 F.col("n").cast("bigint")))
        prev = s
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionAll(lv)
    return out


def oracle_multires_rollup(geo_cte: str,
                           shifts: tuple = PYRAMID_SHIFTS) -> str:
    # flat recomputation per level (x // 2^s == x >> s for x >= 0):
    # deliberately NOT the cascade, so the gate cross-checks the shapes
    parts = [
        f"SELECT CAST({s} AS BIGINT) AS shift,"
        f" CAST(x // {1 << s} AS BIGINT) AS cx,"
        f" CAST(y // {1 << s} AS BIGINT) AS cy,"
        f" CAST(SUM(value) AS BIGINT) AS n"
        f" FROM geo GROUP BY 2, 3"
        for s in shifts
    ]
    union = " UNION ALL ".join(parts)
    return f"""
WITH geo AS ({geo_cte})
SELECT * FROM ({union}) ORDER BY shift, cx, cy
"""


OD_TILE, OD_TRIP = 512, 1000


def od_matrix(ev: DataFrame, tile: int = OD_TILE,
              trip: int = OD_TRIP) -> DataFrame:
    """Origin-destination matrix — the mobility rollup over the event
    stream: per (item, trip-window) take the tile of the FIRST and
    LAST event (ts is unique by construction, so first/last are
    unambiguous), then count flows per (origin, destination) tile
    pair. One aggregation computes both endpoints via lexicographic
    MIN/MAX over (ts, tile) structs — no window sort, no self-join;
    the flow table is at most tiles² rows however large the stream.
    -> (o_tile, d_tile, n_trips), ordered."""
    # tile-key stride derived from the 4096 grid (ADVICE r7: the
    # hard-coded 8 aliased distinct tiles for tile < 512; the DuckDB
    # oracle still hard-codes the default geometry, so guard it)
    stride = 4096 // tile
    if stride != 8:
        raise ValueError(
            f"od_matrix tile={tile} gives stride {stride}; the oracle "
            "is pinned to the 8-per-row default geometry (tile=512)")
    t = ev.select(
        "item", F.expr(f"ts div {trip}").alias("trip"),
        F.expr(f"(x div {tile}) * {stride} + (y div {tile})")
        .alias("tile"),
        "ts")
    ends = (t.groupBy("item", "trip")
            .agg(F.min(F.struct("ts", "tile")).alias("_o"),
                 F.max(F.struct("ts", "tile")).alias("_d")))
    return (ends.groupBy(F.col("_o.tile").alias("o_tile"),
                         F.col("_d.tile").alias("d_tile"))
            .agg(F.count("*").cast("bigint").alias("n_trips"))
            .select(F.col("o_tile").cast("bigint"),
                    F.col("d_tile").cast("bigint"), "n_trips")
            .orderBy("o_tile", "d_tile"))


def oracle_od_matrix(geo_cte: str, tile: int = OD_TILE,
                     trip: int = OD_TRIP) -> str:
    return f"""
WITH geo AS ({geo_cte}),
t AS (SELECT item, ts // {trip} AS trip,
             (x // {tile}) * 8 + (y // {tile}) AS tile, ts FROM geo),
od AS (SELECT item, trip, arg_min(tile, ts) AS o_tile,
              arg_max(tile, ts) AS d_tile
       FROM t GROUP BY 1, 2)
SELECT CAST(o_tile AS BIGINT) AS o_tile,
       CAST(d_tile AS BIGINT) AS d_tile,
       CAST(COUNT(*) AS BIGINT) AS n_trips
FROM od GROUP BY 1, 2 ORDER BY 1, 2
"""


HEAT_SCALE = 1024     # weight of the newest event; halves per age step


def decayed_tile_heat(ev: DataFrame, tile: int = OD_TILE) -> DataFrame:
    """Exponential time-decay heat per tile — freshness-weighted
    density (the map a monitoring UI renders over yesterday-heavy
    streams). Decay is INTEGER SHIFT arithmetic, not float pow: age
    buckets are sixteenths of the stream's own time span (scale-free
    — the spread of shifts is 0..15 at any SF), and an event weighs
    1024 >> age_bucket, halving per step. The span anchor max(ts) is
    one scalar aggregate broadcast back; everything else is one
    map-side pass + one bounded per-tile aggregation.
    -> (tx, ty, n_events, heat), ordered."""
    m = ev.agg(F.max("ts").alias("_mx"))
    withm = ev.crossJoin(F.broadcast(m))
    w = F.expr(
        f"shiftright({HEAT_SCALE}, CAST(least((_mx - ts) div "
        f"(greatest((_mx + 1) div 16, 1)), 62) AS INT))")
    return (withm
            .select(F.expr(f"x div {tile}").alias("tx"),
                    F.expr(f"y div {tile}").alias("ty"),
                    w.alias("w"))
            .groupBy("tx", "ty")
            .agg(F.count("*").cast("bigint").alias("n_events"),
                 F.sum("w").cast("bigint").alias("heat"))
            .select(F.col("tx").cast("bigint"),
                    F.col("ty").cast("bigint"), "n_events", "heat")
            .orderBy("tx", "ty"))


def oracle_decayed_tile_heat(geo_cte: str, tile: int = OD_TILE) -> str:
    return f"""
WITH geo AS ({geo_cte}),
m AS (SELECT MAX(ts) AS mx FROM geo),
w AS (SELECT x // {tile} AS tx, y // {tile} AS ty,
             {HEAT_SCALE} >> LEAST((mx - ts) //
                 (GREATEST((mx + 1) // 16, 1)), 62) AS w
      FROM geo CROSS JOIN m)
SELECT CAST(tx AS BIGINT) AS tx, CAST(ty AS BIGINT) AS ty,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(w) AS BIGINT) AS heat
FROM w GROUP BY 1, 2 ORDER BY 1, 2
"""
