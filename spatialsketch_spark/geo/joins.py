"""Exact spatial join / tiling operators (SURVEY.md §2.F — capabilities
the north_rule adds beyond the reference, which only ran point-in-polygon
inside its Postgres oracle via ``point <@ polygon`` (Postgres.cpp:306-313)).

All operators are built from JVM-side column functions + broadcast joins
— no Python in the hot path — and are *exact* (row-for-row oracle parity
required by the north rule).

Scale notes (100 TB posture):
- PIP: the polygon side (rect decomposition) is tiny -> broadcast hash
  join against the event stream; zero shuffle on the big side. For
  polygon sets too large to broadcast, ``method='tiled'`` co-locates by
  tile key — at cluster scale that becomes a shuffle-on-tile join where
  both sides are partitioned by the same key, with tile granularity the
  skew knob.
- kNN: brute-force (broadcast queries, one window per qid) is the
  baseline; a bounding-box prefilter (tile ring expansion) bounds the
  candidate set when the query count is large. The window is
  partitionBy(qid) — parallel across queries, no global sort.
- Tiling: pure integer column arithmetic (x >> k), whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..core.partitioner import Shape, shape_to_ranges


def rects_df(spark: SparkSession, shapes: list[Shape]) -> DataFrame:
    """Polygon set -> disjoint-rectangle relation (shape_id, x1..y2).
    Decomposition runs driver-side (V tiny), the relation is broadcast."""
    rows = []
    for sid, sh in enumerate(shapes):
        for (x1, y1, x2, y2) in shape_to_ranges(sh):
            rows.append((sid, sh.name, x1, y1, x2, y2))
    return spark.createDataFrame(
        rows, "shape_id INT, shape STRING, x1 BIGINT, y1 BIGINT, "
              "x2 BIGINT, y2 BIGINT")


def pip_join(events: DataFrame, shapes: list[Shape],
             method: str = "broadcast", tile_level: int = 8) -> DataFrame:
    """Point-in-polygon join: events x polygons -> one row per
    (event, containing polygon). Exact for rectilinear polygons because
    the rect decomposition is exact (holes excluded by construction).

    method='broadcast': events JOIN broadcast(rects) ON 4-way BETWEEN.
    method='tiled': both sides keyed by tile (x>>k, y>>k); rects exploded
    to their covering tiles (JVM-side sequence+explode). The equi-join on
    tile keys is what survives when the polygon side outgrows broadcast.
    """
    spark = events.sparkSession
    rects = rects_df(spark, shapes)
    if method == "broadcast":
        cond = (F.col("x").between(F.col("x1"), F.col("x2"))
                & F.col("y").between(F.col("y1"), F.col("y2")))
        return events.join(F.broadcast(rects), cond, "inner")
    if method == "tiled":
        t = tile_level
        tiled_rects = (
            rects
            .withColumn("tx", F.explode(F.sequence(
                F.shiftright("x1", t), F.shiftright("x2", t))))
            .withColumn("ty", F.explode(F.sequence(
                F.shiftright("y1", t), F.shiftright("y2", t))))
        )
        ev = (events
              .withColumn("tx", F.shiftright("x", t))
              .withColumn("ty", F.shiftright("y", t)))
        cond = (F.col("x").between(F.col("x1"), F.col("x2"))
                & F.col("y").between(F.col("y1"), F.col("y2")))
        return (ev.join(F.broadcast(tiled_rects), ["tx", "ty"])
                .where(cond).drop("tx", "ty"))
    raise ValueError(f"unknown method {method!r}")


def _knn_ranked(events: DataFrame, qp: DataFrame, k: int) -> DataFrame:
    """events x broadcast(qp) -> per-qid top-k by (dist2, ts)."""
    d = events.join(F.broadcast(qp)).select(
        "qid", "ts",
        ((F.col("x") - F.col("qx")) ** 2
         + (F.col("y") - F.col("qy")) ** 2).cast("bigint").alias("dist2"))
    w = Window.partitionBy("qid").orderBy("dist2", "ts")
    return (d.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("qid", F.col("rank").cast("bigint").alias("rank"),
                    "ts", "dist2"))


# below this many |events| x |queries| joined rows the brute window
# join's single-job latency beats the ring loop's multi-round floor
# (measured crossover, BASELINE.md round-3 table)
KNN_BRUTE_CROSSOVER_ROWS = 100_000_000


def knn_join(events: DataFrame, query_points: list[tuple[int, int, int]],
             k: int = 5, method: str = "auto", tile_level: int = 8,
             initial_ring: int = 2) -> DataFrame:
    """kNN join: for each (qid, qx, qy) find the k nearest events by
    squared euclidean distance, ties broken by ts (unique) — fully
    deterministic, integer-exact. -> (qid, rank, ts, dist2).

    method='auto' (default): pick by the measured crossover — brute
    when |events| * |queries| stays under KNN_BRUTE_CROSSOVER_ROWS
    joined rows, ring beyond it. The size probe is a BOUNDED limit
    count (scans at most crossover/|queries| + 1 rows, stopping early),
    never a full table count — at 10^12 events the probe reads a few
    partitions and picks ring. Both methods are exact and return
    identical rows (asserted in tests), so this is a pure physical-plan
    choice; a cluster deployment can override from catalog stats.
    method='brute': unpruned events x queries window rank (the
    verifier; joined row count is |events| * |queries|).
    method='ring': tile-ring candidate pruning with a
    provable-exactness stopping rule. Candidates for ring r are events
    within Chebyshev tile distance r of the query's tile; any event
    OUTSIDE ring r is at euclidean distance >= r*2^tile_level + 1, so a
    qid is exact once it has >= k candidates and its k-th candidate
    dist2 is STRICTLY below (r*2^tile_level + 1)^2 (strict, because the
    ts tie-break could otherwise be beaten by an outside event at equal
    dist2). Unresolved qids double the ring; at ring >= grid width the
    candidate set is total, i.e. brute force — the exactness fallback.
    The joined row count is bounded by the hit tiles' population, not
    |events| * |queries| (asserted in tests/test_joins.py)."""
    spark = events.sparkSession
    qids = [q for q, _, _ in query_points]
    if len(set(qids)) != len(qids):
        # a repeated qid would mix two points' candidates in one
        # row_number window and rank neither correctly — reject upfront
        raise ValueError("duplicate qid in query_points")
    qp_all = spark.createDataFrame(query_points,
                                   "qid BIGINT, qx BIGINT, qy BIGINT")
    if method == "auto":
        thresh = KNN_BRUTE_CROSSOVER_ROWS // max(1, len(query_points))
        # bounded probe: LIMIT stops the scan at thresh+1 rows
        n_probe = events.limit(thresh + 1).count()
        method = "brute" if n_probe <= thresh else "ring"
    if method == "brute":
        return _knn_ranked(events, qp_all, k)
    if method != "ring":
        raise ValueError(f"unknown method {method!r}")
    tsz = 1 << tile_level
    ev_t = assign_tiles(events, tile_level)
    # driver materialization contract (VERDICT r2 item 1): the ONLY rows
    # the loop below ever collects are the one-row event-tile extent and
    # the per-round UNRESOLVED qid flags (qid, qx, qy) — typically zero
    # after round 1. Resolved top-k rows stay DataFrames end-to-end
    # (asserted in tests/test_joins.py::test_knn_driver_materialization).
    ext = ev_t.agg(
        F.min("tx").alias("x0"), F.max("tx").alias("x1"),
        F.min("ty").alias("y0"), F.max("ty").alias("y1")).collect()[0]
    pending = sorted((int(q), int(x), int(y)) for q, x, y in query_points)
    rounds: list[DataFrame] = []
    cached: list[DataFrame] = []
    r = max(1, initial_ring)
    try:
        out = _knn_ring_rounds(spark, ev_t, ext, pending, rounds, cached,
                               r, k, tsz, tile_level)
    finally:
        # unpersist even when a round's job fails mid-loop — the
        # per-round caches would otherwise pin executor storage for the
        # session lifetime with no handle left to release them
        for c in cached:
            c.unpersist()
    return out


def _knn_ring_rounds(spark, ev_t, ext, pending, rounds, cached, r, k,
                     tsz, tile_level):
    while pending:
        qp = spark.createDataFrame(
            pending, "qid BIGINT, qx BIGINT, qy BIGINT") \
            .withColumn("qtx", F.shiftright("qx", tile_level)) \
            .withColumn("qty", F.shiftright("qy", tile_level))
        cand = ev_t.join(
            F.broadcast(qp),
            (F.abs(F.col("tx") - F.col("qtx")) <= r)
            & (F.abs(F.col("ty") - F.col("qty")) <= r))
        d = cand.select(
            "qid", "ts",
            ((F.col("x") - F.col("qx")) ** 2
             + (F.col("y") - F.col("qy")) ** 2).cast("bigint")
            .alias("dist2"))
        w = Window.partitionBy("qid").orderBy("dist2", "ts")
        topk = (d.withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= k)).cache()
        cached.append(topk)
        # distributed exactness rule — per-qid stats never leave the
        # cluster: a qid is exact once it has >= k candidates and its
        # k-th dist2 is strictly below the outside-ring bound;
        # total-coverage (ring spans the whole event extent) is the
        # brute-force-equivalence fallback
        stats = topk.groupBy("qid").agg(
            F.count("*").alias("cnt"), F.max("dist2").alias("kd"))
        bound2 = (r * tsz + 1) ** 2
        exact_c = (F.col("cnt") >= k) & (F.col("kd") < F.lit(bound2))
        if ext["x0"] is None:          # no events at all: vacuously total
            total_c = F.lit(True)
        else:
            total_c = ((F.col("qtx") - r <= ext["x0"])
                       & (F.col("qtx") + r >= ext["x1"])
                       & (F.col("qty") - r <= ext["y0"])
                       & (F.col("qty") + r >= ext["y1"]))
        qstat = qp.join(F.broadcast(stats), "qid", "left") \
                  .withColumn("_done", F.coalesce(exact_c, F.lit(False))
                              | total_c)
        unresolved = qstat.where(~F.col("_done")) \
                          .select("qid", "qx", "qy").collect()
        if unresolved:
            resolved = qstat.where("_done").select("qid")
            rounds.append(topk.join(F.broadcast(resolved), "qid"))
        else:
            rounds.append(topk)        # common case: whole round exact
        pending = sorted((int(u["qid"]), int(u["qx"]), int(u["qy"]))
                         for u in unresolved)
        r *= 2
    if not rounds:
        return spark.createDataFrame(
            [], "qid BIGINT, rank BIGINT, ts BIGINT, dist2 BIGINT")
    out = rounds[0]
    for extra in rounds[1:]:
        out = out.unionByName(extra)
    # eager checkpoint: materializes the result so the caller never
    # recomputes through the caches the caller's finally unpersists
    return out.select("qid", F.col("rank").cast("bigint").alias("rank"),
                      "ts", "dist2").localCheckpoint(eager=True)


def assign_tiles(events: DataFrame, tile_level: int) -> DataFrame:
    """Raster assignment: point -> tile id at the given level (the
    engine-side analogue of the reference's lon/lat -> grid quantization,
    RealWorld.ipynb / Tech Report §3 'Updating')."""
    return events.withColumn("tx", F.shiftright("x", tile_level)) \
                 .withColumn("ty", F.shiftright("y", tile_level))


def tile_cover(spark: SparkSession, shapes: list[Shape], tile_level: int,
               n: int) -> DataFrame:
    """Vector -> raster: per (shape, tile) the number of covered cells
    and the coverage status ('full' | 'partial'). Exact integer overlap
    arithmetic over the disjoint rect decomposition.
    -> (shape_id, tx, ty, covered_cells, status)."""
    t = tile_level
    tsz = 1 << t
    rects = rects_df(spark, shapes)
    per_rect = (
        rects
        .withColumn("tx", F.explode(F.sequence(
            F.shiftright("x1", t), F.shiftright("x2", t))))
        .withColumn("ty", F.explode(F.sequence(
            F.shiftright("y1", t), F.shiftright("y2", t))))
        .withColumn("ox", F.least(F.col("x2"), (F.col("tx") + 1) * tsz - 1)
                    - F.greatest(F.col("x1"), F.col("tx") * tsz) + 1)
        .withColumn("oy", F.least(F.col("y2"), (F.col("ty") + 1) * tsz - 1)
                    - F.greatest(F.col("y1"), F.col("ty") * tsz) + 1)
    )
    return (per_rect
            .groupBy("shape_id", "tx", "ty")
            .agg(F.sum(F.col("ox") * F.col("oy")).alias("covered_cells"))
            .withColumn("status", F.when(
                F.col("covered_cells") == tsz * tsz,
                F.lit("full")).otherwise(F.lit("partial")))
            .select(F.col("shape_id").cast("bigint").alias("shape_id"),
                    F.col("tx").cast("bigint").alias("tx"),
                    F.col("ty").cast("bigint").alias("ty"),
                    F.col("covered_cells").cast("bigint").alias("covered_cells"),
                    "status"))


def raster_vector_counts(events: DataFrame, shape: Shape, tile_level: int,
                         n: int) -> DataFrame:
    """Raster<->vector roundtrip: every *event tile* (raster side) gets
    the polygon's coverage status — 'full' | 'partial' | 'outside'.
    -> (tx, ty, status, cnt)."""
    spark = events.sparkSession
    counts = (assign_tiles(events, tile_level)
              .groupBy("tx", "ty").agg(F.sum("value").alias("cnt")))
    cover = tile_cover(spark, [shape], tile_level, n).drop("shape_id")
    return (counts.join(F.broadcast(cover), ["tx", "ty"], "left")
            .select(F.col("tx").cast("bigint").alias("tx"),
                    F.col("ty").cast("bigint").alias("ty"),
                    F.coalesce("status", F.lit("outside")).alias("status"),
                    F.coalesce("cnt", F.lit(0)).cast("bigint").alias("cnt")))


def hotspot_cells(geo: DataFrame, n: int, g: int = 64,
                  mult: int = 12) -> DataFrame:
    """Spatial hotspot detection: coarse-grid density with a 3×3
    neighborhood sum (the discrete analogue of a Getis-Ord local
    density scan — the reference only ever queried fixed rectangles;
    this finds WHERE the mass is). A coarse cell (side n/g) is a
    hotspot iff its neighborhood mass exceeds ``mult``× the uniform
    expectation: neigh * g² ≥ mult * total — integer cross-multiplied,
    no ratios, so the verdict is bit-deterministic.

    Plan: one shuffle to the coarse grid (≤ g² groups — bounded state
    regardless of event count), then the neighborhood sum as a
    9-row broadcast offset join + second tiny re-aggregation over at
    most 9·g² rows. The event table is touched exactly once; the total
    is a scalar count job. No windowed 2-D sort, no self-join of events.

    -> (cx, cy, cnt, neigh, hot) for every OCCUPIED coarse cell."""
    if n % g != 0:
        raise ValueError(f"grid n={n} not divisible by coarse side g={g}")
    w = n // g
    spark = geo.sparkSession
    cnt = (geo.select(F.expr(f"x DIV {w}").alias("cx"),
                      F.expr(f"y DIV {w}").alias("cy"))
           .groupBy("cx", "cy")
           .agg(F.count("*").cast("bigint").alias("cnt")))
    # total as a broadcast one-row scalar join (r8; was a separate
    # collect() JOB that re-scanned the events before the main plan
    # ran — now all three cnt consumers sit in ONE plan and reuse the
    # cnt exchange; cnt itself stays unpersisted on purpose)
    total_df = cnt.agg(F.sum("cnt").cast("bigint").alias("_total"))
    offs = spark.createDataFrame(
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)],
        "dx int, dy int")
    neigh = (cnt.join(F.broadcast(offs))
             .select((F.col("cx") + F.col("dx")).alias("tx"),
                     (F.col("cy") + F.col("dy")).alias("ty"), "cnt")
             .where((F.col("tx") >= 0) & (F.col("tx") < g)
                    & (F.col("ty") >= 0) & (F.col("ty") < g))
             .groupBy("tx", "ty")
             .agg(F.sum("cnt").cast("bigint").alias("neigh")))
    hot = (F.col("neigh") * (g * g) >= F.lit(mult) * F.col("_total"))
    return (cnt.join(neigh, (cnt.cx == neigh.tx) & (cnt.cy == neigh.ty))
            .crossJoin(F.broadcast(total_df))
            .select(F.col("cx").cast("bigint"), F.col("cy").cast("bigint"),
                    "cnt", "neigh", hot.cast("int").alias("hot")))


def cluster_hotspots(geo: DataFrame, n: int, g: int = 64,
                     mult: int = 12) -> DataFrame:
    """Density-cluster labeling: connected components (8-connectivity)
    of the hotspot cells — the DBSCAN-core shape over the coarse grid
    (hotspot_cells answers WHERE the mass is; this answers which hot
    cells form one contiguous region). Labels are canonical and
    order-independent: a component's label is the minimum linear cell
    id (cx·g + cy) among its members, so the result is deterministic
    for any execution order and bit-comparable against the oracle's
    recursive-CTE transitive closure.

    Scale posture: the event table is touched exactly once (inside
    hotspot_cells — one shuffle to ≤ g² groups); the component pass
    runs driver-side union-find over the hot-cell set, which is
    bounded by the CONFIG constant g² (4096 here), not by data volume
    — the same bounded-state class as the k-means centroid collect
    and hotspot's scalar total.

    -> (cx, cy, cluster, csize) for every HOT cell."""
    hot = (hotspot_cells(geo, n, g, mult).where(F.col("hot") == 1)
           .select("cx", "cy").collect())
    cells = {(int(r["cx"]), int(r["cy"])) for r in hot}
    parent = {c: c for c in cells}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for (x, y) in cells:
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nb = (x + dx, y + dy)
                if nb != (x, y) and nb in cells:
                    ra, rb = find((x, y)), find(nb)
                    if ra != rb:
                        parent[rb] = ra
    comp: dict = {}
    for c in cells:
        comp.setdefault(find(c), []).append(c)
    rows = []
    for members in comp.values():
        lab = min(x * g + y for x, y in members)
        for (x, y) in members:
            rows.append((x, y, lab, len(members)))
    return geo.sparkSession.createDataFrame(
        rows, "cx BIGINT, cy BIGINT, cluster BIGINT, csize BIGINT")


def oracle_cluster_hotspots(geo_cte: str, n: int, g: int = 64,
                            mult: int = 12) -> str:
    """DuckDB replay: hot cells from the hotspot CTEs, 8-connectivity
    adjacency, transitive closure via recursive CTE, label = MIN
    reachable linear id. Closure size is bounded by the sum of squared
    component sizes over ≤ g² hot cells."""
    w = n // g
    return f"""
{geo_cte},
cells AS (
  SELECT x // {w} AS cx, y // {w} AS cy,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM geo GROUP BY 1, 2
),
offs AS (SELECT a.dx, b.dy
         FROM (VALUES (-1), (0), (1)) a(dx), (VALUES (-1), (0), (1)) b(dy)),
nb AS (
  SELECT cx + dx AS tx, cy + dy AS ty, SUM(cnt) AS neigh
  FROM cells, offs
  WHERE cx + dx BETWEEN 0 AND {g - 1} AND cy + dy BETWEEN 0 AND {g - 1}
  GROUP BY 1, 2
),
tot AS (SELECT SUM(cnt) AS t FROM cells),
hotc AS (
  SELECT cx, cy, cx * {g} + cy AS id
  FROM cells JOIN nb ON cx = tx AND cy = ty, tot
  WHERE neigh * {g * g} >= {mult} * t
),
adj AS (
  SELECT a.id AS src, b.id AS dst
  FROM hotc a JOIN hotc b
    ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
),
reach AS (
  SELECT id AS src, id AS dst FROM hotc
  UNION
  SELECT r.src, a.dst FROM reach r JOIN adj a ON a.src = r.dst
),
lab AS (SELECT src AS id, MIN(dst) AS cluster FROM reach GROUP BY src)
SELECT CAST(h.cx AS BIGINT) AS cx, CAST(h.cy AS BIGINT) AS cy,
       CAST(l.cluster AS BIGINT) AS cluster,
       CAST(COUNT(*) OVER (PARTITION BY l.cluster) AS BIGINT) AS csize
FROM hotc h JOIN lab l ON l.id = h.id
ORDER BY cx, cy
"""


def oracle_hotspot_cells(geo_cte: str, n: int, g: int = 64,
                         mult: int = 12) -> str:
    """DuckDB recomputation of hotspot_cells; ``geo_cte`` is the
    'WITH geo AS (...)' prefix shared with the other geo oracles."""
    w = n // g
    return f"""
{geo_cte},
cells AS (
  SELECT x // {w} AS cx, y // {w} AS cy,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM geo GROUP BY 1, 2
),
offs AS (SELECT a.dx, b.dy
         FROM (VALUES (-1), (0), (1)) a(dx), (VALUES (-1), (0), (1)) b(dy)),
nb AS (
  SELECT cx + dx AS tx, cy + dy AS ty, SUM(cnt) AS neigh
  FROM cells, offs
  WHERE cx + dx BETWEEN 0 AND {g - 1} AND cy + dy BETWEEN 0 AND {g - 1}
  GROUP BY 1, 2
),
tot AS (SELECT SUM(cnt) AS t FROM cells)
SELECT CAST(cx AS BIGINT) AS cx, CAST(cy AS BIGINT) AS cy, cnt,
       CAST(neigh AS BIGINT) AS neigh,
       CAST(CASE WHEN neigh * {g * g} >= {mult} * t
            THEN 1 ELSE 0 END AS INT) AS hot
FROM cells JOIN nb ON cx = tx AND cy = ty, tot
ORDER BY cx, cy
"""


# ---------------------------------------------------------------- corridor

CORRIDOR_PATH = [(200, 300), (1200, 900), (2000, 800),
                 (3000, 2000), (3900, 2100)]
CORRIDOR_D = 150
_COR_BLK = 512


def corridor_segments(spark: SparkSession,
                      path: list[tuple[int, int]] = None,
                      d: int = CORRIDOR_D,
                      n: int = 4096) -> DataFrame:
    """Polyline -> (seg_id, ax, ay, bx, by) + the block keys of each
    segment's D-dilated bounding box (driver-side enumeration — a
    SUPERSET of blocks within distance d, exact residual downstream).
    The blocked relation is tiny (segments x blocks touched) and
    broadcast; the event side carries only its own block key."""
    path = path or CORRIDOR_PATH
    rows = []
    for sid, ((ax, ay), (bx, by)) in enumerate(zip(path, path[1:])):
        x_lo = max(min(ax, bx) - d, 0)
        x_hi = min(max(ax, bx) + d, n - 1)
        y_lo = max(min(ay, by) - d, 0)
        y_hi = min(max(ay, by) + d, n - 1)
        for cbx in range(x_lo // _COR_BLK, x_hi // _COR_BLK + 1):
            for cby in range(y_lo // _COR_BLK, y_hi // _COR_BLK + 1):
                rows.append((sid, cbx, cby, ax, ay, bx, by))
    return spark.createDataFrame(
        rows, "seg_id BIGINT, cbx BIGINT, cby BIGINT, ax BIGINT, "
              "ay BIGINT, bx BIGINT, by BIGINT")


def _corridor_pred(d: int):
    """EXACT integer point-to-segment distance test, division-free:
    project p onto segment a->b with the classic piecewise rule, but
    compare cross-multiplied integers instead of computing the
    rational projection — dist² <= d² becomes

        dot <= 0      ->  |p-a|² <= d²
        dot >= |u|²   ->  |p-b|² <= d²
        else          ->  cross(u, p-a)² <= d²·|u|²

    (u = b-a). Max magnitude cross² < 2^51 on the 4096 grid — int64
    safe. Identical ANSI text runs in the oracle."""
    return F.expr(f"""
CASE WHEN (bx-ax)*(x-ax) + (by-ay)*(y-ay) <= 0
     THEN (x-ax)*(x-ax) + (y-ay)*(y-ay) <= {d * d}
     WHEN (bx-ax)*(x-ax) + (by-ay)*(y-ay)
          >= (bx-ax)*(bx-ax) + (by-ay)*(by-ay)
     THEN (x-bx)*(x-bx) + (y-by)*(y-by) <= {d * d}
     ELSE ((bx-ax)*(y-ay) - (by-ay)*(x-ax))
          * ((bx-ax)*(y-ay) - (by-ay)*(x-ax))
          <= {d * d} * ((bx-ax)*(bx-ax) + (by-ay)*(by-ay))
END""")


def corridor_filter(events: DataFrame, spark: SparkSession,
                    d: int = CORRIDOR_D, n: int = 4096) -> DataFrame:
    """Corridor (polyline-buffer) query: events within distance d of a
    route — the linear-feature filter next to the polygon (PIP) and
    cap (disc) families. Block-key broadcast join bounds the scan to
    the corridor's dilated bounding boxes; the exact residual is the
    division-free point-to-segment test, so the answer is row-exact
    while the per-event work is O(segments overlapping its block),
    never O(segments). -> (seg_id, n_events, value_sum), ordered."""
    segs = corridor_segments(spark, d=d, n=n)
    ev = (events
          .withColumn("cbx", F.expr(f"x div {_COR_BLK}"))
          .withColumn("cby", F.expr(f"y div {_COR_BLK}")))
    return (ev.join(F.broadcast(segs), ["cbx", "cby"])
            .where(_corridor_pred(d))
            .groupBy("seg_id")
            .agg(F.count("*").cast("bigint").alias("n_events"),
                 F.sum("value").cast("bigint").alias("value_sum"))
            .orderBy("seg_id"))


CORRIDOR_ROUTES = {
    0: CORRIDOR_PATH,
    1: [(3800, 300), (3000, 1200), (2200, 1100), (900, 2600)],
    2: [(100, 3900), (1500, 3200), (2900, 3600), (3900, 3000)],
}


def corridor_filter_batch(events: DataFrame, spark: SparkSession,
                          routes: dict[int, list] = None,
                          d: int = CORRIDOR_D, n: int = 4096
                          ) -> DataFrame:
    """BATCHED corridor queries — many routes answered in ONE plan
    (the engine's query-batching shape, same as the polygon path's
    batched cover join): all routes' dilated segment blocks go into a
    single broadcast relation keyed by (route_id, seg_id), the stream
    is scanned ONCE, and the rollup is per route. Query latency is
    amortized across the batch instead of one job per route — the
    difference between 3 scans and 1 at 100 TB.
    -> (route_id, n_events, value_sum), ordered."""
    routes = routes or CORRIDOR_ROUTES
    rows = []
    for rid, path in routes.items():
        for sid, ((ax, ay), (bx, by)) in enumerate(zip(path, path[1:])):
            x_lo = max(min(ax, bx) - d, 0)
            x_hi = min(max(ax, bx) + d, n - 1)
            y_lo = max(min(ay, by) - d, 0)
            y_hi = min(max(ay, by) + d, n - 1)
            for cbx in range(x_lo // _COR_BLK, x_hi // _COR_BLK + 1):
                for cby in range(y_lo // _COR_BLK, y_hi // _COR_BLK + 1):
                    rows.append((rid, sid, cbx, cby, ax, ay, bx, by))
    segs = spark.createDataFrame(
        rows, "route_id BIGINT, seg_id BIGINT, cbx BIGINT, cby BIGINT, "
              "ax BIGINT, ay BIGINT, bx BIGINT, by BIGINT")
    ev = (events
          .withColumn("cbx", F.expr(f"x div {_COR_BLK}"))
          .withColumn("cby", F.expr(f"y div {_COR_BLK}")))
    # an event near two segments of ONE route must count once for the
    # route: dedup (event, route) before the rollup via the distinct
    # on the natural key (ts is unique per event)
    hits = (ev.join(F.broadcast(segs), ["cbx", "cby"])
            .where(_corridor_pred(d))
            .select("route_id", "ts", "value").distinct())
    return (hits.groupBy("route_id")
            .agg(F.count("*").cast("bigint").alias("n_events"),
                 F.sum("value").cast("bigint").alias("value_sum"))
            .orderBy("route_id"))


def oracle_corridor_batch(geo_cte: str, d: int = CORRIDOR_D) -> str:
    vals = ",".join(
        f"({rid},{ax},{ay},{bx},{by})"
        for rid, path in CORRIDOR_ROUTES.items()
        for (ax, ay), (bx, by) in zip(path, path[1:]))
    return f"""
WITH geo AS ({geo_cte}),
seg AS (SELECT CAST(c0 AS BIGINT) AS route_id, CAST(c1 AS BIGINT) AS ax,
               CAST(c2 AS BIGINT) AS ay, CAST(c3 AS BIGINT) AS bx,
               CAST(c4 AS BIGINT) AS by
        FROM (VALUES {vals}) t(c0, c1, c2, c3, c4)),
hits AS (
  SELECT DISTINCT route_id, ts, value
  FROM seg JOIN geo ON
  CASE WHEN (bx-ax)*(x-ax) + (by-ay)*(y-ay) <= 0
       THEN (x-ax)*(x-ax) + (y-ay)*(y-ay) <= {d * d}
       WHEN (bx-ax)*(x-ax) + (by-ay)*(y-ay)
            >= (bx-ax)*(bx-ax) + (by-ay)*(by-ay)
       THEN (x-bx)*(x-bx) + (y-by)*(y-by) <= {d * d}
       ELSE ((bx-ax)*(y-ay) - (by-ay)*(x-ax))
            * ((bx-ax)*(y-ay) - (by-ay)*(x-ax))
            <= {d * d} * ((bx-ax)*(bx-ax) + (by-ay)*(by-ay))
  END)
SELECT CAST(route_id AS BIGINT) AS route_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(value) AS BIGINT) AS value_sum
FROM hits GROUP BY route_id ORDER BY route_id
"""


def oracle_corridor_filter(geo_cte: str, d: int = CORRIDOR_D) -> str:
    """Independent semantics: plain segment-table join on the SAME
    piecewise predicate — no blocking on this side."""
    vals = ",".join(
        f"({sid},{ax},{ay},{bx},{by})"
        for sid, ((ax, ay), (bx, by)) in enumerate(
            zip(CORRIDOR_PATH, CORRIDOR_PATH[1:])))
    return f"""
WITH geo AS ({geo_cte}),
seg AS (SELECT CAST(c0 AS BIGINT) AS seg_id, CAST(c1 AS BIGINT) AS ax,
               CAST(c2 AS BIGINT) AS ay, CAST(c3 AS BIGINT) AS bx,
               CAST(c4 AS BIGINT) AS by
        FROM (VALUES {vals}) t(c0, c1, c2, c3, c4))
SELECT CAST(seg_id AS BIGINT) AS seg_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(value) AS BIGINT) AS value_sum
FROM seg JOIN geo ON
CASE WHEN (bx-ax)*(x-ax) + (by-ay)*(y-ay) <= 0
     THEN (x-ax)*(x-ax) + (y-ay)*(y-ay) <= {d * d}
     WHEN (bx-ax)*(x-ax) + (by-ay)*(y-ay)
          >= (bx-ax)*(bx-ax) + (by-ay)*(by-ay)
     THEN (x-bx)*(x-bx) + (y-by)*(y-by) <= {d * d}
     ELSE ((bx-ax)*(y-ay) - (by-ay)*(x-ax))
          * ((bx-ax)*(y-ay) - (by-ay)*(x-ax))
          <= {d * d} * ((bx-ax)*(bx-ax) + (by-ay)*(by-ay))
END
GROUP BY seg_id ORDER BY seg_id
"""


# ------------------------------------------------------------ distance join

DJ_D = 48          # join radius
_DJ_BLK = 64       # block size; must be >= DJ_D so 3x3 covers the disc


def distance_join(a: DataFrame, b: DataFrame, d: int = DJ_D,
                  block: int = _DJ_BLK) -> DataFrame:
    """POINT x POINT distance join (within-d semi-aggregate): for each
    left point, how many right points lie within Euclidean distance d,
    and the exact squared distance of the nearest — the spatial
    similarity-join class next to PIP (region), cap (fixed disc), kNN
    (fixed k), and corridor (linear). Each left point fans out to the
    3x3 block ring around its own block (block >= d, so the ring
    covers its disc); rights carry their single block key, the
    equi-join on the block co-locates candidates (shuffle hash join,
    never all-pairs), the exact integer residual d² <= d*d decides,
    and each qualifying pair meets in EXACTLY one block (the right's
    own) — no dedup. Per-left fan-out is a constant 9.
    -> (a_id, n_close, min_d2) for lefts with >= 1 match, ordered."""
    if block < d:
        raise ValueError(f"block ({block}) must be >= d ({d}) for the "
                         "3x3 ring to cover the disc")
    ring = F.array(F.lit(-1), F.lit(0), F.lit(1))
    ae = (a.withColumn("_ox", F.explode(ring))
          .withColumn("_oy", F.explode(ring))
          .withColumn("_bx", F.expr(f"ax div {block}") + F.col("_ox"))
          .withColumn("_by", F.expr(f"ay div {block}") + F.col("_oy")))
    be = (b.withColumn("_bx", F.expr(f"bx div {block}"))
          .withColumn("_by", F.expr(f"by div {block}")))
    d2 = ((F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx"))
          + (F.col("ay") - F.col("by")) * (F.col("ay") - F.col("by")))
    return (ae.join(be, ["_bx", "_by"])
            .where(d2 <= d * d)
            .groupBy("a_id")
            .agg(F.count("*").cast("bigint").alias("n_close"),
                 F.min(d2).cast("bigint").alias("min_d2"))
            .select(F.col("a_id").cast("bigint"), "n_close", "min_d2")
            .orderBy("a_id"))


def oracle_distance_join(geo_cte: str, d: int = DJ_D) -> str:
    """Plain all-pairs predicate join — independent of the blocking."""
    return f"""
WITH geo AS ({geo_cte}),
a AS (SELECT ts AS a_id, x AS ax, y AS ay FROM geo WHERE ts % 2 = 0),
b AS (SELECT ts AS b_id, x AS bx, y AS by FROM geo WHERE ts % 2 = 1)
SELECT CAST(a_id AS BIGINT) AS a_id,
       CAST(COUNT(*) AS BIGINT) AS n_close,
       CAST(MIN((ax-bx)*(ax-bx) + (ay-by)*(ay-by)) AS BIGINT) AS min_d2
FROM a JOIN b ON (ax-bx)*(ax-bx) + (ay-by)*(ay-by) <= {d * d}
GROUP BY a_id ORDER BY a_id
"""
