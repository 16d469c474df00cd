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

from pyspark.sql import (Column, DataFrame, SparkSession, Window,
                         functions as F)

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


# cached lon/lat relations, keyed by (applicationId, sf_dir) — see
# clear_geocells_cache. Spark's CacheManager would dedupe repeated
# .cache() calls anyway; the registry exists so the pinned
# InMemoryRelation can be RELEASED (VERDICT r3: nothing ever
# unpersisted these for the life of the session)
_LL_CACHE: dict = {}


def clear_geocells_cache() -> None:
    """Unpersist every cached lon/lat relation (mirror of
    pipeline.similarity.clear_lsh_cache). Call when done with a
    sf_dir's spherical gates/benchmarks, or after rewriting the events
    source in place."""
    while _LL_CACHE:
        _, df = _LL_CACHE.popitem()
        try:
            df.unpersist()
        except Exception:
            pass            # owning session already stopped


def derive_lonlat_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic lon/lat stream, CACHED. The cache is a required
    optimizer barrier, not just a speedup: consumers chain trig
    expressions (s2ish cells, cap predicates) over lon/lat, and
    filter-pushdown SUBSTITUTES the synthetic decimal derivation into
    every trig reference — the resulting single expression overflows
    janino's 64 KB generated-method limit and drops the stage to
    interpreted mode. Against the InMemoryRelation the columns are
    opaque attributes (the shape a real user's materialized lon/lat
    table has) and every cap/cell plan stays inside whole-stage
    codegen (strict-codegen test in tests/test_geocells.py). Repeated
    calls are safe: Spark's CacheManager matches the canonicalized
    plan and reuses the existing entry; clear_geocells_cache()
    releases the pinned relation."""
    from ..geo.events import register_events_view
    try:
        ak = spark.sparkContext.applicationId
    except Exception:
        ak = None
    key = (ak, sf_dir)
    if ak is not None and key in _LL_CACHE:
        return _LL_CACHE[key]
    register_events_view(spark, sf_dir)
    df = spark.sql(lonlat_sql())
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    out = df.repartition(p).cache()
    if ak is not None:
        _LL_CACHE[key] = out
    return out


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
    singularities. All column functions. NOTE: as a single Column
    expression the Morton loop re-inlines the face/u/v subtree per
    bit — in plans at res >= 7 use ``with_s2ish_cells`` (staged
    columns, bit-identical output) to stay inside whole-stage
    codegen."""
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


def with_s2ish_cells(df: DataFrame, res: int,
                     out: str = "cell") -> DataFrame:
    """Staged-column form of ``s2ish_cell`` — bit-identical output, but
    face/u/v/i/j are materialized as intermediate columns so the Morton
    interleave references two small column refs per bit instead of
    re-inlining the whole trigonometric subtree. The single-Column
    ``s2ish_cell`` expression grows O(res) COPIES of the face selection
    tree, which at res≥7 overflows janino's 64 KB generated-method
    limit and silently drops the stage to interpreted mode; this form
    stays inside whole-stage codegen at any res (asserted in
    tests/test_geocells.py)."""
    rad = math.pi / 180.0
    lat, lon = F.col("lat") * rad, F.col("lon") * rad
    d = (df.withColumn("_cx", F.cos(lat) * F.cos(lon))
           .withColumn("_cy", F.cos(lat) * F.sin(lon))
           .withColumn("_cz", F.sin(lat)))
    ax, ay, az = F.abs(F.col("_cx")), F.abs(F.col("_cy")), \
        F.abs(F.col("_cz"))
    cx, cy, cz = F.col("_cx"), F.col("_cy"), F.col("_cz")
    d = d.withColumn("_m", F.greatest(ax, ay, az))
    d = d.withColumn("_face", (
        F.when((ax >= ay) & (ax >= az),
               F.when(cx >= 0, F.lit(0)).otherwise(F.lit(1)))
        .when(ay >= az, F.when(cy >= 0, F.lit(2)).otherwise(F.lit(3)))
        .otherwise(F.when(cz >= 0, F.lit(4)).otherwise(F.lit(5)))))
    face = F.col("_face")
    d = d.withColumn("_u", (F.when(face <= 1, cy).when(face <= 3, cz)
                            .otherwise(cx)) / F.col("_m"))
    d = d.withColumn("_v", (F.when(face <= 1, cz).when(face <= 3, cx)
                            .otherwise(cy)) / F.col("_m"))
    scale = float(1 << res)
    d = d.withColumn("_i", F.least(
        F.floor((F.col("_u") + 1.0) / 2.0 * scale),
        F.lit(float((1 << res) - 1))).cast("bigint"))
    d = d.withColumn("_j", F.least(
        F.floor((F.col("_v") + 1.0) / 2.0 * scale),
        F.lit(float((1 << res) - 1))).cast("bigint"))
    morton = F.lit(0).cast("bigint")
    for b in range(res):
        morton = (morton
                  + F.shiftright(F.col("_i"), b).bitwiseAND(F.lit(1))
                  * F.lit(1 << (2 * b + 1))
                  + F.shiftright(F.col("_j"), b).bitwiseAND(F.lit(1))
                  * F.lit(1 << (2 * b)))
    d = d.withColumn(out, face.cast("bigint") * F.lit(1 << (2 * res))
                     + morton)
    return d.drop("_cx", "_cy", "_cz", "_m", "_face", "_u", "_v",
                  "_i", "_j")


# ---------------------------------------------------------------------------
# Region cover (the S2 RegionCoverer / H3 polyfill analogue) + cap filter
# ---------------------------------------------------------------------------

def _face_dir(face: int, u, v):
    """Unit-sphere direction for gnomonic (u, v) on ``face`` — the
    exact inverse of the face/u/v selection in s2ish_cell."""
    import numpy as np
    one = np.ones_like(u)
    if face == 0:
        d = np.stack([one, u, v])
    elif face == 1:
        d = np.stack([-one, u, v])
    elif face == 2:
        d = np.stack([v, one, u])
    elif face == 3:
        d = np.stack([v, -one, u])
    elif face == 4:
        d = np.stack([u, v, one])
    else:
        d = np.stack([u, v, -one])
    return d / np.linalg.norm(d, axis=0)


def _morton(i: int, j: int, res: int) -> int:
    m = 0
    for b in range(res):
        m |= ((i >> b) & 1) << (2 * b + 1)
        m |= ((j >> b) & 1) << (2 * b)
    return m


def s2ish_cap_cover(lon0: float, lat0: float, radius_rad: float,
                    res: int) -> list[tuple[int, int]]:
    """Spherical-cap cover at resolution ``res`` — the S2
    RegionCoverer / H3 polyfill analogue for the cube-face quadtree:
    recursive subdivision from the 6 faces, conservative
    triangle-inequality tests (cell center distance ± cell
    circumradius), fully-inside subtrees emitted as whole Morton
    RANGES without enumeration. Returns sorted, coalesced, disjoint
    ``[lo, hi]`` (inclusive) cell-id ranges at ``res`` whose union is a
    SUPERSET of the cap (never drops a cap point — the prune-then-
    exact-test contract, same two-phase shape as the PIP join); cells
    provably outside are excluded. Driver-side index metadata, like
    the dyadic covers: O(boundary cells) ranges, tiny.
    """
    import numpy as np
    if not 0 < radius_rad <= math.pi:
        raise ValueError("radius_rad must be in (0, pi]")
    if not 0 <= res <= 14:
        raise ValueError("res must be in [0, 14] (cover metadata is "
                         "driver-side; beyond 14 use a coarser prune + "
                         "exact test)")
    rad = math.pi / 180.0
    c = np.array([math.cos(lat0 * rad) * math.cos(lon0 * rad),
                  math.cos(lat0 * rad) * math.sin(lon0 * rad),
                  math.sin(lat0 * rad)])

    ranges: list[tuple[int, int]] = []

    def cell_metrics(face, r, i, j):
        scale = 1 << r
        u0, u1 = 2.0 * i / scale - 1.0, 2.0 * (i + 1) / scale - 1.0
        v0, v1 = 2.0 * j / scale - 1.0, 2.0 * (j + 1) / scale - 1.0
        um, vm = (u0 + u1) / 2.0, (v0 + v1) / 2.0
        corners = _face_dir(face,
                            np.array([u0, u0, u1, u1]),
                            np.array([v0, v1, v0, v1]))
        center = _face_dir(face, np.array([um]), np.array([vm]))[:, 0]
        # circumradius: a cell is a spherical convex polygon (gnomonic
        # maps its edges to great-circle arcs), so the max distance
        # from its center is attained at a corner
        circ = float(np.max(np.arccos(
            np.clip(corners.T @ center, -1.0, 1.0))))
        dist = float(math.acos(max(-1.0, min(1.0, float(center @ c)))))
        return dist, circ

    def emit(face, r, i, j):
        shift = 2 * (res - r)
        base = (face << (2 * res)) | (_morton(i, j, r) << shift)
        ranges.append((base, base + (1 << shift) - 1))

    def walk(face, r, i, j):
        dist, circ = cell_metrics(face, r, i, j)
        if dist - circ > radius_rad:
            return                          # provably outside
        if dist + circ <= radius_rad or r == res:
            emit(face, r, i, j)             # fully inside / leaf
            return
        for di in (0, 1):
            for dj in (0, 1):
                walk(face, r + 1, 2 * i + di, 2 * j + dj)

    for face in range(6):
        walk(face, 0, 0, 0)
    ranges.sort()
    out: list[tuple[int, int]] = []
    for lo, hi in ranges:                   # coalesce adjacent ranges
        if out and lo <= out[-1][1] + 1:
            out[-1] = (out[-1][0], max(out[-1][1], hi))
        else:
            out.append((lo, hi))
    return out


def _unit(lon: float, lat: float):
    import numpy as np
    r = math.pi / 180.0
    return np.array([math.cos(lat * r) * math.cos(lon * r),
                     math.cos(lat * r) * math.sin(lon * r),
                     math.sin(lat * r)])


def _arc_dist(c, a, b):
    """Angular distance from point ``c`` to the great-circle ARC a→b
    (all unit vectors): distance to the great circle if the
    perpendicular foot falls within the arc, else to the nearer
    endpoint."""
    import numpy as np
    n = np.cross(a, b)
    nn = np.linalg.norm(n)
    if nn < 1e-15:                      # degenerate edge
        return math.acos(max(-1.0, min(1.0, float(c @ a))))
    n = n / nn
    f = c - (c @ n) * n                 # foot on the great circle
    fn = np.linalg.norm(f)
    if fn > 1e-15:
        f = f / fn
        if (np.cross(a, f) @ n) >= 0 and (np.cross(f, b) @ n) >= 0:
            return abs(math.asin(max(-1.0, min(1.0, float(c @ n)))))
    return min(math.acos(max(-1.0, min(1.0, float(c @ a)))),
               math.acos(max(-1.0, min(1.0, float(c @ b)))))


def _pip_sphere_py(p, verts, q):
    """Even-odd spherical point-in-polygon: parity of crossings of the
    geodesic p→q (q a known-outside point) with the polygon's
    great-circle edges. Two arcs cross iff both straddle tests hold
    AND the orientation signs agree (s1·s4 > 0) — without the third
    test the pair of straddles also fires when an edge crosses the
    ANTIPODAL arc of p→q (validated exhaustively against an explicit
    intersection-point test on 2·10^5 random arc pairs)."""
    import numpy as np
    crossings = 0
    for i in range(len(verts)):
        a, b = verts[i], verts[(i + 1) % len(verts)]
        n_ab = np.cross(a, b)
        s1, s2 = n_ab @ p, n_ab @ q
        if s1 * s2 < 0:
            qa, qb = np.cross(q, a), np.cross(q, b)
            s3, s4 = p @ qa, p @ qb
            if s3 * s4 < 0 and s1 * s4 > 0:
                crossings += 1
    return crossings % 2 == 1


def spherical_polygon_cover(vertices: list[tuple[float, float]],
                            res: int) -> list[tuple[int, int]]:
    """Cell cover of a spherical polygon (great-circle-arc edges,
    even-odd interior) — the polygon polyfill completing
    ``s2ish_cap_cover``. Same conservative recursion: a cell is
    provably disjoint when its center is outside AND every edge arc is
    farther than the cell circumradius (a cell meeting the region
    either lies fully inside — then its center is inside — or contains
    boundary, contradicting the arc distance); fully-inside subtrees
    (center inside, no edge within the circumradius) emit as whole
    Morton ranges. Superset guarantee tested incl. antimeridian- and
    pole-containing polygons. Returns sorted disjoint [lo, hi] ranges
    at ``res``."""
    import numpy as np
    if len(vertices) < 3:
        raise ValueError("polygon needs >= 3 vertices")
    if not 0 <= res <= 14:
        raise ValueError("res must be in [0, 14]")
    verts = [_unit(lo, la) for lo, la in vertices]
    centroid = np.sum(verts, axis=0)
    cn = np.linalg.norm(centroid)
    if cn < 1e-12:
        raise ValueError("degenerate polygon (vertices cancel); pick a "
                         "different outside reference")
    q = -centroid / cn                  # antipode of centroid: outside
    ranges: list[tuple[int, int]] = []

    def cell_metrics(face, r, i, j):
        scale = 1 << r
        u0, u1 = 2.0 * i / scale - 1.0, 2.0 * (i + 1) / scale - 1.0
        v0, v1 = 2.0 * j / scale - 1.0, 2.0 * (j + 1) / scale - 1.0
        um, vm = (u0 + u1) / 2.0, (v0 + v1) / 2.0
        corners = _face_dir(face,
                            np.array([u0, u0, u1, u1]),
                            np.array([v0, v1, v0, v1]))
        center = _face_dir(face, np.array([um]), np.array([vm]))[:, 0]
        circ = float(np.max(np.arccos(
            np.clip(corners.T @ center, -1.0, 1.0))))
        return center, circ

    def emit(face, r, i, j):
        shift = 2 * (res - r)
        base = (face << (2 * res)) | (_morton(i, j, r) << shift)
        ranges.append((base, base + (1 << shift) - 1))

    def walk(face, r, i, j):
        center, circ = cell_metrics(face, r, i, j)
        near = min(_arc_dist(center, verts[e],
                             verts[(e + 1) % len(verts)])
                   for e in range(len(verts))) <= circ
        inside = _pip_sphere_py(center, verts, q)
        if not inside and not near:
            return                      # provably disjoint
        if (inside and not near) or r == res:
            emit(face, r, i, j)         # fully inside / leaf
            return
        for di in (0, 1):
            for dj in (0, 1):
                walk(face, r + 1, 2 * i + di, 2 * j + dj)

    for face in range(6):
        walk(face, 0, 0, 0)
    ranges.sort()
    out: list[tuple[int, int]] = []
    for lo, hi in ranges:
        if out and lo <= out[-1][1] + 1:
            out[-1] = (out[-1][0], max(out[-1][1], hi))
        else:
            out.append((lo, hi))
    return out


def spherical_pip_expr(vertices: list[tuple[float, float]]):
    """Even-odd spherical point-in-polygon as PURE COLUMN ARITHMETIC
    over staged direction columns (_dx, _dy, _dz): every edge normal
    n_ab = a×b, outside-point dets and q×a / q×b vectors are
    precomputed DRIVER-SIDE floats baked in as literals, so the per-row
    work is 3 dot products + 2 sign tests per edge — JVM codegen, no
    Python, and the identical expression is emitted for the DuckDB
    oracle. Returns (Column condition, SQL string template) where the
    SQL references dx/dy/dz columns."""
    import numpy as np
    verts = [_unit(lo, la) for lo, la in vertices]
    centroid = np.sum(verts, axis=0)
    q = -centroid / np.linalg.norm(centroid)
    cols, sqls = [], []
    for i in range(len(verts)):
        a, b = verts[i], verts[(i + 1) % len(verts)]
        n_ab = np.cross(a, b)
        d_abq = float(n_ab @ q)
        qa, qb = np.cross(q, a), np.cross(q, b)

        def dot(v):
            return (F.col("_dx") * float(v[0]) + F.col("_dy") * float(v[1])
                    + F.col("_dz") * float(v[2]))

        def dot_sql(v):
            return (f"(dx * {float(v[0])!r} + dy * {float(v[1])!r}"
                    f" + dz * {float(v[2])!r})")

        c = ((dot(n_ab) * F.lit(d_abq) < 0)
             & (dot(qa) * dot(qb) < 0)
             & (dot(n_ab) * dot(qb) > 0)).cast("int")
        cols.append(c)
        sqls.append(f"(CASE WHEN {dot_sql(n_ab)} * {d_abq!r} < 0 AND "
                    f"{dot_sql(qa)} * {dot_sql(qb)} < 0 AND "
                    f"{dot_sql(n_ab)} * {dot_sql(qb)} > 0 "
                    "THEN 1 ELSE 0 END)")
    total = cols[0]
    for c in cols[1:]:
        total = total + c
    return (total % 2 == 1), "(" + " + ".join(sqls) + ") % 2 = 1"


def spherical_pip_sql(vertices: list[tuple[float, float]]) -> str:
    """SQL-only form of the even-odd spherical PIP — pure string
    construction with NO Spark Column objects, so oracle_sql() stays
    callable without an active SparkContext (Column construction
    asserts one; an oracle generator must never depend on session
    state)."""
    import numpy as np
    verts = [_unit(lo, la) for lo, la in vertices]
    centroid = np.sum(verts, axis=0)
    q = -centroid / np.linalg.norm(centroid)
    sqls = []
    for i in range(len(verts)):
        a, b = verts[i], verts[(i + 1) % len(verts)]
        n_ab = np.cross(a, b)
        d_abq = float(n_ab @ q)
        qa, qb = np.cross(q, a), np.cross(q, b)

        def dot_sql(v):
            return (f"(dx * {float(v[0])!r} + dy * {float(v[1])!r}"
                    f" + dz * {float(v[2])!r})")

        sqls.append(f"(CASE WHEN {dot_sql(n_ab)} * {d_abq!r} < 0 AND "
                    f"{dot_sql(qa)} * {dot_sql(qb)} < 0 AND "
                    f"{dot_sql(n_ab)} * {dot_sql(qb)} > 0 "
                    "THEN 1 ELSE 0 END)")
    return "(" + " + ".join(sqls) + ") % 2 = 1"


def _pip_batch_filter(vertices: list[tuple[float, float]]):
    """Vectorized exact great-circle PIP as ONE numpy pass per Arrow
    batch (mapInPandas passthrough filter). Chosen over the column-
    expression form for the POST-PRUNE stage deliberately: filter
    pushdown substitutes the direction trig into all 3 dets × edges of
    the crossing test, and fused with the cell/Morton join stage the
    generated method overflows janino's 64 KB limit (the same
    expression-blowup class the LSH bucketing hit in round 1 — same
    fix, one matmul-ish batch kernel). spherical_pip_expr remains the
    shared truth for the DuckDB oracle and small-plan uses."""
    import numpy as np
    verts = [_unit(lo, la) for lo, la in vertices]
    centroid = np.sum(verts, axis=0)
    q = -centroid / np.linalg.norm(centroid)
    edges = []
    for i in range(len(verts)):
        a, b = verts[i], verts[(i + 1) % len(verts)]
        n_ab = np.cross(a, b)
        edges.append((n_ab, float(n_ab @ q), np.cross(q, a),
                      np.cross(q, b)))

    def fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            lon = np.deg2rad(pdf["lon"].to_numpy(np.float64))
            lat = np.deg2rad(pdf["lat"].to_numpy(np.float64))
            P = np.stack([np.cos(lat) * np.cos(lon),
                          np.cos(lat) * np.sin(lon),
                          np.sin(lat)], axis=1)
            crossings = np.zeros(len(pdf), dtype=np.int64)
            for n_ab, d_abq, qa, qb in edges:
                s1 = P @ n_ab
                s4 = P @ qb
                crossings += ((s1 * d_abq < 0) & ((P @ qa) * s4 < 0)
                              & (s1 * s4 > 0))
            yield pdf[crossings % 2 == 1]

    return fn


def _cover_prune(d: DataFrame, cover: list[tuple[int, int]],
                 cell_col: str = "_cell",
                 coarse_target: int = 6) -> DataFrame:
    """Two-stage cover prune (r8, guide §3): the single broadcast
    BETWEEN join is a BroadcastNestedLoopJoin whose pair loop
    evaluates every row against every range (100k rows x 72 ranges
    cost 1.5 s at sf0.1). Stage 1 BNL-joins against <= coarse_target
    MERGED coarse blocks (ranges shifted and coalesced — a superset of
    the cover), stage 2 applies the exact ranges to the few survivors:
    ~7x fewer pair evaluations, identical matches (both covers are
    disjoint supersets; the exact ranges decide). The BNLJ shape is
    deliberate: it is the codegen barrier that keeps the staged-cell
    trig tree in its own whole-stage method — a hash join or a pushed
    OR-of-BETWEEN filter re-inlines the tree per term and overflows
    janino's 64 KB limit (both tried; strict-codegen test failed)."""
    spark = d.sparkSession
    shift = 0
    coarse = list(cover)
    while True:
        shifted = sorted((lo >> shift, hi >> shift)
                         for lo, hi in cover)
        merged = [list(shifted[0])]
        for lo, hi in shifted[1:]:
            if lo <= merged[-1][1] + 1:
                merged[-1][1] = max(merged[-1][1], hi)
            else:
                merged.append([lo, hi])
        coarse = [(lo, hi) for lo, hi in merged]
        if len(coarse) <= coarse_target or shift > 60:
            break
        shift += 2
    crng = spark.createDataFrame(coarse, "clo BIGINT, chi BIGINT")
    cshift = F.shiftright(F.col(cell_col), shift)
    stage1 = d.join(F.broadcast(crng),
                    (cshift >= F.col("clo"))
                    & (cshift <= F.col("chi"))).drop("clo", "chi")
    rng = spark.createDataFrame(cover, "lo BIGINT, hi BIGINT")
    return (stage1.join(F.broadcast(rng),
                        (F.col(cell_col) >= F.col("lo"))
                        & (F.col(cell_col) <= F.col("hi")))
            .drop("lo", "hi"))


def polygon_filter_sphere(df: DataFrame,
                          vertices: list[tuple[float, float]],
                          res: int) -> DataFrame:
    """Spherical-polygon range query: cover prune (broadcast range join
    on the cell index, superset guarantee) + exact even-odd great-
    circle PIP, vectorized per Arrow batch (see _pip_batch_filter for
    why the exact stage is numpy, not column expressions). Output
    equals the brute-force filter regardless of cover tightness.
    -> input rows inside."""
    cover = spherical_polygon_cover(vertices, res)
    d = with_s2ish_cells(df, res, out="_cell")
    pruned = _cover_prune(d, cover).drop("_cell")
    return pruned.mapInPandas(_pip_batch_filter(vertices),
                              schema=pruned.schema)


def cap_knn(df: DataFrame, query_points: list[tuple[int, float, float]],
            k: int = 5, res: int = 7,
            initial_radius: float = 0.02) -> DataFrame:
    """Spherical kNN over the same s2ish tiling: for each
    (qid, lon, lat) the k nearest rows of ``df`` (columns ts/lon/lat)
    by great-circle angle, ties broken by ts — the spherical analogue
    of the planar tile-ring ``knn_join`` (geo/joins.py), with the cap
    cover as the ring. Per round, each unresolved query's candidates
    are the rows inside its radius-r cap COVER (a broadcast range join
    on the cell index — bounded by covered-cell population, never
    |df| × |queries|). Provable stopping: the cover is a superset of
    the cap, so any row NOT among the candidates has angle > r
    (dot < cos r strictly); a qid is exact once it has >= k candidates
    and its k-th best dot >= cos(r) — an outside row can neither beat
    nor tie it. Unresolved qids double the radius; at r >= pi the cover
    is the whole sphere (brute-force-equivalence fallback). Ranking
    orders by dot DESC (monotone in angle, no acos in the hot path);
    only unresolved qid flags ever reach the driver.
    -> (qid, rank, ts, dist) with dist = great-circle angle (rad)."""
    spark = df.sparkSession
    qids = [q for q, _, _ in query_points]
    if len(set(qids)) != len(qids):
        raise ValueError("duplicate qid in query_points")
    rad = math.pi / 180.0
    ev = with_s2ish_cells(df, res, out="_cell") \
        .withColumn("_dx", F.cos(F.col("lat") * rad)
                    * F.cos(F.col("lon") * rad)) \
        .withColumn("_dy", F.cos(F.col("lat") * rad)
                    * F.sin(F.col("lon") * rad)) \
        .withColumn("_dz", F.sin(F.col("lat") * rad)).cache()
    pending = [(int(q), float(lo), float(la))
               for q, lo, la in query_points]
    r = max(1e-6, float(initial_radius))
    rounds: list[DataFrame] = []
    cached: list[DataFrame] = [ev]
    try:
        while pending:
            rng_rows = []
            for qid, lo, la in pending:
                c = (math.cos(la * rad) * math.cos(lo * rad),
                     math.cos(la * rad) * math.sin(lo * rad),
                     math.sin(la * rad))
                for a, b in s2ish_cap_cover(lo, la, min(r, math.pi),
                                            res):
                    rng_rows.append((qid, a, b, c[0], c[1], c[2]))
            rng = spark.createDataFrame(
                rng_rows, "qid BIGINT, lo BIGINT, hi BIGINT, "
                          "cx DOUBLE, cy DOUBLE, cz DOUBLE")
            # disjoint ranges per qid -> each row matches at most once
            cand = ev.join(F.broadcast(rng),
                           (F.col("_cell") >= F.col("lo"))
                           & (F.col("_cell") <= F.col("hi")))
            d = cand.select(
                "qid", "ts",
                (F.col("_dx") * F.col("cx") + F.col("_dy") * F.col("cy")
                 + F.col("_dz") * F.col("cz")).alias("dot"))
            w = Window.partitionBy("qid").orderBy(F.desc("dot"), "ts")
            topk = (d.withColumn("rank", F.row_number().over(w))
                    .where(F.col("rank") <= k)).cache()
            cached.append(topk)
            stats = topk.groupBy("qid").agg(
                F.count("*").alias("cnt"), F.min("dot").alias("kdot"))
            qdf = spark.createDataFrame([(q,) for q, _, _ in pending],
                                        "qid BIGINT")
            exact_c = ((F.col("cnt") >= k)
                       & (F.col("kdot") >= F.lit(math.cos(min(r, math.pi)))))
            total_c = F.lit(r >= math.pi)   # cover == whole sphere
            qstat = qdf.join(F.broadcast(stats), "qid", "left") \
                .withColumn("_done",
                            F.coalesce(exact_c, F.lit(False)) | total_c)
            unresolved = {int(u["qid"]) for u in
                          qstat.where(~F.col("_done")).select("qid")
                          .collect()}
            if unresolved:
                resolved = qstat.where("_done").select("qid")
                rounds.append(topk.join(F.broadcast(resolved), "qid"))
            else:
                rounds.append(topk)
            pending = [p for p in pending if p[0] in unresolved]
            r *= 2
        if not rounds:
            return spark.createDataFrame(
                [], "qid BIGINT, rank BIGINT, ts BIGINT, dist DOUBLE")
        out = rounds[0]
        for x in rounds[1:]:
            out = out.unionByName(x)
        # localCheckpoint BEFORE the finally unpersists the round
        # caches: the result is tiny (k rows per query) and pinning it
        # (a) keeps downstream actions from re-running the whole loop
        # and (b) keeps the recompute from re-inlining the cell
        # arithmetic past the dropped caches (codegen method-size
        # blowup; see derive_lonlat_events)
        return out.select(
            F.col("qid").cast("bigint"), F.col("rank").cast("bigint"),
            F.col("ts").cast("bigint"),
            F.acos(F.least(F.greatest(F.col("dot"), F.lit(-1.0)),
                           F.lit(1.0))).alias("dist")).localCheckpoint()
    finally:
        for c in cached:
            c.unpersist()


def cap_filter(df: DataFrame, lon0: float, lat0: float,
               radius_rad: float, res: int) -> DataFrame:
    """Spherical range query (points within a great-circle cap) over a
    lon/lat table: phase 1 prunes by the cap's cell-range cover (a
    broadcast range join on the ``res``-level s2ish cell — only cover
    cells' rows are scanned past it, the cell-index analogue of
    partition pruning), phase 2 applies the exact predicate
    dot(dir(p), dir(center)) >= cos(radius). Since the cover is a
    proven superset, the result equals the brute-force filter
    regardless of cover tightness. -> input rows within the cap."""
    cover = s2ish_cap_cover(lon0, lat0, radius_rad, res)
    rad = math.pi / 180.0
    c = (math.cos(lat0 * rad) * math.cos(lon0 * rad),
         math.cos(lat0 * rad) * math.sin(lon0 * rad),
         math.sin(lat0 * rad))
    d = with_s2ish_cells(df, res, out="_cell")
    pruned = _cover_prune(d, cover).drop("_cell")
    dot = (F.cos(F.col("lat") * rad) * F.cos(F.col("lon") * rad)
           * F.lit(c[0])
           + F.cos(F.col("lat") * rad) * F.sin(F.col("lon") * rad)
           * F.lit(c[1])
           + F.sin(F.col("lat") * rad) * F.lit(c[2]))
    return pruned.where(dot >= F.lit(math.cos(radius_rad)))
