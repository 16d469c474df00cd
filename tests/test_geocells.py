"""lat/lon → cell mapping: reference quantization formula parity,
S2-style spherical-cell hierarchy properties, and an end-to-end
lon/lat → quantize → pip/knn run (VERDICT r2 item 4)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from spatialsketch_spark.sources.geocells import (
    cell_parent, derive_lonlat_events, lonlat_quantize, s2ish_cell,
    with_s2ish_cells)

from conftest import SF_UNIT


@pytest.fixture(scope="module")
def lonlat(spark):
    return derive_lonlat_events(spark, SF_UNIT).cache()


def test_quantize_matches_numpy_reference(spark, lonlat):
    """Spark quantization == the reference notebook's numpy formula
    (RealWorld.ipynb:720-721) on the same doubles."""
    n = 4096
    got = lonlat_quantize(lonlat, n).select("ts", "lon", "lat", "x", "y") \
                                    .limit(500).collect()
    for r in got:
        assert r["x"] == int(((r["lon"] + 180) / 360) * (n - 1))
        assert r["y"] == int(((r["lat"] + 90) / 180) * (n - 1))
        assert 0 <= r["x"] < n and 0 <= r["y"] < n


def test_s2ish_parent_relation(spark, lonlat):
    """Quantizing directly at res-1 equals cell_parent of the res cell
    (floor nesting for power-of-two grids) — the H3/S2 parent law."""
    res = 10
    d = lonlat.limit(2000).select(
        s2ish_cell(F.col("lon"), F.col("lat"), res).alias("c_fine"),
        s2ish_cell(F.col("lon"), F.col("lat"), res - 1).alias("c_coarse"),
        s2ish_cell(F.col("lon"), F.col("lat"), res - 3).alias("c_3up"))
    d = d.withColumn("p1", cell_parent(F.col("c_fine"), res, res - 1)) \
         .withColumn("p3", cell_parent(F.col("c_fine"), res, res - 3))
    bad = d.where((F.col("p1") != F.col("c_coarse"))
                  | (F.col("p3") != F.col("c_3up"))).count()
    assert bad == 0


def test_s2ish_poles_and_faces(spark):
    """The poles are face interiors (no singularity): all near-polar
    points land on the ±z faces with valid distinct cells; equatorial
    points land on the four side faces."""
    res = 8
    rows = [(i, float(lon), float(lat))
            for i, (lon, lat) in enumerate(
                [(l, 89.9) for l in range(-180, 180, 30)]
                + [(l, -89.9) for l in range(-180, 180, 30)]
                + [(0.0, 0.0), (90.0, 0.0), (180.0 - 1e-9, 0.0),
                   (-90.0, 0.0), (45.0, 0.0), (-135.0, 0.0)])]
    df = spark.createDataFrame(rows, "id LONG, lon DOUBLE, lat DOUBLE")
    got = df.select("id", "lon", "lat",
                    s2ish_cell(F.col("lon"), F.col("lat"), res)
                    .alias("cell")).collect()
    for r in got:
        face = r["cell"] >> (2 * res)
        assert 0 <= face <= 5
        if r["lat"] > 89:
            assert face == 4, (r["lon"], r["lat"], face)
        elif r["lat"] < -89:
            assert face == 5, (r["lon"], r["lat"], face)
        else:
            assert face in (0, 1, 2, 3)
    # exactly-at-pole is valid too
    pole = spark.createDataFrame([(0.0, 90.0), (0.0, -90.0)],
                                 "lon DOUBLE, lat DOUBLE") \
        .select(s2ish_cell(F.col("lon"), F.col("lat"), res).alias("c")) \
        .collect()
    assert {p["c"] >> (2 * res) for p in pole} == {4, 5}


def test_s2ish_area_balance(spark, lonlat):
    """Sphere-aware means near-uniform points spread over ALL six faces
    — an equirectangular grid would starve the polar caps instead."""
    d = with_s2ish_cells(lonlat, 6)
    per_face = {r["face"]: r["cnt"] for r in
                d.select(F.shiftright("cell", 12).alias("face"))
                .groupBy("face").agg(F.count("*").alias("cnt")).collect()}
    assert set(per_face) == {0, 1, 2, 3, 4, 5}
    # lon/lat-uniform sampling concentrates at the poles on the sphere,
    # but every face still gets a solid share of a 2k-point stream
    assert min(per_face.values()) > 0.03 * sum(per_face.values())


def test_lonlat_end_to_end_pip_knn(spark, lonlat):
    """lon/lat input all the way through quantize -> tile index ->
    kNN / PIP, verified against driver-side brute force."""
    from spatialsketch_spark.geo.joins import knn_join, pip_join
    from spatialsketch_spark.core.partitioner import Shape
    n = 64
    ev = lonlat_quantize(lonlat, n).select("ts", "item", "x", "y", "value")
    pdf = ev.toPandas()
    # kNN over quantized lon/lat
    pts = [(0, 5, 5), (1, 32, 32), (2, 63, 0)]
    got = knn_join(ev, pts, k=3, tile_level=3).collect()
    for qid, qx, qy in pts:
        d2 = (pdf.x - qx) ** 2 + (pdf.y - qy) ** 2
        want = sorted(zip(d2.tolist(), pdf.ts.tolist()))[:3]
        mine = sorted((r["dist2"], r["ts"]) for r in got if r["qid"] == qid)
        assert mine == want
    # PIP over quantized lon/lat
    sh = Shape(rings=[[(-0.5, -0.5), (39.5, -0.5), (39.5, 19.5),
                       (19.5, 19.5), (19.5, 39.5), (-0.5, 39.5)]],
               grid_size=n, name="L")
    cnt = pip_join(ev, [sh], "broadcast").count()
    in_l = (((pdf.x <= 39) & (pdf.y <= 19))
            | ((pdf.x <= 19) & (pdf.y <= 39))).sum()
    assert cnt == in_l


# ---------------------------------------------------------------------------
# Cap cover (RegionCoverer/polyfill analogue) + cap_filter
# ---------------------------------------------------------------------------

CAPS = [(20.0, 45.0, 0.30), (179.9, -10.0, 0.25),   # antimeridian
        (0.0, 89.5, 0.20),                           # polar (face interior)
        (45.0, 35.26, 0.15)]                         # near a cube corner


def _ranges_contain(ranges, cells):
    los = np.array([r[0] for r in ranges])
    his = np.array([r[1] for r in ranges])
    idx = np.searchsorted(los, cells, side="right") - 1
    ok = idx >= 0
    ok[ok] &= cells[ok] <= his[idx[ok]]
    return ok


@pytest.mark.parametrize("lon0,lat0,rad", CAPS)
def test_cap_cover_superset_and_prunes(spark, lonlat, lon0, lat0, rad):
    """The cover must contain EVERY point inside the cap (superset
    guarantee — conservative triangle-inequality tests) while covering
    far less than the sphere (it actually prunes), including across the
    antimeridian, at a pole, and at a cube-corner seam."""
    from spatialsketch_spark.sources.geocells import s2ish_cap_cover
    res = 7
    ranges = s2ish_cap_cover(lon0, lat0, rad, res)
    # sorted, disjoint, coalesced
    for (l1, h1), (l2, h2) in zip(ranges, ranges[1:]):
        assert l1 <= h1 and h1 + 1 < l2
    rows = with_s2ish_cells(lonlat.limit(20000), res) \
        .select("lon", "lat", "cell").collect()
    lon = np.array([r["lon"] for r in rows], dtype=np.float64)
    lat = np.array([r["lat"] for r in rows], dtype=np.float64)
    cell = np.array([r["cell"] for r in rows], dtype=np.int64)
    p = np.deg2rad([lon0, lat0])
    d = (np.cos(np.deg2rad(lat)) * np.cos(p[1]) * np.cos(np.deg2rad(lon) - p[0])
         + np.sin(np.deg2rad(lat)) * np.sin(p[1]))
    inside = d >= math.cos(rad)
    assert inside.sum() > 0
    assert _ranges_contain(ranges, cell[inside]).all()
    covered = sum(h - l + 1 for l, h in ranges)
    assert covered < 6 * 4 ** res * 0.25       # prunes most of the sphere


def test_cap_cover_validation_and_full_sphere():
    from spatialsketch_spark.sources.geocells import s2ish_cap_cover
    with pytest.raises(ValueError, match="radius_rad"):
        s2ish_cap_cover(0, 0, 0.0, 5)
    with pytest.raises(ValueError, match="res"):
        s2ish_cap_cover(0, 0, 0.1, 20)
    full = s2ish_cap_cover(0.0, 0.0, math.pi, 4)
    assert sum(h - l + 1 for l, h in full) == 6 * 4 ** 4


@pytest.mark.parametrize("lon0,lat0,rad", CAPS[:2])
def test_cap_filter_equals_bruteforce(spark, lonlat, lon0, lat0, rad):
    """cap_filter (cover prune + exact predicate) returns EXACTLY the
    brute-force filter's rows — the cover being a superset makes prune
    tightness a pure efficiency property."""
    from spatialsketch_spark.sources.geocells import cap_filter
    df = lonlat.limit(20000)
    got = {r["ts"] for r in
           cap_filter(df, lon0, lat0, rad, res=7).select("ts").collect()}
    rad_c = math.pi / 180.0
    dot = (F.cos(F.col("lat") * rad_c) * F.cos(F.col("lon") * rad_c)
           * F.lit(math.cos(lat0 * rad_c) * math.cos(lon0 * rad_c))
           + F.cos(F.col("lat") * rad_c) * F.sin(F.col("lon") * rad_c)
           * F.lit(math.cos(lat0 * rad_c) * math.sin(lon0 * rad_c))
           + F.sin(F.col("lat") * rad_c) * F.lit(math.sin(lat0 * rad_c)))
    want = {r["ts"] for r in
            df.where(dot >= F.lit(math.cos(rad))).select("ts").collect()}
    assert got == want and len(want) > 0


def test_staged_cells_equal_scalar_and_compile(spark, lonlat):
    """with_s2ish_cells (staged columns) is bit-identical to the scalar
    s2ish_cell expression AND survives STRICT whole-stage codegen at
    high res (the scalar form overflows janino's 64 KB method limit at
    res>=7 and silently falls back to interpreted mode)."""
    from spatialsketch_spark.sources.geocells import with_s2ish_cells
    df = lonlat.limit(1000)
    for res in (4, 7, 10):
        staged = {(r["ts"], r["cell"]) for r in
                  with_s2ish_cells(df, res).select("ts", "cell").collect()}
        scalar = {(r["ts"], r["cell"]) for r in
                  df.select("ts", s2ish_cell(F.col("lon"), F.col("lat"),
                                             res).alias("cell")).collect()}
        assert staged == scalar
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try:
        with_s2ish_cells(df, 12).agg(F.sum("cell")).collect()
    finally:
        spark.conf.set("spark.sql.codegen.fallback", "true")


def test_cap_knn_equals_bruteforce(spark, lonlat):
    """Spherical kNN (expanding cap covers, provable stopping) returns
    exactly the brute-force great-circle top-k — including queries at a
    pole, near the antimeridian, and with a tiny initial radius that
    forces several doubling rounds per query."""
    from spatialsketch_spark.sources.geocells import cap_knn
    df = lonlat.limit(5000).cache()
    rows = df.select("ts", "lon", "lat").collect()
    lon = np.array([r["lon"] for r in rows], dtype=np.float64)
    lat = np.array([r["lat"] for r in rows], dtype=np.float64)
    ts = np.array([r["ts"] for r in rows], dtype=np.int64)
    qs = [(0, 20.0, 45.0), (1, 179.95, -10.0), (2, 0.0, 89.9),
          (3, -135.0, 0.0)]
    k = 5
    got = cap_knn(df, qs, k=k, res=7, initial_radius=0.005).collect()
    lonr, latr = np.deg2rad(lon), np.deg2rad(lat)
    for qid, qlon, qlat in qs:
        p = np.deg2rad([qlon, qlat])
        dot = (np.cos(latr) * np.cos(p[1]) * np.cos(lonr - p[0])
               + np.sin(latr) * np.sin(p[1]))
        order = sorted(zip(-dot, ts))[:k]
        want = [int(t) for _, t in order]
        mine = [int(r["ts"]) for r in
                sorted((r for r in got if r["qid"] == qid),
                       key=lambda r: r["rank"])]
        assert mine == want, (qid, mine, want)
        # reported angle is consistent with the winning dot products
        for r in (r for r in got if r["qid"] == qid):
            i = int(np.where(ts == r["ts"])[0][0])
            assert abs(math.cos(r["dist"]) - dot[i]) < 1e-9


def test_cap_knn_edge_cases(spark, lonlat):
    from spatialsketch_spark.sources.geocells import cap_knn
    with pytest.raises(ValueError, match="duplicate qid"):
        cap_knn(lonlat, [(0, 0.0, 0.0), (0, 1.0, 1.0)])
    empty = lonlat.where(F.lit(False))
    got = cap_knn(empty, [(0, 0.0, 0.0)], k=3)
    assert got.count() == 0
    # k larger than the table: every row returned, ranked
    small = lonlat.limit(3)
    got = cap_knn(small, [(7, 10.0, 10.0)], k=5).collect()
    assert sorted(r["rank"] for r in got) == [1, 2, 3]


def test_cap_ops_strict_codegen(spark):
    """cap_filter and cap_knn must run under STRICT whole-stage codegen
    (no interpreted fallback) over the fixture stream — guards both the
    staged-cell form and the derive_lonlat_events cache barrier that
    stops filter-pushdown from substituting the synthetic lon/lat
    derivation into every trig reference."""
    from spatialsketch_spark.sources.geocells import cap_filter, cap_knn
    ll = derive_lonlat_events(spark, SF_UNIT)
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try:
        assert cap_filter(ll, 20.0, 45.0, 0.3, res=7).count() > 0
        assert cap_knn(ll, [(0, 20.0, 45.0)], k=3, res=7).count() == 3
        from spatialsketch_spark.sources.geocells import (
            polygon_filter_sphere)
        assert polygon_filter_sphere(
            ll, POLYS["midlat_quad"], res=6).count() > 0
    finally:
        spark.conf.set("spark.sql.codegen.fallback", "true")


POLYS = {
    "midlat_quad": [(10.0, 10.0), (60.0, 15.0), (55.0, 55.0),
                    (5.0, 50.0)],
    "antimeridian": [(170.0, -20.0), (-160.0, -15.0), (-165.0, 25.0),
                     (165.0, 20.0)],
    "polar_cap": [(0.0, 80.0), (72.0, 80.0), (144.0, 80.0),
                  (216.0, 80.0), (288.0, 80.0)],
    "concave": [(0.0, 0.0), (40.0, 0.0), (40.0, 40.0), (20.0, 15.0),
                (0.0, 40.0)],
}


@pytest.mark.parametrize("name", sorted(POLYS))
def test_spherical_polygon_cover_superset(spark, lonlat, name):
    """Polygon polyfill superset guarantee on a mid-lat quad, an
    antimeridian-crossing quad, a pole-containing ring, and a concave
    polygon: every point whose (python, great-circle, even-odd) PIP
    says inside must land in a covered cell; the cover still prunes
    most of the sphere."""
    from spatialsketch_spark.sources.geocells import (
        _pip_sphere_py, _unit, spherical_polygon_cover)
    res = 6
    verts_ll = POLYS[name]
    ranges = spherical_polygon_cover(verts_ll, res)
    verts = [_unit(lo, la) for lo, la in verts_ll]
    q = -(np.sum(verts, axis=0))
    q = q / np.linalg.norm(q)
    rows = with_s2ish_cells(lonlat.limit(8000), res) \
        .select("lon", "lat", "cell").collect()
    n_inside = 0
    for r in rows:
        p = _unit(float(r["lon"]), float(r["lat"]))
        if _pip_sphere_py(p, verts, q):
            n_inside += 1
            assert _ranges_contain(ranges,
                                   np.array([r["cell"]])).all(), \
                (name, r["lon"], r["lat"])
    assert n_inside > 0, name
    covered = sum(h - l + 1 for l, h in ranges)
    assert covered < 6 * 4 ** res * 0.4, (name, covered)


@pytest.mark.parametrize("name", ["midlat_quad", "antimeridian"])
def test_polygon_filter_sphere_equals_bruteforce(spark, lonlat, name):
    """Cover prune + exact columnar great-circle PIP == brute-force
    columnar PIP over all rows (prune tightness is pure efficiency),
    and the columnar expression == the python reference PIP."""
    from spatialsketch_spark.sources.geocells import (
        _pip_sphere_py, _unit, polygon_filter_sphere, spherical_pip_expr)
    df = lonlat.limit(8000)
    got = {r["ts"] for r in
           polygon_filter_sphere(df, POLYS[name], res=6)
           .select("ts").collect()}
    rad = math.pi / 180.0
    brute = (df.withColumn("_dx", F.cos(F.col("lat") * rad)
                           * F.cos(F.col("lon") * rad))
             .withColumn("_dy", F.cos(F.col("lat") * rad)
                         * F.sin(F.col("lon") * rad))
             .withColumn("_dz", F.sin(F.col("lat") * rad)))
    cond, _ = spherical_pip_expr(POLYS[name])
    want = {r["ts"] for r in brute.where(cond).select("ts").collect()}
    assert got == want and len(want) > 0
    # columnar == python reference on a sample
    verts = [_unit(lo, la) for lo, la in POLYS[name]]
    q = -(np.sum(verts, axis=0)); q = q / np.linalg.norm(q)
    sample = df.limit(300).collect()
    for r in sample:
        p = _unit(float(r["lon"]), float(r["lat"]))
        assert (_pip_sphere_py(p, verts, q)
                == (int(r["ts"]) in want)) or r["ts"] not in {
                    s["ts"] for s in sample}


def test_geocells_cache_released(spark):
    """clear_geocells_cache must actually unpersist the pinned lon/lat
    InMemoryRelation (VERDICT r3 item 4) and repeated derive calls must
    reuse one registry entry, not stack new ones."""
    from spatialsketch_spark.sources import geocells as gc
    ll1 = gc.derive_lonlat_events(spark, SF_UNIT)
    ll2 = gc.derive_lonlat_events(spark, SF_UNIT)
    assert ll1 is ll2                      # registry hit, no new cache
    ll1.count()
    assert ll1.storageLevel.useMemory
    gc.clear_geocells_cache()
    assert not gc._LL_CACHE
    assert not ll1.storageLevel.useMemory  # released, not just forgotten
    # restore: later tests in this module rely on the cached relation
    # as their codegen barrier (CacheManager matches by canonicalized
    # plan, so the re-derived entry serves the old DataFrame objects)
    gc.derive_lonlat_events(spark, SF_UNIT)
