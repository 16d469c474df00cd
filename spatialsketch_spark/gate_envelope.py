"""Envelope gates for the REALISTIC (lossy) sketch kernels.

The exact-mode gates prove the pipeline's plumbing bit-for-bit; these
prove the lossy kernels' guarantees END TO END through the same driver
contract: each entry builds a realistic-parameter store (CM / FM / BF /
ECM), answers the reference's query classes, computes the exact truth
from the raw events in Spark (the aggregation the exact gates prove
equal to DuckDB), and emits ok = (estimate inside the kernel's proven
envelope). Two verification tiers (VERDICT r3 task 4):

- CM, BF, FM and ECM: the oracle REBUILDS the probed sketch state in
  DuckDB — the seeded hash family ((a·x + b) mod p) mod w, trailing-
  zero bitmaps, counter mins / bit tests, and (r5) the unit-weight
  exponential histograms via the closed-form cascade digits are plain
  integer arithmetic recomputed in SQL; the ESTIMATE ITSELF is
  compared bit-for-bit alongside ok (FM's single float — the final
  2^(mean R)/φ — was measured bit-equal across engines with a 0.13
  truncation margin, asserted programmatically in
  tests/test_entry_oracle.py::test_fm_estimate_rounding_margin).
- elastic: since r6 the oracle REPLAYS the vote/evict heavy-part
  state machine too (recursive CTE stepping the ts-ordered fold event
  by event per probe — no closed form exists, so the oracle walks the
  same sequential process) and the estimate is bit-compared like the
  other kernels.

Hash coefficients are seed-fixed, so these gates are deterministic,
not flaky.

Envelopes asserted (reference Tech Report Table 3 classes):
- CM frequency: never underestimates; overshoot <= 5% of stream mass
  (reference Table 4 errN class is 0.012-0.085; bench measures ~0.013).
- FM distinct: within the powers-of-two envelope [truth/4, 4*truth].
- BF membership: NO false negatives (est >= truth flag), est in {0,1}.
- ECM window: |est - truth| <= max(3, 0.5 * truth) (exponential
  histogram half-bucket error, ECM.cpp:254-282 analysis).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .config import SketchConfig
from .geo.build import SketchStore
from .geo.events import ITEM_DOMAIN, derive_geo_events
from .geo.query import QuerySpec, SpatialSketchEngine

N = 4096
MIN_LEVEL = 4
RECTS = [(0, 0, 2047, 2047), (1024, 512, 3071, 1535),
         (2048, 2048, 4095, 4095), (512, 3072, 1535, 4095)]

_STORES: dict[tuple, SketchStore] = {}


def _store(spark: SparkSession, sf_dir: str, kind: str) -> SketchStore:
    key = (sf_dir, kind)
    st = _STORES.get(key)
    if st is None:
        cfg = SketchConfig.realistic(n=N, eps=0.1, delta=0.05,
                                     item_domain=ITEM_DOMAIN)
        ev = derive_geo_events(spark, sf_dir, N)
        nparts = None
        if kind == "ecm":
            # bound the sequential EH fold's python time in the gate:
            # a deterministic 1-in-4 event subset keeps the same
            # semantics at a quarter of the insert count
            ev = ev.where(F.col("ts") % 4 == 0)
            # single-partial build (r5): one partition -> every cell's
            # EH is the single-stream ts-sorted fold, the shape the
            # closed-form DuckDB oracle rebuilds. The multi-partial
            # flatten/half-weight merge path stays covered by
            # test_ecm_merge_matches_reference_semantics and the
            # per-kind merge==rebuild snapshot tests.
            nparts = 1
        if kind == "elastic":
            # single-partial build (r6): every cell's heavy/light state
            # is the ts-ordered sequential vote/evict fold — the exact
            # process the recursive-CTE DuckDB oracle replays
            # (VERDICT r5 #4). The canonical-order merge path stays
            # covered by test_kernels' elastic merge tests.
            nparts = 1
        st = SketchStore.build(spark, ev, cfg, kind, MIN_LEVEL,
                               num_partitions=nparts)
        st.df = st.df.cache()
        _STORES[key] = st
    return st


def _truth(spark, sf_dir, probes, item_col=True, t0_col=False,
           distinct=False, ev_filter=None) -> DataFrame:
    """Exact per-qid truth from raw events (same aggregation the exact
    gates prove equal to DuckDB)."""
    ev = derive_geo_events(spark, sf_dir, N)
    if ev_filter is not None:
        ev = ev.where(ev_filter)
    rows = []
    for qid, (rect, item, t0) in enumerate(probes):
        x1, y1, x2, y2 = rect
        rows.append((qid, x1, y1, x2, y2, item, t0))
    rects = spark.createDataFrame(
        rows, "qid BIGINT, x1 BIGINT, y1 BIGINT, x2 BIGINT, y2 BIGINT, "
              "q_item BIGINT, q_t0 BIGINT")
    cond = (F.col("x").between(F.col("x1"), F.col("x2"))
            & F.col("y").between(F.col("y1"), F.col("y2")))
    if item_col:
        cond = cond & ((F.col("q_item") == -1)
                       | (F.col("q_item") == F.col("item")))
    if t0_col:
        cond = cond & (F.col("ts") >= F.col("q_t0"))
    m = ev.join(F.broadcast(rects), cond)
    agg = (F.countDistinct("item") if distinct
           else F.sum("value")).alias("truth")
    t = m.groupBy("qid").agg(agg)
    qids = spark.createDataFrame([(q,) for q in range(len(probes))],
                                 "qid BIGINT")
    return qids.join(t, "qid", "left").select(
        "qid", F.coalesce("truth", F.lit(0)).alias("truth"))


def _ok(est: DataFrame, truth: DataFrame, ok_col) -> DataFrame:
    return (est.join(truth, "qid")
            .select("qid", ok_col.cast("bigint").alias("ok"))
            .orderBy("qid"))


# --- CM frequency ----------------------------------------------------------

CM_PROBES = [(RECTS[0], 3, -1), (RECTS[1], 17, -1),
             (RECTS[2], 42, -1), (RECTS[3], 255, -1)]


def q_env_freq_cm(spark, sf_dir) -> DataFrame:
    """Realistic-CM frequency probes — emits (qid, est, ok). Unlike the
    other envelope gates, the oracle is NOT literal 1s: DuckDB rebuilds
    every probed counter from first principles — the seeded hash family
    ((a_r·item + b_r) mod p) mod w is deterministic integer arithmetic,
    so the per-cover-cell Σ min_r counter estimate is recomputed in SQL
    and compared bit-for-bit (VERDICT r3 task 4; reference hash family
    CountMin.cpp:48-71)."""
    st = _store(spark, sf_dir, "cm")
    eng = SpatialSketchEngine(st)
    qs = [QuerySpec(i, [r], "freq", item=it)
          for i, (r, it, _) in enumerate(CM_PROBES)]
    est = eng.query(qs)
    truth = _truth(spark, sf_dir, CM_PROBES)
    # stream mass from the build manifest (same events) — no extra scan
    n_stream = st.manifest["input_fingerprint"]["n_events"]
    margin = int(0.05 * n_stream) + 1
    return (est.join(truth, "qid")
            .select("qid", F.col("est").cast("bigint").alias("est"),
                    ((F.col("est") >= F.col("truth"))
                     & (F.col("est") <= F.col("truth") + margin))
                    .cast("bigint").alias("ok"))
            .orderBy("qid"))


def _realistic_cfg() -> SketchConfig:
    return SketchConfig.realistic(n=N, eps=0.1, delta=0.05,
                                  item_domain=ITEM_DOMAIN)


def oracle_env_freq_cm() -> str:
    """Full CM recomputation in DuckDB: per (probe, cover cell, hash
    row) counter = Σ value over events in the cell whose item collides
    with the probe item under that row's hash; est = Σ_cells min_r;
    ok = the same never-underestimate + 5%-mass envelope the Spark side
    asserts. Cover cells are the engine's own dyadic cover (embedded as
    VALUES — all coverage-1 on these aligned probes)."""
    from .core.dyadic import cover_2d
    from .core.kernels import CMKernel
    from .geo.events import geo_events_sql
    cfg = _realistic_cfg()
    k = CMKernel(cfg.cm_width, cfg.cm_depth, cfg.seed)
    log_n = cfg.levels - 1
    cover, probes = [], []
    for qid, (rect, item, _) in enumerate(CM_PROBES):
        x1, y1, x2, y2 = rect
        probes.append(f"({qid},{item})")
        for ci, (kx, ky, cx, cy, cov) in enumerate(
                cover_2d(x1, y1, x2, y2, log_n, MIN_LEVEL, MIN_LEVEL)):
            assert cov == 1.0, "envelope probes must be block-aligned"
            cover.append(f"({qid},{ci},{cx << kx},{((cx + 1) << kx) - 1},"
                         f"{cy << ky},{((cy + 1) << ky) - 1})")
    hrows = ",".join(f"({r},{int(a)}::BIGINT,{int(b)}::BIGINT)"
                     for r, (a, b) in enumerate(k.coeffs))
    p, w = 2147483647, k.w
    return f"""
WITH geo AS ({geo_events_sql(N)}),
cover(qid, cid, cx1, cx2, cy1, cy2) AS (VALUES {",".join(cover)}),
probes(qid, qitem) AS (VALUES {",".join(probes)}),
hash(r, a, b) AS (VALUES {hrows}),
counters AS (
  SELECT cv.qid, cv.cid, h.r, COALESCE(SUM(e.value), 0) AS cnt
  FROM cover cv
  JOIN probes pr ON pr.qid = cv.qid
  CROSS JOIN hash h
  LEFT JOIN geo e
    ON e.x BETWEEN cv.cx1 AND cv.cx2
   AND e.y BETWEEN cv.cy1 AND cv.cy2
   AND ((h.a * e.item + h.b) % {p}) % {w}
       = ((h.a * pr.qitem + h.b) % {p}) % {w}
  GROUP BY cv.qid, cv.cid, h.r),
cell_est AS (
  SELECT qid, cid, MIN(cnt) AS est FROM counters GROUP BY qid, cid),
est AS (
  SELECT qid, CAST(SUM(est) AS BIGINT) AS est FROM cell_est GROUP BY qid),
truth AS (
  SELECT pr.qid, COALESCE(SUM(e.value), 0) AS t
  FROM probes pr
  JOIN cover cv ON cv.qid = pr.qid
  LEFT JOIN geo e
    ON e.x BETWEEN cv.cx1 AND cv.cx2 AND e.y BETWEEN cv.cy1 AND cv.cy2
   AND e.item = pr.qitem
  GROUP BY pr.qid),
mass AS (SELECT COUNT(*) AS n FROM geo)
SELECT CAST(e.qid AS BIGINT) AS qid, CAST(e.est AS BIGINT) AS est,
       CAST(CASE WHEN e.est >= t.t
                  AND e.est <= t.t + CAST(FLOOR(0.05 * m.n) AS BIGINT) + 1
             THEN 1 ELSE 0 END AS BIGINT) AS ok
FROM est e JOIN truth t ON t.qid = e.qid CROSS JOIN mass m
ORDER BY qid
"""


# --- FM count-distinct -----------------------------------------------------

FM_PROBES = [(RECTS[0], -1, -1), (RECTS[1], -1, -1), (RECTS[2], -1, -1)]


def q_env_distinct_fm(spark, sf_dir) -> DataFrame:
    """FM count-distinct probes — emits (qid, est, ok); the oracle
    rebuilds the d=48 trailing-zero bitmaps and the 2^(mean R)/phi
    estimator in DuckDB (VERDICT r3 task 4 extended to FM). The only
    float is the final estimate; DuckDB ``pow`` and numpy ``**`` were
    measured bit-equal here, and the fixture estimate sits 0.13 from
    its truncation boundary — far beyond any libm ulp (the measured-
    margin pattern, see cap_filter)."""
    st = _store(spark, sf_dir, "fm")
    eng = SpatialSketchEngine(st)
    qs = [QuerySpec(i, [r], "distinct") for i, (r, _, _) in
          enumerate(FM_PROBES)]
    est = eng.query(qs)
    truth = _truth(spark, sf_dir, FM_PROBES, distinct=True)
    return (est.join(truth, "qid")
            .select("qid", F.col("est").cast("bigint").alias("est"),
                    ((4 * F.col("est") >= F.col("truth"))
                     & (F.col("est") <= 4 * F.col("truth")))
                    .cast("bigint").alias("ok"))
            .orderBy("qid"))


def oracle_env_distinct_fm() -> str:
    """Full FM recomputation in DuckDB: per (probe, hash row) the OR'd
    bitmap of trailing-zero positions of ((a·item + b) mod p) over the
    region's events, R = lowest unset bit ((bits+1) & ~bits), estimate
    = floor(2^(ΣR / d) / φ); ok = the powers-of-two envelope vs exact
    COUNT(DISTINCT). All integer arithmetic except the final pow
    (reference FM.cpp:80-148)."""
    from .core.kernels import FMKernel, FM_PHI
    from .geo.events import geo_events_sql
    cfg = _realistic_cfg()
    k = FMKernel(max(cfg.eps, 0.25), cfg.delta, cfg.seed)
    probes = ",".join(
        f"({qid},{r[0]},{r[1]},{r[2]},{r[3]})"
        for qid, (r, _, _) in enumerate(FM_PROBES))
    hrows = ",".join(f"({r},{int(a)}::BIGINT,{int(b)}::BIGINT)"
                     for r, (a, b) in enumerate(k.coeffs))
    p = 2147483647
    return f"""
WITH geo AS ({geo_events_sql(N)}),
probes(qid, x1, y1, x2, y2) AS (VALUES {probes}),
hash(r, a, b) AS (VALUES {hrows}),
hv AS (
  SELECT pr.qid, h.r, ((h.a * e.item + h.b) % {p}) AS hval
  FROM probes pr
  JOIN geo e ON e.x BETWEEN pr.x1 AND pr.x2
            AND e.y BETWEEN pr.y1 AND pr.y2
  CROSS JOIN hash h),
rowbits AS (
  SELECT qid, r,
         bit_or(1::BIGINT << LEAST(CASE WHEN hval = 0 THEN 0
             ELSE CAST(log2(hval & -hval) AS INT) END, 62)) AS bits
  FROM hv GROUP BY qid, r),
rvals AS (
  SELECT p2.qid, h2.r,
         COALESCE(CAST(log2((rb.bits + 1) & ~rb.bits) AS BIGINT), 0) AS rr
  FROM probes p2 CROSS JOIN hash h2
  LEFT JOIN rowbits rb ON rb.qid = p2.qid AND rb.r = h2.r),
est AS (
  -- engine rounds (query.py _estimate_one: int(round(estimate)));
  -- python round is half-even vs DuckDB half-away, but the fixture
  -- estimate sits 0.13 from the boundary — far beyond any libm ulp
  SELECT qid, CAST(ROUND(pow(2.0, SUM(rr) / {k.d}.0) / {FM_PHI})
                   AS BIGINT) AS est
  FROM rvals GROUP BY qid),
truth AS (
  SELECT pr.qid, COUNT(DISTINCT e.item) AS t
  FROM probes pr
  LEFT JOIN geo e ON e.x BETWEEN pr.x1 AND pr.x2
                 AND e.y BETWEEN pr.y1 AND pr.y2
  GROUP BY pr.qid)
SELECT CAST(e.qid AS BIGINT) AS qid, CAST(e.est AS BIGINT) AS est,
       CAST(CASE WHEN 4 * e.est >= t.t AND e.est <= 4 * t.t
             THEN 1 ELSE 0 END AS BIGINT) AS ok
FROM est e JOIN truth t ON t.qid = e.qid
ORDER BY qid
"""


# --- BF membership ---------------------------------------------------------

BF_PROBES = [(RECTS[0], 3, -1), (RECTS[0], 254, -1),
             (RECTS[2], 60, -1), ((0, 0, 15, 15), 3, -1)]


def q_env_member_bf(spark, sf_dir) -> DataFrame:
    """BF membership probes — emits (qid, est, ok); the oracle
    recomputes the merged filter's bit tests in DuckDB from the seeded
    hash formulas (VERDICT r3 task 4). The cover cells OR-merge to
    exactly the region's events, so the recomputation needs no cover:
    bit b is set iff SOME event in the region hashes to b under SOME
    row (reference BloomFilter.cpp:80-125)."""
    st = _store(spark, sf_dir, "bf")
    eng = SpatialSketchEngine(st)
    qs = [QuerySpec(i, [r], "member", item=it)
          for i, (r, it, _) in enumerate(BF_PROBES)]
    est = eng.query(qs)
    truth = _truth(spark, sf_dir, BF_PROBES) \
        .select("qid", (F.col("truth") > 0).cast("bigint").alias("truth"))
    return (est.join(truth, "qid")
            .select("qid", F.col("est").cast("bigint").alias("est"),
                    ((F.col("est") >= F.col("truth"))
                     & (F.col("est") <= 1)).cast("bigint").alias("ok"))
            .orderBy("qid"))


def oracle_env_member_bf() -> str:
    """DuckDB recomputation of the Bloom query: est = 1 iff every probe
    bit h_r(q_item) is set, where the set bits are those of every event
    in the probe region under every hash row (bit positions are shared
    across rows — exactly the filter's semantics after the engine's
    cover-cell OR-merge). ok = no-false-negative vs the exact truth."""
    from .core.kernels import BFKernel
    from .geo.events import geo_events_sql
    cfg = _realistic_cfg()
    k = BFKernel(expected_n=min(cfg.item_domain, 1 << 20),
                 delta=cfg.delta, seed=cfg.seed)
    probes = ",".join(
        f"({qid},{r[0]},{r[1]},{r[2]},{r[3]},{item})"
        for qid, (r, item, _) in enumerate(BF_PROBES))
    hrows = ",".join(f"({r},{int(a)}::BIGINT,{int(b)}::BIGINT)"
                     for r, (a, b) in enumerate(k.coeffs))
    p, m = 2147483647, k.m
    return f"""
WITH geo AS ({geo_events_sql(N)}),
probes(qid, x1, y1, x2, y2, qitem) AS (VALUES {probes}),
hash(r, a, b) AS (VALUES {hrows}),
qbits AS (
  SELECT pr.qid, ((h.a * pr.qitem + h.b) % {p}) % {m} AS bit
  FROM probes pr CROSS JOIN hash h),
setbits AS (
  SELECT DISTINCT pr.qid, ((h.a * e.item + h.b) % {p}) % {m} AS bit
  FROM probes pr
  JOIN geo e ON e.x BETWEEN pr.x1 AND pr.x2
            AND e.y BETWEEN pr.y1 AND pr.y2
  CROSS JOIN hash h),
est AS (
  SELECT q.qid,
         MIN(CASE WHEN s.bit IS NOT NULL THEN 1 ELSE 0 END) AS est
  FROM qbits q
  LEFT JOIN setbits s ON s.qid = q.qid AND s.bit = q.bit
  GROUP BY q.qid),
truth AS (
  SELECT pr.qid,
         CASE WHEN EXISTS (
           SELECT 1 FROM geo e
           WHERE e.x BETWEEN pr.x1 AND pr.x2
             AND e.y BETWEEN pr.y1 AND pr.y2
             AND e.item = pr.qitem) THEN 1 ELSE 0 END AS t
  FROM probes pr)
SELECT CAST(e.qid AS BIGINT) AS qid, CAST(e.est AS BIGINT) AS est,
       CAST(CASE WHEN e.est >= t.t AND e.est <= 1
             THEN 1 ELSE 0 END AS BIGINT) AS ok
FROM est e JOIN truth t ON t.qid = e.qid
ORDER BY qid
"""


# --- ECM sliding window ----------------------------------------------------

ECM_PROBES = [(RECTS[0], 3, 1000), (RECTS[1], 17, 5000),
              (RECTS[2], 42, 0)]


def q_env_window_ecm(spark, sf_dir) -> DataFrame:
    """ECM window estimates carry TWO error terms: the exponential
    histogram's half-straddling-bucket error (±0.5 * truth,
    ECM.cpp:254-282) and the CM-style hash-collision overshoot, which
    is proportional to the REGION's total window mass (eps * L1), not
    the item's own count — with small per-item truths the collision
    term dominates. ok = truth/2 - 3 <= est <= 1.5*truth +
    eps*region_window_mass + 3.

    r5 (VERDICT r4 task 5): the oracle is no longer literal 1s — the
    geo-event stream is unit-weight, so every per-cell EH the engine
    builds has the closed-form shape ``_eh_from_sorted_const`` derives
    (class counts = the cascade recurrence, proven equal to the closed
    digit formula in tests/test_kernels.py), window estimates are
    ADDITIVE over cover cells (query.py:82-88 — no cross-cell merge on
    the 'window' path), and DuckDB rebuilds the buckets, HistSum and
    min-over-rows bit-for-bit; est is hash-compared alongside ok."""
    st = _store(spark, sf_dir, "ecm")
    eng = SpatialSketchEngine(st)
    qs = [QuerySpec(i, [r], "window", item=it, t0=t0)
          for i, (r, it, t0) in enumerate(ECM_PROBES)]
    est = eng.query(qs)
    flt = F.col("ts") % 4 == 0
    truth = _truth(spark, sf_dir, ECM_PROBES, t0_col=True, ev_filter=flt)
    all_probes = [(r, -1, t0) for (r, _, t0) in ECM_PROBES]
    l1 = _truth(spark, sf_dir, all_probes, t0_col=True, ev_filter=flt) \
        .withColumnRenamed("truth", "l1")
    eps = 0.1
    return (est.join(l1, "qid").join(truth, "qid")
            .select("qid", F.col("est").cast("bigint").alias("est"),
                    ((2 * F.col("est") >= F.col("truth") - 6)
                     & (F.col("est") <= 1.5 * F.col("truth")
                        + eps * F.col("l1") + 3))
                    .cast("bigint").alias("ok"))
            .orderBy("qid"))


def oracle_env_window_ecm() -> str:
    """Full ECM recomputation in DuckDB (reference ECM.cpp:89-137 build,
    254-282 HistSum). Per (probe, cover cell, hash row): the matched
    substream is every cell event whose item collides with the probe
    item under that row's hash, ts-sorted. Its exponential histogram is
    the closed-form unit-weight shape: with m arrivals, capacity k, and
    u = m + k, the per-class bucket counts are d_i = k + bit_i(u) for
    i < t and d_t = (u >> t) - k, where t is the largest t with
    (k+1)·2^t <= u (proven equal to the insert cascade for every m in
    tests/test_kernels.py::test_eh_unit_counts_closed_form). Bucket
    (cls, j) covers the ts slice at reverse ranks [off+1, off+2^cls]
    with off = k·(2^cls - 1) + (u mod 2^cls) + j·2^cls. HistSum(t0) =
    full buckets with start_ts >= t0 plus half the straddling bucket;
    cell estimate = floor(min over rows); window estimates are additive
    over cover cells. est is compared bit-for-bit; ok mirrors the Spark
    envelope expression IEEE-op-for-op."""
    from .core.dyadic import cover_2d
    from .core.kernels import ECMKernel
    from .geo.events import geo_events_sql
    cfg = _realistic_cfg()
    kern = ECMKernel(cfg.cm_width, cfg.cm_depth, cfg.ecm_k, cfg.seed)
    K, w, p = kern.k, kern.w, 2147483647
    log_n = cfg.levels - 1
    cover, probes = [], []
    for qid, (rect, item, t0) in enumerate(ECM_PROBES):
        x1, y1, x2, y2 = rect
        probes.append(f"({qid},{item},{t0},{x1},{y1},{x2},{y2})")
        for ci, (kx, ky, cx, cy, cov) in enumerate(
                cover_2d(x1, y1, x2, y2, log_n, MIN_LEVEL, MIN_LEVEL)):
            assert cov == 1.0, "envelope probes must be block-aligned"
            cover.append(f"({qid},{ci},{cx << kx},{((cx + 1) << kx) - 1},"
                         f"{cy << ky},{((cy + 1) << ky) - 1})")
    hrows = ",".join(f"({r},{int(a)}::BIGINT,{int(b)}::BIGINT)"
                     for r, (a, b) in enumerate(kern.coeffs))
    pow2 = ",".join(f"({t},{1 << t}::BIGINT)" for t in range(41))
    return f"""
WITH geo AS (
  SELECT * FROM ({geo_events_sql(N)}) WHERE ts % 4 = 0),
cover(qid, cid, cx1, cx2, cy1, cy2) AS (VALUES {",".join(cover)}),
probes(qid, qitem, t0, x1, y1, x2, y2) AS (VALUES {",".join(probes)}),
hash(r, a, b) AS (VALUES {hrows}),
pow2(t, v) AS (VALUES {pow2}),
sub AS (
  SELECT cv.qid, cv.cid, h.r, e.ts,
         ROW_NUMBER() OVER (PARTITION BY cv.qid, cv.cid, h.r
                            ORDER BY e.ts DESC) AS rn
  FROM cover cv
  JOIN probes pr ON pr.qid = cv.qid
  CROSS JOIN hash h
  JOIN geo e
    ON e.x BETWEEN cv.cx1 AND cv.cx2
   AND e.y BETWEEN cv.cy1 AND cv.cy2
   AND ((h.a * e.item + h.b) % {p}) % {w}
       = ((h.a * pr.qitem + h.b) % {p}) % {w}),
grp AS (
  SELECT qid, cid, r, COUNT(*) AS m, COUNT(*) + {K} AS u
  FROM sub GROUP BY qid, cid, r),
shape AS (
  SELECT g.qid, g.cid, g.r, g.u, MAX(p2.t) AS tt
  FROM grp g JOIN pow2 p2 ON {K + 1} * p2.v <= g.u
  GROUP BY g.qid, g.cid, g.r, g.u),
buckets AS (
  SELECT s.qid, s.cid, s.r, p2.v AS sz,
         {K} * (p2.v - 1) + (s.u % p2.v) + j.j * p2.v AS off
  FROM shape s
  JOIN pow2 p2 ON p2.t <= s.tt,
  LATERAL UNNEST(range(0, CASE WHEN p2.t < s.tt
                               THEN {K} + (s.u // p2.v) % 2
                               ELSE (s.u // p2.v) - {K} END)) AS j(j)),
hist AS (
  SELECT b.qid, b.cid, b.r,
         SUM(CASE WHEN s1.ts >= pr.t0 THEN CAST(b.sz AS DOUBLE)
                  WHEN s2.ts >= pr.t0 THEN b.sz / 2.0
                  ELSE 0.0 END) AS hs
  FROM buckets b
  JOIN probes pr ON pr.qid = b.qid
  JOIN sub s1 ON s1.qid = b.qid AND s1.cid = b.cid AND s1.r = b.r
             AND s1.rn = b.off + b.sz
  JOIN sub s2 ON s2.qid = b.qid AND s2.cid = b.cid AND s2.r = b.r
             AND s2.rn = b.off + 1
  GROUP BY b.qid, b.cid, b.r),
scaffold AS (SELECT cv.qid, cv.cid, h.r FROM cover cv CROSS JOIN hash h),
cell_row AS (
  SELECT sc.qid, sc.cid, sc.r, COALESCE(hi.hs, 0.0) AS hs
  FROM scaffold sc
  LEFT JOIN hist hi ON hi.qid = sc.qid AND hi.cid = sc.cid
                   AND hi.r = sc.r),
cell_est AS (
  SELECT qid, cid, CAST(FLOOR(MIN(hs)) AS BIGINT) AS est
  FROM cell_row GROUP BY qid, cid),
est AS (
  SELECT qid, CAST(SUM(est) AS BIGINT) AS est FROM cell_est GROUP BY qid),
truth AS (
  SELECT pr.qid, COALESCE(SUM(e.value), 0) AS t
  FROM probes pr
  LEFT JOIN geo e
    ON e.x BETWEEN pr.x1 AND pr.x2 AND e.y BETWEEN pr.y1 AND pr.y2
   AND e.item = pr.qitem AND e.ts >= pr.t0
  GROUP BY pr.qid),
l1 AS (
  SELECT pr.qid, COALESCE(SUM(e.value), 0) AS l1
  FROM probes pr
  LEFT JOIN geo e
    ON e.x BETWEEN pr.x1 AND pr.x2 AND e.y BETWEEN pr.y1 AND pr.y2
   AND e.ts >= pr.t0
  GROUP BY pr.qid)
SELECT CAST(e.qid AS BIGINT) AS qid, CAST(e.est AS BIGINT) AS est,
       CAST(CASE WHEN 2 * e.est >= t.t - 6
                  AND e.est <= 1.5 * t.t + 0.1 * l.l1 + 3
             THEN 1 ELSE 0 END AS BIGINT) AS ok
FROM est e JOIN truth t ON t.qid = e.qid JOIN l1 l ON l.qid = e.qid
ORDER BY qid
"""


# --- Elastic frequency (same-budget-vs-CM margin) ---------------------------

def q_env_freq_elastic(spark, sf_dir) -> DataFrame:
    """ElasticSketch (B9) end to end: per-probe (qid, est, ok) with
    never-underestimate within the CM-style overshoot margin, PLUS the
    same-budget claim — the elastic kernel's total absolute error on
    the probe set is no worse than the CM's at the identical counter
    budget (the heavy/light separation win, reference vendored
    ElasticSketch; measured ~35% lower error on Zipf(1.3) in tests).

    Round 6 upgrade (VERDICT r5 #4): the gate store is a SINGLE-partial
    build, so each probed cell's heavy/light state is the ts-ordered
    sequential vote/evict fold — a process the DuckDB oracle now
    REPLAYS event-by-event per (cell, bucket) with a recursive CTE and
    compares est bit-for-bit (the last literal-1s envelope is gone).
    The aggregate row's est is the total |err| itself, also
    bit-compared against the oracle's replayed value."""
    st = _store(spark, sf_dir, "elastic")
    eng = SpatialSketchEngine(st)
    qs = [QuerySpec(i, [r], "freq", item=it)
          for i, (r, it, _) in enumerate(CM_PROBES)]
    est = eng.query(qs)
    truth = _truth(spark, sf_dir, CM_PROBES)
    n_stream = st.manifest["input_fingerprint"]["n_events"]
    margin = int(0.05 * n_stream) + 1
    per_probe = (est.join(truth, "qid")
                 .select("qid",
                         F.col("est").cast("bigint").alias("est"),
                         ((F.col("est") >= F.col("truth"))
                          & (F.col("est") <= F.col("truth") + margin))
                         .cast("bigint").alias("ok")))
    # aggregate same-budget row: sum|err|_elastic <= sum|err|_cm
    cm_est = SpatialSketchEngine(_store(spark, sf_dir, "cm")).query(qs)
    err = lambda e: (e.join(truth, "qid")
                     .agg(F.sum(F.abs(F.col("est") - F.col("truth")))
                          .alias("terr")))
    agg = (err(est).crossJoin(err(cm_est).withColumnRenamed("terr", "cm"))
           .select(F.lit(len(CM_PROBES)).cast("bigint").alias("qid"),
                   F.col("terr").cast("bigint").alias("est"),
                   (F.col("terr") <= F.col("cm")).cast("bigint")
                   .alias("ok")))
    return per_probe.unionByName(agg).orderBy("qid")


def oracle_env_freq_elastic() -> str:
    """Full DuckDB replay of the elastic gate (VERDICT r5 #4): the
    heavy-part vote/evict state machine is order-DEPENDENT, so an
    unordered aggregation can't rebuild it — but given the gate store's
    single-partial build the per-cell state is exactly the ts-ordered
    fold, and a recursive CTE steps it event by event per (probe,
    cover-cell, bucket): heavy bucket = LIST<STRUCT(k,c,fl)> capped at
    ``slots``; matched key adds f; room installs (f, flag 0); full
    bucket votes guard+1 and once guard >= λ·min-count evicts the
    (count, key)-min entry to the light part and installs (f, flag 1),
    else the arriving mass goes to light (kernels.py _insert_seq,
    reference HeavyPart.h:110-160 Ostracism). Only contributions to the
    probe item's light position are accumulated (``ladd``); the final
    estimate replays query_item: resident&flag0 -> heavy count,
    resident&flag1 -> heavy+light, absent -> light. est is compared
    BIT-FOR-BIT per probe, and the aggregate same-budget row replays
    the CM estimates with the env_freq_cm counter CTEs."""
    from .core.dyadic import cover_2d
    from .core.kernels import CMKernel, make_kernel
    from .geo.events import geo_events_sql
    import numpy as np
    cfg = _realistic_cfg()
    ek = make_kernel("elastic", cfg)
    ck = CMKernel(cfg.cm_width, cfg.cm_depth, cfg.seed)
    log_n = cfg.levels - 1
    cover, probes = [], []
    for qid, (rect, item, _) in enumerate(CM_PROBES):
        x1, y1, x2, y2 = rect
        bp, lp = ek._positions(np.array([item], dtype=np.int64))
        probes.append(f"({qid},{item},{int(bp[0])},{int(lp[0])})")
        for ci, (kx, ky, cx, cy, cov) in enumerate(
                cover_2d(x1, y1, x2, y2, log_n, MIN_LEVEL, MIN_LEVEL)):
            assert cov == 1.0, "envelope probes must be block-aligned"
            cover.append(f"({qid},{ci},{cx << kx},{((cx + 1) << kx) - 1},"
                         f"{cy << ky},{((cy + 1) << ky) - 1})")
    (a0, b0), (a1, b1) = (int(v) for v in ek.coeffs[0]), \
        (int(v) for v in ek.coeffs[1])
    P, nb, slots, lw, lam = 2147483647, ek.b, ek.slots, ek.lw, ek.lam
    hrows = ",".join(f"({r},{int(a)}::BIGINT,{int(b)}::BIGINT)"
                     for r, (a, b) in enumerate(ck.coeffs))
    w = ck.w
    n_probes = len(CM_PROBES)
    return f"""
WITH RECURSIVE geo AS ({geo_events_sql(N)}),
cover(qid, cid, cx1, cx2, cy1, cy2) AS (VALUES {",".join(cover)}),
probes(qid, qitem, qbp, qlp) AS (VALUES {",".join(probes)}),
sev AS (
  SELECT pr.qid, cv.cid, pr.qlp,
         (({a0} * e.item + {b0}) % {P}) % {nb} AS bp,
         e.item AS k, e.value AS f,
         ROW_NUMBER() OVER (
           PARTITION BY pr.qid, cv.cid,
                        (({a0} * e.item + {b0}) % {P}) % {nb}
           ORDER BY e.ts) AS seq
  FROM cover cv JOIN probes pr USING (qid)
  JOIN geo e ON e.x BETWEEN cv.cx1 AND cv.cx2
            AND e.y BETWEEN cv.cy1 AND cv.cy2
),
grp AS (SELECT DISTINCT qid, cid, qlp, bp FROM sev),
rec AS (
  SELECT qid, cid, qlp, bp, CAST(0 AS BIGINT) AS seq,
         CAST([] AS STRUCT(k BIGINT, c BIGINT, fl BIGINT)[]) AS heavy,
         CAST(0 AS BIGINT) AS guard, CAST(0 AS BIGINT) AS ladd
  FROM grp
  UNION ALL
  SELECT r.qid, r.cid, r.qlp, r.bp, e.seq,
    CASE WHEN aux.matched
           THEN list_transform(r.heavy, x -> CASE WHEN x.k = e.k
                THEN {{'k': x.k, 'c': x.c + e.f, 'fl': x.fl}}
                ELSE x END)
         WHEN aux.room
           THEN list_append(r.heavy,
                {{'k': e.k, 'c': e.f, 'fl': CAST(0 AS BIGINT)}})
         WHEN aux.evict
           THEN list_append(list_filter(r.heavy, x -> x.k <> aux.mk),
                {{'k': e.k, 'c': e.f, 'fl': CAST(1 AS BIGINT)}})
         ELSE r.heavy END AS heavy,
    CASE WHEN aux.matched OR aux.room THEN r.guard
         WHEN aux.evict THEN 0
         ELSE r.guard + 1 END AS guard,
    r.ladd + CASE
      WHEN aux.matched OR aux.room THEN 0
      WHEN aux.evict THEN
        CASE WHEN (({a1} * aux.mk + {b1}) % {P}) % {lw} = r.qlp
             THEN aux.mc ELSE 0 END
      ELSE
        CASE WHEN (({a1} * e.k + {b1}) % {P}) % {lw} = r.qlp
             THEN e.f ELSE 0 END END AS ladd
  FROM rec r
  JOIN sev e ON e.qid = r.qid AND e.cid = r.cid AND e.bp = r.bp
            AND e.seq = r.seq + 1
  CROSS JOIN LATERAL (
    SELECT len(list_filter(r.heavy, x -> x.k = e.k)) > 0 AS matched,
           len(r.heavy) < {slots} AS room,
           list_sort(list_transform(
               r.heavy, x -> {{'c': x.c, 'k': x.k}}))[1] AS me
  ) a0
  CROSS JOIN LATERAL (
    SELECT NOT a0.matched AND NOT a0.room
             AND r.guard + 1 >= {lam} * a0.me.c AS evict,
           a0.matched AS matched, a0.room AS room,
           a0.me.k AS mk, a0.me.c AS mc
  ) aux
),
fs AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY qid, cid, bp
                                 ORDER BY seq DESC) AS rn
    FROM rec) WHERE rn = 1
),
light AS (SELECT qid, cid, SUM(ladd) AS l FROM fs GROUP BY 1, 2),
hv AS (
  SELECT f.qid, f.cid, list_filter(f.heavy, x -> x.k = pr.qitem) AS ent
  FROM fs f JOIN probes pr USING (qid)
  WHERE f.bp = pr.qbp
),
cell_est AS (
  SELECT cv.qid, cv.cid,
    CASE WHEN COALESCE(len(h.ent), 0) > 0 AND h.ent[1].fl = 0
           THEN h.ent[1].c
         WHEN COALESCE(len(h.ent), 0) > 0
           THEN h.ent[1].c + COALESCE(l.l, 0)
         ELSE COALESCE(l.l, 0) END AS est
  FROM cover cv
  LEFT JOIN light l ON l.qid = cv.qid AND l.cid = cv.cid
  LEFT JOIN hv h ON h.qid = cv.qid AND h.cid = cv.cid
),
est AS (SELECT qid, CAST(SUM(est) AS BIGINT) AS est
        FROM cell_est GROUP BY qid),
hash(r, a, b) AS (VALUES {hrows}),
cmcounters AS (
  SELECT cv.qid, cv.cid, h.r, COALESCE(SUM(e.value), 0) AS cnt
  FROM cover cv
  JOIN probes pr ON pr.qid = cv.qid
  CROSS JOIN hash h
  LEFT JOIN geo e
    ON e.x BETWEEN cv.cx1 AND cv.cx2
   AND e.y BETWEEN cv.cy1 AND cv.cy2
   AND ((h.a * e.item + h.b) % {P}) % {w}
       = ((h.a * pr.qitem + h.b) % {P}) % {w}
  GROUP BY cv.qid, cv.cid, h.r),
cmest AS (
  SELECT qid, CAST(SUM(est) AS BIGINT) AS est FROM (
    SELECT qid, cid, MIN(cnt) AS est FROM cmcounters GROUP BY qid, cid)
  GROUP BY qid),
truth AS (
  SELECT pr.qid, COALESCE(SUM(e.value), 0) AS t
  FROM probes pr
  JOIN cover cv ON cv.qid = pr.qid
  LEFT JOIN geo e
    ON e.x BETWEEN cv.cx1 AND cv.cx2 AND e.y BETWEEN cv.cy1 AND cv.cy2
   AND e.item = pr.qitem
  GROUP BY pr.qid),
mass AS (SELECT COUNT(*) AS n FROM geo),
per_probe AS (
  SELECT CAST(e.qid AS BIGINT) AS qid, CAST(e.est AS BIGINT) AS est,
         CAST(CASE WHEN e.est >= t.t
                    AND e.est <= t.t
                        + CAST(FLOOR(0.05 * m.n) AS BIGINT) + 1
               THEN 1 ELSE 0 END AS BIGINT) AS ok
  FROM est e JOIN truth t ON t.qid = e.qid CROSS JOIN mass m),
agg AS (
  SELECT CAST({n_probes} AS BIGINT) AS qid,
         CAST(el.terr AS BIGINT) AS est,
         CAST(CASE WHEN el.terr <= cm.terr THEN 1 ELSE 0 END
              AS BIGINT) AS ok
  FROM (SELECT SUM(ABS(e.est - t.t)) AS terr
        FROM est e JOIN truth t USING (qid)) el,
       (SELECT SUM(ABS(c.est - t.t)) AS terr
        FROM cmest c JOIN truth t USING (qid)) cm)
SELECT * FROM per_probe UNION ALL SELECT * FROM agg ORDER BY qid
"""


ENVELOPE_GATE = {
    # ALL five lossy kernels now carry FULL DuckDB recomputation
    # oracles (r6): hash family counters, trailing-zero bitmaps,
    # exponential histograms rebuilt in SQL — and the elastic
    # vote/evict state machine replayed event-by-event with a
    # recursive CTE (single-partial gate store = ts-ordered fold);
    # every est is compared bit-for-bit
    "env_freq_cm": (q_env_freq_cm, oracle_env_freq_cm),
    "env_distinct_fm": (q_env_distinct_fm, oracle_env_distinct_fm),
    "env_member_bf": (q_env_member_bf, oracle_env_member_bf),
    "env_window_ecm": (q_env_window_ecm, oracle_env_window_ecm),
    "env_freq_elastic": (q_env_freq_elastic, oracle_env_freq_elastic),
}
