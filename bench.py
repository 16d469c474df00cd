#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line:
{"metric": ..., "value": N, "unit": "q/s", "queries": {...}, "sf": ...}
(the "queries" block itself is per-phase wall seconds)

Headline components (BASELINE.json metric):
- sketch-build rows/s: realistic-CM capped-pyramid build over the
  replicated geo-event stream (zorder locality mode)
- polygon range-count q/s at <=5% relative error: 100 random placements
  x 3 fixture polygons, answered as ONE batched cover join, accuracy
  verified against exact Spark SQL in the same run
- pipeline ops: exact dedup, minhash-LSH, token stats, PIP join, kNN,
  cosine top-k

env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), BENCH_REPLICATION (default 20).

--scaling runs the same workload at two parallelism levels in
subprocesses (local[8] vs local[32]) and reports scaling efficiency —
the sandbox evidence for the N-vs-4N-executors criterion (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REP = int(os.environ.get("BENCH_REPLICATION", "20"))
N_PLACEMENTS = int(os.environ.get("BENCH_PLACEMENTS", "100"))

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def replicated_events(spark, sf_dir: str, n: int, rep: int):
    """Deterministic bench stream: REP shifted copies of the derived
    geo events (unique ts per copy; x/y translated per copy so cells
    differ). Pure column arithmetic."""
    from pyspark.sql import functions as F
    from spatialsketch_spark.geo.events import derive_geo_events
    ev = derive_geo_events(spark, sf_dir, n)
    if rep <= 1:
        return ev
    r = spark.range(rep).withColumnRenamed("id", "rep")
    return (ev.crossJoin(F.broadcast(r))
            .select((F.col("ts") + F.col("rep") * 100_000_000).alias("ts"),
                    "item",
                    ((F.col("x") + F.col("rep") * 1009) % n).alias("x"),
                    ((F.col("y") + F.col("rep") * 2003) % n).alias("y"),
                    "value"))


def run_bench(cpus: int) -> dict:
    from pyspark.sql import functions as F
    from spatialsketch_spark.config import SketchConfig, get_spark
    from spatialsketch_spark.gate import (
        MIN_LEVEL, N, POLYGONS, exact_store)
    from spatialsketch_spark.geo.build import SketchStore
    from spatialsketch_spark.geo.events import ITEM_DOMAIN, derive_geo_events
    from spatialsketch_spark.geo.query import QuerySpec, SpatialSketchEngine
    from spatialsketch_spark.core.partitioner import shape_to_ranges

    spark = get_spark("bench", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}
    t_all = time.time()

    # warm up the Python worker pool (Arrow workers fork lazily; without
    # this the first timed op absorbs 32 process spin-ups)
    import pandas as _pd
    spark.range(0, cpus * 1000, 1, cpus).mapInPandas(
        lambda it: (pdf for pdf in it), "id long") \
        .write.format("noop").mode("overwrite").save()

    # ---- 1. sketch build (realistic CM, colocate mode) ----------------
    ev = replicated_events(spark, SF_DIR, N, REP).cache()
    n_rows = ev.count()
    cfg = SketchConfig.realistic(n=N, eps=0.1, delta=0.05,
                                 item_domain=ITEM_DOMAIN)
    # warm pass: small build compiles the whole-stage codegen + shuffle
    # paths (JIT); the timed build then measures steady-state throughput
    # (the regime a multi-hour 100 TB build runs in)
    from spatialsketch_spark.geo.build import build_sketch_df
    build_sketch_df(ev.limit(50_000), cfg, "cm", MIN_LEVEL,
                    mode="zorder").write.format("noop").mode("overwrite").save()
    build_trials = int(os.environ.get("BENCH_BUILD_TRIALS", "1"))
    t_build = None
    store = None
    for _ in range(build_trials):
        ev.agg(F.max("ts")).collect()   # re-fault the cache before timing
        if store is not None:
            store.df.unpersist()
        store = SketchStore.build(spark, ev, cfg, "cm", MIN_LEVEL,
                                  mode="zorder")
        t = store.manifest["metrics"]["build_core_wall_s"]
        t_build = t if t_build is None else min(t_build, t)
    n_cells = store.manifest["metrics"]["sketch_cells"]
    timings["build_cm"] = round(t_build, 3)
    build_rows_s = n_rows / t_build

    # ---- 2. polygon range-count queries (batched) ---------------------
    # deterministic placements, snapped to the 16-cell alignment so
    # coverage stays exact (reference: 100 random offsets/query,
    # experiments.cpp:33). Headline = region COUNT (reference Fig. 4d
    # polygon count queries); per-item FREQ queries additionally report
    # the reference's normalized error errN = |est-gt| / N_stream
    # (experiments.cpp:824-845) since a 256-item uniform domain leaves
    # per-item ground truth below the eps*L1 CM resolution.
    queries = []
    placements = []
    qid = 0
    for i in range(N_PLACEMENTS):
        for p_idx, poly in enumerate(POLYGONS):
            dx = ((i * 997 + p_idx * 131) % 64) * 16
            dy = ((i * 641 + p_idx * 313) % 64) * 16
            item = (i * 7 + p_idx) % ITEM_DOMAIN
            queries.append(QuerySpec.from_shape(
                qid, poly, "count", x_off=dx, y_off=dy))
            placements.append((poly, dx, dy, item, "count"))
            qid += 1
            queries.append(QuerySpec.from_shape(
                qid, poly, "freq", item=item, x_off=dx, y_off=dy))
            placements.append((poly, dx, dy, item, "freq"))
            qid += 1
    eng = SpatialSketchEngine(store)
    # warm pass (plan + code paths), then the timed steady-state pass —
    # the reference also reports warm-structure query times (Table 3).
    # query_values = the low-latency batch surface (driver partial
    # fold; identical answers to query(), pinned by test_plans) — the
    # engine's serving path, matching the reference's in-process query
    # API shape (SpatialSketch.cpp:837-855 returns scalars too)
    eng.query_values(queries[:6])
    t_query = None
    for _ in range(int(os.environ.get("BENCH_QUERY_TRIALS", "1"))):
        t0 = time.time()
        res = eng.query_values(queries)
        t = time.time() - t0
        t_query = t if t_query is None else min(t_query, t)
    timings["polygon_queries"] = round(t_query, 3)
    q_per_s = len(queries) / t_query

    # ---- 3. accuracy vs exact (broadcast rect join, one pass) ----------
    t0 = time.time()
    skip_acc = os.environ.get("BENCH_SKIP_ACCURACY") == "1"
    # subsample placements for the truth join (it is a verification pass,
    # not part of the measured metric; the estimator is deterministic so
    # a 1-in-5 sample bounds the same error)
    sample = (set() if skip_acc else
              {i for i in range(len(placements)) if i % 5 == 0})
    # grid-partitioned spatial join (r6, VERDICT r5 #3): the r4/r5
    # shape was a BroadcastNestedLoopJoin evaluating EVERY (event,
    # rect) pair — O(|ev| x 120) predicate rounds, cold-cache-bound.
    # Pre-exploding each rect onto the 256x256 super-blocks it touches
    # turns it into a Broadcast HASH join on the block key with a
    # residual between-filter: per-event work = rects overlapping its
    # block (usually 0-3), not all 120. Identical integer sums.
    SB = 256
    srows = []
    for i, (poly, dx, dy, item, kindq) in enumerate(placements):
        if i not in sample:
            continue
        for x1, y1, x2, y2 in shape_to_ranges(poly, dx, dy):
            for sbx in range(x1 // SB, x2 // SB + 1):
                for sby in range(y1 // SB, y2 // SB + 1):
                    srows.append((i, sbx, sby, x1, y1, x2, y2,
                                  item if kindq == "freq" else -1))
    truths = {}
    if srows:
        rects = spark.createDataFrame(
            srows, "qid BIGINT, sbx BIGINT, sby BIGINT, x1 BIGINT, "
                   "y1 BIGINT, x2 BIGINT, y2 BIGINT, q_item BIGINT")
        resid = (F.col("x").between(F.col("x1"), F.col("x2"))
                 & F.col("y").between(F.col("y1"), F.col("y2"))
                 & ((F.col("q_item") == -1)
                    | (F.col("q_item") == F.col("item"))))
        truth_df = (ev.withColumn("sbx", F.expr(f"x div {SB}"))
                    .withColumn("sby", F.expr(f"y div {SB}"))
                    .join(F.broadcast(rects), ["sbx", "sby"])
                    .where(resid)
                    .groupBy("qid").agg(F.sum("value").alias("truth"))
                    .collect())
        truths = {r["qid"]: r["truth"] for r in truth_df}
    count_rel_errs, freq_errn = [], []
    for i, (poly, dx, dy, item, kindq) in enumerate(placements):
        if i not in sample:
            continue
        truth = truths.get(i, 0)
        est = res.get(i, 0)
        if kindq == "count" and truth > 0:
            count_rel_errs.append(abs(est - truth) / truth)
        elif kindq == "freq":
            freq_errn.append(abs(est - truth) / n_rows)
    mean_err = sum(count_rel_errs) / max(len(count_rel_errs), 1)
    mean_errn = sum(freq_errn) / max(len(freq_errn), 1)
    timings["accuracy_check"] = round(time.time() - t0, 3)

    # ---- 3b. PIP-join throughput (pure JVM codegen; the north-rule
    # join path whose throughput must scale N -> 4N) ---------------------
    from spatialsketch_spark.geo.joins import pip_join
    pip_factor = int(os.environ.get("BENCH_PIP_FACTOR", "1"))
    pip_ev = ev
    if pip_factor > 1:
        pr = spark.range(pip_factor).withColumnRenamed("id", "prep")
        pip_ev = ev.crossJoin(F.broadcast(pr)).drop("prep")
    pip_rows = n_rows * pip_factor
    pip_join(pip_ev.limit(100_000), POLYGONS, "broadcast").write \
        .format("noop").mode("overwrite").save()      # warm
    t_pip = None
    for _ in range(int(os.environ.get("BENCH_PIP_TRIALS", "2"))):
        t0 = time.time()
        pip_join(pip_ev, POLYGONS, "broadcast").write \
            .format("noop").mode("overwrite").save()
        t = time.time() - t0
        t_pip = t if t_pip is None else min(t_pip, t)
    timings["pip_join_full"] = round(t_pip, 3)
    pip_rows_s = pip_rows / t_pip

    # ---- 4. pipeline ops ----------------------------------------------
    ev.unpersist()
    store.df.unpersist()
    from spatialsketch_spark.gate import GATE_QUERIES
    skip_pipe = os.environ.get("BENCH_SKIP_PIPELINE") == "1"
    pipe_trials = int(os.environ.get("BENCH_PIPE_TRIALS", "2"))
    for name in ([] if skip_pipe else ["doc_exact_dedup", "doc_minhash_lsh", "doc_token_stats",
                 "doc_seq_pack", "doc_tfidf", "doc_url_dedup",
                 "emb_cosine_topk", "emb_ivf_topk", "emb_pq_topk",
                 "geo_pip_assign", "geo_knn", "geo_cap_filter",
                 "geo_hotspot", "geo_zorder_layout",
                 "geo_hilbert_layout", "geo_geohash_rollup",
                 # r7 additions: quantile sketch, blocked fuzzy
                 # matching, ranking-window family, trained-IVF search
                 "doc_gk_quantiles", "doc_fuzzy_pairs",
                 "rel_rank_family", "emb_ivf_trained_topk",
                 # r7 session 3: windowed hist quantiles, HLL,
                 # stride chunking, overlap join, hex reader rewrite,
                 # batched corridors, distance join
                 "evt_window_quantiles", "evt_hll_distinct",
                 "doc_stride_chunks", "tmp_overlap_join",
                 "geo_hex_cell_reader", "geo_corridor_batch",
                 "geo_distance_join"]):
        fn = GATE_QUERIES[name][0]
        best = None
        for _ in range(pipe_trials):   # best-of: the host's proactive
            t0 = time.time()           # page reclaim spikes single runs
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            t = time.time() - t0
            best = t if best is None else min(best, t)
        timings[name] = round(best, 3)

    # ---- 4b. ANN quality + graph analytics (r7 pointer items) ----------
    ann_recall = None
    graph_block = None
    if not skip_pipe:
        # trained-IVF recall@5 at the default probe budget vs the SAME
        # pipeline at full probe (pinned == brute force by
        # test_pipeline_ops): the accuracy knob the 100 TB operator
        # trades against the probed-fraction scan cost
        from spatialsketch_spark.gate_pipeline import EMB_QUERY_IDS, _emb
        from spatialsketch_spark.pipeline.similarity import (
            KMEANS_K, ivf_trained_topk)
        emb = _emb(spark, SF_DIR)
        approx = ivf_trained_topk(emb, EMB_QUERY_IDS, 5, nprobe=2)
        exact = ivf_trained_topk(emb, EMB_QUERY_IDS, 5, nprobe=KMEANS_K)
        hits = (approx.select("qid", "vec_id")
                .join(exact.select("qid", "vec_id"), ["qid", "vec_id"])
                .count())
        ann_recall = hits / (len(EMB_QUERY_IDS) * 5)
        # triangle count runs at the sf0.01 sibling (it is cubic-ish in
        # the densest degree bucket; sf0.1 ~ 311 s — a coverage phase,
        # not a throughput headline)
        from spatialsketch_spark.pipeline.events import (
            _events, triangle_counts)
        g_dir = os.environ.get(
            "BENCH_GRAPH_SF",
            os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.01"))
        if not os.path.isdir(g_dir):
            # a driver-generated SF_DIR may have no sf0.01 sibling;
            # skip the graph phase rather than crash the whole run
            graph_block = {"sf_dir": g_dir, "skipped": "missing dir"}
        else:
            tri = triangle_counts(_events(spark, g_dir))
            tri.limit(1).collect()                           # warm plan
            best = None
            for _ in range(pipe_trials):
                t0 = time.time()
                n_tri = tri.agg(
                    F.sum("n_triangles").alias("t")).collect()[0]["t"]
                t = time.time() - t0
                best = t if best is None else min(best, t)
            timings["evt_triangle_count"] = round(best, 3)
            graph_block = {"sf_dir": g_dir, "triangle_sum": int(n_tri),
                           "wall_s": round(best, 3)}

    # ---- 5. per-kind build+probe (reference Table 3 analogue) ----------
    kinds_block = None
    if os.environ.get("BENCH_SKIP_KINDS") != "1":
        try:
            kinds_block = run_kinds(spark)
        except Exception as e:      # a kinds failure must not zero the
            kinds_block = {"error": repr(e)}   # measured phases above

    total = time.time() - t_all
    spark.stop()
    return {
        "metric": "polygon_qps_at_le5pct_err",
        "value": round(q_per_s, 2),
        "unit": "q/s",
        "queries": timings,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "detail": {
            "cpus": cpus,
            "build_rows": n_rows,
            "build_rows_per_s": round(build_rows_s, 1),
            "sketch_cells": n_cells,
            "n_queries": len(queries),
            "polygon_q_per_s": round(q_per_s, 2),
            "pip_join_rows_per_s": round(pip_rows_s, 1),
            "count_mean_rel_err": round(mean_err, 5),
            "freq_mean_errN": round(mean_errn, 6),
            "err_le_5pct": bool(mean_err <= 0.05),
            "accuracy_skipped": skip_acc,
            # the error means above are computed over this fraction of
            # placements (deterministic 1-in-5 truth-join subsample —
            # a verification pass, not the measured metric; VERDICT r6
            # task 6 asks the artifact to say so)
            "accuracy_sample": 0.0 if skip_acc else round(
                len(sample) / max(len(placements), 1), 2),
            **({"ivf_trained_recall_at5": round(ann_recall, 3)}
               if ann_recall is not None else {}),
            **({"graph": graph_block} if graph_block else {}),
            "total_wall_s": round(total, 2),
            **({"kinds": kinds_block} if kinds_block else {}),
        },
    }


def run_kinds(spark) -> dict:
    """Reference Table 3 analogue (BASELINE.md rows 3-8): build a store
    for EACH kernel kind at small scale, probe its native query class,
    and report ingestion rows/s, probe wall, observed error, and whether
    every probe honored the kernel's proven envelope (the same envelopes
    the env_* gates assert). Scale via BENCH_KINDS_SF (default: the
    sf0.01 sibling of SPARK_GRAFT_SF_DIR — small on purpose: this phase
    measures PER-KERNEL cost shape, not cluster throughput)."""
    from pyspark.sql import functions as F
    from spatialsketch_spark.config import SketchConfig
    from spatialsketch_spark.gate import MIN_LEVEL, N
    from spatialsketch_spark.gate_envelope import (
        BF_PROBES, CM_PROBES, ECM_PROBES, FM_PROBES, _truth)
    from spatialsketch_spark.geo.build import SketchStore
    from spatialsketch_spark.geo.events import ITEM_DOMAIN, derive_geo_events
    from spatialsketch_spark.geo.query import QuerySpec, SpatialSketchEngine

    sf_dir = os.environ.get(
        "BENCH_KINDS_SF",
        os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.01"))
    ev = derive_geo_events(spark, sf_dir, N).cache()
    n_rows = ev.count()
    mass = n_rows  # unit weights: stream mass == row count
    dcm_probes = [(r, a, b) for (r, a, b) in
                  [((0, 0, 2047, 2047), 10, 20),
                   ((1024, 512, 3071, 1535), 0, 255),
                   ((2048, 2048, 4095, 4095), 100, 101)]]

    def specs(kind):
        if kind in ("cm", "elastic"):
            return [QuerySpec(i, [r], "freq", item=it)
                    for i, (r, it, _) in enumerate(CM_PROBES)]
        if kind == "fm":
            return [QuerySpec(i, [r], "distinct")
                    for i, (r, _, _) in enumerate(FM_PROBES)]
        if kind == "bf":
            return [QuerySpec(i, [r], "member", item=it)
                    for i, (r, it, _) in enumerate(BF_PROBES)]
        if kind == "ecm":
            return [QuerySpec(i, [r], "window", item=it, t0=t0)
                    for i, (r, it, t0) in enumerate(ECM_PROBES)]
        return [QuerySpec(i, [r], "range_freq", item=a, item_end=b)
                for i, (r, a, b) in enumerate(dcm_probes)]

    def truth_for(kind):
        if kind in ("cm", "elastic"):
            return _truth(spark, sf_dir, CM_PROBES)
        if kind == "fm":
            return _truth(spark, sf_dir, FM_PROBES, distinct=True)
        if kind == "bf":
            # membership truth: any event with the probe item in region
            t = _truth(spark, sf_dir, BF_PROBES)
            return t.select("qid", (F.col("truth") > 0).cast("bigint")
                            .alias("truth"))
        return _truth(spark, sf_dir, ECM_PROBES, t0_col=True)

    def dcm_truth():
        rows = [(i, *r, a, b) for i, (r, a, b) in enumerate(dcm_probes)]
        rects = spark.createDataFrame(
            rows, "qid BIGINT, x1 BIGINT, y1 BIGINT, x2 BIGINT, "
                  "y2 BIGINT, a BIGINT, b BIGINT")
        cond = (F.col("x").between(F.col("x1"), F.col("x2"))
                & F.col("y").between(F.col("y1"), F.col("y2"))
                & F.col("item").between(F.col("a"), F.col("b")))
        t = (ev.join(F.broadcast(rects), cond)
             .groupBy("qid").agg(F.sum("value").alias("truth")))
        qids = spark.createDataFrame([(q,) for q in range(len(dcm_probes))],
                                     "qid BIGINT")
        return qids.join(t, "qid", "left").select(
            "qid", F.coalesce("truth", F.lit(0)).alias("truth"))

    out = {"sf_dir": sf_dir, "rows": n_rows}
    for kind in ("cm", "elastic", "bf", "fm", "ecm", "dcm"):
        if kind == "dcm":
            cfg = SketchConfig(n=N, eps=0.1, delta=0.05,
                               item_domain=ITEM_DOMAIN, dcm_exact_levels=9)
        else:
            cfg = SketchConfig.realistic(n=N, eps=0.1, delta=0.05,
                                         item_domain=ITEM_DOMAIN)
        t0 = time.time()
        st = SketchStore.build(spark, ev, cfg, kind, MIN_LEVEL)
        st.df = st.df.cache()
        st.df.count()
        t_build = time.time() - t0
        eng = SpatialSketchEngine(st)
        qs = specs(kind)
        eng.query(qs[:1]).collect()                       # warm plan
        t0 = time.time()
        est = {r["qid"]: r["est"] for r in eng.query(qs).collect()}
        t_query = time.time() - t0
        truth_df = dcm_truth() if kind == "dcm" else truth_for(kind)
        truth = {r["qid"]: r["truth"] for r in truth_df.collect()}
        l1 = {}
        if kind == "ecm":
            # region window mass: the ECM envelope's collision term is
            # eps*L1 (same two-term bound as gate_envelope's ECM gate)
            probes = [(r, -1, t0) for (r, _, t0) in ECM_PROBES]
            l1 = {r["qid"]: r["truth"] for r in
                  _truth(spark, sf_dir, probes, t0_col=True).collect()}
        errs, oks = [], []
        for q in qs:
            e, t = est[q.qid], truth[q.qid]
            if kind in ("cm", "elastic", "dcm"):
                # CM-family: never underestimate; overshoot <= eps·mass
                # per dyadic term (dcm ranges decompose into <= 2·log2
                # (domain) CM intervals -> proportionally wider margin)
                terms = 1 if kind != "dcm" else 16
                errs.append(abs(e - t) / max(mass, 1))
                oks.append(e >= t and e <= t + 0.05 * mass * terms + 1)
            elif kind == "fm":
                errs.append(abs(e - t) / max(t, 1))
                oks.append(t / 4 <= e <= 4 * t if t > 0 else e <= 4)
            elif kind == "bf":
                errs.append(float(e != t))
                oks.append(e >= t)                 # no false negatives
            else:                                   # ecm: EH half-bucket
                # (±0.5·truth) + CM collision overshoot (eps·region L1)
                errs.append(abs(e - t) / max(l1[q.qid], 1))
                oks.append(2 * e >= t - 6
                           and e <= 1.5 * t + 0.1 * l1[q.qid] + 3)
        out[kind] = {
            "build_s": round(t_build, 3),
            "build_rows_per_s": round(n_rows / t_build, 1),
            "probe_s": round(t_query, 3),
            "mean_err": round(sum(errs) / len(errs), 6),
            "in_envelope": bool(all(oks)),
        }
        st.df.unpersist()
    ev.unpersist()
    return out


def _prev_round_timings() -> tuple[str, dict] | None:
    """Latest BENCH_r{N}.json in the repo root — so every bench run
    prints per-phase deltas against the previous round and regressions
    are visible immediately."""
    import glob
    import re
    cands = []
    here = os.path.dirname(os.path.abspath(__file__))
    for p in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.match(r"BENCH_r(\d+)\.json$", os.path.basename(p))
        if m:
            cands.append((int(m.group(1)), p))
    # newest round first; skip artifacts whose "parsed" is null (a
    # driver tail-capture miss, e.g. BENCH_r07.json) instead of crashing
    for rnd, path in sorted(cands, reverse=True):
        try:
            with open(path) as f:
                prev = json.load(f)
            parsed = prev.get("parsed", prev)
            if not isinstance(parsed, dict):
                continue
            return f"r{rnd}", parsed.get("sf"), parsed.get("queries", {})
        except (OSError, ValueError):
            continue
    return None


def with_deltas(result: dict) -> dict:
    prev = _prev_round_timings()
    if prev is None:
        return result
    tag, prev_sf, pq = prev
    if prev_sf != result.get("sf"):
        return result       # cross-sf ratios would be meaningless
    deltas = {}
    for phase, secs in result.get("queries", {}).items():
        if phase in pq and pq[phase]:
            deltas[phase] = round(secs / pq[phase], 3)   # <1 = faster
    if deltas:
        result["detail"]["speed_ratio_vs_" + tag] = deltas
    return result


def headline_line(result: dict, detail_rel_path: str | None) -> str:
    """The ONE final stdout line: contract fields only (metric, value,
    unit, per-phase queries seconds, sf) + detail artifact pointer.
    Must stay well under the driver's 2000-char tail buffer."""
    line = {k: result[k] for k in ("metric", "value", "unit",
                                   "queries", "sf") if k in result}
    if detail_rel_path:
        line["detail_path"] = detail_rel_path
    out = json.dumps(line)
    if len(out) >= 1900 and "detail_path" in line:   # never crash here;
        del line["detail_path"]                      # pytest pins length
        out = json.dumps(line)
    return out


def main():
    if "--scaling" in sys.argv:
        # N-vs-4N evidence: same input, local[8] pinned to 8 cores via
        # taskset vs local[32] on all 32 (without pinning, the 8-thread
        # JVM still uses all cores for GC/IO/python workers, deflating
        # measured efficiency). Workload scaled up so compute dominates
        # fixed job overhead (the regime the 100 TB target lives in).
        env = dict(os.environ)
        env.setdefault("BENCH_REPLICATION", "160")
        env.setdefault("BENCH_PLACEMENTS", "1600")
        env.setdefault("BENCH_SKIP_ACCURACY", "1")
        env.setdefault("BENCH_SKIP_PIPELINE", "1")
        env.setdefault("BENCH_SKIP_KINDS", "1")   # scaling measures the
        # three throughput phases only; the per-kind block is fixed-cost
        env.setdefault("BENCH_BUILD_TRIALS", "2")
        env.setdefault("BENCH_PIP_FACTOR", "8")
        env.setdefault("BENCH_QUERY_TRIALS", "2")
        results = {}
        first = True
        for cpus in (8, 32):
            if not first:
                time.sleep(45)   # let the host's proactive page reclaim
                                 # settle between levels (see BASELINE.md)
            first = False
            cmd = [sys.executable, os.path.abspath(__file__), "--cpus",
                   str(cpus)]
            if os.path.exists("/usr/bin/taskset"):
                cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 check=True, env=env)
            line = [l for l in out.stdout.splitlines()
                    if l.startswith("{")][-1]
            results[cpus] = json.loads(line)
        r8, r32 = results[8]["detail"], results[32]["detail"]
        eff_build = (r32["build_rows_per_s"] / r8["build_rows_per_s"]) / 4.0
        eff_query = (r32["polygon_q_per_s"] / r8["polygon_q_per_s"]) / 4.0
        eff_pip = (r32["pip_join_rows_per_s"] / r8["pip_join_rows_per_s"]) / 4.0
        print(json.dumps({
            "scaling": {
                "cpus_8": r8, "cpus_32": r32,
                "build_scaling_efficiency_8_to_32": round(eff_build, 3),
                "query_scaling_efficiency_8_to_32": round(eff_query, 3),
                "pip_join_scaling_efficiency_8_to_32": round(eff_pip, 3),
            }}))
        return
    cpus = CPUS
    if "--cpus" in sys.argv:
        cpus = int(sys.argv[sys.argv.index("--cpus") + 1])
    result = with_deltas(run_bench(cpus))
    # The driver captures only the last ~2000 chars of stdout; r7's
    # full line (headline + queries + detail + kinds) outgrew that and
    # the round's headline went unrecorded (BENCH_r07.json parsed:
    # null; VERDICT r7 task 1). Keep the contract fields — metric/
    # value/unit/queries/sf — on the final line and move the bulky
    # "detail" map to a dist artifact referenced by path.
    here = os.path.dirname(os.path.abspath(__file__))
    detail_path = os.path.join(here, "dist", "bench_detail_last.json")
    try:
        os.makedirs(os.path.dirname(detail_path), exist_ok=True)
        with open(detail_path, "w") as f:
            json.dump(result, f, indent=1)
        rel = os.path.relpath(detail_path, here)
    except OSError:
        rel = None
    print(headline_line(result, rel))


if __name__ == "__main__":
    main()
