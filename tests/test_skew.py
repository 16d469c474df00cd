"""Skew stress for the user_id-shuffled event operators (VERDICT r5
task 8). The adversarial clickstream shape is one bot/power user
owning a large fraction of all events: groupBy-based ops (funnel,
retention) are structurally immune because their aggregates are
map-side partial — the hot user collapses to one row per partition
before the shuffle — but per-user WINDOW ops (transitions,
session_paths) put the hot user's entire history into a single task.
``transitions(bucket_us=...)`` is the mitigation: pair extraction per
(user, time-bucket) with a min/max-struct boundary handoff, which
turns per-user skew into per-user-HOUR skew, tunable by bucket width.
These tests pin (a) exact result equality with the plain path on a
Zipf fixture and (b) the max-task-row bound itself.
"""

import pytest
from pyspark.sql import functions as F

from conftest import SF_ORACLE

HOT_FRAC = 0.4
N = 60_000
DAY_US = 86_400_000_000
HOUR_US = 3_600_000_000


@pytest.fixture(scope="module")
def zipf_events(spark):
    """Deterministic synthetic clickstream: user 0 owns 40% of all
    events; the rest hash-spread over 997 users. Timestamps spread
    over one day at micro resolution, unique event_ids."""
    types = F.array(*[F.lit(s) for s in
                      ("view", "click", "purchase", "scroll")])
    df = (spark.range(N).select(
        F.when(F.col("id") < int(N * HOT_FRAC), 0)
         .otherwise((F.col("id") * 2654435761) % 997 + 1)
         .cast("bigint").alias("user_id"),
        F.col("id").cast("bigint").alias("event_id"),
        F.element_at(types, ((F.col("id") * 40503) % 4 + 1).cast("int"))
         .alias("event_type"),
        F.expr(f"timestampadd(MICROSECOND, "
               f"cast((id * 1103515245 + 12345) % {DAY_US} as bigint), "
               f"TIMESTAMP_NTZ '2024-01-01 00:00:00')").alias("ts")))
    df = df.cache()
    df.count()
    return df


def test_transitions_bucketed_equals_plain(spark, zipf_events):
    """The bucketed pair extraction must produce the identical
    transition-count table: bucket boundaries are a function of ts, so
    within-bucket LEAD plus the boundary LEAD enumerate exactly the
    same consecutive-pair multiset as the per-user window."""
    from spatialsketch_spark.pipeline.events import transitions
    plain = sorted(map(tuple, transitions(zipf_events).collect()))
    bucketed = sorted(map(tuple, transitions(
        zipf_events, bucket_us=HOUR_US).collect()))
    assert plain == bucketed
    assert len(plain) > 4


def test_transitions_bucketed_bounds_task_skew(spark, zipf_events):
    """The documented max-task-skew assertion: hash-distributing the
    pair-extraction input on (user_id, bucket) must cap the largest
    task at a small multiple of the fair share, while the plain
    user_id distribution provably concentrates the hot user's 40% in
    one task. 24 hourly buckets split the hot user, so the expected
    hot mass per bucket is 40%/24 ≈ 1.7%; with 64 partitions a task
    collects a handful of hot buckets plus the uniform base — assert
    ≤ 10% (6x headroom over the expectation, immune to hash-collision
    noise) and ≥ 3x better than the plain distribution."""
    P = 64
    ts_us = F.expr("timestampdiff(MICROSECOND, "
                   "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    base = zipf_events.select("user_id", ts_us.alias("ts_us"))

    def max_share(df, *keys):
        parts = (df.repartition(P, *keys)
                 .select(F.spark_partition_id().alias("pid"))
                 .groupBy("pid").count().collect())
        return max(r["count"] for r in parts) / N

    plain = max_share(base, "user_id")
    bucketed = max_share(
        base.withColumn("_b", F.expr(f"ts_us div {HOUR_US}")),
        "user_id", "_b")
    assert plain >= HOT_FRAC, plain          # the problem is real
    assert bucketed <= 0.10, bucketed        # the bound holds
    assert bucketed <= plain / 3, (plain, bucketed)


def test_session_paths_bucketed_equals_plain(spark, zipf_events):
    """The two-level-scan sessionization must produce the identical
    top-path table: cross-bucket gaps come from each bucket's last
    event and the global sid is within-bucket running starts plus the
    earlier-bucket start total — the same cumulative numbering as the
    single per-user scan."""
    from spatialsketch_spark.pipeline.events import session_paths
    plain = sorted(map(tuple,
                       session_paths(zipf_events, topk=50).collect()))
    bucketed = sorted(map(tuple, session_paths(
        zipf_events, topk=50, bucket_us=HOUR_US).collect()))
    assert plain == bucketed
    assert len(plain) > 10


def test_funnel_aggregates_are_map_side_partial(spark):
    """funnel/retention immunity is structural: every user_id shuffle
    in the funnel plan is fed by a partial_min/partial-aggregate, so a
    hot user contributes ONE row per upstream partition to the
    exchange regardless of event count. Pin that plan shape."""
    from spatialsketch_spark.pipeline.events import funnel
    ev = spark.read.parquet(f"{SF_ORACLE}/events.parquet")
    p = funnel(ev)._jdf.queryExecution().executedPlan().toString()
    assert "partial_min" in p


def test_skewed_build_modes_agree_and_answer_exactly(spark):
    """Hot-CELL skew (restored r2 test — this file's r6 rewrite briefly
    dropped it): Zipf(1.3) coordinates concentrate most events in a few
    cells (the reference's Table-4 worst case). Both build modes must
    stay correct and agree; the partials mode bounds any single cell's
    merge fan-in to #partitions."""
    import numpy as np

    from spatialsketch_spark.config import SketchConfig
    from spatialsketch_spark.core.kernels import make_kernel
    from spatialsketch_spark.geo.build import SketchStore, build_sketch_df
    from spatialsketch_spark.geo.query import (QuerySpec,
                                               SpatialSketchEngine)
    from spatialsketch_spark.sources.synthetic import zipf_stream

    n = 64
    ev = zipf_stream(spark, 30000, n=n, item_domain=200, alpha=1.3,
                     seed=11, zipf_axes="item,coord").cache()
    # verify the stream is actually skewed: top cell holds >10% of rows
    top = (ev.groupBy("x", "y").count().orderBy(F.desc("count"))
           .first()["count"])
    assert top > 900   # uniform expectation would be ~7 events/cell

    cfg = SketchConfig.exact_mode(item_domain=256, n=n)
    a = build_sketch_df(ev, cfg, "exact", 0, mode="partials")
    b = build_sketch_df(ev, cfg, "exact", 0, mode="zorder")
    k = make_kernel("exact", cfg)
    pa = {(r["grid_key"], r["cell"]): r["payload"] for r in a.collect()}
    pb = {(r["grid_key"], r["cell"]): r["payload"] for r in b.collect()}
    assert pa.keys() == pb.keys()
    for key in list(pa)[:500]:
        sa, sb = k.deserialize(pa[key]), k.deserialize(pb[key])
        np.testing.assert_array_equal(sa["items"], sb["items"])

    store = SketchStore.build(spark, ev, cfg, "exact", 0)
    eng = SpatialSketchEngine(store)
    hot = ev.groupBy("x", "y").count().orderBy(F.desc("count")).first()
    hx, hy = hot["x"], hot["y"]
    got = {r["qid"]: r["est"] for r in eng.query(
        [QuerySpec(0, [(hx, hy, hx, hy)], "count"),
         QuerySpec(1, [(0, 0, n - 1, n - 1)], "freq", item=0)]).collect()}
    assert got[0] == hot["count"]
    assert got[1] == ev.filter(F.col("item") == 0).count()


def test_overlap_join_blocks_bound_hot_key_skew(spark, zipf_events):
    """overlap_join's skew story: the shuffle key is (key, block), so
    a bot user owning 40% of all intervals is split across the time
    blocks its intervals span — per-task candidate fan-in is per
    (user, hour), not per user. Pins (a) exact equality with the
    naive key-join + predicate on the Zipf fixture and (b) the same
    max-task-share bound the transitions test establishes for the
    (user, bucket) distribution."""
    from spatialsketch_spark.pipeline.temporal import overlap_join

    ts_us = F.expr("timestampdiff(MICROSECOND, "
                   "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    base = zipf_events.select(
        "user_id", "event_id", (ts_us / 1_000_000).cast("bigint")
        .alias("s"))
    a = (base.where("event_id % 10 = 0")
         .select("user_id", F.col("event_id").alias("a_id"),
                 F.col("s").alias("a_lo"),
                 (F.col("s") + 300 + F.col("event_id") % 900)
                 .alias("a_hi")))
    b = (base.where("event_id % 10 = 1")
         .select("user_id", F.col("event_id").alias("b_id"),
                 F.col("s").alias("b_lo"),
                 (F.col("s") + 150 + F.col("event_id") % 600)
                 .alias("b_hi")))
    got = overlap_join(a, b, block=3600, key="user_id") \
        .select("a_id", "b_id").toPandas() \
        .sort_values(["a_id", "b_id"]).reset_index(drop=True)
    naive = (a.join(b, "user_id")
             .where((F.col("a_lo") <= F.col("b_hi"))
                    & (F.col("b_lo") <= F.col("a_hi")))
             .select("a_id", "b_id").toPandas()
             .sort_values(["a_id", "b_id"]).reset_index(drop=True))
    import pandas as pd
    pd.testing.assert_frame_equal(got, naive)
    assert len(got) > 100 and not got.duplicated().any()

    # distribution bound on the exploded join input
    P = 64
    ae = a.withColumn("_blk", F.explode(F.sequence(
        F.floor(F.col("a_lo") / 3600), F.floor(F.col("a_hi") / 3600))))
    n_rows = ae.count()

    def max_share(df, *keys):
        parts = (df.repartition(P, *keys)
                 .select(F.spark_partition_id().alias("pid"))
                 .groupBy("pid").count().collect())
        return max(r["count"] for r in parts) / n_rows

    plain = max_share(ae, "user_id")
    blocked = max_share(ae, "user_id", "_blk")
    assert plain >= 0.35, plain
    assert blocked <= 0.10, blocked
    assert blocked <= plain / 3, (plain, blocked)


@pytest.fixture(scope="module")
def zipf_domains(spark):
    """Hot-domain corpus: one domain owns 40% of all docs."""
    df = (spark.range(N).select(
        F.col("id").cast("bigint").alias("doc_id"),
        F.when(F.col("id") < int(N * HOT_FRAC), "hot.example")
         .otherwise(F.concat(F.lit("d"),
                             ((F.col("id") * 2654435761) % 997)
                             .cast("string"),
                             F.lit(".example"))).alias("domain")))
    df = df.cache()
    df.count()
    return df


def test_domain_cap_two_phase_equals_plain_window(spark, zipf_domains):
    """The two-phase cap must reproduce the single-window cap exactly
    (rows AND rk) on the hot-domain fixture."""
    from pyspark.sql.window import Window
    from spatialsketch_spark.pipeline.curation import domain_cap
    k = 25
    w = Window.partitionBy("domain").orderBy("doc_id")
    plain = (zipf_domains
             .withColumn("rk", F.row_number().over(w).cast("bigint"))
             .where(F.col("rk") <= k))
    got = sorted(map(tuple, domain_cap(zipf_domains, k).collect()))
    want = sorted(map(tuple, plain.collect()))
    assert got == want
    assert len(got) == 25 + 997 * 25   # hot + uniform domains


def test_domain_cap_phase1_bounds_task_skew(spark, zipf_domains):
    """The skew claim itself: phase 1 distributes on (domain, doc_id
    hash bucket), so the hot domain's 40% spreads over the buckets —
    assert the largest task's share is bounded, and beats the plain
    domain distribution by at least 3x (same methodology as the
    transitions skew test above)."""
    P = 64
    def max_share(df, *keys):
        parts = (df.repartition(P, *keys)
                 .select(F.spark_partition_id().alias("pid"))
                 .groupBy("pid").count().collect())
        return max(r["count"] for r in parts) / N
    plain = max_share(zipf_domains, "domain")
    bucketed = max_share(
        zipf_domains.withColumn(
            "_dcb", F.pmod(F.xxhash64("doc_id"), F.lit(32))),
        "domain", "_dcb")
    assert plain >= HOT_FRAC          # hot domain lands on one task
    assert bucketed <= 0.10
    assert bucketed * 3 <= plain
