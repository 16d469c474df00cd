"""URL/domain curation family (VERDICT r6 task 3) — unit edge cases
beyond the four driver gates' bit-compare, plus the r7 guard
regressions (scd2 duplicate doc_id, zorder rect validation)."""

import pytest

from conftest import SF_ORACLE


def _canon_of(spark, urls):
    from pyspark.sql import functions as F
    from spatialsketch_spark.pipeline import curation
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)],
                               "doc_id long, url string")
    rows = (curation.url_canonicalize(df)
            .orderBy("doc_id").select("canon_url").collect())
    return [r[0] for r in rows]


def test_url_canonicalize_rules(spark):
    got = _canon_of(spark, [
        "HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&z=1&a=2#frag",
        "http://example.com:80/a",
        "http://example.com:8080/a",           # non-default port kept
        "https://example.com:80/a",            # 80 is NOT default for https
        "http://news.example.com/",            # root slash kept
        "http://example.com/x?utm_a=1&utm_b=2",  # all params tracked
        "http://example.com/x?gclid=1&fbclid=2&b=1&a=1",
    ])
    assert got == [
        "https://example.com/a/b?a=2&z=1",
        "http://example.com/a",
        "http://example.com:8080/a",
        "https://example.com:80/a",
        "http://news.example.com/",
        "http://example.com/x",
        "http://example.com/x?a=1&b=1",
    ]


def test_registrable_domain_rules(spark):
    from pyspark.sql import functions as F
    from spatialsketch_spark.pipeline import curation
    df = spark.createDataFrame(
        [(0, "http://a.b.example.co.uk/x"),
         (1, "http://example.co.uk/x"),
         (2, "http://deep.sub.example.com/x"),
         (3, "http://example.com/x"),
         (4, "http://localhost/x")],
        "doc_id long, canon_url string")
    rows = (curation.registrable_domain(df)
            .orderBy("doc_id").select("domain").collect())
    assert [r[0] for r in rows] == [
        "example.co.uk", "example.co.uk", "example.com",
        "example.com", "localhost"]


def test_domain_cap_and_url_dedup(spark):
    from spatialsketch_spark.pipeline import curation
    d = curation.with_url(
        spark.read.parquet(f"{SF_ORACLE}/documents.parquet"))
    d = curation.registrable_domain(
        curation.url_canonicalize(d)).cache()
    capped = curation.domain_cap(d, 5)
    per = {r["domain"]: r["n"] for r in
           capped.groupBy("domain").count()
           .withColumnRenamed("count", "n").collect()}
    assert per and all(v <= 5 for v in per.values())
    # kept rows are exactly the 5 lowest doc_ids of each domain
    import pyspark.sql.functions as F
    lows = {r["domain"]: r["lo"] for r in
            d.groupBy("domain")
            .agg(F.sort_array(F.collect_list("doc_id")).alias("all"))
            .select("domain", F.slice("all", 1, 5).alias("lo")).collect()}
    kept = {r["domain"]: sorted(r["ks"]) for r in
            capped.groupBy("domain")
            .agg(F.collect_list("doc_id").alias("ks")).collect()}
    assert kept == {k: list(v) for k, v in lows.items()}
    # url_dedup: every canonical URL appears once, copy counts sum to N
    dd = curation.url_dedup(d)
    n_docs = d.count()
    agg = dd.agg(F.sum("n_copies"), F.count("*")).collect()[0]
    assert agg[0] == n_docs
    assert agg[1] == dd.select("canon_url").distinct().count()
    d.unpersist()


def test_curation_plan_no_python_udf(spark):
    from spatialsketch_spark.gate_pipeline import q_url_canonical
    p = q_url_canonical(spark, SF_ORACLE)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in p and "MapInPandas" not in p


def test_scd2_duplicate_docid_in_shard_rejected(spark):
    from pyspark.sql import functions as F
    from spatialsketch_spark.pipeline.dedup import scd2_upsert
    base = spark.createDataFrame([(1, "a"), (2, "b")],
                                 "doc_id long, text string")
    dup = spark.createDataFrame([(1, "a2"), (1, "a3")],
                                "doc_id long, text string")
    versioned = scd2_upsert(base, [(1, dup)])
    with pytest.raises(Exception) as ei:
        versioned.collect()
    assert "duplicate doc_id" in str(ei.value)
    # clean shards still pass through the assert_true path untouched
    ok = scd2_upsert(base, [(1, spark.createDataFrame(
        [(1, "a2")], "doc_id long, text string"))])
    rows = {(r["doc_id"], r["valid_from"]): r["valid_to"]
            for r in ok.collect()}
    assert rows == {(1, 0): 1, (1, 1): None, (2, 0): None}


def test_zorder_rect_buckets_validation():
    from spatialsketch_spark.geo.layout import (ZORDER_BITS,
                                                zorder_rect_buckets)
    lim = 1 << ZORDER_BITS
    with pytest.raises(ValueError, match="reversed"):
        zorder_rect_buckets(10, 0, 5, 5)
    with pytest.raises(ValueError, match="outside"):
        zorder_rect_buckets(0, 0, lim, 5)
    with pytest.raises(ValueError, match="outside"):
        zorder_rect_buckets(-1, 0, 5, 5)
    assert zorder_rect_buckets(0, 0, 0, 0) == [0]
