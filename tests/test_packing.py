"""Sequence-packing + TF-IDF operator semantics (the cross-engine
equality with DuckDB is covered by the global oracle test; here we pin
the operator CONTRACT: stream contiguity, straddle arithmetic,
partitioning-invariance, and a hand-computed tf-idf fixture)."""

import pytest
from pyspark.sql import functions as F

from spatialsketch_spark.pipeline import packing, text

from conftest import SF_ORACLE

L = 32


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_ORACLE}/documents.parquet").cache()


@pytest.fixture(scope="module")
def packed(spark, docs):
    toks = text.token_stats(docs).select("doc_id", "n_tokens")
    d = docs.select("doc_id", "lang").join(toks, "doc_id")
    return packing.pack_sequences(d, L, "n_tokens", ["lang"],
                                  shards=3).cache()


def test_streams_are_contiguous(packed):
    """Within every (lang, shard) stream the doc offsets tile the token
    axis exactly: sorted by start_off, each doc starts where the
    previous ended, beginning at 0."""
    rows = packed.select("lang", "shard", "start_off", "n_tokens") \
                 .collect()
    streams = {}
    for r in rows:
        streams.setdefault((r["lang"], r["shard"]), []).append(
            (r["start_off"], r["n_tokens"]))
    assert len(streams) > 1
    for spans in streams.values():
        spans.sort()
        expect = 0
        for start, n in spans:
            assert start == expect
            expect = start + n


def test_straddle_arithmetic(packed):
    for r in packed.collect():
        if r["n_tokens"] > 0:
            assert r["first_seq"] == r["start_off"] // L
            assert r["last_seq"] == (r["start_off"] + r["n_tokens"] - 1) // L
            assert r["n_seqs"] == r["last_seq"] - r["first_seq"] + 1
        else:
            assert r["n_seqs"] == 0


def test_partitioning_invariance(spark, docs):
    """The placement map is a pure function of (rows, seed) — identical
    under different physical partitionings."""
    toks = text.token_stats(docs).select("doc_id", "n_tokens")
    d = docs.select("doc_id", "lang").join(toks, "doc_id")
    cols = ["doc_id", "lang", "shard", "start_off", "first_seq",
            "last_seq", "n_seqs"]
    a = packing.pack_sequences(d.repartition(17), L, "n_tokens",
                               ["lang"], shards=3) \
        .select(*cols).orderBy("doc_id").collect()
    b = packing.pack_sequences(d.coalesce(2), L, "n_tokens",
                               ["lang"], shards=3) \
        .select(*cols).orderBy("doc_id").collect()
    assert a == b


def test_manifest_covers_every_sequence(packed):
    """Streams have no holes: every seq id from 0 to the stream's last
    appears in the manifest, starts sum to the doc count, and overlap
    count ≥ start count everywhere."""
    man = packing.sequence_manifest(packed, ["lang"]).collect()
    by_stream = {}
    for r in man:
        by_stream.setdefault((r["lang"], r["shard"]), {})[r["seq_id"]] = r
    n_docs_packed = packed.where(F.col("n_seqs") > 0).count()
    assert sum(r["n_docs_start"] for r in man) == n_docs_packed
    for seqs in by_stream.values():
        assert set(seqs) == set(range(max(seqs) + 1))
        for r in seqs.values():
            assert r["n_docs_overlap"] >= r["n_docs_start"]
            assert r["n_docs_overlap"] >= 1


def test_zero_token_doc_occupies_no_span(spark):
    d = spark.createDataFrame(
        [(1, "en", 5), (2, "en", 0), (3, "en", 7)],
        "doc_id long, lang string, n_tokens long")
    out = packing.pack_sequences(d, 4, "n_tokens", ["lang"], shards=1)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[2]["n_seqs"] == 0
    # the zero-token doc does not shift its successors
    total = sum(r["n_tokens"] for r in rows.values())
    assert max(r["start_off"] + r["n_tokens"] for r in rows.values()) \
        == total


def test_tfidf_hand_fixture(spark):
    d = spark.createDataFrame(
        [(1, "apple banana apple"),
         (2, "banana cherry"),
         (3, "apple durian durian")],
        "doc_id long, text string")
    out = text.tfidf_topk(d, k=2).collect()
    got = {(r["doc_id"], r["rk"]): (r["term"], r["tf"], r["df_docs"],
                                    r["score_micro"]) for r in out}
    # N=3. df: apple 2, banana 2, cherry 1, durian 1.
    # doc1: apple tf2 -> 2*3e6/2=3e6 ; banana tf1 -> 1.5e6
    assert got[(1, 1)] == ("apple", 2, 2, 3_000_000)
    assert got[(1, 2)] == ("banana", 1, 2, 1_500_000)
    # doc2: cherry 1*3e6/1=3e6 beats banana 1.5e6
    assert got[(2, 1)] == ("cherry", 1, 1, 3_000_000)
    assert got[(2, 2)] == ("banana", 1, 2, 1_500_000)
    # doc3: durian tf2 df1 -> 6e6 ; apple 1*3e6/2=1.5e6
    assert got[(3, 1)] == ("durian", 2, 1, 6_000_000)
    assert got[(3, 2)] == ("apple", 1, 2, 1_500_000)


def test_tfidf_k_bound_and_tie_break(spark, docs):
    out = text.tfidf_topk(docs, k=3)
    per_doc = out.groupBy("doc_id").count().collect()
    assert all(r["count"] <= 3 for r in per_doc)
    # rk strictly follows (score desc, term asc)
    for rows in [sorted([r for r in out.collect() if r["doc_id"] == d0],
                        key=lambda r: r["rk"])
                 for d0 in [r["doc_id"] for r in per_doc[:5]]]:
        for a, b in zip(rows, rows[1:]):
            assert (a["score_micro"], b["term"]) >= \
                   (b["score_micro"], a["term"])
