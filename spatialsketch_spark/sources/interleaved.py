"""Interleaved text+media document source (BASELINE.json input_hint).

The engine's canonical large-scale input is an Iceberg/parquet table

    doc_id : string
    spans  : array<struct<kind:string, text:string, media_ref:string, offset:int>>

with geo-events embedded as ``kind='geo'`` spans whose text is
``"<ts>,<item>,<x>,<y>,<value>"`` — mirroring the reference's CSV column
order timestamp,ip,longitude,latitude (experiments.cpp:232-241).

``build_interleaved_docs`` synthesizes this table deterministically from
the sandbox testdata (events + documents parquet), interleaving each
document's geo spans with text and media spans. ``extract_geo_events``
is the production-path inverse: span explode -> filter -> parse, built
entirely from JVM-side column functions (no Python in the hot path), so
at 10^12-document scale the extraction is one whole-stage-codegen'd scan.

Per-row invariant (input_hint): span-sequence equality — (kind, text,
media_ref, order) survives the round trip; tested in
tests/test_interleaved.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..geo.events import derive_geo_events

DOCS_PER_SHARD = 100  # events per synthetic doc ~ events/doc_count


def build_interleaved_docs(spark: SparkSession, sf_dir: str, n: int,
                           n_docs: int | None = None) -> DataFrame:
    """Deterministic synthetic interleaved-doc table from testdata.

    Each geo event goes to doc ``ts % n_docs``; within a doc, spans are
    ordered by ts. A text span (from the documents table, cycled) is
    interleaved before every 3rd geo span and a media span before every
    5th, with strictly increasing offsets.
    """
    ev = derive_geo_events(spark, sf_dir, n)
    if n_docs is None:
        n_docs = max(10, ev.count() // DOCS_PER_SHARD)

    geo_spans = ev.select(
        (F.col("ts") % n_docs).alias("doc_key"),
        F.col("ts").alias("ord"),
        F.lit("geo").alias("kind"),
        F.concat_ws(",", "ts", "item", "x", "y", "value").alias("text"),
        F.lit("").alias("media_ref"),
    )
    # deterministic text/media filler spans derived from the geo span keys
    text_spans = (
        geo_spans.filter(F.col("ord") % 3 == 0)
        .select("doc_key", (F.col("ord") * 10 + 1).alias("ord"),
                F.lit("text").alias("kind"),
                F.concat(F.lit("filler text #"), F.col("ord")).alias("text"),
                F.lit("").alias("media_ref"))
    )
    media_spans = (
        geo_spans.filter(F.col("ord") % 5 == 0)
        .select("doc_key", (F.col("ord") * 10 + 2).alias("ord"),
                F.lit("media").alias("kind"), F.lit("").alias("text"),
                F.concat(F.lit("s3://media/"), F.col("doc_key"), F.lit("/"),
                         F.col("ord")).alias("media_ref"))
    )
    spans = geo_spans.select("doc_key", (F.col("ord") * 10).alias("ord"),
                             "kind", "text", "media_ref") \
        .unionByName(text_spans).unionByName(media_spans)

    # assemble: sort_array over collected structs keeps span order exact and
    # parallelism-invariant (ord is unique per doc)
    return (
        spans.groupBy("doc_key")
        .agg(F.sort_array(F.collect_list(F.struct(
            F.col("ord"), F.col("kind"), F.col("text"), F.col("media_ref")
        ))).alias("ordered"))
        .select(
            F.format_string("doc_%012d", F.col("doc_key")).alias("doc_id"),
            F.transform(
                "ordered",
                lambda s, i: F.struct(
                    s["kind"].alias("kind"), s["text"].alias("text"),
                    s["media_ref"].alias("media_ref"),
                    i.cast("int").alias("offset"),
                ),
            ).alias("spans"),
        )
    )


def extract_geo_events(docs: DataFrame) -> DataFrame:
    """Inverse path: interleaved docs -> geo-event DF (ts,item,x,y,value,
    doc_id, offset). Pure built-in column ops: posexplode of the pruned
    spans array, split/cast of the geo payload. Catalyst prunes the
    struct fields actually read (nested schema pruning)."""
    ex = docs.select(
        "doc_id",
        F.posexplode(F.filter("spans", lambda s: s["kind"] == F.lit("geo")))
        .alias("pos", "span"),
    )
    parts = F.split(F.col("span.text"), ",")
    return ex.select(
        parts.getItem(0).cast("long").alias("ts"),
        parts.getItem(1).cast("long").alias("item"),
        parts.getItem(2).cast("long").alias("x"),
        parts.getItem(3).cast("long").alias("y"),
        parts.getItem(4).cast("long").alias("value"),
        "doc_id",
        F.col("span.offset").alias("offset"),
    )


def span_sequence(docs: DataFrame) -> DataFrame:
    """Canonical (doc_id, seq) projection used by the span-sequence
    equality tests: spans as ordered (kind|text|media_ref) strings."""
    return docs.select(
        "doc_id",
        F.transform("spans", lambda s: F.concat_ws("|", s["kind"], s["text"],
                                                   s["media_ref"])).alias("seq"),
    )
