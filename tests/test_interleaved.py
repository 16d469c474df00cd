"""Interleaved-doc source: span-sequence equality (input_hint per-row
invariant) and extraction roundtrip."""

from pyspark.sql import functions as F

from spatialsketch_spark.geo.events import derive_geo_events
from spatialsketch_spark.sources.interleaved import (
    build_interleaved_docs, extract_geo_events, span_sequence,
)

from conftest import SF_UNIT

N = 64


def test_roundtrip_and_span_sequence(spark):
    docs = build_interleaved_docs(spark, SF_UNIT, N, n_docs=37).cache()

    # 1. schema contract (input_hint)
    assert docs.columns == ["doc_id", "spans"]
    f = {fld.name: fld.dataType.simpleString()
         for fld in docs.schema["spans"].dataType.elementType.fields}
    assert f == {"kind": "string", "text": "string",
                 "media_ref": "string", "offset": "int"}

    # 2. offsets strictly increasing within each doc
    bad = docs.select(
        F.exists(
            F.zip_with(
                F.slice("spans", 1, F.size("spans") - 1),
                F.slice("spans", 2, F.size("spans") - 1),
                lambda a, b: b["offset"] <= a["offset"],
            ), lambda v: v).alias("bad")
    ).filter("bad").count()
    assert bad == 0

    # 3. extraction roundtrip: extracted geo events == derived events
    ev = derive_geo_events(spark, SF_UNIT, N)
    got = extract_geo_events(docs).select("ts", "item", "x", "y", "value")
    assert got.count() == ev.count()
    assert got.exceptAll(ev).count() == 0
    assert ev.exceptAll(got).count() == 0

    # 4. span-sequence equality is deterministic across parallelism
    seq_a = {r["doc_id"]: tuple(r["seq"]) for r in span_sequence(docs).collect()}
    docs_b = build_interleaved_docs(
        spark, SF_UNIT, N, n_docs=37).repartition(16)
    seq_b = {r["doc_id"]: tuple(r["seq"])
             for r in span_sequence(docs_b).collect()}
    assert seq_a == seq_b

    # 5. interleaving is real: docs contain text and media spans between geo
    kinds = (docs.select(F.explode("spans").alias("s"))
             .groupBy("s.kind").count().collect())
    km = {r["kind"]: r["count"] for r in kinds}
    assert set(km) == {"geo", "text", "media"}
    assert km["geo"] > km["media"] > 0
