"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The container ships no image/audio codecs, so the *decode* step is a
clearly-marked stub (``decode_media`` raises NotImplementedError unless
``fake=True``); everything around it — binary column synthesis, schema,
Arrow batch shape, mapInPandas feature extraction, partitioning — is the
real Spark plumbing and is tested. The deterministic fake "decoder"
computes byte statistics so outputs stay oracle-comparable (DuckDB can
recompute md5-derived bytes with integer arithmetic).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = ("doc_id BIGINT, media_ref STRING, kind STRING, "
                "media BINARY, n_bytes INT")
FEATURE_SCHEMA = ("doc_id BIGINT, kind STRING, n_bytes BIGINT, "
                  "byte_sum BIGINT, byte_min BIGINT, byte_max BIGINT")


def synth_media_table(docs: DataFrame) -> DataFrame:
    """Deterministic opaque media blobs: payload = unhex(md5(doc_id))
    (16 bytes), kind round-robins image/audio/video. Stands in for an
    Iceberg table with a real binary column; the pipeline downstream is
    identical."""
    return docs.select(
        F.col("doc_id").cast("bigint"),
        F.concat(F.lit("media://"), F.col("doc_id")).alias("media_ref"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int")).alias("kind"),
        F.unhex(F.md5(F.col("doc_id").cast("string"))).alias("media"),
        F.length(F.unhex(F.md5(F.col("doc_id").cast("string"))))
        .cast("int").alias("n_bytes"),
    )


def decode_media(blob: bytes, kind: str, fake: bool = False):
    """Real decode would dispatch to PIL/libav — not available in this
    container. The Spark-side contract (bytes in, ndarray out) is what
    matters; tests exercise the fake path."""
    if not fake:
        raise NotImplementedError(
            "media decoding requires image/audio codecs not present in "
            "this environment; run with fake=True for the deterministic "
            "byte-statistics stand-in")
    import numpy as np
    return np.frombuffer(blob, dtype=np.uint8)


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over the binary column — the real
    Arrow-batched UDF shape a decode/resize/frame-sample stage uses.
    Features are deterministic byte statistics (fake decode)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        for pdf in batches:
            arrs = [decode_media(b, k, fake=True)
                    for b, k in zip(pdf["media"], pdf["kind"])]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "kind": pdf["kind"],
                "n_bytes": [len(a) for a in arrs],
                "byte_sum": [int(a.sum()) for a in arrs],
                "byte_min": [int(a.min()) if len(a) else 0 for a in arrs],
                "byte_max": [int(a.max()) if len(a) else 0 for a in arrs],
            })

    return media.mapInPandas(fn, schema=FEATURE_SCHEMA)


def oracle_media_features() -> str:
    """DuckDB recomputation: byte i of unhex(md5(x)) is the int value of
    hex digit pair i — 16 integer terms."""
    byte = ("(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), {i}, 2))"
            "::BIGINT)")
    bytes_sql = [byte.format(i=2 * j + 1) for j in range(16)]
    sum_sql = " + ".join(bytes_sql)
    least_sql = f"LEAST({', '.join(bytes_sql)})"
    greatest_sql = f"GREATEST({', '.join(bytes_sql)})"
    return f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
            WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       CAST(16 AS BIGINT) AS n_bytes,
       CAST({sum_sql} AS BIGINT) AS byte_sum,
       CAST({least_sql} AS BIGINT) AS byte_min,
       CAST({greatest_sql} AS BIGINT) AS byte_max
FROM documents ORDER BY doc_id
"""
