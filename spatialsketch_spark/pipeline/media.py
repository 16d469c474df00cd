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


RESIZE_SCHEMA = ("doc_id BIGINT, kind STRING, resized_hex STRING, "
                 "out_len BIGINT")
FRAME_SCHEMA = "doc_id BIGINT, frame_idx BIGINT, frame_hex STRING"


def resize_media(media: DataFrame, out_len: int = 8) -> DataFrame:
    """Resize plumbing: binary in -> fixed-size representation out, as
    one Arrow-batched mapInPandas stage (the shape a real PIL resize
    uses). The deterministic stand-in is nearest-neighbor byte
    downsampling (output byte j = input byte floor(j * n / out_len));
    output is hex so the driver's value hash is engine-stable.
    -> (doc_id, kind, resized_hex, out_len)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        for pdf in batches:
            hexes = []
            for b in pdf["media"]:
                a = decode_media(bytes(b), "", fake=True)
                if len(a) == 0:
                    # zero-length blob: nothing to sample — emit empty
                    # hex instead of indexing an empty array
                    hexes.append("")
                    continue
                idx = (np.arange(out_len) * len(a)) // out_len
                hexes.append(bytes(a[idx]).hex())
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "kind": pdf["kind"],
                "resized_hex": hexes,
                "out_len": out_len,
            })

    return media.mapInPandas(fn, schema=RESIZE_SCHEMA)


def frame_sample(media: DataFrame, frame_len: int = 4,
                 stride: int = 2) -> DataFrame:
    """Frame-sampling plumbing: treat the blob as consecutive
    ``frame_len``-byte frames, emit every ``stride``-th frame as its
    own row (binary in -> multiple rows out, the fan-out shape a video
    frame sampler uses). -> (doc_id, frame_idx, frame_hex)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hexes = [], [], []
            for did, b in zip(pdf["doc_id"], pdf["media"]):
                blob = bytes(b)
                n_frames = len(blob) // frame_len
                for f in range(0, n_frames, stride):
                    ids.append(int(did))
                    idxs.append(f)
                    hexes.append(
                        blob[f * frame_len:(f + 1) * frame_len].hex())
            yield pd.DataFrame({"doc_id": pd.array(ids, dtype="int64"),
                                "frame_idx": pd.array(idxs, dtype="int64"),
                                "frame_hex": hexes})

    return media.mapInPandas(fn, schema=FRAME_SCHEMA)


def oracle_resize_media(out_len: int = 8, n: int = 16) -> str:
    """Output byte j = input byte (j * n) // out_len; input byte i is
    the md5 hex pair at 2i+1 (1-based)."""
    pairs = []
    for j in range(out_len):
        src = (j * n) // out_len
        pairs.append(f"substr(md5(CAST(doc_id AS VARCHAR)), {2 * src + 1}, 2)")
    concat = " || ".join(pairs)
    return f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
            WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       {concat} AS resized_hex,
       CAST({out_len} AS BIGINT) AS out_len
FROM documents ORDER BY doc_id
"""


def oracle_frame_sample(frame_len: int = 4, stride: int = 2,
                        n: int = 16) -> str:
    frames = list(range(0, n // frame_len, stride))
    selects = []
    for f in frames:
        start = 2 * f * frame_len + 1
        selects.append(
            f"SELECT CAST(doc_id AS BIGINT) AS doc_id, "
            f"CAST({f} AS BIGINT) AS frame_idx, "
            f"substr(md5(CAST(doc_id AS VARCHAR)), {start}, "
            f"{2 * frame_len}) AS frame_hex FROM documents")
    union = " UNION ALL ".join(selects)
    return f"{union} ORDER BY doc_id, frame_idx"


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
