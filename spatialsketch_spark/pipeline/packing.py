"""Sequence packing — the concat-and-cut step of LLM training-data prep.

Training consumes fixed-length token sequences, not documents: the
corpus is deterministically shuffled, concatenated per stream, and cut
every ``seq_len`` tokens (documents straddle cut points). This module
computes that placement as a pure column program: for every document,
the token offset where it starts in its stream and the range of
training sequences it overlaps.

Determinism contract (same as sampling.py): the stream order is the
seeded 60-bit md5 rank of the doc id — a pure function of (id, seed),
so the packing is identical across cluster sizes, retries, and AQE
re-plans, and exactly reproducible in ANSI SQL (full bit-compare DuckDB
oracle in the driver gate).

Scale posture: one shuffle (the per-stream window sort). Parallelism
does NOT collapse to #strata: each stratum is split into ``shards``
independent streams by hash, so a 1000-executor cluster packs
strata × shards streams concurrently and the per-stream external sort
is bounded by corpus_size/shards. That sharding is exactly how
production packers keep the global-order illusion embarrassingly
parallel — a cut sequence never crosses a shard, so shards can be
written out as independent training files.

Weights are integer token counts (caller supplies the column — e.g.
``token_stats().n_tokens`` for the bit-matched whitespace count, or
``bpe_token_count()`` for the BPE-ish regex count); all arithmetic is
integer/exact, no floats reach the output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .sampling import _key_sql, _rank_key


def pack_sequences(df: DataFrame, seq_len: int, tokens_col: str,
                   strata_cols: list[str], shards: int = 4,
                   seed: int = 17, id_col: str = "doc_id") -> DataFrame:
    """Assign every document its place in the packed token stream.

    Streams are ``strata_cols × shard`` (shard = seeded hash mod
    ``shards``); within a stream documents are ordered by (hash, id)
    and laid head-to-tail. With ``L = seq_len``::

        start_off = sum of earlier docs' tokens       (0-based)
        first_seq = floor(start_off / L)
        last_seq  = floor((start_off + n_tokens - 1) / L)   (n>0)

    A document with ``last_seq > first_seq`` straddles one or more cut
    points. Zero-token documents occupy no span: they report
    ``first_seq == last_seq`` at their start offset and ``n_seqs = 0``.

    Returns the input columns plus ``shard, start_off, first_seq,
    last_seq, n_seqs`` — the per-doc placement map a downstream writer
    needs to emit sequence files without re-sorting.
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    if shards <= 0:
        raise ValueError("shards must be positive")
    key = _rank_key(id_col, seed)
    shard = (key % F.lit(shards)).cast("int")
    out = df.withColumn("shard", shard)
    w = (Window.partitionBy(*[F.col(c) for c in strata_cols],
                            F.col("shard"))
         .orderBy(_rank_key(id_col, seed).asc(), F.col(id_col).asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    n = F.col(tokens_col)
    start = (F.sum(n).over(w) - n).alias("start_off")
    out = out.withColumn("start_off", start)
    # integer `div`, not floor(x / L): bigint / yields double, which
    # loses exactness once a stream offset exceeds 2^53 tokens; all
    # operands are non-negative so div == floor division
    first = F.expr(f"start_off div {seq_len}").cast("bigint")
    last = F.when(n > 0,
                  F.expr(f"(start_off + {tokens_col} - 1) div {seq_len}")
                  .cast("bigint")).otherwise(first)
    return (out.withColumn("first_seq", first)
               .withColumn("last_seq", last)
               .withColumn("n_seqs",
                           F.when(n > 0,
                                  F.col("last_seq") - F.col("first_seq")
                                  + 1).otherwise(F.lit(0))
                           .cast("bigint")))


def sequence_manifest(packed: DataFrame,
                      strata_cols: list[str]) -> DataFrame:
    """Per-sequence roll-up of a ``pack_sequences`` result: for every
    (stream, sequence) the number of documents that START in it and the
    number that OVERLAP it (straddlers from earlier offsets included via
    the doc that starts before and ends inside or after).

    Overlap counting stays a column program: a doc contributes a row to
    every sequence in [first_seq, last_seq] via ``sequence(...)`` +
    ``explode`` — per-doc fan-out is n_seqs ≈ n_tokens/seq_len, so the
    explode is output-proportional, never quadratic. One extra shuffle.
    """
    gcols = [*strata_cols, "shard"]
    span = packed.where(F.col("n_seqs") > 0).withColumn(
        "seq_id", F.explode(F.sequence(F.col("first_seq"),
                                       F.col("last_seq"))))
    return (span.groupBy(*gcols, "seq_id")
            .agg(F.count("*").cast("bigint").alias("n_docs_overlap"),
                 F.sum(F.when(F.col("first_seq") == F.col("seq_id"), 1)
                       .otherwise(0)).cast("bigint")
                 .alias("n_docs_start")))


def oracle_pack_sequences(seq_len: int, tokens_sql: str,
                          strata_sql: list[str], shards: int = 4,
                          seed: int = 17, id_sql: str = "doc_id",
                          src: str = "documents") -> str:
    """DuckDB rebuild of :func:`pack_sequences` over ``src`` — same
    hash, same window frame, same integer arithmetic."""
    key = _key_sql(id_sql, seed)
    strata = ", ".join(strata_sql)
    return f"""
        WITH keyed AS (
          SELECT *, {key} AS k,
                 CAST({key} % {shards} AS INTEGER) AS shard,
                 {tokens_sql} AS n_tok
          FROM {src}
        ), placed AS (
          SELECT *, CAST(SUM(n_tok) OVER (
                     PARTITION BY {strata}, shard ORDER BY k, {id_sql}
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - n_tok AS BIGINT) AS start_off
          FROM keyed
        )
        SELECT {id_sql}, {strata}, shard, n_tok AS n_tokens, start_off,
               CAST(start_off // {seq_len} AS BIGINT) AS first_seq,
               CAST(CASE WHEN n_tok > 0
                    THEN (start_off + n_tok - 1) // {seq_len}
                    ELSE start_off // {seq_len} END AS BIGINT)
                 AS last_seq,
               CAST(CASE WHEN n_tok > 0
                    THEN (start_off + n_tok - 1) // {seq_len}
                       - start_off // {seq_len} + 1
                    ELSE 0 END AS BIGINT) AS n_seqs
        FROM placed ORDER BY {id_sql}
    """


def oracle_sequence_manifest(seq_len: int, tokens_sql: str,
                             strata_sql: list[str], shards: int = 4,
                             seed: int = 17, id_sql: str = "doc_id",
                             src: str = "documents") -> str:
    """DuckDB rebuild of :func:`sequence_manifest` over the packed map
    (``generate_series`` is inclusive on both ends, same as Spark's
    ``sequence``)."""
    strata = ", ".join(strata_sql)
    inner = oracle_pack_sequences(seq_len, tokens_sql, strata_sql,
                                  shards, seed, id_sql, src)
    return f"""
        WITH packed AS ({inner}), span AS (
          SELECT {strata}, shard, first_seq,
                 unnest(generate_series(first_seq, last_seq)) AS seq_id
          FROM packed WHERE n_seqs > 0
        )
        SELECT {strata}, shard, seq_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs_overlap,
               CAST(SUM(CASE WHEN first_seq = seq_id THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_docs_start
        FROM span GROUP BY {strata}, shard, seq_id
        ORDER BY {strata}, shard, seq_id
    """
