"""Span-level curation operators: exact substring-granular dedup and
eval-set decontamination.

Both operate on k-token spans (k-grams) hashed with the same Rabin-Karp
polynomial the winnowing ops use (text.py), so every number they emit
is pure int64 arithmetic reproducible bit-for-bit in DuckDB.

- ``span_dedup``: the training-data dedup mode the whole-doc /
  near-dup family misses — remove REPEATED >=k-token spans across (and
  within) documents, keeping exactly one occurrence globally (the
  minimal (doc_id, pos)). Distributed shape: one shuffle on the k-gram
  hash (uniform keys), a window rank to pick the keeper, then per-doc
  array arithmetic — never all-pairs, state bounded by doc length.
- ``decontaminate``: n-gram overlap of corpus docs against a held-out
  eval set (the standard pre-training hygiene pass): a doc is
  contaminated when >= 1/10 of its k-gram positions also occur in the
  eval set. The eval k-gram set is an equi-join dim (broadcast-able
  when small; plain shuffle join at scale).

Hash collisions (FP_MOD ~1e9) can mark a false duplicate/hit pair with
probability ~m^2/2/FP_MOD over m distinct k-grams; both engines compute
identical hashes so the oracle comparison is unaffected — the collision
rate is a documented property of the operator, not a gate risk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .dedup import word_hash_col
from .text import (FP_MOD, ROLL_B, _window_hash_array,
                   _window_hash_rows, _with_words)

SPAN_K = 4          # span granularity (tokens) — gate default
CONTAM_DEN = 10     # contaminated when hits/positions >= 1/CONTAM_DEN


def _with_kgrams(docs: DataFrame, k: int) -> DataFrame:
    """docs -> + _words, _whs (word hashes), _fps (k-gram rolling
    hashes, window j 1-based covers tokens j..j+k-1)."""
    d = _with_words(docs)
    whs = F.transform(F.col("_words"), lambda x: word_hash_col(x) % FP_MOD)
    return d.withColumn("_whs", whs) \
            .withColumn("_fps", _window_hash_array(k, ROLL_B))


def span_dedup(docs: DataFrame, k: int = SPAN_K) -> DataFrame:
    """Exact substring-level dedup (VERDICT r4 task 3): every k-gram
    occurring >= 2 times globally is a duplicated span start except its
    globally-first occurrence (min (doc_id, pos) — the keep-one policy
    of suffix-array substring dedup, re-expressed as a rank over the
    k-gram hash). A token is removed when any non-keeper duplicated
    k-gram covers it; overlapping k-grams merge into maximal spans.

    -> (doc_id, n_tokens, n_dup_tokens, n_dup_spans, kept_fp) where
    kept_fp fingerprints the post-removal text (md5 -> int64), so the
    oracle proves the exact surviving byte sequence, not just counts.
    """
    d = _with_words(docs)
    # occurrence table via the relational window-hash rows (r8 —
    # identical hashes, no array-lambda aliases for the optimizer to
    # inline into Generate filters; see _token_hash_rows)
    occ = (_window_hash_rows(docs, k)
           .select(F.col("doc_id").cast("bigint").alias("doc_id"),
                   "j", F.col("wh").alias("h")))
    wn = Window.partitionBy("h").orderBy("doc_id", "j")
    marked = (occ.withColumn("rn", F.row_number().over(wn))
              .where(F.col("rn") >= 2)
              .groupBy("doc_id")
              .agg(F.sort_array(F.collect_list("j")).alias("starts")))
    d = (d.join(marked, "doc_id", "left")
         .withColumn("starts", F.coalesce(
             "starts", F.array().cast("array<bigint>"))))
    covered = F.array_sort(F.array_distinct(F.flatten(F.transform(
        F.col("starts"), lambda s: F.sequence(s, s + (k - 1))))))
    d = d.withColumn("_cov", covered)
    n = F.size("_words")
    # set arithmetic instead of nested lambdas: kept = positions minus
    # covered; span starts = covered minus (covered + 1) — array_except
    # keeps first-array order and dedups (inputs are already unique)
    kept = F.array_except(F.sequence(F.lit(1).cast("bigint"),
                                     n.cast("bigint")), F.col("_cov"))
    kept_text = F.array_join(
        F.transform(kept, lambda p: F.element_at("_words", p.cast("int"))),
        " ")
    spans = F.size(F.array_except(
        F.col("_cov"), F.transform("_cov", lambda c: c + 1)))
    return d.select(
        F.col("doc_id").cast("bigint"),
        n.cast("bigint").alias("n_tokens"),
        F.size("_cov").cast("bigint").alias("n_dup_tokens"),
        spans.cast("bigint").alias("n_dup_spans"),
        (F.conv(F.substring(F.md5(kept_text), 1, 15), 16, 10)
         .cast("bigint")).alias("kept_fp"))


def decontaminate(corpus: DataFrame, eval_docs: DataFrame,
                  k: int = SPAN_K) -> DataFrame:
    """Per-corpus-doc eval-set contamination: n_positions = number of
    k-gram windows in the doc, n_hits = windows whose k-gram hash also
    occurs anywhere in the eval set, contaminated = 1 iff
    CONTAM_DEN * n_hits >= n_positions (>= 10%) and n_positions > 0.
    -> (doc_id, n_positions, n_hits, contaminated)."""
    # r8: window hashes as rows (identical arithmetic, codegen'd —
    # see _token_hash_rows); n_positions = max(n - k + 1, 0) straight
    # from the token count instead of sizing the hash array
    ev = (_window_hash_rows(eval_docs, k)
          .select(F.col("wh").alias("h")).distinct())
    occ = (_window_hash_rows(corpus, k)
           .select(F.col("doc_id").cast("bigint").alias("doc_id"),
                   F.col("wh").alias("h")))
    hits = (occ.join(ev, "h", "left_semi")
            .groupBy("doc_id").agg(F.count("*").alias("n_hits")))
    base = _with_words(corpus).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.greatest(F.size("_words") - (k - 1), F.lit(0))
        .cast("bigint").alias("n_positions"))
    return (base.join(hits, "doc_id", "left")
            .select("doc_id", "n_positions",
                    F.coalesce("n_hits", F.lit(0)).cast("bigint")
                    .alias("n_hits"))
            .withColumn(
                "contaminated",
                ((F.col("n_positions") > 0)
                 & (CONTAM_DEN * F.col("n_hits") >= F.col("n_positions")))
                .cast("bigint")))


# ---------------------------------------------------------------------------
# DuckDB oracle mirrors
# ---------------------------------------------------------------------------

_WORDS_SQL = ("string_split(regexp_replace(lower(trim(text)), "
              "'\\s+', ' ', 'g'), ' ')")


def _fps_sql(k: int) -> str:
    """DuckDB list expr: k-gram rolling hashes over the bound ``whs``
    column (same unrolled polynomial as oracle_winnow_pairs)."""
    pw = [pow(ROLL_B, k - 1 - i, FP_MOD) for i in range(k)]
    terms = " + ".join(f"(whs[j + {i}] % {FP_MOD}) * {pw[i]}"
                       for i in range(k))
    return (f"CASE WHEN len(whs) >= {k} THEN "
            f"list_transform(range(1, len(whs) - {k - 2}), "
            f"j -> ({terms}) % {FP_MOD}) ELSE [] END")


_WHS_SQL = (f"list_transform({_WORDS_SQL}, "
            f"w -> ('0x' || substr(md5(w), 1, 15))::BIGINT)")


def oracle_span_dedup(k: int = SPAN_K) -> str:
    return f"""
WITH t AS (
  SELECT doc_id, {_WORDS_SQL} AS words, {_WHS_SQL} AS whs FROM documents
),
fps AS (SELECT doc_id, words, {_fps_sql(k)} AS fps FROM t),
occ AS (
  SELECT doc_id, j, fps[j] AS h
  FROM fps, LATERAL UNNEST(range(1, len(fps) + 1)) AS u(j)
),
marked AS (
  SELECT doc_id, j FROM (
    SELECT doc_id, j,
           ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, j) AS rn
    FROM occ) WHERE rn >= 2
),
starts AS (
  SELECT doc_id, list_sort(list(j)) AS starts FROM marked GROUP BY doc_id
),
cov AS (
  SELECT f.doc_id, f.words,
         list_sort(list_distinct(flatten(list_transform(
             COALESCE(s.starts, []), s -> range(s, s + {k}))))) AS cv
  FROM fps f LEFT JOIN starts s ON s.doc_id = f.doc_id
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(len(words) AS BIGINT) AS n_tokens,
       CAST(len(cv) AS BIGINT) AS n_dup_tokens,
       CAST(len(list_filter(cv, p -> NOT list_contains(cv, p - 1)))
            AS BIGINT) AS n_dup_spans,
       -- COALESCE: DuckDB array_to_string([]) is NULL, Spark
       -- array_join of an empty array is '' (fully-deduped docs)
       ('0x' || substr(md5(COALESCE(array_to_string(
           list_transform(
               list_filter(range(1, len(words) + 1),
                           p -> NOT list_contains(cv, p)),
               p -> words[p]), ' '), '')), 1, 15))::BIGINT AS kept_fp
FROM cov ORDER BY doc_id
"""


def oracle_decontaminate(eval_pred_sql: str, corpus_pred_sql: str,
                         k: int = SPAN_K) -> str:
    """eval_pred_sql / corpus_pred_sql: WHERE predicates over
    ``documents`` splitting it into the held-out eval set and the
    corpus (the gate uses a doc_id hash split)."""
    return f"""
WITH t AS (
  SELECT doc_id, {_WHS_SQL} AS whs FROM documents
),
fps AS (SELECT doc_id, {_fps_sql(k)} AS fps FROM t),
ev AS (
  SELECT DISTINCT h FROM fps, LATERAL UNNEST(fps) AS u(h)
  WHERE {eval_pred_sql}
),
occ AS (
  SELECT doc_id, h
  FROM fps, LATERAL UNNEST(fps) AS u(h)
  WHERE {corpus_pred_sql}
),
hits AS (
  SELECT o.doc_id, COUNT(*) AS n_hits
  FROM occ o JOIN ev ON ev.h = o.h GROUP BY o.doc_id
)
SELECT CAST(f.doc_id AS BIGINT) AS doc_id,
       CAST(len(f.fps) AS BIGINT) AS n_positions,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       CAST(CASE WHEN len(f.fps) > 0
                  AND {CONTAM_DEN} * COALESCE(h.n_hits, 0) >= len(f.fps)
             THEN 1 ELSE 0 END AS BIGINT) AS contaminated
FROM fps f LEFT JOIN hits h ON h.doc_id = f.doc_id
WHERE {corpus_pred_sql.replace('doc_id', 'f.doc_id')}
ORDER BY doc_id
"""


REP_DEN = 5     # repetitive when duplicated k-grams >= 1/REP_DEN of all


def repetition_stats(docs: DataFrame, k: int = SPAN_K) -> DataFrame:
    """Intra-document repetition signal (the Gopher-class quality
    rule): n_kgrams = k-gram windows in the doc, n_distinct = distinct
    k-gram hashes, repetitive = 1 iff the duplicated fraction reaches
    1/REP_DEN (integer arithmetic: REP_DEN*(n - distinct) >= n > 0).
    Pure column functions — zero shuffles, map-only at any scale.
    -> (doc_id, n_kgrams, n_distinct_kgrams, repetitive)."""
    d = _with_kgrams(docs, k)
    n = F.size("_fps")
    nd = F.size(F.array_distinct("_fps"))
    return d.select(
        F.col("doc_id").cast("bigint"),
        n.cast("bigint").alias("n_kgrams"),
        nd.cast("bigint").alias("n_distinct_kgrams"),
        ((n > 0) & (REP_DEN * (n - nd) >= n))
        .cast("bigint").alias("repetitive"))


CDC_M = 16      # boundary when token-hash % CDC_M == 0 (~16-token chunks)


def cdc_chunks(docs: DataFrame, m: int = CDC_M) -> DataFrame:
    """Content-defined chunking + chunk-store dedup — the storage-layer
    dedup mode (rsync/LBFS/backup dedup): cut each document at
    content-determined token positions (token-hash ≡ 0 mod m, so the
    SAME byte runs chunk identically regardless of preceding edits),
    fingerprint each chunk, and mark the globally-first occurrence of
    every distinct chunk as canonical (the copy a chunk store keeps).

    Distributed shape: chunking is map-only per-doc array arithmetic
    (zero shuffles); dedup is ONE shuffle on the chunk fingerprint —
    uniform md5-derived keys, so no skew. Never all-pairs; state is
    bounded by occurrences-per-fingerprint. Insert-shifted copies of a
    run re-align at the next content boundary — the property fixed-size
    blocking lacks and the reason CDC is the storage-dedup standard.

    The boundary test hashes a 2-token window (the CDC sliding window),
    not a single token: the fixture vocabulary is ~31 words and a
    per-token rule would degenerate to "which vocab words are
    boundaries" (measured: none are, mod 16); token PAIRS spread
    quadratically, giving the designed ~1/m cut rate.

    -> (doc_id, chunk_idx, chunk_start, chunk_len, fp, n_occ, canonical)
    one row per chunk; canonical = 1 on the min-(doc_id, chunk_idx)
    occurrence of each fp."""
    # r8 shape (guide §4.1 — the repo's own minhash lesson: explode +
    # codegen beats interpreted array lambdas): the old form filtered
    # sequence(1, n) with element_at(_fps, j-1) per element; Catalyst
    # inlined the single-use hash-chain aliases into the lambdas AND
    # into the Generate's inferred non-empty filter, which predicate
    # pushdown then moved below the spread exchange — the optimized
    # plan held 37 copies of the conv/md5 chain in a single-task
    # interpreted Filter (caught by a 9-minute task + thread dump in
    # the r8 sweep). Now the word-hash array is exploded ONCE and the
    # boundary/chunk logic is relational: lag gives the 2-token window
    # hash, a prefix sum of cut flags numbers the chunks, and the
    # chunk fingerprint folds over a per-chunk collect_list value (a
    # materialized array — nothing left for the optimizer to inline).
    d = _with_kgrams(docs, 2)        # only _whs survives pruning
    n = F.size("_whs")
    tok = (d.where(n >= 1)
           .select("doc_id", F.posexplode("_whs").alias("_j0", "_h"))
           .select("doc_id", (F.col("_j0") + 1).alias("_j"), "_h"))
    wd = Window.partitionBy("doc_id").orderBy("_j")
    wfull = Window.partitionBy("doc_id")
    wprev = wd.rowsBetween(Window.unboundedPreceding, -1)
    # 2-token rolling hash ending at token j (pw = [B, 1], w = 2)
    fp2 = (F.lag("_h").over(wd) * (ROLL_B % FP_MOD)
           + F.col("_h")) % FP_MOD
    cut = ((F.col("_j") >= 2) & (fp2 % m == 0)) \
        | (F.col("_j") == F.col("_n"))
    tok = (tok.withColumn("_n", F.count("*").over(wfull))
           .withColumn("_cut", cut)
           .withColumn("_ck", F.lit(1) + F.coalesce(
               F.sum(F.col("_cut").cast("bigint")).over(wprev),
               F.lit(0))))
    ch = (tok.groupBy("doc_id", "_ck")
          .agg(F.min("_j").alias("_s"),
               F.count("*").alias("_len"),
               F.sort_array(F.collect_list(F.struct("_j", "_h")))
               .alias("_hs")))
    fp = F.aggregate(
        F.transform("_hs", lambda x: x["_h"]),
        F.lit(0).cast("bigint"),
        lambda acc, h: (acc * ROLL_B + h) % FP_MOD)
    ch = ch.select(
        F.col("doc_id").cast("bigint"),
        F.col("_ck").cast("bigint").alias("chunk_idx"),
        F.col("_s").cast("bigint").alias("chunk_start"),
        F.col("_len").cast("bigint").alias("chunk_len"),
        fp.alias("fp"))
    wf = Window.partitionBy("fp")
    wr = Window.partitionBy("fp").orderBy("doc_id", "chunk_idx")
    return (ch.withColumn("n_occ",
                          F.count("*").over(wf).cast("bigint"))
            .withColumn("canonical",
                        (F.row_number().over(wr) == 1).cast("bigint")))


def oracle_cdc_chunks(m: int = CDC_M) -> str:
    # list_prepend(0, ...) makes DuckDB's first-element-as-init
    # list_reduce equal to Spark's aggregate(slice, 0, fold).
    # fps[0] at j = 1 is NULL in DuckDB (lenient indexing) and the AND
    # collapses to false — mirrors the Spark lazy-CASE guard.
    return f"""
WITH t0 AS (SELECT doc_id, {_WHS_SQL} AS whs0 FROM documents),
t AS (
  SELECT doc_id,
         list_transform(whs0, h -> h % {FP_MOD}) AS whs,
         {_fps_sql(2).replace('whs[', 'whs0[')
                     .replace('len(whs)', 'len(whs0)')} AS fps
  FROM t0
),
e AS (
  SELECT doc_id, whs,
         list_filter(range(1, len(whs) + 1),
                     j -> j = len(whs)
                          OR (j >= 2 AND fps[j - 1] % {m} = 0)) AS ends
  FROM t WHERE len(whs) >= 1
),
ch AS (
  SELECT doc_id, whs, i AS chunk_idx, ends[i] AS ce,
         CASE WHEN i = 1 THEN 1 ELSE ends[i - 1] + 1 END AS cs
  FROM e, LATERAL UNNEST(range(1, len(ends) + 1)) AS u(i)
),
fp AS (
  SELECT doc_id, chunk_idx, cs, ce - cs + 1 AS chunk_len,
         list_reduce(list_prepend(CAST(0 AS BIGINT), whs[cs:ce]),
                     (acc, h) -> (acc * {ROLL_B} + h) % {FP_MOD}) AS fp
  FROM ch
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(cs AS BIGINT) AS chunk_start,
       CAST(chunk_len AS BIGINT) AS chunk_len,
       CAST(fp AS BIGINT) AS fp,
       CAST(COUNT(*) OVER (PARTITION BY fp) AS BIGINT) AS n_occ,
       CAST(CASE WHEN ROW_NUMBER() OVER (
                PARTITION BY fp ORDER BY doc_id, chunk_idx) = 1
             THEN 1 ELSE 0 END AS BIGINT) AS canonical
FROM fp ORDER BY doc_id, chunk_idx
"""


def oracle_repetition_stats(k: int = SPAN_K) -> str:
    return f"""
WITH t AS (SELECT doc_id, {_WHS_SQL} AS whs FROM documents),
fps AS (SELECT doc_id, {_fps_sql(k)} AS fps FROM t)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(len(fps) AS BIGINT) AS n_kgrams,
       CAST(len(list_distinct(fps)) AS BIGINT) AS n_distinct_kgrams,
       CAST(CASE WHEN len(fps) > 0
                  AND {REP_DEN} * (len(fps) - len(list_distinct(fps)))
                      >= len(fps)
             THEN 1 ELSE 0 END AS BIGINT) AS repetitive
FROM fps ORDER BY doc_id
"""
