"""Text-analysis operators: token stats, quality scoring, language-ID
heuristic, document fingerprinting. All integer-valued outputs so the
DuckDB oracle comparison is bit-exact; all JVM-side column functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import norm_text_col, word_hash_col, MINHASH_P

# deterministic marker sets for the language-ID heuristic (the testdata
# text is synthetic; what matters is a deterministic, SQL-expressible
# scoring rule — the real-world analogue is stopword-set scoring)
LANG_MARKERS = {
    "en": ["the", "a", "fast", "slow"],
    "de": ["data", "group", "merge", "window"],
    "fr": ["query", "filter", "join", "sort"],
}
STOPWORDS = ["the", "a", "of", "and", "to"]
FP_MOD = 999_999_937  # large prime < 2^30


def _with_words(docs: DataFrame) -> DataFrame:
    """Materialize the normalized text + word array once per row
    (repeating the split expression would re-run the regexp per use)."""
    return docs.select(
        "*", norm_text_col(F.col("text")).alias("_norm")
    ).withColumn("_words", F.split(F.col("_norm"), " "))


def token_stats(docs: DataFrame) -> DataFrame:
    """-> (doc_id, n_tokens, n_chars_norm, n_distinct_tokens,
    max_token_len) — whitespace tokenization over normalized text."""
    d = _with_words(docs)
    words = F.col("_words")
    return d.select(
        F.col("doc_id").cast("bigint"),
        F.size(words).cast("bigint").alias("n_tokens"),
        F.length("_norm").cast("bigint").alias("n_chars_norm"),
        F.size(F.array_distinct(words)).cast("bigint").alias("n_distinct_tokens"),
        F.array_max(F.transform(words, F.length)).cast("bigint").alias("max_token_len"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Integer quality score 0..3: +1 length in [50, 2000] chars,
    +1 stopword count in [1, 40], +1 distinct-token ratio >= 1/2
    (2*distinct >= total). -> (doc_id, quality)."""
    d = _with_words(docs)
    words = F.col("_words")
    n = F.size(words)
    dist = F.size(F.array_distinct(words))
    stop = F.size(F.filter(words, lambda w: w.isin(STOPWORDS)))
    ln = F.length("_norm")
    q = (F.when(ln.between(50, 2000), 1).otherwise(0)
         + F.when(stop.between(1, 40), 1).otherwise(0)
         + F.when(2 * dist >= n, 1).otherwise(0))
    return d.select(F.col("doc_id").cast("bigint"),
                    q.cast("bigint").alias("quality"))


def lang_id(docs: DataFrame) -> DataFrame:
    """Marker-word language-ID heuristic: predicted language = argmax of
    marker occurrence counts, ties broken by language name ascending.
    -> (doc_id, predicted_lang, lang) with the table's label for
    side-by-side accuracy reads."""
    d = _with_words(docs)
    words = F.col("_words")
    scores = {lang: F.size(F.filter(words, lambda w: w.isin(markers)))
              for lang, markers in LANG_MARKERS.items()}
    # argmax with lexicographic tie-break: iterate langs sorted DESC and
    # pick with >= so earlier (ASC) names win ties
    pred = None
    for lang in sorted(LANG_MARKERS, reverse=True):
        if pred is None:
            pred = F.lit(lang)
            best = scores[lang]
        else:
            cond = scores[lang] >= best
            best = F.when(cond, scores[lang]).otherwise(best)
            pred = F.when(cond, F.lit(lang)).otherwise(pred)
    return d.select(F.col("doc_id").cast("bigint"),
                    pred.alias("predicted_lang"), "lang")


def doc_fingerprint(docs: DataFrame) -> DataFrame:
    """Order-sensitive polynomial fingerprint:
    sum over positions of (pos+1) * (word_hash mod p) mod p.
    -> (doc_id, fingerprint)."""
    words = F.split(norm_text_col(F.col("text")), " ")
    ex = docs.select("doc_id", F.posexplode(words).alias("pos", "w"))
    term = (F.col("pos") + 1) * (word_hash_col(F.col("w")) % FP_MOD)
    return (ex.groupBy("doc_id")
            .agg((F.sum(term) % FP_MOD).alias("fingerprint"))
            .select(F.col("doc_id").cast("bigint"),
                    F.col("fingerprint").cast("bigint")))


# BPE-ish tokenizer pattern (GPT-2-style shape, ASCII on normalized
# text): optional-apostrophe letter runs | digit runs | single other
# char. No lookarounds, so Java regex (Spark) and RE2 (DuckDB) agree —
# both use leftmost-first alternation.
BPE_PATTERN = "'?[a-z]+|[0-9]+|[^a-z0-9 ]"


def bpe_token_count(docs: DataFrame) -> DataFrame:
    """Sub-word-ish token counting: whitespace tokens AND the BPE-ish
    regex token count (digits split from letters, punctuation
    tokenized singly — the pre-tokenization shape BPE vocabularies
    assume). -> (doc_id, n_ws_tokens, n_bpe_tokens)."""
    d = _with_words(docs)
    return d.select(
        F.col("doc_id").cast("bigint"),
        F.size(F.col("_words")).cast("bigint").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col("_norm"), F.lit(BPE_PATTERN), 0))
        .cast("bigint").alias("n_bpe_tokens"))


ROLL_W = 4       # rolling window width (tokens)
ROLL_B = 131     # polynomial base


def _token_hash_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, j, h): 1-based token position + word hash, ONE
    codegen'd md5/conv per token via explode. r8: the array form
    (transform + element_at over a `_whs` alias) let Catalyst inline
    the hash chain into downstream lambdas and Generate-inferred
    filters — interpreted, duplicated up to 37x, and pushed below the
    spread exchange into a single scan task (thread-dump evidence in
    OPTIMIZATION_r08.md). Exploded rows leave nothing to inline."""
    from .dedup import word_hash_col
    d = _with_words(docs)
    return (d.select("doc_id",
                     F.posexplode("_words").alias("_j0", "_w"))
            .select("doc_id", (F.col("_j0") + 1).alias("j"),
                    (word_hash_col(F.col("_w")) % FP_MOD).alias("h")))


def _window_hash_rows(docs: DataFrame, w: int,
                      base: int = ROLL_B) -> DataFrame:
    """(doc_id, j, wh, n): Rabin-Karp w-token window hash per 1-based
    window start j, n = doc token count — the relational twin of
    :func:`_window_hash_array` (identical int64 arithmetic, same term
    order, so bit-identical hashes)."""
    from pyspark.sql.window import Window as _W
    tok = _token_hash_rows(docs)
    wd = _W.partitionBy("doc_id").orderBy("j")
    pw = [pow(base, w - 1 - i, FP_MOD) for i in range(w)]
    acc = None
    for i in range(w):
        col = F.col("h") if i == 0 else F.lead("h", i).over(wd)
        term = col * F.lit(pw[i])
        acc = term if acc is None else acc + term
    return (tok.withColumn("_n", F.count("*")
                           .over(_W.partitionBy("doc_id")))
            .withColumn("wh", acc % FP_MOD)
            .where(F.col("j") + (w - 1) <= F.col("_n"))
            .select("doc_id", "j", "wh", F.col("_n").alias("n")))


def rolling_fingerprint(docs: DataFrame, w: int = ROLL_W,
                        base: int = ROLL_B) -> DataFrame:
    """Rabin-Karp rolling-hash document fingerprint (the winnowing
    primitive): hash every w-token window polynomially, keep the MIN
    window hash as the doc fingerprint (-1 for docs shorter than w
    tokens). The unrolled fixed-width polynomial keeps the arithmetic
    pure int64 and bit-identical in DuckDB.
    -> (doc_id, min_window_fp)."""
    # relational form (r8): window hashes as rows, min-agg per doc;
    # docs shorter than w tokens have no window rows and fill with -1
    mins = (_window_hash_rows(docs, w, base)
            .groupBy("doc_id")
            .agg(F.min("wh").alias("_mn")))
    return (docs.select(F.col("doc_id").cast("bigint"))
            .join(mins, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("_mn", F.lit(-1)).cast("bigint")
                    .alias("min_window_fp")))


WINNOW_G = 3     # guarantee window (in rolling-hash positions)


def _window_hash_array(w: int, base: int):
    """Column expr: array of Rabin-Karp hashes over w-token windows of
    the bound ``_whs`` word-hash array (unrolled fixed-width poly —
    pure int64, bit-identical in DuckDB)."""
    pw = [pow(base, w - 1 - i, FP_MOD) for i in range(w)]

    def window_fp(j):
        acc = None
        for i in range(w):
            term = F.element_at("_whs", j + i) * F.lit(pw[i])
            acc = term if acc is None else acc + term
        return acc % FP_MOD

    n = F.size(F.col("_whs"))
    arr = F.transform(F.sequence(F.lit(1), n - (w - 1)), window_fp)
    # lazy CASE guard (same idiom as rolling_fingerprint): for docs with
    # fewer than w tokens the sequence would DESCEND (1, 0, -1, ...) and
    # element_at would throw on index <= 0 — emit an empty array instead
    return F.when(n >= w, arr).otherwise(F.array().cast("array<bigint>"))


def winnow_fingerprints(docs: DataFrame, w: int = ROLL_W,
                        g: int = WINNOW_G, base: int = ROLL_B
                        ) -> DataFrame:
    """Winnowing (the MOSS document-fingerprinting scheme): take the
    MINIMUM rolling hash in every g-window over the w-token rolling
    hashes and keep the distinct set. Guarantee: any shared token run
    of length >= g + w - 1 produces a shared fingerprint — the local
    version of the global min the rolling_fingerprint op keeps.
    -> exploded (doc_id, fp), one row per selected fingerprint."""
    # relational form (r8): per-position g-window minimum as a sliding
    # ROWS frame over the window-hash rows, then distinct — same set
    # as the old array_distinct(transform(... array_min(slice)))
    from pyspark.sql.window import Window as _W
    whr = _window_hash_rows(docs, w, base)
    frame = (_W.partitionBy("doc_id").orderBy("j")
             .rowsBetween(_W.currentRow, g - 1))
    nf = F.col("n") - (w - 1)            # number of w-token windows
    return (whr.withColumn("_gmin", F.min("wh").over(frame))
            .where(F.col("j") <= nf - (g - 1))
            .select(F.col("doc_id").cast("bigint"),
                    F.col("_gmin").alias("fp"))
            .distinct())


def winnow_candidate_pairs(docs: DataFrame, w: int = ROLL_W,
                           g: int = WINNOW_G, min_shared: int = 2
                           ) -> DataFrame:
    """Near-dup candidates by shared winnowed fingerprints — an
    inverted-index equi-join on fingerprints (bounded by fingerprint
    collisions, never all-pairs), the standard MOSS candidate
    generator. -> (doc_a, doc_b, shared) with shared >= min_shared."""
    fps = winnow_fingerprints(docs, w, g)
    a = fps.select(F.col("doc_id").alias("doc_a"), "fp")
    b = fps.select(F.col("doc_id").alias("doc_b"), "fp")
    return (a.join(b, ["fp"])
            .where(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").alias("shared"))
            .where(F.col("shared") >= min_shared)
            .select(F.col("doc_a").cast("bigint"),
                    F.col("doc_b").cast("bigint"),
                    F.col("shared").cast("bigint")))


CHUNK_W, CHUNK_S = 64, 48   # window / stride (16-word overlap)


def stride_chunks(docs: DataFrame, window: int = CHUNK_W,
                  stride: int = CHUNK_S) -> DataFrame:
    """Fixed-stride document chunking — the training-prep windowing
    next to content-defined chunking (doc_cdc_chunks): every document
    splits into word windows of size ``window`` advancing by
    ``stride`` (overlap = window − stride keeps context across chunk
    boundaries, the standard LM pretraining shape). Pure JVM column
    ops: ONE split per row, explode(sequence) for starts, slice per
    chunk — no UDF, no shuffle (chunk rows inherit the input
    partitioning; at 100 TB the ~n/stride-per-doc fan-out happens
    map-side and flows straight into packing).

    Each chunk carries an md5-prefix content fingerprint so the gate
    compare proves the exact word slice, not just counts.
    -> (doc_id, chunk_idx, n_words, fp)."""
    from .dedup import word_hash_col
    w = _with_words(docs)
    w = w.withColumn("_n", F.size("_words"))
    starts = F.explode(F.sequence(
        F.lit(0), F.greatest(F.col("_n") - 1, F.lit(0)), F.lit(stride)))
    chunk = F.slice("_words", F.col("_start") + 1, window)
    return (w.withColumn("_start", starts)
            .select("doc_id",
                    (F.col("_start") / stride).cast("bigint")
                    .alias("chunk_idx"),
                    F.size(chunk).cast("bigint").alias("n_words"),
                    word_hash_col(F.array_join(chunk, " ")).alias("fp"))
            .orderBy("doc_id", "chunk_idx"))


def oracle_stride_chunks(window: int = CHUNK_W,
                         stride: int = CHUNK_S) -> str:
    return f"""
WITH w AS (SELECT doc_id, {_WORDS} AS words,
                  len({_WORDS}) AS n FROM documents),
ch AS (
  SELECT doc_id, s // {stride} AS chunk_idx,
         list_slice(words, s + 1, LEAST(s + {window}, n)) AS chunk
  FROM w, UNNEST(range(0, GREATEST(n, 1), {stride})) AS t(s))
SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(len(chunk) AS BIGINT) AS n_words,
       ('0x' || substr(md5(array_to_string(chunk, ' ')), 1, 15))::BIGINT
         AS fp
FROM ch ORDER BY doc_id, chunk_idx
"""


# ---------------------------------------------------------------------------
# DuckDB oracle mirrors
# ---------------------------------------------------------------------------

_NORM = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
_WORDS = f"string_split({_NORM}, ' ')"


def oracle_token_stats() -> str:
    return f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(len({_WORDS}) AS BIGINT) AS n_tokens,
       CAST(length({_NORM}) AS BIGINT) AS n_chars_norm,
       CAST(len(list_distinct({_WORDS})) AS BIGINT) AS n_distinct_tokens,
       CAST(list_max(list_transform({_WORDS}, w -> length(w))) AS BIGINT)
         AS max_token_len
FROM documents ORDER BY doc_id
"""


def oracle_quality_score() -> str:
    stop_list = ",".join(f"'{w}'" for w in STOPWORDS)
    return f"""
WITH t AS (
  SELECT doc_id, {_WORDS} AS words, length({_NORM}) AS ln FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST((CASE WHEN ln BETWEEN 50 AND 2000 THEN 1 ELSE 0 END)
          + (CASE WHEN len(list_filter(words, w -> w IN ({stop_list})))
                  BETWEEN 1 AND 40 THEN 1 ELSE 0 END)
          + (CASE WHEN 2 * len(list_distinct(words)) >= len(words)
                  THEN 1 ELSE 0 END) AS BIGINT) AS quality
FROM t ORDER BY doc_id
"""


def oracle_lang_id() -> str:
    score_sqls = {
        lang: ("len(list_filter(words, w -> w IN ("
               + ",".join(f"'{m}'" for m in markers) + ")))")
        for lang, markers in LANG_MARKERS.items()
    }
    pred = None
    for lang in sorted(LANG_MARKERS, reverse=True):
        if pred is None:
            pred = f"'{lang}'"
            best = score_sqls[lang]
        else:
            pred = (f"CASE WHEN {score_sqls[lang]} >= ({best}) "
                    f"THEN '{lang}' ELSE {pred} END")
            best = (f"CASE WHEN {score_sqls[lang]} >= ({best}) "
                    f"THEN {score_sqls[lang]} ELSE ({best}) END")
    return f"""
WITH t AS (SELECT doc_id, lang, {_WORDS} AS words FROM documents)
SELECT CAST(doc_id AS BIGINT) AS doc_id, {pred} AS predicted_lang, lang
FROM t ORDER BY doc_id
"""


def oracle_bpe_token_count() -> str:
    pat_sql = BPE_PATTERN.replace("'", "''")
    return f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(len({_WORDS}) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all({_NORM}, '{pat_sql}')) AS BIGINT)
         AS n_bpe_tokens
FROM documents ORDER BY doc_id
"""


def oracle_rolling_fingerprint(w: int = ROLL_W, base: int = ROLL_B) -> str:
    pw = [pow(base, w - 1 - i, FP_MOD) for i in range(w)]
    terms = " + ".join(
        f"((('0x' || substr(md5(whs[j + {i}]), 1, 15))::BIGINT) "
        f"% {FP_MOD}) * {pw[i]}"
        for i in range(w))
    return f"""
WITH t AS (SELECT doc_id, {_WORDS} AS whs FROM documents),
fps AS (
  SELECT doc_id,
         CASE WHEN len(whs) >= {w} THEN
           list_min(list_transform(range(1, len(whs) - {w - 2}),
                                   j -> ({terms}) % {FP_MOD}))
         ELSE -1 END AS min_window_fp
  FROM t
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(min_window_fp AS BIGINT) AS min_window_fp
FROM fps ORDER BY doc_id
"""


def oracle_winnow_pairs(w: int = ROLL_W, g: int = WINNOW_G,
                        min_shared: int = 2,
                        base: int = ROLL_B) -> str:
    pw = [pow(base, w - 1 - i, FP_MOD) for i in range(w)]
    terms = " + ".join(
        f"((('0x' || substr(md5(whs[j + {i}]), 1, 15))::BIGINT) "
        f"% {FP_MOD}) * {pw[i]}"
        for i in range(w))
    return f"""
WITH t AS (SELECT doc_id, {_WORDS} AS whs FROM documents),
rolled AS (
  SELECT doc_id,
         list_transform(range(1, len(whs) - {w - 2}),
                        j -> ({terms}) % {FP_MOD}) AS fps
  FROM t WHERE len(whs) >= {w}
),
sel AS (
  SELECT DISTINCT doc_id, fp FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(fps) - {g - 2}),
                                 j -> list_min(fps[j:j + {g - 1}]))) AS fp
    FROM rolled WHERE len(fps) >= {g}
  )
)
SELECT CAST(a.doc_id AS BIGINT) AS doc_a,
       CAST(b.doc_id AS BIGINT) AS doc_b,
       CAST(COUNT(*) AS BIGINT) AS shared
FROM sel a JOIN sel b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING COUNT(*) >= {min_shared}
ORDER BY doc_a, doc_b
"""


def oracle_doc_fingerprint() -> str:
    return f"""
WITH t AS (SELECT doc_id, {_WORDS} AS words FROM documents),
e AS (
  SELECT doc_id, i AS pos1, words[i] AS w
  FROM t, UNNEST(range(1, len(words) + 1)) AS u(i)
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(SUM(pos1 * ((('0x' || substr(md5(w), 1, 15))::BIGINT) % {FP_MOD}))
            % {FP_MOD} AS BIGINT) AS fingerprint
FROM e GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# PII scrubbing (r5) — the standard pre-training redaction pass
# ---------------------------------------------------------------------------
# Patterns are deliberately restricted to the regex subset on which
# Java regex (Spark) and RE2 (DuckDB) agree exactly: character
# classes, +, bounded repetition and literals — no backrefs,
# lookaround or lazy quantifiers. Email first, then IPv4 (the email
# replacement token contains no digit-dot runs, so ordering is safe).
PII_EMAIL = "[a-z0-9._%+-]+@[a-z0-9.-]+"
PII_IPV4 = "[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+"


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails and IPv4 literals from the (normalized) text:
    -> (doc_id, n_emails, n_ips, scrubbed_fp) where scrubbed_fp
    fingerprints the post-redaction text (md5 -> int64), proving the
    exact surviving byte sequence. Pure column functions — zero
    shuffles, zero Python; the 100 TB posture is a map-only pass."""
    norm = norm_text_col(F.col(text_col))
    n_emails = F.size(F.regexp_extract_all(norm, F.lit(PII_EMAIL), 0))
    step1 = F.regexp_replace(norm, PII_EMAIL, "<EMAIL>")
    n_ips = F.size(F.regexp_extract_all(step1, F.lit(PII_IPV4), 0))
    scrubbed = F.regexp_replace(step1, PII_IPV4, "<IP>")
    return docs.select(
        F.col("doc_id").cast("bigint"),
        n_emails.cast("bigint").alias("n_emails"),
        n_ips.cast("bigint").alias("n_ips"),
        F.conv(F.substring(F.md5(scrubbed), 1, 15), 16, 10)
        .cast("bigint").alias("scrubbed_fp"))


def oracle_pii_scrub(text_sql: str = "text") -> str:
    # SQL single-quoted literals pass backslashes through verbatim, so
    # the python-level patterns embed unchanged (same as _NORM's \s+)
    email = PII_EMAIL
    ipv4 = PII_IPV4
    norm = (f"regexp_replace(lower(trim({text_sql})), '\\s+', ' ', 'g')")
    step1 = f"regexp_replace({norm}, '{email}', '<EMAIL>', 'g')"
    return f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(len(regexp_extract_all({norm}, '{email}')) AS BIGINT)
         AS n_emails,
       CAST(len(regexp_extract_all({step1}, '{ipv4}')) AS BIGINT)
         AS n_ips,
       ('0x' || substr(md5(
           regexp_replace({step1}, '{ipv4}', '<IP>', 'g')),
           1, 15))::BIGINT AS scrubbed_fp
FROM documents ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Compressed-corpus ingestion (r5) — the WARC-ish text pipeline front
# ---------------------------------------------------------------------------

def synth_zlib_corpus(docs: DataFrame, level: int = 6) -> DataFrame:
    """Deterministic compressed-corpus fixture: each document's text
    zlib-deflated (stdlib, no gzip header — gzip embeds an mtime and
    would break determinism) in an Arrow mapInPandas stage.
    -> (doc_id, blob BINARY). Stands in for a real compressed text
    corpus (WARC/WET shards) as an ingestion source."""
    import zlib

    def fn(batches):
        for pdf in batches:
            pdf = pdf[["doc_id", "text"]].copy()
            pdf["blob"] = [zlib.compress(t.encode("utf-8"), level)
                           for t in pdf["text"]]
            yield pdf[["doc_id", "blob"]]

    return docs.mapInPandas(fn, schema="doc_id BIGINT, blob BINARY")


def decompress_corpus(blobs: DataFrame) -> DataFrame:
    """Inflate a compressed text corpus and emit per-doc ingestion
    stats: -> (doc_id, n_bytes, text_fp) where text_fp fingerprints
    the DECOMPRESSED bytes (md5 -> int64) — the oracle proves the
    exact round-trip against the uncompressed source. Arrow-batched;
    malformed streams raise (zlib.error) rather than yielding
    corrupt rows."""
    import zlib

    def fn(batches):
        import hashlib

        import pandas as pd
        for pdf in batches:
            out = {"doc_id": [], "n_bytes": [], "text_fp": []}
            for did, blob in zip(pdf["doc_id"], pdf["blob"]):
                raw = zlib.decompress(bytes(blob))
                out["doc_id"].append(int(did))
                out["n_bytes"].append(len(raw))
                out["text_fp"].append(
                    int(hashlib.md5(raw).hexdigest()[:15], 16))
            yield pd.DataFrame(out)

    return blobs.mapInPandas(
        fn, schema="doc_id BIGINT, n_bytes BIGINT, text_fp BIGINT")


def oracle_decompress_corpus() -> str:
    """The round-trip must reproduce the source text byte-for-byte:
    n_bytes = UTF-8 byte length, text_fp = md5 of the raw text."""
    return """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
       ('0x' || substr(md5(text), 1, 15))::BIGINT AS text_fp
FROM documents ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Model-based quality filtering (r5) — the classifier-filter hook
# ---------------------------------------------------------------------------

QFILTER_THRESHOLD = 500   # keep when score_milli >= threshold


def _hash_scorer(texts):
    """Deterministic stand-in scorer: md5 of the normalized text mod
    1001 (integer milli-units). The container ships no model runtimes
    (fastText / ONNX), so — same honest-stub pattern as the media
    codec tier — the MODEL is faked deterministically while the
    surrounding Spark plumbing (Arrow batch shape, schema, partition
    behavior, threshold semantics) is real and oracle-gated."""
    import hashlib
    out = []
    for t in texts:
        norm = " ".join(t.strip().lower().split())
        out.append(int(hashlib.md5(norm.encode()).hexdigest()[:15], 16)
                   % 1001)
    return out


def model_quality_filter(docs: DataFrame, scorer=None,
                         threshold: int = QFILTER_THRESHOLD
                         ) -> DataFrame:
    """Classifier-style quality filtering (the fastText/model-filter
    curation mode): ``scorer`` is any callable mapping a list of raw
    text strings to integer scores in [0, 1000] (milli-units keep the
    comparison integer-exact), applied per Arrow batch inside
    mapInPandas — exactly where a real model's batched predict would
    run (load the model once per worker, score a batch at a time).
    scorer=None uses the deterministic hash stand-in.
    -> (doc_id, score_milli, keep)."""
    score_fn = scorer or _hash_scorer

    def fn(batches):
        import pandas as pd
        for pdf in batches:
            scores = score_fn(list(pdf["text"]))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "score_milli": pd.array(scores, dtype="int64"),
                "keep": pd.array([1 if s >= threshold else 0
                                  for s in scores], dtype="int64"),
            })

    return docs.mapInPandas(
        fn, schema="doc_id BIGINT, score_milli BIGINT, keep BIGINT")


def oracle_model_quality_filter(threshold: int = QFILTER_THRESHOLD
                                ) -> str:
    norm = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
    score = f"(('0x' || substr(md5({norm}), 1, 15))::BIGINT) % 1001"
    return f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST({score} AS BIGINT) AS score_milli,
       CAST(CASE WHEN {score} >= {threshold} THEN 1 ELSE 0 END
            AS BIGINT) AS keep
FROM documents ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Perplexity-style filtering via a self-trained unigram LM (r5)
# ---------------------------------------------------------------------------

SURPRISAL_THRESHOLD_MILLI = 4040  # keep when mean surprisal <= 4.04 bits/tok


def surprisal_filter(docs: DataFrame,
                     threshold_milli: int = SURPRISAL_THRESHOLD_MILLI
                     ) -> DataFrame:
    """Perplexity-filter analogue (CCNet-style LM filtering) with a
    unigram LM trained on the corpus itself, integer-exact so the
    DuckDB oracle compares bit-for-bit.

    Token surprisal is the integer ``floor(log2(N / cnt(w)))`` computed
    WITHOUT floats as ``length(bin(N div cnt)) - 1`` (binary-string
    length == bit_length, exact in both engines; the real-valued log
    only smooths the same ordering). Per doc: total surprisal bits,
    token count, mean milli-bits/token (integer div), and the keep
    verdict ``mean <= threshold`` — high mean surprisal = rare-token
    soup = filtered, exactly the role model perplexity plays in a real
    curation stack (a learned LM plugs in via model_quality_filter's
    scorer hook).

    Scale shape: one explode + groupBy(token) shuffle for the vocab
    (map-side partial aggs), one shuffle join tokens->counts (AQE
    broadcasts the vocab side when it fits), one groupBy(doc_id). The
    corpus total N rides in via a broadcast 1-row cross join, never a
    driver collect. -> (doc_id, n_tokens, total_surprisal_bits,
    mean_surprisal_milli, keep)."""
    ex = docs.select(
        "doc_id",
        F.explode(F.split(norm_text_col(F.col("text")), " ")).alias("w"))
    vocab = ex.groupBy("w").agg(F.count("*").cast("bigint").alias("cnt"))
    total = vocab.agg(F.sum("cnt").cast("bigint").alias("n_total"))
    s = (F.length(F.bin(F.expr("n_total div cnt"))) - 1).cast("bigint")
    scored = (ex.join(vocab, "w").crossJoin(F.broadcast(total))
              .select("doc_id", s.alias("s")))
    mean_milli = F.expr("(sum(s) * 1000) div count(*)")
    return (scored.groupBy("doc_id")
            .agg(F.count("*").cast("bigint").alias("n_tokens"),
                 F.sum("s").cast("bigint").alias("total_surprisal_bits"),
                 mean_milli.cast("bigint").alias("mean_surprisal_milli"))
            .select(F.col("doc_id").cast("bigint"), "n_tokens",
                    "total_surprisal_bits", "mean_surprisal_milli",
                    F.when(F.col("mean_surprisal_milli")
                           <= threshold_milli, 1).otherwise(0)
                    .cast("bigint").alias("keep")))


def oracle_surprisal_filter(
        threshold_milli: int = SURPRISAL_THRESHOLD_MILLI) -> str:
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({_WORDS}) AS w FROM documents
), vocab AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY w
), tot AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS n_total FROM vocab
), scored AS (
  SELECT t.doc_id, CAST(length(bin(n_total // cnt)) - 1 AS BIGINT) AS s
  FROM tok t JOIN vocab USING (w) CROSS JOIN tot
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(s) AS BIGINT) AS total_surprisal_bits,
       CAST((SUM(s) * 1000) // COUNT(*) AS BIGINT) AS mean_surprisal_milli,
       CAST(CASE WHEN (SUM(s) * 1000) // COUNT(*) <= {threshold_milli}
                 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM scored GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# TF-IDF keyword extraction
# ---------------------------------------------------------------------------

TFIDF_K = 5


def tfidf_topk(docs: DataFrame, k: int = TFIDF_K) -> DataFrame:
    """Top-``k`` characteristic terms per document by tf·idf rank.

    Float-free variant so the DuckDB oracle compares bit-for-bit: the
    score is the LINEAR-idf ``floor(tf · N · 10^6 / df)`` (monotone in
    tf/df like the classic log form; the log only compresses the
    ordering, and any log-vs-linear rank differences are a definition
    choice, not an approximation). Ties broken by term ascending —
    fully deterministic.

    Scale posture: explode → two hash aggregations (both map-side
    partial), one join on term (vocab-sized — shuffle; AQE broadcasts
    it when the dictionary is small), one tiny broadcast for N, and a
    per-doc window for top-k. No all-pairs anywhere; the explode is
    output-proportional (one row per token occurrence, the same volume
    a tokenizer already produces).

    -> (doc_id, term, tf, df_docs, score_micro, rk), rk in [1, k].
    """
    d = _with_words(docs)
    terms = (d.select("doc_id", F.explode("_words").alias("term"))
             .where(F.col("term") != "")
             .groupBy("doc_id", "term")
             .agg(F.count("*").cast("bigint").alias("tf")))
    dfreq = (terms.groupBy("term")
             .agg(F.count("*").cast("bigint").alias("df_docs")))
    ndocs = docs.agg(F.count("*").cast("bigint").alias("n_docs"))
    from pyspark.sql import Window
    w = (Window.partitionBy("doc_id")
         .orderBy(F.col("score_micro").desc(), F.col("term").asc()))
    return (terms.join(dfreq, "term")
            .crossJoin(F.broadcast(ndocs))
            .withColumn("score_micro",
                        F.floor(F.col("tf") * F.col("n_docs")
                                * F.lit(1_000_000) / F.col("df_docs"))
                        .cast("bigint"))
            .withColumn("rk", F.row_number().over(w).cast("bigint"))
            .where(F.col("rk") <= k)
            .select(F.col("doc_id").cast("bigint"), "term", "tf",
                    "df_docs", "score_micro", "rk"))


def oracle_tfidf_topk(k: int = TFIDF_K) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({_WORDS}) AS term FROM documents
), terms AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks WHERE term <> '' GROUP BY doc_id, term
), dfreq AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df_docs
  FROM terms GROUP BY term
), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
scored AS (
  SELECT t.doc_id, t.term, t.tf, d.df_docs,
         CAST(FLOOR(t.tf * n.n_docs * 1000000 / d.df_docs) AS BIGINT)
           AS score_micro
  FROM terms t JOIN dfreq d USING (term) CROSS JOIN n
), ranked AS (
  SELECT *, CAST(ROW_NUMBER() OVER (
              PARTITION BY doc_id ORDER BY score_micro DESC, term ASC)
            AS BIGINT) AS rk
  FROM scored
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, term, tf, df_docs,
       score_micro, rk
FROM ranked WHERE rk <= {k} ORDER BY doc_id, rk
"""


# ---------------------------------------------------------------------------
# Corpus distribution stats (discrete quantiles)
# ---------------------------------------------------------------------------

QUANTILES = (0.25, 0.5, 0.9)


def length_quantiles(docs: DataFrame, col: str = "n_chars",
                     strata_cols: list[str] = ("lang",),
                     qs: tuple = QUANTILES) -> DataFrame:
    """Per-stratum discrete quantiles of an integer column — the
    corpus-profiling step behind length/outlier filter thresholds.

    ``percentile_disc`` (ANSI discrete percentile: smallest element
    with cum_dist ≥ p) returns an ACTUAL element, so the output stays
    integer and the DuckDB ``quantile_disc`` oracle compares
    bit-for-bit — no interpolation, no floats. One shuffle (the
    per-stratum sort inside the aggregate); at 100 TB swap in
    approx_percentile for a sketch-merge plan if the exact sort ever
    binds, keeping this as the audit oracle.
    """
    aggs = [F.expr(f"percentile_disc({q}) WITHIN GROUP (ORDER BY {col})")
            .cast("bigint").alias(f"p{int(q * 100)}") for q in qs]
    aggs.append(F.count("*").cast("bigint").alias("n"))
    return docs.groupBy(*strata_cols).agg(*aggs)


def oracle_length_quantiles(col: str = "n_chars",
                            strata_sql: str = "lang",
                            qs: tuple = QUANTILES) -> str:
    sel = ", ".join(
        f"CAST(quantile_disc({col}, {q}) AS BIGINT) AS p{int(q * 100)}"
        for q in qs)
    return f"""
SELECT {strata_sql}, {sel}, CAST(COUNT(*) AS BIGINT) AS n
FROM documents GROUP BY {strata_sql} ORDER BY {strata_sql}
"""


# ---------------------------------------------------------------------------
# Corpus n-gram count table
# ---------------------------------------------------------------------------

NGRAM_N = 3
NGRAM_TOPK = 50


def ngram_counts(docs: DataFrame, n: int = NGRAM_N,
                 topk: int = NGRAM_TOPK) -> DataFrame:
    """Corpus-level n-gram count table, top-``topk`` by (count desc,
    ngram asc) — the raw material for contamination screens, LM count
    tables and quality heuristics.

    The per-doc n-gram list is built with a JVM-side ``transform`` over
    the word array (no explode-then-window), then exploded once and
    hash-aggregated: one shuffle, map-side partial aggregation, and the
    final top-k is a single-partition sort of an already-tiny aggregate.
    -> (ngram, n_occurrences, n_docs).
    """
    d = _with_words(docs)
    w = F.col("_words")
    grams = F.when(
        F.size(w) >= n,
        F.transform(F.slice(w, 1, F.greatest(F.size(w) - (n - 1),
                                             F.lit(0))),
                    lambda _, i: F.concat_ws(
                        " ", *[F.element_at(w, i + j + 1)
                               for j in range(n)]))
    ).otherwise(F.array())
    ex = d.select("doc_id", F.explode(grams).alias("ngram"))
    return (ex.groupBy("ngram")
            .agg(F.count("*").cast("bigint").alias("n_occurrences"),
                 F.countDistinct("doc_id").cast("bigint").alias("n_docs"))
            .orderBy(F.col("n_occurrences").desc(), F.col("ngram").asc())
            .limit(topk))


def oracle_ngram_counts(n: int = NGRAM_N, topk: int = NGRAM_TOPK) -> str:
    # DuckDB: generate positions 1..len-n+1, slice the split list
    return f"""
WITH w AS (
  SELECT doc_id, {_WORDS} AS words FROM documents
), pos AS (
  SELECT doc_id, words,
         unnest(generate_series(1, len(words) - {n - 1})) AS p
  FROM w WHERE len(words) >= {n}
), grams AS (
  SELECT doc_id, array_to_string(words[p:p+{n - 1}], ' ') AS ngram
  FROM pos
)
SELECT ngram, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM grams GROUP BY ngram
ORDER BY n_occurrences DESC, ngram ASC LIMIT {topk}
"""


# ---------------------------------------------------------------------------
# JSONL ingestion (the jsonlines corpus front door)
# ---------------------------------------------------------------------------


def synth_jsonl_corpus(docs: DataFrame) -> DataFrame:
    """Deterministic JSONL fixture: one JSON object per doc, built with
    the same concatenation in Spark and DuckDB (escape-safe fields only
    — ids, lang codes, md5 hex — so the byte strings agree exactly).
    -> (doc_id, line)."""
    line = F.concat(
        F.lit('{"id": '), F.col("doc_id").cast("string"),
        F.lit(', "lang": "'), F.col("lang"),
        F.lit('", "h": "'), F.md5(F.col("text")),
        F.lit('", "n": '), F.col("n_chars").cast("string"), F.lit("}"))
    return docs.select("doc_id", line.alias("line"))


def jsonl_ingest(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """Parse a JSONL corpus into typed columns with ``from_json`` —
    the scale path for jsonlines shards: a pure JVM projection (Jackson
    inside codegen), no shuffle, malformed lines surface as NULL structs
    (counted by the caller, never silently dropped rows).
    -> (doc_id, id, lang, h, n, ok)."""
    schema = "id BIGINT, lang STRING, h STRING, n BIGINT"
    j = F.from_json(F.col(line_col), schema)
    return (lines
            .withColumn("_j", j)
            .select("doc_id",
                    F.col("_j.id").alias("id"),
                    F.col("_j.lang").alias("lang"),
                    F.col("_j.h").alias("h"),
                    F.col("_j.n").alias("n"),
                    F.when(F.col("_j").isNotNull()
                           & F.col("_j.id").isNotNull(), 1)
                    .otherwise(0).cast("bigint").alias("ok")))


def oracle_jsonl_ingest() -> str:
    line = ("'{\"id\": ' || CAST(doc_id AS VARCHAR) || "
            "', \"lang\": \"' || lang || "
            "'\", \"h\": \"' || md5(text) || "
            "'\", \"n\": ' || CAST(n_chars AS VARCHAR) || '}'")
    return f"""
WITH j AS (SELECT doc_id, {line} AS line FROM documents)
SELECT doc_id,
       CAST(json_extract(line, '$.id') AS BIGINT) AS id,
       json_extract_string(line, '$.lang') AS lang,
       json_extract_string(line, '$.h') AS h,
       CAST(json_extract(line, '$.n') AS BIGINT) AS n,
       CAST(CASE WHEN json_valid(line) THEN 1 ELSE 0 END AS BIGINT)
         AS ok
FROM j ORDER BY doc_id
"""


HIST_QS = (25, 50, 90, 99)


def hist_quantiles(docs: DataFrame, col: str = "n_chars",
                   width: int = 64, qs: tuple = HIST_QS) -> DataFrame:
    """MERGEABLE histogram-sketch quantiles — the scale path next to
    the exact ``length_quantiles`` gate (percentile_disc needs a
    per-stratum sort of every value; at 100 TB the mergeable form is
    what actually runs): equi-width integer buckets whose counts are
    additive (map-side partial, mergeable across shards / streaming
    micro-batches), quantile q answered as the upper bound of the
    smallest bucket whose cumulative count reaches ceil(q·n/100) —
    deterministic integers, error bounded by the bucket width.

    Plan: one pass to the per-(lang, bucket) count table (cardinality
    ≤ value-range/width per stratum — bounded state), then a tiny
    cumulative window over buckets, then ONE aggregate with the
    quantile list exploded against the (tiny) cum table — the raw data
    is touched exactly once, structurally, not via exchange-reuse luck
    (ADVICE r6: the previous 4-branch union re-derived the aggregate
    per quantile and its "one pass" held only if ReusedExchange
    deduplicated the identical subplans).

    -> (lang, q, ub, n)."""
    from pyspark.sql.window import Window
    h = (docs.select("lang", F.expr(f"{col} div {width}").alias("b"))
         .groupBy("lang", "b")
         .agg(F.count("*").cast("bigint").alias("c")))
    wl = Window.partitionBy("lang")
    cum = (h.withColumn("cum", F.sum("c").over(
        wl.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("n", F.sum("c").over(wl)))
    qarr = F.array(*[F.lit(int(q)) for q in qs])
    # integer ceil(n*q/100): (n*q + 99) div 100
    return (cum.select("lang", "b", "cum", "n",
                       F.explode(qarr).alias("q"))
            .where(F.col("cum") >= F.expr("(n * q + 99) div 100"))
            .groupBy("lang", "q", "n")
            .agg(F.min("b").alias("b"))
            .select("lang", F.col("q").cast("bigint").alias("q"),
                    ((F.col("b") + 1) * width - 1).cast("bigint")
                    .alias("ub"), F.col("n").cast("bigint").alias("n")))


def oracle_hist_quantiles(col: str = "n_chars", width: int = 64,
                          qs: tuple = HIST_QS) -> str:
    sels = []
    for q in qs:
        sels.append(f"""
SELECT lang, CAST({int(q)} AS BIGINT) AS q,
       CAST((MIN(b) + 1) * {width} - 1 AS BIGINT) AS ub,
       CAST(n AS BIGINT) AS n
FROM (
  SELECT lang, b, SUM(c) OVER (PARTITION BY lang ORDER BY b
           ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(c) OVER (PARTITION BY lang) AS n
  FROM (SELECT lang, {col} // {width} AS b,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM documents GROUP BY 1, 2))
WHERE cum >= (n * {int(q)} + 99) // 100
GROUP BY lang, n""")
    return " UNION ALL ".join(sels) + " ORDER BY lang, q"


GK_QS = (0.25, 0.5, 0.9, 0.99)


def gk_quantiles(docs: DataFrame, col: str = "n_chars",
                 qs: tuple = GK_QS, accuracy: int = 1_000_000
                 ) -> DataFrame:
    """Greenwald-Khanna quantile SKETCH per stratum — the third member
    of the quantile ladder (exact sort: ``length_quantiles``; additive
    histogram: ``hist_quantiles``; rank sketch: here). Spark's
    ``percentile_approx`` aggregate IS a mergeable GK summary: each
    task folds its partition into a bounded-size summary, summaries
    merge map-side (ObjectHashAggregate partial_merge), and ONE
    sketch per stratum crosses the shuffle — never the values. At the
    gate's accuracy the summary stays lossless (compression never
    exceeds the error budget 1/accuracy), so the answer is EXACTLY the
    discrete rank statistic ceil(q·n) — empirically and by both
    engines' definitions identical to DuckDB's ``quantile_disc``
    (verified including the q·n-integer boundary, where the naive
    "index ceil(q·(n-1))" rule differs; pinned in pytest). At 100 TB
    you lower ``accuracy`` and the identical plan runs with
    O(accuracy·log(εn)) state per stratum instead of a sort.

    -> (lang, n, q25, q50, q90, q99) — q values in per-mille column
    names to stay identifier-safe; integer domain so the compare is
    bit-stable."""
    aggs = [F.count("*").cast("bigint").alias("n")]
    for q in qs:
        aggs.append(F.percentile_approx(col, q, accuracy)
                    .cast("bigint").alias(f"q{int(q * 100)}"))
    return docs.groupBy("lang").agg(*aggs).orderBy("lang")


def oracle_gk_quantiles(col: str = "n_chars", qs: tuple = GK_QS) -> str:
    sels = ",\n       ".join(
        f"CAST(quantile_disc({col}, {q}) AS BIGINT) AS q{int(q * 100)}"
        for q in qs)
    return f"""
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
       {sels}
FROM documents GROUP BY lang ORDER BY lang
"""


CONT_QS = (25, 50, 90)


def cont_quantiles(docs: DataFrame, col: str = "n_chars",
                   qs: tuple = CONT_QS) -> DataFrame:
    """INTERPOLATING (percentile_cont) quantiles per stratum — the
    fourth member of the quantile ladder (exact discrete / additive
    histogram / GK sketch / interpolating), kept float-free: at rank
    position pos = (n-1)·q/100 the continuous quantile is
    lo + frac·(hi − lo) with lo/hi the bracketing ORDER STATISTICS and
    frac = ((n-1)·q mod 100)/100 — so the gate emits (lo, hi,
    frac_num) as exact integers and the float interpolation is the
    caller's one multiply (pytest pins agreement with Spark's native
    percentile() to 1e-9). Plan: ONE window rank per stratum feeding
    both brackets — no sort per quantile.
    -> (lang, q, lo, hi, frac_num, n)."""
    from pyspark.sql.window import Window
    w = Window.partitionBy("lang").orderBy("v", "doc_id")
    ranked = (docs.select("lang", "doc_id", F.col(col).alias("v"))
              .withColumn("r", F.row_number().over(w) - 1)
              .withColumn("n", F.count("*").over(
                  Window.partitionBy("lang"))))
    qarr = F.explode(F.array(*[F.lit(int(q)) for q in qs])).alias("q")
    pos = F.expr("(n - 1) * q div 100")
    frac = F.expr("(n - 1) * q % 100")
    cand = (ranked.select("lang", "v", "r", "n", qarr)
            .withColumn("_pos", pos).withColumn("_frac", frac)
            .where((F.col("r") == F.col("_pos"))
                   | ((F.col("r") == F.col("_pos") + 1)
                      & (F.col("_frac") > 0))))
    return (cand.groupBy("lang", "q", "n", "_pos", "_frac")
            .agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
            .select("lang", F.col("q").cast("bigint"),
                    F.col("lo").cast("bigint"),
                    # frac == 0 -> single order statistic, hi := lo
                    F.when(F.col("_frac") > 0, F.col("hi"))
                    .otherwise(F.col("lo")).cast("bigint").alias("hi"),
                    F.col("_frac").cast("bigint").alias("frac_num"),
                    F.col("n").cast("bigint").alias("n"))
            .orderBy("lang", "q"))


def oracle_cont_quantiles(col: str = "n_chars",
                          qs: tuple = CONT_QS) -> str:
    qvals = ",".join(f"({int(q)})" for q in qs)
    return f"""
WITH ranked AS (
  SELECT lang, {col} AS v,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY {col}, doc_id) - 1 AS r,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM documents),
qv(q) AS (VALUES {qvals}),
cand AS (
  SELECT lang, v, r, n, q,
         (n - 1) * q // 100 AS pos, (n - 1) * q % 100 AS frac
  FROM ranked CROSS JOIN qv
  WHERE r = (n - 1) * q // 100
     OR (r = (n - 1) * q // 100 + 1 AND (n - 1) * q % 100 > 0))
SELECT lang, CAST(q AS BIGINT) AS q,
       CAST(MIN(v) AS BIGINT) AS lo,
       CAST(CASE WHEN frac > 0 THEN MAX(v) ELSE MIN(v) END AS BIGINT)
         AS hi,
       CAST(frac AS BIGINT) AS frac_num,
       CAST(n AS BIGINT) AS n
FROM cand GROUP BY lang, q, n, pos, frac
ORDER BY lang, q
"""
