"""Deterministic sampling operators for training-data curation.

A 100 TB corpus is rarely consumed whole: pipelines draw per-language /
per-source quotas (stratified) or fixed-rate subsets (Bernoulli). Both
operators here are DETERMINISTIC BY CONTENT KEY, not by partition
order: the sample is a pure function of (id, seed), so it is stable
across cluster sizes, retries, and AQE re-plans — the property
`df.sample()` (partition-order-dependent RNG) cannot give — and it is
exactly reproducible in ANSI SQL, so both operators carry full
bit-compare DuckDB oracles in the driver gate.

The ordering key is the cross-engine-stable md5 trick the oracle gates
standardize on: Spark ``conv(substring(md5(s), 1, 15), 16, 10)`` ==
DuckDB ``('0x' || substr(md5(s), 1, 15))::BIGINT`` — 60 uniform bits.

Scale posture: stratified_sample is ONE shuffle (the per-stratum
window); hash_sample is a pure map-side filter (no shuffle at all).
Skewed strata cost a per-stratum external sort — acceptable for
quota-style n; for top-heavy quotas prefer hash_sample with a
per-stratum threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

HASH_BITS = 60                       # 15 hex digits


def _rank_key(id_col: str, seed: int):
    """Seeded 60-bit uniform key from the row id — identical text
    semantics in Spark and DuckDB (see module docstring)."""
    s = F.concat_ws("|", F.col(id_col).cast("string"), F.lit(str(seed)))
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint")


def stratified_sample(df: DataFrame, strata_cols: list[str], n: int,
                      seed: int = 17, id_col: str = "doc_id") -> DataFrame:
    """Up to ``n`` rows per stratum, chosen by seeded hash rank (ties
    broken by id). Deterministic: the same (df, seed) always yields the
    same sample, independent of partitioning."""
    w = Window.partitionBy(*[F.col(c) for c in strata_cols]) \
              .orderBy(_rank_key(id_col, seed).asc(), F.col(id_col).asc())
    return (df.withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") <= n).drop("__rk"))


def hash_sample(df: DataFrame, fraction: float, seed: int = 17,
                id_col: str = "doc_id") -> DataFrame:
    """Deterministic Bernoulli-by-hash sample: keep rows whose seeded
    60-bit key falls below fraction·2^60. No shuffle; the expected rate
    is ``fraction`` with the exact membership a pure function of
    (id, seed) — re-running, repartitioning, or scaling the cluster
    reproduces the identical subset."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    threshold = int(fraction * (1 << HASH_BITS))
    return df.where(_rank_key(id_col, seed) < F.lit(threshold))


def budget_sample(df: DataFrame, strata_cols: list[str], budget: int,
                  weight_col: str, seed: int = 17,
                  id_col: str = "doc_id") -> DataFrame:
    """Per-stratum WEIGHT budget instead of a row quota: walk the
    stratum in seeded-hash order and keep rows while the running sum of
    ``weight_col`` (tokens, chars, bytes) stays ≤ ``budget``. The
    common curation shape "N tokens per language": deterministic,
    one shuffle, integer arithmetic end to end. A row that would
    overshoot the budget is excluded (its successors too — prefix
    semantics, so the kept set is still a pure function of (df, seed))."""
    w = Window.partitionBy(*[F.col(c) for c in strata_cols]) \
              .orderBy(_rank_key(id_col, seed).asc(), F.col(id_col).asc()) \
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (df.withColumn("__cum", F.sum(F.col(weight_col)).over(w))
            .where(F.col("__cum") <= budget).drop("__cum"))


def _key_sql(id_expr: str, seed: int) -> str:
    return (f"(('0x' || substr(md5(CAST({id_expr} AS VARCHAR) || '|' "
            f"|| '{seed}'), 1, 15))::BIGINT)")


def oracle_stratified_sample(strata_cols: list[str], n: int,
                             seed: int = 17) -> str:
    strata = ", ".join(strata_cols)
    return f"""
WITH ranked AS (
  SELECT doc_id, {strata},
         ROW_NUMBER() OVER (PARTITION BY {strata}
                            ORDER BY {_key_sql('doc_id', seed)}, doc_id)
           AS rk
  FROM documents)
SELECT CAST(doc_id AS BIGINT) AS doc_id, {strata}
FROM ranked WHERE rk <= {n}
ORDER BY doc_id
"""


def oracle_budget_sample(strata_cols: list[str], budget: int,
                         weight_col: str, seed: int = 17) -> str:
    strata = ", ".join(strata_cols)
    return f"""
WITH walked AS (
  SELECT doc_id, {strata}, {weight_col},
         SUM({weight_col}) OVER (PARTITION BY {strata}
             ORDER BY {_key_sql('doc_id', seed)}, doc_id
             ROWS UNBOUNDED PRECEDING) AS cum
  FROM documents)
SELECT CAST(doc_id AS BIGINT) AS doc_id, {strata},
       CAST({weight_col} AS BIGINT) AS {weight_col}
FROM walked WHERE cum <= {budget}
ORDER BY doc_id
"""


def oracle_hash_sample(fraction: float, seed: int = 17) -> str:
    threshold = int(fraction * (1 << HASH_BITS))
    return f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id
FROM documents
WHERE {_key_sql('doc_id', seed)} < {threshold}
ORDER BY doc_id
"""


def assign_splits(df: DataFrame, fractions: dict, seed: int = 17,
                  id_col: str = "doc_id") -> DataFrame:
    """Deterministic train/val/test assignment: the seeded 60-bit key
    is mapped onto cumulative fraction brackets, so every row gets
    exactly one split label as a pure function of (id, seed) — stable
    across cluster sizes, retries and re-runs, and disjoint by
    construction (the property separate `df.sample()` calls cannot
    give). Fractions must sum to ≤ 1; any remainder maps to the LAST
    split (so {'train': .9, 'val': .05, 'test': .05} is exact).

    Map-side only — zero shuffles; the standard corpus-splitting shape.
    """
    total = sum(fractions.values())
    if not 0.0 < total <= 1.0 + 1e-9:
        raise ValueError("fractions must sum to (0, 1]")
    key = _rank_key(id_col, seed)
    expr = None
    acc = 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        cut = int(acc * (1 << HASH_BITS))
        cond = key < F.lit(cut)
        expr = F.when(cond, F.lit(name)) if expr is None \
            else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def oracle_assign_splits(fractions: dict, seed: int = 17,
                         id_sql: str = "doc_id",
                         src: str = "documents") -> str:
    key = _key_sql(id_sql, seed)
    names = list(fractions)
    acc = 0.0
    whens = []
    for name in names[:-1]:
        acc += fractions[name]
        cut = int(acc * (1 << HASH_BITS))
        whens.append(f"WHEN {key} < {cut} THEN '{name}'")
    case = ("CASE " + " ".join(whens) + f" ELSE '{names[-1]}' END"
            if whens else f"'{names[-1]}'")
    return f"""
SELECT *, {case} AS split FROM {src} ORDER BY {id_sql}
"""


# ---------------------------------------------------------------------------
# Mixture sampling: per-domain epoch weights with replication (r5)
# ---------------------------------------------------------------------------

MIX_WEIGHTS_MILLI = {"en": 2500, "de": 1000, "fr": 1250,
                     "es": 500, "zh": 750}
MIX_SEED = 29


def mixture_sample(df: DataFrame, weights_milli: dict = None,
                   key_col: str = "lang", seed: int = MIX_SEED,
                   id_col: str = "doc_id") -> DataFrame:
    """Training-mixture construction: each domain (``key_col`` value)
    is consumed for a target number of EPOCHS, possibly fractional —
    the data-mixing step every pre-training run performs (e.g. web at
    0.5 epochs, wiki at 2.5). Weights are integer milli-epochs so the
    arithmetic is float-free: a row gets ``w // 1000`` full copies
    plus one extra copy iff ``hash60(id|seed) % 1000 < w % 1000`` —
    deterministic by content key, so the mixture is identical across
    cluster sizes, retries, and AQE re-plans.

    Map-side only (a when-chain lookup + explode(sequence)); zero
    shuffles — at 100 TB the replication factor is the only cost, and
    it is exactly the requested epoch mass. Unknown keys get weight 0
    (dropped). -> (doc_id, key, n_copies, epoch), epoch in
    [0, n_copies)."""
    weights = MIX_WEIGHTS_MILLI if weights_milli is None else weights_milli
    w = None
    for k, v in weights.items():
        cond = F.col(key_col) == k
        w = F.when(cond, v) if w is None else w.when(cond, v)
    w = w.otherwise(0).cast("bigint")
    key = _rank_key(id_col, seed)
    n = (F.expr(f"{'_w'} div 1000")
         + F.when(key % 1000 < F.col("_w") % 1000, 1).otherwise(0))
    return (df.withColumn("_w", w)
            .withColumn("n_copies", n.cast("bigint"))
            .where(F.col("n_copies") >= 1)
            .select(F.col(id_col).cast("bigint").alias(id_col),
                    F.col(key_col).alias("key"), "n_copies",
                    F.explode(F.sequence(
                        F.lit(0).cast("bigint"),
                        F.col("n_copies") - 1)).alias("epoch")))


def oracle_mixture_sample(weights_milli: dict = None,
                          key_col: str = "lang", seed: int = MIX_SEED,
                          id_sql: str = "doc_id",
                          src: str = "documents") -> str:
    weights = MIX_WEIGHTS_MILLI if weights_milli is None else weights_milli
    whens = " ".join(f"WHEN {key_col} = '{k}' THEN {v}"
                     for k, v in weights.items())
    w = f"(CASE {whens} ELSE 0 END)"
    key = _key_sql(id_sql, seed)
    n = f"({w} // 1000 + CASE WHEN {key} % 1000 < {w} % 1000 THEN 1 ELSE 0 END)"
    return f"""
WITH c AS (
  SELECT {id_sql} AS doc_id, {key_col} AS key,
         CAST({n} AS BIGINT) AS n_copies
  FROM {src}
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, key, n_copies,
       CAST(unnest(generate_series(0, n_copies - 1)) AS BIGINT) AS epoch
FROM c WHERE n_copies >= 1
ORDER BY doc_id, epoch
"""


# ---------------------------------------------------------------------------
# Deterministic global shuffle (training-order assignment) (r5)
# ---------------------------------------------------------------------------

SHUFFLE_SEED = 31
_BUCKET_SHIFT = HASH_BITS - 8        # 256 range buckets on the top bits


def global_shuffle(df: DataFrame, seed: int = SHUFFLE_SEED,
                   id_col: str = "doc_id") -> DataFrame:
    """Assign every row a dense global position 0..N-1 in seeded-hash
    order — the pre-training "shuffle the corpus once, then stream it"
    step. Deterministic by (id, seed): the permutation is identical
    across cluster sizes, retries, and AQE re-plans, and a different
    seed gives an independent epoch order.

    A naive global ``row_number()`` collapses to ONE task; instead the
    60-bit key's top 8 bits range-bucket the data (uniform by md5), a
    256-row bucket-count aggregate (map-side combined) turns into
    cumulative offsets on the driver-scale side and broadcasts back,
    and each bucket ranks internally in parallel:
    ``pos = bucket_offset + rank_within_bucket``. Two shuffles total
    (tiny agg + per-bucket window), no single-task stage — the standard
    distributed dense-rank construction. -> (pos, doc_id).
    """
    key = _rank_key(id_col, seed)
    bucket = F.shiftright(key, _BUCKET_SHIFT)
    counts = (df.select(bucket.alias("_b"))
              .groupBy("_b").agg(F.count("*").alias("_n")))
    # 256-row frame: the unpartitioned window is driver-scale here
    w_off = Window.orderBy("_b").rowsBetween(
        Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_b", F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off"))
    w_rank = Window.partitionBy("_b").orderBy(
        key.asc(), F.col(id_col).asc())
    return (df.withColumn("_b", bucket)
            .join(F.broadcast(offsets), "_b")
            .withColumn("pos",
                        (F.col("_off") + F.row_number().over(w_rank) - 1)
                        .cast("bigint"))
            .select("pos", F.col(id_col).cast("bigint").alias(id_col)))


def oracle_global_shuffle(seed: int = SHUFFLE_SEED,
                          id_sql: str = "doc_id",
                          src: str = "documents") -> str:
    key = _key_sql(id_sql, seed)
    return f"""
SELECT CAST(ROW_NUMBER() OVER (ORDER BY {key}, {id_sql}) - 1 AS BIGINT)
         AS pos,
       CAST({id_sql} AS BIGINT) AS doc_id
FROM {src} ORDER BY pos
"""
