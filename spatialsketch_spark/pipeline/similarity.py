"""Similarity search over embedding columns (array<float>).

Cross-engine determinism trick: components are quantized to integers
(round(v * 10^6)) so dot products and squared norms are *exact int64*
in both Spark and DuckDB; the final cosine ordering divides exact
integers in IEEE double (identical in both engines). Output columns are
integers only.

- ``cosine_topk``: brute-force exact top-k (the baseline / verifier).
  Broadcast the query side; candidate generation is a broadcast
  nested-loop join; ranking is one window per qid (parallel across
  qids, no global sort).
- ``lsh_topk``: the scale path — random-hyperplane (SimHash) bucketing
  with integer hyperplanes derived from md5, so buckets are
  deterministic; exact re-ranking within multi-probe buckets. Recall vs
  brute force asserted in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .dedup import word_hash_col

QUANT = 1_000_000
N_TABLES = 4          # independent hyperplane tables (band OR-construction)
PLANES_PER_TABLE = 4  # bits per bucket key (AND-construction)


def quantize(col):
    return F.transform(col, lambda v: F.round(v * QUANT, 0).cast("bigint"))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0).cast("bigint"), lambda acc, v: acc + v)


def _norm2(a):
    return _dot(a, a)


def with_quantized(emb: DataFrame) -> DataFrame:
    return emb.select("vec_id", quantize(F.col("embedding")).alias("qv")) \
              .withColumn("n2", _norm2(F.col("qv")))


def cosine_topk(emb: DataFrame, query_ids: list[int], k: int = 5
                ) -> DataFrame:
    """Exact cosine top-k (self excluded). -> (qid, rank, vec_id)."""
    q = with_quantized(emb).where(F.col("vec_id").isin(query_ids)) \
        .select(F.col("vec_id").alias("qid"), F.col("qv").alias("qqv"),
                F.col("n2").alias("qn2"))
    c = with_quantized(emb)
    d = (c.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
         .withColumn("dot", _dot(F.col("qv"), F.col("qqv")))
         .withColumn("cos", F.col("dot") /
                     F.sqrt(F.col("n2").cast("double")
                            * F.col("qn2").cast("double"))))
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (d.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(F.col("qid").cast("bigint"),
                    F.col("rank").cast("bigint"),
                    F.col("vec_id").cast("bigint")))


def _plane_sign(dim: int, plane: int):
    """Deterministic ±1 from md5 of 'plane:dim' (shared with tests)."""
    return F.when(
        word_hash_col(F.concat_ws(":", F.lit(plane), F.lit(dim)))
        .bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(F.lit(-1))


def simhash_buckets(emb: DataFrame, n_tables: int = N_TABLES,
                    planes_per_table: int = PLANES_PER_TABLE) -> DataFrame:
    """Random-hyperplane bucketing, one bucket id per table: bit p of
    table t = sign of the dot product with an integer ±1 hyperplane.
    Multiple independent tables (OR-construction) keep recall usable on
    weakly-correlated data. -> (vec_id, qv, n2, buckets: array)."""
    qdf = with_quantized(emb)
    dim = len(emb.select("embedding").head()["embedding"])
    buckets = []
    for t in range(n_tables):
        bucket = F.lit(0).cast("bigint")
        for p in range(planes_per_table):
            plane = t * planes_per_table + p
            proj = None
            for d in range(dim):
                term = _plane_sign(d, plane) * F.element_at("qv", d + 1)
                proj = term if proj is None else proj + term
            bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(0)
        buckets.append(bucket)
    return qdf.withColumn("buckets", F.array(*buckets))


def lsh_topk(emb: DataFrame, query_ids: list[int], k: int = 5,
             n_tables: int = N_TABLES,
             planes_per_table: int = PLANES_PER_TABLE,
             probe_bits: int = 1) -> DataFrame:
    """Approximate top-k: candidates share the query's bucket in ANY
    table, exactly or within hamming distance probe_bits (multi-probe);
    exact cosine re-rank on candidates. -> (qid, rank, vec_id)."""
    b = simhash_buckets(emb, n_tables, planes_per_table)
    bt = b.select("vec_id", "qv", "n2",
                  F.posexplode("buckets").alias("table", "bucket"))
    q = bt.where(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("qid"), F.col("qv").alias("qqv"),
        F.col("n2").alias("qn2"), F.col("table").alias("qtable"),
        F.col("bucket").alias("qbucket"))
    probes = [F.col("qbucket")]
    if probe_bits >= 1:
        probes += [F.col("qbucket").bitwiseXOR(F.lit(1 << p))
                   for p in range(planes_per_table)]
    q = q.withColumn("probe", F.explode(F.array(*probes)))
    cand = bt.join(F.broadcast(q),
                   (F.col("table") == F.col("qtable"))
                   & (F.col("bucket") == F.col("probe"))
                   & (F.col("vec_id") != F.col("qid"))).dropDuplicates(
        ["qid", "vec_id"])
    d = (cand.withColumn("dot", _dot(F.col("qv"), F.col("qqv")))
         .withColumn("cos", F.col("dot") /
                     F.sqrt(F.col("n2").cast("double")
                            * F.col("qn2").cast("double"))))
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (d.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(F.col("qid").cast("bigint"),
                    F.col("rank").cast("bigint"),
                    F.col("vec_id").cast("bigint")))


def cosine_dup_pairs(emb: DataFrame, threshold: float = 0.3) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (a < b) with
    cos(a, b) >= threshold. Exact integer dot products; the double
    division/threshold compare is bit-identical cross-engine.
    -> (vec_a, vec_b)."""
    q = with_quantized(emb)
    a = q.select(F.col("vec_id").alias("vec_a"), F.col("qv").alias("qa"),
                 F.col("n2").alias("na2"))
    b = q.select(F.col("vec_id").alias("vec_b"), F.col("qv").alias("qb"),
                 F.col("n2").alias("nb2"))
    d = (a.join(b, F.col("vec_a") < F.col("vec_b"))
         .withColumn("cos", _dot(F.col("qa"), F.col("qb")) /
                     F.sqrt(F.col("na2").cast("double")
                            * F.col("nb2").cast("double"))))
    return (d.where(F.col("cos") >= threshold)
            .select(F.col("vec_a").cast("bigint"),
                    F.col("vec_b").cast("bigint")))


# ---------------------------------------------------------------------------
# DuckDB oracle (brute-force cosine only; LSH is rows-only checked)
# ---------------------------------------------------------------------------


def oracle_cosine_dup_pairs(threshold: float = 0.3) -> str:
    return f"""
WITH qe AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS idx,
         CAST(ROUND(unnest(embedding) * {QUANT}) AS BIGINT) AS q
  FROM embeddings
),
norms AS (SELECT vec_id, SUM(q * q) AS n2 FROM qe GROUP BY vec_id),
dots AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, SUM(a.q * b.q) AS dot
  FROM qe a JOIN qe b ON a.idx = b.idx AND a.vec_id < b.vec_id
  GROUP BY 1, 2
)
SELECT CAST(d.vec_a AS BIGINT) AS vec_a, CAST(d.vec_b AS BIGINT) AS vec_b
FROM dots d JOIN norms na ON na.vec_id = d.vec_a
            JOIN norms nb ON nb.vec_id = d.vec_b
WHERE d.dot / SQRT(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE))
      >= {threshold}
ORDER BY vec_a, vec_b
"""

def oracle_cosine_topk(query_ids: list[int], k: int = 5) -> str:
    ids = ",".join(str(i) for i in query_ids)
    return f"""
WITH qe AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS idx,
         CAST(ROUND(unnest(embedding) * {QUANT}) AS BIGINT) AS q
  FROM embeddings
),
norms AS (SELECT vec_id, SUM(q * q) AS n2 FROM qe GROUP BY vec_id),
dots AS (
  SELECT a.vec_id AS qid, b.vec_id AS vec_id, SUM(a.q * b.q) AS dot
  FROM qe a JOIN qe b ON a.idx = b.idx AND a.vec_id IN ({ids})
            AND b.vec_id <> a.vec_id
  GROUP BY 1, 2
),
scored AS (
  SELECT d.qid, d.vec_id,
         d.dot / SQRT(CAST(nq.n2 AS DOUBLE) * CAST(nc.n2 AS DOUBLE)) AS cos
  FROM dots d JOIN norms nq ON nq.vec_id = d.qid
              JOIN norms nc ON nc.vec_id = d.vec_id
),
ranked AS (
  SELECT qid, vec_id,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC)
           AS rank
  FROM scored
)
SELECT CAST(qid AS BIGINT) AS qid, CAST(rank AS BIGINT) AS rank,
       CAST(vec_id AS BIGINT) AS vec_id
FROM ranked WHERE rank <= {k} ORDER BY qid, rank
"""
