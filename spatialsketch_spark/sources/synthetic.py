"""Deterministic synthetic stream generators — the PySpark rebuild of the
reference's dataset notebooks (repository/datasets/Synthetic.ipynb:
uniform and Zipf(alpha=1.3) streams over items and coordinates;
RealWorld.ipynb: lon/lat -> [0, N-1] grid quantization).

Everything derives from ``spark.range`` + splittable counter-based
hashing (no numpy on executors, no RNG state): the same (seed, i) always
produces the same tuple at any parallelism — the determinism the N-vs-4N
comparison and golden fixtures rely on.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, functions as F

M64 = (1 << 64) - 1


def _h(col, seed: int):
    """Splittable 64-bit mix (xxhash64 of the counter + seed)."""
    return F.xxhash64(col, F.lit(seed))


def _u01(col, seed: int):
    """Deterministic uniform double in [0, 1) from a counter column."""
    return (F.abs(_h(col, seed)) % F.lit(1 << 52)) / F.lit(float(1 << 52))


def uniform_stream(spark: SparkSession, n_rows: int, n: int = 4096,
                   item_domain: int = 400_000, seed: int = 42,
                   parallelism: int | None = None) -> DataFrame:
    """Uniform items and coordinates (Synthetic.ipynb uniform cells)."""
    if parallelism is None:
        parallelism = int(spark.conf.get("spark.sql.shuffle.partitions"))
    r = spark.range(0, n_rows, 1, parallelism)
    return r.select(
        (F.col("id") + 1).alias("ts"),
        (F.abs(_h(F.col("id"), seed)) % item_domain).alias("item"),
        (F.abs(_h(F.col("id"), seed + 1)) % n).alias("x"),
        (F.abs(_h(F.col("id"), seed + 2)) % n).alias("y"),
        F.lit(1).cast("bigint").alias("value"),
    )


def zipf_column(counter, domain: int, alpha: float, seed: int):
    """Zipf(alpha) over [0, domain) via inverse-CDF on a deterministic
    uniform: rank ~ u^(-1/(alpha-1)) (standard power-law inversion for
    alpha > 1; the reference uses numpy.random.zipf(1.3),
    Synthetic.ipynb cells 4-9 — same distribution family, different
    sampler, statistically equivalent)."""
    u = _u01(counter, seed)
    # avoid u == 0; rank >= 1
    rank = F.pow(1.0 - u, F.lit(-1.0 / (alpha - 1.0)))
    return (rank.cast("bigint") - 1) % domain


def zipf_stream(spark: SparkSession, n_rows: int, n: int = 4096,
                item_domain: int = 400_000, alpha: float = 1.3,
                seed: int = 42, zipf_axes: str = "item",
                parallelism: int | None = None) -> DataFrame:
    """Zipf item ids and/or coordinates (Tech Report §5.5 / Table 4
    distribution grid: uniform/zipf x (items, coords))."""
    if parallelism is None:
        parallelism = int(spark.conf.get("spark.sql.shuffle.partitions"))
    r = spark.range(0, n_rows, 1, parallelism)
    item = (zipf_column(F.col("id"), item_domain, alpha, seed)
            if "item" in zipf_axes
            else F.abs(_h(F.col("id"), seed)) % item_domain)
    if "coord" in zipf_axes:
        x = zipf_column(F.col("id"), n, alpha, seed + 1)
        y = zipf_column(F.col("id"), n, alpha, seed + 2)
    else:
        x = F.abs(_h(F.col("id"), seed + 1)) % n
        y = F.abs(_h(F.col("id"), seed + 2)) % n
    return r.select((F.col("id") + 1).alias("ts"), item.alias("item"),
                    x.alias("x"), y.alias("y"),
                    F.lit(1).cast("bigint").alias("value"))


def quantize_lonlat(df: DataFrame, lon_col: str = "longitude",
                    lat_col: str = "latitude", n: int = 4096) -> DataFrame:
    """Real-world prep: continuous lon/lat -> [0, N-1] grid ints
    (RealWorld.ipynb: ((lon+180)/360)*(N-1))."""
    return (df.withColumn("x", (((F.col(lon_col) + 180.0) / 360.0)
                                * (n - 1)).cast("bigint"))
            .withColumn("y", (((F.col(lat_col) + 90.0) / 180.0)
                              * (n - 1)).cast("bigint")))
