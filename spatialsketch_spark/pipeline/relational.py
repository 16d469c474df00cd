"""Relational operator coverage (SURVEY.md §2.G — categories absent in
the reference engine, added here as first-class Spark operators):
aggregation, multi-way broadcast join, analytic window, rollup.

Money/quantity doubles are converted to integer cents *before*
aggregation (ROUND(x*100) is one IEEE op, identical in Spark and
DuckDB; int64 sums are exact) so oracle comparison is bit-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def cents(col):
    return F.round(col * 100, 0).cast("bigint")


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary with integer-cent aggregates."""
    li = _read(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag", "l_linestatus")
            .agg(F.count("*").alias("n_rows"),
                 F.sum(cents(F.col("l_quantity"))).alias("sum_qty_c"),
                 F.sum(cents(F.col("l_extendedprice"))).alias("sum_price_c"))
            .orderBy("l_returnflag", "l_linestatus"))


def oracle_pricing_summary() -> str:
    return """
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT)
         AS sum_qty_c,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS sum_price_c
FROM lineitem GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def orders_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ customer ⋈ nation with dimension broadcast."""
    o = _read(spark, sf_dir, "orders")
    c = _read(spark, sf_dir, "customer")
    n = _read(spark, sf_dir, "nation")
    return (o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .groupBy("n_name")
            .agg(F.count("*").alias("n_orders"),
                 F.sum(cents(F.col("o_totalprice"))).alias("rev_c"))
            .orderBy("n_name"))


def oracle_orders_by_nation() -> str:
    return """
SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_c
FROM orders JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
"""


def top_orders_per_customer(spark: SparkSession, sf_dir: str,
                            k: int = 2) -> DataFrame:
    o = _read(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc(cents(F.col("o_totalprice"))), F.asc("o_orderkey"))
    return (o.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(F.col("o_custkey").cast("bigint").alias("custkey"),
                    F.col("rank").cast("bigint").alias("rank"),
                    F.col("o_orderkey").cast("bigint").alias("orderkey"))
            .orderBy("custkey", "rank"))


def oracle_top_orders_per_customer(k: int = 2) -> str:
    return f"""
WITH r AS (
  SELECT o_custkey, o_orderkey,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
             ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT) DESC,
                      o_orderkey ASC) AS rank
  FROM orders
)
SELECT CAST(o_custkey AS BIGINT) AS custkey, CAST(rank AS BIGINT) AS rank,
       CAST(o_orderkey AS BIGINT) AS orderkey
FROM r WHERE rank <= {k} ORDER BY custkey, rank
"""


def lineitem_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup — the relational mirror of the dyadic grid
    pyramid (SURVEY.md §2.G: the pyramid IS a 2-D rollup)."""
    li = _read(spark, sf_dir, "lineitem")
    return (li.rollup("l_returnflag", "l_linestatus")
            .agg(F.count("*").alias("n_rows"))
            .select(F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
                    F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
                    F.col("n_rows").cast("bigint"))
            .orderBy("rf", "ls"))


def oracle_lineitem_rollup() -> str:
    return """
SELECT COALESCE(l_returnflag, 'ALL') AS rf,
       COALESCE(l_linestatus, 'ALL') AS ls,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY rf, ls
"""
