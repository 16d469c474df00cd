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


def customers_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-membership joins: customers WITH orders (left_semi) and
    WITHOUT (left_anti), rolled up per market segment."""
    c = _read(spark, sf_dir, "customer")
    o = _read(spark, sf_dir, "orders").select("o_custkey")
    semi = (c.join(o, c.c_custkey == o.o_custkey, "left_semi")
            .groupBy("c_mktsegment")
            .agg(F.count("*").alias("with_orders")))
    anti = (c.join(o, c.c_custkey == o.o_custkey, "left_anti")
            .groupBy("c_mktsegment")
            .agg(F.count("*").alias("without_orders")))
    return (semi.join(anti, "c_mktsegment", "full")
            .select("c_mktsegment",
                    F.coalesce("with_orders", F.lit(0)).cast("bigint")
                    .alias("with_orders"),
                    F.coalesce("without_orders", F.lit(0)).cast("bigint")
                    .alias("without_orders"))
            .orderBy("c_mktsegment"))


def oracle_customers_semi_anti() -> str:
    return """
WITH s AS (
  SELECT c_mktsegment, COUNT(*) AS with_orders FROM customer
  WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
  GROUP BY c_mktsegment
),
a AS (
  SELECT c_mktsegment, COUNT(*) AS without_orders FROM customer
  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
  GROUP BY c_mktsegment
)
SELECT COALESCE(s.c_mktsegment, a.c_mktsegment) AS c_mktsegment,
       CAST(COALESCE(s.with_orders, 0) AS BIGINT) AS with_orders,
       CAST(COALESCE(a.without_orders, 0) AS BIGINT) AS without_orders
FROM s FULL JOIN a ON s.c_mktsegment = a.c_mktsegment
ORDER BY c_mktsegment
"""


def customer_running_spend(spark: SparkSession, sf_dir: str,
                           max_cust: int = 20) -> DataFrame:
    """Analytic window with a running frame: cumulative order spend per
    customer in order-date order (integer cents)."""
    o = _read(spark, sf_dir, "orders").where(F.col("o_custkey") < max_cust)
    w = (Window.partitionBy("o_custkey")
         .orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, 0))
    return (o.select(F.col("o_custkey").cast("bigint").alias("custkey"),
                     F.col("o_orderkey").cast("bigint").alias("orderkey"),
                     F.sum(cents(F.col("o_totalprice"))).over(w)
                     .cast("bigint").alias("running_c"))
            .orderBy("custkey", "orderkey"))


def oracle_customer_running_spend(max_cust: int = 20) -> str:
    return f"""
SELECT CAST(o_custkey AS BIGINT) AS custkey,
       CAST(o_orderkey AS BIGINT) AS orderkey,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS running_c
FROM orders WHERE o_custkey < {max_cust}
ORDER BY custkey, orderkey
"""


def customer_trailing_spend(spark: SparkSession, sf_dir: str,
                            max_cust: int = 20, days: int = 90
                            ) -> DataFrame:
    """Time-RANGE window frame — the VALUE-based sibling of
    :func:`customer_running_spend`'s ROWS frame: trailing ``days``-day
    order count and spend per customer, with the frame bound defined
    on the ORDER BY *value* (epoch day), not on row positions. This is
    semantically distinct from any rows frame: (a) PEER rows (orders
    on the same day) always enter the frame together, so the result is
    deterministic under ties with no tiebreaker column; (b) calendar
    gaps count — an order 91+ days after its predecessor sees a frame
    of just its own day. Executes in the same single window
    exchange+sort as a rows frame (ONE hashpartitioning on custkey;
    the frame bound is evaluated by value during the ordered scan, no
    extra shuffle or self-join — the naive equivalent is an O(n²)
    range self-join per customer). Spark's ``rangeBetween`` needs a
    single numeric ORDER BY column, so the timestamp folds to integer
    epoch days first — exact in both engines.

    -> (custkey, orderkey, epoch_day, win_n, win_spend_c)."""
    o = _read(spark, sf_dir, "orders").where(F.col("o_custkey") < max_cust)
    o = o.withColumn(
        "epoch_day",
        F.datediff(F.col("o_orderdate").cast("date"),
                   F.to_date(F.lit("1970-01-01"))).cast("bigint"))
    w = (Window.partitionBy("o_custkey").orderBy("epoch_day")
         .rangeBetween(-days, 0))
    return (o.select(F.col("o_custkey").cast("bigint").alias("custkey"),
                     F.col("o_orderkey").cast("bigint").alias("orderkey"),
                     "epoch_day",
                     F.count("*").over(w).cast("bigint").alias("win_n"),
                     F.sum(cents(F.col("o_totalprice"))).over(w)
                     .cast("bigint").alias("win_spend_c"))
            .orderBy("custkey", "orderkey"))


def oracle_customer_trailing_spend(max_cust: int = 20,
                                   days: int = 90) -> str:
    return f"""
SELECT CAST(o_custkey AS BIGINT) AS custkey,
       CAST(o_orderkey AS BIGINT) AS orderkey,
       CAST(DATEDIFF('day', DATE '1970-01-01',
                     CAST(o_orderdate AS DATE)) AS BIGINT) AS epoch_day,
       CAST(COUNT(*) OVER w AS BIGINT) AS win_n,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER w
            AS BIGINT) AS win_spend_c
FROM orders WHERE o_custkey < {max_cust}
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY DATEDIFF('day', DATE '1970-01-01',
                               CAST(o_orderdate AS DATE))
             RANGE BETWEEN {days} PRECEDING AND CURRENT ROW)
ORDER BY custkey, orderkey
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


def lineitem_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets — completes the grouping-sets family next to
    rollup: every subset of (returnflag, linestatus), including the
    cross-margins rollup cannot produce."""
    li = _read(spark, sf_dir, "lineitem")
    return (li.cube("l_returnflag", "l_linestatus")
            .agg(F.count("*").alias("n_rows"),
                 F.sum(F.col("l_quantity").cast("bigint"))
                 .alias("sum_qty"))
            .select(F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
                    F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
                    F.col("n_rows").cast("bigint"),
                    F.col("sum_qty").cast("bigint"))
            .orderBy("rf", "ls"))


def oracle_lineitem_cube() -> str:
    return """
SELECT COALESCE(l_returnflag, 'ALL') AS rf,
       COALESCE(l_linestatus, 'ALL') AS ls,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY rf, ls
"""


def lineitem_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS — the third member of the grouping
    family next to rollup/cube: the set list ((rf, ls), (rf), ()) is
    deliberately NOT rollup- or cube-expressible (it skips (ls) but
    keeps the grand total). Uses the native `DataFrame.groupingSets`
    (Spark 4) — one Expand node, ONE shuffle with map-side partials,
    not |sets| passes over the table. NULL-vs-ALL ambiguity is
    resolved the portable way: `F.grouping(col)` bits (0 = grouped,
    1 = aggregated) composed into a gid — `grouping_id()`'s bit order
    is engine-specific, per-column GROUPING() is standard SQL.

    -> (gid, rf, ls, n_rows, sum_qty), gid = grouping(rf)*2 +
    grouping(ls)."""
    li = _read(spark, sf_dir, "lineitem")
    return (li.groupingSets(
                [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
                "l_returnflag", "l_linestatus")
            .agg(F.count("*").alias("n_rows"),
                 F.sum(F.col("l_quantity").cast("bigint"))
                 .alias("sum_qty"),
                 (F.grouping("l_returnflag") * 2
                  + F.grouping("l_linestatus")).alias("g"))
            .select(F.col("g").cast("bigint").alias("gid"),
                    F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
                    F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
                    F.col("n_rows").cast("bigint"),
                    F.col("sum_qty").cast("bigint"))
            .orderBy("gid", "rf", "ls"))


def oracle_lineitem_grouping_sets() -> str:
    return """
SELECT CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus)
            AS BIGINT) AS gid,
       COALESCE(l_returnflag, 'ALL') AS rf,
       COALESCE(l_linestatus, 'ALL') AS ls,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                        (l_returnflag), ())
ORDER BY gid, rf, ls
"""


def orders_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue pivot: nation × order-status cross-tab via the native
    ``groupBy().pivot()`` operator (reshape-to-wide — a relational
    surface none of the other gates exercise). Status values are pinned
    explicitly so Spark skips the extra distinct-values job and the
    output schema is static; a nation with no orders in a status stays
    NULL, matching SQL conditional aggregation.

    Plan: dimension broadcasts on customer/nation, then ONE shuffle on
    nation with map-side partial pivot-aggregates (pivot compiles to
    one agg with |statuses| columns, not |statuses| passes).

    -> (nation, rev_o, rev_f, rev_p) in integer cents."""
    o = _read(spark, sf_dir, "orders")
    c = _read(spark, sf_dir, "customer")
    n = _read(spark, sf_dir, "nation")
    piv = (o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
           .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
           .groupBy(F.col("n_name").alias("nation"))
           .pivot("o_orderstatus", ["O", "F", "P"])
           .agg(F.sum(cents(F.col("o_totalprice")))))
    return piv.select("nation",
                      F.col("O").cast("bigint").alias("rev_o"),
                      F.col("F").cast("bigint").alias("rev_f"),
                      F.col("P").cast("bigint").alias("rev_p"))


def oracle_orders_status_pivot() -> str:
    return """
WITH j AS (
  SELECT n_name AS nation, o_orderstatus AS st,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
  FROM orders JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
)
SELECT nation,
       CAST(SUM(CASE WHEN st = 'O' THEN c END) AS BIGINT) AS rev_o,
       CAST(SUM(CASE WHEN st = 'F' THEN c END) AS BIGINT) AS rev_f,
       CAST(SUM(CASE WHEN st = 'P' THEN c END) AS BIGINT) AS rev_p
FROM j GROUP BY nation ORDER BY nation
"""


def orders_status_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse reshape of ``orders_status_pivot``: the wide nation ×
    status cross-tab melted back to long form with the native
    ``DataFrame.unpivot`` (UNPIVOT compiles to one Expand node — no
    union of per-column scans). NULL cells (a nation with no orders in
    a status) are dropped, matching SQL UNPIVOT semantics, so
    pivot ∘ unpivot is the identity on the populated cells.

    -> (nation, status, rev_c)."""
    wide = orders_status_pivot(spark, sf_dir)
    return (wide.unpivot("nation",
                         ["rev_o", "rev_f", "rev_p"],
                         "status", "rev_c")
            .where(F.col("rev_c").isNotNull())
            .withColumn("status",
                        F.upper(F.substring(F.col("status"), 5, 1))))


def oracle_orders_status_unpivot() -> str:
    return """
SELECT n_name AS nation, o_orderstatus AS status,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS rev_c
FROM orders JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
GROUP BY 1, 2 ORDER BY 1, 2
"""


def part_cooccurrence(spark: SparkSession, sf_dir: str,
                      topk: int = 3) -> DataFrame:
    """Market-basket co-occurrence ("customers who bought X also
    bought Y"): parts appearing in the same order, scored by integer
    lift = floor(1e6 · cnt_ab · n_orders / (df_a · df_b)) — all-int64,
    no sqrt/log, so the ranking is bit-deterministic. Top-k partners
    per part by (lift desc, cnt desc, partner asc).

    Plan: the pair join is WITHIN-basket (self-join on l_orderkey), so
    fan-out is bounded by basket size² — never an item-item cross
    join; one shuffle on orderkey, one on the (a,b) pair, and the
    per-part ranking window runs on the pair table. Distinct-part
    frequencies are a broadcastable dictionary.

    -> (part_a, part_b, cnt, lift, rank)."""
    from pyspark.sql.window import Window
    li = (_read(spark, sf_dir, "lineitem")
          .select(F.col("l_orderkey").alias("ok"),
                  F.col("l_partkey").alias("pk")).distinct())
    # r8: n_orders as a broadcast one-row aggregate instead of a
    # separate driver count JOB that re-scanned lineitem before the
    # main plan (same fix as hotspot_cells; identical value/semantics)
    n_df = li.agg(F.countDistinct("ok").cast("bigint").alias("_no"))
    df_ = li.groupBy("pk").agg(F.count("*").cast("bigint").alias("df"))
    pairs = (li.alias("a").join(li.alias("b"), "ok")
             .where(F.col("a.pk") != F.col("b.pk"))
             .select(F.col("a.pk").alias("part_a"),
                     F.col("b.pk").alias("part_b"))
             .groupBy("part_a", "part_b")
             .agg(F.count("*").cast("bigint").alias("cnt")))
    out = (pairs
           .join(F.broadcast(df_.select(F.col("pk").alias("part_a"),
                                        F.col("df").alias("df_a"))),
                 "part_a")
           .join(F.broadcast(df_.select(F.col("pk").alias("part_b"),
                                        F.col("df").alias("df_b"))),
                 "part_b")
           # the numerator reaches ~1e6·cnt·n_orders (~1e24 at SF1000),
           # past int64 — Spark would wrap silently under non-ANSI mode
           # while DuckDB raises; widen to decimal(38,0)/HUGEINT so both
           # engines stay exact (the quotient itself always fits int64:
           # cnt <= min(df_a, df_b) bounds lift by 1e6 · n_orders)
           .crossJoin(F.broadcast(n_df))
           .withColumn("lift", F.expr(
               "(cast(1000000 as decimal(38,0)) * cnt * _no)"
               " div (cast(df_a as decimal(38,0)) * df_b)")
               .cast("bigint"))
           .drop("_no"))
    w = Window.partitionBy("part_a").orderBy(
        F.col("lift").desc(), F.col("cnt").desc(), "part_b")
    return (out.withColumn("rank", F.row_number().over(w).cast("bigint"))
            .where(F.col("rank") <= topk)
            .select(F.col("part_a").cast("bigint"),
                    F.col("part_b").cast("bigint"),
                    "cnt", "lift", "rank"))


def oracle_part_cooccurrence(topk: int = 3) -> str:
    return f"""
WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
            FROM lineitem),
n AS (SELECT COUNT(DISTINCT ok) AS n_orders FROM li),
f AS (SELECT pk, CAST(COUNT(*) AS BIGINT) AS df FROM li GROUP BY 1),
p AS (
  SELECT a.pk AS part_a, b.pk AS part_b,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM li a JOIN li b ON a.ok = b.ok AND a.pk <> b.pk
  GROUP BY 1, 2
),
s AS (
  SELECT part_a, part_b, cnt,
         CAST((CAST(1000000 AS HUGEINT) * cnt * n.n_orders)
              // (CAST(fa.df AS HUGEINT) * fb.df)
              AS BIGINT) AS lift
  FROM p JOIN f fa ON fa.pk = part_a JOIN f fb ON fb.pk = part_b, n
)
SELECT CAST(part_a AS BIGINT) AS part_a,
       CAST(part_b AS BIGINT) AS part_b, cnt, lift,
       CAST(ROW_NUMBER() OVER (PARTITION BY part_a
            ORDER BY lift DESC, cnt DESC, part_b) AS BIGINT) AS rank
FROM s QUALIFY rank <= {topk}
ORDER BY part_a, rank
"""


PROFILE_COLS = ("o_orderkey", "o_custkey", "o_orderstatus",
                "o_orderpriority")


def profile_table(spark: SparkSession, sf_dir: str,
                  table: str = "orders",
                  cols: tuple = PROFILE_COLS) -> DataFrame:
    """Data profiling (ANALYZE-class column statistics): per column —
    row count, null count, exact distinct count, min and max — the
    metadata pass every large-scale ingestion runs before planning
    (NDV feeds join reordering, min/max feed zone maps / file
    pruning). ONE pass over the table: all aggregates share a single
    grouping (Spark plans the multiple DISTINCTs via one Expand, still
    map-side partial), and the wide 1-row result is melted driver-side
    with ``stack`` — no per-column rescans. Only integer/string
    columns are profiled so min/max stringify identically in both
    engines.

    -> (col_name, n, n_null, n_distinct, min_s, max_s)."""
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"nn_{c}"),
            F.countDistinct(c).alias(f"nd_{c}"),
            F.min(c).cast("string").alias(f"mn_{c}"),
            F.max(c).cast("string").alias(f"mx_{c}"),
        ]
    wide = df.agg(*aggs)
    parts = ", ".join(
        f"'{c}', cast(nn_{c} as bigint), cast(_n - nn_{c} as bigint), "
        f"cast(nd_{c} as bigint), mn_{c}, mx_{c}" for c in cols)
    return (wide.select(F.expr(
        f"stack({len(cols)}, {parts}) AS "
        f"(col_name, n, n_null, n_distinct, min_s, max_s)"))
        .withColumn("n", F.col("n") + F.col("n_null")))


def oracle_profile_table(table: str = "orders",
                         cols: tuple = PROFILE_COLS) -> str:
    sels = []
    for c in cols:
        sels.append(
            f"SELECT '{c}' AS col_name, "
            f"CAST(COUNT(*) AS BIGINT) AS n, "
            f"CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null, "
            f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct, "
            f"CAST(MIN({c}) AS VARCHAR) AS min_s, "
            f"CAST(MAX({c}) AS VARCHAR) AS max_s FROM {table}")
    return " UNION ALL ".join(sels) + " ORDER BY col_name"


def customer_rank_family(spark: SparkSession, sf_dir: str,
                         tiles: int = 4) -> DataFrame:
    """The ranking-window family in one pass: RANK (gaps at ties),
    DENSE_RANK (no gaps), NTILE (equi-depth buckets, first n%k buckets
    one row deeper — the standard quantile-binning primitive for
    stratified sampling / feature bucketing). All three share ONE
    window spec, so they compute in a single exchange+sort; ranking on
    integer cents with c_custkey as the final tiebreaker makes every
    column deterministic (rank/dense_rank are tie-stable by value;
    ntile SPLITS peers, so it needs the unique key to be
    engine-stable).

    -> (nation, custkey, bal_c, rnk, drnk, tile)."""
    c = _read(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("bal_c"), F.asc("c_custkey"))
    return (c.withColumn("bal_c", cents(F.col("c_acctbal")))
            .select(F.col("c_nationkey").cast("bigint").alias("nation"),
                    F.col("c_custkey").cast("bigint").alias("custkey"),
                    F.col("bal_c").cast("bigint"),
                    F.rank().over(w).cast("bigint").alias("rnk"),
                    F.dense_rank().over(w).cast("bigint").alias("drnk"),
                    F.ntile(tiles).over(w).cast("bigint").alias("tile"))
            .orderBy("nation", "rnk", "custkey"))


def oracle_customer_rank_family(tiles: int = 4) -> str:
    return f"""
SELECT CAST(c_nationkey AS BIGINT) AS nation,
       CAST(c_custkey AS BIGINT) AS custkey,
       CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_c,
       CAST(RANK() OVER w AS BIGINT) AS rnk,
       CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
       CAST(NTILE({tiles}) OVER w AS BIGINT) AS tile
FROM customer
WINDOW w AS (PARTITION BY c_nationkey
             ORDER BY CAST(ROUND(c_acctbal * 100) AS BIGINT) DESC,
                      c_custkey ASC)
ORDER BY nation, rnk, custkey
"""


def orders_gap_fill(spark: SparkSession, sf_dir: str,
                    max_cust: int = 12) -> DataFrame:
    """Calendar densification — the training-pipeline primitive for
    regular time series (a model can't learn from implicitly-missing
    months): per customer, generate EVERY month between their first
    and last order via ``sequence()`` + ``explode`` (rows materialize
    in the executor generator — no driver loop, no join against a
    calendar table), left-join the actual monthly aggregate, and
    zero-fill the gaps. Month arithmetic in pure integers
    (year*12 + month) so both engines agree exactly.

    -> (custkey, ym, n_orders, spend_c) — one row per
    customer-month, gaps present with zeros."""
    o = _read(spark, sf_dir, "orders").where(F.col("o_custkey") < max_cust)
    m = o.select(F.col("o_custkey").cast("bigint").alias("custkey"),
                 (F.year("o_orderdate") * 12
                  + F.month("o_orderdate") - 1).cast("bigint").alias("ym"),
                 cents(F.col("o_totalprice")).alias("c"))
    agg = m.groupBy("custkey", "ym").agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.sum("c").cast("bigint").alias("spend_c"))
    span = m.groupBy("custkey").agg(F.min("ym").alias("lo"),
                                    F.max("ym").alias("hi"))
    cal = span.select("custkey",
                      F.explode(F.sequence("lo", "hi")).alias("ym"))
    return (cal.join(agg, ["custkey", "ym"], "left")
            .select("custkey", "ym",
                    F.coalesce("n_orders", F.lit(0)).cast("bigint")
                    .alias("n_orders"),
                    F.coalesce("spend_c", F.lit(0)).cast("bigint")
                    .alias("spend_c"))
            .orderBy("custkey", "ym"))


def oracle_orders_gap_fill(max_cust: int = 12) -> str:
    return f"""
WITH m AS (
  SELECT CAST(o_custkey AS BIGINT) AS custkey,
         CAST(YEAR(o_orderdate) * 12 + MONTH(o_orderdate) - 1
              AS BIGINT) AS ym,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
  FROM orders WHERE o_custkey < {max_cust}
), agg AS (
  SELECT custkey, ym, CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(c) AS BIGINT) AS spend_c
  FROM m GROUP BY 1, 2
), cal AS (
  SELECT custkey, UNNEST(generate_series(MIN(ym), MAX(ym))) AS ym
  FROM m GROUP BY custkey
)
SELECT cal.custkey, CAST(cal.ym AS BIGINT) AS ym,
       CAST(COALESCE(agg.n_orders, 0) AS BIGINT) AS n_orders,
       CAST(COALESCE(agg.spend_c, 0) AS BIGINT) AS spend_c
FROM cal LEFT JOIN agg USING (custkey, ym)
ORDER BY custkey, ym
"""


def nullsafe_join_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-safe equality join (``<=>`` / IS NOT DISTINCT FROM) — the
    join flavor plain ``=`` silently breaks: with nullable keys on
    BOTH sides, ``=`` drops every NULL row (NULL = NULL is NULL), while
    the null-safe form matches NULL with NULL like a value. Catalyst
    treats ``<=>`` as a full equi-join key (hash join, NOT the
    BroadcastNestedLoopJoin a general predicate would force — plan
    pinned in pytest). Fixture: orders bucketed by a nullable derived
    key (NULLIF(o_custkey % 7, 3) — 1-in-7 keys NULL on both sides),
    self-join orders-to-customers on the same derivation, rolled up.

    -> (k, n_pairs, spend_c) with k = -1 standing in for the NULL
    bucket in the output (the JOIN itself ran on real NULLs)."""
    # r8 (guide §2.3 "aggregate before you shuffle"): the derived key
    # has only 8 distinct values, so joining the raw tables exploded
    # to |o|x|c|/7 rows (~321M at sf0.1, >75 s) only to be re-grouped
    # by the same key. Aggregating each side FIRST makes the join an
    # 8x8 row product; n_pairs/spend_c distribute exactly over the
    # per-key counts (integer arithmetic, identical results — the
    # NULL-safe hash join itself is unchanged and still plan-pinned).
    o = (_read(spark, sf_dir, "orders")
         .select(F.nullif(F.col("o_custkey") % 7, F.lit(3)).alias("ok"),
                 cents(F.col("o_totalprice")).alias("c"))
         .groupBy("ok")
         .agg(F.count("*").cast("bigint").alias("n_o"),
              F.sum("c").cast("bigint").alias("s_c")))
    c = (_read(spark, sf_dir, "customer")
         .select(F.nullif(F.col("c_custkey") % 7, F.lit(3)).alias("ck"))
         .groupBy("ck")
         .agg(F.count("*").cast("bigint").alias("n_c")))
    j = o.join(c, o["ok"].eqNullSafe(c["ck"]))
    return (j.select(F.coalesce(F.col("ok"), F.lit(-1)).cast("bigint")
                     .alias("k"),
                     (F.col("n_o") * F.col("n_c")).cast("bigint")
                     .alias("n_pairs"),
                     (F.col("s_c") * F.col("n_c")).cast("bigint")
                     .alias("spend_c"))
            .orderBy("k"))


def oracle_nullsafe_join_rollup() -> str:
    return """
WITH o AS (SELECT NULLIF(o_custkey % 7, 3) AS ok,
                  CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
           FROM orders),
c AS (SELECT NULLIF(c_custkey % 7, 3) AS ck FROM customer)
SELECT CAST(COALESCE(ok, -1) AS BIGINT) AS k,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(o.c) AS BIGINT) AS spend_c
FROM o JOIN c ON o.ok IS NOT DISTINCT FROM c.ck
GROUP BY 1 ORDER BY k
"""


def customer_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI set operations (the relational surface the join gates
    don't cover): the DISTINCT customer sets active in even vs odd
    order years, combined by INTERSECT and both EXCEPT directions.
    Spark plans INTERSECT as a left-semi + distinct and EXCEPT as a
    left-anti + distinct — aggregate-free set algebra that shuffles
    only the deduplicated key column (at 100 TB the distinct collapse
    happens map-side before the exchange). -> (op, c_custkey)."""
    o = _read(spark, sf_dir, "orders").select(
        "o_custkey", F.expr("year(o_orderdate) % 2 = 0").alias("even"))
    a = o.where("even").select("o_custkey").distinct()
    b = o.where("NOT even").select("o_custkey").distinct()
    tag = lambda df, t: df.select(  # noqa: E731
        F.lit(t).alias("op"), F.col("o_custkey").cast("bigint"))
    return (tag(a.intersect(b), "both")
            .union(tag(a.subtract(b), "even_only"))
            .union(tag(b.subtract(a), "odd_only"))
            .orderBy("op", "o_custkey"))


def oracle_customer_set_ops() -> str:
    return """
WITH a AS (SELECT DISTINCT o_custkey FROM orders
           WHERE year(o_orderdate) % 2 = 0),
b AS (SELECT DISTINCT o_custkey FROM orders
      WHERE year(o_orderdate) % 2 = 1)
SELECT 'both' AS op, CAST(o_custkey AS BIGINT) AS o_custkey
FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
UNION ALL
SELECT 'even_only', CAST(o_custkey AS BIGINT)
FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
UNION ALL
SELECT 'odd_only', CAST(o_custkey AS BIGINT)
FROM (SELECT * FROM b EXCEPT SELECT * FROM a)
ORDER BY op, o_custkey
"""


_SCALAR_SUBQ_SQL = """
SELECT o.o_orderkey,
       CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS price_c,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM {orders} i
        WHERE i.o_custkey = o.o_custkey) AS cust_n,
       (SELECT CAST(SUM(CAST(ROUND(i.o_totalprice * 100) AS BIGINT))
               AS BIGINT)
        FROM {orders} i WHERE i.o_custkey = o.o_custkey) AS cust_sum_c
FROM {orders} o
WHERE CAST(ROUND(o.o_totalprice * 100) AS BIGINT)
      * (SELECT COUNT(*) FROM {orders} i
         WHERE i.o_custkey = o.o_custkey)
      > (SELECT SUM(CAST(ROUND(i.o_totalprice * 100) AS BIGINT))
         FROM {orders} i WHERE i.o_custkey = o.o_custkey)
ORDER BY o_orderkey
"""


def orders_above_cust_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORRELATED scalar subqueries — orders priced above their own
    customer's average, written as per-row subselects and left to
    Catalyst's decorrelation: the optimizer rewrites EVERY correlated
    subquery into a grouped aggregate hash-joined back on o_custkey —
    zero per-row subquery execution in the physical plan (pinned by a
    plan-shape test), which is the difference between an O(n) plan
    and an O(n²) one at 100 TB. (Catalyst does not CSE the four
    textually-identical subselects into one aggregate — they stay
    four broadcast joins; the pin is on decorrelation, not fusion.)
    The average compare is division-free (price*count > sum, exact
    integers).
    -> (o_orderkey, price_c, cust_n, cust_sum_c), ordered."""
    _read(spark, sf_dir, "orders").createOrReplaceTempView("_subq_orders")
    return spark.sql(_SCALAR_SUBQ_SQL.format(orders="_subq_orders"))


def oracle_orders_above_cust_avg() -> str:
    return _SCALAR_SUBQ_SQL.format(orders="orders")


_REC_CTE_SQL = """
WITH RECURSIVE anc(id, anc, depth) AS (
  SELECT doc_id, doc_id, CAST(0 AS BIGINT) FROM {docs}
  WHERE doc_id < 2000
  UNION ALL
  SELECT id, anc // 3, depth + 1 FROM anc WHERE anc > 0
)
SELECT CAST(id AS BIGINT) AS id, CAST(anc AS BIGINT) AS anc,
       CAST(depth AS BIGINT) AS depth
FROM anc ORDER BY id, depth
"""


def doc_ancestor_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECURSIVE CTE (new in Spark 4) — the iterative-query surface
    none of the other gates touch: the full ancestor transitive
    closure of the implicit ternary doc hierarchy (parent = id div 3,
    strictly decreasing, so the recursion provably terminates at the
    root 0). Each iteration is one self-join the engine unions in —
    at 100 TB this is the hierarchy-flattening pattern (org charts,
    category trees, thread ancestry) that otherwise needs a driver
    loop; depth here is bounded by log₃(max id). IDENTICAL SQL text
    executes on DuckDB (Spark's `div` spelled `//` both sides).
    -> (id, anc, depth) for every ancestor pair, ordered."""
    spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .createOrReplaceTempView("_rec_docs")
    # Spark spells integer division `div`, DuckDB `//` — the ONLY
    # dialect difference in this text
    return spark.sql(_REC_CTE_SQL.format(docs="_rec_docs")
                     .replace("anc // 3", "anc div 3"))


def oracle_doc_ancestor_closure() -> str:
    return _REC_CTE_SQL.format(docs="documents")


def fact_fact_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FACT x FACT shuffle join — the join plan-class every other gate
    avoids (their dimension sides broadcast): lineitem joined to
    orders on orderkey as a SORT-MERGE join (hinted — at test SF both
    sides fit under the broadcast threshold, but at 100 TB neither
    does and this is the plan that runs), revenue rolled up per order
    priority. Both sides shuffle ONCE on the join key with map-side
    aggregation nowhere applicable pre-join; the discounted revenue
    is one identically-parenthesized IEEE chain then integer cents.
    -> (o_orderpriority, n_items, rev_c), ordered."""
    li = _read(spark, sf_dir, "lineitem")
    o = _read(spark, sf_dir, "orders")
    rev = F.round(F.col("l_extendedprice")
                  * (F.lit(1.0) - F.col("l_discount")) * 100, 0) \
        .cast("bigint")
    return (li.hint("merge")
            .join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").cast("bigint").alias("n_items"),
                 F.sum(rev).cast("bigint").alias("rev_c"))
            .orderBy("o_orderpriority"))


def oracle_fact_fact_revenue() -> str:
    return """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 100)
                AS BIGINT)) AS BIGINT) AS rev_c
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""
