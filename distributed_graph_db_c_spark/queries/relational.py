"""Relational query surface (SURVEY.md §7 M4) — the operator inventory the
reference lacks entirely (§2.2 audit: no joins/aggs/windows/sorts exist
there; its whole surface is 4 graph ops), expressed as named queries over
the driver's TPC-H-ish tables, each with a DuckDB oracle.

Determinism rules (must hold under any partitioning — SURVEY.md §5):
- Money math in DECIMAL (exact, associative), cast to DOUBLE only at the
  end; both sides use identical cast sequences so values are bit-equal.
- AVG = CAST(decimal-sum AS DOUBLE) / COUNT — double division of identical
  inputs, not decimal division (scale rules differ across engines).
- Every top-k ORDER BY carries a unique-key tie-break.
- Date/timestamp output columns serialize to strings ('yyyy-MM-dd').

Scale notes: filters sit directly on the scans (predicate pushdown to
parquet), nation/region are explicit ``broadcast()`` joins, everything else
is plain equi-joins Catalyst/AQE plans (sort-merge at scale, broadcast when
a side is small, skew-split via AQE).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..registry import register
from ..sources.tables import load_table

# -- shared exact-arithmetic fragments -------------------------------------

DEC = "decimal(18,4)"


def d(col: str | F.Column) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def _dsql(expr: str) -> str:
    return f"CAST({expr} AS DECIMAL(18,4))"


# Decimal-sum -> double normalization: cast the sum down to its TRUE scale
# (the product of 2-decimal inputs has <= 4 or 6 decimals) so the unscaled
# value fits in 2^53 and decimal->double is a single correctly-rounded step
# in BOTH engines (DuckDB's int128/10^12 -> double path otherwise differs
# from Java BigDecimal by 1 ulp).
def dsum(expr: F.Column, scale: int = 4) -> F.Column:
    return F.sum(expr).cast(f"decimal(38,{scale})").cast("double")


def _dsum_sql(expr: str, scale: int = 4) -> str:
    return f"CAST(CAST(SUM({expr}) AS DECIMAL(38,{scale})) AS DOUBLE)"


# revenue = sum(extendedprice * (1 - discount)), exact then double.
def revenue_expr() -> F.Column:
    return dsum(d("l_extendedprice") * (F.lit(1) - d("l_discount")))


REVENUE_SQL = _dsum_sql(f"{_dsql('l_extendedprice')} * (1 - {_dsql('l_discount')})")


def _dt(col: str) -> F.Column:
    """Date/timestamp column -> canonical 'yyyy-MM-dd' string."""
    return F.date_format(col, "yyyy-MM-dd")


_DT_SQL = "strftime({col}, '%Y-%m-%d')"


# ---------------------------------------------------------------------------
# Q1-style pricing summary: full-scan aggregation, 4 sums / 3 avgs / count.
# ---------------------------------------------------------------------------

_Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {_dsum_sql(_dsql('l_quantity'), 2)} AS sum_qty,
       {_dsum_sql(_dsql('l_extendedprice'), 2)} AS sum_base_price,
       {REVENUE_SQL} AS sum_disc_price,
       {_dsum_sql(f"CAST({_dsql('l_extendedprice')} * (1 - {_dsql('l_discount')}) AS DECIMAL(24,8)) * CAST(1 + {_dsql('l_tax')} AS DECIMAL(6,4))", 6)} AS sum_charge,
       {_dsum_sql(_dsql('l_quantity'), 2)} / COUNT(*) AS avg_qty,
       {_dsum_sql(_dsql('l_extendedprice'), 2)} / COUNT(*) AS avg_price,
       {_dsum_sql(_dsql('l_discount'), 2)} / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("rel_q1_pricing_summary", oracle=_Q1_SQL)
def rel_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy grouped aggregation; partial (map-side)
    aggregation + 2-phase hash agg come free from Catalyst."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp")
    )
    charge = (d("l_extendedprice") * (F.lit(1) - d("l_discount"))).cast(
        "decimal(24,8)"
    ) * (F.lit(1) + d("l_tax")).cast("decimal(6,4)")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum(d("l_quantity"), 2).alias("sum_qty"),
        dsum(d("l_extendedprice"), 2).alias("sum_base_price"),
        revenue_expr().alias("sum_disc_price"),
        dsum(charge, 6).alias("sum_charge"),
        (dsum(d("l_quantity"), 2) / F.count("*")).alias("avg_qty"),
        (dsum(d("l_extendedprice"), 2) / F.count("*")).alias("avg_price"),
        (dsum(d("l_discount"), 2) / F.count("*")).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


# ---------------------------------------------------------------------------
# Q3-style shipping priority: 3-way join + group + top-k.
# ---------------------------------------------------------------------------

_Q3_SQL = f"""
SELECT l_orderkey,
       {REVENUE_SQL} AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("rel_q3_shipping_priority", oracle=_Q3_SQL)
def rel_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue_expr().alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            _dt("o_orderdate").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q5-style local supplier volume: 6-way join incl. broadcast dims.
# ---------------------------------------------------------------------------

_Q5_SQL = f"""
SELECT n_name, {REVENUE_SQL} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
"""


@register("rel_q5_local_supplier_volume", oracle=_Q5_SQL)
def rel_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nation/region are broadcast explicitly — at 100 TB these dims are
    still tiny; the fact joins stay shuffle-based and AQE-planned."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(revenue_expr().alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q6-style forecast revenue: pure filter + single aggregate (pushdown test).
# ---------------------------------------------------------------------------

_Q6_SQL = f"""
SELECT {_dsum_sql(f"{_dsql('l_extendedprice')} * {_dsql('l_discount')}")} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


@register("rel_q6_forecast_revenue", oracle=_Q6_SQL)
def rel_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(d("l_extendedprice") * d("l_discount")).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q10-style returned items: join + group + top-k with tie-break.
# ---------------------------------------------------------------------------

_Q10_SQL = f"""
SELECT c_custkey, c_name, {REVENUE_SQL} AS revenue, c_acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("rel_q10_returned_items", oracle=_Q10_SQL)
def rel_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(revenue_expr().alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q14-style promo revenue: conditional aggregation over a join.
# ---------------------------------------------------------------------------

_Q14_SQL = f"""
SELECT 100.0 * {_dsum_sql(f"CASE WHEN p_type = 'PROMO' THEN {_dsql('l_extendedprice')} * (1 - {_dsql('l_discount')}) ELSE CAST(0 AS DECIMAL(18,4)) END")}
             / {_dsum_sql(f"{_dsql('l_extendedprice')} * (1 - {_dsql('l_discount')})")}
       AS promo_pct
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
"""


@register("rel_q14_promo_revenue", oracle=_Q14_SQL)
def rel_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    disc_price = d("l_extendedprice") * (F.lit(1) - d("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc_price).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * dsum(promo)
                / dsum(disc_price)
            ).alias("promo_pct")
        )
    )


# ---------------------------------------------------------------------------
# Q18-style large-volume customers: agg-join-agg with HAVING.
# ---------------------------------------------------------------------------

_Q18_SQL = f"""
SELECT c_custkey, c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_totalprice,
       {_dsum_sql(_dsql('l_quantity'), 2)} AS sum_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
    SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
    HAVING SUM({_dsql('l_quantity')}) > 150
)
GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


@register("rel_q18_large_volume_customer", oracle=_Q18_SQL)
def rel_q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Agg -> semi-join -> agg: the inner HAVING aggregate is a left-semi
    join against the fact table (no row duplication, early reduction)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(d("l_quantity")).alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(big, li.l_orderkey == big.l_orderkey, "left_semi")
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum(d("l_quantity"), 2).alias("sum_qty"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            _dt("o_orderdate").alias("orderdate"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Window functions (absent in reference — §2.2; canonical orderings keyed on
# unique columns so frame contents are deterministic).
# ---------------------------------------------------------------------------

_WIN_RUNNING_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                 OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DECIMAL(38,2)) AS DOUBLE) AS running_total
FROM orders
WHERE o_custkey < 100
"""


@register("rel_window_running_total", oracle=_WIN_RUNNING_SQL)
def rel_window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum per customer — ROWS frame over a unique ordering; the
    window shuffle partitions by o_custkey (same key a cluster would use)."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("decimal(38,2)")
        .cast("double")
        .alias("running_total"),
    )


_WIN_RANK_SQL = """
SELECT p_brand, p_partkey, p_retailprice, rnk
FROM (
    SELECT p_brand, p_partkey, p_retailprice,
           DENSE_RANK() OVER (PARTITION BY p_brand
                              ORDER BY p_retailprice DESC, p_partkey) AS rnk
    FROM part
) t
WHERE rnk <= 3
"""


@register("rel_window_rank_top3_parts", oracle=_WIN_RANK_SQL)
def rel_window_rank_top3_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via dense_rank — the scalable alternative to
    per-group collect+sort."""
    from pyspark.sql import Window

    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        p.select(
            "p_brand",
            "p_partkey",
            "p_retailprice",
            F.dense_rank().over(w).cast("long").alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
    )


_WIN_LAG_SQL = """
SELECT o_custkey, o_orderkey,
       date_diff('day',
                 CAST(LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                             ORDER BY o_orderdate, o_orderkey) AS DATE),
                 CAST(o_orderdate AS DATE)) AS gap_days
FROM orders
WHERE o_custkey < 100
"""


@register("rel_window_order_gap_days", oracle=_WIN_LAG_SQL)
def rel_window_order_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate").cast("date"), prev.cast("date"))
        .cast("long")
        .alias("gap_days"),
    )


# ---------------------------------------------------------------------------
# Grouping sets / rollup / cube (absent in reference — §2.2).
# ---------------------------------------------------------------------------

_ROLLUP_SQL = """
SELECT r_name, n_name,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS revenue,
       COUNT(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


@register("rel_rollup_revenue_region_nation", oracle=_ROLLUP_SQL)
def rel_rollup_revenue_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


_CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS revenue
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


@register("rel_cube_status_priority", oracle=_CUBE_SQL)
def rel_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(38,2)")
        .cast("double")
        .alias("revenue"),
    )


# ---------------------------------------------------------------------------
# Distinct aggregation, semi/anti joins, set operations (§2.2 audit rows).
# ---------------------------------------------------------------------------

_CNTD_SQL = """
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_supps,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
"""


@register("rel_count_distinct", oracle=_CNTD_SQL)
def rel_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count("*").alias("n_rows"),
    )


_SEMI_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
"""


@register("rel_semi_join_open_orders", oracle=_SEMI_SQL)
def rel_semi_join_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


_ANTI_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
"""


@register("rel_anti_join_customers_no_orders", oracle=_ANTI_SQL)
def rel_anti_join_customers_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no large (>300k) order — anti-join with a pushed-down
    filter on the probe side (every customer has SOME order at sf>=0.01, so
    the unfiltered variant is degenerate)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o.filter(F.col("o_totalprice") > 300000), c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


_EXCEPT_SQL = """
SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
EXCEPT
SELECT CAST(s_nationkey AS BIGINT) AS nationkey
FROM supplier
JOIN nation ON n_nationkey = s_nationkey
JOIN region ON r_regionkey = n_regionkey
WHERE r_name = 'EUROPE'
"""


@register("rel_except_nations", oracle=_EXCEPT_SQL)
def rel_except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer nations minus EUROPEAN-supplier nations.  Round-9 rework
    of a vacuous gate: the original unfiltered form returned 0 rows at
    sf0.01 (every customer nation also has a supplier), proving only
    that both engines return empty — it would have stayed green with
    the EXCEPT inverted.  Restricting the subtracted side to one region
    makes the difference provably nonempty (every non-European customer
    nation survives; test_except_nations_nonvacuous pins rows > 0 and
    keeps the original full-overlap form as a pytest).  The subtracted
    side is dims-only (supplier x nation x region), so both joins
    broadcast; the EXCEPT itself hash-aggregates on the single key."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("long").alias("nationkey")
    )
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .select(F.col("s_nationkey").cast("long").alias("nationkey"))
    )
    return c.subtract(s)  # EXCEPT = set difference (distinct), not exceptAll


_INTERSECT_SQL = """
SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
INTERSECT
SELECT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier
"""


@register("rel_intersect_nations", oracle=_INTERSECT_SQL)
def rel_intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("long").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").cast("long").alias("nationkey")
    )
    return c.intersect(s)


_UNION_SQL = """
SELECT nationkey, COUNT(*) AS n FROM (
    SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
    UNION ALL
    SELECT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier
) t GROUP BY nationkey
"""


@register("rel_union_all_nation_counts", oracle=_UNION_SQL)
def rel_union_all_nation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("long").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").cast("long").alias("nationkey")
    )
    return c.unionAll(s).groupBy("nationkey").agg(F.count("*").alias("n"))


# ---------------------------------------------------------------------------
# Scalar functions (string/date/math) — §2.2 "scalar functions: absent".
# Chosen for bit-identical cross-engine semantics (no libm transcendentals).
# ---------------------------------------------------------------------------

_STR_FUNC_SQL = """
SELECT p_partkey,
       UPPER(p_name) AS name_upper,
       SUBSTRING(p_name, 1, 5) AS name_pfx,
       LENGTH(p_name) AS name_len,
       p_brand || ':' || p_type AS brand_type,
       STRPOS(p_name, 'a') AS a_pos
FROM part
"""


@register("rel_scalar_string_funcs", oracle=_STR_FUNC_SQL)
def rel_scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 5).alias("name_pfx"),
        F.length("p_name").cast("long").alias("name_len"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.instr("p_name", "a").cast("long").alias("a_pos"),
    )


_DATE_FUNC_SQL = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT) AS y,
       CAST(month(o_orderdate) AS BIGINT) AS m,
       CAST(day(o_orderdate) AS BIGINT) AS dom,
       CAST(quarter(o_orderdate) AS BIGINT) AS q,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start
FROM orders WHERE o_orderkey < 1000
"""


@register("rel_scalar_date_funcs", oracle=_DATE_FUNC_SQL)
def rel_scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("y"),
        F.month("o_orderdate").cast("long").alias("m"),
        F.dayofmonth("o_orderdate").cast("long").alias("dom"),
        F.quarter("o_orderdate").cast("long").alias("q"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
    )


_MATH_FUNC_SQL = """
SELECT o_orderkey,
       FLOOR(o_totalprice) AS price_floor,
       CEIL(o_totalprice) AS price_ceil,
       ABS(o_totalprice - 250000.0) AS dist_mid,
       o_orderkey % 7 AS k_mod,
       SQRT(o_totalprice) AS price_sqrt
FROM orders WHERE o_orderkey < 1000
"""


@register("rel_scalar_math_funcs", oracle=_MATH_FUNC_SQL)
def rel_scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    return o.select(
        "o_orderkey",
        F.floor("o_totalprice").cast("double").alias("price_floor"),
        F.ceil("o_totalprice").cast("double").alias("price_ceil"),
        F.abs(F.col("o_totalprice") - 250000.0).alias("dist_mid"),
        (F.col("o_orderkey") % 7).alias("k_mod"),
        F.sqrt("o_totalprice").alias("price_sqrt"),
    )


_CASE_SQL = """
SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
            WHEN c_acctbal < 2500 THEN 'low'
            WHEN c_acctbal < 7500 THEN 'mid'
            ELSE 'high' END AS bal_bucket,
       COUNT(*) AS n,
       CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS total_bal
FROM customer
GROUP BY 1
"""


@register("rel_case_bucketing", oracle=_CASE_SQL)
def rel_case_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    bucket = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 2500, "low")
        .when(F.col("c_acctbal") < 7500, "mid")
        .otherwise("high")
    )
    return c.groupBy(bucket.alias("bal_bucket")).agg(
        F.count("*").alias("n"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
        .cast("decimal(38,2)")
        .cast("double")
        .alias("total_bal"),
    )


_PAGE_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
ORDER BY o_orderkey LIMIT 50 OFFSET 100
"""


@register("rel_order_pagination", oracle=_PAGE_SQL)
def rel_order_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
        .offset(100)
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Events: sessionization, tumbling windows, JSON, pivot-style matrix.
# The reference's message queue is a transport, not a stream model (§2.2);
# these are the driver-mandated stream-table analytics, batch form.
# ---------------------------------------------------------------------------

_SESS_SQL = """
WITH seq AS (
    SELECT user_id, ts, value,
           LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
    FROM events
),
flagged AS (
    SELECT user_id, value,
           CASE WHEN prev_ts IS NULL OR ts > prev_ts + INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS new_session
    FROM seq
)
SELECT user_id,
       CAST(SUM(new_session) AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM flagged GROUP BY user_id
"""


@register("rel_events_sessionization", oracle=_SESS_SQL)
def rel_events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) via lag window — one
    shuffle by user_id; the streaming twin is session_window in
    streaming/requests.py."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    new_session = F.when(
        prev_ts.isNull() | (F.col("ts") > prev_ts + F.expr("INTERVAL 30 MINUTES")), 1
    ).otherwise(0)
    return (
        ev.select("user_id", new_session.alias("new_session"))
        .groupBy("user_id")
        .agg(
            F.sum("new_session").cast("long").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
    )


_TUMBLE_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
       event_type,
       COUNT(*) AS n,
       CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
"""


@register("rel_events_tumbling_hour", oracle=_TUMBLE_SQL)
def rel_events_tumbling_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .cast("double")
            .alias("total_value"),
        )
    )


_JSON_SQL = """
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
       COUNT(*) AS n
FROM events
GROUP BY 1
"""


@register("rel_events_json_extract", oracle=_JSON_SQL)
def rel_events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy((k % 10).alias("k_bucket")).agg(F.count("*").alias("n"))


_TYPE_MATRIX_SQL = """
SELECT user_id,
       CAST(SUM(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(SUM(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(SUM(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(SUM(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS n_error
FROM events GROUP BY user_id
"""


@register("rel_events_type_matrix", oracle=_TYPE_MATRIX_SQL)
def rel_events_type_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot expressed as conditional aggregation (the scalable form —
    explicit value list, no two-pass pivot discovery)."""
    ev = load_table(spark, sf_dir, "events")

    def cnt(t: str) -> F.Column:
        return F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(f"n_{t}")

    return ev.groupBy("user_id").agg(
        cnt("click"), cnt("view"), cnt("purchase"), cnt("signup"), cnt("error")
    )


_GROUPING_SETS_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
       COUNT(*) AS n,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


@register("rel_grouping_sets_flag_status", oracle=_GROUPING_SETS_SQL)
def rel_grouping_sets_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with a grouping-id discriminator — the third
    member of the rollup/cube family (SURVEY.md §2.2: absent in reference).
    Same SQL text on both engines; what's under test is Spark's Expand-based
    grouping-set execution (one scan, partial aggregation per set)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_GROUPING_SETS_SQL)


_Q17_SQL = """
SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) / 7.0
       AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#2' AND p_size < 15
  AND l_quantity < (SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
                    WHERE l2.l_partkey = part.p_partkey)
"""


@register("rel_q17_small_quantity_revenue", oracle=_Q17_SQL)
def rel_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 — correlated scalar subquery (per-part average quantity)
    decorrelated BY HAND into a pre-aggregated broadcast join: one scan of
    lineitem computes per-part averages, the filtered part dim broadcasts,
    and the probe side never shuffles.  The oracle keeps the correlated
    form — two genuinely different plans, one result."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#2") & (F.col("p_size") < 15)
    )
    avg_q = li.groupBy("l_partkey").agg(F.avg("l_quantity").alias("avg_qty"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(avg_q.join(F.broadcast(part), avg_q.l_partkey == part.p_partkey)
                          .select(avg_q.l_partkey.alias("pk"), "avg_qty")),
              li.l_partkey == F.col("pk"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                .cast("decimal(38,2)")
                .cast("double")
                / 7.0
            ).alias("avg_yearly")
        )
    )


_PCT_SQL = """
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.25) AS q25,
       quantile_cont(l_quantity, 0.50) AS q50,
       quantile_cont(l_quantity, 0.75) AS q75,
       median(l_extendedprice) AS med_price
FROM lineitem GROUP BY l_returnflag
"""


@register("rel_percentiles_quantity", oracle=_PCT_SQL)
def rel_percentiles_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (sort-based, linear interpolation) per group —
    Spark `percentile` and DuckDB `quantile_cont` share the interpolation
    definition, so values hash-match bit-for-bit on this data."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", F.lit(0.25)).alias("q25"),
        F.percentile("l_quantity", F.lit(0.50)).alias("q50"),
        F.percentile("l_quantity", F.lit(0.75)).alias("q75"),
        F.percentile("l_extendedprice", F.lit(0.5)).alias("med_price"),
    )


# --- TPC-H-shaped subquery/pushdown family, adapted to the driver's
# column subset (no l_commitdate/l_shipmode/partsupp in TESTDATA.md). ---

_Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
"""


@register("rel_q4_late_shipping", oracle=_Q4_SQL)
def rel_q4_late_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS with a non-equi condition,
    expressed as a left-semi join with a compound predicate (the plan
    Catalyst rewrites EXISTS into — here written directly)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    sem = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return sem.groupBy("o_orderpriority").agg(F.count("*").alias("n_orders"))


_Q19_SQL = """
SELECT CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
       AS DECIMAL(38,4)) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 15 AND 35)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 25 AND 50)
"""


@register("rel_q19_disjunctive_filter", oracle=_Q19_SQL)
def rel_q19_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs spanning both join sides.  Catalyst
    splits the disjunction into per-side implied filters (l_quantity <= 50,
    p_size >= 1) that DO push to the scans, keeping the residual predicate
    as a join filter — the pattern naive engines evaluate post-join."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & F.col("l_quantity").between(15, 35))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50) & F.col("l_quantity").between(25, 50))
    )
    return j.filter(cond).agg(
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)"))
        .cast("decimal(38,4)")
        .cast("double")
        .alias("revenue")
    )


_Q20_SQL = """
SELECT s_name, s_acctbal
FROM supplier
WHERE s_suppkey IN (
    SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_name LIKE 'red%'
    GROUP BY l_suppkey
    HAVING SUM(l_quantity) > 2100
)
"""


@register("rel_q20_heavy_suppliers", oracle=_Q20_SQL)
def rel_q20_heavy_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: IN over an aggregated-with-HAVING subquery —
    nested aggregate feeding a semi join."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    heavy = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 2100)
    )
    return s.join(
        heavy, s.s_suppkey == heavy.l_suppkey, "left_semi"
    ).select("s_name", "s_acctbal")


_Q22_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_rich_inactive,
       CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS balance
FROM customer
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_totalprice > 300000)
GROUP BY c_mktsegment
"""


@register("rel_q22_rich_inactive", oracle=_Q22_SQL)
def rel_q22_rich_inactive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: uncorrelated scalar subquery (global average) +
    NOT EXISTS anti join (no order above 300k), grouped.  Spark side:
    crossJoin the 1-row scalar (broadcast), anti-join the filtered orders."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("_avg"))
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg"))
        .join(o.filter(F.col("o_totalprice") > 300000), c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_rich_inactive"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .cast("double")
            .alias("balance"),
        )
    )


# ---------------------------------------------------------------------------
# Q7-style volume shipping: the double-dimension join (nation aliased twice).
# ---------------------------------------------------------------------------

_Q7_SQL = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
       {REVENUE_SQL} AS revenue
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON n1.n_nationkey = s_nationkey
JOIN nation n2 ON n2.n_nationkey = c_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY supp_nation, cust_nation, l_year
"""


@register("rel_q7_volume_shipping", oracle=_Q7_SQL)
def rel_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: the same dimension joined twice under two roles
    (supplier's nation vs customer's nation) with a symmetric disjunctive
    filter.  Both nation copies broadcast; the OR filter sits above the
    joins exactly as in the spec so Catalyst pushes the per-copy IN
    ('NATION_1','NATION_2') prefilter down each branch."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    nations = load_table(spark, sf_dir, "nation")
    n1 = F.broadcast(nations.select(F.col("n_nationkey").alias("_n1key"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(nations.select(F.col("n_nationkey").alias("_n2key"), F.col("n_name").alias("cust_nation")))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n1, s.s_nationkey == F.col("_n1key"))
        .join(n2, c.c_nationkey == F.col("_n2key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(revenue_expr().alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q8-style market share: conditional-sum ratio over a 7-way join.
# ---------------------------------------------------------------------------

_VOL_SQL = f"CAST({_dsql('l_extendedprice')} * (1 - {_dsql('l_discount')}) AS DECIMAL(24,8))"

_Q8_SQL = f"""
SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(CAST(SUM(CASE WHEN n2.n_name = 'NATION_3' THEN {_VOL_SQL}
                          ELSE CAST(0 AS DECIMAL(24,8)) END) AS DECIMAL(38,6)) AS DOUBLE)
       / CAST(CAST(SUM({_VOL_SQL}) AS DECIMAL(38,6)) AS DOUBLE) AS mkt_share
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON n1.n_nationkey = c_nationkey
JOIN region   ON r_regionkey = n1.n_regionkey
JOIN nation n2 ON n2.n_nationkey = s_nationkey
WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY o_year
"""


@register("rel_q8_market_share", oracle=_Q8_SQL)
def rel_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: national market share = conditional decimal sum over
    total decimal sum, per year, across the widest join in the suite (7
    tables).  Numerator and denominator are each exact-decimal sums cast to
    DOUBLE once; the final division is double/double on both engines so the
    ratio is bit-identical regardless of partitioning."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    nations = load_table(spark, sf_dir, "nation")
    n1 = F.broadcast(nations.select(F.col("n_nationkey").alias("_n1key"), F.col("n_regionkey").alias("_n1region")))
    n2 = F.broadcast(nations.select(F.col("n_nationkey").alias("_n2key"), F.col("n_name").alias("supp_nation")))
    r = F.broadcast(load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    vol = (d("l_extendedprice") * (F.lit(1) - d("l_discount"))).cast("decimal(24,8)")
    zero = F.lit(0).cast("decimal(24,8)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n1, c.c_nationkey == F.col("_n1key"))
        .join(r, F.col("_n1region") == r.r_regionkey)
        .join(n2, s.s_nationkey == F.col("_n2key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(zero))
                .cast("decimal(38,6)")
                .cast("double")
                / F.sum(vol).cast("decimal(38,6)").cast("double")
            ).alias("mkt_share")
        )
    )


# ---------------------------------------------------------------------------
# Q9-style product-type profit (adapted: no partsupp table in the test
# schema, so supply cost is proxied by 10% of retail price x quantity).
# ---------------------------------------------------------------------------

_AMOUNT_SQL = (
    f"CAST({_dsql('l_extendedprice')} * (1 - {_dsql('l_discount')}) AS DECIMAL(24,8))"
    f" - CAST({_dsql('p_retailprice')} * {_dsql('l_quantity')} * CAST(0.1 AS DECIMAL(4,2)) AS DECIMAL(24,8))"
)

_Q9_SQL = f"""
SELECT n_name AS nation, CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       {_dsum_sql(_AMOUNT_SQL, 4)} AS sum_profit
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, CAST(EXTRACT(year FROM o_orderdate) AS BIGINT)
"""


@register("rel_q9_product_profit", oracle=_Q9_SQL)
def rel_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier-nation per year with a LIKE
    pattern filter on part name.  Adaptation (documented, schema has no
    partsupp): ps_supplycost -> 0.1 * p_retailprice; the join/agg topology
    and the substring filter are the load-bearing parts."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load_table(spark, sf_dir, "supplier")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    amount = (d("l_extendedprice") * (F.lit(1) - d("l_discount"))).cast("decimal(24,8)") - (
        d("p_retailprice") * d("l_quantity") * F.lit("0.1").cast("decimal(4,2)")
    ).cast("decimal(24,8)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(dsum(amount, 4).alias("sum_profit"))
    )


# ---------------------------------------------------------------------------
# Q11-style important stock (adapted: part value from lineitem revenue in
# place of the absent partsupp cost*qty), global-threshold HAVING.
# ---------------------------------------------------------------------------

_Q11_SQL = f"""
WITH pv AS (
  SELECT l_partkey, CAST(SUM({_VOL_SQL}) AS DECIMAL(38,4)) AS value_dec
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation   ON n_nationkey = s_nationkey
  WHERE n_name = 'NATION_1'
  GROUP BY l_partkey)
SELECT l_partkey, CAST(value_dec AS DOUBLE) AS part_value
FROM pv
WHERE value_dec > (SELECT SUM(value_dec) * CAST(0.001 AS DECIMAL(4,3)) FROM pv)
"""


@register("rel_q11_important_stock", oracle=_Q11_SQL)
def rel_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: grouped value per part, kept only where it exceeds a
    fraction of the GLOBAL total (uncorrelated scalar subquery over the same
    aggregate).  The threshold compare runs entirely in exact decimals on
    both engines, so the boundary is deterministic.  Spark: 1-row total
    crossJoin-broadcast, the grouped DF computed once and reused."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = F.broadcast(load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1"))
    vol = (d("l_extendedprice") * (F.lit(1) - d("l_discount"))).cast("decimal(24,8)")
    pv = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum(vol).cast("decimal(38,4)").alias("value_dec"))
    )
    thresh = pv.agg(
        (F.sum("value_dec") * F.lit("0.001").cast("decimal(4,3)")).alias("_thresh")
    )
    return (
        pv.crossJoin(F.broadcast(thresh))
        .filter(F.col("value_dec") > F.col("_thresh"))
        .select("l_partkey", F.col("value_dec").cast("double").alias("part_value"))
    )


# ---------------------------------------------------------------------------
# Q12-style shipping modes (adapted: l_returnflag classes for the absent
# l_shipmode; "late" = shipped >30 days after order date).
# ---------------------------------------------------------------------------

_Q12_SQL = """
SELECT l_returnflag AS ship_class,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_returnflag
"""


@register("rel_q12_late_lines_by_class", oracle=_Q12_SQL)
def rel_q12_late_lines_by_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + per-group conditional counts, with a
    cross-column date predicate (ship > order + 30d) that must NOT block
    pushdown of the absolute shipdate range to the lineitem scan."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q13-style customer order-count distribution: outer join + two-level agg.
# ---------------------------------------------------------------------------

_Q13_SQL = """
WITH c_orders AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey)
SELECT c_count, COUNT(*) AS custdist
FROM c_orders
GROUP BY c_count
"""


@register("rel_q13_order_count_distribution", oracle=_Q13_SQL)
def rel_q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join with an extra join-side predicate
    (customers with zero qualifying orders must survive with count 0),
    then a histogram of the counts — agg over an agg."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# ---------------------------------------------------------------------------
# Q15-style top supplier: aggregate view + exact-decimal max-equality join.
# ---------------------------------------------------------------------------

_Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, CAST(SUM({_VOL_SQL}) AS DECIMAL(38,4)) AS total_dec
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, CAST(total_dec AS DOUBLE) AS total_revenue
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE total_dec = (SELECT MAX(total_dec) FROM revenue)
"""


@register("rel_q15_top_supplier", oracle=_Q15_SQL)
def rel_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the revenue 'view' is aggregated once, its MAX is an
    uncorrelated scalar, and the equality join back happens on the exact
    DECIMAL total (never on a double) so ties and the boundary are
    deterministic on both engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    vol = (d("l_extendedprice") * (F.lit(1) - d("l_discount"))).cast("decimal(24,8)")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(vol).cast("decimal(38,4)").alias("total_dec")
    )
    best = rev.agg(F.max("total_dec").alias("_best"))
    return (
        rev.crossJoin(F.broadcast(best))
        .filter(F.col("total_dec") == F.col("_best"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", F.col("total_dec").cast("double").alias("total_revenue"))
    )


# ---------------------------------------------------------------------------
# Q2-style best supplier per part (adapted: the part-supplier relation is
# the distinct (l_partkey, l_suppkey) pairs observed in lineitem; "best" =
# max s_acctbal among the part's EUROPE suppliers, for absent supplycost).
# ---------------------------------------------------------------------------

_Q2_SQL = """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
euro AS (
  SELECT l_partkey, l_suppkey, s_acctbal, s_name, n_name
  FROM ps
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation   ON n_nationkey = s_nationkey
  JOIN region   ON r_regionkey = n_regionkey
  WHERE r_name = 'EUROPE')
SELECT s_acctbal, s_name, n_name, p_partkey, p_name
FROM part
JOIN euro ON p_partkey = l_partkey
WHERE p_size < 10
  AND s_acctbal = (SELECT MAX(e2.s_acctbal) FROM euro e2 WHERE e2.l_partkey = p_partkey)
"""


@register("rel_q2_best_supplier", oracle=_Q2_SQL)
def rel_q2_best_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated scalar-MAX subquery per part, hand-
    decorrelated on the Spark side into a groupBy-max + equality join back
    on (part, acctbal) — the classic rewrite Catalyst would produce.  The
    oracle keeps the correlated form to prove equivalence."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE"))
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") < 10)
    ps = li.select("l_partkey", "l_suppkey").distinct()
    euro = (
        ps.join(s, ps.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .select("l_partkey", "s_acctbal", "s_name", "n_name")
    )
    best = euro.groupBy(F.col("l_partkey").alias("_bk")).agg(F.max("s_acctbal").alias("_best"))
    return (
        euro.join(best, (euro.l_partkey == F.col("_bk")) & (euro.s_acctbal == F.col("_best")))
        .join(p, F.col("l_partkey") == p.p_partkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
    )


# ---------------------------------------------------------------------------
# Q16-style supplier counts per part group (adapted: lineitem pairs stand in
# for partsupp; negative account balance stands in for complaint suppliers).
# ---------------------------------------------------------------------------

_Q16_SQL = """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM ps
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


@register("rel_q16_supplier_cnt_by_part", oracle=_Q16_SQL)
def rel_q16_supplier_cnt_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: NOT IN exclusion subquery (anti join), <>/IN-list
    filters, COUNT(DISTINCT) over a deduplicated relation."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    ps = li.select("l_partkey", "l_suppkey").distinct()
    return (
        ps.join(bad, ps.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, ps.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q21-style suppliers who kept orders waiting (adapted: "late" = shipped
# >60 days after order date, for the absent commit/receipt dates).
# ---------------------------------------------------------------------------

_Q21_SQL = """
SELECT s_name, COUNT(*) AS numwait
FROM lineitem l1
JOIN orders   ON o_orderkey = l1.l_orderkey
JOIN supplier ON s_suppkey = l1.l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
WHERE o_orderstatus = 'F'
  AND n_name = 'NATION_1'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name
"""


@register("rel_q21_waiting_suppliers", oracle=_Q21_SQL)
def rel_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: EXISTS + NOT EXISTS both correlated to the same
    fact table.  Spark side decorrelates to ONE per-order aggregate —
    (distinct suppliers, distinct LATE suppliers) — then keeps late rows in
    multi-supplier orders where l1's supplier is the only late one; the
    double self-join becomes a single extra shuffle on l_orderkey.  The
    oracle keeps the correlated form to prove equivalence."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    n = F.broadcast(load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1"))
    li = load_table(spark, sf_dir, "lineitem")
    flagged = li.join(o, li.l_orderkey == o.o_orderkey).withColumn(
        "_late", F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    per_order = flagged.groupBy(F.col("l_orderkey").alias("_ok")).agg(
        F.countDistinct("l_suppkey").alias("_n_supps"),
        F.countDistinct(F.when(F.col("_late"), F.col("l_suppkey"))).alias("_n_late"),
    )
    return (
        flagged.filter(F.col("_late"))
        .join(per_order, F.col("l_orderkey") == F.col("_ok"))
        .filter((F.col("_n_supps") > 1) & (F.col("_n_late") == 1))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


# ---------------------------------------------------------------------------
# Skew-salted join in the correctness gate: result must equal the plain
# join bit-for-bit, so the oracle is simply the unsalted SQL.
# ---------------------------------------------------------------------------

_SALTED_SQL = f"""
SELECT c_mktsegment, COUNT(*) AS n_lines, {REVENUE_SQL} AS revenue
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
GROUP BY c_mktsegment
"""


@register("skew_salted_join_revenue", oracle=_SALTED_SQL)
def skew_salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/skew.salted_join in the oracle gate: the lineitem->orders
    leg runs salted 8 ways (the hot-key decomposition for when one key
    exceeds a task even after AQE splitting); salting must be invisible in
    the result, so the oracle is the PLAIN join SQL."""
    from ..operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").withColumnRenamed("o_orderkey", "l_orderkey")
    c = load_table(spark, sf_dir, "customer")
    joined = salted_join(li, o, on="l_orderkey", n_salts=8, fact_unique_col="l_linenumber")
    return (
        joined.join(c, joined.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_lines"), revenue_expr().alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Bloom-pruned shuffle join: the explicit runtime-filter. Like salting,
# the bloom must be result-invisible, so the oracle is the plain join.
# ---------------------------------------------------------------------------

_BLOOM_SQL = f"""
SELECT o_orderpriority, COUNT(*) AS n_lines, {REVENUE_SQL} AS revenue
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
WHERE o_totalprice > 480000
GROUP BY o_orderpriority
"""


@register("rel_bloom_pruned_join", oracle=_BLOOM_SQL)
def rel_bloom_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/bloom.bloom_pruned_join in the oracle gate: lineitem joins
    only the rare high-value orders (~4%-selective dim — runtime filters
    only pay off when the dim IS selective; at the earlier 20% threshold
    the bitmap was 4.5k literal words and the probe cost more than it
    saved), and a bloom bitmap built FROM the dim keys filters lineitem
    map-side before the join's Exchange — ~96% of fact rows never enter
    the shuffle (the runtime-filter pattern for dims too big or too
    late-bound to broadcast exactly).  No false negatives, and the
    equi-join still verifies every survivor, so the oracle is the PLAIN
    join SQL.  keys_unique: o_orderkey is the orders primary key."""
    from ..operators.bloom import bloom_pruned_join

    li = load_table(spark, sf_dir, "lineitem")
    dim = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 480000)
        .select("o_orderkey", "o_orderpriority")
    )
    joined = bloom_pruned_join(li, dim, "l_orderkey", "o_orderkey", fpp=0.01, keys_unique=True)
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_lines"), revenue_expr().alias("revenue")
    )


_MEDIAN_SQL = """
WITH r AS (
  SELECT l_returnflag, l_quantity,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rn,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS cnt
  FROM lineitem)
SELECT l_returnflag,
       CAST(MAX(cnt) AS BIGINT) AS n_rows,
       SUM(l_quantity) / COUNT(*) AS median_qty
FROM r
WHERE rn = (cnt + 1) // 2 OR rn = (cnt + 2) // 2
GROUP BY l_returnflag
"""


@register("rel_median_per_group", oracle=_MEDIAN_SQL)
def rel_median_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-group median (round 5) — by explicit rank selection
    (row_number + count, average of the one or two middle values), not an
    engine-specific percentile builtin whose interpolation semantics
    differ between Spark and DuckDB.  The middle VALUES are well-defined
    under ties even though row_number isn't, so the result is
    deterministic.  The averaged pair are small integral doubles —
    exactly representable, so no decimal ladder is needed.  Scale: one
    shuffle on the group key; for high-cardinality keys the same shape
    holds (rank selection inside each partition)."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    wc = Window.partitionBy("l_returnflag")
    r = li.select(
        "l_returnflag",
        "l_quantity",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wc).alias("cnt"),
    )
    mid = r.filter(
        (F.col("rn") == F.floor((F.col("cnt") + 1) / 2))
        | (F.col("rn") == F.floor((F.col("cnt") + 2) / 2))
    )
    return mid.groupBy("l_returnflag").agg(
        F.max("cnt").alias("n_rows"),
        (F.sum("l_quantity") / F.count("*")).alias("median_qty"),
    )


_FUNNEL_SQL = """
WITH s AS (SELECT user_id, MIN(ts) AS t_s FROM events
           WHERE event_type = 'signup' GROUP BY 1),
v AS (SELECT e.user_id, MIN(e.ts) AS t_v FROM events e
      JOIN s ON s.user_id = e.user_id AND e.ts > s.t_s
      WHERE e.event_type = 'view' GROUP BY 1),
p AS (SELECT e.user_id, MIN(e.ts) AS t_p FROM events e
      JOIN v ON v.user_id = e.user_id AND e.ts > v.t_v
      WHERE e.event_type = 'purchase' GROUP BY 1)
SELECT (SELECT COUNT(*) FROM s) AS n_signup,
       (SELECT COUNT(*) FROM v) AS n_view_after_signup,
       (SELECT COUNT(*) FROM p) AS n_purchase_after_view
"""


@register("rel_events_funnel", oracle=_FUNNEL_SQL)
def rel_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis (round 5): users who signed up, then
    VIEWED strictly after their first signup, then PURCHASED strictly
    after that first qualifying view — the event-sequence pattern behind
    conversion dashboards.  Each stage is a groupBy-min plus an equijoin
    on user_id carrying the preceding stage's anchor time; with all
    stages keyed on user_id the three shuffles share one partitioning,
    and stage frames shrink monotonically.  The final counts cross-join
    three 1-row aggregates (broadcast, no data movement)."""
    ev = load_table(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_s"))
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("t_s"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_v"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_v"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_p"))
    )
    return (
        s.agg(F.count("*").alias("n_signup"))
        .crossJoin(v.agg(F.count("*").alias("n_view_after_signup")))
        .crossJoin(p.agg(F.count("*").alias("n_purchase_after_view")))
    )


_PIVOT_SQL = """
SELECT o_orderpriority,
       """ + ",\n       ".join(
    "CAST(CAST(COALESCE(SUM(CASE WHEN month(CAST(o_orderdate AS DATE)) = "
    f"{m} THEN CAST(o_totalprice AS DECIMAL(18,2)) END), 0) AS DECIMAL(38,2)) "
    f"AS DOUBLE) AS m{m:02d}"
    for m in range(1, 13)
) + """
FROM orders GROUP BY o_orderpriority
"""


@register("rel_pivot_monthly_revenue", oracle=_PIVOT_SQL)
def rel_pivot_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT (round 5): order revenue per priority spread across 12
    calendar-month columns m01..m12 — the long-to-wide reshape Spark's
    ``pivot`` relational operator does natively; the oracle rebuilds it
    as 12 conditional aggregates (a genuinely different formulation).

    The pivot VALUES are pinned explicitly (1..12): without them Spark
    runs an extra distinct-scan job to discover the pivot domain — at
    100 TB that is a full shuffle you pay before the real one.  Pinned
    values also make the output schema static, which the driver's schema
    hash needs.  Money rides the decimal ladder; absent months surface
    as exact 0, not null, on both sides."""
    orders = load_table(spark, sf_dir, "orders")
    piv = (
        orders.withColumn("month", F.month(F.to_date("o_orderdate")))
        .groupBy("o_orderpriority")
        .pivot("month", list(range(1, 13)))  # values pinned: no discovery job
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")))
    )
    return piv.select(
        "o_orderpriority",
        *[
            F.coalesce(F.col(str(m)), F.lit(0))
            .cast("decimal(38,2)")
            .cast("double")
            .alias(f"m{m:02d}")
            for m in range(1, 13)
        ],
    )


_NTILE_SQL = """
WITH t AS (
  SELECT c_custkey, c_acctbal,
         NTILE(10) OVER (ORDER BY c_acctbal, c_custkey) AS decile
  FROM customer)
SELECT CAST(decile AS INT) AS decile,
       COUNT(*) AS n_customers,
       CAST(MIN(c_acctbal) AS DOUBLE) AS min_bal,
       CAST(MAX(c_acctbal) AS DOUBLE) AS max_bal,
       CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE)
         AS total_bal
FROM t GROUP BY decile
"""


@register("rel_ntile_deciles", oracle=_NTILE_SQL)
def rel_ntile_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE bucketing (round 5): customers split into 10 equal-frequency
    account-balance deciles, then per-decile count/min/max/sum — the
    quantile-bucket assignment feature pipelines use for binning
    continuous features.  The window order carries c_custkey as a unique
    tiebreaker, so tile assignment (and hence every aggregate) is
    deterministic under any partitioning.

    Scale shape: a single unpartitioned NTILE is a total order — fine
    for dimension-sized tables like customer; for a 100 TB fact the
    binning would switch to approx_percentile cutpoints + a broadcast
    range join (the rel_percentiles_quantity pattern) rather than a
    global sort."""
    from pyspark.sql import Window

    cust = load_table(spark, sf_dir, "customer")
    # INTENTIONALLY unpartitioned: NTILE's semantics IS a total order
    # over the (dimension-sized) customer table; the WindowExec
    # no-partition warning is expected here, not a defect (r11 sweep).
    w = Window.orderBy("c_acctbal", "c_custkey")
    return (
        cust.select("c_custkey", "c_acctbal", F.ntile(10).over(w).alias("decile"))
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_customers"),
            F.min("c_acctbal").cast("double").alias("min_bal"),
            F.max("c_acctbal").cast("double").alias("max_bal"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .cast("double")
            .alias("total_bal"),
        )
    )


# Correlation via EXPLICIT decimal moments — not the engines' built-in
# corr() accumulators (Welford vs naive differ in the last bits): n, Σx,
# Σy, Σxy, Σx², Σy² ride the decimal ladder (exact, partitioning-
# independent), and both sides evaluate the same closed form on
# identical doubles.
_CORR_SQL = """
WITH m AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
         SUM(CAST(CAST(l_quantity AS DECIMAL(18,2))
                  * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS sxy,
         SUM(CAST(CAST(l_quantity AS DECIMAL(18,2))
                  * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS sxx,
         SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                  * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS syy
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag, CAST(n AS BIGINT) AS n,
       round((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
         / sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
                * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n)),
             9) AS corr_qty_price
FROM m
"""


@register("rel_corr_quantity_price", oracle=_CORR_SQL)
def rel_corr_quantity_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate surface (round 5): Pearson correlation of
    quantity vs extended price per return flag, computed from explicit
    decimal moment sums rather than the engines' corr() accumulators
    (Welford-style streaming accumulators differ across engines in the
    last bits and with partitioning; exact integer/decimal moments do
    not).  Output rounded to 9 decimals — the closed form's doubles are
    identical on both sides up to the decimal→double seam, and the
    moment shuffles are one map-side-partial agg.  The same moment-sum
    shape gives covariance, variance, and regression slopes for free."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(18,2)")
    y = F.col("l_extendedprice").cast("decimal(18,2)")
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum((x * y).cast("decimal(38,4)")).alias("sxy"),
        F.sum((x * x).cast("decimal(38,4)")).alias("sxx"),
        F.sum((y * y).cast("decimal(38,4)")).alias("syy"),
    )
    n = F.col("n")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    corr = (sxy - sx * sy / n) / F.sqrt(
        (sxx - sx * sx / n) * (syy - sy * sy / n)
    )
    return m.select(
        "l_returnflag", "n", F.round(corr, 9).alias("corr_qty_price")
    )


_STRAGG_SQL = """
SELECT o_custkey,
       COUNT(*) AS n_orders,
       string_agg(o_orderpriority, ',' ORDER BY o_orderdate, o_orderkey)
         AS priority_seq
FROM orders
WHERE o_custkey % 50 = 0
GROUP BY o_custkey
"""


@register("rel_string_agg_ordered", oracle=_STRAGG_SQL)
def rel_string_agg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (round 5): each sampled customer's
    order priorities concatenated in (date, key) order — LISTAGG/
    string_agg, the report-building aggregate SQL users reach for
    constantly.  Spark has no ordered string_agg, so the composition is
    collect_list of (sort-key, value) structs + array_sort (struct
    order = field order ⇒ the exact compound key) + transform to values
    + array_join.  The per-group lambdas run on ~dozens of elements per
    customer — bounded by group size, not corpus size; the scalar
    STRING output (never an array column) keeps the driver's hash
    canonicalizer happy."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.pmod("o_custkey", F.lit(50)) == 0
    )
    grouped = orders.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("o_orderdate").alias("d"),
                            F.col("o_orderkey").alias("k"),
                            F.col("o_orderpriority").alias("v"),
                        )
                    )
                ),
                lambda s: s["v"],
            ),
            ",",
        ).alias("priority_seq"),
    )
    return grouped


_WMEDIAN_SQL = """
WITH o AS (
  SELECT l_returnflag, CAST(l_extendedprice AS DOUBLE) AS p,
         SUM(CAST(l_quantity AS DOUBLE)) OVER (PARTITION BY l_returnflag
             ORDER BY l_extendedprice ROWS UNBOUNDED PRECEDING) AS cw,
         SUM(CAST(l_quantity AS DOUBLE)) OVER (PARTITION BY l_returnflag) AS tw
  FROM lineitem)
SELECT l_returnflag, CAST(MIN(p) AS DOUBLE) AS weighted_median
FROM o WHERE cw >= tw / 2.0
GROUP BY l_returnflag
"""


@register("rel_weighted_median_udaf", oracle=_WMEDIAN_SQL)
def rel_weighted_median_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas GROUPED-AGGREGATE UDF (round 5) — the one pandas-UDF flavor
    the engine had not yet exercised (scalar, grouped-map, mapInPandas,
    and applyInPandasWithState all have gates): quantity-weighted median
    price per return flag, an aggregate Spark has no builtin for.  Each
    group arrives as Arrow series; the kernel sorts once and takes the
    first price whose cumulative weight crosses half.

    Determinism across engines/orderings: weights are integer-valued
    doubles (sums exact < 2^53) so the half-crossing comparison is
    exact, and the selected value — MIN price whose cumulative weight
    reaches half — is invariant to permutation within equal-price ties.
    Scale: standard partial-free grouped agg; groups stream through
    Arrow batches, cost one shuffle on the group key.  For groups too
    large for one executor the percentile-cutpoint + broadcast-range
    pattern (rel_percentiles_quantity) is the fallback — documented
    trade, same answer."""
    import pandas as pd
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # explicit functionType: the module's `from __future__ import
    # annotations` stringifies hints, which defeats signature inference
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def wmedian(price, qty):
        df = pd.DataFrame({"p": price, "w": qty}).sort_values("p")
        half = df["w"].sum() / 2.0
        return float(df.loc[df["w"].cumsum() >= half, "p"].iloc[0])

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_extendedprice").cast("double").alias("price"),
        F.col("l_quantity").cast("double").alias("qty"),
    )
    return li.groupBy("l_returnflag").agg(
        wmedian("price", "qty").alias("weighted_median")
    )


_HIST_SQL = """
SELECT LEAST(CAST(FLOOR(CAST(l_extendedprice AS DOUBLE) / 5000.0) AS BIGINT), 19)
         AS bucket,
       COUNT(*) AS n_lines,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2))
            AS DOUBLE) AS price_sum
FROM lineitem
GROUP BY 1
"""


@register("rel_price_histogram", oracle=_HIST_SQL)
def rel_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width HISTOGRAM profiling (round 6): 20 fixed buckets of
    5,000 over l_extendedprice with an open top bucket — the data-
    profiling primitive behind skew detection, bucket-count sizing, and
    range-partition boundary picks.  Fixed (data-independent) bounds
    keep it one partial-agg scan — a data-driven min/max would cost an
    extra pass; when bounds must adapt, the quantile sketch family
    (sketch_quantiles_totalprice) is the scale path.  Sums route
    through DECIMAL (associativity) per the registry contract."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            F.least(
                F.floor(F.col("l_extendedprice").cast("double") / 5000.0).cast("long"),
                F.lit(19),
            ).alias("bucket"),
            "l_extendedprice",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .cast("double")
            .alias("price_sum"),
        )
    )


# -- round 6: array higher-order functions ---------------------------------

_HOF_SQL = """
SELECT l_orderkey,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       MAX(l_quantity) AS max_qty,
       COALESCE(SUM(CASE WHEN l_quantity * 2 > 50 THEN l_quantity * 2 END),
                0.0) AS big_doubled_sum
FROM lineitem
GROUP BY l_orderkey
"""


@register("rel_array_hof", oracle=_HOF_SQL)
def rel_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array HIGHER-ORDER FUNCTIONS (round 6): per-order quantity
    vectors built with collect_list, then array_sort / element_at /
    transform / filter / aggregate — the lambda-expression family that
    keeps array work JVM-side in whole-stage codegen where a naive
    implementation would round-trip through a Python UDF (SURVEY §2.3:
    the same primitives the brute-force cosine path uses on
    embeddings).  The oracle states the equivalent scalar aggregation —
    the POINT of HOFs is that the array pipeline collapses to the same
    values without leaving the JVM.

    Determinism: the collected array is order-nondeterministic under
    partitioning, so every derived value is order-insensitive (count,
    max via sorted tail, a commutative sum).  Sum operands are small
    integers in doubles (exact, associative).  Scale: one partial-agg
    groupBy; arrays bounded by lines-per-order (<= 7 in TPC-H shape).

    Null contract (ADVICE r6 hardening): ``collect_list`` DROPS null
    quantities, so the array is null-free by construction — on nullable
    data ``max_qty`` (sorted tail) and ``big_doubled_sum`` then match
    the oracle's null-ignoring MAX / CASE-guarded SUM, and ``n_items``
    counts ROWS (``count(*)`` in the same agg), not collected elements,
    matching the oracle's COUNT(*).  TPC-H l_quantity is non-null, so
    values are unchanged; the contract just no longer depends on it."""
    li = load_table(spark, sf_dir, "lineitem")
    qtys = F.array_sort(F.collect_list(F.col("l_quantity"))).alias("qtys")
    per_order = li.groupBy("l_orderkey").agg(
        qtys, F.count("*").cast("long").alias("n_items")
    )
    return per_order.select(
        "l_orderkey",
        "n_items",
        # try_element_at: an ALL-NULL group collects an EMPTY array, and
        # ANSI element_at(-1) throws on it — try_ yields NULL, matching
        # the oracle's MAX over all-null (non-empty TPC-H groups are
        # byte-identical either way)
        F.try_element_at("qtys", F.lit(-1)).alias("max_qty"),
        F.aggregate(
            F.filter(
                F.transform("qtys", lambda x: x * F.lit(2.0)),
                lambda x: x > F.lit(50.0),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("big_doubled_sum"),
    )


# -- round 6: mode (most frequent value) per group -------------------------

_MODE_SQL = """
SELECT o_orderstatus, o_orderpriority AS mode_priority, cnt AS n_mode
FROM (
  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
         ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                            ORDER BY COUNT(*) DESC, o_orderpriority) AS rn
  FROM orders GROUP BY o_orderstatus, o_orderpriority)
WHERE rn = 1
"""


@register("rel_mode_order_priority", oracle=_MODE_SQL)
def rel_mode_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MODE per group (round 6): the most frequent order priority per
    order status, ties broken lexicographically so the answer is unique
    under any partitioning.  Implemented as count-then-rank (groupBy on
    the (group, value) pair — partial-aggregatable — then a row_number
    window over the tiny per-group distinct-value set), NOT as a
    collect_list + Python mode: the shuffle carries one row per
    distinct (status, priority) pair, never the raw rows."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    counted = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("cnt")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("cnt").desc(), F.col("o_orderpriority")
    )
    return (
        counted.select(
            "o_orderstatus",
            "o_orderpriority",
            "cnt",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("cnt").alias("n_mode"),
        )
    )


# -- round 6: skyline (Pareto frontier) ------------------------------------

_SKYLINE_SQL = """
SELECT p.p_partkey, p.p_size, p.p_retailprice
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_size >= p.p_size AND q.p_retailprice <= p.p_retailprice
    AND (q.p_size > p.p_size OR q.p_retailprice < p.p_retailprice))
"""


@register("rel_skyline_parts", oracle=_SKYLINE_SQL)
def rel_skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKYLINE / Pareto frontier (round 6): parts not dominated on
    (maximize p_size, minimize p_retailprice) — the multi-criteria
    shortlist operator (cheapest-per-capability).  The oracle states
    the O(n^2) NOT EXISTS definition; the engine computes it in one
    partial-agg pass + a window over the tiny per-size summary:

      1. min price per size  (groupBy — map-side combine, domain-sized)
      2. strict prefix-min over sizes DESC (window over <= |sizes| rows)
         -> a size "survives" iff its min price undercuts every
         larger size's min price
      3. broadcast the surviving (size, min_price) set back onto the
         scan; frontier rows = price == size-min of a surviving size.

    Ties on (size, price) all survive (dominance requires strict
    inequality in one dimension) — both sides agree.  Scale: when the
    skyline attribute has no small domain, step 1-2 generalize to
    per-partition local skylines merged once (skylines compose under
    union); the domain-grouped form here IS that plan with the merge
    collapsed to a window."""
    from pyspark.sql import Window

    part = load_table(spark, sf_dir, "part")
    size_min = part.groupBy("p_size").agg(
        F.min("p_retailprice").alias("size_min")
    )
    # INTENTIONALLY unpartitioned: the strict prefix-min runs over the
    # <= |distinct sizes| per-size summary (domain-bounded, never raw
    # rows) and its semantics is a total order over sizes — the
    # WindowExec no-partition warning is expected here (r11 sweep).
    w = Window.orderBy(F.col("p_size").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    alive = size_min.select(
        "p_size", "size_min", F.min("size_min").over(w).alias("strict_min_gt")
    ).filter(
        F.col("strict_min_gt").isNull()
        | (F.col("size_min") < F.col("strict_min_gt"))
    )
    return (
        part.join(F.broadcast(alive), "p_size")
        .filter(F.col("p_retailprice") == F.col("size_min"))
        .select("p_partkey", "p_size", "p_retailprice")
    )


# -- round 6: ANALYZE-style column profile ---------------------------------

_PROFILE_SQL = """
SELECT 'o_custkey' AS column_name, COUNT(*) AS n_rows,
       COUNT(o_custkey) AS n_nonnull, COUNT(DISTINCT o_custkey) AS n_distinct,
       CAST(MIN(o_custkey) AS VARCHAR) AS min_s,
       CAST(MAX(o_custkey) AS VARCHAR) AS max_s
FROM orders
UNION ALL
SELECT 'o_orderdate', COUNT(*), COUNT(o_orderdate),
       COUNT(DISTINCT o_orderdate),
       CAST(MIN(o_orderdate) AS VARCHAR), CAST(MAX(o_orderdate) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_orderpriority', COUNT(*), COUNT(o_orderpriority),
       COUNT(DISTINCT o_orderpriority),
       MIN(o_orderpriority), MAX(o_orderpriority)
FROM orders
UNION ALL
SELECT 'o_orderstatus', COUNT(*), COUNT(o_orderstatus),
       COUNT(DISTINCT o_orderstatus),
       MIN(o_orderstatus), MAX(o_orderstatus)
FROM orders
UNION ALL
SELECT 'o_totalprice', COUNT(*), COUNT(o_totalprice),
       COUNT(DISTINCT o_totalprice),
       printf('%.2f', MIN(o_totalprice)), printf('%.2f', MAX(o_totalprice))
FROM orders
"""


@register("rel_profile_orders", oracle=_PROFILE_SQL)
def rel_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLUMN PROFILING (round 6): ANALYZE-TABLE-style statistics —
    row count, non-null count, exact distinct count, min, max — for
    five orders columns, long format (min/max serialize to strings;
    doubles via format_string('%.2f') which matches DuckDB printf
    exactly — a raw double->string cast drifts).

    Plan choice is the point: ONE agg with five COUNT(DISTINCT)s
    rewrites to a 6x-row Expand whose catch-all aggregates plan as
    SORT-based with first() wrappers (measured 2.4 s at sf0.1).  In
    COLUMNAR storage a union of five single-column legs reads the
    same total bytes — each parquet column exactly once — and every
    leg is a plain two-stage partial hash aggregate over ONE narrow
    column (0.8 s, and the gap widens with width).  The sketch family
    (HLL) is the same profile at 100 TB when exact distincts stop
    paying."""
    o = load_table(spark, sf_dir, "orders")
    n_rows = F.count("*").alias("_n_all")

    def leg(c: str, mn: F.Column, mx: F.Column) -> DataFrame:
        return o.agg(
            n_rows,
            F.count(c).alias("n_nonnull"),
            F.count_distinct(F.col(c)).alias("n_distinct"),
            mn.alias("min_s"),
            mx.alias("max_s"),
        ).select(
            F.lit(c).alias("column_name"),
            F.col("_n_all").alias("n_rows"),
            "n_nonnull",
            "n_distinct",
            "min_s",
            "max_s",
        )

    legs = [
        leg(c, F.min(c).cast("string"), F.max(c).cast("string"))
        for c in ["o_custkey", "o_orderdate", "o_orderpriority", "o_orderstatus"]
    ] + [
        leg(
            "o_totalprice",
            F.format_string("%.2f", F.min("o_totalprice")),
            F.format_string("%.2f", F.max("o_totalprice")),
        )
    ]
    out = legs[0]
    for df in legs[1:]:
        out = out.unionAll(df)
    return out


# -- round 6: cumulative distinct (first-seen rewrite) ---------------------

_CUMDIST_SQL = """
WITH first_seen AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS d FROM events GROUP BY user_id),
daily AS (
  SELECT d, COUNT(*) AS new_users FROM first_seen GROUP BY d)
SELECT CAST(d AS VARCHAR) AS day,
       new_users,
       CAST(SUM(new_users) OVER (ORDER BY d) AS BIGINT) AS cum_users
FROM daily
"""


@register("rel_cumulative_distinct_users", oracle=_CUMDIST_SQL)
def rel_cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUMULATIVE DISTINCT (round 6): distinct users ever seen, per day
    — the DAU/\"cumulative uniques\" curve.  No engine supports
    COUNT(DISTINCT) OVER a running window (state would be the full key
    set per row); the scalable rewrite is FIRST-SEEN: min(date) per
    user (partial agg over users), count firsts per day (partial agg
    over days), running sum over the tiny day spine.  Two shuffles
    whose widths are |users| then |days| — never rows x days — and the
    same rewrite incrementalizes (a new day's batch only appends users
    whose first-seen is that day)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("d")
    )
    daily = first_seen.groupBy("d").agg(F.count("*").alias("new_users"))
    # INTENTIONALLY unpartitioned: the running sum is over the DAY
    # SPINE (|days| rows after the partial aggs, calendar-bounded at
    # any corpus size) and its semantics is a total date order — the
    # WindowExec no-partition warning is expected here (r11 sweep).
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        F.col("d").cast("string").alias("day"),
        "new_users",
        F.sum("new_users").over(w).alias("cum_users"),
    )


# -- round 8: cohort retention -----------------------------------------------

_COHORT_SQL = """
WITH fs AS (SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
            FROM events GROUP BY user_id),
aw AS (SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS active_week
       FROM events),
j AS (SELECT cohort_week, active_week, COUNT(*) AS n_active
      FROM fs JOIN aw USING (user_id) GROUP BY 1, 2)
SELECT CAST(cohort_week AS VARCHAR) AS cohort_week,
       CAST(date_diff('day', cohort_week, active_week) // 7 AS BIGINT) AS week_index,
       n_active,
       MAX(CASE WHEN active_week = cohort_week THEN n_active END)
         OVER (PARTITION BY cohort_week) AS cohort_n,
       round(CAST(n_active AS DOUBLE)
             / MAX(CASE WHEN active_week = cohort_week THEN n_active END)
                 OVER (PARTITION BY cohort_week), 9) AS retention
FROM j
"""


@register("rel_events_cohort_retention", oracle=_COHORT_SQL)
def rel_events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COHORT RETENTION matrix (round 8): users grouped by first-seen
    ISO week, counted in every week they were active — the
    product-analytics staple behind every retention curve.

    Scale shape: ONE shuffle on user_id computes the whole per-user
    fact (cohort week = min-ts week AND the distinct active-week set,
    in the same hash aggregate — no self-join of events against a
    first-seen table, which would scan and shuffle the fact twice);
    exploding the bounded week set (|weeks| <= calendar span) and
    re-aggregating on (cohort, week) touches only |users| x |weeks|
    rows.  The cohort size needs no separate scan either: every user
    is by construction active in their first week, so cohort_n is the
    matrix's own diagonal, read back with a window over the final
    ~|weeks|^2-row aggregate (tiny by construction — this is the one
    place a window is free)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    wk = lambda c: F.date_trunc("week", c).cast("date")  # noqa: E731
    per_user = ev.groupBy("user_id").agg(
        wk(F.min("ts")).alias("cohort_week"),
        F.collect_set(wk(F.col("ts"))).alias("weeks"),
    )
    matrix = (
        per_user.select(
            "cohort_week", F.explode("weeks").alias("active_week")
        )
        .groupBy("cohort_week", "active_week")
        .agg(F.count("*").alias("n_active"))
    )
    diag = F.max(
        F.when(F.col("active_week") == F.col("cohort_week"), F.col("n_active"))
    ).over(Window.partitionBy("cohort_week"))
    return matrix.select(
        F.col("cohort_week").cast("string").alias("cohort_week"),
        F.expr("datediff(active_week, cohort_week) div 7")
        .cast("long")
        .alias("week_index"),
        "n_active",
        diag.alias("cohort_n"),
        F.round(F.col("n_active").cast("double") / diag, 9).alias("retention"),
    )


# -- round 8: one-pass correlation matrix ------------------------------------

_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _corr_matrix_sql() -> str:
    """One-pass moment sums (decimal ladder — the rel_corr idiom) for
    every column pair, then the closed-form Pearson per pair."""
    sums = ["COUNT(*) AS n"]
    for c in _CORR_COLS:
        sums.append(f"SUM(CAST({c} AS DECIMAL(18,2))) AS s_{c}")
    for i, a in enumerate(_CORR_COLS):
        for b in _CORR_COLS[i + 1 :]:
            sums.append(
                f"SUM(CAST(CAST({a} AS DECIMAL(18,2))"
                f" * CAST({b} AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS s_{a}_{b}"
            )
        sums.append(
            f"SUM(CAST(CAST({a} AS DECIMAL(18,2))"
            f" * CAST({a} AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS s_{a}_{a}"
        )
    pair_rows = []
    for i, a in enumerate(_CORR_COLS):
        for b in _CORR_COLS[i + 1 :]:
            corr = (
                f"(CAST(s_{a}_{b} AS DOUBLE) - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE) / n)"
                f" / sqrt((CAST(s_{a}_{a} AS DOUBLE) - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE) / n)"
                f" * (CAST(s_{b}_{b} AS DOUBLE) - CAST(s_{b} AS DOUBLE) * CAST(s_{b} AS DOUBLE) / n))"
            )
            pair_rows.append(
                f"SELECT '{a}' AS col_x, '{b}' AS col_y, CAST(n AS BIGINT) AS n,"
                f" round({corr}, 9) AS corr FROM m"
            )
    return (
        "WITH m AS (SELECT " + ", ".join(sums) + " FROM lineitem)\n"
        + "\nUNION ALL ".join(pair_rows)
    )


_CORR_MATRIX_SQL = _corr_matrix_sql()


@register("rel_corr_matrix", oracle=_CORR_MATRIX_SQL)
def rel_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full Pearson CORRELATION MATRIX over the lineitem measures in
    ONE pass (round 8): all 4 column sums, 4 squares, and 6 cross
    products ride a single map-side-partial aggregate to one moment
    row; the 6 pair rows are then pure projection.  The naive form —
    corr() once per pair — scans the fact 6 times and uses
    Welford-style accumulators whose low bits depend on partitioning;
    explicit decimal moments are exact and partitioning-independent
    (the rel_corr_quantity_price argument, generalized to the k^2
    matrix, k scans -> 1).  At 100 TB this is the difference between
    one fact pass and a pass per matrix cell."""
    li = load_table(spark, sf_dir, "lineitem")
    dec = {c: F.col(c).cast("decimal(18,2)") for c in _CORR_COLS}
    aggs = [F.count("*").alias("n")]
    for c in _CORR_COLS:
        aggs.append(F.sum(dec[c]).alias(f"s_{c}"))
    for i, a in enumerate(_CORR_COLS):
        for b in _CORR_COLS[i:]:
            aggs.append(
                F.sum((dec[a] * dec[b]).cast("decimal(38,4)")).alias(f"s_{a}_{b}")
            )
    m = li.agg(*aggs)
    n = F.col("n")
    dbl = lambda name: F.col(name).cast("double")  # noqa: E731
    # one row per pair via explode-of-structs over the single moment
    # row — NOT a union of per-pair selects, which would plant six
    # copies of the aggregate subtree (Catalyst does not dedupe common
    # subtrees across union branches) and scan the fact six times
    pair_structs = []
    for i, a in enumerate(_CORR_COLS):
        for b in _CORR_COLS[i + 1 :]:
            corr = (dbl(f"s_{a}_{b}") - dbl(f"s_{a}") * dbl(f"s_{b}") / n) / F.sqrt(
                (dbl(f"s_{a}_{a}") - dbl(f"s_{a}") * dbl(f"s_{a}") / n)
                * (dbl(f"s_{b}_{b}") - dbl(f"s_{b}") * dbl(f"s_{b}") / n)
            )
            pair_structs.append(
                F.struct(
                    F.lit(a).alias("col_x"),
                    F.lit(b).alias("col_y"),
                    n.cast("long").alias("n"),
                    F.round(corr, 9).alias("corr"),
                )
            )
    return m.select(F.explode(F.array(*pair_structs)).alias("r")).select(
        "r.col_x", "r.col_y", "r.n", "r.corr"
    )


# -- round 8: last-touch attribution -----------------------------------------

_ATTRIB_SQL = """
WITH w AS (
  SELECT event_id, user_id, event_type, ts,
         max(CASE WHEN event_type = 'click'
                  THEN struct_pack(ts := ts, id := event_id) END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lc
  FROM events)
SELECT event_id, user_id,
       lc.id AS click_id,
       epoch_us(ts) - epoch_us(lc.ts) AS gap_us
FROM w WHERE event_type = 'purchase'
"""


@register("rel_events_attribution", oracle=_ATTRIB_SQL)
def rel_events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAST-TOUCH ATTRIBUTION (round 8): every purchase attributed to
    the user's most recent preceding click — the marketing-analytics
    join behind conversion reporting, expressed as a running max of
    (ts, event_id) structs over the per-user event stream instead of a
    purchases-to-clicks range self-join (which would shuffle the fact
    twice and build an O(clicks x purchases) intermediate per user).

    One per-user window sort; the struct max carries the attributed
    click's identity THROUGH the window (no second join to recover the
    id), nulls propagate for never-clicked purchasers, and the
    (ts, event_id) key is total so the attribution is unique.  Both
    engines compare structs field-lexicographically; the gap rides
    exact integer microseconds."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    lc = F.max(
        F.when(
            F.col("event_type") == "click",
            F.struct(F.col("ts").alias("ts"), F.col("event_id").alias("id")),
        )
    ).over(w)
    return (
        ev.withColumn("lc", lc)
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.col("lc.id").alias("click_id"),
            (F.unix_micros("ts") - F.unix_micros("lc.ts")).alias("gap_us"),
        )
    )


# -- round 8: join-key skew diagnostics --------------------------------------

_SKEWPROF_SQL = """
WITH c AS (SELECT o_custkey AS key, COUNT(*) AS key_count
           FROM orders GROUP BY o_custkey),
stats AS (SELECT CAST(SUM(key_count) AS BIGINT) AS n_rows,
                 COUNT(*) AS n_keys,
                 CAST(MAX(key_count) AS BIGINT) AS max_count
          FROM c),
topk AS (SELECT key, key_count,
                ROW_NUMBER() OVER (ORDER BY key_count DESC, key) AS rk
         FROM c)
SELECT CAST(t.rk AS BIGINT) AS rk, t.key, CAST(t.key_count AS BIGINT) AS key_count,
       s.n_rows, s.n_keys, s.max_count,
       (1000 * CAST(t.key_count AS BIGINT) * s.n_keys) // s.n_rows AS skew_milli
FROM topk t, stats s
WHERE t.rk <= 5
"""


@register("skew_key_profile", oracle=_SKEWPROF_SQL)
def skew_key_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN-KEY SKEW PROFILE (round 8): the diagnostic that decides
    whether a join needs `salted_join`, AQE skew splitting, or nothing
    — per-key counts of the customer key in orders, the 5 heaviest
    keys, and each key's skew factor (its count relative to the
    uniform share, in millis: 1000 = perfectly uniform; a key at
    50,000 means one reducer gets 50x its share and the stage runs at
    the straggler's pace).

    Scale shape: the per-key count is one map-side-partial aggregate;
    the global stats reduce to ONE row (broadcast back); the heavy-key
    list is the skew-proof two-stage partial top-k — profiling a
    maximally skewed distribution must not itself hot-spot, so no
    row_number window ever sees the full key spectrum.  Integer
    outputs only."""
    orders = load_table(spark, sf_dir, "orders")
    counts = (
        orders.groupBy(F.col("o_custkey").alias("key"))
        .agg(F.count("*").alias("key_count"))
    )
    stats = counts.agg(
        F.sum("key_count").alias("n_rows"),
        F.count("*").alias("n_keys"),
        F.max("key_count").alias("max_count"),
    )
    item = F.struct((-F.col("key_count")).alias("neg_n"), F.col("key").alias("key"))
    local = (
        counts.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.slice(F.array_sort(F.collect_list(item)), 1, 5).alias("top"))
    )
    merged = local.select(F.explode("top").alias("it")).agg(
        F.slice(F.array_sort(F.collect_list("it")), 1, 5).alias("top")
    )
    topk = merged.select(F.posexplode("top").alias("pos", "it")).select(
        (F.col("pos") + 1).cast("long").alias("rk"),
        F.col("it.key").alias("key"),
        (-F.col("it.neg_n")).alias("key_count"),
    )
    return topk.crossJoin(F.broadcast(stats)).withColumn(
        "skew_milli", F.expr("(1000 * key_count * n_keys) div n_rows")
    )


# -- round 8: event-type transition matrix -----------------------------------

_TRANSITION_SQL = """
WITH nxt AS (
  SELECT event_type AS from_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS to_type
  FROM events),
c AS (SELECT from_type, to_type, COUNT(*) AS n
      FROM nxt WHERE to_type IS NOT NULL GROUP BY 1, 2)
SELECT from_type, to_type, n,
       CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT) AS n_from,
       CAST((1000 * n) // SUM(n) OVER (PARTITION BY from_type) AS BIGINT)
         AS p_milli
FROM c
"""


@register("rel_events_transition_matrix", oracle=_TRANSITION_SQL)
def rel_events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EVENT-TYPE TRANSITION MATRIX (round 8): first-order Markov
    transition counts and milli-probabilities over each user's event
    stream — the behavioural-model summary under funnel diagnosis,
    anomaly scoring ("error->error loops"), and session simulation.

    Scale shape: ONE per-user window sort produces the (from, to)
    pairs; the count is a map-side-partial aggregate whose output is
    |event_types|^2 rows (25 here) — the row normalisation window runs
    over THAT tiny matrix, never over raw events.  Integer counts and
    milli-probabilities only: no float seam."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    c = pairs.groupBy("from_type", "to_type").agg(F.count("*").alias("n"))
    wf = Window.partitionBy("from_type")
    return c.select(
        "from_type",
        "to_type",
        "n",
        F.sum("n").over(wf).alias("n_from"),
        F.expr("(1000 * n) div sum(n) over (partition by from_type)").alias(
            "p_milli"
        ),
    )


_TRANSITION2_SQL = """
WITH seq AS (
  SELECT event_type AS from_a,
         LEAD(event_type) OVER w AS from_b,
         LEAD(event_type, 2) OVER w AS to_type
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
c AS (SELECT from_a, from_b, to_type, COUNT(*) AS n
      FROM seq WHERE from_b IS NOT NULL AND to_type IS NOT NULL
      GROUP BY 1, 2, 3)
SELECT from_a, from_b, to_type, n,
       CAST(SUM(n) OVER (PARTITION BY from_a, from_b) AS BIGINT) AS n_from,
       CAST((1000 * n) // SUM(n) OVER (PARTITION BY from_a, from_b) AS BIGINT)
         AS p_milli
FROM c
"""


@register("rel_events_transition_bigram", oracle=_TRANSITION2_SQL)
def rel_events_transition_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SECOND-ORDER transition analysis (round 9 — the banked r8
    candidate b): P(next | previous TWO event types).  The first-order
    matrix answers "what follows an error?"; this one separates
    "error after error" from "error after purchase" — the state-pair
    conditioning behavioural models actually need (loop detection,
    2-step funnel leaks, Markov-order diagnostics against the
    first-order gate).

    Scale shape identical to the first-order gate: the SAME single
    per-user window sort feeds both LEAD(1) and LEAD(2) (one Exchange +
    one Sort, plan-audited), the count is a map-side partial aggregate,
    and the output is bounded by |event_types|^3 rows (125 here) — the
    normalisation window runs over that tiny cube, never raw events.
    Integer counts and milli-probabilities only: no float seam."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_a"),
        F.lead("event_type", 1).over(w).alias("from_b"),
        F.lead("event_type", 2).over(w).alias("to_type"),
    ).filter(F.col("from_b").isNotNull() & F.col("to_type").isNotNull())
    c = seq.groupBy("from_a", "from_b", "to_type").agg(F.count("*").alias("n"))
    wf = Window.partitionBy("from_a", "from_b")
    return c.select(
        "from_a",
        "from_b",
        "to_type",
        "n",
        F.sum("n").over(wf).alias("n_from"),
        F.expr(
            "(1000 * n) div sum(n) over (partition by from_a, from_b)"
        ).alias("p_milli"),
    )
