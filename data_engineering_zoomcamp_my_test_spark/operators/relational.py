"""Tier-B relational operator catalog (SURVEY.md §2.2, b1-b27).

The reference exposed this surface by forwarding arbitrary user SQL to
PostgreSQL (reference week_1/data_ingest/data_ingest.py:130); here each
operator family is a first-class Spark plan built with the DataFrame API (or
``spark.sql`` where the construct is SQL-native: correlated subqueries, CTEs),
optimized by Catalyst.

Scale notes baked into the shapes below:
- explicit ``F.broadcast`` hints are reserved for tables whose cardinality is
  structurally FIXED (region=5, nation=25 — ``sources.tables.BROADCAST_DIMS``).
  Tables that grow with scale factor (supplier, part, customer, ...) get no
  hint: the size threshold + AQE broadcast them while they fit and demote to
  shuffle joins when they don't — a forced hint cannot be demoted and turns
  into a broadcast OOM at 100x. Fact-fact joins are left to AQE (sort-merge
  w/ skew splitting);
- aggregates rely on partial aggregation (map-side combine) — automatic for
  all ``groupBy().agg()`` plans;
- monetary aggregates use exact DECIMAL accumulation (functions/exprs.py) so
  results are partition-order independent — identical answers on 1 or 1000
  executors;
- window functions always carry a total order (tie-broken on unique keys) so
  running aggregates are deterministic under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.exprs import (
    cents,
    cents_sum,
    dmoney_sum,
    dmoney_sum_grain,
    money,
    money_avg,
    ts_lit,
)
from ..lineage import cut as lineage_cut
from ..sources.tables import load_table, register_tables


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- B1: filter / predicates (TPC-H Q6 shape) -------------------------------

def b1_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= ts_lit(li, "l_shipdate", "1995-01-01"))
        & (F.col("l_shipdate") < ts_lit(li, "l_shipdate", "1996-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount")


# --- B2: projection with scalar expressions ---------------------------------

def b2_project_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_shipdate") >= ts_lit(li, "l_shipdate", "2001-01-01")
    ).select(
        "l_orderkey",
        "l_linenumber",
        (money("l_extendedprice") * (F.lit(1) - money("l_discount")))
        .cast("double")
        .alias("revenue"),
    )


# --- B3: hash aggregate (TPC-H Q1 shape) — the flagship query ---------------

def b3_groupby_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    cutoff = ts_lit(li, "l_shipdate", "2001-09-02")
    disc_price = money("l_extendedprice") * (F.lit(1) - money("l_discount"))
    # charge keeps its rate factors at DECIMAL(4,2) (rates are 2-decimal
    # values < 10, so the casts are exact): the 3-factor product then fits
    # precision 28 in every engine. Chaining from the wide disc_price would
    # exceed DECIMAL(38) and force a scale-reduction rounding that DuckDB
    # resolves differently — a 1-ulp sum divergence at the sf1 sweep.
    disc_f = (F.lit(1) - money("l_discount")).cast("decimal(4,2)")
    tax_f = (F.lit(1) + money("l_tax")).cast("decimal(4,2)")
    charge = money("l_extendedprice") * disc_f * tax_f
    return (
        li.filter(F.col("l_shipdate") <= cutoff)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dmoney_sum(money("l_quantity"), "sum_qty"),
            dmoney_sum(money("l_extendedprice"), "sum_base_price"),
            # Wide-scale sums round to the 2-decimal money grain BEFORE the
            # double cast: past ~2^53 unscaled units, engines convert
            # high-scale decimals to double differently (DuckDB divides two
            # doubles, Spark rounds the BigDecimal) — a 1-ulp divergence
            # first seen at the sf1 sweep. At scale 2 the conversion is
            # exact-integer / 100, correctly rounded everywhere.
            F.round(F.sum(disc_price), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(charge), 2).cast("double").alias("sum_charge"),
            money_avg(money("l_quantity"), "avg_qty"),
            money_avg(money("l_extendedprice"), "avg_price"),
            money_avg(money("l_discount"), "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --- B4: DISTINCT / COUNT(DISTINCT) -----------------------------------------

def b4_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n_cust"))
        .orderBy("o_orderpriority")
    )


# --- B5: approximate distinct (HLL++) — rows-only check ---------------------

def b5_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "lineitem").agg(
        # rsd=0.02: |approx-exact|/exact < 5% is asserted in tests/test_properties.py
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
    )


# --- B6: equi inner join (broadcast dim) -------------------------------------

def b6_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    return (
        orders.join(
            customer, orders.o_custkey == customer.c_custkey, "inner"
        )
        .groupBy("c_mktsegment")
        .agg(
            dmoney_sum(money("o_totalprice"), "total_rev"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("c_mktsegment")
    )


# --- B7: multi-way join (TPC-H Q5 shape) -------------------------------------

def b7_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape. The scale-dominant cost is the lineitem JOIN orders
    fact-fact SMJ (sf100: the one headline where neither side broadcasts).

    r13 join order (guide §2.3 "shuffle fewer bytes", §3.2 semi-reduction):
    the ASIA restriction is applied to BOTH fact inputs *before* the
    fact-fact join instead of after it. nation⋈region_ASIA (a fixed 5-row
    relation) broadcast-reduces supplier and customer first; lineitem is
    then inner-joined to the reduced supplier (dropping ~4/5 of lineitem
    rows and attaching s_nationkey/n_name), and orders to the reduced
    customer, so the l_orderkey/o_orderkey exchange — the largest shuffle
    in the headline set — carries only region-matching rows. The remaining
    c_nationkey = s_nationkey constraint rides the orderkey join as a
    second key. Identical result (inner joins commute; the region
    predicate is applied to the same rows either way) — hash-verified
    against the unchanged oracle at sf0.01/sf0.1.

    100 TB guidance (measured, tools/bucketed_ab.py + BASELINE.md r10): if
    the fact-fact join recurs, land both facts bucketBy+sortBy(orderkey)
    with ONE file per bucket and set
    spark.sql.legacy.bucketedTableScan.outputOrdering=true — the SMJ then
    runs with zero Exchange and zero Sort on the fact inputs (sf10: 9.61s
    -> 4.36s locally). The decl itself reads the plain parquet corpus —
    the driver's tables aren't bucketed — so it keeps the honest shuffle
    plan."""
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    supplier = _t(spark, sf_dir, "supplier")
    rev = money("l_extendedprice") * (F.lit(1) - money("l_discount"))
    # Fixed-cardinality relation (≤25 rows): nation keys in ASIA, with the
    # nation name the aggregate groups on. Explicit broadcast is safe here
    # because the cardinality is structural, not SF-dependent.
    asia_nations = nation.join(
        F.broadcast(region.filter(F.col("r_name") == "ASIA")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    # supplier/customer grow with scale factor: no explicit broadcast hint
    # (an explicit hint cannot be demoted and becomes an OOM at 100x) — the
    # size-based threshold + AQE pick broadcast while it actually fits.
    sup_asia = supplier.join(
        F.broadcast(asia_nations),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_nationkey", "n_name")
    cust_asia = customer.join(
        F.broadcast(asia_nations.select("n_nationkey")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("c_custkey", "c_nationkey")
    return (
        lineitem.join(sup_asia, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            orders.join(
                cust_asia, F.col("o_custkey") == F.col("c_custkey")
            ).select("o_orderkey", "c_nationkey"),
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(dmoney_sum_grain(rev, "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


# --- B8: left outer join ------------------------------------------------------

def b8_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        customer.join(
            orders, customer.c_custkey == orders.o_custkey, "left"
        )
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_f_orders"))
    )


# --- B9: anti join (NOT EXISTS) ----------------------------------------------

def b9_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return customer.join(
        urgent, customer.c_custkey == urgent.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


# --- B9b: semi join (EXISTS) --------------------------------------------------

def b9_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = _t(spark, sf_dir, "supplier")
    big = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)
    return supplier.join(
        big, supplier.s_suppkey == big.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")


# --- B10: range (theta) join ---------------------------------------------------

def b10_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    return (
        # part grows with scale factor: rely on AQE/size threshold, not a
        # forced hint (see b7 note).
        li.join(
            part,
            (F.col("l_partkey") == F.col("p_partkey"))
            & (F.col("l_quantity") >= F.col("p_size") - 5)
            & (F.col("l_quantity") <= F.col("p_size") + 5),
        )
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dmoney_sum(money("l_extendedprice"), "sum_price"),
        )
        .orderBy("p_brand")
    )


# --- B11: cross join -----------------------------------------------------------

def b11_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region").select("r_name")
    nation = _t(spark, sf_dir, "nation").select("n_name")
    return region.crossJoin(nation)


# --- B12: correlated scalar subquery (TPC-H Q17 shape) — SQL-native ----------

_B12_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
         AS avg_yearly
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND p_brand = 'Brand#1'
  AND l_quantity < (
    SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = p_partkey
  )
"""


def b12_subq_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir, ("lineitem", "part"))
    return spark.sql(_B12_SQL)


# --- B13: ROLLUP ----------------------------------------------------------------

def b13_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    rev = money("l_extendedprice") * (F.lit(1) - money("l_discount"))
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(dmoney_sum_grain(rev, "revenue"), F.count(F.lit(1)).alias("n"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


# --- B14: ranking window ---------------------------------------------------------

def b14_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


# --- B15: analytic window (LAG) ---------------------------------------------------

def b15_win_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag(money("o_totalprice")).over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        (money("o_totalprice") - prev).cast("double").alias("price_delta"),
    )


# --- B16: aggregate window with frame (running sum) -------------------------------

def b16_win_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    li = li.filter(F.col("l_shipdate") < ts_lit(li, "l_shipdate", "1995-07-01"))
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(money("l_extendedprice")).over(w).cast("double").alias("running_rev"),
    )


# --- B17: multi-key sort (via top-k selection so order is verified) ---------------

def b17_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "customer")
        .orderBy(
            F.col("c_acctbal").desc_nulls_last(),
            F.col("c_custkey").asc(),
        )
        .limit(50)
        .select("c_custkey", "c_name", "c_acctbal")
    )


# --- B18: top-K (TPC-H Q3-ish revenue ranking) -------------------------------------

def b18_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 orders by revenue (reference week_1 SQL ranking pattern).

    Hot path: revenue is accumulated as exact 1e-4-unit LONGs
    (``cents(price) * (100 - pct(disc))``) instead of DECIMAL(38,4) — a ~40%
    win at sf1 (BigDecimal buffers → primitive long codegen) with a
    bit-identical result. Overflow-safe at any SF because the group is one
    order (≤7 lineitem rows; headroom ~9e9 rows/group).
    """
    li = _t(spark, sf_dir, "lineitem")
    rev4 = cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))
    return (
        li.groupBy("l_orderkey")
        .agg(cents_sum(rev4, "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


# --- B19: set operations -------------------------------------------------------------

def b19_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-semantics EXCEPT/INTERSECT/UNION counts over yearly customer
    sets, as ONE pass + ONE keyed shuffle (guide §2.3/§2.4): per custkey
    the two membership bits (any 1995 order / any 1996 order) come from
    one conditional aggregate, and the three counts are conditional sums
    over the membership table — the literal subtract/intersect/union
    formulation scans orders 6x and runs 6 distinct shuffles for the
    same three numbers (result-identical by the set definitions;
    oracle-hash-verified)."""
    orders = _t(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")
    members = (
        orders.filter(yr.isin(1995, 1996))
        .groupBy("o_custkey")
        .agg(
            F.max(yr == 1995).alias("in95"),
            F.max(yr == 1996).alias("in96"),
        )
    )
    tot = members.agg(
        F.count(F.when(F.col("in95") & ~F.col("in96"), 1)).alias("ex"),
        F.count(F.when(F.col("in95") & F.col("in96"), 1)).alias("inter"),
        F.count(F.lit(1)).alias("un"),
    )
    return tot.select(
        F.explode(
            F.array(
                F.struct(F.lit("except").alias("op"), F.col("ex").alias("n")),
                F.struct(
                    F.lit("intersect").alias("op"), F.col("inter").alias("n")
                ),
                F.struct(F.lit("union").alias("op"), F.col("un").alias("n")),
            )
        ).alias("r")
    ).select("r.op", "r.n")


# --- B20: CASE WHEN --------------------------------------------------------------------

def b20_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .otherwise("large")
    )
    return (
        orders.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            dmoney_sum(money("o_totalprice"), "total"),
        )
        .orderBy("bucket")
    )


# --- B21: string functions ----------------------------------------------------------------

def b21_string_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    return customer.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").cast("int").alias("name_len"),
        F.regexp_extract("c_name", "([0-9]+)$", 1).cast("bigint").alias("name_num"),
        F.concat_ws("-", "c_mktsegment", "c_name").alias("seg_name"),
    )


# --- B22: date/time functions ----------------------------------------------------------------

def b22_date_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").cast("int").alias("o_year"),
            F.month("o_orderdate").cast("int").alias("o_month"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dmoney_sum(money("o_totalprice"), "monthly_total"),
        )
        .orderBy("o_year", "o_month")
    )


# --- B23: math functions --------------------------------------------------------------------

def b23_math_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    charge = money("l_extendedprice") * (F.lit(1) - money("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(charge, 0).cast("double").alias("charge_round"),
        F.abs(money("l_extendedprice") - F.lit(1000)).cast("double").alias("abs_diff"),
        F.floor("l_quantity").cast("bigint").alias("qty_floor"),
        F.ceil(F.col("l_quantity") / 2).cast("bigint").alias("half_ceil"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
    )


# --- B24: null handling -------------------------------------------------------------------------

def b24_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    pend = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    joined = customer.join(
        pend, customer.c_custkey == pend.o_custkey, "left"
    )
    return (
        joined.groupBy("c_custkey")
        .agg(
            F.coalesce(F.sum(money("o_totalprice")).cast("double"), F.lit(0.0)).alias(
                "p_total"
            ),
            F.nullif(F.count("o_orderkey"), F.lit(0)).alias("n_p_orders"),
        )
    )


# --- B25: CAST / type coercion -------------------------------------------------------------------

def b25_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.col("l_extendedprice").cast("decimal(12,2)").cast("double").alias("price_dec"),
        F.col("l_orderkey").cast("string").alias("key_str"),
        F.col("l_shipdate").cast("date").cast("string").alias("ship_day"),
    )


# --- B26: CTE / derived tables — SQL-native ------------------------------------------------------

_B26_SQL = """
WITH nation_rev AS (
  SELECT n.n_name AS n_name,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev,
         COUNT(*) AS n_orders
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_name
),
avg_rev AS (SELECT AVG(rev) AS a FROM nation_rev)
SELECT nr.n_name, nr.rev, nr.n_orders
FROM nation_rev nr, avg_rev
WHERE nr.rev > avg_rev.a
ORDER BY nr.rev DESC, nr.n_name
"""


def b26_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir, ("orders", "customer", "nation"))
    return spark.sql(_B26_SQL)


# --- B28: array scalar functions ----------------------------------------------------

def b28_array_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    elems = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.size("embedding").cast("int").alias("dim"),
        F.aggregate(elems, F.lit(0.0), lambda a, x: a + x).alias("el_sum"),
        F.aggregate(
            elems, F.lit(0.0), lambda a, x: F.greatest(a, F.abs(x))
        ).alias("el_max_abs"),
        F.element_at(elems, 1).alias("first_el"),
    )


# --- B33: distribution window functions ----------------------------------------------

def b33_win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.ntile(4).over(w).alias("quartile"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


# --- B27: HAVING -----------------------------------------------------------------------------------

def b27_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        customer.join(
            F.broadcast(nation),
            customer.c_nationkey == nation.n_nationkey,
        )
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_cust"))
        .filter(F.col("n_cust") > 50)
        .orderBy("n_name")
    )


# --- B39: multiset set-ops (EXCEPT ALL / INTERSECT ALL) -----------------------

def b39_setops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag semantics set ops: duplicates preserved (vs b19's set semantics).

    Computed as ONE pass + ONE keyed shuffle instead of materializing the
    EXCEPT ALL / INTERSECT ALL row streams: for a key with na copies in
    side A and nb in side B, EXCEPT ALL contributes max(na-nb, 0) rows and
    INTERSECT ALL min(na, nb) — so the counts are sums of those terms over
    the per-key conditional counts (guide §2.3/§2.4: the naive form scans
    lineitem 4x and shuffles both full row streams per set op; this form
    shuffles one partial-aggregated (key, na, nb) row per orderkey).
    Result-identical to the exceptAll/intersectAll formulation by the
    multiset definitions above (oracle-hash-verified)."""
    li = _t(spark, sf_dir, "lineitem")
    in_a = F.col("l_quantity") >= 25
    in_b = F.col("l_returnflag") == "R"
    counts = (
        li.filter(in_a | in_b)
        .groupBy("l_orderkey")
        .agg(
            F.count(F.when(in_a, 1)).alias("na"),
            F.count(F.when(in_b, 1)).alias("nb"),
        )
    )
    tot = counts.agg(
        F.coalesce(
            F.sum(F.greatest(F.col("na") - F.col("nb"), F.lit(0))), F.lit(0)
        ).alias("ea"),
        F.coalesce(F.sum(F.least("na", "nb")), F.lit(0)).alias("ia"),
    )
    return tot.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("except_all").alias("op"), F.col("ea").alias("n")
                ),
                F.struct(
                    F.lit("intersect_all").alias("op"), F.col("ia").alias("n")
                ),
            )
        ).alias("r")
    ).select("r.op", "r.n")


# --- B40: null-safe comparison (IS DISTINCT FROM) -----------------------------

def b40_null_safe_cmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS [NOT] DISTINCT FROM over a null-producing left join."""
    customer = _t(spark, sf_dir, "customer")
    pend = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    j = customer.join(pend, customer.c_custkey == pend.o_custkey, "left")
    return (
        j.select(
            "c_custkey",
            F.expr("o_orderpriority IS DISTINCT FROM '1-URGENT'").alias("not_urgent"),
            F.expr("o_orderkey IS NOT DISTINCT FROM NULL").alias("no_p_order"),
        )
        .groupBy("not_urgent", "no_p_order")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("not_urgent", "no_p_order")
    )


# --- B41: advanced string functions -------------------------------------------

def b41_string_advanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.initcap("p_name").alias("name_title"),
        F.reverse("p_name").alias("name_rev"),
        F.lpad("p_brand", 12, "*").alias("brand_pad"),
        F.translate("p_type", "AEIOU", "aeiou").alias("type_tr"),
        F.repeat(F.lit("-"), (F.col("p_size") % 5) + 1).alias("dash_bar"),
        F.instr("p_name", " ").cast("bigint").alias("space_at"),
    )


def b44_win_value_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window value functions (FIRST_VALUE / LAST_VALUE / NTH_VALUE) over
    the whole partition — the explicit ROWS UNBOUNDED..UNBOUNDED frame
    avoids the classic LAST_VALUE-with-default-frame trap (default frame
    ends at CURRENT ROW). Total order (o_orderdate, o_orderkey) keeps the
    values deterministic under any partitioning."""
    orders = _t(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    price = F.col("o_totalprice").cast("double")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.first(price).over(w).alias("first_price"),
        F.last(price).over(w).alias("last_price"),
        F.nth_value(price, 2).over(w).alias("second_price"),
    )


def b45_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG / string_agg shape): supplier
    names per nation, sorted inside the list so the result is
    deterministic. Scale note: list aggregation materializes the whole
    group per output row — use only on groups with bounded cardinality
    (dims, buckets), never on fact-sized groups; the ``slice`` cap in the
    companion test shows the bounded form."""
    supplier = _t(spark, sf_dir, "supplier")
    return (
        supplier.groupBy("s_nationkey")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_list("s_name"))).alias(
                "suppliers"
            ),
            F.count(F.lit(1)).alias("n_suppliers"),
        )
        .orderBy("s_nationkey")
    )


# --- B34-B36: classic decision-support shapes (TPC-H Q3/Q4/Q10 analogs) -------

def b34_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape: filtered 3-way join, revenue per order, top-10."""
    customer = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = _t(spark, sf_dir, "orders")
    orders = orders.filter(
        F.col("o_orderdate") < ts_lit(orders, "o_orderdate", "1997-01-01")
    )
    li = _t(spark, sf_dir, "lineitem")
    li = li.filter(F.col("l_shipdate") > ts_lit(li, "l_shipdate", "1997-01-01"))
    rev = money("l_extendedprice") * (F.lit(1) - money("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderpriority")
        .agg(dmoney_sum_grain(rev, "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


def b35_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: EXISTS semi join + count by priority."""
    orders = _t(spark, sf_dir, "orders")
    orders = orders.filter(
        (F.col("o_orderdate") >= ts_lit(orders, "o_orderdate", "1996-01-01"))
        & (F.col("o_orderdate") < ts_lit(orders, "o_orderdate", "1997-01-01"))
    )
    late = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity") >= 45
    )
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def b36_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: revenue lost to returns per customer, top-20."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    rev = money("l_extendedprice") * (F.lit(1) - money("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dmoney_sum_grain(rev, "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


def b46_q18_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape (large-volume customers): orders whose total line quantity
    exceeds 300, joined back to orders/customer — the aggregate-derived
    semi-join pattern (a HAVING subquery feeding a join). The per-order
    rollup is partial-aggregated on l_orderkey and the >300 filter prunes
    before either join; quantities accumulate in DECIMAL (exact on any
    partitioning)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dmoney_sum(money("l_quantity"), "total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "total_qty")
        .orderBy(F.col("total_qty").desc(), "o_orderkey")
        .limit(100)
    )


def b47_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape (promotion effect): conditional-aggregate ratio over a
    shipdate-bounded lineitem x part join. The month filter prunes the
    fact scan before the join (pushed to parquet), the join is keyed on
    partkey (AQE free to broadcast part while it fits), and both the
    conditional and total revenue accumulate in DECIMAL in ONE aggregate
    pass — the ratio divides two exact sums, so the answer is identical
    on any partitioning."""
    li = _t(spark, sf_dir, "lineitem")
    li = li.filter(
        (F.col("l_shipdate") >= ts_lit(li, "l_shipdate", "1996-09-01"))
        & (F.col("l_shipdate") < ts_lit(li, "l_shipdate", "1996-10-01"))
    )
    part = _t(spark, sf_dir, "part")
    rev = money("l_extendedprice") * (F.lit(1) - money("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(F.sum(promo), 2).cast("double").alias("_promo"),
            F.round(F.sum(rev), 2).cast("double").alias("_total"),
        )
        .select(
            F.round(
                F.lit(100.0) * F.col("_promo") / F.col("_total"), 6
            ).alias("promo_revenue_pct")
        )
    )


def b48_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape (discounted revenue, OR-of-ANDs): an equi join on partkey
    carrying a residual disjunction that spans BOTH tables — the classic
    optimizer stress case. The join itself stays keyed (hash/SMJ on
    l_partkey = p_partkey, never a cartesian); Catalyst keeps the
    disjunction as a post-join residual and derives the per-table
    implications it can (quantity/brand/size ranges) for pushdown.
    Revenue accumulates in DECIMAL at the money grain."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    rev = money("l_extendedprice") * (F.lit(1) - money("l_discount"))
    cond = (
        (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#20")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#22")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            dmoney_sum_grain(rev, "revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def b49_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape (volume shipping): revenue between two nations by
    direction and ship year — the same dimension table joined TWICE under
    different roles (supplier nation vs customer nation), a symmetric
    cross-table disjunction, and a 3-key rollup. Both nation joins are
    broadcast (fixed 25-row dim); the fact-side joins stay keyed under
    AQE; revenue accumulates in DECIMAL at the money grain."""
    li = _t(spark, sf_dir, "lineitem")
    li = li.filter(
        (F.col("l_shipdate") >= ts_lit(li, "l_shipdate", "1995-01-01"))
        & (F.col("l_shipdate") < ts_lit(li, "l_shipdate", "1997-01-01"))
    )
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("_sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("_cn_key"), F.col("n_name").alias("cust_nation")
    )
    rev = money("l_extendedprice") * (F.lit(1) - money("l_discount"))
    joined = (
        li.join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("_sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("_cn_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(dmoney_sum_grain(rev, "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def b50_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape (customer distribution): LEFT OUTER join with the filter
    in the ON clause (not WHERE — customers with zero qualifying orders
    must survive with count 0), then a SECOND aggregation over the first's
    result. The double-aggregation pipeline reuses the first shuffle's
    output partitioning only if keys align — they don't (custkey vs
    c_count), so the plan is scan -> keyed left join -> partial+final
    count -> re-shuffle on the tiny count domain; the second shuffle moves
    one row per customer, not per order. COUNT(o_orderkey) (not *) so
    null-extended rows count 0 in both engines."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        customer.join(
            orders, F.col("c_custkey") == F.col("o_custkey"), "left"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def b51_q22_global_cust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape (global sales opportunity): an UNCORRELATED scalar
    subquery (global average balance of in-the-black customers) gating a
    NOT EXISTS anti join, with a final rollup per nation. The scalar is a
    one-row broadcast cross join (never a shuffle); the anti join keys on
    custkey against orders pre-filtered to the urgent class, so the
    build side is a fraction of orders. Threshold arithmetic is exact
    DECIMAL sum -> DOUBLE -> divide in BOTH engines (money_avg), making
    the boundary comparison bit-identical under any partitioning."""
    customer = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    avg_bal = (
        customer.filter(F.col("c_acctbal") > 0.0)
        .agg(money_avg(money("c_acctbal"), "avg_bal"))
    )
    rich = customer.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    no_urgent = rich.join(
        urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    )
    return (
        no_urgent.groupBy(F.col("c_nationkey").alias("cntry"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dmoney_sum_grain(money("c_acctbal"), "totacctbal"),
        )
        .orderBy("cntry")
    )


def b52_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape (top supplier): aggregate a quarter's revenue per
    supplier, take the GLOBAL MAX of that aggregate, and join back on
    EQUALITY with it — the view-feeding-its-own-max pattern. The equality
    is exact because revenue stays DECIMAL at the money grain until after
    the comparison (a double round-trip could split ties differently per
    engine). The max is a one-row broadcast; the winner set (usually one
    row) is broadcast into the supplier join, so nothing re-shuffles the
    fact table after its single aggregation."""
    li = _t(spark, sf_dir, "lineitem")
    li = li.filter(
        (F.col("l_shipdate") >= ts_lit(li, "l_shipdate", "1996-01-01"))
        & (F.col("l_shipdate") < ts_lit(li, "l_shipdate", "1996-04-01"))
        # explicit, so BOTH uses of per_supp carry the same scan filters:
        # without it the supplier join infers isnotnull(l_suppkey) on the
        # probe branch only, the branches stop being canonical-equal, and
        # AQE cannot reuse the shuffle stage (the fact table would scan
        # and aggregate TWICE). The oracle applies the same predicate.
        & F.col("l_suppkey").isNotNull()
    )
    rev = money("l_extendedprice") * (F.lit(1) - money("l_discount"))
    per_supp = li.groupBy("l_suppkey").agg(
        F.round(F.sum(rev), 2).alias("_rev_dec")
    )
    mx = per_supp.agg(F.max("_rev_dec").alias("_mx"))
    top = (
        per_supp.crossJoin(F.broadcast(mx))
        .filter(F.col("_rev_dec") == F.col("_mx"))
        .select("l_suppkey", "_rev_dec")
    )
    supplier = _t(spark, sf_dir, "supplier")
    return (
        supplier.join(
            F.broadcast(top), F.col("s_suppkey") == F.col("l_suppkey")
        )
        .select(
            "s_suppkey",
            "s_name",
            F.col("_rev_dec").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


def b53_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape (national market share): a 6-table join (fact + part
    filter + order date window + customer -> nation -> region gate +
    supplier -> nation role) feeding a CONDITIONAL-aggregate ratio per
    year. Share is computed as double division of two exact
    grain-rounded DECIMAL sums — decimal/decimal division has
    engine-specific scale rules, double division is IEEE-identical.
    Both nation roles and region broadcast (fixed dims); part prunes
    first (most selective), the fact-side joins stay keyed under AQE."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    orders = _t(spark, sf_dir, "orders")
    orders = orders.filter(
        (F.col("o_orderdate") >= ts_lit(orders, "o_orderdate", "1995-01-01"))
        & (F.col("o_orderdate") < ts_lit(orders, "o_orderdate", "1997-01-01"))
    )
    customer = _t(spark, sf_dir, "customer")
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cn = nation.select(
        F.col("n_nationkey").alias("_cn_key"),
        F.col("n_regionkey").alias("_cn_region"),
    )
    sn = nation.select(
        F.col("n_nationkey").alias("_sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = money("l_extendedprice") * (F.lit(1) - money("l_discount"))
    joined = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("_cn_key"))
        .join(F.broadcast(region), F.col("_cn_region") == F.col("r_regionkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("_sn_key"))
    )
    out = joined.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        dmoney_sum_grain(
            F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0)),
            "nation_volume",
        ),
        dmoney_sum_grain(vol, "total_volume"),
    )
    return out.select(
        "o_year",
        "nation_volume",
        "total_volume",
        (F.col("nation_volume") / F.col("total_volume")).alias("mkt_share"),
    ).orderBy("o_year")


def q11_value_share(li: DataFrame, mult: float = 1.5) -> DataFrame:
    """Q11 shape (important stock): per-group aggregate kept only where it
    exceeds a SCALAR-SUBQUERY threshold derived from the same aggregate's
    global rollup. The classic fixed-fraction threshold (0.0001/SF) is
    scale-dependent, so the adapted predicate is scale-invariant: parts
    whose revenue exceeds ``mult``x the MEAN per-part revenue. The
    threshold reuses the per-part aggregate (sum of grain-rounded
    DECIMALs — exact, partition-order free), so the fact table is scanned
    and shuffled exactly once; the one-row global rollup broadcasts. All
    threshold arithmetic is IEEE double (engine-identical); ``mult`` is
    templated identically into the DuckDB twin
    (:func:`q11_value_share_oracle_sql`, param-fuzzed)."""
    rev = money("l_extendedprice") * (F.lit(1) - money("l_discount"))
    pv = li.groupBy("l_partkey").agg(F.round(F.sum(rev), 2).alias("_v_dec"))
    tot = pv.agg(
        F.sum("_v_dec").cast("double").alias("_tv"),
        F.count(F.lit(1)).alias("_np"),
    )
    return (
        pv.crossJoin(F.broadcast(tot))
        .filter(
            F.col("_v_dec").cast("double")
            > F.col("_tv") / F.col("_np") * F.lit(float(mult))
        )
        .select(
            "l_partkey", F.col("_v_dec").cast("double").alias("part_value")
        )
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


def q11_value_share_oracle_sql(mult: float = 1.5) -> str:
    """Multiplier-templated DuckDB twin of :func:`q11_value_share`; repr()
    of the float gives the same literal value in both engines."""
    return f"""
        WITH pv AS (
          SELECT l_partkey, ROUND(SUM({_REV}), 2) AS v_dec
          FROM lineitem GROUP BY l_partkey
        ),
        t AS (
          SELECT CAST(SUM(v_dec) AS DOUBLE) AS tv, COUNT(*) AS np FROM pv
        )
        SELECT l_partkey, CAST(v_dec AS DOUBLE) AS part_value
        FROM pv, t
        WHERE CAST(v_dec AS DOUBLE) > tv / np * {float(mult)!r}
        ORDER BY part_value DESC, l_partkey
    """


def b54_q11_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-parameter decl of :func:`q11_value_share` (mult=1.5)."""
    return q11_value_share(_t(spark, sf_dir, "lineitem"), mult=1.5)


# --- round 12: the six remaining classic TPC-H optimizer-stress shapes ------
# The corpus has no partsupp table and no l_shipmode/l_commitdate/
# l_receiptdate columns, so Q2/Q9/Q16/Q20 derive the part-supplier relation
# from lineitem and Q12/Q21 substitute the missing comparison columns with
# schema-available ones — the OPTIMIZER shape of each query (correlated-min
# join-back, NOT IN anti join, nested semi chains, fact self-joins) is what
# each decl preserves and stresses, not the TPC-H answer values.


def b55_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape (minimum-cost supplier): for each qualifying part, the
    supplier(s) in one region offering the MINIMUM quoted price, via a
    correlated-min subquery re-expressed as aggregate + equality
    join-back. The part-supplier "catalog" is derived from lineitem
    (MIN(l_extendedprice) per (l_partkey, l_suppkey) — MIN is
    partition-order free, so no decimal-sum machinery is needed). The
    region gate (region=5 rows -> nation=25 rows) broadcasts into the
    supplier side BEFORE the per-part min, exactly like Q2's correlated
    subquery scopes its min to regional suppliers; the per-part min is a
    second keyed aggregate over the (already small) catalog, and the
    join-back is on (partkey, exact-decimal price equality). Final order
    carries the unique (p_partkey, s_suppkey) tiebreak so the LIMIT set
    is engine-deterministic."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") >= 40)
    )
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rsupp = (
        supplier.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    # The part restriction commutes with the per-part min (the aggregate
    # is keyed on l_partkey and the final winner⋈part join is inner), so
    # it is applied to lineitem BEFORE the catalog aggregate as a
    # broadcast semi-join on the filtered part keys — the supplier join
    # and the (partkey, suppkey) aggregate then see only qualifying
    # parts' rows instead of the full table (guide §3.2).
    catalog = (
        li.join(
            F.broadcast(part.select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
            "leftsemi",
        )
        .join(rsupp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(money("l_extendedprice")).alias("_cost"))
    )
    min_cost = catalog.groupBy(F.col("l_partkey").alias("_mk")).agg(
        F.min("_cost").alias("_min_cost")
    )
    winners = catalog.join(
        min_cost,
        (F.col("l_partkey") == F.col("_mk"))
        & (F.col("_cost") == F.col("_min_cost")),
    )
    return (
        winners.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(rsupp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            "s_suppkey",
            F.col("_cost").cast("double").alias("supply_cost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey",
            "s_suppkey",
        )
        .limit(100)
    )


def b56_q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape (product-type profit): a LIKE-filtered part dimension
    pruning a 5-table join (lineitem -> part -> supplier -> nation +
    orders for the year), aggregating a profit expression that mixes
    columns from THREE tables — revenue minus a per-unit cost drawn from
    the part dimension (p_retailprice stands in for the absent
    ps_supplycost). Profit stays DECIMAL to the money grain until after
    the per-group sum (partition-order free); grouping is (nation,
    year) — tiny key domain, so the final shuffle moves almost nothing
    and all the work is the map-side partial aggregate over the pruned
    join."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")
    amount = money("l_extendedprice") * (F.lit(1) - money("l_discount")) - (
        money("p_retailprice") * money("l_quantity")
    )
    joined = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    return (
        joined.groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(dmoney_sum_grain(amount, "sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


def b57_q12_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape (shipping-mode priority classes): the fact-dimension
    join whose AGGREGATE is two conditional counts classifying the
    JOINED side's attribute (order priority) while grouping on the fact
    side's attribute (l_returnflag standing in for the absent
    l_shipmode), over a one-year window with a cross-table comparison
    (l_shipdate > o_orderdate — shipped after booking, the schema's
    stand-in for receipt>commit). The CASE classification must happen
    AFTER the join but inside the partial aggregate — no pre-aggregation
    is possible on either input, the canonical Q12 stress."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    li = li.filter(
        (F.col("l_shipdate") >= ts_lit(li, "l_shipdate", "1996-01-01"))
        & (F.col("l_shipdate") < ts_lit(li, "l_shipdate", "1997-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


def b58_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape (parts/supplier relationship): COUNT(DISTINCT supplier)
    per (brand, type, size) over the part-supplier relation (derived
    from lineitem), with NEGATED dimension filters (<>) and a NOT IN
    subquery excluding a supplier blacklist (negative account balance
    standing in for the comment-LIKE). The NOT IN compiles to a
    null-aware anti join on the tiny blacklist (broadcast); the
    distinct-count forces a two-phase aggregate (dedup shuffle on
    group+supp, then count) — the canonical Q16 stress. Descending
    count order with full key tiebreak."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34)
    )
    blacklist = _t(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0.0
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(blacklist),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


def b59_q20_semi_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape (potential part promotion): a nested SEMI-JOIN chain —
    suppliers selected because SOME (part, supplier) pair of theirs
    passes a quantity threshold derived from an aggregate, parts
    pre-filtered by name LIKE, suppliers post-filtered by nation. The
    per-pair sum replaces Q20's partsupp availability check; the
    threshold is scale-invariant (2x the global mean pair quantity,
    a one-row broadcast like b54's) so the decl has stable selectivity
    at every SF. Supplier identities flow through DISTINCT semi joins
    only — no supplier row is ever duplicated by the fact join, the
    property Q20's EXISTS nesting exists to guarantee."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%blue%"))
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").like("NATION_1%")
    )
    li = li.filter(
        (F.col("l_shipdate") >= ts_lit(li, "l_shipdate", "1996-01-01"))
        & (F.col("l_shipdate") < ts_lit(li, "l_shipdate", "1997-01-01"))
    )
    # pair_qty feeds BOTH the mean threshold and the qualifying filter;
    # unlike b54/b55 the duplicated aggregate subtrees are NOT runtime-
    # reused (the threshold side sits under the BNLJ's broadcast — the
    # executed plan showed two full lineitem scans + two pair
    # aggregates), so the shared relation is materialized once, same
    # lineage-cut policy as the Jaccard/moments engines. NOTE (ADVICE
    # r13): the cut is EAGER — merely constructing this DataFrame (e.g.
    # explain-only tooling) runs the lineitem join+aggregate job. That is
    # deliberate and repo-wide for cut relations; SPARK_GRAFT_LINEAGE_CUT
    # =off restores a lazily-composed plan when inspection needs one.
    pair_qty = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .transform(lineage_cut)
    )
    mean_qty = pair_qty.agg(
        (F.sum("_qty") / F.count(F.lit(1))).alias("_mean_qty")
    )
    qualifying = (
        pair_qty.crossJoin(F.broadcast(mean_qty))
        .filter(F.col("_qty") > F.lit(2.0) * F.col("_mean_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        supplier.join(
            qualifying, F.col("s_suppkey") == F.col("l_suppkey"), "semi"
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"), "semi")
        .select("s_suppkey", "s_name", F.col("s_acctbal").alias("acctbal"))
        .orderBy("s_name", "s_suppkey")
    )


def b60_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape (suppliers who kept orders waiting): the fact table
    joined against ITSELF twice under one grouping key — an EXISTS
    (another supplier contributed to the same order) and a NOT EXISTS
    (no OTHER supplier's line was returned), blaming the sole returning
    supplier of finalized multi-supplier orders. l_returnflag = 'R'
    stands in for the absent receipt>commit lateness predicate; the
    self-semi and self-anti joins both key on l_orderkey (the same
    shuffle partitioning, reused across all three branches under AQE),
    with the supplier-inequality as a post-join filter — the canonical
    Q21 plan. Descending count with (s_name, s_suppkey) tiebreak,
    LIMIT 100."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    supplier = _t(spark, sf_dir, "supplier")
    l1 = (
        li.filter(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"), "semi")
        .select(
            F.col("l_orderkey").alias("_ok"),
            F.col("l_suppkey").alias("_sk"),
            F.col("l_linenumber").alias("_ln"),
        )
    )
    l2 = li.select(
        F.col("l_orderkey").alias("_ok2"), F.col("l_suppkey").alias("_sk2")
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("_ok3"), F.col("l_suppkey").alias("_sk3")
    )
    blamed = l1.join(
        l2,
        (F.col("_ok") == F.col("_ok2")) & (F.col("_sk") != F.col("_sk2")),
        "semi",
    ).join(
        l3,
        (F.col("_ok") == F.col("_ok3")) & (F.col("_sk") != F.col("_sk3")),
        "anti",
    )
    return (
        blamed.join(supplier, F.col("_sk") == F.col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name", "s_suppkey")
        .limit(100)
    )


QUERIES = {
    "b1_filter_pred": b1_filter_pred,
    "b46_q18_big_orders": b46_q18_big_orders,
    "b2_project_expr": b2_project_expr,
    "b3_groupby_agg": b3_groupby_agg,
    "b4_distinct": b4_distinct,
    "b5_approx_distinct": b5_approx_distinct,
    "b6_join_inner": b6_join_inner,
    "b7_join_multiway": b7_join_multiway,
    "b8_join_left": b8_join_left,
    "b9_join_anti": b9_join_anti,
    "b9_join_semi": b9_join_semi,
    "b10_join_range": b10_join_range,
    "b11_cross": b11_cross,
    "b12_subq_scalar": b12_subq_scalar,
    "b13_rollup": b13_rollup,
    "b14_win_rank": b14_win_rank,
    "b15_win_lag": b15_win_lag,
    "b16_win_frame": b16_win_frame,
    "b17_sort": b17_sort,
    "b18_topk": b18_topk,
    "b19_setops": b19_setops,
    "b20_case": b20_case,
    "b21_string_fns": b21_string_fns,
    "b22_date_fns": b22_date_fns,
    "b23_math_fns": b23_math_fns,
    "b24_nulls": b24_nulls,
    "b25_cast": b25_cast,
    "b26_cte": b26_cte,
    "b27_having": b27_having,
    "b28_array_fns": b28_array_fns,
    "b33_win_distribution": b33_win_distribution,
    "b34_q3_shipping_priority": b34_q3_shipping_priority,
    "b35_q4_order_priority": b35_q4_order_priority,
    "b36_q10_returned_items": b36_q10_returned_items,
    "b47_q14_promo_revenue": b47_q14_promo_revenue,
    "b48_q19_disjunctive": b48_q19_disjunctive,
    "b49_q7_volume_shipping": b49_q7_volume_shipping,
    "b39_setops_all": b39_setops_all,
    "b40_null_safe_cmp": b40_null_safe_cmp,
    "b41_string_advanced": b41_string_advanced,
    "b44_win_value_fns": b44_win_value_fns,
    "b45_listagg": b45_listagg,
    "b50_q13_custdist": b50_q13_custdist,
    "b51_q22_global_cust": b51_q22_global_cust,
    "b52_q15_top_supplier": b52_q15_top_supplier,
    "b53_q8_market_share": b53_q8_market_share,
    "b54_q11_value_share": b54_q11_value_share,
    "b55_q2_min_cost_supplier": b55_q2_min_cost_supplier,
    "b56_q9_profit_by_nation_year": b56_q9_profit_by_nation_year,
    "b57_q12_priority_class": b57_q12_priority_class,
    "b58_q16_supplier_cnt": b58_q16_supplier_cnt,
    "b59_q20_semi_chain": b59_q20_semi_chain,
    "b60_q21_waiting_suppliers": b60_q21_waiting_suppliers,
}

_MONEY = "DECIMAL(18,2)"
_REV = f"CAST(l_extendedprice AS {_MONEY}) * (1 - CAST(l_discount AS {_MONEY}))"

ORACLE = {
    "b46_q18_big_orders": """
        WITH big AS (
          SELECT l_orderkey,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_qty
          FROM lineitem GROUP BY 1
          HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300
        )
        SELECT c_custkey, c_name, o_orderkey, o_orderdate, total_qty
        FROM big
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY total_qty DESC, o_orderkey LIMIT 100
    """,
    "b1_filter_pred": """
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate <  TIMESTAMP '1996-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "b2_project_expr": f"""
        SELECT l_orderkey, l_linenumber, CAST({_REV} AS DOUBLE) AS revenue
        FROM lineitem WHERE l_shipdate >= TIMESTAMP '2001-01-01'
    """,
    "b3_groupby_agg": f"""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS {_MONEY})) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS {_MONEY})) AS DOUBLE) AS sum_base_price,
               CAST(ROUND(SUM({_REV}), 2) AS DOUBLE) AS sum_disc_price,
               CAST(ROUND(SUM(CAST(l_extendedprice AS {_MONEY})
                        * CAST(1 - CAST(l_discount AS {_MONEY}) AS DECIMAL(4,2))
                        * CAST(1 + CAST(l_tax AS {_MONEY}) AS DECIMAL(4,2))), 2) AS DOUBLE) AS sum_charge,
               CAST(SUM(CAST(l_quantity AS {_MONEY})) AS DOUBLE) / COUNT(*) AS avg_qty,
               CAST(SUM(CAST(l_extendedprice AS {_MONEY})) AS DOUBLE) / COUNT(*) AS avg_price,
               CAST(SUM(CAST(l_discount AS {_MONEY})) AS DOUBLE) / COUNT(*) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "b4_distinct": """
        SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_cust
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "b6_join_inner": """
        SELECT c_mktsegment,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_rev,
               COUNT(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    "b7_join_multiway": f"""
        SELECT n_name, CAST(ROUND(SUM({_REV}), 2) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
    """,
    "b8_join_left": """
        SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_f_orders
        FROM customer LEFT JOIN (
          SELECT * FROM orders WHERE o_orderstatus = 'F'
        ) f ON c_custkey = o_custkey
        GROUP BY c_custkey, c_name
    """,
    "b9_join_anti": """
        SELECT c_custkey, c_name, c_mktsegment FROM customer c
        WHERE NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
        )
    """,
    "b9_join_semi": """
        SELECT s_suppkey, s_name FROM supplier s
        WHERE EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49
        )
    """,
    "b10_join_range": f"""
        SELECT p_brand, COUNT(*) AS n_lines,
               CAST(SUM(CAST(l_extendedprice AS {_MONEY})) AS DOUBLE) AS sum_price
        FROM lineitem JOIN part
          ON l_partkey = p_partkey
         AND l_quantity >= p_size - 5 AND l_quantity <= p_size + 5
        GROUP BY p_brand ORDER BY p_brand
    """,
    "b11_cross": "SELECT r_name, n_name FROM region CROSS JOIN nation",
    "b12_subq_scalar": _B12_SQL,
    "b13_rollup": f"""
        SELECT l_returnflag, l_linestatus,
               CAST(ROUND(SUM({_REV}), 2) AS DOUBLE) AS revenue, COUNT(*) AS n
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    "b14_win_rank": """
        SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders
        ) t WHERE rn <= 3
    """,
    "b15_win_lag": """
        SELECT o_custkey, o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) - LAG(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ) AS DOUBLE) AS price_delta
        FROM orders
    """,
    "b16_win_frame": """
        SELECT l_suppkey, l_orderkey, l_linenumber,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) OVER (
                 PARTITION BY l_suppkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS running_rev
        FROM lineitem WHERE l_shipdate < TIMESTAMP '1995-07-01'
    """,
    "b17_sort": """
        SELECT c_custkey, c_name, c_acctbal FROM customer
        ORDER BY c_acctbal DESC NULLS LAST, c_custkey ASC LIMIT 50
    """,
    "b18_topk": f"""
        SELECT l_orderkey, CAST(SUM({_REV}) AS DOUBLE) AS revenue
        FROM lineitem GROUP BY l_orderkey
        ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
    "b19_setops": """
        SELECT 'except' AS op, COUNT(*) AS n FROM (
          SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995
          EXCEPT
          SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996) t
        UNION ALL
        SELECT 'intersect', COUNT(*) FROM (
          SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995
          INTERSECT
          SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996) t
        UNION ALL
        SELECT 'union', COUNT(*) FROM (
          SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
          UNION
          SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996) t
    """,
    "b20_case": """
        SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                    WHEN o_totalprice < 150000 THEN 'medium'
                    ELSE 'large' END AS bucket,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders GROUP BY 1 ORDER BY bucket
    """,
    "b21_string_fns": """
        SELECT c_custkey,
               UPPER(c_name) AS name_upper,
               SUBSTRING(c_name, 1, 8) AS name_prefix,
               CAST(LENGTH(c_name) AS INT) AS name_len,
               CAST(regexp_extract(c_name, '([0-9]+)$', 1) AS BIGINT) AS name_num,
               concat_ws('-', c_mktsegment, c_name) AS seg_name
        FROM customer
    """,
    "b22_date_fns": """
        SELECT CAST(year(o_orderdate) AS INT) AS o_year,
               CAST(month(o_orderdate) AS INT) AS o_month,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monthly_total
        FROM orders GROUP BY 1, 2 ORDER BY o_year, o_month
    """,
    "b23_math_fns": f"""
        SELECT l_orderkey, l_linenumber,
               CAST(ROUND({_REV}, 0) AS DOUBLE) AS charge_round,
               CAST(ABS(CAST(l_extendedprice AS {_MONEY}) - 1000) AS DOUBLE) AS abs_diff,
               CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
               CAST(CEIL(l_quantity / 2) AS BIGINT) AS half_ceil,
               l_orderkey % 7 AS key_mod7
        FROM lineitem WHERE l_orderkey < 100
    """,
    "b24_nulls": """
        SELECT c_custkey,
               COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS p_total,
               NULLIF(COUNT(o_orderkey), 0) AS n_p_orders
        FROM customer LEFT JOIN (
          SELECT * FROM orders WHERE o_orderstatus = 'P'
        ) p ON c_custkey = o_custkey
        GROUP BY c_custkey
    """,
    "b25_cast": """
        SELECT l_orderkey, l_linenumber,
               CAST(l_quantity AS INT) AS qty_int,
               CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS DOUBLE) AS price_dec,
               CAST(l_orderkey AS VARCHAR) AS key_str,
               CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_day
        FROM lineitem WHERE l_orderkey < 200
    """,
    "b26_cte": _B26_SQL,
    "b28_array_fns": """
        SELECT vec_id,
               CAST(len(embedding) AS INT) AS dim,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(embedding, x -> CAST(x AS DOUBLE))),
                 (a, x) -> a + x) AS el_sum,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(embedding, x -> CAST(x AS DOUBLE))),
                 (a, x) -> greatest(a, abs(x))) AS el_max_abs,
               CAST(embedding[1] AS DOUBLE) AS first_el
        FROM embeddings
    """,
    "b33_win_distribution": """
        SELECT o_orderkey, o_orderpriority,
               percent_rank() OVER w AS pr,
               cume_dist() OVER w AS cd,
               CAST(ntile(4) OVER w AS INT) AS quartile,
               CAST(rank() OVER w AS INT) AS rnk,
               CAST(dense_rank() OVER w AS INT) AS drnk
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice, o_orderkey)
    """,
    "b27_having": """
        SELECT n_name, COUNT(*) AS n_cust
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name HAVING COUNT(*) > 50 ORDER BY n_name
    """,
    "b39_setops_all": """
        SELECT 'except_all' AS op, COUNT(*) AS n FROM (
          SELECT l_orderkey FROM lineitem WHERE l_quantity >= 25
          EXCEPT ALL
          SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R') t
        UNION ALL
        SELECT 'intersect_all', COUNT(*) FROM (
          SELECT l_orderkey FROM lineitem WHERE l_quantity >= 25
          INTERSECT ALL
          SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R') t
    """,
    "b40_null_safe_cmp": """
        SELECT not_urgent, no_p_order, COUNT(*) AS n FROM (
          SELECT c_custkey,
                 o_orderpriority IS DISTINCT FROM '1-URGENT' AS not_urgent,
                 o_orderkey IS NOT DISTINCT FROM NULL AS no_p_order
          FROM customer LEFT JOIN (
            SELECT * FROM orders WHERE o_orderstatus = 'P'
          ) p ON c_custkey = o_custkey
        ) t GROUP BY not_urgent, no_p_order ORDER BY not_urgent, no_p_order
    """,
    "b41_string_advanced": """
        SELECT p_partkey,
               array_to_string(list_transform(string_split(lower(p_name), ' '),
                 w -> concat(upper(w[1]), w[2:])), ' ') AS name_title,
               reverse(p_name) AS name_rev,
               lpad(p_brand, 12, '*') AS brand_pad,
               translate(p_type, 'AEIOU', 'aeiou') AS type_tr,
               repeat('-', (p_size % 5) + 1) AS dash_bar,
               CAST(instr(p_name, ' ') AS BIGINT) AS space_at
        FROM part
    """,
    "b44_win_value_fns": """
        SELECT o_orderkey, o_custkey,
               first_value(CAST(o_totalprice AS DOUBLE)) OVER w AS first_price,
               last_value(CAST(o_totalprice AS DOUBLE)) OVER w AS last_price,
               nth_value(CAST(o_totalprice AS DOUBLE), 2) OVER w AS second_price
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    "b45_listagg": """
        SELECT s_nationkey,
               string_agg(s_name, ',' ORDER BY s_name) AS suppliers,
               COUNT(*) AS n_suppliers
        FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey
    """,
    "b34_q3_shipping_priority": f"""
        SELECT l_orderkey, o_orderpriority, CAST(ROUND(SUM({_REV}), 2) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1997-01-01'
          AND l_shipdate > TIMESTAMP '1997-01-01'
        GROUP BY l_orderkey, o_orderpriority
        ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
    "b35_q4_order_priority": """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
          AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45
          )
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "b36_q10_returned_items": f"""
        SELECT c_custkey, c_name, n_name, CAST(ROUND(SUM({_REV}), 2) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
    "b47_q14_promo_revenue": f"""
        SELECT ROUND(
                 100.0
                 * CAST(ROUND(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV}
                                       ELSE CAST(0 AS {_MONEY}) END), 2)
                        AS DOUBLE)
                 / CAST(ROUND(SUM({_REV}), 2) AS DOUBLE),
                 6) AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-09-01'
          AND l_shipdate <  TIMESTAMP '1996-10-01'
    """,
    "b48_q19_disjunctive": f"""
        SELECT CAST(ROUND(SUM({_REV}), 2) AS DOUBLE) AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)
    """,
    "b49_q7_volume_shipping": f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INT) AS l_year,
               CAST(ROUND(SUM({_REV}), 2) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
    "b50_q13_custdist": """
        SELECT c_count, COUNT(*) AS custdist
        FROM (
          SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey
        )
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    "b51_q22_global_cust": """
        WITH t AS (
          SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                   / COUNT(*) AS avg_bal
          FROM customer WHERE c_acctbal > 0.0
        )
        SELECT c_nationkey AS cntry, COUNT(*) AS numcust,
               CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE)
                 AS totacctbal
        FROM customer, t
        WHERE c_acctbal > avg_bal
          AND NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
          )
        GROUP BY c_nationkey ORDER BY cntry
    """,
    "b52_q15_top_supplier": f"""
        WITH revenue AS (
          SELECT l_suppkey, ROUND(SUM({_REV}), 2) AS total_rev
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate <  TIMESTAMP '1996-04-01'
            AND l_suppkey IS NOT NULL
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
        FROM supplier JOIN revenue ON s_suppkey = l_suppkey
        WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
        ORDER BY s_suppkey
    """,
    "b53_q8_market_share": f"""
        WITH vols AS (
          SELECT CAST(year(o_orderdate) AS INT) AS o_year,
                 n2.n_name AS supp_nation, {_REV} AS vol
          FROM lineitem
          JOIN part     ON l_partkey = p_partkey
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n1 ON c_nationkey = n1.n_nationkey
          JOIN region   ON n1.n_regionkey = r_regionkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
          WHERE p_type = 'PROMO' AND r_name = 'ASIA'
            AND o_orderdate >= TIMESTAMP '1995-01-01'
            AND o_orderdate <  TIMESTAMP '1997-01-01'
        )
        SELECT o_year,
               CAST(ROUND(SUM(CASE WHEN supp_nation = 'NATION_3'
                                   THEN vol ELSE 0 END), 2) AS DOUBLE)
                 AS nation_volume,
               CAST(ROUND(SUM(vol), 2) AS DOUBLE) AS total_volume,
               CAST(ROUND(SUM(CASE WHEN supp_nation = 'NATION_3'
                                   THEN vol ELSE 0 END), 2) AS DOUBLE)
                 / CAST(ROUND(SUM(vol), 2) AS DOUBLE) AS mkt_share
        FROM vols GROUP BY o_year ORDER BY o_year
    """,
    "b54_q11_value_share": q11_value_share_oracle_sql(1.5),
    "b55_q2_min_cost_supplier": """
        WITH rsupp AS (
          SELECT s_suppkey, s_name, s_acctbal, n_name
          FROM supplier
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'ASIA'
        ),
        catalog AS (
          SELECT l_partkey, l_suppkey,
                 MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost
          FROM lineitem
          JOIN rsupp ON l_suppkey = s_suppkey
          GROUP BY l_partkey, l_suppkey
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, s_suppkey,
               CAST(cost AS DOUBLE) AS supply_cost
        FROM catalog
        JOIN part ON l_partkey = p_partkey
        JOIN rsupp ON l_suppkey = s_suppkey
        WHERE p_type = 'LARGE' AND p_size >= 40
          AND cost = (
            SELECT MIN(c2.cost) FROM catalog c2
            WHERE c2.l_partkey = catalog.l_partkey
          )
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, s_suppkey
        LIMIT 100
    """,
    "b56_q9_profit_by_nation_year": f"""
        SELECT n_name AS nation,
               CAST(year(o_orderdate) AS INT) AS o_year,
               CAST(ROUND(SUM(
                 {_REV}
                 - CAST(p_retailprice AS {_MONEY})
                   * CAST(l_quantity AS {_MONEY})
               ), 2) AS DOUBLE) AS sum_profit
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN orders   ON l_orderkey = o_orderkey
        WHERE p_name LIKE '%red%'
        GROUP BY n_name, o_year
        ORDER BY nation, o_year DESC
    """,
    "b57_q12_priority_class": """
        SELECT l_returnflag,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_shipdate > o_orderdate
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    "b58_q16_supplier_cnt": """
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
          AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
          AND l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0
          )
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    "b59_q20_semi_chain": """
        WITH pair_qty AS (
          SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_name LIKE '%blue%'
            AND l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate <  TIMESTAMP '1997-01-01'
          GROUP BY l_partkey, l_suppkey
        ),
        m AS (SELECT SUM(qty) / COUNT(*) AS mean_qty FROM pair_qty)
        SELECT s_suppkey, s_name, s_acctbal AS acctbal
        FROM supplier
        WHERE s_suppkey IN (
            SELECT l_suppkey FROM pair_qty, m WHERE qty > 2.0 * mean_qty
          )
          AND s_nationkey IN (
            SELECT n_nationkey FROM nation WHERE n_name LIKE 'NATION_1%'
          )
        ORDER BY s_name, s_suppkey
    """,
    "b60_q21_waiting_suppliers": """
        SELECT s_suppkey, s_name, COUNT(*) AS numwait
        FROM lineitem l1
        JOIN supplier ON l1.l_suppkey = s_suppkey
        WHERE l1.l_returnflag = 'R'
          AND EXISTS (
            SELECT 1 FROM orders
            WHERE o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
          )
          AND EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
            SELECT 1 FROM lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_returnflag = 'R'
          )
        GROUP BY s_suppkey, s_name
        ORDER BY numwait DESC, s_name, s_suppkey
        LIMIT 100
    """,
}
