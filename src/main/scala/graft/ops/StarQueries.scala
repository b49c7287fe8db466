package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.ops.Num.moneySum

/** Star-schema join/aggregate breadth over the driver's TPC-H-ish tables
  * (SURVEY.md §2.3 J2). The reference itself never joins (events arrive
  * denormalized, `producers/sales_producer.py:118-133`), but its producer
  * performs in-memory dimension lookups (J1) — these queries are that same
  * hash-join semantics expressed relationally.
  *
  * Scale posture: dimension tables (region/nation/supplier/customer) are
  * broadcast — no shuffle of the fact side for those joins; fact-fact joins
  * (orders⋈lineitem) are shuffle hash/sort-merge on the join key, which AQE
  * re-plans at runtime. Money aggregates are summed as DECIMAL(18,6): exact,
  * order-independent, and hash-identical across engines (raw double sums
  * differ in ulps with aggregation order), then surfaced as DOUBLE.
  */
object StarQueries {

  /** TPC-H Q1-shape pricing summary over lineitem — wide aggregate, no
    * join, one shuffle (partial agg → 4 groups). Averages are quotients of
    * exact operands (decimal-sum-as-double / count): never round a ratio.
    */
  def q1PricingSummary(spark: SparkSession, sfDir: String): DataFrame = {
    // spread: the single-split fixture scan serializes the 8-column
    // decimal partial aggregate (measured 1.8 → 1.1 s at sf0.1). The
    // predicate is pushed below the repartition, so only surviving rows
    // shuffle. On a production multi-split scan the partial agg is already
    // parallel and this repartition should be dropped (see Tables.spread).
    val l = Tables.spread(Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= lit("2000-12-01")))
    val discPrice = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val charge = discPrice * (lit(1.0) + col("l_tax"))
    l.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum("l_quantity").as("sum_qty"), // whole-number doubles: exact
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        moneySum(discPrice).as("sum_disc_price"),
        moneySum(charge).as("sum_charge"),
        (sum("l_quantity") / count(lit(1))).as("avg_qty"),
        (moneySum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
        (moneySum(col("l_discount")) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** TPC-H Q3-shape: top unshipped orders by revenue for one segment.
    * customer is broadcast (small dim); orders⋈lineitem shuffles on the
    * order key; top-10 runs as TakeOrderedAndProject (no global sort
    * materialization).
    */
  def q3TopUnshipped(spark: SparkSession, sfDir: String): DataFrame = {
    val cutoff = lit("1998-06-01")
    val c = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val o = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") < cutoff)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val l = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") > cutoff)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(l, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(desc("revenue"), asc("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-shape: revenue by nation within one region, customer and
    * supplier in the same nation — the full 6-table join chain. All four
    * dimension sides broadcast; only orders⋈lineitem shuffles.
    */
  def q5RegionRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val r = Tables.region(spark, sfDir).filter(col("r_name") === "ASIA")
    val n = Tables.nation(spark, sfDir)
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val c = Tables.customer(spark, sfDir).select("c_custkey", "c_nationkey")
    val s = Tables.supplier(spark, sfDir).select("s_suppkey", "s_nationkey")
    val o = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(s),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(desc("revenue"), asc("n_name"))
  }

  /** O2 + top-k (SURVEY.md §2.6): global top-10 orders by price.
    * Physically TakeOrderedAndProject — per-partition heaps, no full sort.
    */
  def topOrders(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(10)

  /** Window ranking (extension beyond the reference, SURVEY.md §2.5): top-2
    * orders per customer. Deterministic tiebreak on the key.
    */
  def windowTopPerCustomer(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    Tables.orders(spark, sfDir)
      .filter(col("o_totalprice") > 300000.0)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .orderBy("o_custkey", "rn")
  }

  /** Window lag (frames/offsets surface): day-over-day revenue delta.
    * Daily revenue is decimal-exact, so the lag delta is deterministic.
    */
  def windowDailyDelta(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.orders(spark, sfDir)
      .groupBy(to_date(col("o_orderdate")).as("date"))
      .agg(moneySum(col("o_totalprice")).as("revenue"))
    // global (unpartitioned) window — single-partition by design, safe ONLY
    // because its input is pre-aggregated to daily grain (one row per date,
    // bounded by the calendar). Never feed this raw order rows; PlanSpec
    // pins the window input to the post-aggregate exchange.
    val w = Window.orderBy("date")
    daily
      .withColumn("prev_revenue", lag("revenue", 1).over(w))
      .withColumn("delta", col("revenue") - col("prev_revenue"))
      .orderBy("date")
  }

  /** Set operations (SURVEY.md §2.7): UNION / INTERSECT / EXCEPT distinct
    * cardinalities of two customer sets, one row out. Each count is its own
    * distributed aggregate; the 1-row cross joins are free.
    */
  def setOpsCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val building = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("k"))
    val bigSpenders = Tables.orders(spark, sfDir)
      .filter(col("o_totalprice") > 200000.0)
      .select(col("o_custkey").as("k")).distinct()
    def cnt(df: DataFrame, name: String): DataFrame =
      df.agg(count(lit(1)).as(name))
    cnt(building.union(bigSpenders).distinct(), "n_union")
      .crossJoin(cnt(building.intersect(bigSpenders), "n_intersect"))
      .crossJoin(cnt(building.except(bigSpenders), "n_except"))
  }

  /** Exact distinct aggregation per group (the reference has none; needed
    * for engine breadth). count(DISTINCT) expands to a two-phase aggregate.
    */
  def distinctCounts(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy(col("o_orderpriority"))
      .agg(
        countDistinct(col("o_custkey")).as("n_cust"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")

  /** Scalar-function battery (SURVEY.md §2.8 F1-F12): date truncation /
    * extraction / formatting and string manipulation, verified value-exact
    * against the oracle.
    */
  def scalarFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .filter(col("o_orderkey") % 97 === 0)
      .select(
        col("o_orderkey"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        to_date(col("o_orderdate")).as("order_date"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        date_format(col("o_orderdate"), "yyyyMM").as("yyyymm"),
        (col("o_orderdate") + expr("INTERVAL 365 DAYS")).as("ttl_expiry"),
        upper(col("o_orderpriority")).as("prio_upper"),
        substring(col("o_orderpriority"), 1, 1).as("prio_code"),
        length(col("o_orderstatus")).as("status_len"),
        concat(lit("ORD-"), lpad(col("o_orderkey").cast("string"), 10, "0")).as("order_tag"),
        round(col("o_totalprice"), 2).as("price_rounded"))
      .orderBy("o_orderkey")

  /** Semi/anti join surface: per market segment, customers WITH at least
    * one high-value order (left_semi — existence, no fan-out) and WITHOUT
    * any order at all (left_anti). Both run as broadcast/shuffled hash
    * joins with early termination — the relational EXISTS / NOT EXISTS.
    */
  def semiAntiCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val bigOrders = Tables.orders(spark, sfDir)
      .filter(col("o_totalprice") > 150000.0)
      .select("o_custkey")
    val allOrders = Tables.orders(spark, sfDir).select("o_custkey")
    val withBig = c.join(bigOrders, col("c_custkey") === col("o_custkey"),
        "left_semi")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n_with_big_order"))
    val without = c.join(allOrders, col("c_custkey") === col("o_custkey"),
        "left_anti")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n_without_orders"))
    withBig.join(without, Seq("c_mktsegment"), "full_outer")
      .select(col("c_mktsegment"),
        coalesce(col("n_with_big_order"), lit(0L)).as("n_with_big_order"),
        coalesce(col("n_without_orders"), lit(0L)).as("n_without_orders"))
      .orderBy("c_mktsegment")
  }

  /** Left-outer join surface (right-outer is the mirror — spec-asserted
    * row-identical): per-segment customer/order stats INCLUDING customers
    * with no orders (the rows an inner join would drop). Orders are
    * pre-aggregated per custkey BEFORE the join — aggregate-before-join
    * keeps the outer join dimension×dimension sized at any scale instead
    * of fanning the fact table through the join.
    */
  def outerJoinOrderStats(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir).select("c_custkey", "c_mktsegment")
    val perCust = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(
        count(lit(1)).as("n_o"),
        sum(col("o_totalprice").cast("decimal(18,6)")).as("rev_d"))
    c.join(perCust, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("n_customers"),
        sum(coalesce(col("n_o"), lit(0L))).as("n_orders"),
        count(when(col("o_custkey").isNull, 1)).as("n_customers_no_orders"),
        sum(col("rev_d")).cast("double").as("revenue"))
      .orderBy("c_mktsegment")
  }

  /** Grouping sets: ROLLUP over (returnflag, linestatus) — subtotals and a
    * grand total in one pass (Spark expands the grouping sets before the
    * single hash aggregate; no per-level rescan).
    */
  def rollupGroupingSets(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n"),
        sum("l_quantity").as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_price"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  /** TPC-H Q14-shape promo revenue share: lineitem⋈part (part broadcast)
    * with a conditional aggregate — share is a ratio of two decimal-exact
    * sums, deterministic across engines.
    */
  def partPromoShare(spark: SparkSession, sfDir: String): DataFrame = {
    val l = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1995-09-01") &&
        col("l_shipdate") < lit("1995-10-01"))
    val p = Tables.part(spark, sfDir).select("p_partkey", "p_type")
    val discPrice = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .agg(
        moneySum(when(col("p_type").startsWith("PROMO"), discPrice)
          .otherwise(lit(0.0))).as("promo_revenue"),
        moneySum(discPrice).as("total_revenue"))
      .select(
        col("promo_revenue"),
        col("total_revenue"),
        (col("promo_revenue") * 100.0 / col("total_revenue")).as("promo_pct"))
  }

  /** The full ranking/navigation window battery over one per-customer
    * frame (SURVEY.md §2.5 extension): row_number / rank / dense_rank /
    * ntile plus percent_rank / cume_dist (exact integer-quotient doubles)
    * and lag / lead / first / last navigation. One window partitioning
    * serves every function (a single user-keyed sort-shuffle); the frame
    * for last_value is pinned to the full partition explicitly. The
    * ordering (o_totalprice DESC, o_orderkey) is total, so every output
    * is deterministic.
    */
  def windowBattery(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    val wFull = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    Tables.orders(spark, sfDir)
      .filter(col("o_orderstatus") === "F")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .withColumn("rnk", rank().over(w))
      .withColumn("drnk", dense_rank().over(w))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .withColumn("prev_price", lag("o_totalprice", 1).over(w))
      .withColumn("next_price", lead("o_totalprice", 1).over(w))
      .withColumn("top_price", first("o_totalprice").over(wFull))
      .withColumn("bottom_price", last("o_totalprice").over(wFull))
      .filter(col("rn") <= 3)
      .orderBy("o_custkey", "rn")
  }

  /** CUBE over (returnflag, linestatus): all four grouping-set levels in
    * one pass (Spark expands the sets before a single hash aggregate —
    * same plan shape as the ROLLUP sibling with the extra marginal).
    */
  def cubeCounts(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n"),
        sum("l_quantity").as("sum_qty"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  /** Correlated SCALAR subqueries through the `spark.sql` surface (EP3):
    * orders priced above 1.5× their customer's average, counted per
    * priority. Exercises Catalyst's RewriteCorrelatedScalarSubquery —
    * each per-row subquery becomes one customer-keyed aggregate joined
    * back, never a per-row re-scan. The predicate is cross-multiplied
    * into exact DECIMAL arithmetic (price·count > sum·1.5) so the
    * comparison is engine-identical with no double division.
    */
  /** One ANSI string, executed verbatim by BOTH engines (Spark runs it,
    * the oracle map reuses it) — parity holds by construction.
    */
  val scalarSubqueryBigOrdersSql: String =
    """SELECT o_orderpriority, count(*) AS n_big
      |FROM orders o
      |WHERE CAST(o_totalprice AS DECIMAL(18,6)) *
      |      (SELECT count(*) FROM orders o2
      |       WHERE o2.o_custkey = o.o_custkey)
      |    > (SELECT sum(CAST(o_totalprice AS DECIMAL(18,6))) FROM orders o2
      |       WHERE o2.o_custkey = o.o_custkey) * 1.5
      |GROUP BY 1 ORDER BY 1""".stripMargin

  def scalarSubqueryBigOrders(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.registerAll(spark, sfDir)
    spark.sql(scalarSubqueryBigOrdersSql)
  }

  /** TPC-H Q4-shaped correlated EXISTS: orders with any line item shipped
    * more than 90 days after the order date, counted per priority. The
    * EXISTS is a left-semi hash join on orderkey (what Catalyst's
    * RewritePredicateSubquery produces for the SQL form) with the
    * non-equi lateness predicate evaluated inside the join — the fact
    * tables each shuffle once on the key; no pair enumeration, no
    * per-order subquery re-scan.
    */
  def existsLateShipPriority(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val l = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_shipdate")
    o.join(l,
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
  }

  /** TPC-H Q10-shape: top-20 customers by revenue from returned items in
    * one quarter. The date filter prunes orders at the scan; lineitem is
    * pre-filtered to returnflag='R' before the join; customer and nation
    * broadcast, so only orders⋈lineitem shuffles (on the order key) and
    * the top-20 runs as TakeOrderedAndProject.
    */
  def q10ReturnedItems(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1996-04-01"))
      .select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(spark, sfDir)
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val c = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
    val n = Tables.nation(spark, sfDir).select("n_nationkey", "n_name")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
      .orderBy(desc("revenue"), asc("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q19-shape: revenue under an OR-of-ANDs predicate spanning both
    * join sides (brand/size on part, quantity on lineitem). The textbook
    * optimization is done explicitly: each table gets the predicate's
    * per-table projection pushed to its scan (the brand/size disjunction
    * prunes part to a handful of rows → broadcast; the quantity envelope
    * [1,30] prunes lineitem), and the full cross-table disjunction is
    * evaluated once after the join.
    */
  def q19OrPredicateRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val armP = Seq(
      (col("p_brand") === "Brand#12") && col("p_size").between(1, 5),
      (col("p_brand") === "Brand#23") && col("p_size").between(1, 10),
      (col("p_brand") === "Brand#3") && col("p_size").between(1, 15))
    val armQ = Seq(
      col("l_quantity").between(1, 11),
      col("l_quantity").between(10, 20),
      col("l_quantity").between(20, 30))
    val p = Tables.part(spark, sfDir)
      .select("p_partkey", "p_brand", "p_size")
      .filter(armP.reduce(_ || _))
    val l = Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      .filter(col("l_quantity").between(1, 30))
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(armP.zip(armQ).map { case (bp, bq) => bp && bq }.reduce(_ || _))
      .agg(count(lit(1)).as("n_lines"),
        moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
  }

  /** TPC-H Q21-shape: suppliers who were the SOLE late shipper in
    * multi-supplier orders. The classic form is a correlated EXISTS plus
    * NOT EXISTS on the same fact table (two extra fact-fact joins); here
    * everything collapses into ONE order-keyed aggregate — n_suppliers ≥ 2
    * replaces the EXISTS, n_late_suppliers = 1 the NOT EXISTS, and a
    * conditional max recovers the sole late supplier (well-defined exactly
    * when n_late = 1) — so lineitem is scanned once and shuffled once. The
    * oracle keeps the EXISTS formulation, making the hash check an
    * independent equivalence proof of the rewrite.
    */
  def q21WaitingSuppliers(spark: SparkSession, sfDir: String): DataFrame = {
    // two-level aggregate instead of two countDistincts: the distinct
    // aggregation would Expand every joined row 2x before the shuffle;
    // collapsing to (order, supplier) pairs first shuffles each row once
    // and the second aggregate runs over the far smaller pair frame
    val perPair = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(Tables.orders(spark, sfDir).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey", "l_suppkey")
      .agg(max(when(
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        lit(1)).otherwise(lit(0))).as("is_late"))
    val perOrder = perPair
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_supp"),
        sum(col("is_late")).cast("long").as("n_late"),
        max(when(col("is_late") === 1, col("l_suppkey")))
          .as("sole_late_supp"))
    perOrder
      .filter(col("n_supp") >= 2 && col("n_late") === 1)
      .join(broadcast(Tables.supplier(spark, sfDir)
        .select("s_suppkey", "s_name")),
        col("sole_late_supp") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(desc("numwait"), asc("s_name"))
      .limit(20)
  }

  /** TPC-H Q7-shape: bilateral shipping volume between two customer/
    * supplier nations by ship year. Both nation-tagged key maps
    * (customer→nation, supplier→nation) are filtered to the two nations
    * BEFORE the fact join and broadcast, so the only shuffle is
    * orders⋈lineitem on the order key; the cross-nation disjunction
    * runs post-join on the two tiny dictionary columns.
    */
  def q7NationVolume(spark: SparkSession, sfDir: String,
                     nationA: String = "NATION_2",
                     nationB: String = "NATION_7"): DataFrame = {
    val n = Tables.nation(spark, sfDir).select("n_nationkey", "n_name")
      .filter(col("n_name").isin(nationA, nationB))
    val custNation = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_nationkey")
      .join(n, col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val suppNation = Tables.supplier(spark, sfDir)
      .select("s_suppkey", "s_nationkey")
      .join(n, col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_suppkey", "l_shipdate",
        "l_extendedprice", "l_discount")
      .join(Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(custNation), col("o_custkey") === col("c_custkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .filter((col("cust_nation") === nationA && col("supp_nation") === nationB) ||
        (col("cust_nation") === nationB && col("supp_nation") === nationA))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("volume"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** TPC-H Q8-shape: one supplier nation's market share of a region's
    * customer market by order year. Share = conditional exact decimal sum /
    * total exact decimal sum — a deterministic double quotient of exact
    * operands (never a rounded ratio), computed in ONE aggregate pass
    * rather than a join of two aggregations. Customer keys are pre-filtered
    * to the region and broadcast; supplier carries its nation tag broadcast
    * too, so again only the fact-fact join shuffles.
    */
  def q8MarketShare(spark: SparkSession, sfDir: String,
                    regionName: String = "AFRICA",
                    nationName: String = "NATION_2"): DataFrame = {
    val regionCust = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_nationkey")
      .join(Tables.nation(spark, sfDir), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sfDir).filter(col("r_name") === regionName),
        col("n_regionkey") === col("r_regionkey"))
      .select("c_custkey")
    val suppNation = Tables.supplier(spark, sfDir)
      .select("s_suppkey", "s_nationkey")
      .join(Tables.nation(spark, sfDir).select(
        col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation")),
        col("s_nationkey") === col("sn_key"))
      .select("s_suppkey", "supp_nation")
    val volume = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(Tables.orders(spark, sfDir)
        .select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(regionCust), col("o_custkey") === col("c_custkey"),
        "left_semi")
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        moneySum(when(col("supp_nation") === nationName, volume)
          .otherwise(lit(0.0))).as("nation_volume"),
        moneySum(volume).as("total_volume"))
      .withColumn("mkt_share", col("nation_volume") / col("total_volume"))
      .orderBy("o_year")
  }

  /** TPC-H Q13-shape (custdist): the distribution of per-customer order
    * counts, with a predicate INSIDE the outer-join condition (orders that
    * are not urgent still leave order-less customers with count 0 — a WHERE
    * would wrongly drop them). Two shuffles: customer⋈orders on custkey
    * (AQE may broadcast customer at small sf), then the tiny histogram
    * re-aggregation on c_count.
    */
  def q13CustDist(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir).select("c_custkey")
    val o = Tables.orders(spark, sfDir).select("o_custkey", "o_orderkey",
      "o_orderpriority")
    c.join(o, col("c_custkey") === col("o_custkey") &&
        col("o_orderpriority") =!= "1-URGENT", "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))
  }

  /** TPC-H Q17-shape: revenue lost to small-quantity orders of one brand.
    * The textbook correlated subquery (`l_quantity < 0.2 * avg per part`)
    * is decorrelated into a per-part aggregate joined back to the fact —
    * Catalyst does the same rewrite for the SQL form. Parity discipline:
    * the threshold compare uses only exact operands (decimal quantity sum,
    * row count) with an explicit association order both engines evaluate
    * identically — never a floating avg whose accumulation order differs.
    * part is filtered to one brand and broadcast; lineitem aggregates
    * per-partkey (one shuffle) and joins back to itself semi-broadcast
    * via the brand filter.
    */
  def q17SmallQuantityRevenue(spark: SparkSession, sfDir: String,
                              brand: String = "Brand#12"): DataFrame = {
    val p = Tables.part(spark, sfDir)
      .filter(col("p_brand") === brand).select("p_partkey")
    val l = Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_quantity", "l_extendedprice")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
    val perPart = l.groupBy(col("l_partkey").as("agg_partkey"))
      .agg(sum(col("l_quantity").cast(DecimalType(18, 6))).as("sum_qty"),
        count(lit(1)).as("cnt_qty"))
    l.join(broadcast(perPart), col("l_partkey") === col("agg_partkey"))
      .filter(col("l_quantity").cast(DecimalType(18, 6)) * lit(5) * col("cnt_qty")
        < col("sum_qty"))
      .agg((moneySum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"),
        count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q22-shape: well-funded customers with no RECENT orders (every
    * fixture customer has ordered at least once, so the textbook "never
    * ordered" would be vacuous — the shape is preserved against a
    * date-filtered orders side). The global "average positive balance"
    * scalar lands as a one-row broadcast cross join (what Catalyst builds
    * for an uncorrelated scalar subquery); the NOT EXISTS is a left-anti
    * hash join on custkey — orders is date-pruned at the scan and
    * projected to the single join column, so the anti join's build side
    * is as small as it can be. The threshold itself is the deterministic
    * double quotient of an exact decimal sum and a count.
    */
  def q22IdleRichCustomers(spark: SparkSession, sfDir: String,
                           since: String = "1999-01-01"): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val threshold = c.filter(col("c_acctbal") > 0.0)
      .agg((moneySum(col("c_acctbal")) / count(lit(1))).as("avg_bal"))
    c.join(Tables.orders(spark, sfDir)
        .filter(col("o_orderdate") >= lit(since)).select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .crossJoin(broadcast(threshold))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(broadcast(Tables.nation(spark, sfDir)
        .select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("numcust"),
        moneySum(col("c_acctbal")).as("totacctbal"))
      .orderBy("n_name")
  }

  /** TPC-H Q6-shape: forecast revenue change — a pure scan-side query.
    * All three predicates push into the parquet scan (footer min/max
    * skipping at scale), the projection reads 4 columns of 11, and the
    * whole plan is one codegen span: scan → filter → partial agg →
    * single-row final agg. The baseline every storage layout decision
    * ([[graft.storage.Storage]] sort keys / z-order) is judged against.
    */
  def q6ForecastRevenue(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(moneySum(col("l_extendedprice") * col("l_discount"))
        .as("revenue"),
        count(lit(1)).as("n_lines"))

  /** TPC-H Q15-shape: the top supplier(s) by one quarter's revenue. The
    * classic form is a view + scalar `max` subquery over it; here the
    * per-supplier revenue aggregates once (one shuffle on the supplier
    * key), its global max lands as a one-row broadcast, and the equality
    * filter is exact because revenue is the decimal-exact money sum —
    * double equality on identically-derived values, deterministic in both
    * engines. supplier broadcasts for the final name lookup.
    */
  def q15TopSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val rev = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1996-04-01"))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("total_revenue"))
    rev.crossJoin(broadcast(rev.agg(max("total_revenue").as("m"))))
      .filter(col("total_revenue") === col("m"))
      .join(broadcast(Tables.supplier(spark, sfDir)
        .select("s_suppkey", "s_name")),
        col("supplier_no") === col("s_suppkey"))
      .select("s_suppkey", "s_name", "total_revenue")
      .orderBy("s_suppkey")
  }

  /** TPC-H Q18-shape: large-volume orders (per-order quantity above a
    * threshold) with their customers. The classic IN-subquery on an
    * aggregated lineitem decorrelates to a single per-order aggregate
    * (one shuffle on the order key) whose HAVING filter runs BEFORE the
    * joins — at 100 TB the threshold passes a few thousand orders, so the
    * orders join probes a tiny broadcast side instead of re-scanning
    * lineitem as the textbook's second join does. Quantities are
    * whole-number doubles, so their sum is exact and hash-stable. The
    * LIMIT carries a full tie-break (o_orderkey is unique) so top-100 is
    * deterministic in both engines.
    */
  def q18LargeVolume(spark: SparkSession, sfDir: String,
                     minQty: Double = 250.0): DataFrame = {
    val big = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_quantity")
      .groupBy(col("l_orderkey").as("big_okey"))
      .agg(sum("l_quantity").as("sum_qty"))
      .filter(col("sum_qty") > minQty)
    Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .join(broadcast(big), col("o_orderkey") === col("big_okey"))
      .join(broadcast(Tables.customer(spark, sfDir)
        .select("c_custkey", "c_name")),
        col("o_custkey") === col("c_custkey"))
      .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
        "o_totalprice", "sum_qty")
      .orderBy(desc("o_totalprice"), asc("o_orderdate"), asc("o_orderkey"))
      .limit(100)
  }

  /** TPC-H Q9-shape: profit by supplier nation and order year for one
    * part-name family. The reference corpus has no partsupp table, so
    * supply cost is modeled as 60% of the part's retail price — the PLAN
    * shape (fact ⋈ filtered part ⋈ supplier→nation ⋈ orders, grouped by
    * nation × year) is the point, and it matches Q9's exactly: both
    * dimension sides broadcast after their filters, so the only shuffle
    * is lineitem⋈orders on the order key plus the final small aggregate.
    * Profit sums as DECIMAL(18,6) (exact, order-independent).
    */
  def q9ProductProfit(spark: SparkSession, sfDir: String,
                      nameWord: String = "gear"): DataFrame = {
    val p = Tables.part(spark, sfDir)
      .filter(col("p_name").contains(nameWord))
      .select("p_partkey", "p_retailprice")
    val sn = Tables.supplier(spark, sfDir)
      .select("s_suppkey", "s_nationkey")
      .join(Tables.nation(spark, sfDir).select("n_nationkey", "n_name"),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "n_name")
    val profit = col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
      lit(0.6) * col("p_retailprice") * col("l_quantity")
    Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount", "l_quantity")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(spark, sfDir).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).as("o_year"))
      .agg(moneySum(profit).as("sum_profit"))
      .orderBy(asc("nation"), desc("o_year"))
  }

  /** TPC-H Q11-shape: parts carrying an outsized share of one nation's
    * shipped value — a grouped aggregate HAVING-compared against a scalar
    * fraction of the GLOBAL total (the only TPC-H query whose threshold is
    * itself an aggregate over the same frame). Without partsupp, value is
    * shipped revenue from that nation's suppliers. The per-part aggregate
    * computes once, its global total re-aggregates from the per-part frame
    * (tiny — never a second fact scan) and lands as a one-row broadcast.
    * Threshold compare multiplies the exact decimal-sum doubles — both
    * engines evaluate `value > fraction * total` on identical operands.
    */
  def q11ImportantParts(spark: SparkSession, sfDir: String,
                        nationName: String = "NATION_3",
                        fraction: Double = 0.002): DataFrame = {
    val supps = Tables.supplier(spark, sfDir)
      .select("s_suppkey", "s_nationkey")
      .join(broadcast(Tables.nation(spark, sfDir)
        .filter(col("n_name") === nationName).select("n_nationkey")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey")
    val perPart = Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(broadcast(supps), col("l_suppkey") === col("s_suppkey"),
        "left_semi")
      .groupBy("l_partkey")
      .agg(moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("value"))
    perPart
      .crossJoin(broadcast(perPart.agg(moneySum(col("value")).as("total"))))
      .filter(col("value") > lit(fraction) * col("total"))
      .select("l_partkey", "value")
      .orderBy(desc("value"), asc("l_partkey"))
  }

  /** TPC-H Q12-shape: shipping-lag service classes × order priority. The
    * corpus lineitem has no shipmode/commitdate, so the Q12 "mode" becomes
    * a derived ship-lag bucket (days between order and ship date) — the
    * aggregation shape is Q12's verbatim: conditional sums splitting
    * high-priority from low-priority lines per class. One fact-fact join
    * (lineitem is date-pruned at the scan first), one 3-row aggregate.
    */
  def q12ShipLagPriority(spark: SparkSession, sfDir: String): DataFrame = {
    val highPrio = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    val lag = datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1998-01-01"))
      .select("l_orderkey", "l_shipdate")
      .join(Tables.orders(spark, sfDir)
        .select("o_orderkey", "o_orderdate", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(when(lag <= 30, "FAST").when(lag <= 90, "NORMAL")
        .otherwise("SLOW").as("ship_bucket"))
      .agg(
        sum(when(highPrio, lit(1)).otherwise(lit(0))).cast("long")
          .as("high_line_count"),
        sum(when(highPrio, lit(0)).otherwise(lit(1))).cast("long")
          .as("low_line_count"))
      .orderBy("ship_bucket")
  }

  /** TPC-H Q16-shape: how many distinct suppliers ship each surviving
    * (brand, type, size) part family, excluding one brand, one type, a
    * size whitelist, and "complaint" suppliers (NOT IN → left-anti against
    * a tiny broadcast). The supplier relation is derived from lineitem
    * (the corpus has no partsupp). Single-distinct aggregate: Spark plans
    * count(DISTINCT l_suppkey) as a two-level aggregate — (group, supp)
    * pairs first, then count — no Expand, one fact shuffle.
    */
  def q16SupplierCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val p = Tables.part(spark, sfDir)
      .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 5, 9, 17, 25, 33, 41, 49))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    val complaints = Tables.supplier(spark, sfDir)
      .filter(col("s_name").endsWith("7")).select("s_suppkey")
    Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_suppkey")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(complaints), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(desc("supplier_cnt"), asc("p_brand"), asc("p_type"),
        asc("p_size"))
  }

  /** TPC-H Q2-shape: the cheapest supplier per part within one region.
    * The textbook correlated `= (SELECT min(ps_supplycost) …)` subquery
    * decorrelates into a per-part min aggregate joined back on equality —
    * the same rewrite Catalyst performs for the SQL form. Supply cost is
    * derived from lineitem (min observed unit price per part/supplier;
    * the corpus has no partsupp): a row-local double division, so the
    * min-equality compares bit-identical values in both engines. Region
    * suppliers and the part filter broadcast; lineitem shuffles once on
    * (part, supplier).
    */
  def q2MinCostSupplier(spark: SparkSession, sfDir: String,
                        regionName: String = "AFRICA",
                        partType: String = "LARGE"): DataFrame = {
    val p = Tables.part(spark, sfDir)
      .filter(col("p_type") === partType).select("p_partkey", "p_name")
    val regionSupp = Tables.supplier(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)
        .select("n_nationkey", "n_name", "n_regionkey")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, sfDir)
        .filter(col("r_name") === regionName).select("r_regionkey")),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    val offers = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_suppkey"),
        (col("l_extendedprice") / col("l_quantity")).as("unit_cost"))
      .join(broadcast(p.select("p_partkey")),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .join(broadcast(regionSupp.select("s_suppkey")),
        col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy("l_partkey", "l_suppkey")
      .agg(min("unit_cost").as("supp_cost"))
    val minCost = offers.groupBy(col("l_partkey").as("mc_partkey"))
      .agg(min("supp_cost").as("min_cost"))
    offers
      .join(broadcast(minCost), col("l_partkey") === col("mc_partkey") &&
        col("supp_cost") === col("min_cost"))
      .join(broadcast(regionSupp), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("l_partkey").as("p_partkey2"), col("p_name"), col("supp_cost"))
      .orderBy(desc("s_acctbal"), asc("n_name"), asc("s_name"),
        asc("p_partkey2"))
      .limit(100)
  }

  /** TPC-H Q20-shape: suppliers who dominated a part family's shipments —
    * the nested quantity-threshold semi-join chain (part name scope →
    * per-(supplier, part) aggregate compared against a per-part aggregate
    * → DISTINCT supplier keys → semi join to one nation's suppliers).
    * Without partsupp, "excess stock" becomes "shipped more than `share`
    * of the part's yearly volume". Both aggregates come off ONE date+name
    * pruned lineitem pass; quantity sums are whole-number doubles (exact),
    * and the share compare multiplies identically-derived values.
    */
  def q20ExcessShippers(spark: SparkSession, sfDir: String,
                        namePrefix: String = "red",
                        nationName: String = "NATION_5",
                        share: Double = 0.3): DataFrame = {
    val p = Tables.part(spark, sfDir)
      .filter(col("p_name").startsWith(namePrefix)).select("p_partkey")
    val l97 = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1998-01-01"))
      .select("l_partkey", "l_suppkey", "l_quantity")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"), "left_semi")
    val perSupp = l97.groupBy("l_partkey", "l_suppkey")
      .agg(sum("l_quantity").as("supp_qty"))
    // per-part totals re-aggregate from the (part, supplier) frame — no
    // second lineitem scan, and the partial aggregate reuses the shuffle
    val perPart = perSupp.groupBy(col("l_partkey").as("pp_partkey"))
      .agg(sum("supp_qty").as("part_qty"))
    val excess = perSupp
      .join(broadcast(perPart), col("l_partkey") === col("pp_partkey"))
      .filter(col("supp_qty") > lit(share) * col("part_qty"))
      .select("l_suppkey").distinct()
    Tables.supplier(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)
        .filter(col("n_name") === nationName).select("n_nationkey")),
        col("s_nationkey") === col("n_nationkey"))
      .join(excess, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_name", "s_acctbal")
      .orderBy("s_name")
  }

  /** Order fulfilment span per order status: each order reduces to its
    * FIRST and LAST line-ship dates, then per status the order count and
    * the EXACT integer day sums of order→first-ship lag and
    * first→last-ship span (means are the reader's division — no float
    * ratio in the gate) plus the worst span. Two partial-aggregating
    * shuffles (orderkey, then the bounded status key) — the operational
    * fulfilment-SLA view next to q12's lateness buckets.
    */
  def fulfilmentSpan(spark: SparkSession, sfDir: String): DataFrame = {
    val perOrder = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey"))
      .agg(min("l_shipdate").as("first_ship"),
        max("l_shipdate").as("last_ship"))
    Tables.orders(spark, sfDir)
      .join(perOrder, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(datediff(col("first_ship"), col("o_orderdate")))
          .cast("long").as("sum_start_lag_days"),
        sum(datediff(col("last_ship"), col("first_ship")))
          .cast("long").as("sum_span_days"),
        max(datediff(col("last_ship"), col("first_ship")))
          .cast("long").as("max_span_days"))
      .orderBy("o_orderstatus")
  }

  /** Order-size distribution: orders bucketed by line count — the basket
    * breadth histogram (its shape sizes the per-order fan-out bounds the
    * basket miner relies on). Two bounded aggregates, all integers.
    */
  def orderSizeHistogram(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_lines"))
      .groupBy("n_lines")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("n_lines")

  /** Customer recency histogram: customers bucketed by 30-day bins of
    * days since their LAST order, measured against the corpus max order
    * date (a pure function of the dataset — no wall clock in the gate).
    * The recency axis of RFM as its own distribution view; one
    * customer-keyed max-aggregate, a broadcast 1-row anchor, a bounded
    * histogram. All integers.
    */
  def customerRecencyHistogram(spark: SparkSession, sfDir: String): DataFrame = {
    val last = Tables.orders(spark, sfDir)
      .groupBy("o_custkey")
      .agg(max(col("o_orderdate").cast("date")).as("last_order"))
    val anchor = last.agg(max("last_order").as("anchor"))
    last.crossJoin(broadcast(anchor))
      .withColumn("recency_bin",
        expr("datediff(anchor, last_order) div 30").cast("long"))
      .groupBy("recency_bin")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("recency_bin")
  }

  /** Discount-band effectiveness: line volume, quantity, and discounted
    * revenue per whole-percent discount level — the elasticity view
    * behind q6's what-if. The band is floor(d·100 + 0.5) (floor-based
    * round-half-up: identical on identical doubles in both engines,
    * the [[graft.ops.Similarity.embeddingQuantize]] precedent); revenue
    * follows q1's per-row-multiply-then-DECIMAL discipline. One
    * bounded-key (≤ 11 bands) aggregate, one scan.
    */
  def discountBands(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(floor(col("l_discount") * 100 + lit(0.5)).cast("long")
        .as("discount_pct"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_quantity").cast("long")).cast("long").as("sum_qty"),
        round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(DecimalType(18, 6))).cast("double"), 2).as("revenue"))
      .orderBy("discount_pct")
}
