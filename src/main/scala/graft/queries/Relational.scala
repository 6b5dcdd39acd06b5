package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational query layer over the replicated tables: joins, aggregation,
  * windows, set ops, top-k — the query surface the reference delegates to
  * ClickHouse after replication (SURVEY §2.7-2.8). TPC-H-shaped over the
  * driver fixtures.
  *
  * Oracle-parity convention: every floating aggregate is summed as
  * DECIMAL(18,s) and cast back to double. Decimal addition is exact and
  * order-independent, so Spark's partial-aggregation order vs DuckDB's
  * cannot produce last-ULP hash mismatches. Per-row products stay double
  * (both engines evaluate the identical IEEE expression).
  *
  * Scale notes (100 TB):
  *  - dimension joins (region/nation/supplier/part at these shapes) are
  *    broadcast explicitly; fact-fact joins shuffle on the join key and
  *    rely on AQE for skew/coalescing.
  *  - aggregates are declared on the grouped frame (map-side partial agg);
  *    no windows where a hash agg suffices; top-k via orderBy+limit
  *    compiles to TakeOrderedAndProject (no full sort materialization).
  *  - filters/projections are plain Catalyst predicates; they push to the
  *    parquet scan (verified via .explain PushedFilters).
  */
object Relational {

  type Q = (SparkSession, String) => DataFrame

  /** The oracle-parity convention for floating aggregates — sum as
    * DECIMAL(18, scale), cast back to double — shared with Events
    * (one definition; a drifting private copy would silently change
    * half the catalog's summation semantics — r12 review).
    */
  private[queries] def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** TPC-H Q1 shape: pricing summary on lineitem. */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    // spread: the decimal partial aggregation is the query's whole cost
    // and a single-row-group fixture serializes it (guide §2.5; measured
    // 1.66 -> 0.77 s at sf0.1, OPTIMIZATION_r14.md)
    val li = Tables.loadSpread(spark, dir, "lineitem", "l_orderkey")
    val revenue = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val charge = revenue * (lit(1.0) + col("l_tax"))
    li.filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(revenue, 4).as("sum_disc_price"),
        dsum(charge, 6).as("sum_charge"),
        (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-12-01'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q2 shape (no partsupp fixture, so acctbal plays min-cost): the
    * general SQL entry point — operator S2, the analogue of the
    * reference's parameterized AQL executor (arangodb/connect.py:28-63).
    * ONE SQL string runs verbatim on both engines: `spark.sql` here, the
    * DuckDB oracle as-is. The correlated scalar subquery is decorrelated
    * by Catalyst into an aggregate + join; region/nation are broadcast.
    */
  val q2Sql: String =
    """SELECT r_name, n_name, s_name, s_acctbal
      |FROM supplier s
      |JOIN nation n ON s.s_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |WHERE s_acctbal = (SELECT MAX(s2.s_acctbal)
      |                   FROM supplier s2
      |                   JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
      |                   WHERE n2.n_regionkey = r.r_regionkey)
      |ORDER BY r_name, s_name""".stripMargin

  def q2TopAcctbalSql(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(q2Sql)
  }

  /** TPC-H Q3 shape: shipping-priority top 10. Fact-fact joins shuffle on
    * the order key; customer side is small relative to facts but scales
    * with SF, so AQE decides broadcast vs shuffle at runtime.
    */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.load(spark, dir, "orders")
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val li = Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
    cust.join(ord, cust("c_custkey") === ord("o_custkey"))
      .join(li, ord("o_orderkey") === li("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3Sql: String =
    """SELECT l_orderkey, o_orderdate,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |  AND l_shipdate > TIMESTAMP '1998-01-01'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** TPC-H Q4 shape: order-priority count via EXISTS (left-semi join). */
  def q4OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.load(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val li = Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1997-06-01").cast("timestamp"))
    ord.join(li, ord("o_orderkey") === li("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  val q4Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_shipdate > TIMESTAMP '1997-06-01')
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q5 shape: revenue by nation within one region. nation/region are
    * tiny, fixed-cardinality dimensions -> explicit broadcast (at 100 TB
    * these stay < 1 KB; broadcasting removes two shuffles).
    */
  def q5LocalSupplierVolume(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables.load(spark, dir, "region").filter(col("r_name") === "ASIA")
    val nation = Tables.load(spark, dir, "nation")
    val cust = Tables.load(spark, dir, "customer")
    val ord = Tables.load(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val li = Tables.load(spark, dir, "lineitem")
    val sup = Tables.load(spark, dir, "supplier")

    cust.join(ord, cust("c_custkey") === ord("o_custkey"))
      .join(li, ord("o_orderkey") === li("l_orderkey"))
      .join(sup, li("l_suppkey") === sup("s_suppkey") &&
        cust("c_nationkey") === sup("s_nationkey"))
      .join(broadcast(nation), sup("s_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q5Sql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** TPC-H Q6 shape: forecast revenue change — pure scan+filter+agg; the
    * whole query should collapse to one stage with pushed filters.
    */
  def q6ForecastRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    li.filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.02, 0.04) &&
          col("l_quantity") < 24)
      .agg(dsum(col("l_extendedprice") * col("l_discount"), 4).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val q6Sql: String =
    """SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.02 AND 0.04 AND l_quantity < 24""".stripMargin

  /** Top-k customers by lifetime order value (TakeOrderedAndProject). */
  def q7TopCustomers(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
    val ord = Tables.load(spark, dir, "orders")
    ord.groupBy(col("o_custkey"))
      .agg(dsum(col("o_totalprice")).as("total_spent"), count(lit(1)).as("n_orders"))
      .join(cust, col("o_custkey") === cust("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("total_spent"), col("n_orders"))
      .orderBy(col("total_spent").desc, col("c_custkey"))
      .limit(15)
  }

  val q7Sql: String =
    """SELECT c_custkey, c_name,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent,
      |  COUNT(*) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_custkey, c_name
      |ORDER BY total_spent DESC, c_custkey
      |LIMIT 15""".stripMargin

  /** Revenue by order-year and nation (join + date part extraction). */
  def q8YearlyNationRevenue(spark: SparkSession, dir: String): DataFrame = {
    val nation = Tables.load(spark, dir, "nation")
    val cust = Tables.load(spark, dir, "customer")
    val ord = Tables.load(spark, dir, "orders")
    ord.join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"), col("n_name"))
      .agg(dsum(col("o_totalprice")).as("revenue"))
      .orderBy(col("o_year"), col("n_name"))
  }

  val q8Sql: String =
    """SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS o_year, n_name,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY 1, 2
      |ORDER BY o_year, n_name""".stripMargin

  /** Window function: top-3 orders per customer by value. */
  def q9WindowRank(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = Tables.load(spark, dir, "orders")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    ord.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn").cast("long").as("rn"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  val q9Sql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders)
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin

  /** ROLLUP aggregation: revenue by region/nation hierarchy. */
  def q10Rollup(spark: SparkSession, dir: String): DataFrame = {
    val nation = Tables.load(spark, dir, "nation")
    val region = Tables.load(spark, dir, "region")
    val cust = Tables.load(spark, dir, "customer")
    // spread by the join key: the customer join reuses the partitioning
    val ord = Tables.loadSpread(spark, dir, "orders", "o_custkey")
    ord.join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }

  val q10Sql: String =
    """SELECT r_name, n_name,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP(r_name, n_name)
      |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin

  /** Set operation: BUILDING-segment customers who never placed a
    * high-value order (EXCEPT = left-anti after distinct).
    */
  def q11SetOps(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
    val ord = Tables.load(spark, dir, "orders")
    val building = cust.filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("custkey"))
    val bigSpenders = ord.filter(col("o_totalprice") > 300000)
      .select(col("o_custkey").as("custkey"))
    building.except(bigSpenders).orderBy(col("custkey"))
  }

  val q11Sql: String =
    """SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |EXCEPT
      |SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
      |ORDER BY custkey""".stripMargin

  /** Anti-join: customers without orders, counted per segment. */
  def q12AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
    val ord = Tables.load(spark, dir, "orders")
    cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))
  }

  val q12Sql: String =
    """SELECT c_mktsegment, COUNT(*) AS n_customers
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  /** Conditional aggregation + LIKE + distinct counts per brand. */
  def q13PartStats(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.load(spark, dir, "part")
    part.filter(col("p_brand").like("Brand#1%"))
      .groupBy(col("p_brand"))
      .agg(
        countDistinct(col("p_size")).as("n_sizes"),
        count(when(col("p_type") === "PROMO", 1)).as("n_promo"),
        dsum(col("p_retailprice")).as("total_price"))
      .orderBy(col("p_brand"))
  }

  val q13Sql: String =
    """SELECT p_brand,
      |  COUNT(DISTINCT p_size) AS n_sizes,
      |  COUNT(CASE WHEN p_type = 'PROMO' THEN 1 END) AS n_promo,
      |  CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      |FROM part WHERE p_brand LIKE 'Brand#1%'
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin

  /** TPC-H Q14 shape: promo revenue share (division of exact sums). */
  def q14PromoShare(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.load(spark, dir, "part")
    val li = Tables.load(spark, dir, "lineitem")
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .agg(
        (lit(100.0) * dsum(when(col("p_type") === "PROMO", rev), 4) / dsum(rev, 4))
          .as("promo_share"))
  }

  val q14Sql: String =
    """SELECT 100.0 *
      |  CAST(SUM(CAST(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1.0 - l_discount) END AS DECIMAL(18,4))) AS DOUBLE) /
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS promo_share
      |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin

  /** TPC-H Q17 shape: revenue from small-quantity lineitems relative to the
    * per-part average (aggregate-then-join, broadcast the per-part avgs
    * side when small; AQE handles it here).
    */
  def q15SmallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val avgQty = li.groupBy(col("l_partkey").as("ap_partkey"))
      .agg((dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"))
    li.join(avgQty, col("l_partkey") === col("ap_partkey"))
      .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
      .agg(dsum(col("l_extendedprice")).as("small_qty_revenue"),
        count(lit(1)).as("n_items"))
  }

  val q15Sql: String =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_qty_revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem l JOIN (
      |  SELECT l_partkey AS ap_partkey,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
      |  FROM lineitem GROUP BY l_partkey) a
      |ON l.l_partkey = a.ap_partkey
      |WHERE l.l_quantity < 0.5 * a.avg_qty""".stripMargin

  /** TPC-H Q18 shape: large-volume orders (agg + having + join back). */
  def q16LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val ord = Tables.load(spark, dir, "orders")
    val cust = Tables.load(spark, dir, "customer")
    val big = li.groupBy(col("l_orderkey"))
      .agg(dsum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > 150)
    big.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("o_orderkey"), col("o_totalprice"), col("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
      .limit(20)
  }

  val q16Sql: String =
    """SELECT c_custkey, o_orderkey, o_totalprice, total_qty
      |FROM (SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
      |      FROM lineitem GROUP BY l_orderkey
      |      HAVING total_qty > 150) b
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY total_qty DESC, o_orderkey
      |LIMIT 20""".stripMargin

  /** Distinct aggregates per group. */
  def q17DistinctAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    li.groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_suppkey")).as("n_suppliers"),
        countDistinct(col("l_partkey")).as("n_parts"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))
  }

  val q17Sql: String =
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_suppkey) AS n_suppliers,
      |  COUNT(DISTINCT l_partkey) AS n_parts,
      |  COUNT(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** TPC-H Q18 shape: customers with any large order (semi-join against a
    * grouped-having subquery). The inner aggregate shuffles on the order
    * key; the resulting keeper set is orders-of-magnitude smaller, so AQE
    * broadcasts it into the semi-join.
    */
  def q18LargeOrderCustomers(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val ord = Tables.load(spark, dir, "orders")
    val cust = Tables.load(spark, dir, "customer")
    val big = li.groupBy(col("l_orderkey"))
      .agg(dsum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > 150)
    ord.join(big, ord("o_orderkey") === big("l_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(50)
  }

  val q18Sql: String =
    """SELECT c_custkey, c_name, o_orderkey, o_totalprice, sum_qty
      |FROM orders
      |JOIN (SELECT l_orderkey,
      |        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |      FROM lineitem GROUP BY l_orderkey
      |      HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 150) big
      |  ON o_orderkey = big.l_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 50""".stripMargin

  /** TPC-H Q19 shape: disjunctive multi-clause predicate over a join —
    * the classic pushdown test (each disjunct prunes at the scan, the
    * join keeps a single conjunctive residual).
    */
  def q19DisjunctiveRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val part = Tables.load(spark, dir, "part")
    val cond =
      (part("p_brand") === "Brand#1" && part("p_size").between(1, 15) &&
        li("l_quantity").between(1, 20)) ||
      (part("p_brand") === "Brand#2" && part("p_size").between(10, 30) &&
        li("l_quantity").between(5, 30))
    li.join(part, li("l_partkey") === part("p_partkey") && cond)
      .agg(dsum(li("l_extendedprice") * (lit(1.0) - li("l_discount")), 4).as("revenue"))
  }

  val q19Sql: String =
    """SELECT CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      | AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
      |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 5 AND 30))""".stripMargin

  /** TPC-H Q21-lite shape: orders where SOME line shipped after the order
    * date proxy AND NO line is a return — exists + not-exists as
    * left-semi + left-anti joins (Catalyst's decorrelated forms).
    */
  def q21SemiAnti(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.load(spark, dir, "orders")
    val li = Tables.load(spark, dir, "lineitem")
    val late = li.filter(col("l_shipdate") > lit("1998-06-01").cast("timestamp"))
      .select(col("l_orderkey"))
    val returned = li.filter(col("l_returnflag") === "R").select(col("l_orderkey"))
    ord.join(late, ord("o_orderkey") === late("l_orderkey"), "left_semi")
      .join(returned, ord("o_orderkey") === returned("l_orderkey"), "left_anti")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
      .orderBy(col("o_orderpriority"))
  }

  val q21Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
      |              AND l_shipdate > TIMESTAMP '1998-06-01')
      |  AND NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
      |                  AND l_returnflag = 'R')
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q20 shape: suppliers with SOME qualifying part whose
    * post-cutoff shipped quantity clears a threshold — a correlated
    * EXISTS over a GROUP BY + HAVING aggregate subquery, the one
    * decorrelation pattern the q-family didn't yet exercise. Runs as
    * plain SQL so CATALYST does the decorrelation (RewriteDomainJoins →
    * left-semi over the pre-aggregated inner side); PlanAuditSpec pins
    * the no-BNLJ outcome. The threshold sum is DECIMAL so Spark's and
    * DuckDB's aggregation orders cannot flip rows across it.
    */
  def q20QualifiedSuppliers(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(q20Sql)
  }

  val q20Sql: String =
    """SELECT s_suppkey, s_name, s_acctbal
      |FROM supplier
      |WHERE EXISTS (
      |  SELECT 1 FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_suppkey = s_suppkey
      |    AND p_size < 20 AND p_name LIKE '%a%'
      |    AND l_shipdate >= TIMESTAMP '1997-01-01'
      |  GROUP BY l_partkey
      |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 90)
      |ORDER BY s_suppkey""".stripMargin

  /** TPC-H Q22 shape: customers above the average balance with no orders
    * — a correlated-free scalar subquery (broadcast as a literal-ish
    * single-row join) + anti-join.
    */
  def q22GlobalCustomers(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
    val ord = Tables.load(spark, dir, "orders")
    val avgBal = cust.filter(col("c_acctbal") > 0)
      .agg(avg(col("c_acctbal")).as("avg_bal"))
    cust.join(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(ord, cust("c_custkey") === ord("o_custkey"), "left_anti")
      .groupBy((col("c_custkey") % 7).cast("string").as("cgroup"))
      .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("total_bal"))
      .orderBy(col("cgroup"))
  }

  val q22Sql: String =
    """SELECT CAST(c_custkey % 7 AS VARCHAR) AS cgroup, COUNT(*) AS n_cust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
      |FROM customer
      |WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY 1 ORDER BY cgroup""".stripMargin

  /** CUBE over (returnflag, linestatus): all four grouping-set levels in
    * one pass (Expand + single aggregation — Catalyst's grouping-sets
    * plan), completing the rollup/cube surface next to q10.
    */
  def q23CubeFlags(spark: SparkSession, dir: String): DataFrame =
    // spread: Expand×4 + decimal partial agg is scan-side compute (q1's
    // rationale, multiplied by the grouping-set expansion)
    Tables.loadSpread(spark, dir, "lineitem", "l_orderkey")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("n"), col("sum_qty"))
      .orderBy(col("rf"), col("ls"))

  val q23Sql: String =
    """SELECT COALESCE(l_returnflag, 'ALL') AS rf, COALESCE(l_linestatus, 'ALL') AS ls,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY rf, ls""".stripMargin

  /** Exact interpolated percentiles per group (the inverse-distribution
    * aggregate class: median/p25/p95), completing the aggregate surface
    * next to sum/avg/count-distinct/sketches.
    *
    * Scale note: Spark's exact `percentile` holds a value→count map per
    * group, so memory is O(distinct values per group) — safe here because
    * l_quantity is integral with ~50 distinct values at ANY corpus size.
    * For unbounded-cardinality metrics (raw prices) the scale path is
    * `percentile_approx` (mergeable t-digest, bounded memory); it is
    * deliberately not oracle-checked because its error contract differs
    * per engine. Both engines interpolate at p*(n-1), so the exact form
    * hash-matches bit-for-bit.
    */
  def q24Quantiles(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        percentile(col("l_quantity"), lit(0.25)).as("p25_qty"),
        percentile(col("l_quantity"), lit(0.5)).as("med_qty"),
        percentile(col("l_quantity"), lit(0.95)).as("p95_qty"))
      .orderBy(col("l_returnflag"))

  val q24Sql: String =
    """SELECT l_returnflag, COUNT(*) AS n,
      |  quantile_cont(l_quantity, 0.25) AS p25_qty,
      |  quantile_cont(l_quantity, 0.5)  AS med_qty,
      |  quantile_cont(l_quantity, 0.95) AS p95_qty
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** FULL OUTER join — the one join type the catalog lacked: reconcile
    * per-nation premium-customer counts against low-balance suppliers,
    * keeping nations present on either side only (24 one-sided rows at
    * sf0.001, so both outer directions are genuinely exercised).
    *
    * Scale note: both inputs are pre-aggregated to one row per nation
    * BEFORE the join, so the full-outer shuffle carries group counts,
    * not base rows — the reconciliation pattern for comparing two 100 TB
    * fact tables is aggregate-then-outer-join, never the reverse.
    */
  def q25FullOuter(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "customer")
      .filter(col("c_acctbal") > 5000)
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_cust"))
    val s = Tables.load(spark, dir, "supplier")
      .filter(col("s_acctbal") < 1000)
      .groupBy(col("s_nationkey")).agg(count(lit(1)).as("n_supp"))
    c.join(s, c("c_nationkey") === s("s_nationkey"), "full_outer")
      .select(
        coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy(col("nationkey"))
  }

  val q25Sql: String =
    """SELECT COALESCE(c_nationkey, s_nationkey) AS nationkey,
      |  COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
      |FROM (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer
      |      WHERE c_acctbal > 5000 GROUP BY c_nationkey) c
      |FULL OUTER JOIN
      |     (SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier
      |      WHERE s_acctbal < 1000 GROUP BY s_nationkey) s
      |  ON c_nationkey = s_nationkey
      |ORDER BY nationkey""".stripMargin

  /** q26: the ranking-function suite over one shared frame — ntile
    * quartiles, percent_rank, cume_dist and the lag-gap to the previous
    * order, all on ONE per-priority window (one exchange + one sort
    * feeds all four functions). The window orders by (price, orderkey)
    * so ties can't make ntile/lag nondeterministic: every function is a
    * pure function of the total order. percent_rank/cume_dist are exact
    * rational divisions of window counters and the gap is one IEEE
    * subtraction of raw parquet doubles — engine-reproducible without
    * DECIMAL staging.
    */
  def q26RankSuite(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    graft.operators.Spread.materialize(
      Tables.load(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          ntile(4).over(w).cast("long").as("price_quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume_d"),
          (col("o_totalprice") - lag(col("o_totalprice"), 1).over(w)).as("prev_gap")))
      // materialize: the final sort's boundary-sampling pass re-runs the
      // whole 5-partition window otherwise (guide §2.4 / Spread scaladoc)
      .orderBy(col("o_orderpriority"), col("pct_rank"), col("o_orderkey"))
  }

  val q26Sql: String =
    """SELECT o_orderkey, o_orderpriority,
      |  ntile(4) OVER w AS price_quartile,
      |  percent_rank() OVER w AS pct_rank,
      |  cume_dist() OVER w AS cume_d,
      |  o_totalprice - lag(o_totalprice) OVER w AS prev_gap
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_orderpriority, pct_rank, o_orderkey""".stripMargin

  /** q27: GROUPING SETS — the non-hierarchical multi-grain aggregate
    * that completes the q10 (ROLLUP) / q23 (CUBE) family: one pass
    * produces the (returnflag, linestatus) grain, the ship-year grain,
    * and the grand total — three independent reports that would
    * otherwise be three scans + a UNION. The grain id is computed
    * EXPLICITLY from grouping() bits (engines disagree on grouping_id
    * bit order conventions; the explicit arithmetic is portable by
    * construction). One Expand + one hash agg; Expand multiplies rows
    * by the set count BEFORE the shuffle, which is exactly the
    * documented cost of multi-grain-in-one-pass.
    */
  def q27GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    // spread: Expand×3 + decimal partial agg, q23's rationale
    val li = Tables.loadSpread(spark, dir, "lineitem", "l_orderkey")
      .withColumn("ship_year", year(col("l_shipdate")).cast("long"))
    li.groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")), Seq(col("ship_year")), Seq()),
        col("l_returnflag"), col("l_linestatus"), col("ship_year"))
      .agg(
        (grouping(col("l_returnflag")) * 4 + grouping(col("l_linestatus")) * 2 +
          grouping(col("ship_year"))).cast("long").as("gid"),
        dsum(col("l_extendedprice")).as("revenue"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first, col("ship_year").asc_nulls_first)
  }

  val q27Sql: String =
    """SELECT l_returnflag, l_linestatus, ship_year,
      |  CAST(GROUPING(l_returnflag) * 4 + GROUPING(l_linestatus) * 2 +
      |       GROUPING(ship_year) AS BIGINT) AS gid,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_rows
      |FROM (SELECT *, year(l_shipdate) AS ship_year FROM lineitem)
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (ship_year), ())
      |ORDER BY gid, l_returnflag ASC NULLS FIRST,
      |  l_linestatus ASC NULLS FIRST, ship_year ASC NULLS FIRST""".stripMargin

  /** q28: TPC-H Q17 shape — small-quantity revenue behind a CORRELATED
    * SCALAR AGGREGATE subquery (`l_quantity < 0.2 * AVG(qty) per part`).
    * q2 decorrelates a correlated MAX, q20 a correlated EXISTS-over-
    * HAVING; this completes the decorrelation family with the scalar-AVG
    * form TPC-H made canonical. ONE SQL string runs verbatim on both
    * engines; Catalyst rewrites the subquery into a per-part aggregate +
    * join (no nested-loop re-execution per outer row — PlanAuditSpec's
    * no-BNLJ gate holds).
    *
    * Scale shape: the inner aggregate is partial-agg'd map-side and
    * joins on l_partkey — one exchange each side at 100 TB; the brand
    * filter prunes the part side before the join (pushed to the scan).
    * Determinism: quantities are integral doubles (sums exact well below
    * 2^53, so partial-agg order can't matter), and AVG/0.2x are the same
    * IEEE ops in both engines.
    */
  val q28Sql: String =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
      |    AS avg_yearly,
      |  COUNT(*) AS n_small
      |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      |WHERE p.p_brand = 'Brand#1'
      |  AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
      |                      FROM lineitem l2
      |                      WHERE l2.l_partkey = l.l_partkey)""".stripMargin

  def q28SmallQtyCorrelated(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(q28Sql)
  }

  /** q29: TPC-H Q21 shape — "waiting orders" behind a correlated EXISTS
    * *and* a correlated NOT EXISTS over the SAME fact table (the
    * fixture has no commit/receipt dates, so "late" is shipped more
    * than 60 days after the order date): suppliers who were the ONLY
    * late shipper in a finished multi-supplier order. The hardest
    * decorrelation in the TPC-H suite — Catalyst turns the EXISTS into
    * a left-semi and the NOT EXISTS into a left-anti on l_orderkey,
    * with the NOT EXISTS branch carrying an outer reference to a
    * SECOND outer table (o.o_orderdate). One SQL string, both engines.
    *
    * Scale shape: three shuffles on l_orderkey (join + semi + anti —
    * the same key, so AQE/co-partitioning reuses the layout), the
    * supplier dim broadcasts, and the top-10 is TakeOrdered over the
    * |suppliers| rollup. No per-row subquery re-execution anywhere.
    */
  val q29Sql: String =
    """SELECT s_name, COUNT(*) AS numwait
      |FROM supplier s JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
      |JOIN orders o ON o.o_orderkey = l1.l_orderkey
      |WHERE o.o_orderstatus = 'F'
      |  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |              WHERE l3.l_orderkey = l1.l_orderkey
      |                AND l3.l_suppkey <> l1.l_suppkey
      |                AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
      |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 10""".stripMargin

  def q29WaitingOrders(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(q29Sql)
  }

  /** q31: Z-ORDER LAYOUT QUALITY — the data-layout report behind
    * Delta/Iceberg `Z-ORDER BY`: interleave the low 16 bits of
    * (l_partkey, l_suppkey) into a space-filling-curve key, bucket rows
    * by its high bits (64 buckets), and measure each bucket's bounding
    * rectangle in key space — against the SAME stats for naive
    * l_orderkey-range bucketing. Small per-bucket rectangles are
    * literally what makes min/max file pruning work at 100 TB: a scan
    * filtered on either key can skip a z-ordered bucket whose rectangle
    * misses the predicate, while ingest-order buckets span the whole
    * domain and prune nothing. The report is one row per scheme: bucket
    * count, mean and max rectangle area (integer DIV) — the numbers a
    * table-layout decision actually reads.
    *
    * Scale shape: the z-value is a pure 16-term bit projection (no
    * shuffle); each scheme pays one bucket hash agg over the fact table
    * plus a 64-row rollup; the orderkey scheme's domain scalar
    * broadcasts (q22's shape). Nothing is row-ordered globally —
    * z-ordering is exactly the trick that AVOIDS a global sort at
    * scale (a locality-preserving hash, not a total order).
    */
  def q31ZorderLayout(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
    // keys normalized to a 16-bit grid by their DOMAIN (data-derived
    // maxima, one-row broadcast) before interleaving — raw interleave
    // would waste curve bits on the wider key's empty high range.
    // The interleave is the classic Morton mask-shift spread (5 bitwise
    // steps per key, whole-stage codegen'd) — value-identical to the
    // per-bit sum the oracle computes, measured 5.1 s -> sub-second at
    // sf0.1 vs the interpreted higher-order-function form
    def spread(c: Column): Column = {
      val a = c.bitwiseAND(lit(65535L))
      val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(16711935L))
      val d = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(252645135L))
      val e = d.bitwiseOR(shiftleft(d, 2)).bitwiseAND(lit(858993459L))
      e.bitwiseOR(shiftleft(e, 1)).bitwiseAND(lit(1431655765L))
    }
    val zval = spread(col("xn")).bitwiseOR(shiftleft(spread(col("yn")), 1))
    def rectStats(bucketed: DataFrame, scheme: String): DataFrame = bucketed
      .groupBy(col("bucket"))
      .agg((max(col("l_partkey")) - min(col("l_partkey")) + 1L).as("pspan"),
        (max(col("l_suppkey")) - min(col("l_suppkey")) + 1L).as("sspan"))
      .select((col("pspan") * col("sspan")).as("area"))
      .agg(count(lit(1)).as("n_buckets"),
        expr("sum(area) DIV count(1)").as("mean_rect_area"),
        max(col("area")).as("max_rect_area"))
      .select(lit(scheme).as("scheme"), col("n_buckets"),
        col("mean_rect_area"), col("max_rect_area"))
    val dom = li.agg(max(col("l_partkey")).as("maxp"),
      max(col("l_suppkey")).as("maxs"), max(col("l_orderkey")).as("maxo"))
    val n = li.crossJoin(broadcast(dom))
      .withColumn("xn", expr("l_partkey * 65536 DIV (maxp + 1)"))
      .withColumn("yn", expr("l_suppkey * 65536 DIV (maxs + 1)"))
    val zb = rectStats(
      n.withColumn("zv", zval)
        .select(col("l_partkey"), col("l_suppkey"),
          expr("zv >> 26").as("bucket")), "z_order")
    val ob = rectStats(
      n.select(col("l_partkey"), col("l_suppkey"),
        expr("l_orderkey * 64 DIV (maxo + 1)").as("bucket")),
      "ingest_order")
    zb.unionByName(ob).orderBy(col("scheme"))
  }

  val q31Sql: String = {
    val zv =
      """list_reduce(list_transform(generate_series(0, 15), i ->
        |  (CAST(1 AS BIGINT) << (2 * i)) * ((xn >> i) & 1)
        |  + (CAST(1 AS BIGINT) << (2 * i + 1)) * ((yn >> i) & 1)),
        |  (a, b) -> a + b)""".stripMargin
    s"""WITH li AS (SELECT l_orderkey, l_partkey, l_suppkey FROM lineitem),
      |d AS (SELECT MAX(l_partkey) AS maxp, MAX(l_suppkey) AS maxs,
      |             MAX(l_orderkey) AS maxo FROM li),
      |n AS (SELECT l_orderkey, l_partkey, l_suppkey, maxo,
      |        l_partkey * 65536 // (maxp + 1) AS xn,
      |        l_suppkey * 65536 // (maxs + 1) AS yn
      |      FROM li, d),
      |zb AS (
      |  SELECT $zv >> 26 AS bucket,
      |    MAX(l_partkey) - MIN(l_partkey) + 1 AS pspan,
      |    MAX(l_suppkey) - MIN(l_suppkey) + 1 AS sspan
      |  FROM n GROUP BY 1),
      |ob AS (
      |  SELECT l_orderkey * 64 // (maxo + 1) AS bucket,
      |    MAX(l_partkey) - MIN(l_partkey) + 1 AS pspan,
      |    MAX(l_suppkey) - MIN(l_suppkey) + 1 AS sspan
      |  FROM n GROUP BY 1)
      |SELECT 'z_order' AS scheme, COUNT(*) AS n_buckets,
      |  CAST(SUM(pspan * sspan) // COUNT(*) AS BIGINT) AS mean_rect_area,
      |  CAST(MAX(pspan * sspan) AS BIGINT) AS max_rect_area
      |FROM zb
      |UNION ALL
      |SELECT 'ingest_order', COUNT(*),
      |  CAST(SUM(pspan * sspan) // COUNT(*) AS BIGINT),
      |  CAST(MAX(pspan * sspan) AS BIGINT)
      |FROM ob ORDER BY scheme""".stripMargin
  }

  /** q32: "IMPORTANT PARTS" — TPC-H Q11's shape on the lineitem graph:
    * parts whose revenue exceeds a FIXED FRACTION of total revenue
    * (Q11's `HAVING value > (SELECT SUM(...) * fraction)`): the
    * group-vs-global HAVING class, next to q22's row-vs-global filter.
    * One per-part aggregation, ONE one-row global broadcast (never a
    * per-group recompute of the total), a selective filter, descending
    * sort with the key as tiebreak. Both engines sum in DECIMAL(18,4)
    * and compare in double, q14's exactness contract.
    */
  def q32ImportantParts(spark: SparkSession, dir: String): DataFrame = {
    // spread BY THE GROUP KEY: the per-part exchange reuses the spread's
    // partitioning (guide §2.4 — one exchange does double duty)
    val li = Tables.loadSpread(spark, dir, "lineitem", "l_partkey")
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val perPart = li.groupBy(col("l_partkey"))
      .agg(dsum(rev, 4).as("revenue"), count(lit(1)).as("n_items"))
      // barrier: TWO consumers (the global total + the filtered output) —
      // without it each re-pays the fact scan and the per-part exchange
      .localCheckpoint(false)
    val total = perPart.agg(dsum0(col("revenue")).as("total_revenue"))
    perPart.crossJoin(broadcast(total))
      .filter(col("revenue") > lit(0.002) * col("total_revenue"))
      .select(col("l_partkey"), col("n_items"), col("revenue"),
        (col("revenue") / col("total_revenue") * lit(1000000.0))
          .as("share_ppm_f"))
      .select(col("l_partkey"), col("n_items"), col("revenue"),
        floor(col("share_ppm_f")).cast("long").as("share_ppm"))
      .orderBy(col("revenue").desc, col("l_partkey"))
  }

  /** Exact double sum for values that are THEMSELVES exact decimal casts
    * (summing q32's per-part revenues into the global total must follow
    * the same decimal discipline).
    */
  private def dsum0(c: Column): Column =
    sum(c.cast(DecimalType(28, 4))).cast("double")

  val q32Sql: String =
    """WITH pp AS (
      |  SELECT l_partkey,
      |    CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
      |      AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |    COUNT(*) AS n_items
      |  FROM lineitem GROUP BY l_partkey),
      |t AS (SELECT CAST(SUM(CAST(revenue AS DECIMAL(28,4))) AS DOUBLE)
      |        AS total_revenue FROM pp)
      |SELECT l_partkey, n_items, revenue,
      |  CAST(floor(revenue / total_revenue * 1000000.0) AS BIGINT) AS share_ppm
      |FROM pp, t WHERE revenue > 0.002 * total_revenue
      |ORDER BY revenue DESC, l_partkey""".stripMargin

  /** q30: ORDER-BACKLOG CURVE — the open-order inventory over time: per
    * month, how many orders were opened (o_orderdate), how many were
    * fully shipped (the month of the order's LAST l_shipdate), and the
    * running backlog. The operational time series a replica dashboard
    * plots; all integers, exact at every SF.
    *
    * Scale shape: one shuffle on l_orderkey folds lineitem to a
    * per-order completion date (map-side partial max), then both event
    * streams collapse to a |months| grid before the cumulative window —
    * the window input is dozens of rows, so the unpartitioned running
    * sum is free, not a global-sort bottleneck.
    */
  def q30OrderBacklog(spark: SparkSession, dir: String): DataFrame = {
    val done = Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(max(col("l_shipdate")).as("done_date"))
    val opened = Tables.load(spark, dir, "orders")
      .groupBy(trunc(col("o_orderdate"), "month").as("month"))
      .agg(count(lit(1)).as("n_opened"))
    val closed = done
      .groupBy(trunc(col("done_date"), "month").as("month"))
      .agg(count(lit(1)).as("n_closed"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("month"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    opened.join(closed, Seq("month"), "full_outer")
      .select(col("month"),
        coalesce(col("n_opened"), lit(0L)).as("n_opened"),
        coalesce(col("n_closed"), lit(0L)).as("n_closed"))
      .withColumn("backlog",
        sum(col("n_opened")).over(w) - sum(col("n_closed")).over(w))
      .orderBy(col("month"))
  }

  val q30Sql: String =
    """WITH done AS (
      |  SELECT l_orderkey, MAX(l_shipdate) AS done_date
      |  FROM lineitem GROUP BY l_orderkey),
      |o AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
      |        COUNT(*) AS n_opened
      |      FROM orders GROUP BY 1),
      |c AS (SELECT CAST(date_trunc('month', done_date) AS DATE) AS month,
      |        COUNT(*) AS n_closed
      |      FROM done GROUP BY 1)
      |SELECT month,
      |  COALESCE(n_opened, 0) AS n_opened,
      |  COALESCE(n_closed, 0) AS n_closed,
      |  CAST(SUM(COALESCE(n_opened, 0)) OVER (ORDER BY month)
      |    - SUM(COALESCE(n_closed, 0)) OVER (ORDER BY month) AS BIGINT)
      |    AS backlog
      |FROM o FULL OUTER JOIN c USING (month)
      |ORDER BY month""".stripMargin

  val defs: Map[String, Q] = Map(
    "q32_important_parts" -> (q32ImportantParts _),
    "q31_zorder_layout" -> (q31ZorderLayout _),
    "q30_order_backlog" -> (q30OrderBacklog _),
    "q29_waiting_orders" -> (q29WaitingOrders _),
    "q28_small_qty_correlated" -> (q28SmallQtyCorrelated _),
    "q27_grouping_sets" -> (q27GroupingSets _),
    "q26_rank_suite" -> (q26RankSuite _),
    "q25_full_outer" -> (q25FullOuter _),
    "q24_quantiles" -> (q24Quantiles _),
    "q23_cube_flags" -> (q23CubeFlags _),
    "q18_large_order_customers" -> (q18LargeOrderCustomers _),
    "q19_disjunctive_revenue" -> (q19DisjunctiveRevenue _),
    "q20_qualified_suppliers" -> (q20QualifiedSuppliers _),
    "q21_semi_anti" -> (q21SemiAnti _),
    "q22_global_customers" -> (q22GlobalCustomers _),
    "q1_pricing_summary" -> (q1PricingSummary _),
    "q2_top_acctbal_sql" -> (q2TopAcctbalSql _),
    "q3_shipping_priority" -> (q3ShippingPriority _),
    "q4_order_priority" -> (q4OrderPriority _),
    "q5_local_supplier_volume" -> (q5LocalSupplierVolume _),
    "q6_forecast_revenue" -> (q6ForecastRevenue _),
    "q7_top_customers" -> (q7TopCustomers _),
    "q8_yearly_nation_revenue" -> (q8YearlyNationRevenue _),
    "q9_window_rank" -> (q9WindowRank _),
    "q10_rollup" -> (q10Rollup _),
    "q11_setops" -> (q11SetOps _),
    "q12_antijoin" -> (q12AntiJoin _),
    "q13_part_stats" -> (q13PartStats _),
    "q14_promo_share" -> (q14PromoShare _),
    "q15_small_qty_revenue" -> (q15SmallQtyRevenue _),
    "q16_large_orders" -> (q16LargeOrders _),
    "q17_distinct_agg" -> (q17DistinctAgg _))

  val oracles: Map[String, String] = Map(
    "q32_important_parts" -> q32Sql,
    "q31_zorder_layout" -> q31Sql,
    "q30_order_backlog" -> q30Sql,
    "q29_waiting_orders" -> q29Sql,
    "q28_small_qty_correlated" -> q28Sql,
    "q27_grouping_sets" -> q27Sql,
    "q26_rank_suite" -> q26Sql,
    "q25_full_outer" -> q25Sql,
    "q24_quantiles" -> q24Sql,
    "q23_cube_flags" -> q23Sql,
    "q18_large_order_customers" -> q18Sql,
    "q19_disjunctive_revenue" -> q19Sql,
    "q20_qualified_suppliers" -> q20Sql,
    "q21_semi_anti" -> q21Sql,
    "q22_global_customers" -> q22Sql,
    "q1_pricing_summary" -> q1Sql,
    "q2_top_acctbal_sql" -> q2Sql,
    "q3_shipping_priority" -> q3Sql,
    "q4_order_priority" -> q4Sql,
    "q5_local_supplier_volume" -> q5Sql,
    "q6_forecast_revenue" -> q6Sql,
    "q7_top_customers" -> q7Sql,
    "q8_yearly_nation_revenue" -> q8Sql,
    "q9_window_rank" -> q9Sql,
    "q10_rollup" -> q10Sql,
    "q11_setops" -> q11Sql,
    "q12_antijoin" -> q12Sql,
    "q13_part_stats" -> q13Sql,
    "q14_promo_share" -> q14Sql,
    "q15_small_qty_revenue" -> q15Sql,
    "q16_large_orders" -> q16Sql,
    "q17_distinct_agg" -> q17Sql)
}
