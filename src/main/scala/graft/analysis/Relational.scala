package graft.analysis

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.GraftSession.table

/** Generic relational analysis surface (the reference's distributions and
  * cross-tabs are ordinary star-schema aggregations; these TPC-H-shaped
  * queries are the bench headliners exercising the same plan shapes).
  *
  * Numeric discipline for oracle parity: never sum raw doubles (order
  * dependent). Inputs are cast to exact DECIMAL first, summed exactly, and
  * only the final value is cast back to double. Averages are
  * double(exact sum)/double(count) — one IEEE division, order independent.
  */
object Relational {

  /** Cast-to-exact helper: doubles in the test tables carry 2-decimal values. */
  def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  def exactSum(c: Column): Column = sum(dec(c)).cast("double")

  def exactAvg(c: Column): Column = sum(dec(c)).cast("double") / count(c).cast("double")

  /** Exact discounted revenue: sum(price * (1 - discount)) in DECIMAL. */
  def revenueSum(price: Column, discount: Column): Column =
    sum(dec(price) * (lit(1).cast(DecimalType(18, 2)) - dec(discount))).cast("double")

  /** TPC-H Q1 pricing summary. One map-side-combinable aggregation; at scale
    * this is a pure scan + partial agg + 4-group exchange.
    */
  def q1PricingSummary(spark: SparkSession, sfDir: String): DataFrame = {
    val li = table(spark, sfDir, "lineitem")
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        exactSum(col("l_quantity")).as("sum_qty"),
        exactSum(col("l_extendedprice")).as("sum_base_price"),
        revenueSum(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
        exactAvg(col("l_quantity")).as("avg_qty"),
        exactAvg(col("l_extendedprice")).as("avg_price"),
        exactAvg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  /** TPC-H Q3-shaped shipping priority: filtered dim broadcast into the fact
    * join, then agg + deterministic top-k.
    */
  def q3ShippingPriority(spark: SparkSession, sfDir: String, segment: String = "BUILDING"): DataFrame = {
    val cust = table(spark, sfDir, "customer").filter(col("c_mktsegment") === segment)
    val ord = table(spark, sfDir, "orders").filter(col("o_orderdate") < lit("1995-03-15").cast("timestamp"))
    val li = table(spark, sfDir, "lineitem").filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(revenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  /** TPC-H Q5-shaped local-supplier volume: star join with every dim
    * broadcast; the fact table is shuffled at most once (on l_orderkey).
    */
  def q5LocalSupplier(spark: SparkSession, sfDir: String, regionName: String = "AFRICA"): DataFrame = {
    val region = table(spark, sfDir, "region").filter(col("r_name") === regionName)
    val nation = table(spark, sfDir, "nation")
    val cust = table(spark, sfDir, "customer")
    val supp = table(spark, sfDir, "supplier")
    val ord = table(spark, sfDir, "orders")
    val li = table(spark, sfDir, "lineitem")
    // customer/supplier scale with SF: no broadcast hint (AQE/size stats
    // decide); nation/region are bounded dims and stay hinted
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(revenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
  }

  /** TPC-H Q17-shaped: revenue from line items whose quantity is below half
    * the part's average. The per-part average is partial-aggregated and
    * joined back; at small SF it broadcasts, at scale it shuffle-joins on
    * the part key.
    */
  def q17SmallQuantity(spark: SparkSession, sfDir: String): DataFrame = {
    val li = table(spark, sfDir, "lineitem")
    val avgQty = li.groupBy(col("l_partkey").as("p_key"))
      .agg((sum(dec(col("l_quantity"))).cast("double") / count(col("l_quantity")).cast("double"))
        .as("avg_qty"))
    // the per-part average scales with SF — let the planner choose the
    // join strategy from size statistics rather than forcing a broadcast
    li.join(avgQty, col("l_partkey") === col("p_key"))
      .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
      .agg(exactSum(col("l_extendedprice")).as("total_price"), count(lit(1)).as("n_items"))
  }

  /** TPC-H Q18-shaped: large orders (HAVING over the fact rollup) joined
    * back to their customers, deterministic top-k.
    */
  def q18LargeOrders(spark: SparkSession, sfDir: String, minQty: Double = 150.0, k: Int = 20): DataFrame = {
    val li = table(spark, sfDir, "lineitem")
    val ord = table(spark, sfDir, "orders")
    val cust = table(spark, sfDir, "customer")
    val big = li.groupBy(col("l_orderkey"))
      .agg(exactSum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > minQty)
    big.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("o_orderkey"), col("o_orderdate"), col("sum_qty"))
      .orderBy(col("sum_qty").desc, col("o_orderkey").asc)
      .limit(k)
  }

  /** TPC-H Q6-shaped forecast revenue: a pure scan + filter + one-row
    * aggregate. Every predicate is a plain column comparison pushed into
    * the parquet scan — the cheapest possible shape, and the benchmark's
    * pushdown canary.
    */
  def q6ForecastRevenue(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24.0)
      .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount"))).cast("double")
        .as("revenue"))

  /** TPC-H Q10-shaped returned-item reporting: revenue lost to returns per
    * customer over a quarter, top k. Fact join shuffles on the order key;
    * the customer and nation dims broadcast.
    */
  def q10ReturnedItems(spark: SparkSession, sfDir: String, k: Int = 20): DataFrame = {
    val li = table(spark, sfDir, "lineitem").filter(col("l_returnflag") === "R")
    val ord = table(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
    val cust = table(spark, sfDir, "customer")
    val nat = table(spark, sfDir, "nation")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(revenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(k)
  }

  /** TPC-H Q15-shaped top supplier: the supplier(s) achieving the maximum
    * quarterly revenue. The fact scan + rollup runs ONCE; the argmax is a
    * global-max window over the rollup, whose single partition holds only
    * supplier-cardinality rows (the same bounded-input rationale as the
    * vocabulary id window) — a separate max-aggregate join would re-scan
    * lineitem for the second plan branch.
    */
  def q15TopSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val rev = table(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(revenueSum(col("l_extendedprice"), col("l_discount")).as("total_revenue"))
    rev.withColumn("max_revenue", max(col("total_revenue")).over(Window.partitionBy()))
      .filter(col("total_revenue") === col("max_revenue"))
      .join(broadcast(table(spark, sfDir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey").asc)
  }

  /** TPC-H Q14-shaped promotion effect: share of monthly revenue from promo
    * parts. One fact shuffle against the broadcast part dim; the share is a
    * conditional aggregate over the same pass (no second scan).
    */
  def q14PromoEffect(spark: SparkSession, sfDir: String): DataFrame = {
    val li = table(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-02-01").cast("timestamp"))
    val part = table(spark, sfDir, "part")
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .agg(
        revenueSum(col("l_extendedprice"), col("l_discount")).as("total_revenue"),
        sum(when(col("p_type").startsWith("PROMO"),
            dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
          .otherwise(lit(0).cast(DecimalType(18, 2)))).cast("double").as("promo_revenue"))
      .withColumn("promo_share",
        when(col("total_revenue") =!= 0.0,
          round(lit(100.0) * col("promo_revenue") / col("total_revenue"), 6)))
  }

  /** TPC-H Q8-shaped national market share: a target nation's share of a
    * region's yearly revenue in one part type. Seven tables: the fact
    * stream shuffles once per fact-fact join (orders); every dim —
    * part filter, customer->nation->region chain, supplier nation —
    * broadcasts. The share is a conditional aggregate per year.
    */
  def q8MarketShare(spark: SparkSession, sfDir: String,
                    nationName: String = "NATION_0", regionName: String = "AFRICA",
                    partType: String = "STANDARD"): DataFrame = {
    val part = table(spark, sfDir, "part").filter(col("p_type").startsWith(partType))
    val nat = table(spark, sfDir, "nation")
    val reg = table(spark, sfDir, "region").filter(col("r_name") === regionName)
    // customers restricted to the target region (the "market")
    val custRegion = table(spark, sfDir, "customer")
      .join(broadcast(nat.select(col("n_nationkey"), col("n_regionkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"))
    // suppliers labeled with their nation name (the "share" dimension)
    val suppNation = table(spark, sfDir, "supplier")
      .join(broadcast(nat.select(col("n_nationkey").as("sn_key"), col("n_name"))),
        col("s_nationkey") === col("sn_key"))
      .select(col("s_suppkey"), col("n_name"))
    table(spark, sfDir, "lineitem")
      .join(broadcast(part.select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
      .join(table(spark, sfDir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(custRegion), col("o_custkey") === col("c_custkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        revenueSum(col("l_extendedprice"), col("l_discount")).as("total_revenue"),
        sum(when(col("n_name") === nationName,
            dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
          .otherwise(lit(0).cast(DecimalType(18, 2)))).cast("double").as("nation_revenue"))
      .withColumn("mkt_share",
        when(col("total_revenue") =!= 0.0,
          round(col("nation_revenue") / col("total_revenue"), 6)))
  }

  /** Top-N rows per group by a metric — the reference's "top themes per
    * episode" shape. Single shuffle on the group key.
    */
  def topNPerGroup(df: DataFrame, groupCols: Seq[Column], orderCol: Column, tiebreak: Column, n: Int): DataFrame = {
    val w = Window.partitionBy(groupCols: _*).orderBy(orderCol.desc, tiebreak.asc)
    df.withColumn("rank_in_group", row_number().over(w)).filter(col("rank_in_group") <= n)
  }
}
