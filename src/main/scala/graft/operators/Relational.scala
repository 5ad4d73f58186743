package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Core relational suite (SURVEY.md paragraph 2 A): the declarative engine the
 * reference's CRUD/stats endpoints reduce to, expressed so Catalyst
 * gets full pushdown/pruning freedom.
 *
 * Float-sum determinism: inexact doubles are summed as DECIMAL(28,6)
 * (exact, order-independent) and cast back — bit-identical to the
 * DuckDB oracle regardless of partial-aggregation order
 * (SURVEY.md paragraph 5).
 */
object Relational {

  /** Order-independent exact sum of a double column. */
  def exactSum(c: Column): Column = sum(c.cast("decimal(28,6)")).cast("double")

  /** TPC-H Q1-style pricing summary. */
  def q1(lineitem: DataFrame): DataFrame = {
    lineitem
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).cast("double").as("sum_qty"),
        exactSum(col("l_extendedprice")).as("sum_base_price"),
        exactSum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        (sum(col("l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
        (exactSum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag").asc, col("l_linestatus").asc)
  }

  /** Order volume per nation: multi-way join with broadcast dims. */
  def q2(customer: DataFrame, orders: DataFrame, nation: DataFrame): DataFrame = {
    orders
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("n_orders"),
        exactSum(col("o_totalprice")).as("total_revenue"),
        countDistinct(col("c_custkey")).as("n_customers"))
      .orderBy(col("n_name").asc)
  }

  /** Top-k by value: plans as TakeOrderedAndProject (no full sort). */
  def q3(orders: DataFrame, k: Int = 10): DataFrame = {
    orders
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderdate"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(k)
  }

  /** Window functions: top-3 orders per customer with running spend. */
  def q4(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    orders
      .withColumn("rk", row_number().over(w))
      .withColumn("running_spend",
        sum(col("o_totalprice").cast("decimal(28,6)"))
          .over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("double"))
      .filter(col("rk") <= 3)
      .select(col("o_custkey"), col("rk"), col("o_orderkey"), col("o_totalprice"),
        col("running_spend"))
      .orderBy(col("o_custkey").asc, col("rk").asc)
  }

  /** Distinct cardinalities of the fact table. */
  def q5(lineitem: DataFrame): DataFrame = {
    lineitem.agg(
      countDistinct(col("l_partkey")).as("n_parts"),
      countDistinct(col("l_suppkey")).as("n_supps"),
      countDistinct(col("l_orderkey")).as("n_orders"),
      count(lit(1)).as("n_rows"))
  }

  /**
   * Grouping-sets rollup: the pricing summary at every aggregation
   * level (flag x status, per-flag subtotal, grand total) in ONE
   * pass — Catalyst expands the grouping sets before the single
   * shuffle, so the three levels cost one aggregate, not three
   * queries. NULL group keys mark subtotal rows exactly as the SQL
   * ROLLUP contract does; grouping_id() disambiguates a genuine NULL
   * from a rollup NULL (none here — the columns are non-null).
   */
  def q7(lineitem: DataFrame): DataFrame = {
    lineitem
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).cast("double").as("sum_qty"),
        exactSum(col("l_extendedprice")).as("sum_price"),
        count(lit(1)).as("n_rows"),
        grouping_id().cast("int").as("gid"))
      .orderBy(col("gid").asc, col("l_returnflag").asc_nulls_last,
        col("l_linestatus").asc_nulls_last)
  }

  /**
   * Conditional-aggregation pivot: per-user event-type counts and
   * value sums as columns — the wide activity-profile table every
   * behavioral feature store materializes. Expressed as CASE-guarded
   * aggregates over a FIXED type list (the reproducible form of
   * `pivot`: no collect-distinct driver pass, and the oracle replays
   * it as plain SQL). One shuffle on user_id with map-side partials.
   */
  def q8Pivot(events: DataFrame,
              types: Seq[String] =
                Seq("view", "click", "purchase", "signup", "error")): DataFrame = {
    val aggs = types.flatMap { tpe =>
      Seq(
        count(when(col("event_type") === tpe, 1)).as(s"n_$tpe"),
        exactSum(when(col("event_type") === tpe, col("value"))
          .otherwise(lit(0.0))).as(s"sum_$tpe"))
    }
    events.groupBy(col("user_id"))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(col("user_id").asc)
  }

  /** Semi/anti join: per-nation customers with and without orders. */
  def q6(customer: DataFrame, orders: DataFrame, nation: DataFrame): DataFrame = {
    val orderCust = orders.select(col("o_custkey")).distinct()
    val withOrders = customer
      .join(orderCust, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_with_orders"))
    val withoutOrders = customer
      .join(orderCust, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_without_orders"))
    broadcast(nation.select(col("n_nationkey"), col("n_name")))
      .join(withOrders, col("n_nationkey") === withOrders("c_nationkey"), "left")
      .drop("c_nationkey")
      .join(withoutOrders, col("n_nationkey") === withoutOrders("c_nationkey"), "left")
      .select(col("n_name"),
        coalesce(col("n_with_orders"), lit(0L)).as("n_with_orders"),
        coalesce(col("n_without_orders"), lit(0L)).as("n_without_orders"))
      .orderBy(col("n_name").asc)
  }
}
