package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.1 scans/sources + §2.2 projections/filters.
  *
  * Scale notes: q01/q02 are the pushdown probes — the filter and the 4-column
  * projection must reach the parquet scan (PushedFilters / ReadSchema in
  * `.explain("formatted")`), so at 100 TB only the needed row groups and
  * column chunks are read. No shuffle except the final sort (which is bounded
  * by the limit in q01 via TakeOrderedAndProject).
  */
object Scans {

  def q01(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      // (l_orderkey, l_linenumber) is NOT unique in this corpus (verified at
      // every SF) — order by ALL output columns so any remaining ties are
      // value-identical rows, which hash equal whichever rows the engines
      // pick (caught at sf0.1 in round 2: the limit boundary split a tie).
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .limit(100)

  def q02(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate").between("1997-01-01", "1997-12-31") && col("l_quantity") > lit(45.0))
      .select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity")

  def q03(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_id"), col("tsc"), col("user_id"), col("event_type"),
        r2(col("value")).as("value_r"))
      .orderBy("event_id")

  def q04(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .withColumn("revenue", col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .withColumn("charge", col("revenue") * (lit(1.0) + col("l_tax")))
      .select(col("l_orderkey"), col("l_linenumber"),
        r2(col("revenue")).as("revenue"), r2(col("charge")).as("charge"))
      .orderBy("l_orderkey", "l_linenumber", "revenue", "charge")

  def q05(s: SparkSession, d: String): DataFrame = {
    val p = part(s, d).filter(
      col("p_brand").like("Brand#1%") &&
        col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35, 40, 45) &&
        col("p_retailprice").between(100.0, 1900.0) &&
        col("p_name").isNotNull)
    val l = lineitem(s, d).filter(
      (col("l_discount") > lit(0.05)) || (col("l_tax") < lit(0.02)))
    l.join(p, l("l_partkey") === p("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_lines"),
        r2(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue"))
      .orderBy("p_brand")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_scan_project" -> q01,
    "q02_scan_filter_pushdown" -> q02,
    "q03_scan_events_ns" -> q03,
    "q04_expr_project" -> q04,
    "q05_predicates" -> q05)

  val oracle: Map[String, String] = Map(
    "q01_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |LIMIT 100""".stripMargin,
    "q02_scan_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1997-01-01' AND TIMESTAMP '1997-12-31'
        |  AND l_quantity > 45.0
        |ORDER BY l_orderkey, l_linenumber, l_shipdate, l_quantity""".stripMargin,
    "q03_scan_events_ns" ->
      s"""SELECT event_id, ts AS tsc, user_id, event_type, ${sr2("value")} AS value_r
        |FROM events ORDER BY event_id""".stripMargin,
    "q04_expr_project" ->
      s"""SELECT l_orderkey, l_linenumber,
        |  ${sr2("l_extendedprice * (1.0 - l_discount)")} AS revenue,
        |  ${sr2("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS charge
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, revenue, charge""".stripMargin,
    "q05_predicates" ->
      s"""SELECT p_brand, count(*) AS n_lines,
        |  ${sr2("sum(l_extendedprice * (1.0 - l_discount))")} AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand LIKE 'Brand#1%'
        |  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35, 40, 45)
        |  AND p_retailprice BETWEEN 100.0 AND 1900.0
        |  AND p_name IS NOT NULL
        |  AND (l_discount > 0.05 OR l_tax < 0.02)
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin)
}
