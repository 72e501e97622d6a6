package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution window functions, edit distance, and regression aggregates —
  * rounding out the analytical function surface.
  *
  * Scale notes: q38's global distribution ranks are single-partition like
  * q33 (dimension-sized input; at fact scale, pre-aggregate or bucket
  * first). q57 generates candidate pairs by exact prefix join — an
  * inverted-index shape, never all-pairs — then applies the quadratic-cost
  * `levenshtein` only to those few candidates; that cost profile
  * (cheap blocking then expensive verify) is the standard scale pattern for
  * string-distance dedup. q58's regr_* aggregates are single-pass
  * sufficient-statistics (Σx, Σy, Σxy, Σx², n) with map-side combine.
  */
object Analytics {

  /** percent_rank / cume_dist / ntile-free quantile position per supplier. */
  def q38(s: SparkSession, d: String): DataFrame = {
    val w = Window.orderBy(col("s_acctbal").desc, col("s_suppkey"))
    supplier(s, d)
      .select(col("s_suppkey"), col("s_acctbal"),
        r5(percent_rank().over(w)).as("pct_rank"),
        r5(cume_dist().over(w)).as("cume"))
      .orderBy("s_suppkey")
  }

  /** Edit distance over prefix-blocked candidate pairs: docs sharing a
    * 40-char normalized prefix (the corpus's near-dup signature), then exact
    * levenshtein on the full texts. */
  def q57(s: SparkSession, d: String): DataFrame = {
    val p = documents(s, d)
      .select(col("doc_id"), lower(trim(col("text"))).as("t"))
      .withColumn("pfx", substring(col("t"), 1, 40))
    p.select(col("doc_id").as("doc_a"), col("t").as("ta"), col("pfx"))
      .join(p.select(col("doc_id").as("doc_b"), col("t").as("tb"), col("pfx")), "pfx")
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("ta"), col("tb")).cast("long").as("edit_dist"),
        greatest(length(col("ta")), length(col("tb"))).cast("long").as("max_len"))
      .orderBy("doc_a", "doc_b")
  }

  /** Linear-regression aggregates: price-vs-quantity fit per return flag. */
  def q58(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        r4(regr_slope(col("l_extendedprice"), col("l_quantity"))).as("slope"),
        r4(regr_intercept(col("l_extendedprice"), col("l_quantity"))).as("intercept"),
        r5(regr_r2(col("l_extendedprice"), col("l_quantity"))).as("r2"),
        regr_count(col("l_extendedprice"), col("l_quantity")).as("n"))
      .orderBy("l_returnflag")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q38_window_distribution" -> q38,
    "q57_edit_distance" -> q57,
    "q58_regression_aggs" -> q58)

  val oracle: Map[String, String] = Map(
    "q38_window_distribution" ->
      s"""SELECT s_suppkey, s_acctbal,
         |  ${sr5("percent_rank() OVER (ORDER BY s_acctbal DESC, s_suppkey)")} AS pct_rank,
         |  ${sr5("cume_dist() OVER (ORDER BY s_acctbal DESC, s_suppkey)")} AS cume
         |FROM supplier ORDER BY s_suppkey""".stripMargin,
    "q57_edit_distance" ->
      """WITH p AS (SELECT doc_id, lower(trim(text)) AS t,
        |    substr(lower(trim(text)), 1, 40) AS pfx FROM documents)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(levenshtein(a.t, b.t) AS BIGINT) AS edit_dist,
        |  CAST(greatest(length(a.t), length(b.t)) AS BIGINT) AS max_len
        |FROM p a JOIN p b ON a.pfx = b.pfx AND a.doc_id < b.doc_id
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q58_regression_aggs" ->
      s"""SELECT l_returnflag,
         |  ${sr4("regr_slope(l_extendedprice, l_quantity)")} AS slope,
         |  ${sr4("regr_intercept(l_extendedprice, l_quantity)")} AS intercept,
         |  ${sr5("regr_r2(l_extendedprice, l_quantity)")} AS r2,
         |  CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
}
