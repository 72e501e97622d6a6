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

  /** One-pass table profiling (the data-quality primitive run before any
    * training job): per column, row count, non-null count, exact distinct
    * count, and numeric min/max — ALL columns in a single scan. The five
    * `count(DISTINCT ...)` aggregates plan as one Expand (5× row fan-out,
    * row-local) feeding one partial+final aggregation — never five scans
    * of the table, which is what a naive per-column loop would issue at
    * 100 TB. The wide one-row result is reshaped to long with `stack`
    * (row-local, no shuffle). At extreme cardinalities swap the exact
    * distinct for `approx_count_distinct` (HLL, fixed state). */
  def q112(s: SparkSession, d: String): DataFrame = {
    val wide = customer(s, d).agg(
      count(lit(1)).as("n_rows"),
      count(col("c_custkey")).as("nn1"), countDistinct(col("c_custkey")).as("nd1"),
      min(col("c_custkey")).cast("double").as("mn1"), max(col("c_custkey")).cast("double").as("mx1"),
      count(col("c_name")).as("nn2"), countDistinct(col("c_name")).as("nd2"),
      count(col("c_nationkey")).as("nn3"), countDistinct(col("c_nationkey")).as("nd3"),
      min(col("c_nationkey")).cast("double").as("mn3"), max(col("c_nationkey")).cast("double").as("mx3"),
      count(col("c_acctbal")).as("nn4"), countDistinct(col("c_acctbal")).as("nd4"),
      r2(min(col("c_acctbal"))).as("mn4"), r2(max(col("c_acctbal"))).as("mx4"),
      count(col("c_mktsegment")).as("nn5"), countDistinct(col("c_mktsegment")).as("nd5"))
    wide.selectExpr("n_rows", s"""stack(5,
        'c_acctbal',   nn4, nd4, mn4, mx4,
        'c_custkey',   nn1, nd1, mn1, mx1,
        'c_mktsegment',nn5, nd5, cast(null as double), cast(null as double),
        'c_name',      nn2, nd2, cast(null as double), cast(null as double),
        'c_nationkey', nn3, nd3, mn3, mx3) AS (column_name, n_nonnull, n_distinct, min_v, max_v)""")
      .select(col("column_name"), col("n_rows"), col("n_nonnull"),
        col("n_distinct"), col("min_v"), col("max_v"))
      .orderBy("column_name")
  }

  /** Per-group z-score outlier detection (robust filtering before training):
    * event values scored against their event_type's mean/stddev, top-20 by
    * |z|. The stats relation is group-cardinality-sized (5 rows) — AQE
    * broadcasts it; the score is then row-local and the global top-20 is a
    * TakeOrderedAndProject, never a total sort. */
  def q116(s: SparkSession, d: String): DataFrame = {
    val st = events(s, d).groupBy("event_type")
      .agg(avg(col("value")).as("mu"), stddev_samp(col("value")).as("sigma"))
    events(s, d).join(st, "event_type")
      .select(col("event_id"), col("event_type"), r2(col("value")).as("value"),
        r4((col("value") - col("mu")) / col("sigma")).as("z"))
      .orderBy(abs(col("z")).desc, col("event_id"))
      .limit(20)
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
    "q58_regression_aggs" -> q58,
    "q112_table_profile" -> q112,
    "q116_anomaly_zscore" -> q116)

  val oracle: Map[String, String] = Map(
    "q112_table_profile" ->
      s"""WITH p AS (
         |  SELECT 'c_acctbal' AS column_name, count(*) AS n_rows,
         |    count(c_acctbal) AS n_nonnull, count(DISTINCT c_acctbal) AS n_distinct,
         |    ${sr2("min(c_acctbal)")} AS min_v, ${sr2("max(c_acctbal)")} AS max_v
         |  FROM customer
         |  UNION ALL
         |  SELECT 'c_custkey', count(*), count(c_custkey), count(DISTINCT c_custkey),
         |    CAST(min(c_custkey) AS DOUBLE), CAST(max(c_custkey) AS DOUBLE) FROM customer
         |  UNION ALL
         |  SELECT 'c_mktsegment', count(*), count(c_mktsegment),
         |    count(DISTINCT c_mktsegment), NULL, NULL FROM customer
         |  UNION ALL
         |  SELECT 'c_name', count(*), count(c_name), count(DISTINCT c_name),
         |    NULL, NULL FROM customer
         |  UNION ALL
         |  SELECT 'c_nationkey', count(*), count(c_nationkey),
         |    count(DISTINCT c_nationkey),
         |    CAST(min(c_nationkey) AS DOUBLE), CAST(max(c_nationkey) AS DOUBLE) FROM customer)
         |SELECT column_name, n_rows, n_nonnull, n_distinct, min_v, max_v
         |FROM p ORDER BY column_name""".stripMargin,
    "q116_anomaly_zscore" ->
      s"""WITH st AS (SELECT event_type, avg(value) AS mu,
         |    stddev_samp(value) AS sigma FROM events GROUP BY 1)
         |SELECT e.event_id, e.event_type, ${sr2("e.value")} AS value,
         |  ${sr4("(e.value - st.mu) / st.sigma")} AS z
         |FROM events e JOIN st USING (event_type)
         |ORDER BY abs(${sr4("(e.value - st.mu) / st.sigma")}) DESC, e.event_id
         |LIMIT 20""".stripMargin,
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
