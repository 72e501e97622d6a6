package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._
import graft.functions._

/** Driver contract — see /root/repo/SURVEY.md §2 (the binding inventory) and
  * §7 (build plan). Each family object under graft.operators / graft.functions
  * contributes a `queries` map (Spark impls) and an `oracle` map (DuckDB SQL
  * twins); this object is just the assembly point.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Aggregates.q20(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Scans.queries ++ Joins.queries ++ Aggregates.queries ++
      Windows.queries ++ SetOps.queries ++ Scalars.queries ++
      Recommender.queries ++ Udfs.queries ++
      LlmPipeline.queries ++ TextPipeline.queries ++
      Workloads.queries ++ Analytics.queries ++
      Curation.queries ++ Retrieval.queries ++ Graph.queries ++
      graft.streaming.Streaming.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Scans.oracle ++ Joins.oracle ++ Aggregates.oracle ++
      Windows.oracle ++ SetOps.oracle ++ Scalars.oracle ++
      Recommender.oracle ++ Udfs.oracle ++
      LlmPipeline.oracle ++ TextPipeline.oracle ++
      Workloads.oracle ++ Analytics.oracle ++
      Curation.oracle ++ Retrieval.oracle ++ Graph.oracle ++
      graft.streaming.Streaming.oracle
}
