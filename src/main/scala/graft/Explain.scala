package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: print the formatted physical plan of one or more query keys.
  * Usage: runMain graft.Explain <sfDir> <queryKey>[,<queryKey>...]
  * Pass `ALL` as the key list to audit every key (one summary line per
  * query: the join/exchange operators its plan uses). */
object Explain {
  /** The plan operators the full-inventory audit counts. */
  val interesting: Seq[String] = Seq("BroadcastNestedLoopJoin",
    "CartesianProduct", "BroadcastHashJoin", "SortMergeJoin",
    "ShuffledHashJoin", "BroadcastExchange", "Exchange",
    "TakeOrderedAndProject", "Window")

  /** Operator census of one query's executed plan: Left(error message) if
    * plan construction threw, Right(operator -> occurrence count, zero
    * counts omitted) otherwise. Shared by the `ALL` audit below and
    * PlanAuditSpec (r14) — the suite form of the round ritual, so a
    * cartesian regression (which adds NO exchange and so slips
    * ShuffleCountSpec's budget) fails CI rather than waiting for someone
    * to re-run the manual audit. */
  def census(spark: SparkSession, sfDir: String, key: String,
      fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
      : Either[String, Map[String, Int]] =
    try {
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
      Right(interesting.map(op => op -> s"\\b$op".r.findAllIn(plan).length)
        .filter(_._2 > 0).toMap)
    } catch { case e: Throwable => Left(String.valueOf(e.getMessage)) }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, keysArg) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Scratch.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // SPARK_GRAFT_AQE=0 prints the static (AQE-off) plan — the form
      // ShuffleCountSpec pins, where ReuseExchange applies at planning
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "1") != "0" match { case b => b.toString })
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (keysArg == "ALL") {
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (k, fn) =>
        val ops = census(spark, sfDir, k, fn) match {
          case Left(err) => Seq(s"ERROR $err")
          case Right(counts) =>
            interesting.collect { case op if counts.contains(op) => s"$op:${counts(op)}" }
        }
        println(s"AUDIT $k ${ops.mkString(" ")}")
      }
    } else keysArg.split(",").foreach { k =>
      println(s"\n===================== $k =====================")
      SparkEntry.queries(k)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
