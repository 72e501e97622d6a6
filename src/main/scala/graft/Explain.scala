package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: print the formatted physical plan of one or more query keys.
  * Usage: runMain graft.Explain <sfDir> <queryKey>[,<queryKey>...]
  * Pass `ALL` as the key list to audit every key (one summary line per
  * query: the join/exchange operators its plan uses). */
object Explain {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, keysArg) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (keysArg == "ALL") {
      val interesting = Seq("BroadcastNestedLoopJoin", "CartesianProduct",
        "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
        "BroadcastExchange", "Exchange", "TakeOrderedAndProject", "Window")
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (k, fn) =>
        val plan = try fn(spark, sfDir).queryExecution.executedPlan.toString
                   catch { case e: Throwable => s"ERROR ${e.getMessage}" }
        val ops = interesting.map(op => op -> s"\\b$op".r.findAllIn(plan).length)
          .collect { case (op, n) if n > 0 => s"$op:$n" }
        println(s"AUDIT $k ${ops.mkString(" ")}")
      }
    } else keysArg.split(",").foreach { k =>
      println(s"\n===================== $k =====================")
      SparkEntry.queries(k)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
