package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: time one or more query keys N times in a warm session (the
  * repeat separates plan cost from machine-load noise, which single-shot
  * Bench runs can't).
  * Usage: runMain graft.Time <sfDir> <queryKey>[,<queryKey>...] [reps] */
object Time {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val keys = args(1); val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    keys.split(",").foreach { k =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(k)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIME $k reps=${times.map(t => f"$t%.2f").mkString(",")} min=${times.min}%.2f")
    }
    spark.stop()
  }
}
