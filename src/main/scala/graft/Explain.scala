package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: print the formatted physical plan of one or more query keys.
  * Usage: runMain graft.Explain <sfDir> <queryKey>[,<queryKey>...] */
object Explain {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, keys) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    keys.split(",").foreach { k =>
      println(s"\n===================== $k =====================")
      SparkEntry.queries(k)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
