package graft
import org.apache.spark.sql.SparkSession

/** r14 dev probe: report each shared memo's CACHED partition count — the
  * parallelism every downstream per-row pipeline inherits when it scans
  * the cache. Usage: SPARK_GRAFT_SF_DIR=... runMain graft.CacheLayout */
object CacheLayout {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val memos: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      "events" -> Tables.events(spark, sfDir),
      "ratings" -> Tables.ratings(spark, sfDir),
      "capped50" -> Tables.cappedRatings(spark, sfDir),
      "contrib1024" -> Tables.contribRatings(spark, sfDir),
      "pairsupport" -> Tables.pairSupport(spark, sfDir),
      "itemdots" -> Tables.itemDots(spark, sfDir),
      "biasscored" -> Tables.biasScored(spark, sfDir),
      "predsup" -> Tables.predSupport(spark, sfDir))
    memos.foreach { case (name, df) =>
      val n = df.count() // materialize the cache
      val parts = df.rdd.getNumPartitions
      println(s"MEMO $name rows=$n cached_partitions=$parts")
    }
    spark.stop()
  }
}
