package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** Runs every query and dumps results + oracle SQL; reused by
    * OracleParitySpec in-process (which must not stop the shared session). */
  def run(spark: SparkSession, sfDir: String, outDir: String,
          only: Set[String] = Set.empty): Seq[String] = {
    new java.io.File(outDir).mkdirs()
    val selected =
      if (only.isEmpty) SparkEntry.queries.toSeq
      else SparkEntry.queries.filter(kv => only(kv._1)).toSeq
    // Per-key Spark-side wall seconds, dumped as verify_times.json beside
    // the results: the Verify analogue of Bench's steady_slowest80 line,
    // so oracle-run regressions are trackable from round artifacts alone.
    val times = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    val failed = selected.flatMap { case (name, fn) =>
      try {
        val t0 = System.nanoTime()
        // repartition(1), NOT coalesce(1): coalesce collapses the whole
        // upstream plan into the single write task (q25's grouping-sets
        // agg ran 1-threaded, 6.5 s of a 220 s sf0.01 verify), while
        // repartition shuffles the (small, final) result into one file
        // AFTER the plan has run at full parallelism. Row order in the
        // dump is irrelevant — the driver's compare sort_values both
        // sides before hashing (tools/check.py mirrors it).
        fn(spark, sfDir).repartition(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        times += name -> ((System.nanoTime() - t0) / 1e9)
        None
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        Some(name)
      }
    }
    Files.writeString(Paths.get(s"$outDir/verify_times.json"),
      times.sortBy(-_._2)
        .map { case (k, v) => s""""$k": ${math.round(v * 100) / 100.0}""" }
        .mkString("{", ", ", "}"))
    // Also print the slowest keys as ONE stdout line: the driver archives
    // Verify's tail per round (the way Bench's steady_slowest80 line is),
    // so oracle-run Spark-side regressions become trackable from round
    // artifacts alone instead of only inside the transient outDir.
    println(times.sortBy(-_._2).take(40)
      .map { case (k, v) => s""""$k":${math.round(v * 1000) / 1000.0}""" }
      .mkString(
        s"""{"metric":"verify_slowest40","unit":"sec","n_queries":${times.length},"total":${math.round(times.map(_._2).sum * 10) / 10.0},"queries":{""",
        ",", "}}"))
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val oracles =
      if (only.isEmpty) SparkEntry.oracleSql
      else SparkEntry.oracleSql.filter(kv => only(kv._1))
    val json = oracles
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    failed
  }

  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [comma-separated query names — dev-only filter]
    val sfDir = args(0); val outDir = args(1)
    val only = if (args.length > 2) args(2).split(",").toSet else Set.empty[String]
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Scratch.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // AQE skew-join split: the runtime hot-key guard (see Bench.scala).
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, sfDir, outDir, only)
    spark.stop()
  }
}
