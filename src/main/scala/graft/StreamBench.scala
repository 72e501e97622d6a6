package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.sql.Timestamp

/** Throughput micro-bench for the streaming twins (r10 verdict task #4:
  * StreamingSpec proves stream ≡ batch, but no RATE number existed for the
  * streaming path). For each stateful shape behind q80/q81/q82/q225/q254/
  * q279, the events table is fed through a MemoryStream and the query is
  * timed end-to-end in TWO arrival regimes:
  *
  *  - `onebatch`: all rows pre-added, `Trigger.AvailableNow` — MemoryStream
  *    reports ReadAllAvailable so this processes in a single micro-batch;
  *    the ceiling number (state inserts, no cross-batch replay).
  *  - `inc<k>`: the same rows split into k arrival chunks, one explicit
  *    micro-batch each (`processAllAvailable` after each `addData`) under a
  *    1 h watermark in APPEND mode — per-batch state lookup/update/eviction
  *    and watermark advance included; the number a continuously-running
  *    pipeline actually sustains.
  *
  * Output: one JSON line per (shape, regime) with seconds, input rows and
  * rows/s (min of SPARK_GRAFT_PROBE_RUNS=2 runs), plus a trailing summary
  * line. Archived per-round as STREAMBENCH.json.
  *
  * Sizing note: rows/s here is single-JVM local[N]; state is partitioned by
  * the group key (shuffle-partition count = the CLI's 32), so on a real
  * cluster the same plans scale out with executors — the artifact's value is
  * cross-round comparability, not absolute cluster throughput. */
object StreamBench {

  // tsc as LTZ Timestamp: watermarks require it; session TZ is pinned UTC so
  // wall-clock values match the batch twins' NTZ column (StreamingSpec's Ev)
  case class SEv(event_id: Long, user_id: Long, event_type: String,
    value: Double, tsc: Timestamp)

  val shapes: Seq[(String, DataFrame => DataFrame)] = Seq(
    "tumbling" -> streaming.Streaming.tumbling,
    "sliding" -> streaming.Streaming.sliding,
    "session" -> streaming.Streaming.session,
    "burst" -> streaming.Streaming.burst,
    "daily_pairs" -> streaming.Streaming.dailyPairs,
    // keptHourly sets its own watermark — passed the raw stream
    "kept_hourly" -> ((df: DataFrame) => streaming.Streaming.keptHourly(df)))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROBE_RUNS", "2").toInt
    val nChunks = sys.env.getOrElse("SPARK_GRAFT_STREAM_CHUNKS", "20").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // arrival order = event_id, the same order q279's audit replays
    val rows = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        col("tsc").cast("timestamp").as("tsc"))
      .as[SEv].collect().sortBy(_.event_id).toIndexedSeq
    val n = rows.length
    val chunkSize = math.max(1, (n + nChunks - 1) / nChunks)
    val chunks = rows.grouped(chunkSize).toIndexedSeq

    def f1(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))
    def f3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    var uniq = 0

    def oneBatch(fn: DataFrame => DataFrame): Double = {
      val ms = MemoryStream[SEv]
      ms.addData(rows)
      uniq += 1
      val t0 = System.nanoTime()
      val q = fn(ms.toDF)
        .writeStream.format("memory").queryName(s"sb_$uniq")
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      (System.nanoTime() - t0) / 1e9
    }

    def incremental(name: String, fn: DataFrame => DataFrame): Double = {
      val ms = MemoryStream[SEv]
      uniq += 1
      // kept_hourly carries its own watermark; every other shape gets the
      // same 1 h delay so append mode can finalize+evict as arrivals advance
      val src =
        if (name == "kept_hourly") ms.toDF
        else ms.toDF.withWatermark("tsc", "1 hour")
      val t0 = System.nanoTime()
      val q = fn(src)
        .writeStream.format("memory").queryName(s"sb_$uniq")
        .outputMode("append").start()
      chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
      q.stop(); q.awaitTermination()
      (System.nanoTime() - t0) / 1e9
    }

    val results = shapes.flatMap { case (name, fn) =>
      val ob = (1 to runs).map(_ => oneBatch(fn)).min
      val inc = (1 to runs).map(_ => incremental(name, fn)).min
      println(s"""{"metric":"streambench","shape":"$name","regime":"onebatch","sec":${f3(ob)},"rows":$n,"rows_per_sec":${f1(n / ob)}}""")
      println(s"""{"metric":"streambench","shape":"$name","regime":"inc$nChunks","sec":${f3(inc)},"rows":$n,"rows_per_sec":${f1(n / inc)}}""")
      Seq(name -> ("onebatch", ob), name -> (s"inc$nChunks", inc))
    }
    val summary = results.map { case (name, (reg, t)) =>
      s""""${name}_$reg":${f1(n / t)}""" }.mkString("{", ",", "}")
    println(s"""{"metric":"streambench_summary","unit":"rows_per_sec","rows":$n,"chunks":$nChunks,"runs":$runs,"shapes":$summary,"sf":"$sfDir"}""")
    spark.stop()
  }
}
