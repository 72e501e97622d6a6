package graft.functions

import graft.Tables._
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** §2.8 UDF/UDAF surface: a scalar Scala UDF and a typed Aggregator UDAF.
  *
  * Scale notes: a Scala UDF breaks whole-stage codegen at its call site (the
  * row is materialized to invoke the closure) — acceptable here because the
  * point of q90 IS the UDF surface; the oracle twin (least/greatest) shows
  * the codegen'd equivalent a production query should prefer. The Aggregator
  * (q91) runs as a typed ImperativeAggregate with map-side partial merge, so
  * it shuffles only (event_type → (sumSq, n)) pairs — constant-size state,
  * scale-safe. */
object Udfs {

  /** q90: clip(value, 1, 5) as a registered Scala UDF. */
  def q90(s: SparkSession, d: String): DataFrame = {
    val clip = udf((v: Double) => math.max(1.0, math.min(5.0, v)))
    events(s, d)
      .select(col("event_id"), col("value"), clip(col("value")).as("clipped"))
      .orderBy("event_id")
  }

  /** RMS Aggregator: sqrt(avg(x²)) with an explicit (sumSq, n) buffer. */
  private object Rms extends Aggregator[Double, (Double, Long), Double] {
    def zero: (Double, Long) = (0.0, 0L)
    def reduce(b: (Double, Long), x: Double): (Double, Long) = (b._1 + x * x, b._2 + 1)
    def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) = (a._1 + b._1, a._2 + b._2)
    def finish(r: (Double, Long)): Double = math.sqrt(r._1 / r._2)
    def bufferEncoder: Encoder[(Double, Long)] = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  def q91(s: SparkSession, d: String): DataFrame = {
    val rms = udaf(Rms)
    events(s, d)
      .groupBy("event_type")
      .agg(r4(rms(col("value"))).as("rms_value"))
      .orderBy("event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q90_udf_scalar" -> q90,
    "q91_udaf_aggregator" -> q91)

  val oracle: Map[String, String] = Map(
    "q90_udf_scalar" ->
      """SELECT event_id, value, least(greatest(value, 1e0), 5e0) AS clipped
        |FROM events ORDER BY event_id""".stripMargin,
    "q91_udaf_aggregator" ->
      s"""SELECT event_type, ${sr4("sqrt(avg(value * value))")} AS rms_value
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
}
