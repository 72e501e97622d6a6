package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** r14 optimization probe: execute one key under the bench action, then
  * dump the FINAL (post-AQE) physical plan with each operator's runtime
  * metrics (rows out, per-operator timing where Spark records one). This
  * is the SQL-tab per-operator view (guide §7.1) in text form, for a
  * headless box. Dev tool only — not part of any timed path.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.Metrics q266[,q265...]
  */
object Metrics {
  private def walk(p: SparkPlan, depth: Int, out: StringBuilder): Unit = {
    val resolved = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case q: QueryStageExec => q.plan
      case other => other
    }
    if (!(resolved eq p)) { walk(resolved, depth, out); return }
    val interesting = p.metrics.toSeq
      .filter { case (_, m) => m.value > 0 }
      .sortBy(_._1)
      .map { case (k, m) => s"$k=${m.value}" }
      .mkString(" ")
    out.append("  " * depth).append(p.nodeName)
    if (interesting.nonEmpty) out.append("  [").append(interesting).append("]")
    out.append('\n')
    p.children.foreach(walk(_, depth + 1, out))
    // follow broadcast/shuffle reuse + subqueries so their cost is visible
    p.subqueries.foreach(walk(_, depth + 1, out))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val keys = args.headOption.getOrElse("q266").split(",").toSeq.map { p =>
      SparkEntry.queries.keys.find(k => k == p || k.startsWith(p + "_"))
        .getOrElse(sys.error(s"unknown query key: $p"))
    }
    val spark = Scratch.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // the bench action as a frame, so the EXECUTED plan (with metrics) is
    // walkable afterwards — Bench.force's own frame is internal to it
    def forced(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}
      def hasMap(dt: DataType): Boolean = dt match {
        case _: MapType => true
        case s: StructType => s.fields.exists(f => hasMap(f.dataType))
        case a: ArrayType => hasMap(a.elementType)
        case _ => false
      }
      val cols = df.schema.fields.map { f =>
        if (hasMap(f.dataType)) xxhash64(to_json(col(f.name)))
        else xxhash64(col(f.name))
      }
      df.select(cols.reduce(_ bitwiseXOR _).as("__h")).agg(expr("bit_xor(__h)"))
    }
    keys.foreach { key =>
      val fn = SparkEntry.queries(key)
      // run twice: run 1 fills memo caches, run 2 is the steady shape
      Bench.force(fn(spark, sfDir))
      val df = forced(fn(spark, sfDir))
      val t0 = System.nanoTime()
      // collect(), not head(): head() plans a SEPARATE limit-1 query
      // execution, leaving this df's executedPlan metrics empty
      df.collect()
      val wall = (System.nanoTime() - t0) / 1e9
      val sb = new StringBuilder
      walk(df.queryExecution.executedPlan, 0, sb)
      println(s"===== $key steady_wall=${"%.3f".format(wall)}s =====")
      println(sb.toString)
    }
    spark.stop()
  }
}
