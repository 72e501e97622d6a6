package graft
import org.apache.spark.sql.SparkSession

/** Per-key action-delta probe: times the SAME query under the legacy
  * `count()` action (what BENCH_r01–r09 measured — Catalyst prunes any
  * terminal projection no operator consumes) and the honest full-width
  * `Bench.force` action (BENCH_r10+), min of `runs` each, one JSON line
  * per key.
  *
  * Purpose (r10 verdict watch item): three keys read >2× their r9 driver
  * steady with unchanged code (q17 0.62→2.12 s, q226, q258); the claimed
  * cause is the bench ACTION change concentrating its ~1.19× aggregate
  * cost in projection-terminal keys, but no per-key before/after-action
  * measurement existed. This main IS that measurement: `force/count`
  * ratios far above 1 on the watch keys confirm the action delta;
  * ratios ≈ 1 would instead point at a real plan regression.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.ActionProbe q17,q226,q258
  */
object ActionProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROBE_RUNS", "3").toInt
    val keys = args.headOption.getOrElse("q17,q226,q258").split(",").toSeq
      .map { p =>
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
    spark.sparkContext.setLogLevel("WARN")
    def f3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    keys.foreach { key =>
      val fn = SparkEntry.queries(key)
      // interleave so host drift hits both actions equally; run 1 of each
      // is the shared warm-up (plan compile + input caches) — min absorbs it
      val pairs = (1 to runs).map { _ =>
        (time(fn(spark, sfDir).count()), time(Bench.force(fn(spark, sfDir))))
      }
      val c = pairs.map(_._1).min
      val f = pairs.map(_._2).min
      println(s"""{"metric":"action_delta","key":"$key","count_sec":${f3(c)},"force_sec":${f3(f)},"ratio":${f3(f / math.max(c, 1e-9))},"runs":$runs,"sf":"$sfDir"}""")
    }
    spark.stop()
  }
}
