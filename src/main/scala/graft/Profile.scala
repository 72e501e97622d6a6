package graft
import org.apache.spark.sql.SparkSession

/** r14 optimization probe: per-key job/stage/task census under the bench
  * action. Wall time at the bench SFs is dominated by SEQUENTIAL STAGE
  * ROUNDS (each AQE stage is a scheduling round trip), not bytes — this
  * main makes that visible per key so "remove a shuffle / fuse a job"
  * work can be targeted and verified (guide §1: measure first, §2.4:
  * remove shuffles outright).
  *
  * For each key: `runs` forced executions (min wall), with a listener
  * counting jobs, stages and tasks of the LAST (steady) run only —
  * run 1 absorbs memo/cache builds exactly as in Bench.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.Profile q210,q243
  *        (or ALL for the full inventory, slowest first by wall)
  */
object Profile {
  private class Census extends org.apache.spark.scheduler.SparkListener {
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
      jobs.incrementAndGet()
    override def onStageCompleted(
        e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      stages.incrementAndGet()
      tasks.addAndGet(e.stageInfo.numTasks.toLong)
    }
    override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) taskMs.addAndGet(m.executorRunTime)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROBE_RUNS", "3").toInt
    val arg = args.headOption.getOrElse("q210")
    val keys =
      if (arg == "ALL") SparkEntry.queries.keys.toSeq.sorted
      else arg.split(",").toSeq.map { p =>
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
    def f3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val out = keys.map { key =>
      val fn = SparkEntry.queries(key)
      spark.sparkContext.setJobDescription(s"profile:$key")
      var wallMin = Double.MaxValue
      var census: Census = null
      (1 to runs).foreach { i =>
        val c = new Census
        spark.sparkContext.addSparkListener(c)
        val t0 = System.nanoTime()
        try Bench.force(fn(spark, sfDir))
        catch { case e: Throwable =>
          System.err.println(s"[profile] $key failed: ${e.getMessage}") }
        val w = (System.nanoTime() - t0) / 1e9
        Bench.drainTallies(new Bench.TaskTally) // small settle for the bus
        spark.sparkContext.removeSparkListener(c)
        if (i == runs) census = c // steady-run census
        if (w < wallMin) wallMin = w
      }
      (key, wallMin, census)
    }
    out.sortBy(-_._2).foreach { case (k, w, c) =>
      println(s"""{"metric":"profile","key":"$k","wall_sec":${f3(w)},""" +
        s""""jobs":${c.jobs.get},"stages":${c.stages.get},"tasks":${c.tasks.get},""" +
        s""""task_sec":${f3(c.taskMs.get / 1e3)}}""")
    }
    spark.stop()
  }
}
