package graft

import org.scalatest.funsuite.AnyFunSuite
import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

/** Thread-safety of the shared surfaces (r13). The Tables scaladoc claims a
  * "long-lived multi-session service" can sit on this library, and a real
  * deployment runs MANY queries against one SparkSession at once — Spark's
  * own actions are thread-safe, so the library's exposure is its session
  * memo system: the catalog-view memos (double-build under racing callers
  * would waste a cache slot or, worse, let one caller read a half-registered
  * view) and the conf-parked count/flag memos (benign last-write-wins by
  * construction — both writers compute the same corpus fact). This pins:
  *  - N racing callers of a COLD memo produce exactly ONE catalog view and
  *    all see the same data (the Tables.synchronized build path);
  *  - a concurrent slice of the inventory returns bit-identical results to
  *    its own sequential run (no cross-query state bleeds through the
  *    shared session).
  */
class ConcurrencySpec extends AnyFunSuite {
  private def s = TestSpark.spark
  private val d = TestSpark.sf0001

  private def onPool[T](n: Int)(work: Int => T): Seq[T] = {
    val exec = Executors.newFixedThreadPool(n)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(exec)
    try Await.result(Future.sequence((1 to n).map(i => Future(work(i)))), 5.minutes)
    finally exec.shutdown()
  }

  test("8 racing callers of a cold memo build exactly one catalog view and agree on the data") {
    // a fresh corpus dir so THIS test owns the memo lifecycle (sf0.001's
    // events memo is long warm from other suites)
    val dir = java.nio.file.Files.createTempDirectory("graft_conc").toString
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"${d}/events.parquet")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val counts = onPool(8)(_ => Tables.events(s, dir).count())
    assert(counts.distinct == Seq(1000L),
      s"racing callers disagreed on the memoized relation: $counts")
    // exactly one events view for this corpus (memoName embeds the
    // sanitized dir, so other suites' events memos don't collide here)
    val sane = dir.replaceAll("[^A-Za-z0-9]", "_").takeRight(40)
    val views = s.catalog.listTables().collect().map(_.name)
      .filter(n => n.startsWith("graft_memo_events") && n.contains(sane))
    assert(views.size == 1,
      s"racing callers must share ONE memo build, found: ${views.toSeq}")
  }

  test("a concurrent inventory slice returns bit-identical results to its sequential run") {
    // one key per shared-state family: raw scan, dim join, grouped agg,
    // window sessionize, dedup-first, the ratings grain, the shingle
    // grain, hash sampling, BM25 (query-table broadcast), rolling WAU,
    // histogram, text stats — diverse enough that a cross-query bleed
    // (a memo built under the wrong key, a conf flipped mid-flight)
    // lands on at least one of them
    val keys = Seq("q01_scan_project", "q11_join_3way_revenue",
      "q29_agg_quantiles", "q32_window_sessionize", "q44_dedup_exact",
      "q60_ratings_matrix", "q76_dedup_ngram_jaccard", "q94_sample_stratified",
      "q100_bm25_rank", "q121_rolling_active_users",
      "q128_equidepth_histogram", "q98_text_repetition")
    def fingerprint(key: String): String = {
      val rows = SparkEntry.queries(key)(s, d).collect()
        .map(_.toSeq.mkString(",")).sorted
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(rows.mkString("\n").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }
    val sequential = keys.map(k => k -> fingerprint(k)).toMap
    val pool = Executors.newFixedThreadPool(keys.size)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    val concurrent =
      try Await.result(
        Future.sequence(keys.map(k => Future(k -> fingerprint(k)))), 10.minutes).toMap
      finally pool.shutdown()
    keys.foreach { k =>
      assert(concurrent(k) == sequential(k),
        s"$k returned different results under concurrent execution")
    }
  }

  test("release() in one session racing queries in another keeps results correct (the shared-CacheManager rebuild path)") {
    // The one multi-session edge r13 left unpinned (r13 verdict, missing
    // #3): Spark's CacheManager is CONTEXT-shared, so session A's
    // Tables.release() also evicts session B's identical-plan cache entry.
    // B's memo VIEW survives in its own catalog (views are session-scoped),
    // so B's queries must transparently fall back to the uncached plan —
    // slower, never wrong. Race an A-side release/rebuild loop against
    // B-side query replays and assert every B result is bit-identical to
    // its pre-race fingerprint; then measure the rebuild cost once for the
    // release() scaladoc.
    val dir = java.nio.file.Files.createTempDirectory("graft_rel_race").toString
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$d/events.parquet")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val sA = s.newSession()
    val sB = s.newSession()
    def fpB(): String = {
      val rows = SparkEntry.queries("q32_window_sessionize")(sB, dir).collect()
        .map(_.toSeq.mkString(",")).sorted
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(rows.mkString("\n").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }
    try {
      Tables.events(sA, dir).count() // A shares B's canonical events plan
      val expected = fpB()           // warm + fingerprint B before the race
      val results = onPool(2) {
        case 1 => Left((1 to 4).map(_ => fpB()))
        case _ => Right((1 to 8).foreach { _ =>
          Tables.release(sA)                // evicts the shared cache entry
          Tables.events(sA, dir).count()    // and A immediately rebuilds it
        })
      }
      val bFps = results.collectFirst { case Left(fps) => fps }.get
      assert(bFps.forall(_ == expected),
        s"a mid-flight release() changed another session's results: $bFps")
      // quantify the rebuild penalty once (cited in Tables.release's
      // scaladoc): B warm-cached vs B straight after a cross-session evict
      def time(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      fpB() // ensure warm
      val warm = time(fpB())
      Tables.release(sA)
      val evicted = time(fpB())
      info(f"q32 on events at sf0.001: warm-cached $warm%.3f s, " +
        f"post-cross-session-evict $evicted%.3f s (uncached rebuild)")
    } finally {
      Tables.release(sA)
      Tables.release(sB)
    }
  }
}
