package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** 64-bit-id robustness sweep (r13 verdict task #3, the pinned form of the
  * r12 find-and-fix probe). A 100 TB event log carries snowflake-style ids
  * far beyond ±2³¹, and the r12 sweep proved the hazard class is real:
  * running the full inventory on an id-offset corpus surfaced MLlib ALS
  * narrowing user/item ids to Int (q65/q66 threw CAST_OVERFLOW; every
  * other key ran clean — fixed with the dense-index facade, law pinned in
  * MlSpec). Only ALS's law was pinned; this suite pins the WHOLE
  * inventory: Scale.blowUp's `+ copy·10⁹` offsets at ×5 push user/order/
  * doc/vector ids past Int.MaxValue (copies 3–4 reach 3–4·10⁹), and every
  * key must (a) execute under the full-width force action and (b) — for an
  * id-carrying subset spanning the operator families — return the same
  * result on a second run (an id-overflow that silently WRAPS instead of
  * crashing would show up as hash instability or vanishing groups).
  */
/** Tagged Slow: part of the FULL adversarial profile (the round gate). The
  * fast iteration profile excludes these corpus-rewriting/multi-SF sweeps:
  * `sbt -batch "testOnly * -- -l org.scalatest.tags.Slow"` (see BASELINE.md
  * r12 notes). */
@org.scalatest.tags.Slow
class BigIdSpec extends AnyFunSuite {
  private def s = TestSpark.spark

  /** ×5 uniform blow-up of sf0.001: copy c offsets every id column by
    * c·10⁹, so copies 3–4 hold ids in [3·10⁹, 5·10⁹) — past Int.MaxValue
    * (≈2.15·10⁹). Dims pass through verbatim (dimension ids stay small at
    * any scale; the big-id surface is the fact/event/document side). */
  private lazy val bigDir: String = {
    val dir = Files.createTempDirectory("graft_bigid_sweep").toString
    Scale.blowUp(s, TestSpark.sf0001, dir, 5)
    dir
  }

  private def fingerprint(df: org.apache.spark.sql.DataFrame): String = {
    val lines = df.collect().map(_.toSeq.mkString(",")).sorted
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(lines.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  test("every query survives the 64-bit-id corpus without throwing") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { Bench.force(fn(s, bigDir)); None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(250)}")
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries throw on the big-id corpus:\n" +
        failures.mkString("\n"))
  }

  test("id-carrying subset is run-to-run stable on the 64-bit-id corpus") {
    // One key per id-consuming family: raw scan, ratings-grain CF, the ALS
    // dense-index facade branch, graph fixpoint, window chain, dedup
    // components, join spine, embeddings ANN. A silent Int wrap would
    // collapse distinct ids (vanishing groups) or reorder ties — both move
    // the hash between runs or against the key's own re-execution.
    val subset = Seq(
      "q01_scan_project",        // raw 64-bit ids reach the output
      "q11_join_3way_revenue",   // orderkey join spine at 4e9
      "q32_window_sessionize",   // per-user window over 64-bit user_id
      "q60_ratings_matrix",      // the ratings grain every CF key shares
      "q64_user_knn_predict",    // capped pair self-join on user ids
      "q65_als_recommend",       // the dense-index facade branch itself
      "q71_sim_search_topk",     // vec_id at 4e9
      "q93_dedup_components",    // doc_id union-find labels
      "q113_item_pagerank")      // lag edge build + fixpoint
    subset.foreach { key =>
      val fn = SparkEntry.queries(key)
      val a = fingerprint(fn(s, bigDir))
      val b = fingerprint(fn(s, bigDir))
      assert(a == b, s"$key is not run-to-run stable on the big-id corpus")
    }
  }
}
