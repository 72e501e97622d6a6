package graft

import scala.io.Source

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite

/** Shuffle-budget pin: every key's static plan (AQE off) must keep its
  * ShuffleExchange count at or below the recorded budget in
  * `src/test/resources/shuffle_budget.txt`.
  *
  * Every `groupBy`/`join`/`distinct`/`repartition` that is not broadcast-
  * or bucket-co-located is an exchange, and an exchange is the unit of
  * cost that grows with cluster size — at 100 TB an accidental extra
  * shuffle is the difference between one network pass over the corpus and
  * two. The bench only catches such a regression if it moves seconds at
  * sf0.1; this pin catches it structurally at sf0.001, per key, before it
  * costs anything. Budgets are the measured counts at pin time (Spark
  * 4.1.2): a change that REDUCES shuffles passes (tighten the file when
  * deliberate); a change that adds one fails until the budget is re-pinned
  * with justification. The same iterative/model keys skipped by the other
  * inventory sweeps are skipped here (their construction runs jobs; each
  * has its own plan or quantitative coverage), and the key sets must match
  * the file exactly so a new query cannot land unpinned.
  */
class ShuffleCountSpec extends AnyFunSuite {
  private val s = TestSpark.spark
  private val d = TestSpark.sf0001

  test("shuffle budget pin: no key's static plan exceeds its recorded exchange count") {
    val skip = Set("q65_als_recommend", "q66_als_rmse",
      "q70_dedup_near_minhash", "q93_dedup_components", "q101_dedup_cluster_keep",
      "q105_curation_pipeline", "q113_item_pagerank", "q252_pca_power",
      "q264_logreg_step")
    val src = Source.fromInputStream(
      getClass.getResourceAsStream("/shuffle_budget.txt"), "UTF-8")
    val budget: Map[String, Int] =
      try src.getLines().filter(_.nonEmpty).map { l =>
        val Array(k, n) = l.trim.split("\\s+"); k -> n.toInt
      }.toMap finally src.close()

    val keys = SparkEntry.queries.keySet.filterNot(skip)
    val unpinned = keys -- budget.keySet
    val stale = budget.keySet -- keys
    assert(unpinned.isEmpty,
      s"keys missing from shuffle_budget.txt (pin them): ${unpinned.toSeq.sorted.mkString(", ")}")
    assert(stale.isEmpty,
      s"stale entries in shuffle_budget.txt: ${stale.toSeq.sorted.mkString(", ")}")

    s.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val over = keys.toSeq.sorted.flatMap { name =>
        val n = SparkEntry.queries(name)(s, d).queryExecution.executedPlan
          .collect { case e: ShuffleExchangeExec => e }.size
        if (n > budget(name)) Some(s"$name ($n exchanges, budget ${budget(name)})")
        else None
      }
      assert(over.isEmpty,
        s"plans exceeding their shuffle budget:\n  ${over.mkString("\n  ")}")
    } finally s.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
