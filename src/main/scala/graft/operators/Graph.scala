package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Iterative graph computation over the interaction graph. q93's connected
  * components (Curation) covers the clustering side; this file covers the
  * ranking side: PageRank by power iteration, the canonical "importance on
  * a behavior graph" operator (item authority for recommenders, source
  * authority for corpus curation).
  *
  * Scale notes: the graph is an EDGE LIST DataFrame — never an adjacency
  * structure on the driver. Each power-iteration round is one equi join
  * (rank × normalized edges on src) + one (dst)-keyed aggregation, both
  * hash-partitionable on the node id; the rank relation is one row per
  * node. Per-round lineage is truncated by localCheckpoint (q93's lesson —
  * an iterative join loop otherwise embeds every prior round in its plan).
  * Cross-engine/AQE-proof determinism comes from pinning each round's rank
  * to 10 dp (see Graft.pageRank); a DuckDB oracle reproduces the fixpoint
  * bit-for-bit through five unrolled CTEs.
  */
object Graph {

  /** Item PageRank over the next-item transition graph: q108's edges
    * (consecutive items in each user's event-time sequence, weighted by
    * transition count) feed 5 damped power-iteration rounds; top-20 items
    * by stationary-ish rank. An item many distinct paths flow INTO ranks
    * high even when its raw popularity (q61) is modest — the graph signal
    * popularity counting misses. */
  def q113(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d).select(col("user_id"), col("event_id"), col("tsc"),
      get_json_object(col("props"), "$.k").cast("long").as("item"))
    val w = Window.partitionBy("user_id").orderBy("tsc", "event_id")
    val edges = e.withColumn("prev_item", lag("item", 1).over(w))
      .filter(col("prev_item").isNotNull)
      .groupBy(col("prev_item").as("src"), col("item").as("dst"))
      .agg(count(lit(1)).cast("double").as("wt"))
    graft.api.Graft.pageRank(edges, "src", "dst", "wt", iters = 5)
      .select(col("id").as("item"), r4(col("rank")).as("rank"))
      .orderBy(col("rank").desc, col("item"))
      .limit(20)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q113_item_pagerank" -> q113)

  /** One unrolled power-iteration round: nodes LEFT JOIN the normalized
    * edges on dst (no inbound edges → null → coalesce 0), rank of the
    * source spliced in by a second join; the result pinned to 10 dp with
    * the shared floor formula — identical to the Spark side's pin, so the
    * two engines cannot drift round over round. */
  private def prRound(prev: String, cur: String): String =
    s"""$cur AS (SELECT n.id, ${sqlRnd(
         s"(1e0 - 0.85e0) + 0.85e0 * coalesce(sum($prev.r * ew.p), 0e0)", 10)} AS r
       |  FROM nodes n LEFT JOIN ew ON ew.dst = n.id
       |  LEFT JOIN $prev ON $prev.id = ew.src
       |  GROUP BY n.id)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q113_item_pagerank" ->
      s"""WITH ev AS (SELECT user_id, event_id, ts,
         |    CAST(json_extract(props, '$$.k') AS BIGINT) AS item FROM events),
         |l AS (SELECT user_id, item, lag(item) OVER (
         |    PARTITION BY user_id ORDER BY ts, event_id) AS prev_item FROM ev),
         |e AS (SELECT prev_item AS src, item AS dst, CAST(count(*) AS DOUBLE) AS w
         |  FROM l WHERE prev_item IS NOT NULL GROUP BY 1, 2),
         |deg AS (SELECT src, sum(w) AS t FROM e GROUP BY 1),
         |ew AS (SELECT e.src, e.dst, e.w / deg.t AS p FROM e JOIN deg USING (src)),
         |nodes AS (SELECT DISTINCT src AS id FROM e
         |  UNION SELECT DISTINCT dst FROM e),
         |r0 AS (SELECT id, 1e0 AS r FROM nodes),
         |${prRound("r0", "r1")},
         |${prRound("r1", "r2")},
         |${prRound("r2", "r3")},
         |${prRound("r3", "r4")},
         |${prRound("r4", "r5")}
         |SELECT id AS item, ${sqlRnd("r", 4)} AS rank
         |FROM r5 ORDER BY rank DESC, item LIMIT 20""".stripMargin)
}
