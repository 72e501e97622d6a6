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
      itemFromProps.as("item"))
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

  /** Adamic–Adar link prediction over the bipartite user–item graph: score
    * an item pair by Σ 1/ln(deg(u)) over their common users — a shared rare
    * user is stronger evidence than a shared power user (the classic
    * link-prediction / people-also-bought statistic beside q107's PMI,
    * which weights by item marginals instead of neighbor degree).
    *
    * Scale: the common-neighbor enumeration is the q107/q63 self-join on
    * user_id, so the top-50 cappedRatings bound applies — fan-out per user
    * is ≤ C(50,2), never quadratic in catalog size. Degrees are computed
    * once (user-sized relation) and joined back before the pair explosion,
    * so each pair row carries its weight and the score is ONE map-side-
    * combinable sum; 1/ln terms are IEEE-summed and pinned at 4 dp, where
    * the ≤1e-11 order/ulp drift is far below the rounding half-step. */
  def q133(s: SparkSession, d: String): DataFrame =
    graft.api.Graft.adamicAdar(cappedRatings(s, d), "user_id", "item")
      .select(col("item_a"), col("item_b"), col("common_users"),
        r4(col("aa")).as("aa"))
      .orderBy(col("aa").desc, col("item_a"), col("item_b"))
      .limit(20)

  /** Triangle counting on the item co-occurrence graph — the clustering /
    * community-density statistic beside q113's rank and q93's components.
    * Edges are the top-200 co-occurrence pairs by support (deterministic,
    * SF-stable edge set); a triangle is counted once via the id
    * orientation a < b < c: join (a,b)⋈(b,c) on the middle node, then
    * close with (a,c). Per-item participation counts = each triangle
    * contributes to all three corners (explode, not three scans).
    *
    * Scale: everything stays integer (no float discipline needed). At real
    * graph scale the id orientation is replaced by DEGREE orientation
    * (orient each edge low-degree → high-degree) which provably bounds the
    * wedge join by arboricity — id order is kept here because the oracle
    * must reproduce the exact edge orientation cheaply. */
  def q134(s: SparkSession, d: String): DataFrame = {
    val edges = pairSupport(s, d)
      .orderBy(col("c_ab").desc, col("item_a"), col("item_b"))
      .limit(200)
    graft.api.Graft.triangles(edges, "item_a", "item_b")
      .select(col("node").as("item"), col("n_triangles"))
      .orderBy(col("n_triangles").desc, col("item"))
      .limit(20)
  }

  /** Local clustering coefficient on the q134 co-occurrence graph — how
    * CLIQUE-LIKE each item's neighborhood is: coeff = 2T/(d(d−1)) over
    * the same deterministic top-200 edge set, where T is the node's q134
    * triangle count and d its degree. High-coefficient items sit inside
    * tight co-purchase communities (bundle candidates); the graph-density
    * readout beside q113's flow rank and q134's raw triangle counts.
    * Degree-1 nodes have no defined coefficient and are filtered.
    *
    * Determinism: T and d are exact integers; one pinned ratio with
    * (coeff desc, item) order. Scale: inherits q134's shapes — the
    * bounded edge list makes degree a tiny agg and the wedge join
    * arboricity-bounded; at real graph scale the edge set comes from a
    * support threshold instead of top-k, everything else unchanged. */
  def q250(s: SparkSession, d: String): DataFrame = {
    val edges = pairSupport(s, d)
      .orderBy(col("c_ab").desc, col("item_a"), col("item_b"))
      .limit(200)
      .select("item_a", "item_b")
    val deg = edges.select(col("item_a").as("item"))
      .unionAll(edges.select(col("item_b").as("item")))
      .groupBy("item").agg(count(lit(1)).as("degree"))
    val tri = graft.api.Graft.triangles(edges, "item_a", "item_b")
      .withColumnRenamed("node", "item")
    deg.join(tri, Seq("item"), "left")
      .withColumn("n_triangles", coalesce(col("n_triangles"), lit(0L)))
      .filter(col("degree") >= 2)
      .withColumn("clustering_coeff", r4(lit(2.0) * col("n_triangles") /
        (col("degree").cast("double") * (col("degree") - 1).cast("double"))))
      .select("item", "degree", "n_triangles", "clustering_coeff")
      .orderBy(col("clustering_coeff").desc, col("item"))
      .limit(20)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q113_item_pagerank" -> q113,
    "q133_link_predict_aa" -> q133,
    "q134_triangle_count" -> q134,
    "q250_graph_clustering" -> q250)

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

  /** DuckDB twin of [[graft.Tables.cappedRatings]] — assumes an `r` CTE. */
  private val cappedSql =
    s"""capped AS (SELECT user_id, item FROM (
       |    SELECT user_id, item, row_number() OVER (
       |      PARTITION BY user_id ORDER BY ${sr4("rating")} DESC, item) AS rn
       |    FROM r) WHERE rn <= 50)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q133_link_predict_aa" ->
      s"""WITH r AS ($ratingsSql),
         |$cappedSql,
         |deg AS (SELECT user_id, count(*) AS deg FROM capped
         |  GROUP BY 1 HAVING count(*) >= 2),
         |wr AS (SELECT c.user_id, c.item,
         |    1e0 / ln(CAST(deg.deg AS DOUBLE)) AS aa_w
         |  FROM capped c JOIN deg USING (user_id))
         |SELECT a.item AS item_a, b.item AS item_b,
         |  count(*) AS common_users, ${sr4("sum(a.aa_w)")} AS aa
         |FROM wr a JOIN wr b ON a.user_id = b.user_id AND a.item < b.item
         |GROUP BY 1, 2
         |ORDER BY aa DESC, item_a, item_b LIMIT 20""".stripMargin,
    "q134_triangle_count" ->
      s"""WITH r AS ($ratingsSql),
         |$cappedSql,
         |e0 AS (SELECT a.item AS a, b.item AS b, count(*) AS support
         |  FROM capped a JOIN capped b
         |    ON a.user_id = b.user_id AND a.item < b.item
         |  GROUP BY 1, 2 ORDER BY support DESC, a, b LIMIT 200),
         |edges AS (SELECT a, b FROM e0),
         |tri AS (SELECT e1.a, e1.b, e2.b AS c FROM edges e1
         |  JOIN edges e2 ON e1.b = e2.a
         |  JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b)
         |SELECT item, count(*) AS n_triangles FROM (
         |  SELECT unnest([a, b, c]) AS item FROM tri)
         |GROUP BY 1 ORDER BY n_triangles DESC, item LIMIT 20""".stripMargin,
    "q250_graph_clustering" ->
      s"""WITH r AS ($ratingsSql),
         |$cappedSql,
         |e0 AS (SELECT a.item AS a, b.item AS b, count(*) AS support
         |  FROM capped a JOIN capped b
         |    ON a.user_id = b.user_id AND a.item < b.item
         |  GROUP BY 1, 2 ORDER BY support DESC, a, b LIMIT 200),
         |edges AS (SELECT a, b FROM e0),
         |deg AS (SELECT item, CAST(count(*) AS BIGINT) AS degree FROM (
         |    SELECT a AS item FROM edges UNION ALL SELECT b FROM edges)
         |  GROUP BY 1),
         |tri AS (SELECT e1.a, e1.b, e2.b AS c FROM edges e1
         |  JOIN edges e2 ON e1.b = e2.a
         |  JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b),
         |tc AS (SELECT item, CAST(count(*) AS BIGINT) AS n_triangles FROM (
         |    SELECT unnest([a, b, c]) AS item FROM tri) GROUP BY 1)
         |SELECT deg.item, deg.degree,
         |  coalesce(tc.n_triangles, 0) AS n_triangles,
         |  ${sr4("2e0 * coalesce(tc.n_triangles, 0) / (CAST(degree AS DOUBLE) * CAST(degree - 1 AS DOUBLE))")} AS clustering_coeff
         |FROM deg LEFT JOIN tc USING (item)
         |WHERE deg.degree >= 2
         |ORDER BY clustering_coeff DESC, item LIMIT 20""".stripMargin,
    "q113_item_pagerank" ->
      s"""WITH ev AS (SELECT user_id, event_id, ts,
         |    TRY_CAST(json_extract(props, '$$.k') AS BIGINT) AS item FROM events),
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
