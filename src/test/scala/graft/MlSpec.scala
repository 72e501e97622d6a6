package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** ML validity tests (SURVEY §5.4): seeded determinism, quality thresholds,
  * LSH model laws, and the q22 approx-distinct accuracy bound that has no
  * SQL oracle (ADVICE r1). */
class MlSpec extends AnyFunSuite {
  private def s = TestSpark.spark
  private val d = TestSpark.sf0001

  test("ALS with seed=42 is run-to-run deterministic") {
    val a = operators.Recommender.q65(s, d).collect()
    val b = operators.Recommender.q65(s, d).collect()
    assert(a.sameElements(b))
  }

  test("ALS recommends exactly 5 items per user") {
    val perUser = operators.Recommender.q65(s, d)
      .groupBy("user_id").count().select("count").distinct().collect()
    assert(perUser.map(_.getLong(0)).toSeq == Seq(5L))
  }

  test("ALS holdout RMSE is finite and within 2x of the global-mean baseline") {
    // The synthetic ratings (avg event value per user-item) carry no latent
    // structure for ALS to exploit, so it cannot beat the global mean here —
    // assert it trains, predicts, and stays in the same error regime.
    val Array(train, test) = Tables.ratings(s, d).randomSplit(Array(0.8, 0.2), 42)
    val mean = train.agg(avg("rating")).head().getDouble(0)
    val baselineRmse = math.sqrt(test
      .agg(avg(pow(col("rating") - lit(mean), 2))).head().getDouble(0))
    val alsRmse = operators.Recommender.q66(s, d).head().getDouble(1)
    assert(alsRmse > 0 && !alsRmse.isNaN)
    assert(alsRmse < 2 * baselineRmse,
      s"ALS rmse $alsRmse should be within 2x of baseline $baselineRmse")
  }

  // Every shipped SF: the sketch error bounds must hold at each scale the
  // driver can point the library at, not just the smallest (r6 verdict #7).
  private val allSfs = Seq("sf0.001" -> TestSpark.sf0001,
    "sf0.01" -> TestSpark.sf001, "sf0.1" -> TestSpark.sf01)

  test("q59 approx_percentile within 2% of q29's exact quantiles at every SF") {
    allSfs.foreach { case (sf, dir) =>
      val exact = operators.Aggregates.q29(s, dir).collect()
        .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
      val approx = operators.Aggregates.q59(s, dir).collect()
        .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
      assert(approx.keySet == exact.keySet, sf)
      exact.foreach { case (k, (p50, p90)) =>
        assert(math.abs(approx(k)._1 - p50) / p50 <= 0.02, s"$sf $k p50")
        assert(math.abs(approx(k)._2 - p90) / p90 <= 0.02, s"$sf $k p90")
      }
    }
  }

  test("q22 approx_count_distinct within 3*rsd of exact at every SF") {
    allSfs.foreach { case (sf, dir) =>
      val approx = operators.Aggregates.q22(s, dir).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val exact = Tables.events(s, dir).groupBy("event_type")
        .agg(countDistinct("user_id").as("n")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(approx.keySet == exact.keySet, sf)
      exact.foreach { case (k, ex) =>
        val err = math.abs(approx(k) - ex).toDouble / ex
        assert(err <= 3 * 0.02, s"$sf $k: approx=${approx(k)} exact=$ex err=$err")
      }
    }
  }

  test("HLL sketches are MERGEABLE: per-partition sketch union equals whole-set estimate, every SF") {
    // the 100 TB pattern SURVEY §4 candidate 2 asks about: build one HLL
    // sketch per shard (day/partition), union the binary sketches, estimate
    // once — no re-scan of raw data. Spark 4's DataSketches functions.
    import org.apache.spark.sql.functions.{hll_sketch_agg, hll_sketch_estimate, hll_union_agg}
    allSfs.foreach { case (sf, dir) =>
      val ev = Tables.events(s, dir)
      val perType = ev.groupBy("event_type")
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
      val merged = perType.agg(
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
        .head().getLong(0)
      val direct = ev.agg(
        hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
        .head().getLong(0)
      val exact = ev.select("user_id").distinct().count()
      // Merging shard sketches must match sketching the whole set. The match
      // is EXACT only while sketches are in sparse/coupon mode (small
      // cardinalities — sf0.001/sf0.01 here); past the promotion threshold
      // the union's target-type conversion can shift the estimate by ~1%
      // (measured at sf0.1: union 1488 vs direct 1499, exact 1500), so the
      // law is asserted with that tolerance and both vs exact at 5%.
      assert(math.abs(merged - direct).toDouble / direct < 0.02,
        s"$sf: sketch union ($merged) too far from whole-set sketch ($direct)")
      assert(math.abs(merged - exact).toDouble / exact < 0.05,
        s"$sf: HLL union estimate $merged vs exact $exact")
      assert(math.abs(direct - exact).toDouble / exact < 0.05,
        s"$sf: HLL direct estimate $direct vs exact $exact")
    }
  }

  test("MinHashLSH q70 is seed-stable and symmetric-by-construction") {
    val a = operators.LlmPipeline.q70(s, d).collect()
    val b = operators.LlmPipeline.q70(s, d).collect()
    assert(a.sameElements(b))
    // pairs are emitted once with doc_a < doc_b — no duplicate mirror rows
    val t = operators.LlmPipeline.q70(s, d)
    assert(t.filter(col("doc_a") >= col("doc_b")).count() == 0)
    assert(t.select("doc_a", "doc_b").distinct().count() == t.count())
    // distances are valid Jaccard distances
    val mm = t.agg(min("dist"), max("dist")).head()
    if (t.count() > 0) assert(mm.getDouble(0) >= 0.0 && mm.getDouble(1) <= 0.6)
  }

  test("ml.feature surface: Tokenizer -> HashingTF -> IDF, StringIndexer, MinMaxScaler (SURVEY §2.8)") {
    import org.apache.spark.ml.feature._
    val docs = Tables.documents(s, d)
    val tok = new Tokenizer().setInputCol("text").setOutputCol("words")
    val tf = new HashingTF().setInputCol("words").setOutputCol("tf").setNumFeatures(1 << 12)
    val tfDf = tf.transform(tok.transform(docs))
    val idf = new IDF().setInputCol("tf").setOutputCol("tfidf").fit(tfDf)
    val tfidf = idf.transform(tfDf)
    assert(tfidf.count() == 500)
    // hash-bucketed vectors are model-bound (why q68 is pure-DataFrame):
    // just assert shape + non-degeneracy
    val v = tfidf.select("tfidf").head().getAs[org.apache.spark.ml.linalg.Vector](0)
    assert(v.size == (1 << 12) && v.numNonzeros > 0)

    val idx = new StringIndexer().setInputCol("lang").setOutputCol("lang_idx")
      .setStringOrderType("alphabetAsc").fit(docs)
    val indexed = idx.transform(docs)
    assert(indexed.select("lang_idx").distinct().count() == 5)

    val ratings = Tables.ratings(s, d)
    val va = new VectorAssembler().setInputCols(Array("rating")).setOutputCol("rv")
    val scaled = new MinMaxScaler().setInputCol("rv").setOutputCol("scaled")
      .fit(va.transform(ratings)).transform(va.transform(ratings))
    val mm = scaled.select("scaled").collect()
      .map(_.getAs[org.apache.spark.ml.linalg.Vector](0)(0))
    assert(mm.min >= 0.0 && mm.max <= 1.0 + 1e-9)
  }

  test("near-dup detection finds the corpus's near-duplicates at sf0.01") {
    // sf0.01 has verified shared-prefix near-dup groups; the LSH join must
    // surface at least one pair (recall > 0)
    assert(operators.LlmPipeline.q70(s, TestSpark.sf001).count() > 0)
  }

  test("q70 at sf0.1: pairs stay canonical, deduplicated, and distance-bounded") {
    val t = operators.LlmPipeline.q70(s, TestSpark.sf01).cache()
    try {
      assert(t.count() > 0, "sf0.1 corpus has near-dups; recall must be > 0")
      assert(t.filter(col("doc_a") >= col("doc_b")).count() == 0)
      assert(t.select("doc_a", "doc_b").distinct().count() == t.count())
      val mm = t.agg(min("dist"), max("dist")).head()
      assert(mm.getDouble(0) >= 0.0 && mm.getDouble(1) <= 0.6)
    } finally t.unpersist()
  }

  /** Deterministic fingerprint: sha256 over the sorted row renderings. Any
    * silent MLlib behavior change (initialization, solver order, default
    * flip) moves it, failing loudly instead of shipping changed recs. */
  private def fingerprint(df: org.apache.spark.sql.DataFrame): String = {
    val lines = df.collect().map(_.toSeq.mkString(",")).sorted
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(lines.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  test("ALS golden: block-cohort fixture pins the full top-5 ranking across numUserBlocks 2 vs 4 x shuffle partitions 4 vs 13") {
    // r10 verdict task #6 (top-1), extended per r11 verdict task #6 to the
    // FULL ranked list and a shuffle-partition axis. q65/q66 are the only
    // keys bound purely by seed+threshold tests; this constructed fixture
    // pins the actual SOLUTION. Two disjoint taste cohorts with a strong
    // in-cohort preference ladder (5 > 3 > 1 margins): any converged
    // factorization must rank the 5-rated item first and the 3-rated item
    // second for every user — a rank-2..5 reordering a top-1 pin would
    // miss now fails. ALS factor INIT depends on the block partitioning
    // (per-block RNG streams), so exact factors and the weakly-determined
    // TAIL order (the two out-of-cohort items, both rated ~1 or unseen)
    // may differ between block counts — the pinned invariants are the
    // strong head (positions 1-2) under every config, the tail as a SET,
    // and full-list invariance across the SHUFFLE-PARTITION axis at fixed
    // blocks (partition count must never change a result; only the block
    // axis reseeds init). */
    import org.apache.spark.ml.recommendation.ALS
    val sp = s; import sp.implicits._
    val ratings = Seq(
      (1, 11, 5f), (1, 12, 3f), (1, 21, 1f),
      (2, 11, 5f), (2, 12, 3f), (2, 22, 1f),
      (3, 11, 5f), (3, 12, 3f), (3, 21, 1f),
      (4, 21, 5f), (4, 22, 3f), (4, 11, 1f),
      (5, 21, 5f), (5, 22, 3f), (5, 12, 1f),
      (6, 21, 5f), (6, 22, 3f), (6, 11, 1f))
      .toDF("user_id", "item", "rating")
    val goldenHead = Map(
      1 -> Seq(11, 12), 2 -> Seq(11, 12), 3 -> Seq(11, 12),
      4 -> Seq(21, 22), 5 -> Seq(21, 22), 6 -> Seq(21, 22))
    val allItems = Set(11, 12, 21, 22)
    val priorParts = s.conf.get("spark.sql.shuffle.partitions")
    def fitAndRank(blocks: Int, parts: Int): Map[Int, Seq[Int]] = {
      s.conf.set("spark.sql.shuffle.partitions", parts.toString)
      try {
        val model = new ALS()
          .setUserCol("user_id").setItemCol("item").setRatingCol("rating")
          .setRank(8).setMaxIter(10).setRegParam(0.1).setSeed(42)
          .setNumUserBlocks(blocks).setNumItemBlocks(blocks)
          .setColdStartStrategy("drop")
          .fit(ratings)
        model.recommendForAllUsers(5)
          .select(col("user_id"), col("recommendations.item").as("items"))
          .collect()
          .map(r => r.getInt(0) -> r.getSeq[Int](1).toList).toMap
      } finally s.conf.set("spark.sql.shuffle.partitions", priorParts)
    }
    val grid = for (blocks <- Seq(2, 4); parts <- Seq(4, 13))
      yield (blocks, parts) -> fitAndRank(blocks, parts)
    grid.foreach { case ((blocks, parts), got) =>
      assert(got.keySet == goldenHead.keySet,
        s"blocks=$blocks parts=$parts: user set moved: ${got.keySet}")
      goldenHead.foreach { case (u, head) =>
        assert(got(u).take(2) == head,
          s"blocks=$blocks parts=$parts user=$u: head ranking diverged: ${got(u)}")
        assert(got(u).toSet == allItems,
          s"blocks=$blocks parts=$parts user=$u: ranked set moved: ${got(u)}")
      }
    }
    // the shuffle-partition axis must be a pure no-op on the FULL list at
    // fixed blocks: only the block axis is allowed to reseed factor init
    Seq(2, 4).foreach { blocks =>
      val byParts = grid.collect { case ((b, p), m) if b == blocks => p -> m }
      assert(byParts.head._2 == byParts.last._2,
        s"blocks=$blocks: full top-5 changed with shuffle partitions " +
          s"${byParts.head._1} vs ${byParts.last._1}")
    }
  }

  test("q65/q66 pinned at seed=42: ALS outputs match their recorded fingerprints") {
    // Pins computed on Spark 4.1.2 at sf0.001 (r7; q66 re-pinned r14). The
    // scores/errors are 4 dp-rounded before hashing, so only a genuine
    // factor-matrix change (not float noise far below the pin) can move
    // these. The factor matrix IS a function of the training input's
    // physical layout — MLlib ALS seeds factor init per block from the
    // input partitioning — so a deliberate layout change upstream moves
    // the pin: r14's events-cache spread (Tables.spreadNarrow) changed the
    // ratings memo's partitioning and moved q66's holdout metrics at the
    // 4 dp grid (q65's top-k ranking survived). The quantitative laws
    // (RMSE threshold, block/parts invariance grid above) are the
    // semantic contract; this pin is the determinism tripwire for the
    // CURRENT layout.
    val f65 = fingerprint(operators.Recommender.q65(s, d))
    val f66 = fingerprint(operators.Recommender.q66(s, d))
    assert(f65 == "cc83cd93fce20aabfe249977456bca49ef9bc019280dc85513d1316b7d348345", s"q65 recommendation fingerprint moved: $f65")
    assert(f66 == "3df7b23ddef554047e5b08af355ddb325d8d3ef5b17c2e10de7267d64cd8ee54", s"q66 holdout-metrics fingerprint moved: $f66")
  }

  test("dedup family consistency: MinHash, exact Jaccard, and SimHash agree on near-dups") {
    val d01 = TestSpark.sf001
    val minhash = operators.LlmPipeline.q70(s, d01).select("doc_a", "doc_b")
    val exact = operators.TextPipeline.q76(s, d01).select("doc_a", "doc_b")
    val simhash = operators.TextPipeline.q86(s, d01).select("doc_a", "doc_b")
    // the approximate methods must each recover part of the exact-Jaccard
    // near-dup set (recall > 0 given the corpus has true near-dups)
    assert(exact.count() > 0)
    assert(minhash.intersect(exact).count() > 0)
    assert(simhash.intersect(exact).count() > 0)
  }

  test("IVF search (q85) is bounded by brute force (q71) per probe") {
    val d01 = TestSpark.sf001
    val ivf1 = operators.TextPipeline.q85(s, d01)
      .filter(col("rnk") === 1).select(col("probe_id"), col("cos").as("ivf_cos"))
    val bf1 = operators.LlmPipeline.q71(s, d01)
      .filter(col("rnk") === 1).select(col("probe_id"), col("cos").as("bf_cos"))
    // cell-restricted top-1 can never beat the global top-1
    val bad = ivf1.join(bf1, "probe_id")
      .filter(col("ivf_cos") > col("bf_cos") + 1e-9)
    assert(bad.count() == 0)
  }

  test("ALS big-id facade: 64-bit ids fit via the dense index and map back (r12)") {
    // MLlib ALS narrows ids to Int and raises CAST_OVERFLOW beyond ±2^31 —
    // found by running the inventory on an id-offset corpus (every other
    // key ran clean). The facade must (a) not crash, (b) return the
    // ORIGINAL 64-bit ids, (c) stay deterministic (sorted dense index +
    // fixed seed). The small-id identity path is pinned separately by the
    // seed-42 fingerprints above — this corpus triggers the other branch.
    val dir = java.nio.file.Files.createTempDirectory("graft_bigid").toString
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val OFF = 3000000000L // pushes every user_id past Int.MaxValue
    s.read.parquet(s"${TestSpark.sf0001}/events.parquet")
      .withColumn("user_id", col("user_id") + lit(OFF))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val recs = operators.Recommender.q65(s, dir).collect()
    assert(recs.nonEmpty, "big-id corpus must fit, not crash")
    assert(recs.forall(_.getLong(0) >= OFF),
      "user ids must map back to the original 64-bit universe")
    val origItems = Tables.ratings(s, TestSpark.sf0001)
      .select("item").distinct.collect().map(_.getLong(0)).toSet
    assert(recs.map(_.getLong(2)).toSet.subsetOf(origItems),
      "item ids must map back to the original item universe")
    val perUser = recs.groupBy(_.getLong(0)).values
    assert(perUser.forall(g => g.map(_.getLong(1)).sorted.sameElements(1L to g.size)),
      "ranks stay 1..k per user after the back-join")
    val again = operators.Recommender.q65(s, dir).collect()
    assert(recs.map(_.toString).sorted.sameElements(again.map(_.toString).sorted),
      "dense-index path is run-to-run deterministic")
    val m = operators.Recommender.q66(s, dir).head()
    assert(m.getLong(0) > 0 && !m.isNullAt(1) && m.getDouble(1) > 0.0,
      "holdout metrics compute on the indexed ids")
  }

  test("q126 coverage/Gini: metric bounds and candidate-list cap hold") {
    val r = operators.Recommender.q126(s, d).head()
    val (nUsers, nCat, nRec) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val (coverage, gini) = (r.getDouble(3), r.getDouble(4))
    assert(nUsers > 0 && nCat > 0)
    assert(nRec >= 1 && nRec <= 50, "recommended set is bounded by the candidate list")
    assert(nRec <= nCat)
    assert(coverage > 0.0 && coverage <= 1.0)
    // Gini of a non-negative exposure distribution lies in [0, 1); with the
    // per-user top-5 over a popularity-ordered candidate list the exposure
    // is concentrated but never perfectly equal nor fully degenerate
    assert(gini >= 0.0 && gini < 1.0, s"gini out of range: $gini")
  }
}
