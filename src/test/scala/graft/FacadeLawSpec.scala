package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Randomized driver-side reference laws for Graft facades that previously
  * carried only golden reproductions of their query keys. Each test builds
  * a seeded adversarial corpus (heavy ties, key skew, matchless keys,
  * duplicate keys inside one input) and checks the distributed plan against
  * an independent sequential reimplementation on the driver — so a block
  * placement, join order or window frame regression shows up as a value
  * diff, not just a changed plan. Exact-integer results compare with ==;
  * double results compare at 1e-9 (the reference reorders fp additions). */
class FacadeLawSpec extends AnyFunSuite {
  private def s = TestSpark.spark
  private val G = graft.api.Graft

  test("asofJoin equals the sequential latest-before scan (strict + inclusive, ties broken by payload)") {
    val rng = new scala.util.Random(7)
    // k4 appears only on the left: those rows must survive with null payloads
    val left = (0 until 120).map(i =>
      (i.toLong, s"k${rng.nextInt(5)}", rng.nextInt(50).toLong))
    val right = (0 until 200).map(_ =>
      (s"k${rng.nextInt(4)}", rng.nextInt(50).toLong, rng.nextInt(9).toLong))
    val lDf = s.createDataFrame(left).toDF("id", "k", "ts")
    val rDf = s.createDataFrame(right).toDF("k", "rts", "pay")
    for (strict <- Seq(true, false)) {
      val got = G.asofJoin(lDf, rDf, Seq("k"), "ts", "rts", Seq("id"),
          Seq("pay"), strict)
        .select("id", "asof_rts", "asof_pay").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getLong(2)))))
        .toMap
      val want = left.map { case (id, k, ts) =>
        val ms = right.filter(r =>
          r._1 == k && (if (strict) r._2 < ts else r._2 <= ts))
        id -> (if (ms.isEmpty) None else Some(ms.map(r => (r._2, r._3)).max))
      }.toMap
      assert(got == want, s"strict=$strict")
    }
  }

  test("sessionize equals a sequential gap scan on seeded series with timestamp ties") {
    val rng = new scala.util.Random(11)
    // ts on a 10-grid with gap 25: only 30+ jumps split; ties are frequent
    val rows = (0 until 400).map(i =>
      (s"u${rng.nextInt(8)}", rng.nextInt(40).toLong * 10L, i.toLong))
    val df = s.createDataFrame(rows).toDF("u", "ts", "tb")
    val got = G.sessionize(df, "u", "ts", gap = 25L, tieBreak = Seq("tb"))
      .select("u", "tb", "session_id").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = rows.groupBy(_._1).flatMap { case (u, rs) =>
      var sess = 0L; var prev = Long.MinValue
      rs.sortBy(r => (r._2, r._3)).map { case (_, ts, tb) =>
        if (prev == Long.MinValue || ts - prev > 25L) sess += 1
        prev = ts
        (u, tb) -> sess
      }
    }.toMap
    assert(got.size == rows.size && got == want)
  }

  test("rollingDistinct equals a driver trailing-window distinct on random id×day data") {
    val rng = new scala.util.Random(13)
    val rows = (0 until 500).map(_ =>
      (rng.nextInt(30).toLong, 100L + rng.nextInt(20)))
    val df = s.createDataFrame(rows).toDF("id", "day")
    val got = G.rollingDistinct(df, "id", "day", 7)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val obs = rows.distinct
    val hi = obs.map(_._2).max
    val want = obs
      .flatMap { case (id, dy) => (dy until dy + 7).filter(_ <= hi).map(t => (t, id)) }
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).distinct.size.toLong }
    assert(got == want)
  }

  test("equiDepthBuckets: in-range, monotone in value, near-equal counts on distinct values") {
    val rng = new scala.util.Random(17)
    val vals = rng.shuffle((1 to 1000).toList).take(730).map(_.toDouble * 1.5)
    val df = s.createDataFrame(vals.map(Tuple1(_))).toDF("v")
    val got = G.equiDepthBuckets(df, "v", 10).select("v", "bucket").collect()
      .map(r => (r.getDouble(0), r.getLong(1)))
    assert(got.forall { case (_, b) => b >= 1 && b <= 10 })
    val inOrder = got.sortBy(_._1).map(_._2)
    assert(inOrder.zip(inOrder.tail).forall { case (a, b) => a <= b },
      "bucket id must be monotone in the value")
    val counts = got.groupBy(_._2).map(_._2.size)
    assert(counts.size == 10 && counts.max - counts.min <= 2,
      s"equi-depth counts drifted: $counts")
  }

  test("ksStatistic equals the driver ECDF sup-difference; third group ignored") {
    val rng = new scala.util.Random(19)
    val rows = (0 until 800).map { _ =>
      val g = if (rng.nextBoolean()) "a" else "b"
      (g, (if (g == "a") rng.nextInt(60) else rng.nextInt(60) + 8).toDouble)
    } ++ Seq(("c", 1.0)) // must not contaminate either ECDF
    val df = s.createDataFrame(rows).toDF("g", "v")
    val r = G.ksStatistic(df, "v", "g", "a", "b").head()
    val as = rows.filter(_._1 == "a").map(_._2)
    val bs = rows.filter(_._1 == "b").map(_._2)
    def ecdf(xs: Seq[Double], t: Double) = xs.count(_ <= t).toDouble / xs.size
    val d = (as ++ bs).distinct
      .map(t => math.abs(ecdf(as, t) - ecdf(bs, t))).max
    assert(r.getAs[Long]("n_a") == as.size && r.getAs[Long]("n_b") == bs.size)
    assert(math.abs(r.getAs[Double]("ks_d") - d) < 1e-12)
  }

  test("applyChanges equals a driver latest-wins merge with duplicate keys in both inputs") {
    val rng = new scala.util.Random(23)
    val base = (0 until 60).map(i => (i.toLong % 25, rng.nextInt(5).toLong, s"base$i"))
    val chg = (0 until 80).map(i => (rng.nextInt(35).toLong, rng.nextInt(7).toLong, s"chg$i"))
    val bDf = s.createDataFrame(base).toDF("k", "ver", "payload")
    val cDf = s.createDataFrame(chg).toDF("k", "ver", "payload")
    val got = G.applyChanges(bDf, cDf, Seq("k"), col("ver"), Seq(col("payload")))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // winner per key: max (version, payload) — payload strings are ASCII, so
    // Scala's string order matches Spark's UTF8 binary order
    val want = (base ++ chg).groupBy(_._1)
      .map { case (k, rs) => k -> rs.map(r => (r._2, r._3)).max }
    assert(got == want)
  }

  test("tokenBudgetFill and packSequences equal the sequential greedy fill/packer") {
    val rng = new scala.util.Random(29)
    val rows = (0 until 300).map(i =>
      (s"s${rng.nextInt(6)}", i.toLong, (rng.nextInt(90) + 1).toLong))
    val df = s.createDataFrame(rows).toDF("src", "ord", "tok")
    val kept = G.tokenBudgetFill(df, "src", "ord", "tok", 500L)
      .select("src", "ord").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val chunks = G.packSequences(df, "src", "ord", "tok", 400L)
      .select("src", "ord", "chunk_id").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val wantKept = scala.collection.mutable.Set.empty[(String, Long)]
    val wantChunk = scala.collection.mutable.Map.empty[(String, Long), Long]
    rows.groupBy(_._1).foreach { case (g, rs) =>
      var before = 0L
      rs.sortBy(_._2).foreach { case (_, o, t) =>
        if (before < 500L) wantKept += ((g, o)) // admits the crossing row
        wantChunk((g, o)) = before / 400L
        before += t
      }
    }
    assert(kept == wantKept)
    assert(chunks == wantChunk.toMap)
  }

  test("mannWhitney U and z equal a driver rank computation under heavy ties") {
    val rng = new scala.util.Random(31)
    val rows = (0 until 600).map { _ =>
      (if (rng.nextInt(3) == 0) "x" else "y", rng.nextInt(25).toDouble)
    }
    val df = s.createDataFrame(rows).toDF("g", "v")
    val r = G.mannWhitney(df, "v", "g", "x", "y").head()
    val xs = rows.filter(_._1 == "x").map(_._2)
    val ys = rows.filter(_._1 == "y").map(_._2)
    val sorted = (xs ++ ys).sorted
    val fr = scala.collection.mutable.Map.empty[Double, Double]
    var i = 0
    while (i < sorted.size) {
      var j = i
      while (j < sorted.size && sorted(j) == sorted(i)) j += 1
      fr(sorted(i)) = (i + 1 + j).toDouble / 2.0 // mean of ranks i+1..j
      i = j
    }
    val na = xs.size.toDouble; val nb = ys.size.toDouble; val n = na + nb
    val ua = xs.map(fr).sum - na * (na + 1) / 2.0
    val tie3 = sorted.groupBy(identity).values
      .map { g => val t = g.size.toDouble; t * t * t - t }.sum
    val z = (ua - na * nb / 2.0) /
      math.sqrt(na * nb / 12.0 * ((n + 1) - tie3 / (n * (n - 1))))
    assert(r.getAs[Long]("n_a") == xs.size && r.getAs[Long]("n_b") == ys.size)
    assert(math.abs(r.getAs[Double]("u_a") - ua) < 1e-9)
    assert(math.abs(r.getAs[Double]("z") - z) < 1e-9)
  }

  test("spearman equals a driver rank correlation per group under ties") {
    val rng = new scala.util.Random(37)
    val rows = (0 until 900).map { i =>
      (s"g${i % 3}", rng.nextInt(20).toDouble, rng.nextInt(15).toDouble)
    }
    val df = s.createDataFrame(rows).toDF("g", "x", "y")
    val got = G.spearman(df, Seq("g"), "x", "y").collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n"), r.getAs[Double]("spearman"))))
      .toMap
    def fracRanks(vs: Seq[Double]): Map[Double, Double] = {
      val sorted = vs.sorted
      val out = scala.collection.mutable.Map.empty[Double, Double]
      var i = 0
      while (i < sorted.size) {
        var j = i
        while (j < sorted.size && sorted(j) == sorted(i)) j += 1
        out(sorted(i)) = (i + 1 + j).toDouble / 2.0
        i = j
      }
      out.toMap
    }
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val fx = fracRanks(rs.map(_._2)); val fy = fracRanks(rs.map(_._3))
      val rx = rs.map(r => fx(r._2)); val ry = rs.map(r => fy(r._3))
      val n = rs.size.toDouble
      val num = n * rx.zip(ry).map { case (a, b) => a * b }.sum - rx.sum * ry.sum
      val den = math.sqrt((n * rx.map(a => a * a).sum - rx.sum * rx.sum) *
        (n * ry.map(b => b * b).sum - ry.sum * ry.sum))
      val (gn, gr) = got(g)
      assert(gn == rs.size)
      assert(math.abs(gr - num / den) < 1e-9, s"group $g")
    }
  }
}
