package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Invariants for the curation family (q92-q96) beyond the DuckDB oracle:
  * sketch error bounds, component fixpoint, sampling reproducibility,
  * packing feasibility. */
class CurationSpec extends AnyFunSuite {
  private def s = TestSpark.spark
  private val d = TestSpark.sf001 // sf0.01 — the driver's verification SF

  test("q92 KMV: exact below k, bounded relative error at or above k") {
    val rows = operators.Curation.q92(s, d)
      .select("n_shingles", "est_distinct").collect()
    assert(rows.nonEmpty)
    val ratios = rows.flatMap { r =>
      val n = r.getLong(0).toDouble
      val est = r.getDouble(1)
      if (n < 8) { assert(est == n, s"below k the KMV estimate must be exact: $n vs $est"); None }
      else {
        // k=8 has rsd ≈ 41% with a heavy right tail; per-doc bounds must be
        // loose (this is a max over ~700 draws), the CALIBRATION must be tight
        assert(est > n / 20 && est < n * 20, s"KMV estimate $est absurd for $n")
        Some(est / n)
      }
    }
    val mean = ratios.sum / ratios.length
    assert(mean > 0.6 && mean < 1.7,
      f"KMV estimator miscalibrated: mean est/true = $mean%.2f over ${ratios.length} docs")
  }

  test("q93 components: convergence loop reaches the same fixpoint as extra rounds") {
    val r = operators.Curation.components(s, d, maxRounds = 20)
      .collect().map(row => (row.getLong(0), row.getLong(1))).toMap
    // one manual extra-round run can't improve a true fixpoint
    val more = operators.Curation.components(s, d, maxRounds = 40)
      .collect().map(row => (row.getLong(0), row.getLong(1))).toMap
    assert(r == more, "convergence loop stopped before the true fixpoint")
    // a component's id is a member of the component, and is its minimum
    val byComp = r.groupBy(_._2).map { case (c, m) => c -> m.keys.min }
    byComp.foreach { case (c, minDoc) => assert(c == minDoc) }
  }

  test("q94 sampling: reproducible, stratified, and rate-consistent") {
    val a = operators.Curation.q94(s, d).collect()
    val b = operators.Curation.q94(s, d).collect()
    assert(a.toSeq == b.toSeq, "hash-bucket sampling must be bit-reproducible")
    a.foreach(r => assert(r.getLong(3) < r.getLong(4), "kept row outside its rate"))
    // en is downsampled 3x relative to other langs; with 218 en docs the
    // realized rate should sit near 10% (binomial, generous bounds)
    val en = a.count(_.getString(1) == "en")
    assert(en > 5 && en < 50, s"en kept $en of 218 at a 10% hash rate")
  }

  test("q98/q99 quality filters: ratios bounded, log-probs negative, token counts consistent") {
    val rep = operators.TextPipeline.q98(s, d).collect()
    rep.foreach { r =>
      val (n, dis, mx, dup) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(dis <= n && mx <= n && dup >= 0.0 && dup < 1.0)
    }
    val lp = operators.TextPipeline.q99(s, d).collect()
    lp.foreach(r => assert(r.getDouble(2) < 0.0, "unigram log-prob must be negative"))
    // q99's token count is the same whitespace tokenization q79 counts
    val n79 = operators.TextPipeline.q79(s, d).select("doc_id", "n_words")
    val n99 = operators.TextPipeline.q99(s, d).select(col("doc_id"), col("n_tokens"))
    assert(n99.join(n79, "doc_id").filter(col("n_tokens") =!= col("n_words")).count() == 0)
  }

  test("q95 frames: stride-aligned offsets, bounded sizes, counts match doc lengths") {
    val frames = operators.LlmPipeline.q95(s, d).collect()
    frames.foreach { r =>
      val (idx, off, n, sha) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))
      assert(off == idx * 256 && n >= 1 && n <= 64 && sha.length == 64)
    }
    val perDoc = frames.groupBy(_.getLong(0)).view.mapValues(_.length.toLong).toMap
    val expected = Tables.documents(s, d)
      .select(col("doc_id"), (floor((col("n_chars") - 1) / 256) + 1).as("nf"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perDoc == expected)
  }

  test("q46 chunking: full coverage, stride-spaced starts, only the last chunk short") {
    val words = Tables.documents(s, d).select(col("doc_id"),
      expr("size(filter(split(lower(text), ' '), w -> w != ''))")
        .cast("long").as("n_words"))
    val chunks = operators.Curation.q46(s, d)
      .groupBy("doc_id").agg(count(lit(1)).as("n_chunks"),
        sum(when(col("n_chunk_words") < 64, 1).otherwise(0)).as("n_short"),
        max(col("chunk_idx")).as("max_idx"))
    val j = words.join(chunks, "doc_id").collect()
    assert(j.nonEmpty)
    j.foreach { r =>
      val (n, nc, nShort, maxIdx) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      // chunk starts are 0, 48, 96, … while start < n → count = (n-1)/48 + 1,
      // which covers every word index (start + 64 ≥ start + 48 > next start)
      assert(nc == (n - 1) / 48 + 1, s"doc ${r.getLong(0)}: $nc chunks for $n words")
      assert(maxIdx == nc - 1)
      // at most the final chunk may be shorter than chunkSize... plus the
      // penultimate when the tail overlaps (n - (nc-2)*48 < 64 possible only
      // for the last TWO starts); never more
      assert(nShort <= 2, s"doc ${r.getLong(0)}: $nShort short chunks")
    }
  }

  test("q49 sketch heavy hitters equal q69's exact top-20 (vocab fits the tracker)") {
    val sketch = operators.Curation.q49(s, d).select("w", "c")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val exact = operators.Curation.q69(s, d).select("w", "c")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(sketch == exact, "approx_top_k must be exact while vocab ≤ maxItemsTracked")
  }

  test("q96 packing: chunks are contiguous, start-aligned, and in budget order") {
    val rows = operators.Curation.q96(s, d)
      .select("source", "chunk_id", "doc_id", "tokens", "cum_tokens").collect()
    rows.groupBy(_.getString(0)).foreach { case (_, docs) =>
      val ordered = docs.sortBy(_.getLong(2))
      var prevCum = 0L
      var prevChunk = 0L
      ordered.foreach { r =>
        val (chunk, tokens, cum) = (r.getLong(1), r.getLong(3), r.getLong(4))
        assert(cum == prevCum + tokens, "running sum must be contiguous")
        assert(chunk >= prevChunk, "chunk ids must be non-decreasing")
        assert(chunk == prevCum / 2048, "chunk = floor(tokens-before / budget)")
        prevCum = cum; prevChunk = chunk
      }
    }
  }

  test("q104 weighted sampling: reproducible, biased toward quality, threshold-exact") {
    val kept = operators.Curation.q104(s, d).collect()
    assert(kept.nonEmpty)
    // every kept row satisfies its own threshold (bucket < quality*50)
    kept.foreach(r => assert(r.getLong(3) < r.getDouble(2) * 50.0))
    // selection is biased toward quality: mean kept quality exceeds corpus mean
    val meanKept = kept.map(_.getDouble(2)).sum / kept.length
    val all = operators.TextPipeline.q79(s, d).select("quality")
      .collect().map(_.getDouble(0))
    val meanAll = all.sum / all.length
    assert(meanKept > meanAll,
      f"no quality bias: kept $meanKept%.4f vs corpus $meanAll%.4f")
    // reproducible: a second evaluation keeps exactly the same rows
    assert(operators.Curation.q104(s, d).collect().toSeq == kept.toSeq)
  }

  test("q105 pipeline: survivors are the quality-floored keepers, packing law holds") {
    val out = operators.Curation.q105(s, d).collect()
    assert(out.nonEmpty)
    val expected = operators.Curation.q101(s, d)
      .filter(col("keep") && col("quality") >= 0.4)
      .collect().map(_.getLong(0)).toSet
    assert(out.map(_.getLong(2)).toSet == expected,
      "pipeline survivors must be exactly q101's keepers above the floor")
    // streaming-greedy packing: chunk = floor(tokens-before-it / 2048) per source
    out.groupBy(_.getString(0)).foreach { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_.getLong(2)).foreach { r =>
        assert(r.getLong(1) == cum / 2048, "chunk assignment law violated")
        cum += r.getLong(3)
      }
    }
  }

  test("q106 decontamination: flags exactly the corpus docs sharing a benchmark shingle") {
    val flagged = operators.Curation.q106(s, d).collect()
    assert(flagged.nonEmpty, "fixture has no contaminated docs — test is vacuous")
    flagged.foreach { r =>
      assert(r.getLong(0) >= 10, "benchmark docs must never be flagged")
      assert(r.getLong(1) >= 1 && r.getLong(2) >= 1)
    }
    // independent recomputation of the overlap set straight from the corpus
    val sh = s.read.parquet(s"$d/documents.parquet")
      .selectExpr("doc_id", "filter(split(lower(text), ' '), w -> w != '') AS words")
      .filter("size(words) >= 5")
      .selectExpr("doc_id",
        "explode(transform(sequence(1, size(words) - 4), i -> array_join(slice(words, i, 5), ' '))) AS sh")
      .distinct()
    val expected = sh.filter("doc_id >= 10")
      .join(sh.filter("doc_id < 10").select("sh").distinct(), "sh")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(flagged.map(_.getLong(0)).toSet == expected)
  }

  test("q109 token budget: binding, greedy-feasible, and reproducible") {
    val rows = operators.Curation.q109(s, d).collect()
    assert(rows.nonEmpty)
    // kept docs start strictly inside the budget, and the budget BINDS here
    rows.foreach(r => assert(r.getLong(4) - r.getLong(3) < 1024))
    val total = s.read.parquet(s"$d/documents.parquet").count()
    assert(rows.length < total, "budget not binding at this SF — filter is vacuous")
    // greedy fill admits at most ONE budget-crossing doc per source
    rows.groupBy(_.getString(0)).foreach { case (src, rs) =>
      assert(rs.count(_.getLong(4) >= 1024) <= 1,
        s"source $src kept more than one doc past the budget line")
    }
    val again = operators.Curation.q109(s, d).collect()
    assert(rows.toSeq == again.toSeq, "hash-ordered fill must be bit-reproducible")
  }
}
