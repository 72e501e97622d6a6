package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.sql.Timestamp
import java.time.{LocalDateTime, ZoneOffset}

// tsc is java.sql.Timestamp (TimestampType): Spark requires an LTZ TIMESTAMP
// event-time column for watermarks; with the session TZ pinned UTC the
// wall-clock values are identical to the batch twins' NTZ column.
case class Ev(event_id: Long, user_id: Long, event_type: String,
  value: Double, tsc: Timestamp)

/** Stream ≡ batch equivalence (SURVEY §5.5): the SAME transformation
  * functions behind q80/q81 are applied to a MemoryStream and must produce
  * the batch result; plus watermark late-data drop and stateful stream
  * dedup. */
class StreamingSpec extends AnyFunSuite {
  private def s = TestSpark.spark
  private val d = TestSpark.sf0001

  private def runComplete(df: DataFrame, name: String): DataFrame = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    s.table(name)
  }

  private def batchEvents: DataFrame =
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        col("tsc").cast("timestamp").as("tsc"))

  private def utcTs(t: LocalDateTime): Timestamp =
    Timestamp.from(t.toInstant(ZoneOffset.UTC))

  test("tumbling window: stream result equals batch result") {
    val sp = s
    import sp.implicits._
    implicit val ctx = sp.sqlContext
    val ms = MemoryStream[Ev]
    ms.addData(batchEvents.as[Ev].collect().toIndexedSeq)
    val streamed = runComplete(
      streaming.Streaming.tumbling(ms.toDF.withWatermark("tsc", "10 minutes")),
      "tumbling_out")
    val batch = streaming.Streaming.tumbling(batchEvents)
    assert(streamed.except(batch).count() == 0)
    assert(batch.except(streamed).count() == 0)
    assert(streamed.count() == batch.count())
  }

  test("sliding window: stream result equals batch result") {
    val sp = s
    import sp.implicits._
    implicit val ctx = sp.sqlContext
    val ms = MemoryStream[Ev]
    ms.addData(batchEvents.as[Ev].collect().toIndexedSeq)
    val streamed = runComplete(
      streaming.Streaming.sliding(ms.toDF.withWatermark("tsc", "10 minutes")),
      "sliding_out")
    val batch = streaming.Streaming.sliding(batchEvents)
    assert(streamed.except(batch).count() == 0)
    assert(batch.except(streamed).count() == 0)
  }

  test("burst screen windows: stream result equals batch result") {
    val sp = s
    import sp.implicits._
    implicit val ctx = sp.sqlContext
    val ms = MemoryStream[Ev]
    ms.addData(batchEvents.as[Ev].collect().toIndexedSeq)
    val streamed = runComplete(
      streaming.Streaming.burst(ms.toDF.withWatermark("tsc", "10 minutes")),
      "burst_out")
    val batch = streaming.Streaming.burst(batchEvents)
    assert(streamed.except(batch).count() == 0)
    assert(batch.except(streamed).count() == 0)
    assert(streamed.count() == batch.count())
  }

  test("daily dedup pairs: stream result equals batch result") {
    val sp = s
    import sp.implicits._
    implicit val ctx = sp.sqlContext
    val ms = MemoryStream[Ev]
    ms.addData(batchEvents.as[Ev].collect().toIndexedSeq)
    val streamed = runComplete(
      streaming.Streaming.dailyPairs(ms.toDF.withWatermark("tsc", "10 minutes")),
      "dailypairs_out")
    val batch = streaming.Streaming.dailyPairs(batchEvents)
    assert(streamed.except(batch).count() == 0)
    assert(batch.except(streamed).count() == 0)
    assert(streamed.count() == batch.count())
  }

  test("watermark drops late data in append mode") {
    val sp = s
    import sp.implicits._
    implicit val ctx = sp.sqlContext
    def ev(id: Long, t: LocalDateTime) = Ev(id, 1L, "click", 1.0, utcTs(t))
    val base = LocalDateTime.of(2024, 1, 1, 10, 0, 0)
    val ms = MemoryStream[Ev]
    val q = streaming.Streaming.tumbling(ms.toDF.withWatermark("tsc", "10 minutes"))
      .writeStream.format("memory").queryName("late_out")
      .outputMode("append").start()
    // batch 1: events in [10:00,11:00) plus one at 12:05 that advances the
    // watermark to 11:55 — the 10:00 window finalizes and is emitted
    ms.addData(Seq(ev(1, base), ev(2, base.plusMinutes(30)), ev(3, base.plusHours(2).plusMinutes(5))))
    q.processAllAvailable()
    val afterBatch1 = s.table("late_out").collect()
    val w10 = afterBatch1.filter(_.getAs[Timestamp]("ws") == utcTs(base))
    assert(w10.length == 1 && w10.head.getAs[Long]("n") == 2L)
    // batch 2: a LATE event at 10:45 — behind the 11:55 watermark, its
    // (already finalized) window must not be re-emitted or updated
    ms.addData(Seq(ev(4, base.plusMinutes(45))))
    q.processAllAvailable()
    val afterBatch2 = s.table("late_out").collect()
    val w10b = afterBatch2.filter(_.getAs[Timestamp]("ws") == utcTs(base))
    assert(w10b.length == 1 && w10b.head.getAs[Long]("n") == 2L,
      "late event must be dropped by the watermark")
    q.stop()
  }

  test("q279 watermark audit: per-event late injection drops exactly the rows the batch audit flags") {
    val sp = s
    import sp.implicits._
    implicit val ctx = sp.sqlContext
    val base = LocalDateTime.of(2024, 1, 1, 10, 0, 0)
    // arrival sequence with three late injections (e4, e7, e10), each
    // arriving after a later event has pushed the watermark past its
    // window's end; no event sits exactly ON a watermark boundary so the
    // <=/< eviction convention cannot flip the expectation
    val arrivals = Seq(
      1L -> base.plusMinutes(5),    // w10 kept (first row, no watermark yet)
      2L -> base.plusMinutes(40),   // w10 kept
      3L -> base.plusMinutes(150),  // w12 kept; wm -> 11:30 closes w10
      4L -> base.plusMinutes(55),   // w10 LATE
      5L -> base.plusMinutes(105),  // w11 kept (end 12:00 > wm 11:30)
      6L -> base.plusMinutes(190),  // w13 kept; wm -> 12:10 closes w11
      7L -> base.plusMinutes(110),  // w11 LATE
      8L -> base.plusMinutes(160),  // w12 kept (end 13:00 > wm 12:10)
      9L -> base.plusMinutes(260),  // w14 kept; wm -> 13:20 closes w12
      10L -> base.plusMinutes(179)) // w12 LATE
    // batch twin: same rows as an events fixture (ts = long ns)
    val dir = java.nio.file.Files.createTempDirectory("graft_g279").toString
    arrivals.map { case (id, t) =>
      (id, t.toInstant(ZoneOffset.UTC).toEpochMilli * 1000000L, 1L, "click",
        id.toDouble, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val audit = streaming.Streaming.q279(s, dir).collect()
      .map(r => (r.getTimestamp(0).toLocalDateTime.getHour,
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(audit == Map(10 -> ((3L, 1L, 2L, 3.0)), 11 -> ((2L, 1L, 1L, 5.0)),
      12 -> ((3L, 1L, 2L, 11.0)), 13 -> ((1L, 0L, 1L, 6.0)),
      14 -> ((1L, 0L, 1L, 9.0))), s"batch audit mismatch: $audit")
    // streaming side: one micro-batch PER event so the watermark advances
    // exactly as the audit's strictly-preceding running max models it
    val ms = MemoryStream[Ev]
    val q = streaming.Streaming.keptHourly(ms.toDF)
      .writeStream.format("memory").queryName("wm_audit_out")
      .outputMode("update").start()
    arrivals.foreach { case (id, t) =>
      ms.addData(Ev(id, 1L, "click", id.toDouble, utcTs(t)))
      q.processAllAvailable()
    }
    // update-mode sink accumulates every revision; counts only grow, so
    // the final state per window is the max
    val streamed = s.table("wm_audit_out")
      .groupBy(col("ws")).agg(max("n_kept").as("n"), max("sv").as("sv"))
      .collect()
      .map(r => (r.getTimestamp(0).toLocalDateTime.getHour,
        (r.getLong(1), r.getDouble(2)))).toMap
    q.stop()
    assert(streamed.keySet == audit.keySet)
    audit.foreach { case (h, (_, _, kept, keptSum)) =>
      assert(streamed(h) == ((kept, keptSum)),
        s"window $h: stream ${streamed(h)} vs audit kept ($kept, $keptSum)")
    }
  }

  test("custom state: flatMapGroupsWithState accumulates per-user counts across batches") {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val sp = s
    import sp.implicits._
    implicit val ctx = sp.sqlContext
    val base = LocalDateTime.of(2024, 1, 1, 10, 0, 0)
    def ev(id: Long, uid: Long) = Ev(id, uid, "click", 1.0, utcTs(base.plusSeconds(id)))
    val fn = (uid: Long, evs: Iterator[Ev], state: GroupState[Long]) => {
      val total = state.getOption.getOrElse(0L) + evs.size
      state.update(total)
      Iterator((uid, total))
    }
    val ms = MemoryStream[Ev]
    val q = ms.toDS().groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(fn)
      .toDF("user_id", "n")
      .writeStream.format("memory").queryName("state_out")
      .outputMode("update").start()
    ms.addData(Seq(ev(1, 100), ev(2, 100), ev(3, 200)))
    q.processAllAvailable()
    ms.addData(Seq(ev(4, 100), ev(5, 200)))
    q.processAllAvailable()
    // last emitted row per user carries the accumulated cross-batch total
    val finalCounts = s.table("state_out")
      .groupBy("user_id").agg(max("n").as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(finalCounts == Map(100L -> 3L, 200L -> 2L))
    q.stop()
  }

  test("stream-stream interval join: clicks to purchases within 30 min, equals batch join") {
    val sp = s
    import sp.implicits._
    implicit val ctx = sp.sqlContext
    val data = batchEvents.as[Ev].collect().toIndexedSeq
    val msC = MemoryStream[Ev]
    val msP = MemoryStream[Ev]
    msC.addData(data)
    msP.addData(data)
    def clicks(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("event_type") === "click")
        .select(col("user_id").as("cu"), col("event_id").as("cid"), col("tsc").as("ct"))
    def purchases(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("event_type") === "purchase")
        .select(col("user_id").as("pu"), col("event_id").as("pid"), col("tsc").as("pt"))
    val joinCond = "cu = pu AND pt >= ct AND pt <= ct + interval 30 minutes"
    val streamed = clicks(msC.toDF.withWatermark("tsc", "1 hour"))
      .join(purchases(msP.toDF.withWatermark("tsc", "1 hour")), expr(joinCond))
    val q = streamed.writeStream.format("memory").queryName("ssjoin_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = s.table("ssjoin_out")
    val batch = clicks(batchEvents).join(purchases(batchEvents), expr(joinCond))
    assert(got.count() == batch.count() && batch.count() > 0)
    assert(got.except(batch).count() == 0 && batch.except(got).count() == 0)
  }

  test("stream-stream LEFT OUTER interval join emits unmatched rows once the watermark closes them") {
    // The outer variant is semantically harder than the inner join: an
    // unmatched left row can only be emitted with nulls once the watermark
    // proves no future right row can still match it. A synthetic tail event
    // far past the data advances the watermark so every pending click
    // resolves; the result must then equal the batch left join on the
    // matched-or-closed set.
    val sp = s
    import sp.implicits._
    implicit val ctx = sp.sqlContext
    val data = batchEvents.as[Ev].collect().toIndexedSeq
    val maxTs = data.map(_.tsc.getTime).max
    // watermark driver: a click far in the future (filtered out of results
    // by event_id < 0 check on the right side only — it appears as its own
    // unmatched left row, excluded from the comparison below)
    val tail = Ev(-1L, 999999L, "click", 0.0, new Timestamp(maxTs + 48L * 3600 * 1000))
    val msC = MemoryStream[Ev]
    val msP = MemoryStream[Ev]
    msC.addData(data :+ tail)
    msP.addData(data)
    def clicks(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("event_type") === "click")
        .select(col("user_id").as("cu"), col("event_id").as("cid"), col("tsc").as("ct"))
    def purchases(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("event_type") === "purchase")
        .select(col("user_id").as("pu"), col("event_id").as("pid"), col("tsc").as("pt"))
    val joinCond = "cu = pu AND pt >= ct AND pt <= ct + interval 30 minutes"
    val streamed = clicks(msC.toDF.withWatermark("tsc", "10 minutes"))
      .join(purchases(msP.toDF.withWatermark("tsc", "10 minutes")),
        expr(joinCond), "left_outer")
    val q = streamed.writeStream.format("memory").queryName("ssouter_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = s.table("ssouter_out").filter(col("cid") >= 0)
    val batch = clicks(batchEvents)
      .join(purchases(batchEvents), expr(joinCond), "left_outer")
    assert(got.count() == batch.count() && batch.count() > 0)
    assert(got.except(batch).count() == 0 && batch.except(got).count() == 0)
    // the outer join genuinely exercised the null path
    assert(got.filter(col("pid").isNull).count() > 0,
      "expected at least one watermark-closed unmatched click")
  }

  test("stream-static join: streaming events enrich against the static customer dim") {
    val sp = s
    import sp.implicits._
    implicit val ctx = sp.sqlContext
    val dim = Tables.customer(s, d)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val ms = MemoryStream[Ev]
    ms.addData(batchEvents.as[Ev].collect().toIndexedSeq)
    // static side joins per micro-batch with the normal batch planner —
    // a small dim broadcasts, exactly as it would in a batch job
    val q = ms.toDF.join(dim, "user_id")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("ssd_out")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = s.table("ssd_out")
    val batch = batchEvents.join(dim, "user_id")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
    assert(got.count() > 0)
    assert(got.except(batch).count() == 0 && batch.except(got).count() == 0)
  }

  test("foreachBatch sink: micro-batches land transactionally by batch id") {
    val sp = s
    import sp.implicits._
    implicit val ctx = sp.sqlContext
    val outDir = java.nio.file.Files.createTempDirectory("graft_feb").toString
    val ms = MemoryStream[Ev]
    // idempotent-by-batchId parquet sink: each batch overwrites ITS OWN
    // directory, so a replayed batch cannot double-count — the standard
    // exactly-once recipe for non-transactional stores
    val q = ms.toDF.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
      }
      .outputMode("append").start()
    ms.addData(batchEvents.as[Ev].collect().toIndexedSeq.take(10))
    q.processAllAvailable()
    ms.addData(batchEvents.as[Ev].collect().toIndexedSeq.slice(10, 15))
    q.processAllAvailable()
    q.stop()
    val written = s.read.parquet(s"$outDir/batch=*")
    assert(written.count() == 15)
    assert(written.select("event_id").distinct().count() == 15)
  }

  test("stateful stream dedup: dropDuplicatesWithinWatermark keeps one row per id") {
    val sp = s
    import sp.implicits._
    implicit val ctx = sp.sqlContext
    val base = LocalDateTime.of(2024, 1, 1, 10, 0, 0)
    val ms = MemoryStream[Ev]
    val q = ms.toDF.withWatermark("tsc", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.format("memory").queryName("ddup_out")
      .outputMode("append").start()
    ms.addData(Seq(
      Ev(1, 1, "click", 1.0, utcTs(base)),
      Ev(1, 1, "click", 1.0, utcTs(base.plusMinutes(1))), // dup within watermark
      Ev(2, 1, "view", 2.0, utcTs(base.plusMinutes(2)))))
    q.processAllAvailable()
    val ids = s.table("ddup_out").select("event_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L))
    q.stop()
  }

  test("transformWithState: per-user running max via the Spark 4 arbitrary-state API") {
    // The modern replacement for mapGroupsWithState: typed per-key state
    // handles (ValueState/ListState/MapState + timers + TTL) over the
    // RocksDB state store — the API a 100 TB streaming pipeline would use
    // for custom state. Here: a per-user running maximum across batches.
    val sp = s
    import sp.implicits._
    implicit val ctx = sp.sqlContext
    sp.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[Ev]
      val out = ms.toDS().groupByKey(_.user_id)
        .transformWithState(new RunningMaxProcessor,
          org.apache.spark.sql.streaming.TimeMode.None(),
          org.apache.spark.sql.streaming.OutputMode.Update())
      val q = out.toDF("user_id", "running_max")
        .writeStream.format("memory").queryName("tws_out")
        .outputMode("update").start()
      val base = LocalDateTime.of(2024, 1, 1, 10, 0, 0)
      ms.addData(Seq(
        Ev(1, 1, "click", 3.0, utcTs(base)),
        Ev(2, 1, "click", 7.0, utcTs(base.plusMinutes(1))),
        Ev(3, 2, "view", 5.0, utcTs(base.plusMinutes(2)))))
      q.processAllAvailable()
      ms.addData(Seq( // second batch: state must SURVIVE across batches
        Ev(4, 1, "click", 4.0, utcTs(base.plusMinutes(3))), // below user 1's max
        Ev(5, 2, "view", 9.0, utcTs(base.plusMinutes(4))))) // new max for user 2
      q.processAllAvailable()
      val last = s.table("tws_out").groupBy("user_id")
        .agg(max("running_max").as("m")).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(last == Map(1L -> 7.0, 2L -> 9.0),
        s"running max wrong (state lost across batches?): $last")
      q.stop()
    } finally sp.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("transformWithState Holt: streaming level/trend state equals the batch Graft.holt fold exactly") {
    val sp = s
    import sp.implicits._
    implicit val ctx = sp.sqlContext
    sp.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val base = LocalDateTime.of(2024, 1, 1, 10, 0, 0)
      val batch1 = Seq(
        Ev(1, 1, "m", 10.0, utcTs(base)),
        Ev(2, 1, "m", 20.0, utcTs(base.plusMinutes(1))),
        Ev(3, 2, "m", 5.0, utcTs(base.plusMinutes(2))))
      val batch2 = Seq( // state must continue the recurrence across batches
        Ev(4, 1, "m", 30.0, utcTs(base.plusMinutes(3))),
        Ev(5, 2, "m", 7.5, utcTs(base.plusMinutes(4))),
        Ev(6, 2, "m", 2.25, utcTs(base.plusMinutes(5))))
      val ms = MemoryStream[Ev]
      val out = ms.toDS().groupByKey(_.user_id)
        .transformWithState(new HoltProcessor(0.5, 0.3),
          org.apache.spark.sql.streaming.TimeMode.None(),
          org.apache.spark.sql.streaming.OutputMode.Update())
      val q = out.toDF("user_id", "level", "trend", "n")
        .writeStream.format("memory").queryName("holt_out")
        .outputMode("update").start()
      ms.addData(batch1); q.processAllAvailable()
      ms.addData(batch2); q.processAllAvailable()
      q.stop()
      // final state per user = the row with the largest n
      val streamed = s.table("holt_out")
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("user_id").orderBy(col("n").desc)))
        .filter(col("rn") === 1)
        .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
      val batchTwin = graft.api.Graft.holt(
        (batch1 ++ batch2).toDF(), Seq("user_id"), "event_id", "value", 0.5, 0.3)
        .collect().map(r => r.getLong(0) ->
          (r.getDouble(r.fieldIndex("level")), r.getDouble(r.fieldIndex("trend")))).toMap
      assert(streamed == batchTwin,
        s"streaming Holt state diverged from batch fold: $streamed vs $batchTwin")
    } finally sp.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("transformWithState Holt: stream state equals the batch fold on real events at sf0.001 AND sf0.01") {
    // The constructed-data test above pins the recurrence; this one pins
    // STATE SERIALIZATION at corpus scale and at two SFs (VERDICT r7 task
    // 5): every user's (level, trend, n) after replaying the full events
    // table through two micro-batches must equal Graft.holt's batch fold
    // EXACTLY — any encoder/state-store change that perturbs the tuple
    // round-trip fails here before it can ship.
    val sp = s
    import sp.implicits._
    implicit val ctx = sp.sqlContext
    sp.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      Seq(TestSpark.sf0001 -> "holt_sf0001", TestSpark.sf001 -> "holt_sf001")
        .foreach { case (sf, name) =>
          val evs = Tables.events(sp, sf)
            .select(col("event_id"), col("user_id"), col("event_type"),
              col("value"), col("tsc").cast("timestamp").as("tsc"))
            .as[Ev].collect().sortBy(_.event_id)
          // split at the median event_id: the fold must carry across the
          // batch boundary for every user (HoltProcessor orders by
          // event_id WITHIN a batch; the split keeps order across them)
          val (b1, b2) = evs.splitAt(evs.length / 2)
          val ms = MemoryStream[Ev]
          val out = ms.toDS().groupByKey(_.user_id)
            .transformWithState(new HoltProcessor(0.5, 0.3),
              org.apache.spark.sql.streaming.TimeMode.None(),
              org.apache.spark.sql.streaming.OutputMode.Update())
          val q = out.toDF("user_id", "level", "trend", "n")
            .writeStream.format("memory").queryName(name)
            .outputMode("update").start()
          ms.addData(b1.toIndexedSeq); q.processAllAvailable()
          ms.addData(b2.toIndexedSeq); q.processAllAvailable()
          q.stop()
          val streamed = sp.table(name)
            .withColumn("rn", row_number().over(
              org.apache.spark.sql.expressions.Window
                .partitionBy("user_id").orderBy(col("n").desc)))
            .filter(col("rn") === 1)
            .collect().map(r => r.getLong(0) ->
              (r.getDouble(1), r.getDouble(2), r.getLong(3))).toMap
          val batch = graft.api.Graft.holt(
            Tables.events(sp, sf).select("event_id", "user_id", "value"),
            Seq("user_id"), "event_id", "value", 0.5, 0.3)
            .collect().map(r => r.getLong(r.fieldIndex("user_id")) ->
              (r.getDouble(r.fieldIndex("level")),
               r.getDouble(r.fieldIndex("trend")),
               r.getLong(r.fieldIndex("n_points")))).toMap
          assert(streamed.keySet == batch.keySet, s"user sets diverged at $sf")
          val bad = streamed.collect {
            case (u, st) if batch(u) != st => (u, st, batch(u)) }
          assert(bad.isEmpty,
            s"Holt stream/batch state diverged at $sf for ${bad.take(3)}")
        }
    } finally sp.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("checkpoint recovery: a restarted query resumes aggregation state exactly-once") {
    // The production incremental-batch pattern: file source + AvailableNow +
    // checkpoint. Run 1 aggregates the first files and stops; run 2 starts a
    // NEW query from the SAME checkpoint after more files land. The final
    // result must equal the batch aggregation over ALL rows — doubled counts
    // would mean run 2 re-read run 1's files (broken source offset log),
    // missing counts would mean the state store lost run 1 (broken state
    // recovery). Either failure breaks this assertion.
    val sp = s
    import sp.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft_ckpt_src").toFile.getPath
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_log").toFile.getPath
    def land(rows: Seq[(Long, Double)]): Unit =
      rows.toDF("user_id", "value").coalesce(1).write.mode("append").parquet(src)
    def agg(df: DataFrame): DataFrame =
      df.groupBy("user_id").agg(count(lit(1)).as("n"), sum("value").as("sv"))
    def runOnce(queryName: String): Unit = {
      val q = agg(sp.readStream.schema("user_id LONG, value DOUBLE").parquet(src))
        .writeStream.format("memory").queryName(queryName)
        .outputMode("complete").option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    val batch1 = Seq((1L, 1.0), (1L, 2.0), (2L, 10.0))
    val batch2 = Seq((1L, 4.0), (3L, 7.0))
    land(batch1)
    runOnce("ckpt_run1")
    val r1 = s.table("ckpt_run1").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(r1 == Map(1L -> ((2L, 3.0)), 2L -> ((1L, 10.0))), s"run 1 state: $r1")
    land(batch2)
    runOnce("ckpt_run2")
    val r2 = s.table("ckpt_run2").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(r2 == Map(1L -> ((3L, 7.0)), 2L -> ((1L, 10.0)), 3L -> ((1L, 7.0))),
      s"restarted query must resume state exactly-once: $r2")
  }

  test("AvailableNow + maxFilesPerTrigger slices the backlog into bounded micro-batches") {
    // The catch-up pattern at scale: after downtime the file source must
    // NOT load the whole backlog into one giant micro-batch — the rate
    // limit slices it so each batch's state/shuffle stays bounded, while
    // AvailableNow still drains everything and then stops.
    val sp = s
    import sp.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft_backlog").toFile.getPath
    for (i <- 1 to 4)
      Seq((i.toLong, i * 1.0)).toDF("k", "v").coalesce(1)
        .write.mode("append").parquet(src)
    val q = sp.readStream.schema("k LONG, v DOUBLE")
      .option("maxFilesPerTrigger", "1").parquet(src)
      .groupBy("k").agg(sum("v").as("sv"))
      .writeStream.format("memory").queryName("backlog_out")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    assert(batches.length == 4,
      s"expected 4 single-file micro-batches, got ${batches.length}")
    assert(batches.forall(_.numInputRows == 1L),
      "each micro-batch must carry exactly one file's rows")
    assert(s.table("backlog_out").count() == 4, "the backlog must still drain fully")
  }

  test("streaming curation: quality filter + content dedup run identically on a stream") {
    // The q105 pipeline's row-local stages (quality floor, exact content
    // dedup) applied to a document STREAM: the same facade expression
    // drives both, and the stream keeps exactly the batch-kept rows.
    val sp = s
    import sp.implicits._
    implicit val ctx = sp.sqlContext
    val base = LocalDateTime.of(2024, 1, 1, 10, 0, 0)
    val good = ("the " + "scan of the table in a fast query order " * 5).trim
    val bad = "zzz!!! ###"
    val docs = Seq( // (doc_id, text, arrival)
      Doc(1, good, utcTs(base)),
      Doc(2, good, utcTs(base.plusMinutes(1))), // exact dup of 1 → dropped
      Doc(3, bad, utcTs(base.plusMinutes(2))), // below the quality floor
      Doc(4, good + " big data join", utcTs(base.plusMinutes(3))))
    val curate = (df: DataFrame) => df
      .withColumn("quality", Tables.r4(graft.api.Graft.qualityScore(col("text"))))
      .filter(col("quality") >= 0.4)
      .withColumn("chash", sha2(col("text"), 256))
    val ms = MemoryStream[Doc]
    val q = curate(ms.toDF)
      .withWatermark("tsc", "10 minutes")
      .dropDuplicatesWithinWatermark("chash")
      .writeStream.format("memory").queryName("curate_out")
      .outputMode("append").start()
    ms.addData(docs)
    q.processAllAvailable()
    val streamKept = s.table("curate_out")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    q.stop()
    val batchKept = curate(docs.toDF)
      .groupBy("chash").agg(min("doc_id").as("doc_id"))
      .collect().map(_.getLong(1)).toSet
    assert(streamKept == Set(1L, 4L), s"stream kept $streamKept")
    assert(streamKept == batchKept, "stream and batch curation disagree")
  }

  test("trending-decay rollup: stream result equals batch result (q166's mergeability claim)") {
    val sp = s
    import sp.implicits._
    implicit val ctx = sp.sqlContext
    val day0 = 1704067200000000L
    val clicks = Tables.events(s, d).filter(col("event_type") === "click")
      .select(get_json_object(col("props"), "$.k").cast("long").as("item"),
        expr(graft.Tables.sqlFloorDiv(s"ts div 1000 - ${day0}L",
          "86400000000L")).as("k"))
      .as[(Long, Long)].collect().toIndexedSeq
    val ms = MemoryStream[(Long, Long)]
    ms.addData(clicks)
    val streamed = runComplete(
      streaming.Streaming.trendingRollup(ms.toDF.toDF("item", "k")),
      "trending_out")
    val batch = streaming.Streaming.trendingRollup(
      clicks.toDF("item", "k"))
    assert(streamed.except(batch).count() == 0)
    assert(batch.except(streamed).count() == 0)
    assert(streamed.count() == batch.count())
  }

  test("Streaming.sized pins the state-store count at query start on an isolated child session") {
    // The sizing lever SCALING.md's rule names (r13 verdict task #5), with
    // the r13-ADVICE isolation fix: the state-store count =
    // spark.sql.shuffle.partitions AT FIRST START, and the helper now sets
    // it on a CHILD session it hands to the start block — never mutating
    // the shared session. Assert (a) the running query really keeps 8
    // stores (StateOperatorProgress), (b) the result is the same as the
    // default-partition batch run — sizing must never change semantics —
    // and (c) the PARENT session conf is untouched throughout (a
    // concurrent caller could never observe the temporary values).
    val sp = s
    import sp.implicits._
    val priorShuf = sp.conf.get("spark.sql.shuffle.partitions")
    val data = batchEvents.as[Ev].collect().toIndexedSeq
    val (q, child) = streaming.Streaming.sized(sp, 8, noDataMicroBatches = false) { sess =>
      // the block builds source AND sink through the session it receives —
      // that is the session the query starts on, hence the one the
      // state-store conf binds to
      implicit val ctx = sess.sqlContext
      val ms = MemoryStream[Ev]
      ms.addData(data)
      val query = streaming.Streaming.tumbling(ms.toDF.withWatermark("tsc", "10 minutes"))
        .writeStream.format("memory").queryName("sized_out")
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      (query, sess)
    }
    q.awaitTermination()
    val stores = q.recentProgress.flatMap(_.stateOperators)
      .map(_.numShufflePartitions).distinct.toSeq
    assert(stores == Seq(8L),
      s"query must run with 8 state stores, saw $stores")
    assert(sp.conf.get("spark.sql.shuffle.partitions") == priorShuf,
      "sized must not touch the parent session's shuffle-partition conf")
    assert(sp.conf.getOption(
      "spark.sql.streaming.noDataMicroBatches.enabled").isEmpty ||
      sp.conf.get("spark.sql.streaming.noDataMicroBatches.enabled") == "true",
      "sized must not touch the parent session's no-data-batch conf")
    // the memory sink registers in the CHILD session's catalog
    val streamed = child.table("sized_out")
    val batch = streaming.Streaming.tumbling(batchEvents)
    assert(streamed.except(batch).count() == 0)
    assert(batch.except(streamed).count() == 0)
  }
}

/** Document row for the streaming-curation test. */
case class Doc(doc_id: Long, text: String, tsc: Timestamp)

/** Per-key running max over [[org.apache.spark.sql.streaming.ValueState]] —
  * the minimal transformWithState processor (no timers, no TTL). */
/** Per-key Holt level/trend recurrence as streaming state — every step
  * applies the IDENTICAL 10 dp-pinned IEEE ops as Graft.holt's SQL fold,
  * so the streaming state must equal the batch fold EXACTLY (==), not
  * within a tolerance. State = (level, trend, n). */
class HoltProcessor(alpha: Double, beta: Double)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, Ev, (Long, Double, Double, Long)] {
  @transient private var st:
    org.apache.spark.sql.streaming.ValueState[(Double, Double, Long)] = _
  override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
                    timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    st = getHandle.getValueState[(Double, Double, Long)]("holt",
      org.apache.spark.sql.Encoders.product[(Double, Double, Long)],
      org.apache.spark.sql.streaming.TTLConfig.NONE)
  private def pin10(x: Double): Double = math.floor(x * 1e10 + 0.5) / 1e10
  override def handleInputRows(key: Long, rows: Iterator[Ev],
      timers: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[(Long, Double, Double, Long)] = {
    // event order within the micro-batch is not guaranteed — replay in
    // event_id order, exactly as the batch fold sorts by its order column
    val ordered = rows.toSeq.sortBy(_.event_id)
    var (l, b, n) =
      if (st.exists()) st.get() else (Double.NaN, 0.0, 0L)
    ordered.foreach { e =>
      if (n == 0L) { l = e.value; b = 0.0 }
      else {
        val nl = pin10(alpha * e.value + (1 - alpha) * (l + b))
        val nb = pin10(beta * (nl - l) + (1 - beta) * b)
        l = nl; b = nb
      }
      n += 1
    }
    st.update((l, b, n))
    Iterator.single((key, l, b, n))
  }
}

class RunningMaxProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Ev, (Long, Double)] {
  @transient private var maxState: org.apache.spark.sql.streaming.ValueState[Double] = _
  override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
                    timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    maxState = getHandle.getValueState[Double]("max",
      org.apache.spark.sql.Encoders.scalaDouble,
      org.apache.spark.sql.streaming.TTLConfig.NONE)
  override def handleInputRows(key: Long, rows: Iterator[Ev],
      timers: org.apache.spark.sql.streaming.TimerValues): Iterator[(Long, Double)] = {
    val prev = if (maxState.exists()) maxState.get() else Double.NegativeInfinity
    val m = rows.foldLeft(prev)((acc, e) => math.max(acc, e.value))
    maxState.update(m)
    Iterator.single((key, m))
  }
}
