package graft.streaming

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.8c event-time windowing: tumbling / sliding / session windows.
  *
  * The `queries` entries are the BATCH twins (the driver's Verify/Bench call
  * count()/write() which are illegal on streaming DataFrames); the shared
  * transformation functions below are applied verbatim to a streaming source
  * in StreamingSpec (MemoryStream + Trigger.AvailableNow) to assert
  * stream ≡ batch. Event-time semantics make the two identical by
  * construction — the same groupBy(window(...)) plan runs incrementally with
  * a watermark in streaming mode.
  *
  * Scale notes: tumbling/sliding aggregation state is bounded by
  * (#windows × #groups) and evicted by the watermark; session windows key
  * state by user and merge on overlap — all shuffle-partitioned by the group
  * key, no driver state. The sliding window fans each event into
  * length/slide = 2 windows before the shuffle (Spark expands exactly the
  * needed window instances, not a cross join).
  *
  * Deployment sizing (measured, SCALING.md r12): each stateful operator
  * keeps one state store per shuffle partition and every store commits per
  * micro-batch, so the per-batch fixed cost is ≈ 0.2 s + ~0.02 s ×
  * `spark.sql.shuffle.partitions` (set at query START). Size a stream's
  * partition count to its STATE, not the site batch default — 32 → 8
  * partitions measured 2.3–2.5× incremental throughput on these shapes at
  * small per-partition state.
  */
object Streaming {

  /** Deployment-sizing wrapper (r13, isolated r14): runs `start` — a block
    * that builds and STARTS a streaming query off the SparkSession it is
    * handed — on a FRESH child session (`spark.newSession()`: same
    * SparkContext, same cached data, isolated SQL conf) with
    * `spark.sql.shuffle.partitions` (which pins the stateful operator's
    * state-store count at first start) and `noDataMicroBatches` set on
    * that child only. Why a start-scoped wrapper and not a DataFrame
    * transform: Spark reads both settings from the SESSION conf at query
    * start — a `repartition` on the frame would add an exchange without
    * changing the state-store count. Why a child session and not a
    * set/restore around the block (the r13 shape): mutating the SHARED
    * session conf races any concurrent `sized` call or batch-query start
    * on the same session — one could observe the temporary values or
    * restore the wrong prior (r13 ADVICE). The child session's conf dies
    * with it, so nothing needs restoring and concurrent callers are
    * isolated by construction. The block MUST build its source/sink
    * through the session it receives (not a captured outer session) —
    * the settings bind to the session the query starts on.
    *
    * Sizing rule (MEASURED, SCALING.md r12 / STREAMBENCH.json): each
    * stateful operator keeps one state store per shuffle partition and
    * every store commits a delta file per micro-batch, giving a per-batch
    * fixed cost ≈ 0.2 s + ~0.02 s × partitions. On these shapes at small
    * per-partition state, 32 → 8 partitions measured 2.3–2.5× incremental
    * throughput, `noDataMicroBatches=false` another ~1.8× (append results
    * then finalize only on the NEXT data batch), and both levers stacked
    * 4.6–5.7× (13.7–18.3 k rows/s). Size partition count to the STATE, not
    * the site batch default: partitions ≈ max(cores actually needed for
    * the per-batch row volume, state size / executor-memory budget). */
  def sized[T](spark: SparkSession, statePartitions: Int,
      noDataMicroBatches: Boolean = true)(start: SparkSession => T): T = {
    require(statePartitions >= 1, s"statePartitions must be >= 1, got $statePartitions")
    val sess = spark.newSession()
    sess.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    sess.conf.set("spark.sql.streaming.noDataMicroBatches.enabled",
      noDataMicroBatches.toString)
    start(sess)
  }

  /** Shared transforms — `ev` may be a batch OR streaming DataFrame with the
    * events schema (+ tsc). Ordering/rounding happen in the batch wrapper
    * (sorts are illegal on unaggregated streams). */
  def tumbling(ev: DataFrame): DataFrame =
    ev.groupBy(window(col("tsc"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sv"))
      .select(col("w.start").as("ws"), col("event_type"), col("n"), col("sv"))

  def sliding(ev: DataFrame): DataFrame =
    ev.groupBy(window(col("tsc"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("ws"), col("n"))

  def session(ev: DataFrame): DataFrame =
    ev.groupBy(session_window(col("tsc"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sv"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("n_events"), col("sv"))

  /** q216's burst screen as a streaming monitor: per-user event counts in
    * 60 s windows sliding every 15 s — the alert-feed form of the batch
    * trailing-window screen. Grid-aligned sliding windows are the standard
    * streaming discretization of a trailing range window: a burst of k
    * events inside any 15 s span lands whole in at least one window, so
    * the stream detects every burst the batch screen would, at ±15 s
    * boundary resolution. Each event fans into exactly 60/15 = 4 windows;
    * state is (user × open windows), watermark-evicted. */
  def burst(ev: DataFrame): DataFrame =
    ev.groupBy(window(col("tsc"), "60 seconds", "15 seconds").as("w"),
        col("user_id"))
      .agg(count(lit(1)).as("burst"))
      .select(col("user_id"), col("w.start").as("ws"), col("burst"))

  /** q166's trending-decay rollup as a streaming-maintainable aggregation:
    * input rows carry (item, k day index); output per item the click count
    * and the 7-day-half-life decayed score. ONE commutative+associative
    * sum — a streaming sink in complete/update mode maintains it
    * incrementally with no extra state, which is exactly the mergeability
    * claim q166's scaladoc makes (StreamingSpec proves stream ≡ batch). */
  def trendingRollup(df: DataFrame): DataFrame =
    df.groupBy("item")
      .agg(count(lit(1)).as("n_clicks"),
        graft.Tables.r4(sum(pow(lit(0.5),
          (lit(30L) - col("k")).cast("double") / lit(7.0)))).as("trend_score"))

  def q80(s: SparkSession, d: String): DataFrame =
    tumbling(events(s, d))
      .select(col("ws"), col("event_type"), col("n"), r2(col("sv")).as("sum_value"))
      .orderBy("ws", "event_type")

  def q81(s: SparkSession, d: String): DataFrame =
    sliding(events(s, d)).orderBy("ws")

  def q82(s: SparkSession, d: String): DataFrame =
    session(events(s, d))
      .select(col("user_id"), col("session_start"), col("n_events"),
        r2(col("sv")).as("sum_value"))
      .orderBy("user_id", "session_start")

  /** Streaming DEDUP as a windowed aggregation: the distinct
    * (day, user, event_type) activity stream — the incremental form of a
    * daily-active rollup. Expressed as groupBy(window(1 day), keys)
    * rather than dropDuplicates because a day-keyed subset leaves
    * dropDuplicates' state unevictable (the watermark column is not in
    * the key) while dropDuplicatesWithinWatermark only dedups arrivals
    * within the delay — the windowed agg is the form whose event-time
    * semantics make stream ≡ batch EXACT, with state bounded by
    * (open windows × active pairs) and watermark-evicted. */
  def dailyPairs(ev: DataFrame): DataFrame =
    ev.groupBy(window(col("tsc"), "1 day").as("w"),
        col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n_occ"))
      .select(col("w.start").as("day"), col("user_id"),
        col("event_type"), col("n_occ"))

  def q254(s: SparkSession, d: String): DataFrame =
    dailyPairs(events(s, d))
      .groupBy("day")
      .agg(count(lit(1)).as("n_active_pairs"),
        countDistinct("user_id").as("n_users"),
        sum("n_occ").as("n_events"))
      .orderBy("day")

  def q225(s: SparkSession, d: String): DataFrame =
    burst(events(s, d))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_windows"), max("burst").as("max_burst"))
      .orderBy(col("max_burst").desc, col("user_id")).limit(20)

  /** The hourly aggregation a 1-hour-watermark stream maintains — q279's
    * streaming side. StreamingSpec feeds it a late-injection arrival
    * sequence one micro-batch per event and asserts the surviving counts
    * equal the batch audit's n_kept exactly. */
  def keptHourly(ev: DataFrame): DataFrame =
    ev.withWatermark("tsc", "1 hour")
      .groupBy(window(col("tsc"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n_kept"), sum("value").as("sv"))
      .select(col("w.start").as("ws"), col("n_kept"), col("sv"))

  /** Watermark late-data audit — the accounting a pipeline owner asks of
    * any watermarked job: with arrival order = event_id and a 1-hour
    * watermark over 1-hour tumbling event-time windows, how many rows
    * does each window KEEP and how many arrive too late and get DROPPED?
    * The batch twin replays Spark's own rule row-by-row: the watermark
    * before an arrival is max(event time over strictly earlier arrivals,
    * floored to ms exactly as EventTimeStatsAccum tracks it) minus the
    * delay, and a row is late iff its window END has passed that
    * watermark (windows ending exactly on it count as closed, matching
    * WatermarkSupport's <= eviction predicate). [[keptHourly]] is the
    * live form; StreamingSpec proves kept-side equivalence under
    * per-event watermark advance.
    *
    * Determinism: pure integer ns/ms arithmetic off the exact arrival
    * order; counts exact, one 2 dp sum pin. Scale: the strictly-preceding
    * running max is Graft.prefixMax's range-blocked two-pass scan (never
    * one global single-partition window) + ONE map-side-combined agg to
    * the hour grain. */
  def q279(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .select(col("event_id"), col("ts"), col("tsc"), col("value"))
    graft.api.Graft.prefixMax(ev, "event_id", "ts", "wm_ns")
      .withColumn("win_start_us",
        expr("(ts div 1000) div 3600000000 * 3600000000"))
      // Spark tracks max event time in whole ms: floor ns -> ms, subtract
      // the 1 h delay, compare against the window-end ms (hour-aligned,
      // so the division is exact)
      .withColumn("late", col("wm_ns").isNotNull &&
        expr("wm_ns div 1000000") - lit(3600000L) >=
          expr("(win_start_us + 3600000000) div 1000"))
      // window key off the NTZ column: type-stable vs DuckDB's naive
      // TIMESTAMP with no session-TZ dependence
      .groupBy(date_trunc("hour", col("tsc")).as("ws"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("late"), 1L).otherwise(0L)).as("n_dropped"),
        sum(when(!col("late"), 1L).otherwise(0L)).as("n_kept"),
        r2(sum(when(!col("late"), col("value")))).as("kept_sum_value"))
      .orderBy("ws")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q80_tumbling_window" -> q80,
    "q81_sliding_window" -> q81,
    "q82_session_window" -> q82,
    "q225_burst_windows" -> q225,
    "q254_daily_dedup" -> q254,
    "q279_watermark_audit" -> q279)

  val oracle: Map[String, String] = Map(
    "q80_tumbling_window" ->
      s"""SELECT date_trunc('hour', ts) AS ws, event_type, count(*) AS n,
         |  ${sr2("sum(value)")} AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // Each event belongs to exactly 2 sliding windows (1h length / 30m
    // slide): starts floor30(ts) and floor30(ts) - 30min. make_timestamp
    // keeps the result a naive TIMESTAMP (to_timestamp would be TZ-aware).
    "q81_sliding_window" ->
      """SELECT make_timestamp((epoch_us(ts) // 1800000000 - k) * 1800000000) AS ws,
        |  count(*) AS n
        |FROM events, (VALUES (0), (1)) AS t(k)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // Spark session_window semantics: a gap >= 30min starts a NEW session
    // (an event at t extends the session to t+30min exclusive).
    "q82_session_window" ->
      s"""WITH e AS (SELECT user_id, event_id, ts, value,
         |    CASE WHEN lag(ts) OVER w IS NULL
         |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
         |         THEN 1 ELSE 0 END AS new_sess
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |s2 AS (SELECT user_id, ts, value,
         |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |  FROM e)
         |SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
         |  ${sr2("sum(value)")} AS sum_value
         |FROM s2 GROUP BY user_id, sid
         |ORDER BY user_id, session_start""".stripMargin,
    "q254_daily_dedup" ->
      """WITH p AS (SELECT date_trunc('day', ts) AS day, user_id, event_type,
        |    CAST(count(*) AS BIGINT) AS n_occ
        |  FROM events GROUP BY 1, 2, 3)
        |SELECT day, count(*) AS n_active_pairs,
        |  count(DISTINCT user_id) AS n_users,
        |  CAST(sum(n_occ) AS BIGINT) AS n_events
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,
    // Arrival order = event_id; watermark before a row = ms-floored max
    // event time over STRICTLY earlier arrivals minus 1 h; late iff the
    // row's hour-window end <= that watermark (mirrors q279 exactly).
    "q279_watermark_audit" ->
      s"""WITH e AS (SELECT event_id, epoch_us(ts) AS us, value FROM events),
         |wm AS (SELECT us, value,
         |    max(us) OVER (ORDER BY event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wmus
         |  FROM e),
         |f AS (SELECT us // 3600000000 * 3600000000 AS ws_us, value,
         |    CASE WHEN wmus IS NOT NULL
         |           AND wmus // 1000 - 3600000 >=
         |               (us // 3600000000 * 3600000000 + 3600000000) // 1000
         |         THEN 1 ELSE 0 END AS late
         |  FROM wm)
         |SELECT make_timestamp(ws_us) AS ws,
         |  CAST(count(*) AS BIGINT) AS n_total,
         |  CAST(sum(late) AS BIGINT) AS n_dropped,
         |  CAST(sum(1 - late) AS BIGINT) AS n_kept,
         |  ${sr2("sum(CASE WHEN late = 0 THEN value END)")} AS kept_sum_value
         |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,
    // Each event belongs to exactly 4 sliding windows (60s length / 15s
    // slide): 15s slots floor15(ts) - k for k in 0..3.
    "q225_burst_windows" ->
      """WITH f AS (SELECT user_id, (epoch_us(ts) // 15000000 - k) AS wslot
        |  FROM events, (VALUES (0), (1), (2), (3)) AS t(k)),
        |w2 AS (SELECT user_id, wslot, count(*) AS burst
        |  FROM f GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_windows,
        |  CAST(max(burst) AS BIGINT) AS max_burst
        |FROM w2 GROUP BY 1
        |ORDER BY max_burst DESC, user_id LIMIT 20""".stripMargin)
}
