package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.5 window functions: top-k per group, running sum, sessionization,
  * ranking kinds, moving average, lead/lag + range frames.
  *
  * Scale notes: every per-entity window partitions by a high-cardinality key
  * (o_custkey / user_id), so the window shuffle hash-distributes evenly and
  * each partition sorts only its own rows — this holds at 1000 executors.
  * The two global windows (q33 ranking over suppliers, q34 moving average
  * over daily totals) are single-partition by construction; that is safe
  * because their inputs are dimension-sized (suppliers) or bounded by the
  * calendar (one row per date after pre-aggregation) — at 100 TB the
  * pre-aggregation shrinks the fact table *before* the single-partition sort.
  * Rank outputs are cast to long: Spark's rank family returns int32 while
  * DuckDB emits int64, and the driver compares dtypes via pandas.
  */
object Windows {

  def q30(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders(s, d)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "rn")
  }

  def q31(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        r2(sum("o_totalprice").over(w)).as("cum_spend"))
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")
  }

  /** Sessionization in exact µs-integer arithmetic. The gap compare and the
    * in-user ordering both run on `ts div 1000` — TRUNCATE-THEN-SUBTRACT,
    * never the raw ns values: DuckDB's scan truncates each timestamp to µs,
    * so an ns-domain gap compare (or ns-refined ordering) can disagree with
    * the oracle within ±1 µs of the 30-min boundary / on same-µs ties
    * (SURVEY §1.3, the r4 interval-join lesson). Gap > 30 min starts a new
    * session. */
  def q32(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d).withColumn("ts_us", expr("ts div 1000"))
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("new_sess",
        when(lag("ts_us", 1).over(w).isNull ||
          (col("ts_us") - lag("ts_us", 1).over(w)) > lit(1800000000L), 1L).otherwise(0L))
      .withColumn("session_id", sum("new_sess").over(wc))
      .select("user_id", "event_id", "tsc", "session_id")
      .orderBy("event_id")
  }

  /** Session path mining (clickstream analysis): top-20 event-type
    * TRIGRAMS occurring inside one 30-minute session — which 3-step flows
    * dominate. Builds on q32's sessionization; the trigram leads run over
    * the SAME (user_id | ts, event_id) window spec, so the session pass
    * and the lead pass share one shuffle+sort (the second WindowExec sees
    * its required ordering already satisfied — no new Exchange). Staying
    * inside a session is enforced by leading the session id alongside the
    * event type and filtering equality — cheaper than re-partitioning by
    * (user, session), which WOULD be a second shuffle. */
  def q115(s: SparkSession, d: String): DataFrame =
    sessionPaths(events(s, d))

  /** [[q115]]'s body over any events-shaped frame — factored out so the
    * hot-key mitigation recipe (SkewSpec / SCALING.md: `Graft.capPerKey`
    * on user_id before the window chain) runs the IDENTICAL plan on a
    * capped input rather than a near-copy. */
  private[graft] def sessionPaths(ev: DataFrame): DataFrame = {
    val e = ev.withColumn("ts_us", expr("ts div 1000"))
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("new_sess",
        when(lag("ts_us", 1).over(w).isNull ||
          (col("ts_us") - lag("ts_us", 1).over(w)) > lit(1800000000L), 1L).otherwise(0L))
      .withColumn("session_id", sum("new_sess").over(wc))
      .withColumn("e2", lead("event_type", 1).over(w))
      .withColumn("s2", lead("session_id", 1).over(w))
      .withColumn("e3", lead("event_type", 2).over(w))
      .withColumn("s3", lead("session_id", 2).over(w))
      .filter(col("s2") === col("session_id") && col("s3") === col("session_id"))
      .select(concat_ws(" > ", col("event_type"), col("e2"), col("e3")).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(20)
  }

  /** rank/dense_rank get real ties via a coarse bucket key (floor(bal/1000));
    * ntile/row_number need a total order, so they run over a fully-tiebroken
    * window — mixing the two on one window would make ntile nondeterministic. */
  def q33(s: SparkSession, d: String): DataFrame = {
    val wr = Window.orderBy(floor(col("s_acctbal") / lit(1000.0)).desc)
    val wt = Window.orderBy(col("s_acctbal").desc, col("s_suppkey"))
    supplier(s, d)
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
        rank().over(wr).cast("long").as("rnk"),
        dense_rank().over(wr).cast("long").as("drnk"),
        ntile(4).over(wt).cast("long").as("quartile"),
        row_number().over(wt).cast("long").as("rn"))
      .orderBy("s_suppkey")
  }

  def q34(s: SparkSession, d: String): DataFrame = {
    val daily = orders(s, d).groupBy("o_orderdate")
      .agg(sum("o_totalprice").as("rev"))
    val w = Window.orderBy("o_orderdate").rowsBetween(-2, 0)
    daily
      .select(col("o_orderdate"), r2(col("rev")).as("rev"),
        r2(avg("rev").over(w)).as("ma3"))
      .orderBy("o_orderdate")
  }

  /** lead/lag gaps in exact µs integers + count/first over a 1-hour RANGE
    * frame. `first` over the range frame equals min(ts) in the frame, so its
    * VALUE is deterministic even when two events share a timestamp. */
  def q35(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d).withColumn("ts_us", expr("ts div 1000"))
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val wr = Window.partitionBy("user_id").orderBy(col("ts_us"))
      .rangeBetween(-3600000000L, 0)
    e.select(col("user_id"), col("event_id"),
        (col("ts_us") - lag("ts_us", 1).over(w)).as("gap_us"),
        (lead("ts_us", 1).over(w) - col("ts_us")).as("next_gap_us"),
        count(lit(1)).over(wr).as("n_1h"),
        first("ts_us").over(wr).as("first_us"))
      .orderBy("event_id")
  }

  /** SCD type-2 dimension construction from the event change log: each
    * (user, event_type) observation becomes a row valid from its own
    * timestamp until the next observation's (`valid_to_us` null = current
    * row). The snapshot-table shape every warehouse maintains; pair with
    * the as-of join (q17) to enrich facts as-of event time. µs integer
    * domain per the §1.3 truncate-then-compare discipline; one shuffle on
    * the entity keys + one lead window — linear at any scale. */
  def q127(s: SparkSession, d: String): DataFrame = {
    val log = events(s, d).select(col("user_id"), col("event_type"),
      expr("ts div 1000").as("valid_from_us"), col("value"), col("event_id"))
    graft.api.Graft.validityIntervals(log, Seq("user_id", "event_type"),
        "valid_from_us", Seq("event_id"))
      .select(col("user_id"), col("event_type"), r2(col("value")).as("value"),
        col("valid_from_us"), col("valid_to").as("valid_to_us"),
        col("is_current").cast("long").as("is_current"))
      .orderBy("user_id", "event_type", "valid_from_us", "value")
  }

  /** Snapshot diff — "what changed between two as-of times": the q127 SCD2
    * intervals probed at t₁ = Jan 10 and t₂ = Jan 20 give the dimension
    * state at each time; a full outer join on the entity key classifies
    * every entity as added / removed / changed / unchanged between the two
    * snapshots (values compared at the shared 2 dp pin). The warehouse
    * reconciliation primitive: audit a backfill, detect drift between a
    * materialization and its source, or summarize a day's dimension churn.
    *
    * Scale: intervals are built ONCE (one (entity|ts) window shuffle) and
    * both snapshots are filters over them — never two scans of the change
    * log; the diff join keys on the entity, hash-partitionable. Output is
    * the 4-row status summary, aggregated before anything leaves the
    * executors. */
  def q139(s: SparkSession, d: String): DataFrame = {
    val t1 = 1704844800000000L // 2024-01-10T00:00:00Z in epoch µs
    val t2 = 1705708800000000L // 2024-01-20T00:00:00Z
    val log = events(s, d).select(col("user_id"), col("event_type"),
      expr("ts div 1000").as("us"), col("value"), col("event_id"))
    val iv = graft.api.Graft.validityIntervals(
      log, Seq("user_id", "event_type"), "us", Seq("event_id"))
    def snap(t: Long) = iv
      .filter(col("us") <= t && (col("valid_to").isNull || col("valid_to") > t))
      .select(col("user_id"), col("event_type"), r2(col("value")).as("v"))
    snap(t1).select(col("user_id"), col("event_type"), col("v").as("v1"))
      .join(snap(t2).select(col("user_id"), col("event_type"), col("v").as("v2")),
        Seq("user_id", "event_type"), "full_outer")
      .withColumn("status",
        when(col("v1").isNull, "added")
          .when(col("v2").isNull, "removed")
          .when(col("v1") === col("v2"), "unchanged")
          .otherwise("changed"))
      .groupBy("status")
      .agg(count(lit(1)).as("n_entities"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("status")
  }

  /** Session summary statistics — the companion readout to q32 (session
    * ASSIGNMENT) and q115 (paths): session count, mean depth
    * (events/session), mean duration, and the bounce rate (single-event
    * sessions) — the top-of-dashboard engagement numbers every clickstream
    * product reports.
    *
    * Determinism: depth and duration are exact integers (count, max−min
    * µs); every output ratio is an integer-sum / integer-count division
    * written the same way in both engines, pinned 4 dp. Scale: the one
    * (user|ts) sessionization shuffle shared with q32/q131, a
    * (user, session)-keyed agg, then a one-row global agg. */
  def q143(s: SparkSession, d: String): DataFrame = {
    val sess = graft.api.Graft.sessionize(
      events(s, d).withColumn("ts_us", expr("ts div 1000"))
        .select(col("user_id"), col("event_id"), col("ts_us")),
      "user_id", "ts_us", 1800000000L, Seq("event_id"))
    val per = sess.groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("depth"),
        (max("ts_us") - min("ts_us")).as("dur_us"))
    per.agg(count(lit(1)).as("n_sessions"),
        sum("depth").as("sd"), sum("dur_us").as("sdur"),
        sum(when(col("depth") === 1, 1L).otherwise(0L)).as("nb"))
      .select(col("n_sessions"),
        r4(col("sd").cast("double") / col("n_sessions").cast("double"))
          .as("avg_depth"),
        r4(col("sdur").cast("double") / col("n_sessions").cast("double") /
          lit(1e6)).as("avg_duration_sec"),
        r4(col("nb").cast("double") / col("n_sessions").cast("double"))
          .as("bounce_rate"))
  }

  /** Daily panel construction: the q127 SCD2 intervals resampled to one
    * state row per (entity, day-start) over January 2024, aggregated to a
    * calendar-dense daily summary (live entities, users, mean pinned
    * value) — the balanced-panel shape longitudinal models train on, and
    * the daily-snapshot fact warehouses materialize.
    *
    * Scale: each interval EXPLODES to the day-starts it covers (q121's
    * contribution-explode discipline — never day × interval rescans);
    * the k-range arithmetic is all integer µs, exact in both engines.
    * Zero-entity days survive via a left join from the broadcast 31-day
    * spine (q117's calendar-spine-broadcasts rule). */
  def q146(s: SparkSession, d: String): DataFrame = {
    val day0 = 1704067200000000L // 2024-01-01T00:00:00Z epoch µs
    val dayUs = 86400000000L
    val log = events(s, d).select(col("user_id"), col("event_type"),
      expr("ts div 1000").as("us"), col("value"), col("event_id"))
    val iv = graft.api.Graft.validityIntervals(
      log, Seq("user_id", "event_type"), "us", Seq("event_id"))
    val live = iv
      .withColumn("k_min",
        expr(sqlFloorDiv(s"us - ${day0}L + ${dayUs}L - 1", s"${dayUs}L")))
      .withColumn("k_max", expr(s"CASE WHEN valid_to IS NULL THEN 30L ELSE " +
        sqlFloorDiv(s"valid_to - ${day0}L - 1", s"${dayUs}L") + " END"))
      // k_max >= 0 matters: Spark's sequence(hi, lo) DESCENDS when hi > lo
      // (DuckDB's generate_series returns empty), so a clamped-to-0 start
      // against a negative end must never reach the explode
      .filter(col("k_max") >= col("k_min") && col("k_min") <= 30 &&
        col("k_max") >= 0)
      // clamp both ends into the calendar so an out-of-window interval can
      // never explode beyond the 31 spine days (library hygiene — this
      // corpus is January-only, but the operator shouldn't rely on it)
      .withColumn("k",
        explode(expr("sequence(greatest(k_min, 0L), least(k_max, 30L))")))
      .select((lit(day0) + col("k") * lit(dayUs)).as("day_us"),
        col("user_id"), col("value"))
    val agg = live.groupBy("day_us")
      .agg(count(lit(1)).as("n_entities"),
        countDistinct(col("user_id")).as("n_users"),
        r2(avg("value")).as("avg_value"))
    val spine = s.range(31)
      .select((lit(day0) + col("id") * lit(dayUs)).as("day_us"))
    // the preserved (left) side of a left-outer hash join can't be the
    // build side, so the hint goes on the calendar-sized aggregate
    spine.join(broadcast(agg), Seq("day_us"), "left")
      .select(col("day_us"),
        coalesce(col("n_entities"), lit(0L)).as("n_entities"),
        coalesce(col("n_users"), lit(0L)).as("n_users"),
        col("avg_value"))
      .orderBy("day_us")
  }

  /** Event-TYPE transition matrix (the Sankey-diagram edge list): per
    * (from, to) consecutive-event pair the count and row-normalized
    * probability — q108's Markov machinery lifted from items to the
    * event-type level, the "what do users do next after X" flow readout.
    *
    * Determinism: lag order is (µs, id)-total; counts exact; prob one
    * int/int division pinned 4 dp. Scale: ONE per-user window (bounded
    * history per partition) + two same-keyed aggs; the matrix grain is
    * k² ≤ 25 rows. */
  def q177(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d).select(col("user_id"), col("event_id"),
      col("event_type"), expr("ts div 1000").as("us"))
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val tr = e.withColumn("from_type", lag("event_type", 1).over(w))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val tot = tr.groupBy("from_type").agg(sum("n").as("n_from"))
    tr.join(broadcast(tot), "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        r4(col("n").cast("double") / col("n_from").cast("double")).as("prob"))
      .orderBy("from_type", "to_type")
  }

  /** Sequence-pattern matching (the MATCH_RECOGNIZE shape Spark lacks):
    * each user's event history becomes an initials string in strict
    * (ts, event_id) order, and a regex counts non-overlapping browse-
    * to-buy journeys `vc*p` (view, any clicks, purchase — a signup or
    * error in between breaks the match). One corpus row: users, matched
    * users, match rate, total journeys, mean sequence length.
    *
    * Determinism: collect_list is order-free because array_sort over the
    * (ts, event_id, initial) structs rebuilds the total order before the
    * join — over the FULL ns timestamp, not a µs truncation, so the
    * order matches the oracle's ORDER BY ts even for sub-µs fixtures
    * (the q215/q216 discipline); `vc*p` has no alternation/laziness, so
    * Java regex and RE2 find identical leftmost non-overlapping matches.
    * Scale: state is one sequence per user (the operator's semantics —
    * cap the slice or sessionize first when per-user histories are
    * unbounded); everything else is a one-row agg. */
  def q229(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        substring(col("event_type"), 1, 1).as("i"))
      .groupBy("user_id")
      .agg(array_join(expr(
        "transform(array_sort(collect_list(struct(ts, event_id, i))), x -> x.i)"),
        "").as("seq"))
      .withColumn("m", regexp_count(col("seq"), lit("vc*p")))
      .agg(count(lit(1)).as("n_users"),
        sum(when(col("m") > 0, 1L).otherwise(0L)).as("n_matched"),
        r4(sum(when(col("m") > 0, 1L).otherwise(0L)).cast("double") /
          count(lit(1)).cast("double")).as("match_rate"),
        sum(col("m").cast("long")).as("total_matches"),
        r2(avg(length(col("seq")))).as("avg_seq_len"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q229_seq_pattern" -> q229,
    "q177_type_transitions" -> q177,
    "q127_scd2_intervals" -> q127,
    "q139_snapshot_diff" -> q139,
    "q143_session_stats" -> q143,
    "q146_daily_panel" -> q146,
    "q30_window_topk_per_group" -> q30,
    "q31_window_running_sum" -> q31,
    "q32_window_sessionize" -> q32,
    "q33_window_rank_kinds" -> q33,
    "q34_window_moving_avg" -> q34,
    "q35_window_lead_lag_frame" -> q35,
    "q115_session_paths" -> q115)

  val oracle: Map[String, String] = Map(
    "q229_seq_pattern" ->
      s"""WITH s2 AS (SELECT user_id,
         |    string_agg(substr(event_type, 1, 1), ''
         |      ORDER BY ts, event_id) AS seq
         |  FROM events GROUP BY 1),
         |m AS (SELECT seq,
         |    CAST(len(regexp_extract_all(seq, 'vc*p')) AS BIGINT) AS m
         |  FROM s2)
         |SELECT count(*) AS n_users,
         |  CAST(sum(CASE WHEN m > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
         |  ${sr4("CAST(sum(CASE WHEN m > 0 THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)")} AS match_rate,
         |  CAST(sum(m) AS BIGINT) AS total_matches,
         |  ${sr2("avg(len(seq))")} AS avg_seq_len
         |FROM m""".stripMargin,
    "q177_type_transitions" ->
      s"""WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
         |  FROM events),
         |l AS (SELECT event_type AS to_type, lag(event_type) OVER (
         |    PARTITION BY user_id ORDER BY us, event_id) AS from_type FROM e),
         |tr AS (SELECT from_type, to_type, count(*) AS n FROM l
         |  WHERE from_type IS NOT NULL GROUP BY 1, 2),
         |tot AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from
         |  FROM tr GROUP BY 1)
         |SELECT tr.from_type, tr.to_type, tr.n,
         |  ${sr4("CAST(tr.n AS DOUBLE) / CAST(tot.n_from AS DOUBLE)")} AS prob
         |FROM tr JOIN tot USING (from_type)
         |ORDER BY from_type, to_type""".stripMargin,
    "q143_session_stats" ->
      s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         |    CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id
         |             ORDER BY epoch_us(ts), event_id) IS NULL
         |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
         |             ORDER BY epoch_us(ts), event_id) > 1800000000
         |         THEN 1 ELSE 0 END AS new_sess
         |  FROM events),
         |se AS (SELECT user_id, event_id, ts_us,
         |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
         |  FROM e),
         |per AS (SELECT user_id, session_id, count(*) AS depth,
         |    max(ts_us) - min(ts_us) AS dur_us
         |  FROM se GROUP BY 1, 2),
         |g AS (SELECT count(*) AS n_sessions,
         |    CAST(sum(depth) AS BIGINT) AS sd,
         |    CAST(sum(dur_us) AS BIGINT) AS sdur,
         |    CAST(sum(CASE WHEN depth = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb
         |  FROM per)
         |SELECT n_sessions,
         |  ${sr4("CAST(sd AS DOUBLE) / CAST(n_sessions AS DOUBLE)")} AS avg_depth,
         |  ${sr4("CAST(sdur AS DOUBLE) / CAST(n_sessions AS DOUBLE) / 1e6")} AS avg_duration_sec,
         |  ${sr4("CAST(nb AS DOUBLE) / CAST(n_sessions AS DOUBLE)")} AS bounce_rate
         |FROM g""".stripMargin,
    "q146_daily_panel" ->
      s"""WITH log AS (SELECT user_id, event_type, epoch_us(ts) AS us,
         |    value, event_id FROM events),
         |iv AS (SELECT user_id, value, us,
         |    lead(us) OVER (PARTITION BY user_id, event_type
         |      ORDER BY us, event_id) AS valid_to
         |  FROM log),
         |bounds AS (SELECT user_id, value,
         |    (us - 1704067200000000 + 86400000000 - 1) // 86400000000 AS k_min,
         |    CASE WHEN valid_to IS NULL THEN 30
         |         ELSE (valid_to - 1704067200000000 - 1) // 86400000000 END AS k_max
         |  FROM iv),
         |ks AS (SELECT user_id, value,
         |    unnest(generate_series(greatest(k_min, 0), least(k_max, 30))) AS k
         |  FROM bounds WHERE k_max >= k_min AND k_min <= 30 AND k_max >= 0),
         |live AS (SELECT 1704067200000000 + k * 86400000000 AS day_us,
         |    user_id, value FROM ks),
         |agg AS (SELECT day_us, count(*) AS n_entities,
         |    count(DISTINCT user_id) AS n_users, ${sr2("avg(value)")} AS avg_value
         |  FROM live GROUP BY 1),
         |sp AS (SELECT unnest(generate_series(0, 30)) AS k),
         |spine AS (SELECT 1704067200000000 + k * 86400000000 AS day_us FROM sp)
         |SELECT s.day_us, coalesce(n_entities, 0) AS n_entities,
         |  coalesce(n_users, 0) AS n_users, avg_value
         |FROM spine s LEFT JOIN agg USING (day_us) ORDER BY day_us""".stripMargin,
    "q139_snapshot_diff" ->
      s"""WITH log AS (SELECT user_id, event_type, epoch_us(ts) AS us,
         |    value, event_id FROM events),
         |iv AS (SELECT user_id, event_type, us, value,
         |    lead(us) OVER (PARTITION BY user_id, event_type
         |      ORDER BY us, event_id) AS valid_to
         |  FROM log),
         |s1 AS (SELECT user_id, event_type, ${sr2("value")} AS v1 FROM iv
         |  WHERE us <= 1704844800000000
         |    AND (valid_to IS NULL OR valid_to > 1704844800000000)),
         |s2 AS (SELECT user_id, event_type, ${sr2("value")} AS v2 FROM iv
         |  WHERE us <= 1705708800000000
         |    AND (valid_to IS NULL OR valid_to > 1705708800000000)),
         |d AS (SELECT coalesce(s1.user_id, s2.user_id) AS user_id,
         |    CASE WHEN v1 IS NULL THEN 'added'
         |         WHEN v2 IS NULL THEN 'removed'
         |         WHEN v1 = v2 THEN 'unchanged' ELSE 'changed' END AS status
         |  FROM s1 FULL OUTER JOIN s2
         |    ON s1.user_id = s2.user_id AND s1.event_type = s2.event_type)
         |SELECT status, count(*) AS n_entities,
         |  count(DISTINCT user_id) AS n_users
         |FROM d GROUP BY 1 ORDER BY status""".stripMargin,
    "q127_scd2_intervals" ->
      s"""WITH log AS (SELECT user_id, event_type, epoch_us(ts) AS valid_from_us,
         |    value, event_id FROM events)
         |SELECT user_id, event_type, ${sr2("value")} AS value, valid_from_us,
         |  lead(valid_from_us) OVER (PARTITION BY user_id, event_type
         |    ORDER BY valid_from_us, event_id) AS valid_to_us,
         |  CAST(CASE WHEN lead(valid_from_us) OVER (PARTITION BY user_id, event_type
         |    ORDER BY valid_from_us, event_id) IS NULL THEN 1 ELSE 0 END AS BIGINT)
         |    AS is_current
         |FROM log
         |ORDER BY user_id, event_type, valid_from_us, value""".stripMargin,
    "q115_session_paths" ->
      """WITH e AS (SELECT user_id, event_id, ts, event_type,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) > INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events),
        |se AS (SELECT user_id, event_id, ts, event_type,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM e),
        |tri AS (SELECT event_type AS e1,
        |    lead(event_type, 1) OVER w AS e2,
        |    lead(session_id, 1) OVER w AS s2,
        |    lead(event_type, 2) OVER w AS e3,
        |    lead(session_id, 2) OVER w AS s3,
        |    session_id
        |  FROM se WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT e1 || ' > ' || e2 || ' > ' || e3 AS path, count(*) AS n
        |FROM tri WHERE s2 = session_id AND s3 = session_id
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 20""".stripMargin,
    "q30_window_topk_per_group" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q31_window_running_sum" ->
      s"""SELECT o_custkey, o_orderkey, o_orderdate,
         |  ${sr2("sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")} AS cum_spend
         |FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "q32_window_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, ts,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) > INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events)
        |SELECT user_id, event_id, ts AS tsc,
        |  CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |FROM e ORDER BY event_id""".stripMargin,
    "q33_window_rank_kinds" ->
      """SELECT s_suppkey, s_name, s_acctbal,
        |  CAST(rank() OVER (ORDER BY floor(s_acctbal / 1000e0) DESC) AS BIGINT) AS rnk,
        |  CAST(dense_rank() OVER (ORDER BY floor(s_acctbal / 1000e0) DESC) AS BIGINT) AS drnk,
        |  CAST(ntile(4) OVER (ORDER BY s_acctbal DESC, s_suppkey) AS BIGINT) AS quartile,
        |  CAST(row_number() OVER (ORDER BY s_acctbal DESC, s_suppkey) AS BIGINT) AS rn
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
    "q34_window_moving_avg" ->
      s"""WITH daily AS (SELECT o_orderdate, sum(o_totalprice) AS rev
         |  FROM orders GROUP BY o_orderdate)
         |SELECT o_orderdate, ${sr2("rev")} AS rev,
         |  ${sr2("avg(rev) OVER (ORDER BY o_orderdate ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)")} AS ma3
         |FROM daily ORDER BY o_orderdate""".stripMargin,
    "q35_window_lead_lag_frame" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events)
        |SELECT user_id, event_id,
        |  ts_us - lag(ts_us) OVER w AS gap_us,
        |  lead(ts_us) OVER w - ts_us AS next_gap_us,
        |  CAST(count(*) OVER wr AS BIGINT) AS n_1h,
        |  first_value(ts_us) OVER wr AS first_us
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id),
        |  wr AS (PARTITION BY user_id ORDER BY ts_us
        |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin)
}
