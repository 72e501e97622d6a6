package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Composite analytical workloads: TPC-H-style multi-join aggregations over
  * the relational corpus (adapted to its reduced columns) and event-stream
  * analytics (funnel conversion, retention cohorts).
  *
  * Scale notes: the TPC-H shapes are the canonical shuffle-join benchmarks —
  * fact-fact joins (lineitem ⋈ orders) shuffle on the join key with
  * filters pushed to both scans; dimensions (customer, supplier, nation)
  * broadcast. Top-k results use TakeOrderedAndProject. The funnel query
  * joins events to events per user with a time-range predicate — at scale
  * the range condition bounds the state exactly like the stream-stream
  * interval join it mirrors. Retention buckets events by cohort×week with
  * one shuffle each for the cohort map and the matrix.
  */
object Workloads {

  /** TPC-H Q3 shape: top-10 open orders by revenue within a segment. */
  def q19(s: SparkSession, d: String): DataFrame = {
    val cutoff = lit("1997-06-30").cast("timestamp_ntz")
    val c = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val o = orders(s, d).filter(col("o_orderdate") < cutoff)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val l = lineitem(s, d).filter(col("l_shipdate") > cutoff)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
      .agg(r2(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** Correlated scalar subquery through the SQL entry point: orders whose
    * price exceeds 2× their customer's own average. Exercises Catalyst's
    * `RewriteCorrelatedScalarSubquery` decorrelation — the planned shape is
    * a per-customer aggregate joined back to orders (one shuffle on
    * custkey), NOT a per-row subquery execution; at scale that is the only
    * viable plan, and the optimizer produces it from the declarative form. */
  def q07(s: SparkSession, d: String): DataFrame = {
    // per-(session, sfDir) memo view — no fixed-name clobbering across
    // sfDirs, and Tables.release cleans it up with the other memos
    val v = graft.Tables.memoizedView(s, d, "orders_sql")(orders(s, d))
    s.sql(s"""
      SELECT o_orderkey, o_custkey, ${sr2("o_totalprice")} AS o_totalprice
      FROM $v o
      WHERE o_totalprice > (SELECT 2 * avg(o2.o_totalprice)
                            FROM $v o2
                            WHERE o2.o_custkey = o.o_custkey)
      ORDER BY o_orderkey""")
  }

  /** Correlated LATERAL top-k through the SQL entry point: each nation's
    * top-2 customers by account balance. Exercises Catalyst's lateral-join
    * decorrelation (`DecorrelateInnerQuery` handles the correlated
    * ORDER BY ... LIMIT): the planned shape is a per-nation window top-k
    * over ONE shuffle of customer — never a per-nation re-execution of the
    * inner query, which is the only viable plan when the outer side is
    * large. The declarative LATERAL form and q30's window form converge on
    * the same physical strategy. */
  def q111(s: SparkSession, d: String): DataFrame = {
    val nv = graft.Tables.memoizedView(s, d, "nation_sql")(nation(s, d))
    val cv = graft.Tables.memoizedView(s, d, "customer_sql")(customer(s, d))
    s.sql(s"""
      SELECT n.n_name, t.c_name, ${sr2("t.c_acctbal")} AS acctbal
      FROM $nv n JOIN LATERAL (
        SELECT c_name, c_acctbal FROM $cv c
        WHERE c.c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_name LIMIT 2) t
      ORDER BY n.n_name, acctbal DESC, t.c_name""")
  }

  /** RFM customer segmentation (the classic marketing/recommender cohort
    * primitive): per customer, Recency (days since last order, vs the
    * corpus max date), Frequency (order count), Monetary (total spend) —
    * each cut into quartiles — then segment sizes and average spend per
    * (R,F,M) cell. The customer grain SCALES WITH SF (15k at sf0.1 →
    * 15M at sf1000), so the quartile cuts are NOT computed with global
    * `ntile` windows (three single-task sorts of every customer): each
    * axis is cut with [[graft.api.Graft.ntileExact]] — the exact ntile
    * row number rebuilt from a prefix scan over the axis's value SUPPORT
    * plus a custkey tie rank, every stage parallel in support values ×
    * blocks.
    *
    * Determinism: monetary is pinned to 2 dp BEFORE the quartile cut —
    * Spark's and DuckDB's per-customer double sums differ at ~1e-9, and
    * an unpinned order could flip near-equal customers across a quartile
    * boundary; the rebuilt row number is the exact ntile input (integer
    * arithmetic thereafter), so the oracle keeps plain ntile.
    *
    * Composition note (r9 bench lesson): the three axes cut in ONE pass
    * through [[graft.api.Graft.ntileExactGrouped]] — the customer grain
    * unpivots to (axis, value) rows (desc axes pre-negated) and the
    * facade runs one support build, one grouped prefix scan and one tie
    * window for all three, instead of three full rank machines (or,
    * worse, a 3-deep ntileExact chain that re-evaluates the base O(5³)
    * times without a materialization barrier — measured 13.4 s steady
    * at sf0.1; the one-pass form is ~1.5 s). The base is memo+cached:
    * the facade references its input several times. */
  def q114(s: SparkSession, d: String): DataFrame = {
    val rfm = graft.Tables.memoized(s, d, "rfm114") {
      val maxd = orders(s, d).agg(max("o_orderdate").as("maxd"))
      orders(s, d)
        .groupBy("o_custkey")
        .agg(max("o_orderdate").as("lastd"), count(lit(1)).as("f"),
          r2(sum("o_totalprice")).as("rm"))
        .crossJoin(broadcast(maxd))
        .select(col("o_custkey"),
          datediff(col("maxd"), col("lastd")).cast("long").as("rec"),
          col("f"), col("rm"))
    }
    val longF = rfm.selectExpr("o_custkey",
      "stack(3, 'r', CAST(rec AS DOUBLE), 'f', CAST(-f AS DOUBLE), 'm', -rm) AS (ax, v)")
    val cut = graft.api.Graft.ntileExactGrouped(longF, 4, Seq("ax"), "v",
        asc = true, "o_custkey", "q")
      .groupBy("o_custkey")
      .agg(max(when(col("ax") === "r", col("q"))).as("r_q"),
        max(when(col("ax") === "f", col("q"))).as("f_q"),
        max(when(col("ax") === "m", col("q"))).as("m_q"))
    rfm.join(cut, "o_custkey")
      .groupBy("r_q", "f_q", "m_q")
      // double-rounded 6 dp → 2 dp (the q197 midpoint discipline): a cell
      // average of 2 dp spends can sit EXACTLY on a half-cent, where
      // summation-order drift alone decides the pin — collapsing both
      // engines onto the 6 dp grid first makes the 2 dp pin deterministic
      .agg(count(lit(1)).as("n_customers"),
        r2(rnd(avg("rm"), 6)).as("avg_monetary"))
      .orderBy("r_q", "f_q", "m_q")
  }

  /** Peak-concurrency of open orders — the classic interval-concurrency
    * operator (max concurrent sessions / active contracts / in-flight
    * jobs): each order is open from o_orderdate to its last lineitem
    * shipment, and the top-20 busiest days fall out of a boundary
    * (+1/−1) event stream prefix-summed over the day grain — NEVER an
    * interval×day explode (q146's resampling shape) and never a
    * day-by-interval join.
    *
    * Determinism: boundary days are exact integer epoch-days
    * (datediff — no timezone arithmetic), deltas are ±1 longs, and the
    * running sum is pure integer — no float anywhere, ties broken by
    * day. Orders with no lineitems close same-day; a close before the
    * open (dirty data) clamps to the open day. Scale: the day grain is
    * calendar-bounded but treated as fact-proportional anyway — the
    * cumulative runs through [[graft.api.Graft.prefixSum]]'s range-block
    * combine, so the plan holds even for second-resolution boundaries
    * where the support IS fact-sized. */
  def q233(s: SparkSession, d: String): DataFrame = {
    val close = lineitem(s, d).groupBy("l_orderkey")
      .agg(max("l_shipdate").as("closed"))
    val iv = orders(s, d)
      .join(close, col("o_orderkey") === col("l_orderkey"), "left")
      .select(datediff(col("o_orderdate"), lit("1970-01-01")).cast("long").as("od"),
        coalesce(datediff(col("closed"), lit("1970-01-01")).cast("long"),
          datediff(col("o_orderdate"), lit("1970-01-01")).cast("long")).as("cd"))
    // memo+cached (the q210/q149 support discipline): the day-grain delta
    // relation is tiny, but prefixSum references it three times and each
    // uncached reference re-runs the lineitem close-date agg + join
    val deltas = graft.Tables.memoized(s, d, "openDeltas") {
      iv.select(col("od").as("day"), lit(1L).as("delta"))
        .unionAll(iv.select((greatest(col("cd"), col("od")) + 1).as("day"),
          lit(-1L).as("delta")))
        .groupBy("day").agg(sum("delta").as("delta"))
    }
    graft.api.Graft.prefixSum(deltas, "day", Seq("delta"))
      .select(col("day"),
        // TIMESTAMP_NTZ, not DATE: naive midnight round-trips the driver's
        // pyarrow/DuckDB compare identically, DATE kinds don't
        expr("cast(date_add(DATE'1970-01-01', cast(day as int)) as timestamp_ntz)")
          .as("cal_date"),
        col("delta_cum").as("n_open"))
      .orderBy(col("n_open").desc, col("day"))
      .limit(20)
  }

  /** TPC-H Q5 shape: revenue by nation where customer and supplier share the
    * nation, one order-year. */
  def q47(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
      .filter(year(col("o_orderdate")) === 1997)
      .select("o_orderkey", "o_custkey")
    val l = lineitem(s, d).select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val c = customer(s, d).select("c_custkey", "c_nationkey")
    val sup = supplier(s, d).select("s_suppkey", "s_nationkey")
    val n = nation(s, d).select("n_nationkey", "n_name")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(r2(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** TPC-H Q10 shape: top-20 customers by returned-item revenue. */
  def q48(s: SparkSession, d: String): DataFrame = {
    val l = lineitem(s, d).filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val o = orders(s, d).select("o_orderkey", "o_custkey")
    val c = customer(s, d).select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
    val n = nation(s, d).select("n_nationkey", "n_name")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "n_name")
      .agg(r2(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue"),
        r2(max("c_acctbal")).as("acctbal"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q18 shape: large-volume orders (sum of line quantities > 200)
    * with their customers — the HAVING-subquery join. The aggregate is
    * computed ONCE and reused as both the filter and the output column
    * (no second lineitem pass, no IN-subquery re-scan); the filtered
    * order set is small, so the planner broadcasts it up the join chain. */
  def q97(s: SparkSession, d: String): DataFrame = {
    val big = lineitem(s, d).groupBy("l_orderkey")
      .agg(sum("l_quantity").as("sum_qty"))
      .filter(col("sum_qty") > 200)
    val o = orders(s, d).select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val c = customer(s, d).select("c_custkey", "c_name")
    big.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), r2(col("o_totalprice")).as("o_totalprice"),
        r2(col("sum_qty")).as("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** Funnel: click → purchase conversion within 30 minutes. Output is ONE
    * row: distinct clickers, distinct converters, and their ratio (null when
    * there are no clickers — nullif guards the division). */
  def q36(s: SparkSession, d: String): DataFrame = {
    // µs-truncated comparisons (truncate-then-subtract, SURVEY §1.3): the
    // oracle's timestamps are already µs, so an ns-domain window compare
    // could disagree within ±1 µs of the 30-min boundary.
    val ev = events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), expr("ts div 1000").as("ct"))
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("ts div 1000").as("pt"))
    val converted = clicks.join(buys, Seq("user_id"))
      .filter(col("pt") >= col("ct") && col("pt") - col("ct") <= lit(1800000000L))
      .select("user_id").distinct()
    val clickers = clicks.select("user_id").distinct()
    clickers.agg(count(lit(1)).as("n_clickers"))
      .crossJoin(converted.agg(count(lit(1)).as("n_converted")))
      .withColumn("conversion_rate",
        r4(col("n_converted").cast("double") / nullif(col("n_clickers"), lit(0L))))
  }

  /** Retention cohorts: users grouped by their first-event week; per
    * (cohort_week, active_week) distinct active users. */
  def q37(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .select(col("user_id"), date_trunc("week", col("tsc")).as("wk"))
    val cohort = ev.groupBy("user_id").agg(min("wk").as("cohort_week"))
    ev.join(cohort, "user_id")
      .groupBy(col("cohort_week"), col("wk").as("active_week"))
      .agg(countDistinct("user_id").as("n_active"))
      .orderBy("cohort_week", "active_week")
  }

  /** Last-touch attribution — the marketing-analytics composition: each
    * purchase is attributed to the user's LATEST click strictly before it
    * within the same 30-minute session (purchases with no preceding
    * in-session click stay unattributed with null click/gap). Composes two
    * already-verified shapes: q32's sessionization and q17's as-of
    * aggregation (`max_by` over the fan-out, collapsed map-side — never a
    * window sort over the click×purchase join). The session assignment and
    * both role filters share ONE (user | ts) window shuffle. */
  def q131(s: SparkSession, d: String): DataFrame = {
    val sess = graft.api.Graft.sessionize(
      events(s, d).withColumn("ts_us", expr("ts div 1000"))
        .select(col("user_id"), col("event_id"), col("event_type"), col("ts_us")),
      "user_id", "ts_us", 1800000000L, Seq("event_id"))
    val p = sess.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("session_id"),
        col("event_id").as("purchase_id"), col("ts_us").as("pt"))
    val c = sess.filter(col("event_type") === "click")
      .select(col("user_id"), col("session_id"),
        col("event_id").as("click_id"), col("ts_us").as("ct"))
    val best = p.join(c, Seq("user_id", "session_id"))
      .filter(col("ct") < col("pt"))
      .groupBy("purchase_id")
      .agg(max_by(struct(col("ct"), col("click_id")),
        struct(col("ct"), col("click_id"))).as("a"))
      .select(col("purchase_id"), col("a.click_id").as("attributed_click"),
        col("a.ct").as("ct"))
    p.join(best, Seq("purchase_id"), "left")
      .select(col("user_id"), col("session_id"), col("purchase_id"),
        col("attributed_click"), (col("pt") - col("ct")).as("gap_us"))
      .orderBy("purchase_id")
  }

  /** Linear multi-touch attribution — q131's companion: each purchase's
    * VALUE is split EQUALLY across all of the user's in-session clicks
    * strictly before it (last-touch gives the final click everything;
    * linear credits the whole path). Per-click credit = value/n_clicks is
    * a division of a 2 dp-pinned value by an exact integer, so per-click
    * credits are identical cross-engine and the per-click credit SUM is
    * a sum of identical doubles under a 4 dp pin. Readout = top-20 clicks
    * by total credit — "which touches actually drive revenue".
    *
    * Scale: same single (user|ts) sessionization shuffle as q131/q32, the
    * fan-out join is session-local, and the credit aggregation is one
    * map-side-combinable sum keyed by click. */
  def q154(s: SparkSession, d: String): DataFrame = {
    val sess = graft.api.Graft.sessionize(
      events(s, d).withColumn("ts_us", expr("ts div 1000"))
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"), col("ts_us")),
      "user_id", "ts_us", 1800000000L, Seq("event_id"))
    val p = sess.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("session_id"),
        col("event_id").as("purchase_id"), r2(col("value")).as("v"),
        col("ts_us").as("pt"))
    val c = sess.filter(col("event_type") === "click")
      .select(col("user_id"), col("session_id"),
        col("event_id").as("click_id"), col("ts_us").as("ct"))
    val touched = p.join(c, Seq("user_id", "session_id"))
      .filter(col("ct") < col("pt"))
    val shares = touched
      .withColumn("n_touches",
        count(lit(1)).over(Window.partitionBy("purchase_id")))
      .withColumn("credit", col("v") / col("n_touches").cast("double"))
    shares.groupBy("click_id")
      .agg(count(lit(1)).as("n_purchases"), r4(sum("credit")).as("credit"))
      .orderBy(col("credit").desc, col("click_id"))
      .limit(20)
  }

  /** TPC-H Q9 shape (product-type profit), adapted to this corpus's
    * reduced columns: per (nation, order-year) profit over the 'widget'
    * part family, profit = revenue − 0.8·retailprice·quantity (the corpus
    * has no partsupp/ps_supplycost, so cost is modeled off the part's own
    * retail price). The classic 5-way star-join profitability rollup.
    *
    * Scale: the lineitem⋈orders fact-fact join shuffles on the order key;
    * part (name-filtered), supplier and nation are dimensions — broadcast;
    * the profit expression is row-local over parquet-exact doubles, summed
    * per (nation, year) under the 2 dp pin. */
  def q144(s: SparkSession, d: String): DataFrame = {
    val l = lineitem(s, d).select("l_orderkey", "l_partkey", "l_suppkey",
      "l_extendedprice", "l_discount", "l_quantity")
    val o = orders(s, d)
      .select(col("o_orderkey"), year(col("o_orderdate")).cast("long").as("o_year"))
    val p = part(s, d).filter(col("p_name").contains("widget"))
      .select("p_partkey", "p_retailprice")
    val sup = supplier(s, d).select("s_suppkey", "s_nationkey")
    val n = nation(s, d).select("n_nationkey", "n_name")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name", "o_year")
      .agg(r2(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
          col("p_retailprice") * col("l_quantity") * lit(0.8))).as("profit"),
        count(lit(1)).as("n_lines"))
      .orderBy("n_name", "o_year")
  }

  /** Strict ORDERED 3-step funnel (view → click → purchase): a user
    * advances a step only with an event STRICTLY AFTER their previous
    * step's timestamp — q36 measures any click→purchase pair in a window,
    * this measures the canonical ordered progression (first view, first
    * click after it, first purchase after that), the product-analytics
    * "where do users fall out of the flow" readout.
    *
    * Determinism: every step timestamp is an integer `min(µs)`; the only
    * doubles are the two output rates (exact-integer numerator/denominator
    * under a 4 dp pin, divide-by-zero guarded with nullif). Scale: three
    * per-user min aggregations chained by equi joins on user_id — each
    * stage shrinks to the surviving-user grain, nothing is ever
    * per-event × per-event. */
  def q157(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(col("user_id"), col("event_type"),
      expr("ts div 1000").as("us"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("us").as("t1"))
    val c = ev.filter(col("event_type") === "click").join(v, "user_id")
      .filter(col("us") > col("t1"))
      .groupBy("user_id").agg(min("us").as("t2"))
    val p = ev.filter(col("event_type") === "purchase").join(c, "user_id")
      .filter(col("us") > col("t2"))
      .groupBy("user_id").agg(min("us").as("t3"))
    v.agg(count(lit(1)).as("n_view"))
      .crossJoin(broadcast(c.agg(count(lit(1)).as("n_click"))))
      .crossJoin(broadcast(p.agg(count(lit(1)).as("n_purchase"))))
      .select(col("n_view"), col("n_click"), col("n_purchase"),
        r4(col("n_click").cast("double") /
          nullif(col("n_view"), lit(0L)).cast("double")).as("rate_click"),
        r4(col("n_purchase").cast("double") /
          nullif(col("n_click"), lit(0L)).cast("double")).as("rate_purchase"))
  }

  /** Funnel latency: for each CLICK, the user's first purchase within the
    * following hour; readout = click count, converted-click count, rate,
    * and the exact median time-to-convert — the latency distribution q36's
    * binary user-level conversion cannot see (two funnels with equal rates
    * can have wildly different time-to-value).
    *
    * Determinism: candidate pairs via the bucketed interval join, first
    * purchase by integer `min(µs)`, time-to-convert an exact integer
    * difference scaled by a constant — the only interpolation is the
    * even-count median midpoint, identical in both engines, pinned 2 dp.
    * Scale: the q39/q137 cell-join discipline; per-click min is one
    * map-side-combinable aggregate. */
  def q150(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("eid_c"),
        expr("ts div 1000").as("us_c"))
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("ts div 1000").as("us_p"))
    val firstConv = graft.api.Graft.intervalJoin(clicks, buys, Seq("user_id"),
        "us_c", "us_p", width = 3600000000L, cond = col("us_p") > col("us_c"))
      .groupBy("eid_c")
      .agg(max("us_c").as("us_c"), min("us_p").as("first_p"))
    val tot = clicks.agg(count(lit(1)).as("n_clicks"))
    firstConv
      .agg(count(lit(1)).as("n_conv"),
        r2(median((col("first_p") - col("us_c")).cast("double") / lit(1e6)))
          .as("med_ttc_sec"))
      .crossJoin(broadcast(tot))
      .select(col("n_clicks"), col("n_conv"),
        // nullif: a corpus slice with no click events still produces
        // the global-agg row (n_clicks = 0) and 0/0 is null in Spark
        // but NaN in DuckDB (the q223 degenerate-corpus guard class)
        r4(col("n_conv").cast("double") /
          nullif(col("n_clicks").cast("double"), lit(0.0))).as("conv_rate"),
        col("med_ttc_sec"))
  }

  /** Cohort LTV curves: users grouped by the week of their FIRST activity
    * (signup proxy), purchase revenue accumulated per cohort over weeks-
    * since-signup — the "how does lifetime value build per acquisition
    * vintage" readout that pairs with q37's retention matrix (who stays)
    * by adding how much they spend while staying.
    *
    * Determinism: week indexes are integer µs div; per-(cohort, age) spend
    * pins 2 dp BEFORE the cumulative window, so the running sums are
    * frame-order bit-identical (q148's tool #4); per-user division happens
    * on the pinned sum at the output edge. Scale: one user-grain window
    * for first-activity, fact agg to the tiny (cohort × age) grid, window
    * over the grid. */
  def q151(s: SparkSession, d: String): DataFrame = {
    val day0 = 1704067200000000L // 2024-01-01T00:00:00Z epoch µs
    val weekUs = 7L * 86400000000L
    val ev = events(s, d).select(col("user_id"), col("event_type"),
      col("value"),
      expr(sqlFloorDiv(s"ts div 1000 - ${day0}L", s"${weekUs}L")).as("wk"))
    val first = ev.groupBy("user_id").agg(min("wk").as("cohort_wk"))
    val sizes = first.groupBy("cohort_wk").agg(count(lit(1)).as("n_users"))
    val spend = ev.filter(col("event_type") === "purchase")
      .join(first, "user_id")
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("age_wk"))
      .agg(r2(sum("value")).as("rev"))
    val w = Window.partitionBy("cohort_wk").orderBy("age_wk")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spend
      .withColumn("cum_rev", sum("rev").over(w))
      .join(broadcast(sizes), "cohort_wk")
      .select(col("cohort_wk"), col("age_wk"), col("n_users"), col("rev"),
        r2(col("cum_rev")).as("cum_rev"),
        r4(col("cum_rev") / col("n_users").cast("double")).as("ltv_per_user"))
      .orderBy("cohort_wk", "age_wk")
  }

  /** TPC-H Q21 shape adapted to the reduced columns (no commit/receipt
    * dates): suppliers who kept MULTI-SUPPLIER orders waiting — per order
    * the latest ship date, kept only when ≥2 distinct suppliers
    * participated AND exactly ONE supplier shipped on that latest date
    * (the unambiguous straggler), counted per blamed supplier. The
    * classic "which supplier delays shared orders" operational readout.
    *
    * Determinism: dates and counts are exact; the unique-latest filter
    * makes the blame assignment well-defined without tiebreaks. Scale:
    * both aggregations key on l_orderkey — ONE shuffle produces the
    * per-order stats and the same-keyed blame agg reuses the exchange;
    * count(DISTINCT) expands map-side; supplier dim broadcasts. */
  def q162(s: SparkSession, d: String): DataFrame = {
    val l = lineitem(s, d).select("l_orderkey", "l_suppkey", "l_shipdate")
    val per = l.groupBy("l_orderkey").agg(
      countDistinct("l_suppkey").as("nsup"),
      max("l_shipdate").as("maxsd"))
    val blame = l.join(per, "l_orderkey")
      .filter(col("l_shipdate") === col("maxsd") && col("nsup") >= 2)
      .groupBy("l_orderkey")
      .agg(countDistinct("l_suppkey").as("nlate"), max("l_suppkey").as("supp"))
      .filter(col("nlate") === 1)
    blame.groupBy("supp").agg(count(lit(1)).as("n_wait"))
      .join(broadcast(supplier(s, d).select("s_suppkey", "s_name")),
        col("supp") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_wait"))
      .orderBy(col("n_wait").desc, col("s_suppkey"))
      .limit(20)
  }

  /** TPC-H Q22 shape: per-nation count and balance mass of RICH IDLE
    * customers — above the positive-balance average yet with zero orders
    * (the untapped-segment readout). Anti join + one-row broadcast cutoff.
    *
    * Determinism: the cutoff is a double average whose cross-engine drift
    * is ≤ n·eps·avg ≈ 1e-9 absolute; acctbals are spread over ~1e4, so a
    * customer landing within the drift band of the cutoff is a ~1e-13
    * event — the comparison cannot flip on this corpus (and the output
    * sum is 2 dp-pinned). Scale: customer-grain agg broadcasts one row;
    * the anti join shuffles on custkey with orders pre-projected to the
    * key column only. */
  def q163(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).select("c_custkey", "c_nationkey", "c_acctbal")
    val cut = c.filter(col("c_acctbal") > 0.0).agg(avg("c_acctbal").as("cut"))
    c.crossJoin(broadcast(cut)).filter(col("c_acctbal") > col("cut"))
      .join(orders(s, d).select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_cust"), r2(sum("c_acctbal")).as("total_bal"))
      .orderBy("c_nationkey")
  }

  /** TPC-H Q16 shape (partsupp stood in by observed lineitem supply):
    * distinct-supplier density per (brand, size) for parts outside an
    * excluded brand/type family — "how many suppliers could I source this
    * segment from" assortment analytics.
    *
    * Determinism: pure integer counts over exact predicates. Scale: part
    * prunes to (key, brand, size) before the fact join (dimension
    * broadcast, filter pushed to the scan); count(DISTINCT suppkey)
    * expands map-side on the (brand, size) grain. */
  def q164(s: SparkSession, d: String): DataFrame = {
    val p = part(s, d)
      .filter(col("p_brand") =!= "Brand#45" && !col("p_type").startsWith("MEDIUM"))
      .select("p_partkey", "p_brand", "p_size")
    lineitem(s, d).select("l_partkey", "l_suppkey")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_size")
      .agg(countDistinct("l_suppkey").as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
      .limit(20)
  }

  /** POSITION-BASED (U-shaped) multi-touch attribution — the third member
    * of the attribution family (q131 last-touch, q154 linear): each
    * purchase's value splits 40% to the FIRST in-session click, 40% to the
    * LAST, the middle 20% shared equally — the model that credits both
    * discovery and closing touches (1 touch → 100%, 2 → 50/50).
    *
    * Determinism: positions are integer ranks over (µs, id); weights are
    * the same constant/int-denominator doubles in both engines; credits
    * multiply a 2 dp-pinned value by those weights under the 4 dp sum pin.
    * Scale: both windows share ONE purchase_id partitioning (single
    * shuffle), everything else is q154's audited sessionize machinery. */
  def q172(s: SparkSession, d: String): DataFrame = {
    val sess = graft.api.Graft.sessionize(
      events(s, d).withColumn("ts_us", expr("ts div 1000"))
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"), col("ts_us")),
      "user_id", "ts_us", 1800000000L, Seq("event_id"))
    val p = sess.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("session_id"),
        col("event_id").as("purchase_id"), r2(col("value")).as("v"),
        col("ts_us").as("pt"))
    val c = sess.filter(col("event_type") === "click")
      .select(col("user_id"), col("session_id"),
        col("event_id").as("click_id"), col("ts_us").as("ct"))
    val wp = Window.partitionBy("purchase_id")
    val ranked = p.join(c, Seq("user_id", "session_id"))
      .filter(col("ct") < col("pt"))
      .withColumn("n_touches", count(lit(1)).over(wp))
      .withColumn("rnk",
        row_number().over(wp.orderBy("ct", "click_id")))
      .withColumn("wt",
        when(col("n_touches") === 1, lit(1.0))
          .when(col("n_touches") === 2, lit(0.5))
          .when(col("rnk") === 1 || col("rnk") === col("n_touches"), lit(0.4))
          .otherwise(lit(0.2) / (col("n_touches") - 2).cast("double")))
    ranked.groupBy("click_id")
      .agg(count(lit(1)).as("n_purchases"),
        r4(sum(col("v") * col("wt"))).as("credit"))
      .orderBy(col("credit").desc, col("click_id"))
      .limit(20)
  }

  /** TPC-H Q7 shape: cross-border shipping volume between one nation PAIR
    * by ship year — the bilateral-trade readout (both directions kept,
    * same-nation flows excluded). Exercises the double-dimension join:
    * the supplier side tags each line's origin nation, the
    * orders→customer side its destination.
    *
    * Determinism: revenue is the standard extendedprice·(1−discount)
    * double sum under the 2 dp pin (≤1e5 addends ≤1e5 → drift ≪ pin);
    * years are exact integer extractions in UTC. Scale: the two-nation
    * filter prunes suppliers/customers to ~8% BEFORE the fact joins;
    * supplier-side is dimension-broadcast, the orders⋈customer and
    * lineitem⋈orders joins shuffle on their keys — the canonical Q7
    * plan. Customer side is deliberately NOT broadcast-hinted: at the
    * design point "2 of 25 nations of customers" is still fact-scale. */
  def q184(s: SparkSession, d: String): DataFrame = {
    val pair = Seq("NATION_1", "NATION_2")
    val n = nation(s, d).select("n_nationkey", "n_name")
      .filter(col("n_name").isin(pair: _*))
    val sup = supplier(s, d).select("s_suppkey", "s_nationkey")
      .join(broadcast(n.withColumnRenamed("n_name", "supp_nation")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "supp_nation")
    val cust = customer(s, d).select("c_custkey", "c_nationkey")
      .join(broadcast(n.withColumnRenamed("n_name", "cust_nation")),
        col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey", "cust_nation")
    val oc = orders(s, d).select("o_orderkey", "o_custkey")
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "cust_nation")
    lineitem(s, d)
      .filter(year(col("l_shipdate")).between(1996, 1997))
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
        "l_shipdate")
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(oc, col("l_orderkey") === col("o_orderkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(r2(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** TPC-H Q8 shape: one nation's market share inside one region's demand
    * for one part class, by order year — "how much of EUROPE's ECONOMY
    * spend does NATION_3 supply". The share is a conditional sum over the
    * SAME aggregated rows as the denominator: one pass, no second join.
    *
    * Determinism: numerator/denominator are double sums over identical
    * row sets in both engines; the ratio is pinned at 4 dp (relative
    * drift ~1e-12 ≪ pin). Scale: part-class and region-nation prunes are
    * dimension broadcasts pushed below the fact joins; the customer
    * restriction is a left-semi (no row multiplication); facts shuffle
    * on their join keys only. A year with zero qualifying volume yields
    * NULL share in both engines (0/0). */
  def q185(s: SparkSession, d: String): DataFrame = {
    val eurNations = nation(s, d)
      .join(broadcast(region(s, d).filter(col("r_name") === "EUROPE")
        .select("r_regionkey")), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey")
    val cust = customer(s, d).select("c_custkey", "c_nationkey")
      .join(broadcast(eurNations), col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey")
    val supN = supplier(s, d).select("s_suppkey", "s_nationkey")
      .join(broadcast(nation(s, d).select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val p = part(s, d).filter(col("p_type") === "ECONOMY").select("p_partkey")
    lineitem(s, d)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
        "l_discount")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supN), col("l_suppkey") === col("s_suppkey"))
      .join(orders(s, d).select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"), "left_semi")
      .withColumn("vol", col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        r4(sum(when(col("supp_nation") === "NATION_3", col("vol"))
          .otherwise(lit(0.0))) / sum(col("vol"))).as("mkt_share"),
        r2(sum(col("vol"))).as("total_vol"))
      .orderBy("o_year")
  }

  /** TPC-H Q13 shape: the customer order-count distribution — how many
    * customers placed 0, 1, 2, … orders (zero-order customers kept by the
    * left outer join; count(o_custkey) ignores the null from a non-match).
    * The classic two-level aggregation: per-customer count, then the
    * histogram OF those counts.
    *
    * Determinism: pure integer counts. Scale: first agg shuffles on
    * custkey (orders pre-projected to the key column), second agg runs on
    * the count grain (≤ a few hundred distinct values — map-side combine
    * collapses it before the exchange). */
  def q186(s: SparkSession, d: String): DataFrame = {
    customer(s, d).select("c_custkey")
      .join(orders(s, d).select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey").agg(count(col("o_custkey")).as("c_count"))
      .groupBy("c_count").agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** TPC-H Q14 shape: promo-class revenue share per ship month — the
    * campaign-effect time series (what % of each month's revenue came
    * from PROMO-type parts). Month key is the exact integer yyyy·100+mm.
    *
    * Determinism: the share divides two double sums over identical rows,
    * pinned at 4 dp; month extraction is exact UTC integer arithmetic.
    * Scale: part prunes to (key, flag) and broadcasts; one month-grain
    * agg with map-side combine — the fact is scanned exactly once. */
  def q187(s: SparkSession, d: String): DataFrame = {
    val p = part(s, d)
      .select(col("p_partkey"), (col("p_type") === "PROMO").as("is_promo"))
    lineitem(s, d)
      .select("l_partkey", "l_extendedprice", "l_discount", "l_shipdate")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .withColumn("vol", col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .groupBy((year(col("l_shipdate")) * 100 + month(col("l_shipdate")))
        .cast("long").as("ym"))
      .agg(
        r4(lit(100.0) * sum(when(col("is_promo"), col("vol")).otherwise(lit(0.0)))
          / sum(col("vol"))).as("promo_share"),
        r2(sum(col("vol"))).as("revenue"))
      .orderBy("ym")
  }

  /** TPC-H Q17 shape: revenue locked in SMALL-quantity lines of one brand —
    * lines whose quantity is under half their part's average, expressed as
    * an average yearly figure (the "what would we gain dropping small
    * orders" readout). The correlated per-part average is computed once
    * and joined back — the decorrelated plan Catalyst would produce from
    * the subquery form, written directly.
    *
    * Determinism: quantities are integer-valued doubles, so the per-part
    * average and its half are EXACT in IEEE arithmetic (sums ≤2⁵³) — the
    * threshold compare cannot drift cross-engine; output is 2 dp-pinned.
    * Scale: the brand prune broadcasts; the per-part threshold is
    * part-grain for ONE brand (dimension-sized) and broadcasts back onto
    * the same pruned lines — the fact is scanned once. */
  def q188(s: SparkSession, d: String): DataFrame = {
    val p = part(s, d).filter(col("p_brand") === "Brand#13").select("p_partkey")
    val l = lineitem(s, d)
      .select("l_partkey", "l_quantity", "l_extendedprice")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .select("l_partkey", "l_quantity", "l_extendedprice")
    val half = l.groupBy("l_partkey")
      .agg((lit(0.5) * avg("l_quantity")).as("half_avg"))
    l.join(broadcast(half), "l_partkey")
      .filter(col("l_quantity") < col("half_avg"))
      .agg(r2(sum("l_extendedprice") / lit(7.0)).as("avg_yearly"))
  }

  /** TPC-H Q19 shape: revenue from lines matching an OR-of-ANDs predicate
    * over part attributes × line quantity (three brand/size/quantity
    * windows) — the classic disjunctive-join-predicate stress test. The
    * disjunction lives in the JOIN condition; the planner keeps the
    * partkey equi-join and evaluates the OR as a residual, never a
    * cartesian.
    *
    * Determinism: integer-valued predicates, one 2 dp-pinned sum. Scale:
    * part prunes to the 3-brand union (pushed to the scan) and
    * broadcasts; the fact scans once with the quantity windows as
    * residual filters. */
  def q189(s: SparkSession, d: String): DataFrame = {
    val p = part(s, d)
      .filter(col("p_brand").isin("Brand#13", "Brand#22", "Brand#25"))
      .select("p_partkey", "p_brand", "p_size")
    lineitem(s, d)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      .join(broadcast(p), col("l_partkey") === col("p_partkey") && (
        (col("p_brand") === "Brand#13" && col("p_size").between(1, 10) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#22" && col("p_size").between(1, 20) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#25" && col("p_size").between(1, 30) &&
          col("l_quantity").between(20, 30))))
      .agg(count(lit(1)).as("n_lines"),
        r2(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("revenue"))
  }

  /** TPC-H Q2 shape (partsupp stood in by observed supply): for each part
    * of one size class, the supplier(s) achieving the part's MINIMUM unit
    * cost — the min-cost-sourcing correlated subquery, decorrelated to a
    * per-part min joined back on the same key.
    *
    * Determinism: unit cost is a per-row double division computed
    * identically in both engines; the per-(part,supplier) min and the
    * per-part min select among those identical values, so the equality
    * join-back cannot drift (output cost additionally 4 dp-pinned).
    * Scale: both aggs and the join-back key on l_partkey — one shuffle,
    * reused exchange; part/supplier dims broadcast. */
  def q190(s: SparkSession, d: String): DataFrame = {
    // ONE exchange for the whole extremum chain: lineitem shuffles on
    // l_partkey once; partkey-only partitioning satisfies the
    // (partkey, suppkey) agg's clustering AND the per-part min WINDOW
    // (computing the min as a second aggregate instead would plan a
    // second lineitem scan — the agg subplans differ, so ReusedExchange
    // can't kick in; the window reads the agg output in place).
    val ps = lineitem(s, d).filter(col("l_quantity") > 0.0)
      .select(col("l_partkey"), col("l_suppkey"),
        (col("l_extendedprice") / col("l_quantity")).as("unit"))
      .repartition(col("l_partkey"))
      .groupBy("l_partkey", "l_suppkey").agg(min("unit").as("cost"))
    val best = ps.withColumn("min_cost",
        min("cost").over(Window.partitionBy("l_partkey")))
      .filter(col("cost") === col("min_cost"))
    val target = part(s, d).filter(col("p_size") === 15)
      .select("p_partkey", "p_name")
    val sup = supplier(s, d)
      .select("s_suppkey", "s_name", "s_acctbal", "s_nationkey")
      .join(broadcast(nation(s, d).select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    best.join(broadcast(target), col("l_partkey") === col("p_partkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .select(r2(col("s_acctbal")).as("s_acctbal"), col("s_name"),
        col("n_name"), col("p_partkey"), col("p_name"),
        r4(col("cost")).as("cost"))
      .orderBy(col("s_acctbal").desc, col("s_name"), col("p_partkey"))
      .limit(20)
  }

  /** TPC-H Q15 shape: the top supplier(s) by one quarter's revenue — a
    * scalar-max subquery over a supplier-grain aggregate, kept as ties
    * (all suppliers AT the max, the view-based original's semantics).
    *
    * Determinism: per-supplier revenue is pinned at 2 dp BEFORE the max
    * and the equality compare, so the tie set is decided on identical
    * doubles in both engines. Scale: one supplier-grain agg (map-side
    * combined), a one-row broadcast max, and a dimension join. */
  def q191(s: SparkSession, d: String): DataFrame = {
    val rev = lineitem(s, d)
      .filter(col("l_shipdate").between(
        lit("1997-01-01").cast("timestamp_ntz"),
        lit("1997-03-31").cast("timestamp_ntz")))
      .groupBy("l_suppkey")
      .agg(r2(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .as("total_rev"))
    val mx = rev.agg(max("total_rev").as("mx"))
    rev.crossJoin(broadcast(mx)).filter(col("total_rev") === col("mx"))
      .join(broadcast(supplier(s, d).select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_rev"))
      .orderBy("s_suppkey")
  }

  /** TPC-H Q11 shape (partsupp stood in by observed supply): parts whose
    * supplied VALUE through one nation's suppliers exceeds 0.1% of that
    * nation's total — the "important stock" concentration readout, a
    * HAVING-against-global-scalar aggregation.
    *
    * Determinism: per-part values are pinned at 2 dp BEFORE the global
    * sum and the cutoff compare, so both engines threshold identical
    * doubles (a flip would need a pinned value within ~1e-10 of the
    * cutoff — a measure-zero coincidence on continuous prices). Scale:
    * nation's suppliers broadcast; one part-grain agg; the cutoff is a
    * one-row broadcast. */
  def q192(s: SparkSession, d: String): DataFrame = {
    val sup = supplier(s, d).select("s_suppkey", "s_nationkey")
      .join(broadcast(nation(s, d).filter(col("n_name") === "NATION_5")
        .select("n_nationkey")), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey")
    val v = lineitem(s, d).select("l_partkey", "l_suppkey", "l_extendedprice")
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .groupBy("l_partkey").agg(r2(sum("l_extendedprice")).as("value"))
    val cut = v.agg((sum("value") * lit(0.001)).as("cut"))
    v.crossJoin(broadcast(cut)).filter(col("value") > col("cut"))
      .select(col("l_partkey").as("p_partkey"), col("value"))
      .orderBy(col("value").desc, col("p_partkey"))
  }

  /** TPC-H Q4 shape: order counts per priority for one quarter's orders
    * that had at least one RETURNED line — the EXISTS-correlated count,
    * planned as a left-semi join (no row multiplication from multi-line
    * matches).
    *
    * Determinism: exact date window + integer counts. Scale: the quarter
    * filter pushes to the orders scan; the semi join shuffles on orderkey
    * with lineitem pre-filtered and pre-projected to the key. */
  def q193(s: SparkSession, d: String): DataFrame = {
    orders(s, d)
      .filter(col("o_orderdate").between(
        lit("1997-01-01").cast("timestamp_ntz"),
        lit("1997-03-31").cast("timestamp_ntz")))
      .select("o_orderkey", "o_orderpriority")
      .join(lineitem(s, d).filter(col("l_returnflag") === "R")
        .select("l_orderkey"),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** TPC-H Q12 shape (shipmode stood in by return flag): per line class,
    * how many of one year's lines belong to HIGH-priority orders
    * (1-URGENT/2-HIGH) vs low — the priority-mix-by-channel readout done
    * as one conditional aggregation.
    *
    * Determinism: integer counts over exact predicates. Scale: the year
    * filter pushes to the lineitem scan; one shuffle on orderkey joins
    * the order priority in; the class-grain agg map-side combines. */
  def q194(s: SparkSession, d: String): DataFrame = {
    val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    lineitem(s, d).filter(year(col("l_shipdate")) === 1997)
      .select("l_orderkey", "l_returnflag")
      .join(orders(s, d).select("o_orderkey", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(hi, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy("l_returnflag")
  }

  /** TPC-H Q6 shape: the forecast-revenue-change single-table scan — one
    * conditional sum over a year × discount-band × quantity-cap slice.
    * Trivial by design: it exists to prove the predicate stack pushes to
    * the parquet scan and the agg runs without any exchange beyond the
    * final one-row combine.
    *
    * Determinism: the discount literals are the same IEEE doubles in both
    * engines; one 2 dp-pinned sum. Scale: pure scan+filter+partial-agg —
    * the cheapest possible distributed plan. */
  def q195(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(year(col("l_shipdate")) === 1997 &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24.0)
      .agg(r2(sum(col("l_extendedprice") * col("l_discount"))).as("revenue"))

  /** TPC-H Q20 shape (partsupp stood in by observed supply): suppliers
    * DOMINANT in some promo-class part — shipping over 20% of that part's
    * total quantity — the nested-aggregate semi join (who could squeeze
    * this part's supply).
    *
    * Determinism: quantities are integer-valued doubles, so both sums are
    * exact and the 0.2× threshold multiplies identical exact values —
    * no drift. Scale: promo parts broadcast; the (part, supplier) agg and
    * the part-grain total key the same column — reused exchange; the
    * final semi join is dimension-sized. */
  def q196(s: SparkSession, d: String): DataFrame = {
    val promo = part(s, d).filter(col("p_type") === "PROMO").select("p_partkey")
    // same one-exchange trick as q190: partkey-only partitioning serves
    // the pair-grain agg, the part-grain total, and the join
    val shipped = lineitem(s, d).select("l_partkey", "l_suppkey", "l_quantity")
      .join(broadcast(promo), col("l_partkey") === col("p_partkey"))
      .repartition(col("l_partkey"))
      .groupBy("l_partkey", "l_suppkey").agg(sum("l_quantity").as("sq"))
    val qual = shipped.withColumn("tq",
        sum("sq").over(Window.partitionBy("l_partkey")))
      .filter(col("sq") > col("tq") * lit(0.2))
      .select("l_suppkey").distinct()
    supplier(s, d).select("s_suppkey", "s_name")
      .join(broadcast(qual), col("s_suppkey") === col("l_suppkey"), "left_semi")
      .orderBy("s_suppkey")
  }

  /** Order-to-ship cycle-time SLA profile by priority: per priority class
    * the line count, mean, p50/p90/p99 and max of the ship lag in days —
    * the fulfilment-ops reading beside q233's concurrency curve and
    * q150's event-funnel time-to-convert (this one is the RELATIONAL
    * cycle time, joined fact-to-fact, not a sessionized event path).
    * An SLA regression shows up as a p99 shift long before the mean
    * moves.
    *
    * Determinism: lags are exact integer day differences widened to
    * double; percentiles interpolate identically sorted identical values
    * (q29 parity), pinned at the edge. Scale: one orderkey-keyed
    * fact-fact shuffle join + a 5-group percentile agg. */
  def q258(s: SparkSession, d: String): DataFrame = {
    val j = lineitem(s, d).select(col("l_orderkey"), col("l_shipdate"))
      .join(orders(s, d).select(col("o_orderkey"), col("o_orderdate"),
        col("o_orderpriority")), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        datediff(col("l_shipdate"), col("o_orderdate")).cast("double").as("lag_d"))
    j.groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), r2(avg("lag_d")).as("avg_lag"),
        r2(percentile(col("lag_d"), lit(0.5))).as("p50"),
        r2(percentile(col("lag_d"), lit(0.9))).as("p90"),
        r2(percentile(col("lag_d"), lit(0.99))).as("p99"),
        max(col("lag_d")).cast("long").as("max_lag"))
      .orderBy("o_orderpriority")
  }

  /** Matched-basket price indices 1998 → 1999 — the BI/econ composite the
    * relational family lacked: per part and year the average unit price
    * (revenue/quantity) and total quantity, then over parts traded in
    * BOTH years Laspeyres (base-period basket Σp₁q₀/Σp₀q₀), Paasche
    * (current basket Σp₁q₁/Σp₀q₁) and their geometric-mean Fisher ideal
    * index — "how much did like-for-like prices move, holding the basket
    * fixed", immune to mix shift in a way a raw avg-price ratio is not.
    *
    * Determinism: unit prices pin at 4 dp before the basket sums;
    * quantities are grid sums; the three ratios divide identically
    * ordered identical products under the 4 dp output pin. Scale: one
    * fact pass to the (part × year) grain, a self-join on part
    * (catalog-sized), a one-row assembly. */
  def q277(s: SparkSession, d: String): DataFrame = {
    val py = lineitem(s, d)
      .filter(year(col("l_shipdate")).isin(1998, 1999))
      .groupBy(col("l_partkey"), year(col("l_shipdate")).as("yr"))
      .agg(r4(sum(col("l_extendedprice")) / sum(col("l_quantity"))).as("p"),
        sum(col("l_quantity")).as("q"))
    val base = py.filter(col("yr") === 1998)
      .select(col("l_partkey"), col("p").as("p0"), col("q").as("q0"))
    val cur = py.filter(col("yr") === 1999)
      .select(col("l_partkey"), col("p").as("p1"), col("q").as("q1"))
    base.join(cur, "l_partkey")
      .agg(count(lit(1)).as("n_matched_parts"),
        sum(col("p1") * col("q0")).as("l_num"), sum(col("p0") * col("q0")).as("l_den"),
        sum(col("p1") * col("q1")).as("p_num"), sum(col("p0") * col("q1")).as("p_den"))
      .select(col("n_matched_parts"),
        r4(col("l_num") / col("l_den")).as("laspeyres"),
        r4(col("p_num") / col("p_den")).as("paasche"),
        r4(sqrt((col("l_num") / col("l_den")) * (col("p_num") / col("p_den"))))
          .as("fisher"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q277_price_index" -> q277,
    "q258_ship_lag_sla" -> q258,
    "q233_open_orders" -> q233,
    "q192_tpch_q11_important_stock" -> q192,
    "q193_tpch_q4_priority_exists" -> q193,
    "q194_tpch_q12_priority_class" -> q194,
    "q195_tpch_q6_forecast" -> q195,
    "q196_tpch_q20_excess_supply" -> q196,
    "q188_tpch_q17_small_qty" -> q188,
    "q189_tpch_q19_disjunctive" -> q189,
    "q190_tpch_q2_min_cost" -> q190,
    "q191_tpch_q15_top_supplier" -> q191,
    "q184_tpch_q7_nation_volume" -> q184,
    "q185_tpch_q8_market_share" -> q185,
    "q186_tpch_q13_order_distribution" -> q186,
    "q187_tpch_q14_promo_share" -> q187,
    "q172_attribution_position" -> q172,
    "q162_tpch_q21_waiting" -> q162,
    "q163_tpch_q22_idle_rich" -> q163,
    "q164_tpch_q16_supplier_density" -> q164,
    "q150_funnel_ttc" -> q150,
    "q151_cohort_ltv" -> q151,
    "q157_funnel_steps" -> q157,
    "q144_tpch_q9_profit" -> q144,
    "q131_attribution_last_touch" -> q131,
    "q154_attribution_credit_split" -> q154,
    "q111_lateral_topk" -> q111,
    "q114_rfm_segments" -> q114,
    "q07_correlated_subquery" -> q07,
    "q19_tpch_q3_shipping" -> q19,
    "q47_tpch_q5_local" -> q47,
    "q48_tpch_q10_returns" -> q48,
    "q97_tpch_q18_bigorders" -> q97,
    "q36_funnel_conversion" -> q36,
    "q37_retention_cohorts" -> q37)

  val oracle: Map[String, String] = Map(
    "q277_price_index" ->
      s"""WITH py AS (SELECT l_partkey, year(l_shipdate) AS yr,
         |    ${sr4("sum(l_extendedprice) / sum(l_quantity)")} AS p,
         |    sum(l_quantity) AS q
         |  FROM lineitem WHERE year(l_shipdate) IN (1998, 1999)
         |  GROUP BY 1, 2),
         |base AS (SELECT l_partkey, p AS p0, q AS q0 FROM py WHERE yr = 1998),
         |cur AS (SELECT l_partkey, p AS p1, q AS q1 FROM py WHERE yr = 1999),
         |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_matched_parts,
         |    sum(p1 * q0) AS l_num, sum(p0 * q0) AS l_den,
         |    sum(p1 * q1) AS p_num, sum(p0 * q1) AS p_den
         |  FROM base JOIN cur USING (l_partkey))
         |SELECT n_matched_parts, ${sr4("l_num / l_den")} AS laspeyres,
         |  ${sr4("p_num / p_den")} AS paasche,
         |  ${sr4("sqrt((l_num / l_den) * (p_num / p_den))")} AS fisher
         |FROM agg""".stripMargin,
    "q258_ship_lag_sla" ->
      s"""WITH j AS (SELECT o_orderpriority,
         |    CAST(date_diff('day', o_orderdate, l_shipdate) AS DOUBLE) AS lag_d
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
         |SELECT o_orderpriority, count(*) AS n,
         |  ${sr2("avg(lag_d)")} AS avg_lag,
         |  ${sr2("quantile_cont(lag_d, 0.5)")} AS p50,
         |  ${sr2("quantile_cont(lag_d, 0.9)")} AS p90,
         |  ${sr2("quantile_cont(lag_d, 0.99)")} AS p99,
         |  CAST(max(lag_d) AS BIGINT) AS max_lag
         |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    "q233_open_orders" ->
      """WITH cl AS (SELECT l_orderkey, max(l_shipdate) AS closed
        |  FROM lineitem GROUP BY 1),
        |iv AS (SELECT
        |    epoch_us(o_orderdate) // 86400000000 AS od,
        |    coalesce(epoch_us(closed) // 86400000000,
        |      epoch_us(o_orderdate) // 86400000000) AS cd
        |  FROM orders LEFT JOIN cl ON o_orderkey = l_orderkey),
        |dl AS (SELECT day, CAST(sum(delta) AS BIGINT) AS delta FROM (
        |    SELECT od AS day, 1 AS delta FROM iv
        |    UNION ALL SELECT greatest(cd, od) + 1, -1 FROM iv) GROUP BY 1),
        |c AS (SELECT day, CAST(sum(delta) OVER (ORDER BY day
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_open FROM dl)
        |SELECT CAST(day AS BIGINT) AS day,
        |  CAST(DATE '1970-01-01' + day::INTEGER AS TIMESTAMP) AS cal_date, n_open
        |FROM c ORDER BY n_open DESC, day LIMIT 20""".stripMargin,
    "q192_tpch_q11_important_stock" ->
      s"""WITH sup AS (SELECT s_suppkey FROM supplier
         |    JOIN nation ON s_nationkey = n_nationkey
         |    WHERE n_name = 'NATION_5'),
         |v AS (SELECT l_partkey, ${sr2("sum(l_extendedprice)")} AS value
         |  FROM lineitem JOIN sup ON l_suppkey = s_suppkey
         |  GROUP BY 1)
         |SELECT l_partkey AS p_partkey, value
         |FROM v WHERE value > (SELECT sum(value) * 0.001e0 FROM v)
         |ORDER BY value DESC, p_partkey""".stripMargin,
    "q193_tpch_q4_priority_exists" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o_orderdate BETWEEN TIMESTAMP '1997-01-01'
        |    AND TIMESTAMP '1997-03-31'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q194_tpch_q12_priority_class" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE year(l_shipdate) = 1997
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q195_tpch_q6_forecast" ->
      s"""SELECT ${sr2("sum(l_extendedprice * l_discount)")} AS revenue
         |FROM lineitem
         |WHERE year(l_shipdate) = 1997
         |  AND l_discount BETWEEN 0.05e0 AND 0.07e0
         |  AND l_quantity < 24.0e0""".stripMargin,
    "q196_tpch_q20_excess_supply" ->
      """WITH shipped AS (SELECT l_partkey, l_suppkey,
        |    sum(l_quantity) AS sq
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_type = 'PROMO' GROUP BY 1, 2),
        |tot AS (SELECT l_partkey, sum(sq) AS tq FROM shipped GROUP BY 1),
        |qual AS (SELECT DISTINCT l_suppkey FROM shipped
        |  JOIN tot USING (l_partkey) WHERE sq > tq * 0.2e0)
        |SELECT s_suppkey, s_name FROM supplier
        |WHERE EXISTS (SELECT 1 FROM qual WHERE l_suppkey = s_suppkey)
        |ORDER BY s_suppkey""".stripMargin,
    "q188_tpch_q17_small_qty" ->
      s"""WITH l AS (SELECT l_partkey, l_quantity, l_extendedprice
         |    FROM lineitem JOIN part ON l_partkey = p_partkey
         |    WHERE p_brand = 'Brand#13'),
         |a AS (SELECT l_partkey, 0.5e0 * avg(l_quantity) AS half_avg
         |    FROM l GROUP BY 1)
         |SELECT ${sr2("sum(l_extendedprice) / 7.0e0")} AS avg_yearly
         |FROM l JOIN a USING (l_partkey)
         |WHERE l_quantity < half_avg""".stripMargin,
    "q189_tpch_q19_disjunctive" ->
      s"""SELECT count(*) AS n_lines,
         |  ${sr2("sum(l_extendedprice * (1.0e0 - l_discount))")} AS revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10
         |       AND l_quantity BETWEEN 1 AND 11)
         |   OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 20
         |       AND l_quantity BETWEEN 10 AND 20)
         |   OR (p_brand = 'Brand#25' AND p_size BETWEEN 1 AND 30
         |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q190_tpch_q2_min_cost" ->
      s"""WITH ps AS (SELECT l_partkey, l_suppkey,
         |    min(l_extendedprice / l_quantity) AS cost
         |  FROM lineitem WHERE l_quantity > 0 GROUP BY 1, 2),
         |mc AS (SELECT l_partkey, min(cost) AS min_cost FROM ps GROUP BY 1),
         |sup AS (SELECT s_suppkey, s_name, s_acctbal, n_name
         |  FROM supplier JOIN nation ON s_nationkey = n_nationkey)
         |SELECT ${sr2("s_acctbal")} AS s_acctbal, s_name, n_name,
         |  p_partkey, p_name, ${sr4("cost")} AS cost
         |FROM ps
         |JOIN part ON ps.l_partkey = p_partkey AND p_size = 15
         |JOIN mc ON ps.l_partkey = mc.l_partkey AND ps.cost = mc.min_cost
         |JOIN sup ON ps.l_suppkey = s_suppkey
         |ORDER BY s_acctbal DESC, s_name, p_partkey LIMIT 20""".stripMargin,
    "q191_tpch_q15_top_supplier" ->
      s"""WITH rev AS (SELECT l_suppkey,
         |    ${sr2("sum(l_extendedprice * (1.0e0 - l_discount))")} AS total_rev
         |  FROM lineitem
         |  WHERE l_shipdate BETWEEN TIMESTAMP '1997-01-01'
         |    AND TIMESTAMP '1997-03-31'
         |  GROUP BY 1)
         |SELECT s_suppkey, s_name, total_rev
         |FROM rev JOIN supplier ON l_suppkey = s_suppkey
         |WHERE total_rev = (SELECT max(total_rev) FROM rev)
         |ORDER BY s_suppkey""".stripMargin,
    "q184_tpch_q7_nation_volume" ->
      s"""WITH sup AS (SELECT s_suppkey, n_name AS supp_nation
         |    FROM supplier JOIN nation ON s_nationkey = n_nationkey
         |    WHERE n_name IN ('NATION_1', 'NATION_2')),
         |cust AS (SELECT c_custkey, n_name AS cust_nation
         |    FROM customer JOIN nation ON c_nationkey = n_nationkey
         |    WHERE n_name IN ('NATION_1', 'NATION_2'))
         |SELECT supp_nation, cust_nation,
         |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
         |  ${sr2("sum(l_extendedprice * (1.0e0 - l_discount))")} AS revenue
         |FROM lineitem
         |JOIN sup ON l_suppkey = s_suppkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN cust ON o_custkey = c_custkey
         |WHERE supp_nation <> cust_nation
         |  AND year(l_shipdate) BETWEEN 1996 AND 1997
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q185_tpch_q8_market_share" ->
      s"""WITH eur AS (SELECT n_nationkey FROM nation
         |    JOIN region ON n_regionkey = r_regionkey
         |    WHERE r_name = 'EUROPE'),
         |supn AS (SELECT s_suppkey, n_name AS supp_nation
         |    FROM supplier JOIN nation ON s_nationkey = n_nationkey),
         |base AS (SELECT year(o_orderdate) AS yr, supp_nation,
         |    l_extendedprice * (1.0e0 - l_discount) AS vol
         |  FROM lineitem
         |  JOIN part ON l_partkey = p_partkey
         |  JOIN supn ON l_suppkey = s_suppkey
         |  JOIN orders ON l_orderkey = o_orderkey
         |  WHERE p_type = 'ECONOMY'
         |    AND EXISTS (SELECT 1 FROM customer c JOIN eur
         |      ON c.c_nationkey = eur.n_nationkey
         |      WHERE c.c_custkey = orders.o_custkey))
         |SELECT CAST(yr AS BIGINT) AS o_year,
         |  ${sr4("sum(CASE WHEN supp_nation = 'NATION_3' THEN vol ELSE 0.0e0 END) / sum(vol)")} AS mkt_share,
         |  ${sr2("sum(vol)")} AS total_vol
         |FROM base GROUP BY 1 ORDER BY 1""".stripMargin,
    "q186_tpch_q13_order_distribution" ->
      """WITH per AS (SELECT c_custkey, count(o_custkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY 1)
        |SELECT c_count, count(*) AS custdist
        |FROM per GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q187_tpch_q14_promo_share" ->
      s"""WITH base AS (SELECT
         |    CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT) AS ym,
         |    CASE WHEN p_type = 'PROMO' THEN 1 ELSE 0 END AS is_promo,
         |    l_extendedprice * (1.0e0 - l_discount) AS vol
         |  FROM lineitem JOIN part ON l_partkey = p_partkey)
         |SELECT ym,
         |  ${sr4("100.0e0 * sum(CASE WHEN is_promo = 1 THEN vol ELSE 0.0e0 END) / sum(vol)")} AS promo_share,
         |  ${sr2("sum(vol)")} AS revenue
         |FROM base GROUP BY 1 ORDER BY 1""".stripMargin,
    "q172_attribution_position" ->
      s"""WITH e AS (SELECT user_id, event_id, event_type, value, epoch_us(ts) AS ts_us,
         |    CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id
         |             ORDER BY epoch_us(ts), event_id) IS NULL
         |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
         |             ORDER BY epoch_us(ts), event_id) > 1800000000
         |         THEN 1 ELSE 0 END AS new_sess
         |  FROM events),
         |se AS (SELECT user_id, event_id, event_type, value, ts_us,
         |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
         |  FROM e),
         |p AS (SELECT user_id, session_id, event_id AS purchase_id,
         |      ${sr2("value")} AS v, ts_us AS pt
         |      FROM se WHERE event_type = 'purchase'),
         |c AS (SELECT user_id, session_id, event_id AS click_id, ts_us AS ct
         |      FROM se WHERE event_type = 'click'),
         |t AS (SELECT p.purchase_id, c.click_id, p.v, c.ct
         |      FROM p JOIN c USING (user_id, session_id) WHERE c.ct < p.pt),
         |rk AS (SELECT purchase_id, click_id, v,
         |      count(*) OVER (PARTITION BY purchase_id) AS n_touches,
         |      row_number() OVER (PARTITION BY purchase_id
         |        ORDER BY ct, click_id) AS rnk
         |      FROM t),
         |sh AS (SELECT click_id, v * (CASE
         |      WHEN n_touches = 1 THEN 1.0e0
         |      WHEN n_touches = 2 THEN 0.5e0
         |      WHEN rnk = 1 OR rnk = n_touches THEN 0.4e0
         |      ELSE 0.2e0 / CAST(n_touches - 2 AS DOUBLE) END) AS credit
         |      FROM rk)
         |SELECT click_id, count(*) AS n_purchases,
         |  ${sr4("sum(credit)")} AS credit
         |FROM sh GROUP BY 1 ORDER BY credit DESC, click_id LIMIT 20""".stripMargin,
    "q162_tpch_q21_waiting" ->
      """WITH per AS (SELECT l_orderkey, count(DISTINCT l_suppkey) AS nsup,
        |    max(l_shipdate) AS maxsd FROM lineitem GROUP BY 1),
        |blame AS (SELECT l.l_orderkey, count(DISTINCT l.l_suppkey) AS nlate,
        |    max(l.l_suppkey) AS supp
        |  FROM lineitem l JOIN per p ON l.l_orderkey = p.l_orderkey
        |  WHERE l.l_shipdate = p.maxsd AND p.nsup >= 2
        |  GROUP BY 1),
        |w AS (SELECT supp, count(*) AS n_wait FROM blame
        |  WHERE nlate = 1 GROUP BY 1)
        |SELECT s_suppkey, s_name, n_wait
        |FROM w JOIN supplier ON supp = s_suppkey
        |ORDER BY n_wait DESC, s_suppkey LIMIT 20""".stripMargin,
    "q163_tpch_q22_idle_rich" ->
      s"""WITH cut AS (SELECT avg(c_acctbal) AS cut FROM customer
         |  WHERE c_acctbal > 0),
         |rich AS (SELECT c_custkey, c_nationkey, c_acctbal
         |  FROM customer, cut WHERE c_acctbal > cut.cut),
         |idle AS (SELECT * FROM rich r WHERE NOT EXISTS
         |  (SELECT 1 FROM orders o WHERE o.o_custkey = r.c_custkey))
         |SELECT c_nationkey, count(*) AS n_cust,
         |  ${sr2("sum(c_acctbal)")} AS total_bal
         |FROM idle GROUP BY 1 ORDER BY 1""".stripMargin,
    "q164_tpch_q16_supplier_density" ->
      """SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#45' AND p_type NOT LIKE 'MEDIUM%'
        |GROUP BY 1, 2
        |ORDER BY supplier_cnt DESC, p_brand, p_size LIMIT 20""".stripMargin,
    "q151_cohort_ltv" ->
      s"""WITH ev AS (SELECT user_id, event_type, value,
         |    (epoch_us(ts) - 1704067200000000) // 604800000000 AS wk FROM events),
         |first AS (SELECT user_id, min(wk) AS cohort_wk FROM ev GROUP BY 1),
         |sizes AS (SELECT cohort_wk, count(*) AS n_users FROM first GROUP BY 1),
         |spend AS (SELECT f.cohort_wk, ev.wk - f.cohort_wk AS age_wk,
         |    ${sr2("sum(ev.value)")} AS rev
         |  FROM ev JOIN first f USING (user_id)
         |  WHERE ev.event_type = 'purchase' GROUP BY 1, 2),
         |cum AS (SELECT cohort_wk, age_wk, rev,
         |    sum(rev) OVER (PARTITION BY cohort_wk ORDER BY age_wk
         |      ROWS UNBOUNDED PRECEDING) AS cum_rev
         |  FROM spend)
         |SELECT c.cohort_wk, c.age_wk, s.n_users, c.rev,
         |  ${sr2("c.cum_rev")} AS cum_rev,
         |  ${sr4("c.cum_rev / CAST(s.n_users AS DOUBLE)")} AS ltv_per_user
         |FROM cum c JOIN sizes s USING (cohort_wk)
         |ORDER BY cohort_wk, age_wk""".stripMargin,
    "q144_tpch_q9_profit" ->
      s"""SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |  ${sr2("sum(l_extendedprice * (1.0 - l_discount) - p_retailprice * l_quantity * 0.8e0)")} AS profit,
         |  count(*) AS n_lines
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |JOIN part ON l_partkey = p_partkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE p_name LIKE '%widget%'
         |GROUP BY 1, 2 ORDER BY n_name, o_year""".stripMargin,
    "q157_funnel_steps" ->
      s"""WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
         |v AS (SELECT user_id, min(us) AS t1 FROM ev
         |  WHERE event_type = 'view' GROUP BY 1),
         |c AS (SELECT ev.user_id, min(us) AS t2 FROM ev JOIN v USING (user_id)
         |  WHERE event_type = 'click' AND us > t1 GROUP BY ev.user_id),
         |p AS (SELECT ev.user_id, min(us) AS t3 FROM ev JOIN c USING (user_id)
         |  WHERE event_type = 'purchase' AND us > t2 GROUP BY ev.user_id),
         |n AS (SELECT (SELECT count(*) FROM v) AS n_view,
         |  (SELECT count(*) FROM c) AS n_click,
         |  (SELECT count(*) FROM p) AS n_purchase)
         |SELECT n_view, n_click, n_purchase,
         |  ${sr4("CAST(n_click AS DOUBLE) / CAST(nullif(n_view, 0) AS DOUBLE)")} AS rate_click,
         |  ${sr4("CAST(n_purchase AS DOUBLE) / CAST(nullif(n_click, 0) AS DOUBLE)")} AS rate_purchase
         |FROM n""".stripMargin,
    "q150_funnel_ttc" ->
      s"""WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type
         |  FROM events),
         |c AS (SELECT user_id, event_id AS eid_c, us AS us_c FROM ev
         |  WHERE event_type = 'click'),
         |p AS (SELECT user_id, us AS us_p FROM ev WHERE event_type = 'purchase'),
         |fc AS (SELECT eid_c, max(us_c) AS us_c, min(us_p) AS first_p
         |  FROM c JOIN p ON c.user_id = p.user_id
         |    AND p.us_p > c.us_c AND p.us_p - c.us_c <= 3600000000
         |  GROUP BY 1),
         |tot AS (SELECT count(*) AS n_clicks FROM c),
         |agg AS (SELECT count(*) AS n_conv,
         |    ${sr2("median(CAST(first_p - us_c AS DOUBLE) / 1e6)")} AS med_ttc_sec
         |  FROM fc)
         |SELECT tot.n_clicks, agg.n_conv,
         |  ${sr4("agg.n_conv / nullif(CAST(tot.n_clicks AS DOUBLE), 0e0)")} AS conv_rate,
         |  agg.med_ttc_sec
         |FROM agg CROSS JOIN tot""".stripMargin,
    "q131_attribution_last_touch" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
        |    CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |             ORDER BY epoch_us(ts), event_id) IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |             ORDER BY epoch_us(ts), event_id) > 1800000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events),
        |se AS (SELECT user_id, event_id, event_type, ts_us,
        |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM e),
        |p AS (SELECT user_id, session_id, event_id AS purchase_id, ts_us AS pt
        |      FROM se WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, session_id, event_id AS click_id, ts_us AS ct
        |      FROM se WHERE event_type = 'click'),
        |best AS (SELECT purchase_id, click_id AS attributed_click, ct FROM (
        |    SELECT p.purchase_id, c.click_id, c.ct,
        |      row_number() OVER (PARTITION BY p.purchase_id
        |        ORDER BY c.ct DESC, c.click_id DESC) AS rn
        |    FROM p JOIN c USING (user_id, session_id) WHERE c.ct < p.pt)
        |  WHERE rn = 1)
        |SELECT p.user_id, p.session_id, p.purchase_id,
        |  b.attributed_click, p.pt - b.ct AS gap_us
        |FROM p LEFT JOIN best b USING (purchase_id)
        |ORDER BY p.purchase_id""".stripMargin,
    "q154_attribution_credit_split" ->
      s"""WITH e AS (SELECT user_id, event_id, event_type, value, epoch_us(ts) AS ts_us,
         |    CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id
         |             ORDER BY epoch_us(ts), event_id) IS NULL
         |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
         |             ORDER BY epoch_us(ts), event_id) > 1800000000
         |         THEN 1 ELSE 0 END AS new_sess
         |  FROM events),
         |se AS (SELECT user_id, event_id, event_type, value, ts_us,
         |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
         |  FROM e),
         |p AS (SELECT user_id, session_id, event_id AS purchase_id,
         |      ${sr2("value")} AS v, ts_us AS pt
         |      FROM se WHERE event_type = 'purchase'),
         |c AS (SELECT user_id, session_id, event_id AS click_id, ts_us AS ct
         |      FROM se WHERE event_type = 'click'),
         |t AS (SELECT p.purchase_id, c.click_id, p.v
         |      FROM p JOIN c USING (user_id, session_id) WHERE c.ct < p.pt),
         |sh AS (SELECT click_id,
         |      v / CAST(count(*) OVER (PARTITION BY purchase_id) AS DOUBLE) AS credit
         |      FROM t)
         |SELECT click_id, count(*) AS n_purchases,
         |  ${sr4("sum(credit)")} AS credit
         |FROM sh GROUP BY 1 ORDER BY credit DESC, click_id LIMIT 20""".stripMargin,
    "q114_rfm_segments" ->
      s"""WITH mx AS (SELECT max(o_orderdate) AS maxd FROM orders),
         |rfm AS (SELECT o_custkey,
         |    date_diff('day', max(o_orderdate), (SELECT maxd FROM mx)) AS rec,
         |    count(*) AS f, ${sr2("sum(o_totalprice)")} AS rm
         |  FROM orders GROUP BY 1),
         |q AS (SELECT rm,
         |    ntile(4) OVER (ORDER BY rec ASC, o_custkey) AS r_q,
         |    ntile(4) OVER (ORDER BY f DESC, o_custkey) AS f_q,
         |    ntile(4) OVER (ORDER BY rm DESC, o_custkey) AS m_q
         |  FROM rfm)
         |SELECT r_q, f_q, m_q, count(*) AS n_customers,
         |  ${sr2(sqlRnd("avg(rm)", 6))} AS avg_monetary
         |FROM q GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q111_lateral_topk" ->
      s"""SELECT n.n_name, t.c_name, ${sr2("t.c_acctbal")} AS acctbal
         |FROM nation n JOIN LATERAL (
         |  SELECT c_name, c_acctbal FROM customer c
         |  WHERE c.c_nationkey = n.n_nationkey
         |  ORDER BY c_acctbal DESC, c_name LIMIT 2) t ON true
         |ORDER BY n.n_name, acctbal DESC, t.c_name""".stripMargin,
    "q07_correlated_subquery" ->
      s"""SELECT o_orderkey, o_custkey, ${sr2("o_totalprice")} AS o_totalprice
         |FROM orders o
         |WHERE o_totalprice > (SELECT 2 * avg(o2.o_totalprice)
         |                      FROM orders o2
         |                      WHERE o2.o_custkey = o.o_custkey)
         |ORDER BY o_orderkey""".stripMargin,
    "q19_tpch_q3_shipping" ->
      s"""SELECT o_orderkey, o_orderdate, o_orderpriority,
         |  ${sr2("sum(l_extendedprice * (1.0 - l_discount))")} AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1997-06-30'
         |  AND l_shipdate > TIMESTAMP '1997-06-30'
         |GROUP BY o_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "q47_tpch_q5_local" ->
      s"""SELECT n_name,
         |  ${sr2("sum(l_extendedprice * (1.0 - l_discount))")} AS revenue,
         |  count(*) AS n_lines
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE year(o_orderdate) = 1997
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q48_tpch_q10_returns" ->
      s"""SELECT c_custkey, c_name, n_name,
         |  ${sr2("sum(l_extendedprice * (1.0 - l_discount))")} AS revenue,
         |  ${sr2("max(c_acctbal)")} AS acctbal
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |GROUP BY c_custkey, c_name, n_name
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q97_tpch_q18_bigorders" ->
      s"""WITH big AS (SELECT l_orderkey, sum(l_quantity) AS sum_qty
         |  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 200)
         |SELECT c_custkey, c_name, o_orderkey, o_orderdate,
         |  ${sr2("o_totalprice")} AS o_totalprice, ${sr2("sum_qty")} AS sum_qty
         |FROM big JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q36_funnel_conversion" ->
      s"""WITH clicks AS (SELECT user_id, ts AS ct FROM events WHERE event_type = 'click'),
         |buys AS (SELECT user_id, ts AS pt FROM events WHERE event_type = 'purchase'),
         |conv AS (SELECT DISTINCT c.user_id FROM clicks c JOIN buys b
         |  ON c.user_id = b.user_id AND b.pt >= c.ct
         |  AND b.pt <= c.ct + INTERVAL 30 MINUTE)
         |SELECT (SELECT count(DISTINCT user_id) FROM clicks) AS n_clickers,
         |  (SELECT count(*) FROM conv) AS n_converted,
         |  ${sr4("(SELECT count(*) FROM conv) / CAST(nullif((SELECT count(DISTINCT user_id) FROM clicks), 0) AS DOUBLE)")} AS conversion_rate""".stripMargin,
    "q37_retention_cohorts" ->
      """WITH ev AS (SELECT user_id, date_trunc('week', ts) AS wk FROM events),
        |cohort AS (SELECT user_id, min(wk) AS cohort_week FROM ev GROUP BY 1)
        |SELECT CAST(cohort_week AS TIMESTAMP) AS cohort_week,
        |  CAST(wk AS TIMESTAMP) AS active_week,
        |  count(DISTINCT user_id) AS n_active
        |FROM ev JOIN cohort USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
