package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution window functions, edit distance, and regression aggregates —
  * rounding out the analytical function surface.
  *
  * Scale notes: q38's global distribution ranks are single-partition like
  * q33 (dimension-sized input; at fact scale, pre-aggregate or bucket
  * first). q57 generates candidate pairs by exact prefix join — an
  * inverted-index shape, never all-pairs — then applies the quadratic-cost
  * `levenshtein` only to those few candidates; that cost profile
  * (cheap blocking then expensive verify) is the standard scale pattern for
  * string-distance dedup. q58's regr_* aggregates are single-pass
  * sufficient-statistics (Σx, Σy, Σxy, Σx², n) with map-side combine.
  */
object Analytics {

  /** percent_rank / cume_dist / ntile-free quantile position per supplier. */
  def q38(s: SparkSession, d: String): DataFrame = {
    val w = Window.orderBy(col("s_acctbal").desc, col("s_suppkey"))
    supplier(s, d)
      .select(col("s_suppkey"), col("s_acctbal"),
        r5(percent_rank().over(w)).as("pct_rank"),
        r5(cume_dist().over(w)).as("cume"))
      .orderBy("s_suppkey")
  }

  /** Edit distance over prefix-blocked candidate pairs: docs sharing a
    * 40-char normalized prefix (the corpus's near-dup signature), then exact
    * levenshtein on the full texts. */
  def q57(s: SparkSession, d: String): DataFrame = {
    val p = documents(s, d)
      .select(col("doc_id"), lower(trim(col("text"))).as("t"))
      .withColumn("pfx", substring(col("t"), 1, 40))
    p.select(col("doc_id").as("doc_a"), col("t").as("ta"), col("pfx"))
      .join(p.select(col("doc_id").as("doc_b"), col("t").as("tb"), col("pfx")), "pfx")
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("ta"), col("tb")).cast("long").as("edit_dist"),
        greatest(length(col("ta")), length(col("tb"))).cast("long").as("max_len"))
      .orderBy("doc_a", "doc_b")
  }

  /** One-pass table profiling (the data-quality primitive run before any
    * training job): per column, row count, non-null count, exact distinct
    * count, and numeric min/max — ALL columns in a single scan. The five
    * `count(DISTINCT ...)` aggregates plan as one Expand (5× row fan-out,
    * row-local) feeding one partial+final aggregation — never five scans
    * of the table, which is what a naive per-column loop would issue at
    * 100 TB. The wide one-row result is reshaped to long with `stack`
    * (row-local, no shuffle). At extreme cardinalities swap the exact
    * distinct for `approx_count_distinct` (HLL, fixed state). */
  def q112(s: SparkSession, d: String): DataFrame = {
    val wide = customer(s, d).agg(
      count(lit(1)).as("n_rows"),
      count(col("c_custkey")).as("nn1"), countDistinct(col("c_custkey")).as("nd1"),
      min(col("c_custkey")).cast("double").as("mn1"), max(col("c_custkey")).cast("double").as("mx1"),
      count(col("c_name")).as("nn2"), countDistinct(col("c_name")).as("nd2"),
      count(col("c_nationkey")).as("nn3"), countDistinct(col("c_nationkey")).as("nd3"),
      min(col("c_nationkey")).cast("double").as("mn3"), max(col("c_nationkey")).cast("double").as("mx3"),
      count(col("c_acctbal")).as("nn4"), countDistinct(col("c_acctbal")).as("nd4"),
      r2(min(col("c_acctbal"))).as("mn4"), r2(max(col("c_acctbal"))).as("mx4"),
      count(col("c_mktsegment")).as("nn5"), countDistinct(col("c_mktsegment")).as("nd5"))
    wide.selectExpr("n_rows", s"""stack(5,
        'c_acctbal',   nn4, nd4, mn4, mx4,
        'c_custkey',   nn1, nd1, mn1, mx1,
        'c_mktsegment',nn5, nd5, cast(null as double), cast(null as double),
        'c_name',      nn2, nd2, cast(null as double), cast(null as double),
        'c_nationkey', nn3, nd3, mn3, mx3) AS (column_name, n_nonnull, n_distinct, min_v, max_v)""")
      .select(col("column_name"), col("n_rows"), col("n_nonnull"),
        col("n_distinct"), col("min_v"), col("max_v"))
      .orderBy("column_name")
  }

  /** Per-group z-score outlier detection (robust filtering before training):
    * event values scored against their event_type's mean/stddev, top-20 by
    * |z|. The stats relation is group-cardinality-sized (5 rows) — AQE
    * broadcasts it; the score is then row-local and the global top-20 is a
    * TakeOrderedAndProject, never a total sort. */
  def q116(s: SparkSession, d: String): DataFrame = {
    val st = events(s, d).groupBy("event_type")
      .agg(avg(col("value")).as("mu"), stddev_samp(col("value")).as("sigma"))
    events(s, d).join(st, "event_type")
      .select(col("event_id"), col("event_type"), r2(col("value")).as("value"),
        // nullif like q142: a constant-value type has zero spread — null
        // z, not ±inf (Spark nulls double /0, DuckDB follows IEEE)
        r4((col("value") - col("mu")) / nullif(col("sigma"), lit(0.0))).as("z"))
      .orderBy(abs(col("z")).desc, col("event_id"))
      .limit(20)
  }

  /** SEASONALLY-adjusted anomaly detection: daily purchase revenue scored
    * against its own WEEKDAY's mean/std (q116 scores raw values against a
    * global per-type baseline; this removes the weekly cycle first, the
    * difference between "Saturday is always low" and "this Saturday is
    * anomalous") — top-5 |z| days. The staple ops-monitoring readout.
    *
    * Determinism: day index is exact floor-div µs arithmetic, daily
    * revenue pins 2 dp BEFORE the per-weekday stats, so both engines
    * aggregate identical doubles; z pins 4 dp with a day tiebreak and a
    * nullif guard on a zero spread (ANSI mode throws on /0). Scale: fact
    * agg to the ≤|days| series, weekday stats are a 7-row broadcast. */
  def q142(s: SparkSession, d: String): DataFrame = {
    val day0 = 1704067200000000L
    val daily = events(s, d).filter(col("event_type") === "purchase")
      .groupBy(expr(sqlFloorDiv(s"ts div 1000 - ${day0}L", "86400000000L"))
        .as("day"))
      .agg(r2(sum("value")).as("rev"))
      .withColumn("dow", pmod(col("day"), lit(7L)))
    val st = daily.groupBy("dow")
      .agg(avg("rev").as("mu"), stddev_samp(col("rev")).as("sigma"))
    daily.join(broadcast(st), "dow")
      .select(col("day"), col("dow"), col("rev"),
        r4((col("rev") - col("mu")) / nullif(col("sigma"), lit(0.0))).as("z"))
      .orderBy(abs(col("z")).desc, col("day"))
      .limit(5)
  }

  /** Calendar gap-fill: dense hourly activity series per event_type — every
    * (type, hour) cell between the corpus's first and last hour, absent
    * cells filled with zeros (215 of 3600 cells at sf0.01). The time-series
    * resample primitive: downstream window/EWMA math needs a DENSE series
    * or its frames silently skip gaps. Spine is calendar-sized → broadcast;
    * the key set stays partitioned; one (type, hour) shuffle fills. */
  def q117(s: SparkSession, d: String): DataFrame = {
    val hourly = events(s, d)
      .groupBy(col("event_type"), date_trunc("hour", col("tsc")).as("hour"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("__sv"))
    graft.api.Graft.gapFill(hourly, Seq("event_type"), "hour",
        expr("interval 1 hour"),
        Map("n_events" -> lit(0L), "__sv" -> lit(0.0)))
      .select(col("event_type"), col("hour"), col("n_events"),
        r2(col("__sv")).as("sum_value"))
      .orderBy("event_type", "hour")
  }

  /** EWMA smoothing (α = 0.3) of per-returnflag daily revenue — the
    * time-series denoising primitive. The fact-scale work is the daily
    * pre-aggregation (one shuffle over lineitem); the sequential fold then
    * runs over the calendar-sized series per key, each step pinned to
    * 10 dp so DuckDB's `list_reduce` reproduces it bit-for-bit (see
    * Graft.ewma). */
  def q118(s: SparkSession, d: String): DataFrame = {
    val daily = lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_shipdate").as("day"))
      .agg(r2(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("rev"))
    graft.api.Graft.ewma(daily, Seq("l_returnflag"), "day", "rev", 0.3)
      .select(col("l_returnflag"), col("n_points"), col("ewma"))
      .orderBy("l_returnflag")
  }

  /** Winsorized robust statistics: per event_type, exact p05/p95 of value,
    * then the mean before and after clipping to that band — the outlier-
    * robust companion to q116's z-scores (which a heavy tail corrupts; the
    * winsorized mean does not). The 5-row quantile relation broadcasts
    * back over the fact side; clipping is row-local. At extreme group
    * sizes swap `percentile` for the mergeable `approx_percentile` (q59). */
  def q119(s: SparkSession, d: String): DataFrame = {
    val pct = events(s, d).groupBy("event_type")
      .agg(expr("percentile(value, 0.05e0)").as("__p05"),
        expr("percentile(value, 0.95e0)").as("__p95"))
    events(s, d).join(pct, "event_type")
      .select(col("event_type"), col("value"),
        least(greatest(col("value"), col("__p05")), col("__p95")).as("__w"),
        col("__p05"), col("__p95"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        r4(avg(col("value"))).as("mean_raw"),
        r4(avg(col("__w"))).as("mean_winsor"),
        r4(min(col("__p05"))).as("p05"),
        r4(max(col("__p95"))).as("p95"))
      .orderBy("event_type")
  }

  /** Referential-integrity audit of the star schema's five FK edges —
    * child rows, orphans, parent keys, unreferenced parents per edge — the
    * pre-pipeline data-quality gate (a silently-orphaned fact row becomes
    * silently-dropped revenue in every inner join downstream). Each edge
    * is two aggregated outer joins (Graft.refIntegrity); dims broadcast,
    * counts combine map-side; the union is five one-row frames. */
  def q120(s: SparkSession, d: String): DataFrame = {
    def edge(name: String, c: DataFrame, ck: String, p: DataFrame, pk: String) =
      graft.api.Graft.refIntegrity(c, ck, p, pk).select(lit(name).as("edge"),
        col("n_child"), col("n_orphan"), col("n_parent"), col("n_unref_parent"))
    edge("customer.c_nationkey->nation", customer(s, d), "c_nationkey", nation(s, d), "n_nationkey")
      .unionByName(edge("lineitem.l_orderkey->orders", lineitem(s, d), "l_orderkey", orders(s, d), "o_orderkey"))
      .unionByName(edge("nation.n_regionkey->region", nation(s, d), "n_regionkey", region(s, d), "r_regionkey"))
      .unionByName(edge("orders.o_custkey->customer", orders(s, d), "o_custkey", customer(s, d), "c_custkey"))
      .unionByName(edge("supplier.s_nationkey->nation", supplier(s, d), "s_nationkey", nation(s, d), "n_nationkey"))
      .orderBy("edge")
  }

  /** Rolling active users: per day, exact distinct users that day (DAU) and
    * over the trailing 7 days (WAU) — the engagement primitive. A windowed
    * `count(distinct)` does not exist in either engine, and at scale the
    * right exact plan is CONTRIBUTION EXPLODE: dedup to (user, day) once
    * (the only fact-scale shuffle), explode each user-day to the ≤7 target
    * days it contributes to, and count distinct per target day — volume is
    * 7×|user-days|, never |days|² rescans. First 6 days carry a partial
    * (shorter) trailing window by construction. At extreme cardinality the
    * sketch path is `hll_sketch_agg` per day + `hll_union_agg` over the
    * trailing week (mergeability demonstrated in MlSpec). */
  def q121(s: SparkSession, d: String): DataFrame = {
    val ud = events(s, d)
      .select(col("user_id"), to_date(col("tsc")).as("day")).distinct()
    val wau = ud
      .withColumn("t", explode(expr("sequence(day, date_add(day, 6))")))
      .groupBy("t").agg(countDistinct(col("user_id")).as("wau_7d"))
    ud.groupBy("day").agg(countDistinct(col("user_id")).as("dau"))
      .join(wau, col("day") === col("t")) // inner join clips the spilled-over tail days
      // raw DATE output kinds differ across the driver's readers (q51
      // precedent) — ship the day as a naive midnight timestamp instead
      .select(col("day").cast("timestamp_ntz").as("day"), col("dau"), col("wau_7d"))
      .orderBy("day")
  }

  /** MAD robust outliers — the heavy-tail-safe companion to q116's z-score
    * (mean and stddev are themselves corrupted by the outliers they are
    * meant to find; median and MAD are not). Two grouped exact medians
    * (value, then |value − median|), stats broadcast back, score row-local,
    * global top-20 via TakeOrderedAndProject. 0.6745·MAD ≈ σ under
    * normality, making rz comparable to q116's z. */
  def q122(s: SparkSession, d: String): DataFrame = {
    val med = events(s, d).groupBy("event_type")
      .agg(expr("median(value)").as("__med"))
    val mad = events(s, d).join(med, "event_type")
      .groupBy("event_type")
      .agg(min(col("__med")).as("__med2"),
        expr("median(abs(value - __med))").as("__mad"))
    events(s, d).join(mad, "event_type")
      .select(col("event_id"), col("event_type"), r2(col("value")).as("value"),
        r4(col("__med2")).as("med"), r4(col("__mad")).as("mad"),
        // nullif: if >50% of a type's values are identical the MAD is 0
        // and the robust z is undefined — null, not ±inf
        r4(lit(0.6745) * (col("value") - col("__med2")) /
          nullif(col("__mad"), lit(0.0))).as("rz"))
      .orderBy(abs(col("rz")).desc, col("event_id"))
      .limit(20)
  }

  /** Chi-square test of independence between market segment and region over
    * the customer base — the categorical-association primitive (feature
    * selection / drift detection). The contingency table is densified by
    * crossing the two marginal relations (both dimension-sized) so EMPTY
    * cells still contribute their expected count; observed counts left-join
    * in; the statistic is one sum over the cell grid. All shuffles are
    * group-cardinality-sized after the first aggregation. */
  def q123(s: SparkSession, d: String): DataFrame = {
    val cn = customer(s, d)
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_mktsegment"), col("n_regionkey"))
    val obs = cn.groupBy("c_mktsegment", "n_regionkey").agg(count(lit(1)).as("o"))
    val rt = obs.groupBy("c_mktsegment").agg(sum("o").as("rt"))
    val ct = obs.groupBy("n_regionkey").agg(sum("o").as("ct"))
    val n = obs.agg(sum("o").as("n"))
    // both marginals are category-cardinality-sized; hint one so the grid
    // cross is a broadcast loop, never a shuffle-based CartesianProduct
    rt.crossJoin(broadcast(ct))
      .join(obs, Seq("c_mktsegment", "n_regionkey"), "left")
      .crossJoin(broadcast(n))
      .withColumn("e", col("rt") * col("ct") / col("n"))
      .withColumn("t", pow(coalesce(col("o"), lit(0L)) - col("e"), 2) / col("e"))
      .agg(r4(sum(col("t"))).as("chi2"),
        ((countDistinct(col("c_mktsegment")) - 1) *
          (countDistinct(col("n_regionkey")) - 1)).as("dof"),
        count(lit(1)).as("n_cells"),
        max(col("n")).as("n"))
  }

  /** Month-over-month revenue growth per nation — the period-over-period
    * reporting shape: one fact-scale aggregation to (nation, month), then a
    * lag window over the calendar-sized series. The growth ratio divides
    * the ALREADY-2dp-pinned monthly revenues, so both engines divide
    * identical doubles. First month per nation has null prev/growth. */
  def q124(s: SparkSession, d: String): DataFrame = {
    val monthly = orders(s, d)
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), date_trunc("month", col("o_orderdate")).as("mon"))
      .agg(r2(sum(col("o_totalprice"))).as("rev"))
    val w = Window.partitionBy("n_name").orderBy("mon")
    monthly
      .withColumn("prev", lag(col("rev"), 1).over(w))
      .withColumn("growth", r4((col("rev") - col("prev")) / col("prev")))
      .orderBy("n_name", "mon")
  }

  /** A/B experiment readout: users split into two arms by the content-
    * stable hash bucket (sha256 — same assignment on any engine, rerun or
    * partitioning, zero RNG state), conversion = "≥14 purchases" (the
    * per-user median, keeping both rates interior), and the
    * two-proportion z statistic under the pooled null — the experimentation
    * primitive beside q123's chi-square (which tests a full contingency
    * grid; this is the two-arm special case with a signed direction).
    *
    * Determinism is the integer-exact pipeline (third §2.9 tool): counts
    * stay integral until the output edge, where rates and z divide the
    * SAME integers in both engines — only sqrt's half-ulp rides under the
    * 4 dp pin. Scale: two user-sized aggregates + a 2-row pivot. */
  def q140(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(col("user_id"), col("event_type"))
    val arms = ev.select("user_id").distinct()
      .withColumn("arm",
        when(graft.api.Graft.hashBucket(col("user_id"), 2) === 0, "A")
          .otherwise("B"))
    // conversion = ">= 14 purchases" (the corpus's per-user median), so both
    // rates sit in the interior — EVERY user purchases at least once here,
    // and an everyone-converts metric would zero the pooled variance
    val conv = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(count(lit(1)).as("np"))
      .filter(col("np") >= 14)
      .select("user_id").withColumn("cv", lit(1L))
    val per = arms.join(conv, Seq("user_id"), "left")
      .groupBy("arm")
      .agg(count(lit(1)).as("n"), sum(coalesce(col("cv"), lit(0L))).as("conv"))
    val a = per.filter(col("arm") === "A")
      .select(col("n").as("n_a"), col("conv").as("conv_a"))
    val b = per.filter(col("arm") === "B")
      .select(col("n").as("n_b"), col("conv").as("conv_b"))
    a.crossJoin(broadcast(b))
      .withColumn("pa", col("conv_a").cast("double") / col("n_a").cast("double"))
      .withColumn("pb", col("conv_b").cast("double") / col("n_b").cast("double"))
      .withColumn("p", (col("conv_a") + col("conv_b")).cast("double") /
        (col("n_a") + col("n_b")).cast("double"))
      .select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
        r4(col("pa")).as("rate_a"), r4(col("pb")).as("rate_b"),
        // nullif guards the degenerate p∈{0,1} case (zero pooled variance):
        // z is undefined there and must be null, not a division error
        r4((col("pa") - col("pb")) /
          nullif(sqrt(col("p") * (lit(1.0) - col("p")) *
            (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))), lit(0.0)))
          .as("z"))
  }

  /** CUPED variance reduction for the q140 experiment: each user's
    * pre-period purchase spend (Jan 1–14) is the covariate X, post-period
    * spend (Jan 15–31) the metric Y; θ = cov(X,Y)/var(X) over all users,
    * adjusted metric Y′ = Y − θ(X − mean X). Per arm: n, raw vs adjusted
    * mean; globally: θ and the achieved variance reduction 1 − var Y′/var Y
    * — how much tighter the experiment's CI gets for free from pre-period
    * behavior. The standard trick for shipping faster experiment readouts.
    *
    * Scale: two fact-scale filtered aggregations to user grain, one
    * single-row stats broadcast, one user-sized pass for the adjusted
    * means. Doubles: covariance/variance magnitudes here keep the
    * cross-engine summation drift ~1e-9 relative, far under the 4 dp pin
    * (same argument as q58's regression aggregates). */
  def q141(s: SparkSession, d: String): DataFrame = {
    val cutUs = 1705276800000000L // 2024-01-15T00:00:00Z
    val ev = events(s, d).select(col("user_id"), col("event_type"),
      expr("ts div 1000").as("us"), col("value"))
    val arms = ev.select("user_id").distinct()
      .withColumn("arm",
        when(graft.api.Graft.hashBucket(col("user_id"), 2) === 0, "A")
          .otherwise("B"))
    val p = ev.filter(col("event_type") === "purchase")
    val pre = p.filter(col("us") < cutUs)
      .groupBy("user_id").agg(sum("value").as("x"))
    val post = p.filter(col("us") >= cutUs)
      .groupBy("user_id").agg(sum("value").as("y"))
    val m = arms.join(pre, Seq("user_id"), "left")
      .join(post, Seq("user_id"), "left")
      .select(col("arm"), coalesce(col("x"), lit(0.0)).as("x"),
        coalesce(col("y"), lit(0.0)).as("y"))
    graft.api.Graft.cuped(m, "arm", "x", "y")
      .select(col("arm"), col("n"), r4(col("mean_y")).as("mean_y"),
        r4(col("mean_y_adj")).as("mean_y_adj"),
        r4(col("var_reduction")).as("var_reduction"),
        r4(col("theta")).as("theta"))
      .orderBy("arm")
  }

  /** Exact two-sample Kolmogorov–Smirnov statistic between the value
    * distributions of click vs purchase events: D = sup |F₁ − F₂| over the
    * pooled support — the nonparametric distribution-drift test beside
    * q125's (binned, smoothed) KL divergence. Ties are handled exactly by
    * evaluating both CDFs after each full tie group.
    *
    * Scale: values are PRE-AGGREGATED to their distinct grain first
    * (groupBy value → per-group counts), so the one ordered window runs
    * over the |distinct values| relation, not the fact table — the same
    * shrink-before-window discipline as q124's calendar series. CDF values
    * are exact integer/integer divisions, identical in both engines; only
    * max survives to the 5 dp pin. */
  def q145(s: SparkSession, d: String): DataFrame = {
    graft.api.Graft.ksStatistic(
        events(s, d).select(col("event_type"), col("value")),
        "value", "event_type", "click", "purchase")
      .select(col("n_a").as("n1"), col("n_b").as("n2"),
        r5(col("ks_d")).as("ks_d"))
  }

  /** Pareto (80/20) contribution analysis: nations ranked by revenue,
    * each with its share and running cumulative share, flagged while the
    * cumulative share is still under 80% — "which few segments carry most
    * of the business", the classic BI concentration readout.
    *
    * Determinism: per-nation revenue is 2 dp-pinned BEFORE the running
    * sum, and a window's unbounded-preceding sum is evaluated in frame
    * order in both engines — identical addends in an identical order give
    * bit-identical cumulative values, so even the 0.8 boundary flag cannot
    * flip (the q118 sequential-fold argument applied to a window frame).
    * Scale: fact-scale agg to 25 nations, then one tiny window. */
  def q148(s: SparkSession, d: String): DataFrame = {
    val rev = orders(s, d)
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(r2(sum("o_totalprice")).as("rev"))
    val tot = rev.agg(r2(sum("rev")).as("tot"))
    val w = Window.orderBy(col("rev").desc, col("n_name"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rev.crossJoin(broadcast(tot))
      .withColumn("cum_rev", sum("rev").over(w))
      .select(col("n_name"), col("rev"),
        r4(col("rev") / col("tot")).as("share"),
        r4(col("cum_rev") / col("tot")).as("cum_share"),
        (col("cum_rev") / col("tot") <= 0.8).cast("long").as("head_80"))
      .orderBy(col("rev").desc, col("n_name"))
  }

  /** 2-D skyline (Pareto-front) query: orders that are not DOMINATED on
    * (minimize totalprice, maximize orderdate) — no other order is both
    * cheaper-or-equal and newer-or-equal with one strict. The classic
    * multi-objective shortlist operator ("cheapest AND newest" trade-off
    * curve), degenerate nowhere: every output row is an actual optimum.
    *
    * Plan: the naive dominance test is an all-pairs quadratic theta join;
    * the 2-D skyline collapses to ONE sorted pass — reduce to price grain
    * (only the max-date row per price can survive), then a price-ordered
    * scan: a price level is on the skyline iff its max date strictly
    * beats every strictly-cheaper level's max date (strict prefix max).
    * Raw data values throughout — no float discipline needed. Scale: fact
    * agg to |distinct prices|, then [[graft.api.Graft.prefixMax]]'s range-
    * blocked combine — prices are near-unique so the grain is orders-sized
    * and a single global window would funnel it through one partition. */
  def q152(s: SparkSession, d: String): DataFrame = {
    val byPD = orders(s, d)
      .groupBy("o_totalprice", "o_orderdate").agg(count(lit(1)).as("n"))
    // only the max-date row of each price level can survive; count the
    // orders AT that (price, date) — same-price-older rows are dominated
    val grain = byPD.groupBy("o_totalprice").agg(max("o_orderdate").as("dmax"))
      .join(byPD.withColumnRenamed("o_orderdate", "dmax"),
        Seq("o_totalprice", "dmax"))
      .withColumnRenamed("n", "n_orders")
    graft.api.Graft.prefixMax(grain, "o_totalprice", "dmax", "best_cheaper")
      .filter(col("best_cheaper").isNull || col("dmax") > col("best_cheaper"))
      .select(col("o_totalprice"), col("dmax").as("o_orderdate"), col("n_orders"))
      .orderBy("o_totalprice")
  }

  /** CUSUM changepoint detection over the daily purchase-revenue series:
    * cumulative sum of deviations from the series mean, report the day
    * where |CUSUM| peaks — where the level shift (if any) most plausibly
    * happened; the classic monitoring statistic for "did the metric's mean
    * move, and when".
    *
    * Determinism is tool #4 again: daily revenue pins 2 dp, the mean pins
    * 4 dp (one-row broadcast), so every deviation term is identical in
    * both engines and the frame-order running sum is bit-identical; the
    * argmax orders by the PINNED |CUSUM| with a day tiebreak, so even an
    * exact tie picks the same day. Scale: fact agg to the 31-day series,
    * everything after is calendar-sized. */
  def q156(s: SparkSession, d: String): DataFrame = {
    val day0 = 1704067200000000L
    val daily = events(s, d).filter(col("event_type") === "purchase")
      .groupBy(expr(sqlFloorDiv(s"ts div 1000 - ${day0}L", "86400000000L"))
        .as("day"))
      .agg(r2(sum("value")).as("rev"))
    val g = daily.agg(r4(avg("rev")).as("mu"), count(lit(1)).as("n_days"))
    val w = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.crossJoin(broadcast(g))
      .withColumn("cusum", r4(sum(col("rev") - col("mu")).over(w)))
      .orderBy(abs(col("cusum")).desc, col("day"))
      .limit(1)
      .select(col("day").as("changepoint_day"), col("cusum"),
        col("mu"), col("n_days"))
  }

  /** Linear-regression aggregates: price-vs-quantity fit per return flag. */
  def q58(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        r4(regr_slope(col("l_extendedprice"), col("l_quantity"))).as("slope"),
        r4(regr_intercept(col("l_extendedprice"), col("l_quantity"))).as("intercept"),
        r5(regr_r2(col("l_extendedprice"), col("l_quantity"))).as("r2"),
        regr_count(col("l_extendedprice"), col("l_quantity")).as("n"))
      .orderBy("l_returnflag")

  /** Per-user behavioral diversity: Shannon entropy (nats) of the user's
    * event-type mix plus their event volume — the segmentation feature
    * separating single-purpose users (entropy→0) from broad browsers
    * (entropy→ln 5), the standard engagement-diversity readout next to
    * q114's RFM monetary axes.
    *
    * Determinism: all counts exact integers; entropy is ≤5 addends of
    * (c/n)·ln(c/n) — identical term sets both engines, pinned 4 dp.
    * Scale: two chained aggs on the SAME user_id key (one shuffle,
    * second agg reuses the exchange); output is the user grain. */
  def q168(s: SparkSession, d: String): DataFrame = {
    val ct = events(s, d).groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("c"))
    val tot = ct.groupBy("user_id").agg(sum("c").as("n"))
    ct.join(tot, "user_id")
      .groupBy("user_id")
      .agg(max("n").as("n_events"),
        count(lit(1)).as("n_types"),
        r4(-sum((col("c").cast("double") / col("n")) *
          log(col("c").cast("double") / col("n")))).as("entropy"))
      .orderBy("user_id")
  }

  /** STL-style additive decomposition of daily purchase revenue:
    * trend = centered 7-day moving average, seasonal = per-weekday mean
    * of the detrended series, residual = rev − trend − seasonal — the
    * classic series split q142's z-scores build on implicitly, here
    * materialized so downstream anomaly/forecast logic can consume each
    * component. Output is the full daily panel in day order.
    *
    * Determinism: every sum an engine could order differently is forced
    * into EXACT INTEGER space — the 2 dp-pinned daily revenue rides as a
    * scaled long, so the trend's sliding-frame sum (Spark re-adds frames
    * in order, DuckDB sums a segment tree — different float orders!) and
    * the seasonal group sum are order-free integers; every float is a
    * single integer/integer division at a pinned output edge, and the
    * residual subtracts only pinned values. Scale: the global windows run
    * on the CALENDAR grain (≤ a few k rows at any fact scale, the q34
    * exemption class — under the plan-lint threshold at every SF);
    * everything fact-proportional is one keyed day agg. */
  def q171(s: SparkSession, d: String): DataFrame = {
    val day0 = 1704067200000000L
    val daily = events(s, d).filter(col("event_type") === "purchase")
      .groupBy(expr(sqlFloorDiv(s"ts div 1000 - ${day0}L", "86400000000L"))
        .as("day"))
      .agg(r2(sum("value")).as("rev"))
      .withColumn("rev100", floor(col("rev") * 100 + lit(0.5)).cast("long"))
    val w = Window.orderBy("day").rowsBetween(-3, 3)
    val t = daily
      .withColumn("trend", r4(sum("rev100").over(w).cast("double") /
        (count(lit(1)).over(w) * 100L).cast("double")))
      .withColumn("det",
        floor((col("rev") - col("trend")) * 10000 + lit(0.5)).cast("long"))
    val seas = t.groupBy(pmod(col("day"), lit(7L)).as("dow"))
      .agg(r4(sum("det").cast("double") /
        (count(lit(1)) * 10000L).cast("double")).as("seasonal"))
    t.withColumn("dow", pmod(col("day"), lit(7L)))
      .join(broadcast(seas), "dow")
      .select(col("day"), col("dow"), col("rev"), col("trend"),
        col("seasonal"),
        r4(col("rev") - col("trend") - col("seasonal")).as("resid"))
      .orderBy("day")
  }

  /** Discount ELASTICITY by brand: the OLS slope of quantity on discount
    * (covar_pop/var_pop) per p_brand — "does discounting this brand
    * actually move volume", the pricing-analytics readout built from the
    * same moment machinery as q58's global regression but segmented.
    *
    * Determinism: both moment aggregates are pinned 4 dp only at the
    * output edge; their cross-engine accumulation drift is ≤1e-10 on
    * these magnitudes (|q|≤50, |d|≤0.1) — far under the pin; var=0
    * (single-point brands) is nullif-guarded. Scale: part prunes to
    * (key, brand) and broadcasts; ONE (brand) shuffle carries partial
    * moments (covar/var are algebraic — map-side combinable). */
  def q174(s: SparkSession, d: String): DataFrame = {
    val p = part(s, d).select("p_partkey", "p_brand")
    lineitem(s, d).select("l_partkey", "l_discount", "l_quantity")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_lines"),
        r4(avg("l_discount")).as("avg_discount"),
        r4(covar_pop(col("l_discount"), col("l_quantity")) /
          nullif(var_pop(col("l_discount")), lit(0.0))).as("slope"))
      .orderBy("p_brand")
  }

  /** Churn-model FEATURE ENGINEERING: the per-user feature vector every
    * retention model starts from — total/7-day/30-day event counts,
    * days since last activity, purchase count, 2 dp-pinned spend, and
    * distinct active days, all as of the corpus horizon (2024-01-31).
    * One conditional-aggregation pass; the training-table companion to
    * q114's RFM segments (which bucket; this emits raw features).
    *
    * Determinism: every feature except spend is exact integer arithmetic
    * on floor-div day indexes against pinned epoch constants; spend is a
    * pinned sum. Scale: ONE user-grain aggregation — count(DISTINCT day)
    * expands map-side; no joins, no windows. */
  def q175(s: SparkSession, d: String): DataFrame = {
    val day0 = 1704067200000000L
    val horizon = 30L
    events(s, d)
      .select(col("user_id"), col("event_type"), col("value"),
        expr(sqlFloorDiv(s"ts div 1000 - ${day0}L", "86400000000L")).as("day"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("day") > horizon - 7L, 1L).otherwise(0L)).as("n_7d"),
        sum(when(col("day") > horizon - 30L, 1L).otherwise(0L)).as("n_30d"),
        (lit(horizon) - max("day")).as("days_since_last"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_purchases"),
        r2(sum(when(col("event_type") === "purchase", col("value"))
          .otherwise(lit(0.0)))).as("total_spend"),
        countDistinct("day").as("active_days"))
      .orderBy("user_id")
  }

  /** GROWTH ACCOUNTING (the Social-Capital framework): per week, active
    * users decomposed into NEW (first-ever week), RETAINED (also active
    * the prior week) and RESURRECTED (returning after a gap), plus
    * CHURNED (active the prior week, absent this one — attributed to the
    * week they went missing) and the quick ratio (new+resurrected)/
    * churned. The canonical "is this product compounding or leaking"
    * readout on top of q37's retention matrix.
    *
    * Determinism: week indexes are integer floor-division, every status
    * is a set-membership fact on the distinct (user, week) grain, counts
    * exact; the quick ratio is one int/int division pinned 4 dp with a
    * nullif guard (a week can churn nobody). Scale: one distinct
    * (user, wk) shuffle, a user-grain first-week agg joined back, and a
    * full-outer self equi join on (user, wk) vs (user, wk+1) — all keyed,
    * nothing quadratic, output is the week grain. */
  def q181(s: SparkSession, d: String): DataFrame = {
    val day0 = 1704067200000000L
    val weekUs = 7L * 86400000000L
    val uw = events(s, d)
      .select(col("user_id"),
        expr(sqlFloorDiv(s"ts div 1000 - ${day0}L", s"${weekUs}L")).as("wk"))
      .distinct()
    val first = uw.groupBy("user_id").agg(min("wk").as("first_wk"))
    val cur = uw.withColumn("is_cur", lit(1L))
    val prev = uw.select(col("user_id"), (col("wk") + 1L).as("wk"),
      lit(1L).as("is_prev"))
    cur.join(prev, Seq("user_id", "wk"), "full")
      .join(first, "user_id")
      .select(col("wk"),
        coalesce(col("is_cur"), lit(0L)).as("c"),
        coalesce(col("is_prev"), lit(0L)).as("p"),
        col("first_wk"))
      .groupBy("wk")
      .agg(
        sum(when(col("c") === 1L && col("wk") === col("first_wk"), 1L)
          .otherwise(0L)).as("n_new"),
        sum(when(col("c") === 1L && col("p") === 1L, 1L).otherwise(0L))
          .as("n_retained"),
        sum(when(col("c") === 1L && col("p") === 0L &&
          col("wk") > col("first_wk"), 1L).otherwise(0L)).as("n_resurrected"),
        sum(when(col("c") === 0L && col("p") === 1L, 1L).otherwise(0L))
          .as("n_churned"))
      .withColumn("quick_ratio",
        r4((col("n_new") + col("n_resurrected")).cast("double") /
          nullif(col("n_churned"), lit(0L)).cast("double")))
      .orderBy("wk")
  }

  /** Kaplan–Meier user-retention survival curve: per lifetime day t, the
    * number of users still at risk, the "deaths" (users whose activity
    * ENDED at lifetime t — last event more than 7 days before the corpus
    * horizon), and Ŝ(t) = Π_{t'≤t} (1 − d/n) — the censoring-aware
    * retention estimator (users active near the horizon are censored:
    * they count in the at-risk denominators but never as deaths, which is
    * exactly what a naive "days retained" histogram gets wrong).
    *
    * Determinism: lifetimes are exact integer day arithmetic; the product
    * is exp(Σ ln(1−d/n)) over ≤|days| pinned-magnitude terms (libm-level
    * ln/exp agreement, drift ≪ the 4 dp pin), with an explicit zero flag
    * so a 100%-hazard day yields exactly 0 in both engines rather than
    * exp(−∞). Scale: one user-grain agg, a one-row horizon broadcast,
    * then all windows run on the lifetime-day grain (≤ corpus days —
    * dimension-sized, the documented single-partition exemption class). */
  def q198(s: SparkSession, d: String): DataFrame = {
    val life = events(s, d)
      .select(col("user_id"),
        expr("((ts div 1000) - 1704067200000000) div 86400000000").as("day"))
      .groupBy("user_id")
      .agg(min("day").as("first_day"), max("day").as("last_day"))
    val h = life.agg(max("last_day").as("h"))
    val lt = life.crossJoin(broadcast(h))
      .select((col("last_day") - col("first_day")).as("t"),
        when(col("last_day") <= col("h") - 7, 1L).otherwise(0L).as("death"))
    val wRisk = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wCum = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lt.groupBy("t")
      .agg(count(lit(1)).as("n_t"), sum("death").as("d"))
      .withColumn("n_risk", sum("n_t").over(wRisk))
      .withColumn("haz", col("d").cast("double") / col("n_risk"))
      .withColumn("survival", r4(
        when(sum(when(col("haz") >= 1.0, 1L).otherwise(0L)).over(wCum) > 0,
          lit(0.0))
        .otherwise(exp(sum(
          when(col("haz") < 1.0, log(lit(1.0) - col("haz"))).otherwise(lit(0.0))
        ).over(wCum)))))
      .select("t", "n_risk", "d", "survival")
      .orderBy("t")
  }

  /** Holt double-exponential (level + trend) smoothing of daily revenue
    * per return flag — the trend-aware companion to q118's EWMA (which a
    * steady ramp biases low; Holt's trend term tracks it), returning the
    * final state and a one-step-ahead forecast. Runs on
    * [[graft.api.Graft.holt]]: the recurrence folds over the
    * PRE-AGGREGATED calendar-sized series, every step 10 dp-pinned so
    * DuckDB's list_reduce replays identical IEEE ops. */
  def q200(s: SparkSession, d: String): DataFrame = {
    val daily = lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_shipdate").as("day"))
      .agg(r2(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .as("rev"))
    graft.api.Graft.holt(daily, Seq("l_returnflag"), "day", "rev", 0.5, 0.3)
      .select(col("l_returnflag"), col("n_points"),
        col("level"), col("trend"), r2(col("forecast")).as("forecast"))
      .orderBy("l_returnflag")
  }

  /** Population Stability Index between the month's first and second half
    * of event values — the model-monitoring drift score that completes
    * the drift family (q125 KL on token distributions, q145 KS on raw
    * samples; PSI is the binned industry readout with its 0.1/0.25
    * rule-of-thumb thresholds). 10 equal-width bins over the global
    * range, Laplace-smoothed so empty-side bins stay finite.
    *
    * Determinism: bin edges derive from exact min/max picks; the bucket
    * index is the same float expression on identical doubles in both
    * engines (floor of identical IEEE ops — deterministic, unlike an
    * engine-native width_bucket whose edge semantics differ); counts are
    * exact, and each ln-contribution is pinned at 6 dp. Scale: one
    * min/max broadcast, one bin-grain agg — a single fact pass. */
  def q202(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(col("value"),
      (expr("((ts div 1000) - 1704067200000000) div 86400000000") < 15)
        .as("is_a"))
    val mm = ev.agg(min("value").as("lo"), max("value").as("hi"))
    val counts = ev.crossJoin(broadcast(mm))
      .withColumn("bin", least(
        floor((col("value") - col("lo")) * lit(10.0) / (col("hi") - col("lo"))),
        lit(9.0)).cast("long"))
      .groupBy("bin").agg(
        sum(when(col("is_a"), 1L).otherwise(0L)).as("ca"),
        sum(when(col("is_a"), 0L).otherwise(1L)).as("cb"))
    val tot = counts.agg(sum("ca").as("na"), sum("cb").as("nb"))
    counts.crossJoin(broadcast(tot))
      .withColumn("pa",
        (col("ca") + 1).cast("double") / (col("na") + 10).cast("double"))
      .withColumn("pb",
        (col("cb") + 1).cast("double") / (col("nb") + 10).cast("double"))
      .withColumn("psi_contrib",
        rnd((col("pa") - col("pb")) * log(col("pa") / col("pb")), 6))
      .select("bin", "ca", "cb", "psi_contrib")
      .orderBy("bin")
  }

  /** Benford first-digit audit of order totals — the forensic
    * data-quality screen (fabricated or unit-mixed monetary columns
    * deviate from the log10(1+1/d) law) joining the q112/q120 table-audit
    * family. Digit extracted via exact integer cents (leading char of
    * floor(100·price)) — never via log10 of the value, whose 1-ulp
    * libm disagreements near powers of ten would flip the digit.
    *
    * Determinism: digit extraction is exact; observed shares divide exact
    * ints; the Benford reference applies libm log10 to small integer
    * ratios under a 6 dp pin; the deviation subtracts two already-pinned
    * values. Scale: single-pass digit-grain agg (≤9 groups). */
  def q203(s: SparkSession, d: String): DataFrame = {
    val dg = orders(s, d).filter(col("o_totalprice") >= 0.01)
      .select(substring(floor(col("o_totalprice") * 100).cast("long")
        .cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val tot = dg.agg(sum("n").as("tot"))
    dg.crossJoin(broadcast(tot))
      .withColumn("p_obs", rnd(col("n").cast("double") / col("tot").cast("double"), 6))
      .withColumn("p_benford",
        rnd(log(10.0, lit(1.0) + lit(1.0) / col("digit").cast("double")), 6))
      .withColumn("abs_dev", rnd(abs(col("p_obs") - col("p_benford")), 6))
      .select("digit", "n", "p_obs", "p_benford", "abs_dev")
      .orderBy("digit")
  }

  /** Supplier-revenue Herfindahl–Hirschman concentration per supplier
    * nation — the market-concentration readout (HHI = Σ shareₛ², 1/n for
    * perfectly even supply, →1 for a monopoly nation) that complements
    * q148's Pareto curve with the antitrust-standard scalar.
    *
    * Determinism: per-supplier revenue pins at 2 dp BEFORE shares, so
    * both engines square and sum identical doubles (≤|suppliers/nation|
    * addends under the 4 dp pin). Scale: one supplier-grain agg, a
    * nation-partitioned window for totals on the supplier-grain relation
    * (dimension-sized), one nation-grain agg. */
  def q205(s: SparkSession, d: String): DataFrame = {
    val rev = lineitem(s, d)
      .select("l_suppkey", "l_extendedprice", "l_discount")
      .groupBy("l_suppkey")
      .agg(r2(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .as("rev"))
      .join(broadcast(supplier(s, d).select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation(s, d).select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
    rev.withColumn("tot", sum("rev").over(Window.partitionBy("n_name")))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_suppliers"),
        r2(max("tot")).as("nation_rev"),
        r4(sum((col("rev") / col("tot")) * (col("rev") / col("tot"))))
          .as("hhi"))
      .orderBy("n_name")
  }

  /** Deterministic Poisson-multiplier bootstrap CI for the mean purchase
    * value: 100 replicas, each row's replica weight drawn from a
    * Poisson(1)-approximating 6-point distribution keyed by
    * sha256(event_id:replica) — the one-pass, zero-RNG-state scalable
    * bootstrap (each row is visited once per replica with a multiplier,
    * never resampled), giving the 95% percentile interval. Same hex-
    * threshold trick as q103: hex prefixes compare lexicographically as
    * numbers, so the CDF cutoffs are string constants in both engines.
    *
    * Determinism: weights are exact string compares on identical sha256
    * hex; replica means pin at 10 dp before the percentile interpolation
    * (which then runs identical IEEE ops on identical sorted inputs).
    * Scale: fact × 100 broadcast replicas, one (replica)-grain agg with
    * map-side combine — at the 100 TB point, drop the multiplier matrix
    * to fewer replicas or the bag-of-little-bootstraps split. */
  def q206(s: SparkSession, d: String): DataFrame = {
    val x = events(s, d).filter(col("event_type") === "purchase")
      .select(col("event_id"), col("value"))
    val reps = s.range(100).toDF("r")
    val means = x.crossJoin(broadcast(reps))
      .withColumn("h8",
        substring(sha2(concat_ws(":", col("event_id"), col("r")), 256), 1, 8))
      .withColumn("w",
        when(col("h8") < "5e2d58d8", 0L)
          .when(col("h8") < "bc5ab1b1", 1L)
          .when(col("h8") < "eb715e1d", 2L)
          .when(col("h8") < "fb239797", 3L)
          .when(col("h8") < "ff1025f5", 4L).otherwise(5L))
      .groupBy("r")
      .agg(rnd(sum(col("w") * col("value")) / sum("w").cast("double"), 10)
        .as("m"))
    means.agg(count(lit(1)).as("n_replicas"),
      r4(avg("m")).as("boot_mean"),
      r4(expr("percentile(m, 0.025e0)")).as("lo95"),
      r4(expr("percentile(m, 0.975e0)")).as("hi95"))
  }

  /** Welch's unequal-variance t-test on per-user purchase SPEND between
    * the q140 hash arms — the continuous-metric experiment readout beside
    * q140's proportion z-test (Welch because arm variances need not
    * match; df via Welch–Satterthwaite). One row: per-arm n/mean/sd, t,
    * and the effective degrees of freedom.
    *
    * Determinism: means/variances are double aggs over identical rows
    * with drift ≪ the 4 dp pins; t and df divide those — pinned.
    * Scale: fact→user-grain agg, then a 2-row arm agg; the arm stats
    * cross-join is 1×1. */
  def q207(s: SparkSession, d: String): DataFrame = {
    val spend = events(s, d).filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(sum("value").as("y"))
      .withColumn("arm",
        when(graft.api.Graft.hashBucket(col("user_id"), 2) === 0, "A")
          .otherwise("B"))
    val per = spend.groupBy("arm").agg(count(lit(1)).as("n"),
      avg("y").as("m"), var_samp("y").as("v"))
    val a = per.filter(col("arm") === "A")
      .select(col("n").as("n_a"), col("m").as("m_a"), col("v").as("v_a"))
    val b = per.filter(col("arm") === "B")
      .select(col("n").as("n_b"), col("m").as("m_b"), col("v").as("v_b"))
    val se2a = col("v_a") / col("n_a").cast("double")
    val se2b = col("v_b") / col("n_b").cast("double")
    a.crossJoin(broadcast(b))
      .select(col("n_a"), col("n_b"),
        r2(col("m_a")).as("mean_a"), r2(col("m_b")).as("mean_b"),
        r2(sqrt(col("v_a"))).as("sd_a"), r2(sqrt(col("v_b"))).as("sd_b"),
        // nullif: two constant arms have zero pooled SE — null, not 0/0
        // (Spark nulls double division by zero, DuckDB emits NaN/inf)
        r4((col("m_a") - col("m_b")) /
          nullif(sqrt(se2a + se2b), lit(0.0))).as("t"),
        r2((se2a + se2b) * (se2a + se2b) /
          nullif(se2a * se2a / (col("n_a") - 1).cast("double") +
            se2b * se2b / (col("n_b") - 1).cast("double"), lit(0.0))).as("df"))
  }

  /** Forecast backtest with MASE: daily revenue, last-year test split,
    * seasonal-naive (same weekday last week, lag 7) vs one-step-naive
    * (lag 1) forecasts, scored by mean absolute error — MASE =
    * MAE_seasonal / MAE_naive, the scale-free forecast-quality standard
    * (< 1 ⇒ the seasonal model beats the naive walk). The evaluation
    * harness q200's Holt (or any forecaster) plugs into.
    *
    * Determinism: daily revenue pins at 2 dp BEFORE the lags, so errors
    * subtract identical grid values; the MAEs average those (drift ≪
    * pins). Lags are ROW lags over the day-ordered series — exact on
    * this dense calendar, documented as calendar-join at open scale.
    * Scale: one day-grain agg (calendar-sized), unpartitioned window on
    * ≤|days| rows — the documented dimension-sized exemption. */
  def q208(s: SparkSession, d: String): DataFrame = {
    val daily = lineitem(s, d)
      .groupBy(col("l_shipdate").as("day"))
      .agg(r2(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .as("rev"))
    val w = Window.orderBy("day")
    val t = daily
      .withColumn("f_seasonal", lag("rev", 7).over(w))
      .withColumn("f_naive", lag("rev", 1).over(w))
      .filter(year(col("day")) === 2001)
      .filter(col("f_seasonal").isNotNull && col("f_naive").isNotNull)
    t.agg(count(lit(1)).as("n_test"),
      r2(avg(abs(col("rev") - col("f_naive")))).as("mae_naive"),
      r2(avg(abs(col("rev") - col("f_seasonal")))).as("mae_seasonal"),
      // nullif: a constant test-year series has zero naive MAE — MASE is
      // undefined (null), not inf (the q207/q210 degenerate class)
      r4(avg(abs(col("rev") - col("f_seasonal"))) /
        nullif(avg(abs(col("rev") - col("f_naive"))), lit(0.0))).as("mase"))
  }

  /** Spearman rank correlation between quantity and discounted revenue per
    * return flag — computed as a weighted Pearson over SUPPORT-grain
    * fractional ranks, never a fact-grain rank window: each side shrinks
    * to its distinct-value grain first (shrink-before-window), fractional
    * (tie-averaged) ranks come from a cumulative count over that grain,
    * and the correlation assembles from weighted sufficient statistics on
    * the (x, y) pair grain.
    *
    * Determinism: revenue pins to the 2 dp grid BEFORE grouping so both
    * engines build identical supports; ranks are exact half-integers and
    * weights exact longs, so every product is an exact double and the
    * final ratio divides near-identical sums (drift ≪ the 4 dp pin).
    * Scale: three pruned fact passes (the pair grain + one per support
    * build), each a map-side-combined hash agg; the supports are
    * DOMAIN-bounded (price grid × flag) and memo+cached, and their
    * cumulatives run through [[graft.api.Graft.groupedPrefixSum]]'s
    * range-block combine — parallel in groups × blocks, never one task
    * per return flag — then a pair-grain join-back and a 3-row final
    * agg. */
  def q210(s: SparkSession, d: String): DataFrame = {
    val base = lineitem(s, d).select(col("l_returnflag").as("rf"),
      col("l_quantity").as("x"),
      r2(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("y"))
    def fracRanks(vc: String): DataFrame = {
      // per-group cumulative via the grouped range-block combine: the y
      // support is wide per return flag, so a plain partitionBy(rf)
      // window would sort each flag's whole support in ONE task. The
      // support itself is memo+cached: it is DOMAIN-bounded (price grid ×
      // flag — never fact-proportional), and groupedPrefixSum references
      // its input three times (bounds, blocked rows, block totals), so
      // without the cache each reference would re-run the fact scan+agg.
      val sup = graft.Tables.memoized(s, d, "spearmanSup_" + vc) {
        base.groupBy("rf", vc).agg(count(lit(1)).as("t"))
      }
      graft.api.Graft.groupedPrefixSum(sup, Seq("rf"), vc, Seq("t"))
        .select(col("rf"), col(vc),
          ((col("t_cum") - col("t")).cast("double") +
            (col("t") + 1).cast("double") / lit(2.0)).as("fr_" + vc))
    }
    // r14: ranks attach at the FACT grain — the former (rf, x, y) pair
    // pre-aggregation produced 599,885 groups from 600,000 rows at sf0.1
    // (y is continuous, so the pair grain is fact-sized and shrinks
    // nothing) while costing two fact-sized hash aggs plus a 28 MB
    // exchange; worse, the planner's size estimate for the tiny x-rank
    // side was poisoned by the 8 MB HashedRelation floor of its upstream
    // broadcasts, so it BROADCAST THE 600 K-ROW PAIR SIDE (75 MB, ~1.1 s
    // build; guide §3.1: estimates go wrong — hint the side you know).
    // The x support is DOMAIN-bounded (quantity grid × flag, 150 rows at
    // any SF) so it broadcasts by hint; the y support stays a shuffle
    // join. Addends are the identical exact half-integer products as the
    // weighted pair form (w·fr regroups exactly; the only inexact sums,
    // sxy/sxx/syy, carry summation-order drift ≪ the 4 dp pin, the same
    // class the pair form already had).
    val scored = base
      .join(broadcast(fracRanks("x")), Seq("rf", "x"))
      .join(fracRanks("y"), Seq("rf", "y"))
    scored.groupBy("rf").agg(
      count(lit(1)).cast("double").as("n"),
      sum(col("fr_x")).as("sx"),
      sum(col("fr_y")).as("sy"),
      sum(col("fr_x") * col("fr_y")).as("sxy"),
      sum(col("fr_x") * col("fr_x")).as("sxx"),
      sum(col("fr_y") * col("fr_y")).as("syy"))
      .select(col("rf"), col("n").cast("long").as("n"),
        // nullif: a flag whose x or y support is a single value has zero
        // rank variance — null, not 0/0 (the q207/q266 degenerate class)
        r4((col("n") * col("sxy") - col("sx") * col("sy")) /
          nullif(sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
            (col("n") * col("syy") - col("sy") * col("sy"))),
            lit(0.0))).as("spearman"))
      .orderBy("rf")
  }

  /** Mann–Whitney U (Wilcoxon rank-sum) z-test on per-user purchase spend
    * between the q140/q207 sha256 hash arms — the nonparametric companion
    * to q207's Welch t (no normality assumption; detects stochastic
    * dominance, not just mean shift). Fractional ranks are assembled
    * WITHOUT a fact-grain global window: spend pins to the 2 dp grid,
    * shrinks to its distinct-value grain with per-arm counts, and the
    * cumulative count below each value comes from
    * [[graft.api.Graft.prefixSum]]'s range-blocked combine (the
    * ksStatistic discipline) — the only unpartitioned window is the
    * internal ≤|shuffle partitions| block combine.
    *
    * Determinism: R_A = Σ c_a·fr sums exact half-integers (exact in
    * doubles, order-free); the tie-corrected normal approximation then
    * divides exact values — identical IEEE in both engines, pinned at
    * the edge. Scale: user-grain agg → value-grain agg → prefix scan →
    * one-row finals. */
  def q211(s: SparkSession, d: String): DataFrame = {
    val spend = events(s, d).filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(r2(sum("value")).as("y"))
      .withColumn("in_a", graft.api.Graft.hashBucket(col("user_id"), 2) === 0)
    val grain = spend.groupBy("y").agg(
      sum(when(col("in_a"), 1L).otherwise(0L)).as("ca"),
      count(lit(1)).as("t"))
    val ranked = graft.api.Graft.prefixSum(grain, "y", Seq("t"))
      .withColumn("fr", (col("t_cum") - col("t")).cast("double") +
        (col("t") + 1).cast("double") / lit(2.0))
    ranked.agg(
      sum("ca").as("n_a"), sum(col("t") - col("ca")).as("n_b"),
      sum(col("ca") * col("fr")).as("r_a"),
      // double tie cube (see Graft.mannWhitney): LONG t³ overflows past
      // ~2.09M rows on one tied value; exact below 2^53 either way
      sum(col("t").cast("double") * col("t") * col("t") - col("t")).as("tie3"))
      .select(col("n_a"), col("n_b"),
        r2(col("r_a") - col("n_a") * (col("n_a") + 1) / lit(2.0)).as("u_a"),
        // nullif twice: an empty arm or an all-one-value corpus zeroes
        // the variance term, and a single-user corpus zeroes the tie
        // correction's N(N-1) — null z in both engines, never 0/0
        r4(((col("r_a") - col("n_a") * (col("n_a") + 1) / lit(2.0)) -
            col("n_a") * col("n_b") / lit(2.0)) /
          nullif(sqrt(col("n_a") * col("n_b") / lit(12.0) *
            (((col("n_a") + col("n_b")).cast("double") + 1) -
              col("tie3") / nullif((col("n_a") + col("n_b")).cast("double") *
                ((col("n_a") + col("n_b")).cast("double") - 1), lit(0.0)))),
            lit(0.0))).as("z"))
  }

  /** Autocorrelation function of daily revenue at lags 1–7 — the
    * seasonality diagnostic that motivates q208's lag-7 seasonal-naive
    * model and q200's trend term: a weekly cycle shows as an ACF spike at
    * lag 7. Pearson corr between the day-grain series and its row-lagged
    * copy, per lag.
    *
    * Determinism: daily revenue pins at 2 dp before the lags, so corr
    * aggregates identical pairs; corr normalizes its sums, leaving drift
    * ≪ the 4 dp pin. Scale: one day-grain agg; the lag windows run
    * unpartitioned over the ≤|calendar| day grain (the q34/q208
    * documented exemption class — fixed-offset lags are not
    * prefix-scannable), then a 7-group agg. */
  def q212(s: SparkSession, d: String): DataFrame = {
    val daily = lineitem(s, d)
      .groupBy(col("l_shipdate").as("day"))
      .agg(r2(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .as("rev"))
    val w = Window.orderBy("day")
    daily.select(col("rev") +:
        (1 to 7).map(k => lag("rev", k).over(w).as(s"f$k")): _*)
      .selectExpr("rev",
        "stack(7, 1, f1, 2, f2, 3, f3, 4, f4, 5, f5, 6, f6, 7, f7) AS (lag_k, f)")
      .groupBy("lag_k")
      .agg(count(col("f")).as("n_pairs"), r4(corr(col("rev"), col("f"))).as("acf"))
      .select(col("lag_k").cast("long").as("lag_k"), col("n_pairs"), col("acf"))
      .orderBy("lag_k")
  }

  /** Theil–Sen robust trend of year-2000 daily revenue: the median of all
    * pairwise day-to-day slopes, plus the matching median intercept — the
    * outlier-proof alternative to q58's least-squares line (a single
    * corrupted day moves OLS arbitrarily, but not the pairwise-slope
    * median). O(days²) pairs is the textbook estimator cost, bounded here
    * by the ≤366-day calendar — NOT fact-proportional, so the pair join
    * broadcasts the calendar side (the q117 spine-broadcast exemption
    * class) at every SF.
    *
    * Determinism: slopes divide 2 dp-pinned revenues by exact integer day
    * gaps — identical doubles in both engines; the two medians interpolate
    * identically sorted identical values; pinned at the edge. */
  def q213(s: SparkSession, d: String): DataFrame = {
    val daily = lineitem(s, d).filter(year(col("l_shipdate")) === 2000)
      .groupBy(col("l_shipdate").as("day"))
      .agg(r2(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .as("rev"))
    val d0 = daily.agg(min("day").as("d0"))
    val t = daily.crossJoin(broadcast(d0))
      .select(datediff(col("day"), col("d0")).cast("double").as("t"), col("rev"))
    val slopes = t.as("a").join(broadcast(t.as("b")), col("a.t") < col("b.t"))
      .select(((col("b.rev") - col("a.rev")) / (col("b.t") - col("a.t")))
        .as("slope"))
    val med = slopes.agg(count(lit(1)).as("n_pairs"),
      expr("percentile(slope, 0.5e0)").as("med"))
    t.crossJoin(broadcast(med))
      .agg(count(lit(1)).as("n_days"), max("n_pairs").as("n_pairs"),
        r4(max("med")).as("slope"),
        r4(expr("percentile(rev - med * t, 0.5e0)")).as("intercept"))
  }

  /** Weekly stickiness (avg DAU / WAU) — the engagement-depth ratio beside
    * q121's rolling actives and q181's growth accounting: 1.0 means every
    * weekly user shows up every observed day, ~1/7 means drive-by usage.
    *
    * Determinism: DAU/WAU are exact distinct counts; avg_dau pins at 2 dp
    * BEFORE the ratio so both engines divide identical values. Scale: one
    * (week, day, user) dedup agg + one (week, user) distinct agg — both
    * hash-keyed and row-linear; the join is week-grain. */
  def q214(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d).select(
        expr("((ts div 1000) - 1704067200000000) div 86400000000").as("day"),
        col("user_id"))
      .withColumn("week", expr("day div 7"))
    val dau = e.select("week", "day", "user_id").distinct()
      .groupBy("week", "day").agg(count(lit(1)).as("dau"))
      .groupBy("week").agg(count(lit(1)).as("days_obs"),
        r2(avg("dau")).as("avg_dau"))
    val wau = e.groupBy("week").agg(countDistinct("user_id").as("wau"))
    dau.join(wau, "week")
      .select(col("week"), col("days_obs"), col("wau"), col("avg_dau"),
        r4(col("avg_dau") / col("wau")).as("stickiness"))
      .orderBy("week")
  }

  /** Inter-event gap distribution per event type: median and p90 seconds
    * between consecutive events of the same (user, type) stream — the
    * arrival-process profile behind q32's sessionize gap constant and
    * q216's burst screen.
    *
    * Determinism: gaps are exact integer µs diffs divided by 1e6 — the
    * same two operands in both engines; the percentiles interpolate
    * identically sorted identical doubles, pinned at the edge. Scale:
    * lag windows partition by (user, type) — fact-partitioned, never
    * global; then a |event types|-group agg. */
  def q215(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts"), col("event_id"))
    events(s, d)
      .withColumn("prev", lag("ts", 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("event_type"),
        (expr("(ts - prev) div 1000").cast("double") / lit(1000000.0))
          .as("gap_s"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_gaps"),
        r4(expr("percentile(gap_s, 0.5e0)")).as("p50_s"),
        r4(expr("percentile(gap_s, 0.9e0)")).as("p90_s"))
      .orderBy("event_type")
  }

  /** Burst screen (bot heuristic): the 20 users with the highest
    * event count inside any sliding 60-second window — scripted clients
    * burst far above the q215 human inter-event cadence. The burst count
    * is a RANGE window over the µs timeline (value-based, so duplicate
    * timestamps count identically regardless of row order).
    *
    * Determinism: exact integer counts; ties broken by user_id. Scale:
    * the range window partitions by user (fact-partitioned); then a
    * user-grain agg and a top-20. */
  def q216(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us")
      .rangeBetween(-59999999L, 0L)
    events(s, d).withColumn("us", expr("ts div 1000"))
      .withColumn("burst", count(lit(1)).over(w))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), max("burst").as("max_burst"))
      .orderBy(col("max_burst").desc, col("user_id"))
      .limit(20)
  }

  /** Active-days histogram (the power-user curve): how many users were
    * active on exactly k distinct days — the engagement-frequency
    * distribution product teams read next to q214's stickiness ratio.
    * Exact integer pipeline: (user, day) dedup → user-grain count →
    * k-grain count, all hash-keyed and row-linear. */
  def q220(s: SparkSession, d: String): DataFrame =
    events(s, d).select(col("user_id"),
        expr("((ts div 1000) - 1704067200000000) div 86400000000").as("day"))
      .distinct()
      .groupBy("user_id").agg(count(lit(1)).as("active_days"))
      .groupBy("active_days").agg(count(lit(1)).as("n_users"))
      .orderBy("active_days")

  /** Cramér's V association between event type and weekday — q123's
    * chi-square readout normalized to the comparable [0, 1] effect size
    * (V = sqrt(χ²/(n·min(r−1, c−1)))), on the behavioral contingency a
    * product team actually reads: does WHAT users do depend on WHEN. Same
    * grid discipline as q123 — both marginals are category-sized, so the
    * expected-count cross is a broadcast loop, never a shuffled cartesian.
    *
    * Determinism: observed/marginal counts exact; e divides exact longs;
    * χ² pins at 4 dp and V derives from the PINNED χ² so both engines
    * root the same value. Scale: one fact pass to the (type, dow) grid
    * (≤ 5×7 cells), everything after is cell-grain. */
  def q222(s: SparkSession, d: String): DataFrame = {
    val et = events(s, d).select(col("event_type"),
      expr("(((ts div 1000) - 1704067200000000) div 86400000000) % 7")
        .as("dow"))
    val obs = et.groupBy("event_type", "dow").agg(count(lit(1)).as("o"))
    val rt = obs.groupBy("event_type").agg(sum("o").as("rt"))
    val ct = obs.groupBy("dow").agg(sum("o").as("ct"))
    val n = obs.agg(sum("o").as("n"))
    rt.crossJoin(broadcast(ct))
      .join(obs, Seq("event_type", "dow"), "left")
      .crossJoin(broadcast(n))
      .withColumn("e", col("rt") * col("ct") / col("n"))
      .withColumn("t", pow(coalesce(col("o"), lit(0L)) - col("e"), 2) / col("e"))
      .agg(r4(sum("t")).as("chi2"),
        countDistinct("event_type").as("r"),
        countDistinct("dow").as("c"),
        max(col("n")).as("n"))
      .select(col("chi2"), col("r"), col("c"), col("n"),
        r4(sqrt(col("chi2") /
          (col("n") * least(col("r") - 1, col("c") - 1)))).as("cramers_v"))
  }

  /** Lorenz curve deciles of customer revenue — the curve behind q148's
    * Pareto top-share and q205's HHI scalar: cumulative revenue share at
    * each cumulative-customer decile boundary (reading "the bottom 40% of
    * customers hold 11% of revenue" directly). Built WITHOUT a fact-grain
    * global window: customer revenue pins to the 2 dp grid, shrinks to
    * its distinct-value grain, and both cumulative counts and cumulative
    * revenue come from [[graft.api.Graft.prefixSum]]'s range-blocked
    * combine (the ksStatistic discipline). A mass point spanning a whole
    * decile leaves that decile without a boundary row — deciles are
    * reported as observed, not gap-filled.
    *
    * Determinism: cum customers are exact longs; cum revenue sums
    * 2 dp-pinned values (drift ≪ the 4 dp share pin); the decile label
    * ceils an exact int/int division. Scale: order-grain agg + prefix
    * scan + ≤10-row final agg. */
  def q224(s: SparkSession, d: String): DataFrame = {
    val rev = orders(s, d).groupBy("o_custkey")
      .agg(r2(sum("o_totalprice")).as("rev"))
    val grain = rev.groupBy("rev").agg(count(lit(1)).as("c"))
      .withColumn("rc", col("rev") * col("c"))
    val cum = graft.api.Graft.prefixSum(grain, "rev", Seq("c", "rc"))
    val tot = grain.agg(sum("c").as("nc"), sum("rc").as("tr"))
    cum.crossJoin(broadcast(tot))
      .withColumn("f", col("c_cum").cast("double") / col("nc").cast("double"))
      .withColumn("sh", col("rc_cum") / col("tr"))
      .withColumn("decile", ceil(col("f") * lit(10.0)).cast("long"))
      .groupBy("decile")
      .agg(r4(max("f")).as("cum_customers"), r4(max("sh")).as("cum_revenue"))
      .orderBy("decile")
  }

  /** Burstiness coefficient per event type: Goh–Barabási
    * B = (σ−μ)/(σ+μ) over the q215 inter-event gaps — the single-number
    * arrival-process signature (−1 metronome-periodic, 0 Poisson, →1
    * heavy-tailed bursts) that turns q216's screen into a population
    * readout. Same fact-partitioned lag windows as q215, then a
    * |types|-row agg.
    *
    * Determinism: gaps divide exact integer µs; μ and σ aggregate
    * identical doubles (drift ≪ pins); B divides the raw moments and
    * pins at the edge. */
  def q227(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts"), col("event_id"))
    events(s, d)
      .withColumn("prev", lag("ts", 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("event_type"),
        (expr("(ts - prev) div 1000").cast("double") / lit(1000000.0))
          .as("gap_s"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_gaps"),
        r2(avg("gap_s")).as("mean_gap_s"),
        r2(stddev_samp(col("gap_s"))).as("sd_gap_s"),
        // nullif: all-zero gaps (every event of a type at one instant)
        // zero both moments — B undefined (null), not 0/0
        r4((stddev_samp(col("gap_s")) - avg("gap_s")) /
          nullif(stddev_samp(col("gap_s")) + avg("gap_s"),
            lit(0.0))).as("burstiness"))
      .orderBy("event_type")
  }

  /** Cohort conversion lag: per first-seen week, how many users ever
    * purchase and how long the first view→first purchase takes (median
    * and p90 days among converters) — the funnel-latency readout beside
    * q36's step counts and q150's time-to-convert, cut by acquisition
    * cohort so product changes show up as cohort-over-cohort shifts.
    *
    * Determinism: day arithmetic is exact integers; the conversion rate
    * divides exact longs; the percentiles interpolate identically sorted
    * exact integer lags. Scale: one fact pass to the user grain
    * (conditional min aggs), then a |weeks|-row agg. */
  def q228(s: SparkSession, d: String): DataFrame = {
    val u = events(s, d).select(col("user_id"),
        expr("((ts div 1000) - 1704067200000000) div 86400000000").as("day"),
        col("event_type"))
      .groupBy("user_id")
      .agg(min("day").as("f"),
        min(when(col("event_type") === "purchase", col("day"))).as("p"))
      .withColumn("cohort_week", expr("f div 7"))
      .withColumn("lag_days",
        when(col("p").isNotNull, (col("p") - col("f")).cast("double")))
    u.groupBy("cohort_week")
      .agg(count(lit(1)).as("n_users"),
        count(col("lag_days")).as("n_converters"),
        r4(count(col("lag_days")).cast("double") /
          count(lit(1)).cast("double")).as("conv_rate"),
        r4(expr("percentile(lag_days, 0.5e0)")).as("p50_lag_days"),
        r4(expr("percentile(lag_days, 0.9e0)")).as("p90_lag_days"))
      .orderBy("cohort_week")
  }

  /** Sample-ratio-mismatch (SRM) health check for the q140/q207/q211
    * experiment split: a 1-df chi-square of the observed arm counts
    * against the designed 50/50 allocation, flagged at the 0.05 critical
    * value — the FIRST gate an experiment readout must pass (a biased
    * split invalidates every downstream metric before any mean is
    * compared). Runs on the user grain, not events, so heavy users
    * cannot mask an assignment bug.
    *
    * Determinism: arm counts are exact; χ² and the flag derive from
    * identical integer-fed doubles in both engines (the boolean compares
    * the RAW χ², identical bit-for-bit). Scale: one distinct-user agg
    * and a one-row readout. */
  def q230(s: SparkSession, d: String): DataFrame = {
    val u = events(s, d).select(col("user_id")).distinct()
      .withColumn("in_a", graft.api.Graft.hashBucket(col("user_id"), 2) === 0)
    val cnt = u.agg(
      sum(when(col("in_a"), 1L).otherwise(0L)).as("n_a"),
      sum(when(col("in_a"), 0L).otherwise(1L)).as("n_b"))
    val e = (col("n_a") + col("n_b")) / lit(2.0)
    val chi2 = (col("n_a") - e) * (col("n_a") - e) / e +
      (col("n_b") - e) * (col("n_b") - e) / e
    cnt.select(col("n_a"), col("n_b"),
      r4(chi2).as("chi2"), (chi2 > lit(3.841459)).as("srm"))
  }

  /** Kendall rank correlation τ-b between quantity and discount per return
    * flag — the third member of the correlation family (q58 Pearson, q210
    * Spearman): counts concordant vs discordant pairs, so it reads
    * monotone association without q210's rank construction and is the
    * standard choice when the grids are coarse and tie-heavy (here ~50
    * quantity × ~11 discount levels). Computed entirely on the JOINT
    * SUPPORT grain: cells (flag, x, y, n) from one fact pass, then C/D
    * from the cell-pair join Σ nₐ·n_b over xₐ<x_b split by the y order,
    * and the τ-b tie terms n₁/n₂ from the marginal supports —
    * τ-b = (C−D)/√((n₀−n₁)(n₀−n₂)).
    *
    * Determinism: x and y are RAW parquet grid values (no arithmetic →
    * identical doubles in both engines, so cells and comparisons agree
    * exactly); C, D and the tie terms are exact LONG sums (documented
    * bound: pair products stay under 2⁶³ while a flag holds < ~3·10⁹
    * rows — beyond that, lift the C/D accumulators to double and accept
    * drift ≪ the 4 dp pin); the one float expression √·√ avoids the
    * (n₀−n₁)(n₀−n₂) long overflow and is the same IEEE sequence in both
    * engines. Scale: the cell table is DOMAIN-bounded (quantity grid ×
    * discount grid × 3 flags — never fact-proportional), so the
    * broadcast cell-pair join is O(|cells|²) independent of fact count;
    * everything upstream is one map-side-combined hash agg. */
  /** (flag, quantity, discount, n) joint-support cells — DOMAIN-bounded
    * (quantity grid × discount grid × 3 flags), shared by q231 (τ-b pair
    * counts) and q244 (quantity moments via the y-marginal). */
  private def kendallCells(s: SparkSession, d: String): DataFrame =
    graft.Tables.memoized(s, d, "kendallCells") {
      lineitem(s, d)
        .groupBy(col("l_returnflag").as("rf"),
          col("l_quantity").as("x"), col("l_discount").as("y"))
        .agg(count(lit(1)).as("n"))
    }

  def q231(s: SparkSession, d: String): DataFrame = {
    val cells = kendallCells(s, d)
    val b = cells.select(col("rf").as("rf_b"), col("x").as("xb"),
      col("y").as("yb"), col("n").as("nb"))
    val cd = cells.join(broadcast(b),
        col("rf") === col("rf_b") && col("x") < col("xb"))
      .groupBy("rf")
      .agg(sum(when(col("y") < col("yb"), col("n") * col("nb"))
          .otherwise(0L)).as("c_conc"),
        sum(when(col("y") > col("yb"), col("n") * col("nb"))
          .otherwise(0L)).as("d_disc"))
    // tie terms via exact integer division (t(t−1) is always even)
    val xt = cells.groupBy("rf", "x").agg(sum("n").as("t"))
      .groupBy("rf").agg(expr("sum(t * (t - 1)) div 2").as("n1"))
    val yt = cells.groupBy("rf", "y").agg(sum("n").as("t"))
      .groupBy("rf").agg(expr("sum(t * (t - 1)) div 2").as("n2"))
    val tot = cells.groupBy("rf").agg(sum("n").as("nn"))
      .select(col("rf"), col("nn"), expr("(nn * (nn - 1)) div 2").as("n0"))
    cd.join(xt, "rf").join(yt, "rf").join(tot, "rf")
      .select(col("rf"), col("nn").as("n"),
        col("c_conc"), col("d_disc"),
        // nullif: a group whose y ties on EVERY pair (n2 = n0) has no
        // concordance signal and τ-b is undefined — null, not 0/0
        // (Spark's 0/0 is null but DuckDB's is NaN; the q223
        // degenerate-corpus guard class). All-x-tied groups never reach
        // here: the x < xb pair join yields no cd row and the group
        // drops from BOTH engines identically.
        r4((col("c_conc") - col("d_disc")).cast("double") /
          nullif(sqrt((col("n0") - col("n1")).cast("double")) *
            sqrt((col("n0") - col("n2")).cast("double")), lit(0.0))).as("tau_b"))
      .orderBy("rf")
  }

  /** One-way ANOVA F-test of discounted revenue across the three return
    * flags — the k-group generalization of q207's two-arm Welch t:
    * between/within sum-of-squares from per-group sufficient statistics
    * (n, Σy, Σy²), F = (SSB/(k−1))/(SSW/(N−k)), with the η² effect size
    * (share of variance explained by the grouping) beside it, mirroring
    * how q222 pairs χ² with Cramér's V.
    *
    * Determinism: y pins to the 2 dp grid first, so both engines
    * aggregate identical doubles; SSB/SSW assemble from the same sums
    * with the same IEEE expression shape, leaving summation-order drift
    * ≪ the 4 dp pin. Scale: ONE map-side-combined fact pass to the
    * 3-row group grain, then scalar arithmetic — no window, no join
    * wider than 3 rows. */
  def q232(s: SparkSession, d: String): DataFrame = {
    val y = r2(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
    val per = lineitem(s, d).select(col("l_returnflag").as("g"), y.as("y"))
      .groupBy("g").agg(count(lit(1)).as("n"),
        sum("y").as("sy"), sum(col("y") * col("y")).as("ssy"))
    val agg = per.agg(count(lit(1)).as("k"), sum("n").as("nn"),
      sum("sy").as("s"), sum("ssy").as("ss"),
      sum(col("sy") * col("sy") / col("n").cast("double")).as("sb"))
    val ssb = col("sb") - col("s") * col("s") / col("nn").cast("double")
    val ssw = col("ss") - col("sb")
    // nullif on every degenerate denominator (the q223 guard class):
    // one group (k = 1) has no between-variance, one row per group
    // (nn = k) no within-variance, exactly-constant within-group values
    // (ssw = 0, reachable when y is binary-exact) an undefined F, and an
    // all-constant corpus (SST = 0) an undefined η² — null in BOTH
    // engines, where raw /0 is null in Spark but inf/NaN in DuckDB.
    val msb = ssb / nullif((col("k") - 1).cast("double"), lit(0.0))
    val msw = ssw / nullif((col("nn") - col("k")).cast("double"), lit(0.0))
    agg.select(col("k"), col("nn").as("n"),
      r2(msb).as("ms_between"),
      r2(msw).as("ms_within"),
      r4(msb / nullif(msw, lit(0.0))).as("f"),
      r5(ssb / nullif(ssb + ssw, lit(0.0))).as("eta_sq"))
  }

  /** Day-of-week seasonal index of daily revenue — the multiplicative
    * weekly profile behind q208's lag-7 seasonal-naive model and q212's
    * ACF spike: index(dow) = mean daily revenue on that weekday / overall
    * mean daily revenue (>1 ⇒ above-trend weekday). Weekday is computed
    * by pure INTEGER epoch-day arithmetic — pmod(epoch_day + 4, 7), 0 =
    * Sunday (1970-01-01 was a Thursday) — sidestepping the Spark(1–7) vs
    * DuckDB(0–6) dayofweek off-by-one entirely (SURVEY §2.9 gotcha 6).
    *
    * Determinism: daily revenue pins at 2 dp before the weekday
    * averages; the dow key is exact integer. Scale: one day-grain fact
    * agg (calendar-sized output), a 7-row group-by, and a broadcast
    * one-row grand mean. */
  def q238(s: SparkSession, d: String): DataFrame = {
    val daily = lineitem(s, d)
      .groupBy(col("l_shipdate").as("day"))
      .agg(r2(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .as("rev"))
      .withColumn("dow", pmod(datediff(col("day"), lit("1970-01-01")) + 4, lit(7))
        .cast("long"))
    val overall = daily.agg(avg("rev").as("grand"))
    daily.groupBy("dow")
      .agg(count(lit(1)).as("n_days"), avg("rev").as("m"))
      .crossJoin(broadcast(overall))
      .select(col("dow"), col("n_days"), r2(col("m")).as("avg_rev"),
        r4(col("m") / col("grand")).as("seasonal_index"))
      .orderBy("dow")
  }

  /** Kruskal–Wallis rank test of discounted revenue across the three
    * return flags — the k-group generalization of q211's Mann–Whitney
    * (as q232's ANOVA generalizes q207's Welch t, but rank-based, so
    * valid under the same no-normality caveats): H from tie-averaged
    * ranks, the standard tie correction C = 1 − Σ(t³−t)/(N³−N), and the
    * ε² effect size H_adj/(N−1).
    *
    * Plan: ranks are NEVER a fact-grain global window — revenue pins to
    * its 2 dp grid, shrinks to the value support, and the cumulative
    * count runs through [[graft.api.Graft.prefixSum]]'s range-blocked
    * combine (the q211 discipline); per-group rank sums Σ c·fr are exact
    * half-integer sums (order-free below 2⁵³). H assembles in DEVIATION
    * form Σ n_g(R̄_g − (N+1)/2)² — the Σ R_g²/n_g textbook form
    * cancels ~1e23-magnitude terms and its 3-row summation-order drift
    * would reach the 4 dp pin; deviations subtract means first, so every
    * term is small and non-cancelling. Tie cube in double (the q211
    * overflow bound). */
  def q243(s: SparkSession, d: String): DataFrame = {
    // r14: the (flag, revenue) cell grain is definitionally IDENTICAL to
    // q210's memoized y-rank support (same pin, same grouping) — reuse
    // that memo instead of re-running the fact-sized agg at every one of
    // this plan's references (the support is ~594k rows at sf0.1: y is
    // continuous, so "shrink to support" shrinks nothing and each
    // rebuild was a full fact scan+agg). The v support (value grain
    // across flags) is memo+cached too: prefixSum references it three
    // times and the ties agg a fourth.
    val cells = graft.Tables.memoized(s, d, "spearmanSup_y") {
      lineitem(s, d).select(col("l_returnflag").as("rf"),
          r2(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("y"))
        .groupBy("rf", "y").agg(count(lit(1)).as("t"))
    }.select(col("rf").as("g"), col("y").as("v"), col("t").as("c"))
    val sup = graft.Tables.memoized(s, d, "kruskalSup") {
      cells.groupBy("v").agg(sum("c").as("t"))
    }
    val ranked = graft.api.Graft.prefixSum(sup, "v", Seq("t"))
      .select(col("v"), col("t"),
        ((col("t_cum") - col("t")).cast("double") +
          (col("t") + 1).cast("double") / lit(2.0)).as("fr"))
    val per = cells.join(ranked.select("v", "fr"), "v")
      .groupBy("g").agg(sum("c").as("ng"), sum(col("c") * col("fr")).as("rg"))
    val ties = ranked.agg(
      sum(col("t").cast("double") * col("t") * col("t") - col("t")).as("tie3"),
      sum("t").as("nn"))
    val dev = per.crossJoin(broadcast(ties))
      .withColumn("dv", col("rg") / col("ng").cast("double") -
        (col("nn") + 1).cast("double") / lit(2.0))
      .withColumn("dev2", col("ng").cast("double") * col("dv") * col("dv"))
    dev.agg(count(lit(1)).as("k"), max("nn").as("n"),
        max("tie3").as("tie3"), sum("dev2").as("sdev"))
      .select(col("k"), col("n"),
        (lit(12.0) / (col("n").cast("double") * (col("n") + 1).cast("double")) *
          col("sdev")).as("h0"),
        // nullif: a single-row corpus has N³−N = 0 and the tie
        // correction is undefined — null (propagating into h_adj and
        // eps_sq) in BOTH engines, where raw 0/0 is null in Spark but
        // NaN in DuckDB (the q223 degenerate-corpus guard class)
        (lit(1.0) - col("tie3") / nullif(
          col("n").cast("double") * col("n") * col("n") - col("n"),
          lit(0.0))).as("cc"))
      // nullif: when EVERY value ties (one support row) cc is exactly 0
      // and H is undefined — null, not 0/0 (the q223 degenerate-corpus
      // guard class)
      .select(col("k"), col("n"), r4(col("h0")).as("h"),
        r4(col("h0") / nullif(col("cc"), lit(0.0))).as("h_adj"),
        r5(col("h0") / nullif(col("cc"), lit(0.0)) /
          (col("n") - 1).cast("double")).as("eps_sq"))
  }

  /** Jarque–Bera normality screen of the quantity distribution per return
    * flag: skewness, excess kurtosis and JB = n/6·(S² + K²/4) — the
    * moment-based "is this column even roughly normal" gate run before
    * choosing between q207/q232 (moment tests) and q211/q243 (rank
    * tests). Computed EXACTLY on the domain-bounded quantity support (the
    * q231 [[kendallCells]] y-marginal — zero extra fact passes when the
    * memo is warm): Σ c·x is an exact integer-grid sum, so μ and every
    * central power (x−μ)^k evaluate as identical IEEE doubles in both
    * engines, and the ≤50-cell moment sums have no fact-proportional
    * summation-order surface. The raw-moment form (Σx⁴ etc.) would
    * cancel ~1e16-magnitude terms; central moments on the support never
    * cancel. Scale: one map-side-combined agg to the support, then
    * arithmetic on ≤150 cells. */
  def q244(s: SparkSession, d: String): DataFrame = {
    val sup = kendallCells(s, d).groupBy("rf", "x").agg(sum("n").as("c"))
    val mu = sup.groupBy("rf").agg(sum("c").as("n"),
      (sum(col("c") * col("x")) / sum("c").cast("double")).as("mu"))
    val m = sup.join(broadcast(mu), "rf")
      .withColumn("dx", col("x") - col("mu"))
      .groupBy("rf")
      .agg(max("n").as("n"),
        (sum(col("c") * col("dx") * col("dx")) /
          max("n").cast("double")).as("m2"),
        (sum(col("c") * col("dx") * col("dx") * col("dx")) /
          max("n").cast("double")).as("m3"),
        (sum(col("c") * col("dx") * col("dx") * col("dx") * col("dx")) /
          max("n").cast("double")).as("m4"))
    // nullif: a constant column has m2 = 0 and no defined shape — null,
    // not 0/0 (the q223 degenerate-corpus guard class)
    m.select(col("rf"), col("n"),
        (col("m3") / nullif(col("m2") * sqrt(col("m2")), lit(0.0))).as("sk"),
        (col("m4") / nullif(col("m2") * col("m2"), lit(0.0)) - lit(3.0)).as("ku"))
      .select(col("rf"), col("n"), r4(col("sk")).as("skewness"),
        r4(col("ku")).as("kurtosis_excess"),
        r2((col("n").cast("double") / lit(6.0)) *
          (col("sk") * col("sk") + col("ku") * col("ku") / lit(4.0))).as("jb"))
      .orderBy("rf")
  }

  /** Functional-dependency audit — the data-quality profiling operator
    * beside q112 (per-column stats) and q120 (referential integrity):
    * for each DECLARED determinant → dependent pair, how many
    * determinant values map to more than one dependent value. A clean
    * key-determined FD (nation) reads 0; a violated one quantifies HOW
    * functional the relationship actually is — the check run before
    * trusting a denormalization or a join-key assumption. Five declared
    * FDs spanning held, partially-held and violated cases.
    *
    * Determinism: counts are exact; one pinned ratio. Scale: each branch
    * is two hash aggregations (fact → determinant grain → one row), all
    * map-side combinable; the union is five one-row relations. */
  def q245(s: SparkSession, d: String): DataFrame = {
    def fd(df: DataFrame, det: String, dep: String, label: String) =
      df.groupBy(col(det)).agg(countDistinct(col(dep)).as("nd"))
        .agg(lit(label).as("fd"), count(lit(1)).as("n_det"),
          sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_violating"),
          max("nd").as("max_dep"))
    fd(nation(s, d), "n_nationkey", "n_regionkey",
        "nation: n_nationkey -> n_regionkey")
      .unionByName(fd(customer(s, d), "c_nationkey", "c_mktsegment",
        "customer: c_nationkey -> c_mktsegment"))
      .unionByName(fd(orders(s, d), "o_custkey", "o_orderpriority",
        "orders: o_custkey -> o_orderpriority"))
      .unionByName(fd(lineitem(s, d), "l_orderkey", "l_shipdate",
        "lineitem: l_orderkey -> l_shipdate"))
      .unionByName(fd(lineitem(s, d), "l_partkey", "l_extendedprice",
        "lineitem: l_partkey -> l_extendedprice"))
      .select(col("fd"), col("n_det"), col("n_violating"),
        r4(col("n_violating").cast("double") / col("n_det").cast("double"))
          .as("violation_rate"),
        col("max_dep"))
      .orderBy("fd")
  }

  /** Candidate-key / uniqueness profile — the other half of the q245
    * audit: for each declared column combination, row count, distinct
    * count, duplicate-row overhang and an is_key verdict. This is how a
    * pipeline discovers (rather than assumes) its merge keys and dedup
    * grains; combos chosen to span unique single keys, a non-unique
    * foreign key, and composite candidates.
    *
    * Determinism: all-integer. Scale: each branch is one hash agg to the
    * combo grain then one row — the distinct count comes from the SAME
    * agg (count of grain rows), never a second countDistinct pass. */
  def q246(s: SparkSession, d: String): DataFrame = {
    def kp(df: DataFrame, cols: Seq[String], label: String) =
      df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("c"))
        .agg(lit(label).as("key_cols"), sum("c").as("n_rows"),
          count(lit(1)).as("n_distinct"), sum(col("c") - 1).as("n_dup_rows"),
          (max("c") === 1).as("is_key"))
    kp(orders(s, d), Seq("o_orderkey"), "orders(o_orderkey)")
      .unionByName(kp(lineitem(s, d), Seq("l_orderkey"),
        "lineitem(l_orderkey)"))
      .unionByName(kp(lineitem(s, d), Seq("l_orderkey", "l_linenumber"),
        "lineitem(l_orderkey,l_linenumber)"))
      .unionByName(kp(lineitem(s, d),
        Seq("l_orderkey", "l_partkey", "l_suppkey"),
        "lineitem(l_orderkey,l_partkey,l_suppkey)"))
      .unionByName(kp(events(s, d), Seq("event_id"), "events(event_id)"))
      .unionByName(kp(documents(s, d), Seq("doc_id"), "documents(doc_id)"))
      .orderBy("key_cols")
  }

  /** Lead–lag cross-correlation between daily ORDER intake and daily
    * SHIPPED revenue — the bivariate extension of q212's ACF: xcorr(k) =
    * corr(rev(t), orders(t−k)) for k ∈ [−7, 7]. A peak at positive k
    * reads "orders lead revenue by k days" (the order→ship pipeline
    * delay); the operator behind any "which series is the leading
    * indicator" question. Like q212, lags index OBSERVED days of the
    * joined series (documented; gap-fill with q117 first for strict
    * calendar lags).
    *
    * Determinism: both series pin before the windows (revenue 2 dp,
    * counts exact); corr is the same sample-Pearson in both engines over
    * identical pairs, pinned 4 dp. Scale: two day-grain fact aggs, one
    * calendar-sized join, and the lag windows run over the SAME
    * calendar-bounded series as q212 (the documented fixed-offset-lag
    * exemption — not prefix-scannable, input never fact-proportional). */
  def q247(s: SparkSession, d: String): DataFrame = {
    val rev = lineitem(s, d).groupBy(col("l_shipdate").as("day"))
      .agg(r2(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .as("rev"))
    val ord = orders(s, d).groupBy(col("o_orderdate").as("day"))
      .agg(count(lit(1)).cast("double").as("n_ord"))
    val ser = rev.join(ord, "day")
    val w = Window.orderBy("day")
    val shifted = ser.select(col("rev") +:
      (-7 to 7).map { k =>
        val c =
          if (k > 0) lag("n_ord", k).over(w)
          else if (k < 0) lead("n_ord", -k).over(w)
          else col("n_ord")
        c.as(s"f${k + 7}")
      }: _*)
    shifted.selectExpr("rev",
        s"stack(15, ${(-7 to 7).map(k => s"$k, f${k + 7}").mkString(", ")}) AS (lag_k, f)")
      .groupBy("lag_k")
      .agg(count(col("f")).as("n_pairs"), r4(corr(col("rev"), col("f"))).as("xcorr"))
      .select(col("lag_k").cast("long").as("lag_k"), col("n_pairs"), col("xcorr"))
      .orderBy("lag_k")
  }

  /** Conditional next-event entropy — how PREDICTABLE each event type's
    * successor is: H(next | cur=s) in nats over q177's transition grain,
    * its ln|targets| normalization, and the source's stationary share.
    * norm_entropy → 0 reads "this state's successor is nearly
    * deterministic" (a funnel edge), → 1 reads "memoryless" — the
    * information-theoretic summary of the transition matrix q177 lists
    * row by row, beside q168's (unconditional) user entropy and q237's
    * token entropy.
    *
    * Determinism: probabilities divide exact longs; ≤5-term entropy sums
    * drift ≪ the 4 dp pin; norm divides the PINNED entropy (the q237
    * discipline). The sequence window orders by the full ns ts (q229's
    * lesson). Scale: one fact-partitioned lag window + hash aggs to the
    * 5×5 transition grain. */
  def q248(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val tr = events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("from_type", lag("event_type", 1).over(w))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val tot = tr.groupBy("from_type")
      .agg(sum("n").as("n_from"), count(lit(1)).as("n_next_types"))
    val grand = tot.agg(sum("n_from").as("nn"))
    tr.join(broadcast(tot), "from_type")
      .groupBy("from_type")
      .agg(max("n_from").as("n_from"), max("n_next_types").as("n_next_types"),
        r4(-sum((col("n").cast("double") / col("n_from").cast("double")) *
          log(col("n").cast("double") / col("n_from").cast("double"))))
          .as("entropy"))
      .crossJoin(broadcast(grand))
      .select(col("from_type"), col("n_from"), col("n_next_types"),
        r4(col("n_from").cast("double") / col("nn").cast("double"))
          .as("p_source"),
        col("entropy"),
        r4(when(col("n_next_types") === 1, lit(null))
          .otherwise(col("entropy") / log(col("n_next_types").cast("double"))))
          .as("norm_entropy"))
      .orderBy("from_type")
  }

  /** Trailing 7-observation rolling median and IQR of daily revenue — the
    * ROBUST rolling profile beside q34's moving mean (one bad day of
    * revenue corruption saturates a mean but not a median) and q119's
    * global winsorized stats; the IQR band is the control-limit input for
    * robust anomaly screens (q122's global MAD, localized). Frames index
    * OBSERVED days like q34/q212 (gap-fill with q117 first for strict
    * calendar frames).
    *
    * Determinism: daily revenue pins at 2 dp first, so both engines
    * interpolate percentiles over identical doubles (the q29
    * percentile ≡ quantile_cont parity); outputs re-pin at 2 dp. Scale:
    * one day-grain fact agg, then a global window over the
    * calendar-bounded series — the documented fixed-frame exemption
    * class (a sliding holistic frame is not prefix-scannable). */
  def q255(s: SparkSession, d: String): DataFrame = {
    val daily = lineitem(s, d)
      .groupBy(col("l_shipdate").as("day"))
      .agg(r2(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .as("rev"))
    val w = Window.orderBy("day").rowsBetween(-6, 0)
    daily.select(col("day"), col("rev"),
        count(lit(1)).over(w).as("n_win"),
        r2(percentile(col("rev"), lit(0.5)).over(w)).as("med7"),
        r2(percentile(col("rev"), lit(0.75)).over(w) -
          percentile(col("rev"), lit(0.25)).over(w)).as("iqr7"))
      .orderBy("day")
  }

  /** New-entity rate — per-day counts of first-seen users and items plus
    * their cumulative curves: the cold-start / entity-drift monitor a
    * recommender and a feature store both watch (a jump in new_items
    * means embeddings and item stats lag behind the catalog). First
    * occurrence is the q226 trick — min(day) per entity, NO running
    * distinct state; cumulatives run through the range-blocked
    * [[graft.api.Graft.prefixSum]].
    *
    * Determinism: all-integer. Scale: two entity-grain aggs + a
    * calendar-sized join and prefix scan. */
  def q256(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d).select(
      expr("((ts div 1000) - 1704067200000000) div 86400000000").as("day"),
      col("user_id"),
      itemFromProps.as("item"))
    val nu = e.groupBy("user_id").agg(min("day").as("day"))
      .groupBy("day").agg(count(lit(1)).as("new_users"))
    val ni = e.groupBy("item").agg(min("day").as("day"))
      .groupBy("day").agg(count(lit(1)).as("new_items"))
    val days = e.select("day").distinct()
    val joined = days.join(nu, Seq("day"), "left").join(ni, Seq("day"), "left")
      .select(col("day"),
        coalesce(col("new_users"), lit(0L)).as("new_users"),
        coalesce(col("new_items"), lit(0L)).as("new_items"))
    graft.api.Graft.prefixSum(joined, "day", Seq("new_users", "new_items"))
      .select(col("day"), col("new_users"), col("new_items"),
        col("new_users_cum").as("cum_users"),
        col("new_items_cum").as("cum_items"))
      .orderBy("day")
  }

  /** Additive Holt–Winters forecast of per-flag daily revenue — the
    * seasonal completion of the forecasting family: q118 smooths level,
    * q200 adds trend, THIS adds the 7-slot seasonal queue that q238
    * showed exists and q208's seasonal-naive exploits
    * (α=0.5, β=0.3, γ=0.4, period 7). Forecast = level + trend + next
    * seasonal. Seasonal slots rotate per OBSERVED day (q212's observed-
    * grain caveat; gap-fill with q117 first for strict weekday
    * alignment).
    *
    * Determinism: the [[graft.api.Graft.holtWinters]] fold pins every
    * state component to 10 dp per step, so the DuckDB list_reduce twin
    * (9-element rotating state) reproduces the recurrence bit-for-bit —
    * the q200 discipline, tripled. Scale: one shuffle to the 3-flag
    * grain; the fold is the operator's inherent per-series recurrence. */
  def q259(s: SparkSession, d: String): DataFrame = {
    val daily = lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_shipdate").as("day"))
      .agg(r2(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .as("rev"))
    graft.api.Graft.holtWinters(daily, Seq("l_returnflag"), "day", "rev",
        0.5, 0.3, 0.4, period = 7)
      .select(col("l_returnflag"), col("n_points"),
        col("level"), col("trend"), col("s_next"),
        r2(col("forecast")).as("forecast"))
      .orderBy("l_returnflag")
  }

  /** Minimum detectable effect of the q140 experiment at 80% power —
    * the design-side statistic the experimentation family was missing
    * (q140 tests, q141 tightens, q207 compares, q230 gates; THIS answers
    * "was the experiment even capable of seeing the effect we care
    * about"): MDE = (z₀.₉₇₅ + z₀.₈₀)·√(s²_A/n_A + s²_B/n_B) on per-user
    * purchase spend, absolute and relative to the control mean.
    *
    * Determinism: per-user spend pins at 2 dp (exact double multiples of
    * 0.01 — sums are exact); var_samp is the q26-pinned cross-engine
    * surface; the z-sum is one shared literal. Scale: one fact pass to
    * user grain, a 2-row arm agg, a 1×1 broadcast cross. */
  def q260(s: SparkSession, d: String): DataFrame = {
    val spend = events(s, d).filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(r2(sum("value")).as("y"))
      .withColumn("arm",
        when(graft.api.Graft.hashBucket(col("user_id"), 2) === 0, "A")
          .otherwise("B"))
    val per = spend.groupBy("arm")
      .agg(count(lit(1)).as("n"), avg("y").as("m"), var_samp(col("y")).as("v"))
    val a = per.filter(col("arm") === "A")
      .select(col("n").as("n_a"), col("m").as("m_a"), col("v").as("v_a"))
    val b = per.filter(col("arm") === "B")
      .select(col("n").as("n_b"), col("m").as("m_b"), col("v").as("v_b"))
    a.crossJoin(broadcast(b))
      .withColumn("se", sqrt(col("v_a") / col("n_a") + col("v_b") / col("n_b")))
      .select(col("n_a"), col("n_b"), r2(col("m_a")).as("mean_a"),
        r2(col("m_b")).as("mean_b"), r4(col("se")).as("se"),
        r4(lit(2.801585) * col("se")).as("mde_abs"),
        // nullif: a zero-mean control arm (every purchase value 0)
        // has no defined RELATIVE effect — null in both engines, where
        // raw /0 is null in Spark but inf in DuckDB (the q223
        // degenerate-corpus guard class); mde_abs stays real
        r4(lit(2.801585) * col("se") / nullif(col("m_a"), lit(0.0)))
          .as("mde_rel"))
  }

  /** Smoothed target encoding of the market segment against customer
    * order spend — the categorical-feature encoder every tabular
    * training pipeline ships (beside q175's behavioral features):
    * enc(seg) = (Σy + m·ȳ_global)/(n + m) with m = 20 pseudo-
    * observations, shrinking rare segments toward the global mean
    * (the leave-one-out variant subtracts the own row from the same
    * sufficient statistics — same relation, per-row arithmetic).
    *
    * Determinism: spends pin to the 2 dp grid, so Σy is an EXACT double
    * (integer multiples of 0.01 under 2⁵³) and both engines divide
    * identical values; the lift is a ratio of pinned encodings. Scale:
    * one orders pass to customer grain, a dimension join, a 5-row
    * agg + one-row broadcast. */
  def q261(s: SparkSession, d: String): DataFrame = {
    val spend = orders(s, d).groupBy(col("o_custkey"))
      .agg(r2(sum("o_totalprice")).as("y"))
    val seg = customer(s, d)
      .select(col("c_custkey"), col("c_mktsegment"))
      .join(spend, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_mktsegment"), coalesce(col("y"), lit(0.0)).as("y"))
    val per = seg.groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), sum("y").as("sy"))
    val gl = per.agg((sum("sy") / sum("n").cast("double")).as("g"))
    per.crossJoin(broadcast(gl))
      .select(col("c_mktsegment"), col("n"),
        r2(col("sy") / col("n").cast("double")).as("raw_mean"),
        r2((col("sy") + lit(20.0) * col("g")) / (col("n") + 20).cast("double"))
          .as("encoded"),
        r4(((col("sy") + lit(20.0) * col("g")) / (col("n") + 20).cast("double")) /
          col("g")).as("lift"))
      .orderBy("c_mktsegment")
  }

  /** Friedman rank test of monthly revenue across the three return flags
    * — the BLOCKED nonparametric k-group test completing the rank family
    * (q211 Mann–Whitney: 2 groups; q243 Kruskal–Wallis: k independent
    * groups; THIS: k treatments measured on the same n blocks, here
    * flag-revenue per ship month, so month-to-month level shifts cancel
    * instead of inflating the variance). Within-block fractional ranks
    * come from a block-grain 3×3 comparison join (k is tiny and fixed —
    * no window at all); the statistic uses the TIE-PROOF general form
    * χ²_F = n²(k−1)·Σ_j(R̄_j − r̄)² / Σ_ij(r_ij − r̄)², which reduces to
    * the textbook 12n/(k(k+1)) form when no ranks tie.
    *
    * Determinism: block revenues pin at 2 dp; ranks are exact
    * half-integers from counting comparisons; the two quadratic sums
    * divide as identical IEEE expressions. Scale: one fact pass to the
    * (month × flag) grain, a within-block bounded self-join (k² rows per
    * block), two tiny aggs. */
  def q267(s: SparkSession, d: String): DataFrame = {
    val cell = lineitem(s, d)
      .groupBy(expr("year(l_shipdate) * 12 + month(l_shipdate)").as("blk"),
        col("l_returnflag").as("g"))
      .agg(r2(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .as("v"))
    val full = cell.groupBy("blk").agg(count(lit(1)).as("kk"))
      .filter(col("kk") === 3).select("blk")
    val c2 = cell.join(full, "blk")
    val ranked = c2.as("a").join(c2.as("b"), "blk")
      .groupBy(col("blk"), col("a.g").as("g"))
      .agg((sum(when(col("b.v") < col("a.v"), 1L).otherwise(0L)).cast("double") +
        (sum(when(col("b.v") === col("a.v"), 1L).otherwise(0L)) + 1).cast("double") /
          lit(2.0)).as("r"))
    val n = full.agg(count(lit(1)).as("n"))
    val per = ranked.groupBy("g").agg(sum("r").as("sr"))
      .crossJoin(broadcast(n))
      .withColumn("dv", col("sr") / col("n").cast("double") - lit(2.0))
    val ss = ranked.agg(
      sum((col("r") - lit(2.0)) * (col("r") - lit(2.0))).as("sst"))
    per.agg(max("n").as("n_blocks"),
        sum(col("dv") * col("dv")).as("ssj"),
        max(lit(3L)).as("k"))
      .crossJoin(broadcast(ss))
      .select(col("n_blocks"), col("k"),
        r4(col("n_blocks").cast("double") * col("n_blocks") * (col("k") - 1) *
          col("ssj") / nullif(col("sst"), lit(0.0))).as("chi2_f"))
  }

  /** Two-sample Poisson rate comparison of purchase events between the
    * q140 experiment arms — the COUNT-data member of the test family
    * (q140 compares proportions, q207/q232 means, q211/q243 ranks; THIS
    * compares event RATES over exposure): conditional on the total, the
    * arm-A count is Binomial(n, e_A/(e_A+e_B)) with exposure = distinct
    * active user-days, so z = (n_A − n·p)/√(n·p(1−p)) — the standard
    * exact-conditional normal approximation, plus the rate ratio itself.
    *
    * Determinism: counts and exposures are exact longs; p divides exact
    * longs; one IEEE z expression pinned 4 dp (the q140 discipline, with
    * its nullif zero-variance guard). Scale: two fact-scale dedup/count
    * aggs to the arm grain, then one-row arithmetic. */
  def q269(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(col("user_id"), col("event_type"),
      expr("((ts div 1000) - 1704067200000000) div 86400000000").as("day"))
      .withColumn("arm",
        when(graft.api.Graft.hashBucket(col("user_id"), 2) === 0, "A")
          .otherwise("B"))
    val counts = ev.filter(col("event_type") === "purchase")
      .groupBy("arm").agg(count(lit(1)).as("n"))
    val expo = ev.select("arm", "user_id", "day").distinct()
      .groupBy("arm").agg(count(lit(1)).as("e"))
    val j = counts.join(expo, "arm")
    val a = j.filter(col("arm") === "A")
      .select(col("n").as("n_a"), col("e").as("e_a"))
    val b = j.filter(col("arm") === "B")
      .select(col("n").as("n_b"), col("e").as("e_b"))
    a.crossJoin(broadcast(b))
      .withColumn("p", col("e_a").cast("double") /
        (col("e_a") + col("e_b")).cast("double"))
      .withColumn("nn", (col("n_a") + col("n_b")).cast("double"))
      .select(col("n_a"), col("e_a"), col("n_b"), col("e_b"),
        r4((col("n_a").cast("double") / col("e_a").cast("double")) /
          (col("n_b").cast("double") / col("e_b").cast("double"))).as("rate_ratio"),
        r4((col("n_a").cast("double") - col("nn") * col("p")) /
          nullif(sqrt(col("nn") * col("p") * (lit(1.0) - col("p"))), lit(0.0)))
          .as("z"))
  }

  /** Join-key skew diagnostics — the "should this join be salted"
    * pre-flight beside q112's column profile and q245's FD audit: for
    * each declared join key, the key cardinality, per-key row quantiles,
    * the hottest key's count and the skew factor max/mean (the ratio
    * that predicts the straggler task AQE's skew-join split or
    * [[graft.api.Graft.saltedSum]]-style salting must absorb — a factor
    * of 1 is perfectly uniform, the q205/Gini-style concentration read
    * specialized to shuffle planning).
    *
    * Determinism: counts exact; percentiles interpolate identical exact
    * longs widened to double (q29 parity); one pinned ratio. Scale:
    * each branch is ONE map-side-combined fact agg to the key grain
    * then a one-row percentile agg — the profile costs one pass per
    * declared key. */
  def q271(s: SparkSession, d: String): DataFrame = {
    def prof(df: DataFrame, keyCol: String, label: String) =
      df.groupBy(col(keyCol).as("k")).agg(count(lit(1)).as("c"))
        .agg(lit(label).as("join_key"), count(lit(1)).as("n_keys"),
          sum("c").as("n_rows"), max("c").as("max_rows"),
          percentile(col("c").cast("double"), lit(0.5)).as("med"),
          percentile(col("c").cast("double"), lit(0.99)).as("p99"))
    prof(lineitem(s, d), "l_orderkey", "lineitem.l_orderkey")
      .unionByName(prof(lineitem(s, d), "l_partkey", "lineitem.l_partkey"))
      .unionByName(prof(orders(s, d), "o_custkey", "orders.o_custkey"))
      .unionByName(prof(events(s, d), "user_id", "events.user_id"))
      .select(col("join_key"), col("n_keys"), col("n_rows"), col("max_rows"),
        r2(col("med")).as("p50_rows"), r2(col("p99")).as("p99_rows"),
        r4(col("max_rows").cast("double") * col("n_keys").cast("double") /
          col("n_rows").cast("double")).as("skew_factor"))
      .orderBy("join_key")
  }

  /** Group-sequential experiment monitor — the peeking-safe readout the
    * experimentation family still lacked (q140 tests ONCE at the end;
    * real experiments are read daily): the month splits into K = 5
    * six-day looks, each look computes the q269-style exact-conditional
    * purchase-rate z on data CUMULATIVE through that look, and compares
    * |z| against the O'Brien–Fleming spending boundary
    * c_K·√(K/k) (c₅ = 2.04, the canonical K=5, two-sided α=0.05
    * constant) — early looks demand overwhelming evidence, the final
    * look nearly the fixed-sample bound, and the overall type-I error
    * stays 5% despite five reads.
    *
    * Determinism: look cumulatives are exact-long prefix sums over the
    * 5-row look grain; z is the q269 expression with its nullif guard;
    * the boundary is literal arithmetic. Scale: one fact pass to the
    * (look × arm) grain, a 10-row prefix window, one-row-per-look
    * assembly. */
  def q272(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(col("user_id"), col("event_type"),
        expr("((ts div 1000) - 1704067200000000) div 86400000000").as("day"))
      .filter(col("day") < 30)
      .withColumn("look", least(expr("day div 6") + 1, lit(5L)))
      .withColumn("arm",
        when(graft.api.Graft.hashBucket(col("user_id"), 2) === 0, "A")
          .otherwise("B"))
    val per = ev.groupBy("look", "arm")
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n"),
        countDistinct("user_id", "day").as("e"))
    val w = Window.partitionBy("arm").orderBy("look")
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = per.select(col("look"), col("arm"),
      sum("n").over(w).as("cn"), sum("e").over(w).as("ce"))
    val a = cum.filter(col("arm") === "A")
      .select(col("look"), col("cn").as("n_a"), col("ce").as("e_a"))
    val b = cum.filter(col("arm") === "B")
      .select(col("look"), col("cn").as("n_b"), col("ce").as("e_b"))
    a.join(b, "look")
      .withColumn("p", col("e_a").cast("double") /
        (col("e_a") + col("e_b")).cast("double"))
      .withColumn("nn", (col("n_a") + col("n_b")).cast("double"))
      .withColumn("z", r4((col("n_a").cast("double") - col("nn") * col("p")) /
        nullif(sqrt(col("nn") * col("p") * (lit(1.0) - col("p"))), lit(0.0))))
      .withColumn("bound", r4(lit(2.04) * sqrt(lit(5.0) / col("look").cast("double"))))
      .select(col("look"), col("n_a"), col("e_a"), col("n_b"), col("e_b"),
        col("z"), col("bound"), (abs(col("z")) > col("bound")).as("crossed"))
      .orderBy("look")
  }

  /** Uplift decile curve of the q140 experiment — incremental conversion
    * by targeting depth: users rank by PRE-period activity (first-half
    * event count, the targeting score), cut into rank deciles via the
    * q136 integer-bin discipline, and each decile reports treated vs
    * control conversion (≥14 purchases, the q140 interior metric), their
    * difference, and the cumulative incremental conversions per treated
    * user — the Qini-style curve read before rolling a targeted
    * campaign out by depth.
    *
    * Determinism: the score support is exact longs; bins are integer
    * arithmetic on prefix-scan cumulative counts; rates divide exact
    * longs; cumulatives run over the ≤10-row bin grain. Scale: two
    * fact-scale user aggs, the range-blocked prefix scan, a 10-row
    * window. */
  def q273(s: SparkSession, d: String): DataFrame = {
    val base = events(s, d).select(col("user_id"), col("event_type"),
      expr("((ts div 1000) - 1704067200000000) div 86400000000").as("day"))
    val score = base.filter(col("day") < 15)
      .groupBy("user_id").agg(count(lit(1)).as("sc"))
    val conv = base.filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(count(lit(1)).as("np"))
      .filter(col("np") >= 14).select("user_id").withColumn("cv", lit(1L))
    val scored = score.join(conv, Seq("user_id"), "left")
      .withColumn("arm",
        when(graft.api.Graft.hashBucket(col("user_id"), 2) === 0, "A")
          .otherwise("B"))
      .select(col("sc"), col("arm"), coalesce(col("cv"), lit(0L)).as("cv"))
    val sup = scored.groupBy("sc").agg(count(lit(1)).as("t"),
      sum(when(col("arm") === "A", 1L).otherwise(0L)).as("ta"),
      sum(when(col("arm") === "A", col("cv")).otherwise(0L)).as("ca"),
      sum(when(col("arm") === "B", col("cv")).otherwise(0L)).as("cb"))
    val tot = sup.agg(sum("t").as("ntot"))
    val binned = graft.api.Graft.prefixSum(sup, "sc", Seq("t"))
      .crossJoin(broadcast(tot))
      // rank-from-the-top: highest activity lands in decile 1
      .withColumn("cum_desc", col("ntot") - col("t_cum") + col("t"))
      .withColumn("bin", expr("(cum_desc * 10 + ntot - 1) div ntot"))
      .groupBy("bin")
      .agg(sum("ta").as("n_a"), sum(col("t") - col("ta")).as("n_b"),
        sum("ca").as("conv_a"), sum("cb").as("conv_b"))
    val w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    binned
      .withColumn("inc", col("conv_a").cast("double") -
        col("conv_b").cast("double") * col("n_a").cast("double") /
          nullif(col("n_b").cast("double"), lit(0.0)))
      .withColumn("cum_inc", sum("inc").over(w))
      .select(col("bin"), col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
        r4(col("conv_a").cast("double") / nullif(col("n_a").cast("double"), lit(0.0)) -
          col("conv_b").cast("double") / nullif(col("n_b").cast("double"), lit(0.0)))
          .as("uplift"),
        r4(col("cum_inc")).as("cum_incremental"))
      .orderBy("bin")
  }

  /** Covariate balance table of the q140 experiment — the pre-analysis
    * hygiene check beside q230's SRM (which audits COUNTS; this audits
    * COMPOSITION): for each pre-period covariate (event count, purchase
    * spend, distinct event types), the standardized mean difference
    * SMD = (x̄_A − x̄_B)/√((s²_A + s²_B)/2) with the |SMD| < 0.1
    * balanced verdict — the table every causal readout prints before
    * trusting that randomization actually balanced the arms.
    *
    * Determinism: covariates are exact counts / 2 dp-pinned sums at
    * user grain; var_samp is the q26 surface; one pinned ratio per row.
    * Scale: one fact pass to the (user × covariate) grain via an
    * unpivot, a (covariate × arm) agg, a 3-row assembly. */
  def q274(s: SparkSession, d: String): DataFrame = {
    val base = events(s, d).select(col("user_id"), col("event_type"),
      col("value"), expr("((ts div 1000) - 1704067200000000) div 86400000000")
        .as("day"))
      .filter(col("day") < 15)
    val cov = base.groupBy("user_id")
      .agg(count(lit(1)).cast("double").as("n_events"),
        r2(sum(when(col("event_type") === "purchase", col("value"))
          .otherwise(0.0))).as("spend"),
        countDistinct("event_type").cast("double").as("n_types"))
      .withColumn("arm",
        when(graft.api.Graft.hashBucket(col("user_id"), 2) === 0, "A")
          .otherwise("B"))
    val long = cov.selectExpr("arm",
      "stack(3, 'n_events', n_events, 'purchase_spend', spend, 'n_types', n_types) AS (covariate, x)")
    val per = long.groupBy("covariate", "arm")
      .agg(count(lit(1)).as("n"), avg("x").as("m"), var_samp(col("x")).as("v"))
    val a = per.filter(col("arm") === "A")
      .select(col("covariate"), col("n").as("n_a"), col("m").as("m_a"),
        col("v").as("v_a"))
    val b = per.filter(col("arm") === "B")
      .select(col("covariate"), col("n").as("n_b"), col("m").as("m_b"),
        col("v").as("v_b"))
    a.join(b, "covariate")
      // the verdict compares the PINNED smd, so a pin-boundary value
      // cannot flip it differently across engines; the pooled variance is
      // branch-guarded at <= 0 (a constant covariate has var 0, and one
      // engine's var_samp can return a tiny NEGATIVE zero whose sqrt is
      // NaN, not null)
      .withColumn("pv", (col("v_a") + col("v_b")) / lit(2.0))
      .withColumn("smd", r4((col("m_a") - col("m_b")) /
        when(col("pv") <= 0.0, lit(null)).otherwise(sqrt(col("pv")))))
      // `balanced` is TOTAL: a zero-variance covariate has no defined SMD
      // (null), but its arms are balanced exactly when the pinned means
      // agree — so the verdict never carries a null boolean (which the
      // two engines' null representations would render differently)
      .select(col("covariate"), col("n_a"), col("n_b"),
        r4(col("m_a")).as("mean_a"), r4(col("m_b")).as("mean_b"),
        col("smd"),
        when(col("smd").isNull, r4(col("m_a")) === r4(col("m_b")))
          .otherwise(abs(col("smd")) < 0.1).as("balanced"))
      .orderBy("covariate")
  }

  /** Retention half-life — the summary number behind q37's cohort
    * matrix: pooled retention rate by week-since-cohort (weeks 1..4),
    * then the log-linear decay fit ln(rate) = a + b·week whose slope
    * gives half-life = −ln 2 / b — "how many weeks until half the
    * remaining users churn", the single retention number a growth
    * readout quotes.
    *
    * Determinism: rates divide exact distinct counts and pin at 6 dp
    * BEFORE the ln (both engines take ln of identical doubles); a week
    * whose rate pins to exactly 0 drops out of the fit (ln 0 = −inf
    * would poison both slopes), and the slope's sxx denominator is
    * nullif-guarded for the ≤1-point remainder; the regression is q58's
    * closed-form sufficient statistics over ≤4 points. Scale: the q37
    * cohort aggs + a 4-row fit. */
  def q275(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .select(col("user_id"), date_trunc("week", col("tsc")).as("wk"))
    val cohort = ev.groupBy("user_id").agg(min("wk").as("cw"))
    val act = ev.join(cohort, "user_id")
      .select(col("user_id"), col("cw"),
        (datediff(col("wk"), col("cw")) / 7).cast("long").as("k"))
      .distinct()
    val totUsers = cohort.agg(count(lit(1)).as("n_users"))
    // pooled naive rate: n_active(k)/all users — late cohorts that cannot
    // reach offset k understate the tail (documented; slice cohorts with
    // enough runway for an unbiased curve)
    val rates = act.filter(col("k").between(1, 4))
      .groupBy("k").agg(count(lit(1)).as("n_active"))
      .crossJoin(broadcast(totUsers))
      .select(col("k"), col("n_active"), col("n_users"),
        rnd(col("n_active").cast("double") / col("n_users").cast("double"), 6)
          .as("rate"))
      // a true rate below 5e-7 pins to exactly 0.0 and ln(0) = -inf
      // would silently poison the fit; drop such a week from the
      // 4-point regression instead (both engines filter the same
      // pinned values, so the surviving point set is identical)
      .filter(col("rate") > 0.0)
    val fit = rates.agg(count(lit(1)).as("n_points"),
      avg(col("k").cast("double")).as("mx"), avg(log(col("rate"))).as("my"),
      (sum(col("k").cast("double") * log(col("rate"))) -
        count(lit(1)) * avg(col("k").cast("double")) * avg(log(col("rate"))))
        .as("sxy"),
      (sum(col("k").cast("double") * col("k")) -
        count(lit(1)) * avg(col("k").cast("double")) * avg(col("k").cast("double")))
        .as("sxx"))
    fit.select(col("n_points"),
        (col("sxy") / nullif(col("sxx"), lit(0.0))).as("b"))
      .select(col("n_points"), r4(col("b")).as("decay_slope"),
        r2(-log(lit(2.0)) / nullif(col("b"), lit(0.0))).as("half_life_weeks"))
  }

  /** Overdispersion check of per-user event counts — the count-data
    * modeling gate beside q269's rate test: the index of dispersion
    * D = s²/x̄ (Poisson ⇒ 1; user activity is invariably overdispersed)
    * and the χ² = D·(n−1) dispersion statistic, the number that decides
    * Poisson vs negative-binomial before any rate model ships.
    *
    * Determinism: counts exact; mean/variance from exact longs widened
    * once; pinned ratios. Scale: two map-side-combined aggs. */
  def q276(s: SparkSession, d: String): DataFrame =
    events(s, d).groupBy("user_id").agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("n_users"),
        avg(col("c").cast("double")).as("m"),
        var_samp(col("c").cast("double")).as("v"))
      .select(col("n_users"), r2(col("m")).as("mean_events"),
        r2(col("v")).as("var_events"),
        r4(col("v") / nullif(col("m"), lit(0.0))).as("dispersion_index"),
        r2(col("v") / nullif(col("m"), lit(0.0)) *
          (col("n_users") - 1).cast("double")).as("chi2"))

  /** Weekday × hour activity heatmap — the ops/BI load profile beside
    * q220's per-user histogram and q238's revenue weekday index: event
    * counts and share of total per (dow, hour) cell, dow by the pure
    * integer epoch-day arithmetic (q238's gotcha-6 sidestep) and hour by
    * exact µs division — the grid capacity planning and anomaly
    * baselining both read.
    *
    * Determinism: all-integer cell keys, exact counts, one pinned share.
    * Scale: ONE map-side-combined fact agg to a ≤168-cell grid. */
  def q278(s: SparkSession, d: String): DataFrame = {
    val cells = events(s, d).select(
        pmod(expr("((ts div 1000) div 86400000000) + 4"), lit(7)).as("dow"),
        expr("((ts div 1000) % 86400000000) div 3600000000").as("hour"))
      .groupBy("dow", "hour").agg(count(lit(1)).as("n_events"))
    cells.crossJoin(broadcast(cells.agg(sum("n_events").as("tot"))))
      .select(col("dow"), col("hour"), col("n_events"),
        r5(col("n_events").cast("double") / col("tot").cast("double")).as("share"))
      .orderBy("dow", "hour")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q278_hourly_heatmap" -> q278,
    "q274_covariate_balance" -> q274,
    "q275_retention_halflife" -> q275,
    "q276_overdispersion" -> q276,
    "q272_sequential_probe" -> q272,
    "q273_uplift_deciles" -> q273,
    "q271_skew_diag" -> q271,
    "q267_friedman_test" -> q267,
    "q269_rate_ratio" -> q269,
    "q259_holt_winters" -> q259,
    "q260_ab_power" -> q260,
    "q261_target_encoding" -> q261,
    "q255_rolling_median" -> q255,
    "q256_new_entity_rate" -> q256,
    "q243_kruskal_wallis" -> q243,
    "q244_jarque_bera" -> q244,
    "q245_fd_check" -> q245,
    "q246_key_profile" -> q246,
    "q247_cross_corr" -> q247,
    "q248_transition_entropy" -> q248,
    "q231_kendall_tau" -> q231,
    "q232_anova_f" -> q232,
    "q238_seasonal_index" -> q238,
    "q230_srm_check" -> q230,
    "q227_burstiness" -> q227,
    "q228_conversion_lag" -> q228,
    "q222_cramers_v" -> q222,
    "q224_lorenz_deciles" -> q224,
    "q210_spearman_corr" -> q210,
    "q211_mann_whitney" -> q211,
    "q212_acf_weekly" -> q212,
    "q213_theilsen_trend" -> q213,
    "q214_stickiness" -> q214,
    "q215_interevent_gaps" -> q215,
    "q216_burst_screen" -> q216,
    "q220_activity_histogram" -> q220,
    "q207_welch_ttest" -> q207,
    "q208_mase_backtest" -> q208,
    "q205_hhi_concentration" -> q205,
    "q206_bootstrap_ci" -> q206,
    "q202_psi_drift" -> q202,
    "q203_benford_audit" -> q203,
    "q198_survival_km" -> q198,
    "q200_holt_trend" -> q200,
    "q181_growth_accounting" -> q181,
    "q171_stl_decompose" -> q171,
    "q174_discount_elasticity" -> q174,
    "q175_user_features" -> q175,
    "q168_user_entropy" -> q168,
    "q38_window_distribution" -> q38,
    "q57_edit_distance" -> q57,
    "q58_regression_aggs" -> q58,
    "q112_table_profile" -> q112,
    "q116_anomaly_zscore" -> q116,
    "q142_seasonal_anomaly" -> q142,
    "q117_gap_fill_hourly" -> q117,
    "q118_ewma_daily_revenue" -> q118,
    "q119_winsorized_stats" -> q119,
    "q120_ref_integrity" -> q120,
    "q121_rolling_active_users" -> q121,
    "q122_mad_outliers" -> q122,
    "q123_chisq_assoc" -> q123,
    "q124_mom_growth" -> q124,
    "q140_ab_test" -> q140,
    "q141_cuped" -> q141,
    "q145_ks_drift" -> q145,
    "q148_pareto" -> q148,
    "q152_skyline" -> q152,
    "q156_cusum_changepoint" -> q156)

  /** DuckDB twins of the [[graft.api.Graft.holtWinters]] per-step pinned
    * state updates (α=0.5, β=0.3, γ=0.4) — the pinned new-level splices
    * into the trend and seasonal updates exactly as on the Spark side. */
  private val hwNl =
    "floor((0.5e0 * (x[1] - acc[3]) + (1e0 - 0.5e0) * (acc[1] + acc[2])) * 1e10 + 0.5e0) / 1e10"
  private val hwNb =
    s"floor((0.3e0 * (($hwNl) - acc[1]) + (1e0 - 0.3e0) * acc[2]) * 1e10 + 0.5e0) / 1e10"
  private val hwNs =
    s"floor((0.4e0 * (x[1] - ($hwNl)) + (1e0 - 0.4e0) * acc[3]) * 1e10 + 0.5e0) / 1e10"

  val oracle: Map[String, String] = Map(
    "q278_hourly_heatmap" ->
      s"""WITH cells AS (SELECT
         |    ((epoch_us(ts) // 86400000000) + 4) % 7 AS dow,
         |    (epoch_us(ts) % 86400000000) // 3600000000 AS hour,
         |    CAST(count(*) AS BIGINT) AS n_events
         |  FROM events GROUP BY 1, 2),
         |tot AS (SELECT CAST(sum(n_events) AS BIGINT) AS tot FROM cells)
         |SELECT dow, hour, n_events,
         |  ${sr5("CAST(n_events AS DOUBLE) / CAST(tot AS DOUBLE)")} AS share
         |FROM cells, tot ORDER BY dow, hour""".stripMargin,
    "q274_covariate_balance" ->
      s"""WITH base AS (SELECT user_id, event_type, value,
         |    (epoch_us(ts) - 1704067200000000) // 86400000000 AS day
         |  FROM events),
         |cov AS (SELECT user_id,
         |    CAST(count(*) AS DOUBLE) AS n_events,
         |    ${sr2("sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0e0 END)")} AS spend,
         |    CAST(count(DISTINCT event_type) AS DOUBLE) AS n_types,
         |    CASE WHEN ('0x' || substr(sha256(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 2 = 0
         |         THEN 'A' ELSE 'B' END AS arm
         |  FROM base WHERE day < 15 GROUP BY user_id),
         |lng AS (SELECT arm, 'n_events' AS covariate, n_events AS x FROM cov
         |  UNION ALL SELECT arm, 'purchase_spend', spend FROM cov
         |  UNION ALL SELECT arm, 'n_types', n_types FROM cov),
         |per AS (SELECT covariate, arm, CAST(count(*) AS BIGINT) AS n,
         |    avg(x) AS m, var_samp(x) AS v FROM lng GROUP BY 1, 2),
         |j AS (SELECT a.covariate, a.n AS n_a, b.n AS n_b, a.m AS m_a,
         |    b.m AS m_b,
         |    (a.m - b.m) / (CASE WHEN (a.v + b.v) / 2e0 <= 0e0 THEN NULL
         |      ELSE sqrt((a.v + b.v) / 2e0) END) AS smd
         |  FROM (SELECT * FROM per WHERE arm = 'A') a
         |  JOIN (SELECT * FROM per WHERE arm = 'B') b ON a.covariate = b.covariate)
         |SELECT covariate, n_a, n_b, ${sr4("m_a")} AS mean_a,
         |  ${sr4("m_b")} AS mean_b, ${sr4("smd")} AS smd,
         |  CASE WHEN smd IS NULL THEN ${sr4("m_a")} = ${sr4("m_b")}
         |       ELSE abs(${sr4("smd")}) < 0.1 END AS balanced
         |FROM j ORDER BY covariate""".stripMargin,
    "q275_retention_halflife" ->
      s"""WITH ev AS (SELECT user_id, date_trunc('week', ts) AS wk FROM events),
         |cohort AS (SELECT user_id, min(wk) AS cw FROM ev GROUP BY 1),
         |act AS (SELECT DISTINCT e.user_id, c.cw,
         |    date_diff('day', c.cw, e.wk) // 7 AS k
         |  FROM ev e JOIN cohort c ON e.user_id = c.user_id),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_users FROM cohort),
         |rates AS (SELECT k, CAST(count(*) AS BIGINT) AS n_active,
         |    ${sqlRnd("CAST(count(*) AS DOUBLE) / CAST((SELECT n_users FROM tot) AS DOUBLE)", 6)} AS rate
         |  FROM act WHERE k BETWEEN 1 AND 4 GROUP BY 1),
         |pos AS (SELECT * FROM rates WHERE rate > 0e0),
         |fit AS (SELECT CAST(count(*) AS BIGINT) AS n_points,
         |    (sum(CAST(k AS DOUBLE) * ln(rate)) -
         |      count(*) * avg(CAST(k AS DOUBLE)) * avg(ln(rate))) /
         |    nullif(sum(CAST(k AS DOUBLE) * k) -
         |      count(*) * avg(CAST(k AS DOUBLE)) * avg(CAST(k AS DOUBLE)), 0e0) AS b
         |  FROM pos)
         |SELECT n_points, ${sr4("b")} AS decay_slope,
         |  ${sr2("-ln(2e0) / nullif(b, 0e0)")} AS half_life_weeks
         |FROM fit""".stripMargin,
    "q276_overdispersion" ->
      s"""WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS c
         |  FROM events GROUP BY 1),
         |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
         |    avg(CAST(c AS DOUBLE)) AS m, var_samp(CAST(c AS DOUBLE)) AS v
         |  FROM c)
         |SELECT n_users, ${sr2("m")} AS mean_events, ${sr2("v")} AS var_events,
         |  ${sr4("v / nullif(m, 0e0)")} AS dispersion_index,
         |  ${sr2("v / nullif(m, 0e0) * CAST(n_users - 1 AS DOUBLE)")} AS chi2
         |FROM agg""".stripMargin,
    "q272_sequential_probe" ->
      s"""WITH ev AS (SELECT user_id, event_type,
         |    (epoch_us(ts) - 1704067200000000) // 86400000000 AS day,
         |    CASE WHEN ('0x' || substr(sha256(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 2 = 0
         |         THEN 'A' ELSE 'B' END AS arm
         |  FROM events),
         |lk AS (SELECT *, least(day // 6 + 1, 5) AS look FROM ev WHERE day < 30),
         |per AS (SELECT look, arm,
         |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n,
         |    CAST(count(DISTINCT (user_id, day)) AS BIGINT) AS e
         |  FROM lk GROUP BY 1, 2),
         |cum AS (SELECT look, arm,
         |    CAST(sum(n) OVER (PARTITION BY arm ORDER BY look
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cn,
         |    CAST(sum(e) OVER (PARTITION BY arm ORDER BY look
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ce
         |  FROM per),
         |j AS (SELECT a.look, a.cn AS n_a, a.ce AS e_a, b.cn AS n_b, b.ce AS e_b,
         |    CAST(a.ce AS DOUBLE) / CAST(a.ce + b.ce AS DOUBLE) AS p,
         |    CAST(a.cn + b.cn AS DOUBLE) AS nn
         |  FROM (SELECT * FROM cum WHERE arm = 'A') a
         |  JOIN (SELECT * FROM cum WHERE arm = 'B') b ON a.look = b.look),
         |z AS (SELECT look, n_a, e_a, n_b, e_b,
         |    ${sr4("(CAST(n_a AS DOUBLE) - nn * p) / nullif(sqrt(nn * p * (1e0 - p)), 0e0)")} AS z,
         |    ${sr4("2.04e0 * sqrt(5e0 / CAST(look AS DOUBLE))")} AS bound
         |  FROM j)
         |SELECT look, n_a, e_a, n_b, e_b, z, bound, abs(z) > bound AS crossed
         |FROM z ORDER BY look""".stripMargin,
    "q273_uplift_deciles" ->
      s"""WITH base AS (SELECT user_id, event_type,
         |    (epoch_us(ts) - 1704067200000000) // 86400000000 AS day
         |  FROM events),
         |score AS (SELECT user_id, CAST(count(*) AS BIGINT) AS sc
         |  FROM base WHERE day < 15 GROUP BY 1),
         |conv AS (SELECT user_id, 1 AS cv FROM base
         |  WHERE event_type = 'purchase' GROUP BY 1 HAVING count(*) >= 14),
         |scored AS (SELECT sc,
         |    CASE WHEN ('0x' || substr(sha256(CAST(s.user_id AS VARCHAR)), 1, 8))::BIGINT % 2 = 0
         |         THEN 'A' ELSE 'B' END AS arm,
         |    coalesce(cv, 0) AS cv
         |  FROM score s LEFT JOIN conv USING (user_id)),
         |sup AS (SELECT sc, CAST(count(*) AS BIGINT) AS t,
         |    CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS ta,
         |    CAST(sum(CASE WHEN arm = 'A' THEN cv ELSE 0 END) AS BIGINT) AS ca,
         |    CAST(sum(CASE WHEN arm = 'B' THEN cv ELSE 0 END) AS BIGINT) AS cb
         |  FROM scored GROUP BY 1),
         |tot AS (SELECT CAST(sum(t) AS BIGINT) AS ntot FROM sup),
         |cum AS (SELECT sc, t, ta, ca, cb,
         |    CAST(sum(t) OVER (ORDER BY sc ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tc
         |  FROM sup),
         |binned AS (SELECT CAST(((ntot - tc + t) * 10 + ntot - 1) // ntot AS BIGINT) AS bin,
         |    CAST(sum(ta) AS BIGINT) AS n_a, CAST(sum(t - ta) AS BIGINT) AS n_b,
         |    CAST(sum(ca) AS BIGINT) AS conv_a, CAST(sum(cb) AS BIGINT) AS conv_b
         |  FROM cum CROSS JOIN tot GROUP BY 1),
         |c2 AS (SELECT bin, n_a, n_b, conv_a, conv_b,
         |    sum(CAST(conv_a AS DOUBLE) - CAST(conv_b AS DOUBLE) *
         |        CAST(n_a AS DOUBLE) / nullif(CAST(n_b AS DOUBLE), 0e0))
         |      OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum_inc
         |  FROM binned)
         |SELECT bin, n_a, n_b, conv_a, conv_b,
         |  ${sr4("CAST(conv_a AS DOUBLE) / nullif(CAST(n_a AS DOUBLE), 0e0) - CAST(conv_b AS DOUBLE) / nullif(CAST(n_b AS DOUBLE), 0e0)")} AS uplift,
         |  ${sr4("cum_inc")} AS cum_incremental
         |FROM c2 ORDER BY bin""".stripMargin,
    "q271_skew_diag" ->
      s"""WITH u AS (
         |  SELECT 'lineitem.l_orderkey' AS join_key,
         |      CAST(count(*) AS BIGINT) AS n_keys, CAST(sum(c) AS BIGINT) AS n_rows,
         |      CAST(max(c) AS BIGINT) AS max_rows,
         |      quantile_cont(CAST(c AS DOUBLE), 0.5) AS med,
         |      quantile_cont(CAST(c AS DOUBLE), 0.99) AS p99
         |    FROM (SELECT count(*) AS c FROM lineitem GROUP BY l_orderkey)
         |  UNION ALL
         |  SELECT 'lineitem.l_partkey', CAST(count(*) AS BIGINT),
         |      CAST(sum(c) AS BIGINT), CAST(max(c) AS BIGINT),
         |      quantile_cont(CAST(c AS DOUBLE), 0.5),
         |      quantile_cont(CAST(c AS DOUBLE), 0.99)
         |    FROM (SELECT count(*) AS c FROM lineitem GROUP BY l_partkey)
         |  UNION ALL
         |  SELECT 'orders.o_custkey', CAST(count(*) AS BIGINT),
         |      CAST(sum(c) AS BIGINT), CAST(max(c) AS BIGINT),
         |      quantile_cont(CAST(c AS DOUBLE), 0.5),
         |      quantile_cont(CAST(c AS DOUBLE), 0.99)
         |    FROM (SELECT count(*) AS c FROM orders GROUP BY o_custkey)
         |  UNION ALL
         |  SELECT 'events.user_id', CAST(count(*) AS BIGINT),
         |      CAST(sum(c) AS BIGINT), CAST(max(c) AS BIGINT),
         |      quantile_cont(CAST(c AS DOUBLE), 0.5),
         |      quantile_cont(CAST(c AS DOUBLE), 0.99)
         |    FROM (SELECT count(*) AS c FROM events GROUP BY user_id))
         |SELECT join_key, n_keys, n_rows, max_rows,
         |  ${sr2("med")} AS p50_rows, ${sr2("p99")} AS p99_rows,
         |  ${sr4("CAST(max_rows AS DOUBLE) * CAST(n_keys AS DOUBLE) / CAST(n_rows AS DOUBLE)")} AS skew_factor
         |FROM u ORDER BY join_key""".stripMargin,
    "q267_friedman_test" ->
      s"""WITH cell AS (SELECT year(l_shipdate) * 12 + month(l_shipdate) AS blk,
         |    l_returnflag AS g,
         |    ${sr2("sum(l_extendedprice * (1.0e0 - l_discount))")} AS v
         |  FROM lineitem GROUP BY 1, 2),
         |full_b AS (SELECT blk FROM cell GROUP BY 1 HAVING count(*) = 3),
         |c2 AS (SELECT cell.* FROM cell JOIN full_b USING (blk)),
         |ranked AS (SELECT a.blk, a.g,
         |    CAST(sum(CASE WHEN b.v < a.v THEN 1 ELSE 0 END) AS DOUBLE) +
         |    CAST(sum(CASE WHEN b.v = a.v THEN 1 ELSE 0 END) + 1 AS DOUBLE) / 2e0 AS r
         |  FROM c2 a JOIN c2 b ON a.blk = b.blk GROUP BY 1, 2),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM full_b),
         |per AS (SELECT g, sum(r) / CAST((SELECT n FROM n) AS DOUBLE) - 2e0 AS dv
         |  FROM ranked GROUP BY 1),
         |ss AS (SELECT sum((r - 2e0) * (r - 2e0)) AS sst FROM ranked),
         |agg AS (SELECT (SELECT n FROM n) AS n_blocks, CAST(3 AS BIGINT) AS k,
         |    sum(dv * dv) AS ssj FROM per)
         |SELECT n_blocks, k,
         |  ${sr4("CAST(n_blocks AS DOUBLE) * n_blocks * (k - 1) * ssj / nullif((SELECT sst FROM ss), 0e0)")} AS chi2_f
         |FROM agg""".stripMargin,
    "q269_rate_ratio" ->
      s"""WITH ev AS (SELECT user_id, event_type,
         |    (epoch_us(ts) - 1704067200000000) // 86400000000 AS day,
         |    CASE WHEN ('0x' || substr(sha256(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 2 = 0
         |         THEN 'A' ELSE 'B' END AS arm
         |  FROM events),
         |counts AS (SELECT arm, CAST(count(*) AS BIGINT) AS n FROM ev
         |  WHERE event_type = 'purchase' GROUP BY 1),
         |expo AS (SELECT arm, CAST(count(*) AS BIGINT) AS e FROM (
         |    SELECT DISTINCT arm, user_id, day FROM ev) GROUP BY 1),
         |j AS (SELECT counts.arm, n, e FROM counts JOIN expo USING (arm)),
         |f AS (SELECT a.n AS n_a, a.e AS e_a, b.n AS n_b, b.e AS e_b,
         |    CAST(a.e AS DOUBLE) / CAST(a.e + b.e AS DOUBLE) AS p,
         |    CAST(a.n + b.n AS DOUBLE) AS nn
         |  FROM (SELECT * FROM j WHERE arm = 'A') a,
         |       (SELECT * FROM j WHERE arm = 'B') b)
         |SELECT n_a, e_a, n_b, e_b,
         |  ${sr4("(CAST(n_a AS DOUBLE) / CAST(e_a AS DOUBLE)) / (CAST(n_b AS DOUBLE) / CAST(e_b AS DOUBLE))")} AS rate_ratio,
         |  ${sr4("(CAST(n_a AS DOUBLE) - nn * p) / nullif(sqrt(nn * p * (1e0 - p)), 0e0)")} AS z
         |FROM f""".stripMargin,
    "q259_holt_winters" ->
      s"""WITH daily AS (SELECT l_returnflag, l_shipdate AS day,
         |    ${sr2("sum(l_extendedprice * (1e0 - l_discount))")} AS rev
         |  FROM lineitem GROUP BY 1, 2),
         |ser AS (SELECT l_returnflag, list(rev ORDER BY day) AS xs
         |        FROM daily GROUP BY 1),
         |st AS (SELECT l_returnflag, CAST(len(xs) AS BIGINT) AS n_points,
         |  list_reduce(
         |    list_transform(xs, y -> [y, 0e0, 0e0, 0e0, 0e0, 0e0, 0e0, 0e0, 0e0]),
         |    (acc, x) -> [($hwNl), ($hwNb)] || acc[4:9] || [($hwNs)]) AS st
         |  FROM ser)
         |SELECT l_returnflag, n_points, st[1] AS level, st[2] AS trend,
         |  st[3] AS s_next, ${sr2("st[1] + st[2] + st[3]")} AS forecast
         |FROM st ORDER BY l_returnflag""".stripMargin,
    "q260_ab_power" ->
      s"""WITH spend AS (SELECT user_id, ${sr2("sum(value)")} AS y
         |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
         |arms AS (SELECT y,
         |    CASE WHEN ('0x' || substr(sha256(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 2 = 0
         |         THEN 'A' ELSE 'B' END AS arm
         |  FROM spend),
         |per AS (SELECT arm, CAST(count(*) AS BIGINT) AS n, avg(y) AS m,
         |    var_samp(y) AS v FROM arms GROUP BY 1),
         |j AS (SELECT a.n AS n_a, b.n AS n_b, a.m AS m_a, b.m AS m_b,
         |    sqrt(a.v / a.n + b.v / b.n) AS se
         |  FROM (SELECT * FROM per WHERE arm = 'A') a,
         |       (SELECT * FROM per WHERE arm = 'B') b)
         |SELECT n_a, n_b, ${sr2("m_a")} AS mean_a, ${sr2("m_b")} AS mean_b,
         |  ${sr4("se")} AS se, ${sr4("2.801585e0 * se")} AS mde_abs,
         |  ${sr4("2.801585e0 * se / nullif(m_a, 0e0)")} AS mde_rel
         |FROM j""".stripMargin,
    "q261_target_encoding" ->
      s"""WITH spend AS (SELECT o_custkey, ${sr2("sum(o_totalprice)")} AS y
         |  FROM orders GROUP BY 1),
         |seg AS (SELECT c_mktsegment, coalesce(spend.y, 0e0) AS y
         |  FROM customer LEFT JOIN spend ON c_custkey = o_custkey),
         |per AS (SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
         |    sum(y) AS sy FROM seg GROUP BY 1),
         |gl AS (SELECT sum(sy) / CAST(sum(n) AS DOUBLE) AS g FROM per)
         |SELECT c_mktsegment, n, ${sr2("sy / CAST(n AS DOUBLE)")} AS raw_mean,
         |  ${sr2("(sy + 20e0 * g) / CAST(n + 20 AS DOUBLE)")} AS encoded,
         |  ${sr4("((sy + 20e0 * g) / CAST(n + 20 AS DOUBLE)) / g")} AS lift
         |FROM per, gl ORDER BY c_mktsegment""".stripMargin,
    "q255_rolling_median" ->
      s"""WITH daily AS (SELECT l_shipdate AS day,
         |    ${sr2("sum(l_extendedprice * (1.0e0 - l_discount))")} AS rev
         |  FROM lineitem GROUP BY 1)
         |SELECT day, rev, count(*) OVER w AS n_win,
         |  ${sr2("quantile_cont(rev, 0.5) OVER w")} AS med7,
         |  ${sr2("(quantile_cont(rev, 0.75) OVER w) - (quantile_cont(rev, 0.25) OVER w)")} AS iqr7
         |FROM daily
         |WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
         |ORDER BY day""".stripMargin,
    "q256_new_entity_rate" ->
      s"""WITH e AS (SELECT (epoch_us(ts) - 1704067200000000) // 86400000000 AS day,
         |    user_id, TRY_CAST(json_extract(props, '$$.k') AS BIGINT) AS item
         |  FROM events),
         |nu AS (SELECT day, CAST(count(*) AS BIGINT) AS new_users FROM (
         |    SELECT user_id, min(day) AS day FROM e GROUP BY 1) GROUP BY 1),
         |ni AS (SELECT day, CAST(count(*) AS BIGINT) AS new_items FROM (
         |    SELECT item, min(day) AS day FROM e GROUP BY 1) GROUP BY 1),
         |days AS (SELECT DISTINCT day FROM e),
         |j AS (SELECT days.day, coalesce(nu.new_users, 0) AS new_users,
         |    coalesce(ni.new_items, 0) AS new_items
         |  FROM days LEFT JOIN nu USING (day) LEFT JOIN ni USING (day))
         |SELECT day, new_users, new_items,
         |  CAST(sum(new_users) OVER w AS BIGINT) AS cum_users,
         |  CAST(sum(new_items) OVER w AS BIGINT) AS cum_items
         |FROM j
         |WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |ORDER BY day""".stripMargin,
    "q243_kruskal_wallis" ->
      s"""WITH base AS (SELECT l_returnflag AS g,
         |    ${sr2("l_extendedprice * (1.0e0 - l_discount)")} AS v
         |  FROM lineitem),
         |cells AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c
         |  FROM base GROUP BY 1, 2),
         |sup AS (SELECT v, CAST(sum(c) AS BIGINT) AS t FROM cells GROUP BY 1),
         |rk AS (SELECT v, t, sum(t) OVER (ORDER BY v
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tc FROM sup),
         |fr AS (SELECT v, t,
         |    CAST(tc - t AS DOUBLE) + CAST(t + 1 AS DOUBLE) / 2e0 AS fr FROM rk),
         |per AS (SELECT g, CAST(sum(c) AS BIGINT) AS ng, sum(c * fr) AS rg
         |  FROM cells JOIN fr USING (v) GROUP BY 1),
         |ties AS (SELECT sum(CAST(t AS DOUBLE) * t * t - t) AS tie3,
         |    CAST(sum(t) AS BIGINT) AS nn FROM sup),
         |dev AS (SELECT g, CAST(ng AS DOUBLE) * dv * dv AS dev2 FROM (
         |    SELECT g, ng, rg / CAST(ng AS DOUBLE) -
         |      CAST(nn + 1 AS DOUBLE) / 2e0 AS dv FROM per, ties)),
         |agg AS (SELECT CAST(count(*) AS BIGINT) AS k,
         |    (SELECT nn FROM ties) AS n, (SELECT tie3 FROM ties) AS tie3,
         |    sum(dev2) AS sdev FROM dev),
         |fin AS (SELECT k, n,
         |    12e0 / (CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE)) * sdev AS h0,
         |    1e0 - tie3 / nullif(CAST(n AS DOUBLE) * n * n - n, 0e0) AS cc FROM agg)
         |SELECT k, n, ${sr4("h0")} AS h, ${sr4("h0 / nullif(cc, 0e0)")} AS h_adj,
         |  ${sr5("h0 / nullif(cc, 0e0) / CAST(n - 1 AS DOUBLE)")} AS eps_sq
         |FROM fin""".stripMargin,
    "q244_jarque_bera" ->
      s"""WITH sup AS (SELECT l_returnflag AS rf, l_quantity AS x,
         |    CAST(count(*) AS BIGINT) AS c FROM lineitem GROUP BY 1, 2),
         |mu AS (SELECT rf, CAST(sum(c) AS BIGINT) AS n,
         |    sum(c * x) / CAST(sum(c) AS DOUBLE) AS mu FROM sup GROUP BY 1),
         |m AS (SELECT rf, max(n) AS n,
         |    sum(c * dx * dx) / CAST(max(n) AS DOUBLE) AS m2,
         |    sum(c * dx * dx * dx) / CAST(max(n) AS DOUBLE) AS m3,
         |    sum(c * dx * dx * dx * dx) / CAST(max(n) AS DOUBLE) AS m4
         |  FROM (SELECT s.rf, s.c, s.x - mu.mu AS dx, mu.n
         |        FROM sup s JOIN mu USING (rf))
         |  GROUP BY 1),
         |f AS (SELECT rf, n, m3 / nullif(m2 * sqrt(m2), 0e0) AS sk,
         |    m4 / nullif(m2 * m2, 0e0) - 3e0 AS ku FROM m)
         |SELECT rf, n, ${sr4("sk")} AS skewness, ${sr4("ku")} AS kurtosis_excess,
         |  ${sr2("(CAST(n AS DOUBLE) / 6e0) * (sk * sk + ku * ku / 4e0)")} AS jb
         |FROM f ORDER BY rf""".stripMargin,
    "q245_fd_check" ->
      s"""WITH u AS (
         |  SELECT 'nation: n_nationkey -> n_regionkey' AS fd,
         |      CAST(count(*) AS BIGINT) AS n_det,
         |      CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
         |      CAST(max(nd) AS BIGINT) AS max_dep
         |    FROM (SELECT count(DISTINCT n_regionkey) AS nd FROM nation GROUP BY n_nationkey)
         |  UNION ALL
         |  SELECT 'customer: c_nationkey -> c_mktsegment',
         |      CAST(count(*) AS BIGINT),
         |      CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT),
         |      CAST(max(nd) AS BIGINT)
         |    FROM (SELECT count(DISTINCT c_mktsegment) AS nd FROM customer GROUP BY c_nationkey)
         |  UNION ALL
         |  SELECT 'orders: o_custkey -> o_orderpriority',
         |      CAST(count(*) AS BIGINT),
         |      CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT),
         |      CAST(max(nd) AS BIGINT)
         |    FROM (SELECT count(DISTINCT o_orderpriority) AS nd FROM orders GROUP BY o_custkey)
         |  UNION ALL
         |  SELECT 'lineitem: l_orderkey -> l_shipdate',
         |      CAST(count(*) AS BIGINT),
         |      CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT),
         |      CAST(max(nd) AS BIGINT)
         |    FROM (SELECT count(DISTINCT l_shipdate) AS nd FROM lineitem GROUP BY l_orderkey)
         |  UNION ALL
         |  SELECT 'lineitem: l_partkey -> l_extendedprice',
         |      CAST(count(*) AS BIGINT),
         |      CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT),
         |      CAST(max(nd) AS BIGINT)
         |    FROM (SELECT count(DISTINCT l_extendedprice) AS nd FROM lineitem GROUP BY l_partkey))
         |SELECT fd, n_det, n_violating,
         |  ${sr4("CAST(n_violating AS DOUBLE) / CAST(n_det AS DOUBLE)")} AS violation_rate,
         |  max_dep
         |FROM u ORDER BY fd""".stripMargin,
    "q246_key_profile" ->
      s"""WITH u AS (
         |  SELECT 'orders(o_orderkey)' AS key_cols,
         |      CAST(sum(c) AS BIGINT) AS n_rows,
         |      CAST(count(*) AS BIGINT) AS n_distinct,
         |      CAST(sum(c - 1) AS BIGINT) AS n_dup_rows, max(c) = 1 AS is_key
         |    FROM (SELECT count(*) AS c FROM orders GROUP BY o_orderkey)
         |  UNION ALL
         |  SELECT 'lineitem(l_orderkey)', CAST(sum(c) AS BIGINT),
         |      CAST(count(*) AS BIGINT), CAST(sum(c - 1) AS BIGINT), max(c) = 1
         |    FROM (SELECT count(*) AS c FROM lineitem GROUP BY l_orderkey)
         |  UNION ALL
         |  SELECT 'lineitem(l_orderkey,l_linenumber)', CAST(sum(c) AS BIGINT),
         |      CAST(count(*) AS BIGINT), CAST(sum(c - 1) AS BIGINT), max(c) = 1
         |    FROM (SELECT count(*) AS c FROM lineitem
         |          GROUP BY l_orderkey, l_linenumber)
         |  UNION ALL
         |  SELECT 'lineitem(l_orderkey,l_partkey,l_suppkey)', CAST(sum(c) AS BIGINT),
         |      CAST(count(*) AS BIGINT), CAST(sum(c - 1) AS BIGINT), max(c) = 1
         |    FROM (SELECT count(*) AS c FROM lineitem
         |          GROUP BY l_orderkey, l_partkey, l_suppkey)
         |  UNION ALL
         |  SELECT 'events(event_id)', CAST(sum(c) AS BIGINT),
         |      CAST(count(*) AS BIGINT), CAST(sum(c - 1) AS BIGINT), max(c) = 1
         |    FROM (SELECT count(*) AS c FROM events GROUP BY event_id)
         |  UNION ALL
         |  SELECT 'documents(doc_id)', CAST(sum(c) AS BIGINT),
         |      CAST(count(*) AS BIGINT), CAST(sum(c - 1) AS BIGINT), max(c) = 1
         |    FROM (SELECT count(*) AS c FROM documents GROUP BY doc_id))
         |SELECT * FROM u ORDER BY key_cols""".stripMargin,
    "q247_cross_corr" ->
      s"""WITH rev AS (SELECT l_shipdate AS day,
         |    ${sr2("sum(l_extendedprice * (1.0e0 - l_discount))")} AS rev
         |  FROM lineitem GROUP BY 1),
         |ord AS (SELECT o_orderdate AS day, CAST(count(*) AS DOUBLE) AS n_ord
         |  FROM orders GROUP BY 1),
         |ser AS (SELECT rev.day, rev.rev, ord.n_ord FROM rev JOIN ord USING (day)),
         |l AS (SELECT rev,
         |    lead(n_ord, 7) OVER w AS f0, lead(n_ord, 6) OVER w AS f1,
         |    lead(n_ord, 5) OVER w AS f2, lead(n_ord, 4) OVER w AS f3,
         |    lead(n_ord, 3) OVER w AS f4, lead(n_ord, 2) OVER w AS f5,
         |    lead(n_ord, 1) OVER w AS f6, n_ord AS f7,
         |    lag(n_ord, 1) OVER w AS f8, lag(n_ord, 2) OVER w AS f9,
         |    lag(n_ord, 3) OVER w AS f10, lag(n_ord, 4) OVER w AS f11,
         |    lag(n_ord, 5) OVER w AS f12, lag(n_ord, 6) OVER w AS f13,
         |    lag(n_ord, 7) OVER w AS f14
         |  FROM ser WINDOW w AS (ORDER BY day)),
         |st AS (SELECT t.k AS lag_k, l.rev,
         |    CASE t.k WHEN -7 THEN f0 WHEN -6 THEN f1 WHEN -5 THEN f2
         |      WHEN -4 THEN f3 WHEN -3 THEN f4 WHEN -2 THEN f5 WHEN -1 THEN f6
         |      WHEN 0 THEN f7 WHEN 1 THEN f8 WHEN 2 THEN f9 WHEN 3 THEN f10
         |      WHEN 4 THEN f11 WHEN 5 THEN f12 WHEN 6 THEN f13 ELSE f14
         |    END AS f
         |  FROM l CROSS JOIN generate_series(-7, 7) t(k))
         |SELECT lag_k, count(f) AS n_pairs, ${sr4("corr(rev, f)")} AS xcorr
         |FROM st GROUP BY 1 ORDER BY 1""".stripMargin,
    "q248_transition_entropy" ->
      s"""WITH l AS (SELECT event_type AS to_type, lag(event_type) OVER (
         |    PARTITION BY user_id ORDER BY ts, event_id) AS from_type FROM events),
         |tr AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n FROM l
         |  WHERE from_type IS NOT NULL GROUP BY 1, 2),
         |tot AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from,
         |    CAST(count(*) AS BIGINT) AS n_next_types FROM tr GROUP BY 1),
         |g AS (SELECT CAST(sum(n_from) AS BIGINT) AS nn FROM tot),
         |ent AS (SELECT tr.from_type, max(tot.n_from) AS n_from,
         |    max(tot.n_next_types) AS n_next_types,
         |    ${sr4("-sum((CAST(tr.n AS DOUBLE) / CAST(tot.n_from AS DOUBLE)) * ln(CAST(tr.n AS DOUBLE) / CAST(tot.n_from AS DOUBLE)))")} AS entropy
         |  FROM tr JOIN tot USING (from_type) GROUP BY 1)
         |SELECT from_type, n_from, n_next_types,
         |  ${sr4("CAST(n_from AS DOUBLE) / CAST(nn AS DOUBLE)")} AS p_source,
         |  entropy,
         |  ${sr4("CASE WHEN n_next_types = 1 THEN NULL ELSE entropy / ln(CAST(n_next_types AS DOUBLE)) END")} AS norm_entropy
         |FROM ent, g ORDER BY from_type""".stripMargin,
    "q231_kendall_tau" ->
      s"""WITH cells AS (SELECT l_returnflag AS rf, l_quantity AS x,
         |    l_discount AS y, CAST(count(*) AS BIGINT) AS n
         |  FROM lineitem GROUP BY 1, 2, 3),
         |cd AS (SELECT a.rf,
         |    CAST(sum(CASE WHEN a.y < b.y THEN a.n * b.n ELSE 0 END) AS BIGINT) AS c_conc,
         |    CAST(sum(CASE WHEN a.y > b.y THEN a.n * b.n ELSE 0 END) AS BIGINT) AS d_disc
         |  FROM cells a JOIN cells b ON a.rf = b.rf AND a.x < b.x
         |  GROUP BY 1),
         |xt AS (SELECT rf, CAST(sum(t * (t - 1)) // 2 AS BIGINT) AS n1 FROM (
         |    SELECT rf, x, sum(n) AS t FROM cells GROUP BY 1, 2) GROUP BY 1),
         |yt AS (SELECT rf, CAST(sum(t * (t - 1)) // 2 AS BIGINT) AS n2 FROM (
         |    SELECT rf, y, sum(n) AS t FROM cells GROUP BY 1, 2) GROUP BY 1),
         |tot AS (SELECT rf, CAST(sum(n) AS BIGINT) AS nn,
         |    CAST(sum(n) * (sum(n) - 1) // 2 AS BIGINT) AS n0
         |  FROM cells GROUP BY 1)
         |SELECT cd.rf, tot.nn AS n, cd.c_conc, cd.d_disc,
         |  ${sr4("CAST(cd.c_conc - cd.d_disc AS DOUBLE) / nullif(sqrt(CAST(tot.n0 - xt.n1 AS DOUBLE)) * sqrt(CAST(tot.n0 - yt.n2 AS DOUBLE)), 0e0)")} AS tau_b
         |FROM cd JOIN xt USING (rf) JOIN yt USING (rf) JOIN tot USING (rf)
         |ORDER BY rf""".stripMargin,
    "q232_anova_f" ->
      s"""WITH y AS (SELECT l_returnflag AS g,
         |    ${sr2("l_extendedprice * (1e0 - l_discount)")} AS y
         |  FROM lineitem),
         |per AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
         |    sum(y) AS sy, sum(y * y) AS ssy
         |  FROM y GROUP BY 1),
         |agg AS (SELECT CAST(count(*) AS BIGINT) AS k,
         |    CAST(sum(n) AS BIGINT) AS nn, sum(sy) AS s, sum(ssy) AS ss,
         |    sum(sy * sy / CAST(n AS DOUBLE)) AS sb
         |  FROM per)
         |SELECT k, nn AS n,
         |  ${sr2("(sb - s * s / CAST(nn AS DOUBLE)) / nullif(CAST(k - 1 AS DOUBLE), 0e0)")} AS ms_between,
         |  ${sr2("(ss - sb) / nullif(CAST(nn - k AS DOUBLE), 0e0)")} AS ms_within,
         |  ${sr4("((sb - s * s / CAST(nn AS DOUBLE)) / nullif(CAST(k - 1 AS DOUBLE), 0e0)) / nullif((ss - sb) / nullif(CAST(nn - k AS DOUBLE), 0e0), 0e0)")} AS f,
         |  ${sr5("(sb - s * s / CAST(nn AS DOUBLE)) / nullif((sb - s * s / CAST(nn AS DOUBLE)) + (ss - sb), 0e0)")} AS eta_sq
         |FROM agg""".stripMargin,
    "q238_seasonal_index" ->
      s"""WITH daily AS (SELECT l_shipdate AS day,
         |    ${sr2("sum(l_extendedprice * (1e0 - l_discount))")} AS rev
         |  FROM lineitem GROUP BY 1),
         |dw AS (SELECT CAST(((epoch_us(day) // 86400000000) + 4) % 7 AS BIGINT)
         |    AS dow, rev FROM daily),
         |o AS (SELECT avg(rev) AS grand FROM dw)
         |SELECT dow, count(*) AS n_days,
         |  ${sr2("avg(rev)")} AS avg_rev,
         |  ${sr4("avg(rev) / max(grand)")} AS seasonal_index
         |FROM dw CROSS JOIN o GROUP BY dow ORDER BY dow""".stripMargin,
    "q230_srm_check" ->
      s"""WITH u AS (SELECT DISTINCT user_id FROM events),
         |lab AS (SELECT
         |    ('0x' || substr(sha256(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 2 = 0 AS in_a
         |  FROM u),
         |c AS (SELECT
         |    CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         |    CAST(sum(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS n_b
         |  FROM lab)
         |SELECT n_a, n_b,
         |  ${sr4("(n_a - (n_a + n_b) / 2.0e0) * (n_a - (n_a + n_b) / 2.0e0) / ((n_a + n_b) / 2.0e0) + (n_b - (n_a + n_b) / 2.0e0) * (n_b - (n_a + n_b) / 2.0e0) / ((n_a + n_b) / 2.0e0)")} AS chi2,
         |  ((n_a - (n_a + n_b) / 2.0e0) * (n_a - (n_a + n_b) / 2.0e0) / ((n_a + n_b) / 2.0e0) + (n_b - (n_a + n_b) / 2.0e0) * (n_b - (n_a + n_b) / 2.0e0) / ((n_a + n_b) / 2.0e0)) > 3.841459e0 AS srm
         |FROM c""".stripMargin,
    "q227_burstiness" ->
      s"""WITH g AS (SELECT event_type,
         |    epoch_us(ts) - lag(epoch_us(ts), 1) OVER (
         |      PARTITION BY user_id, event_type ORDER BY ts, event_id)
         |      AS gap_us
         |  FROM events),
         |s2 AS (SELECT event_type,
         |    CAST(gap_us AS DOUBLE) / 1000000.0e0 AS gap_s
         |  FROM g WHERE gap_us IS NOT NULL)
         |SELECT event_type, count(*) AS n_gaps,
         |  ${sr2("avg(gap_s)")} AS mean_gap_s,
         |  ${sr2("stddev_samp(gap_s)")} AS sd_gap_s,
         |  ${sr4("(stddev_samp(gap_s) - avg(gap_s)) / nullif(stddev_samp(gap_s) + avg(gap_s), 0e0)")} AS burstiness
         |FROM s2 GROUP BY 1 ORDER BY 1""".stripMargin,
    "q228_conversion_lag" ->
      s"""WITH e AS (SELECT user_id,
         |    (epoch_us(ts) - 1704067200000000) // 86400000000 AS day,
         |    event_type
         |  FROM events),
         |u AS (SELECT user_id, min(day) AS f,
         |    min(CASE WHEN event_type = 'purchase' THEN day END) AS p
         |  FROM e GROUP BY 1),
         |u2 AS (SELECT f // 7 AS cohort_week,
         |    CASE WHEN p IS NOT NULL THEN CAST(p - f AS DOUBLE) END AS lag_days
         |  FROM u)
         |SELECT cohort_week, count(*) AS n_users,
         |  count(lag_days) AS n_converters,
         |  ${sr4("CAST(count(lag_days) AS DOUBLE) / CAST(count(*) AS DOUBLE)")} AS conv_rate,
         |  ${sr4("quantile_cont(lag_days, 0.5e0)")} AS p50_lag_days,
         |  ${sr4("quantile_cont(lag_days, 0.9e0)")} AS p90_lag_days
         |FROM u2 GROUP BY 1 ORDER BY 1""".stripMargin,
    "q222_cramers_v" ->
      s"""WITH et AS (SELECT event_type,
         |    ((epoch_us(ts) - 1704067200000000) // 86400000000) % 7 AS dow
         |  FROM events),
         |obs AS (SELECT event_type, dow, count(*) AS o FROM et GROUP BY 1, 2),
         |rt AS (SELECT event_type, sum(o) AS rt FROM obs GROUP BY 1),
         |ct AS (SELECT dow, sum(o) AS ct FROM obs GROUP BY 1),
         |tot AS (SELECT sum(o) AS n FROM obs),
         |grid AS (
         |  SELECT rt.event_type, ct.dow, coalesce(obs.o, 0) AS o, tot.n,
         |    (rt.rt * ct.ct / tot.n) AS e
         |  FROM rt CROSS JOIN ct
         |  LEFT JOIN obs ON obs.event_type = rt.event_type
         |    AND obs.dow = ct.dow
         |  CROSS JOIN tot),
         |ag AS (SELECT ${sr4("sum(pow(o - e, 2) / e)")} AS chi2,
         |    count(DISTINCT event_type) AS r, count(DISTINCT dow) AS c,
         |    CAST(max(n) AS BIGINT) AS n
         |  FROM grid)
         |SELECT chi2, r, c, n,
         |  ${sr4("sqrt(chi2 / (n * least(r - 1, c - 1)))")} AS cramers_v
         |FROM ag""".stripMargin,
    "q224_lorenz_deciles" ->
      s"""WITH rev AS (SELECT o_custkey, ${sr2("sum(o_totalprice)")} AS rev
         |  FROM orders GROUP BY 1),
         |g AS (SELECT rev, count(*) AS c, rev * count(*) AS rc
         |  FROM rev GROUP BY 1),
         |cum AS (SELECT c, rc,
         |    sum(c) OVER (ORDER BY rev
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c_cum,
         |    sum(rc) OVER (ORDER BY rev
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rc_cum
         |  FROM g),
         |tot AS (SELECT sum(c) AS nc, sum(rc) AS tr FROM g)
         |SELECT CAST(ceil((CAST(c_cum AS DOUBLE) / CAST(nc AS DOUBLE))
         |    * 10.0e0) AS BIGINT) AS decile,
         |  ${sr4("max(CAST(c_cum AS DOUBLE) / CAST(nc AS DOUBLE))")} AS cum_customers,
         |  ${sr4("max(rc_cum / tr)")} AS cum_revenue
         |FROM cum CROSS JOIN tot GROUP BY 1 ORDER BY 1""".stripMargin,
    "q210_spearman_corr" ->
      s"""WITH base AS (SELECT l_returnflag AS rf, l_quantity AS x,
         |    ${sr2("l_extendedprice * (1.0e0 - l_discount)")} AS y
         |  FROM lineitem),
         |fx AS (SELECT rf, x,
         |    CAST(sum(t) OVER (PARTITION BY rf ORDER BY x
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - t
         |      AS DOUBLE) + CAST(t + 1 AS DOUBLE) / 2.0e0 AS fr_x
         |  FROM (SELECT rf, x, count(*) AS t FROM base GROUP BY 1, 2)),
         |fy AS (SELECT rf, y,
         |    CAST(sum(t) OVER (PARTITION BY rf ORDER BY y
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - t
         |      AS DOUBLE) + CAST(t + 1 AS DOUBLE) / 2.0e0 AS fr_y
         |  FROM (SELECT rf, y, count(*) AS t FROM base GROUP BY 1, 2)),
         |p AS (SELECT rf, x, y, count(*) AS w FROM base GROUP BY 1, 2, 3),
         |j AS (SELECT p.rf, p.w, fx.fr_x, fy.fr_y FROM p
         |  JOIN fx ON p.rf = fx.rf AND p.x = fx.x
         |  JOIN fy ON p.rf = fy.rf AND p.y = fy.y),
         |st AS (SELECT rf, CAST(sum(w) AS DOUBLE) AS n,
         |    sum(w * fr_x) AS sx, sum(w * fr_y) AS sy,
         |    sum(w * fr_x * fr_y) AS sxy, sum(w * fr_x * fr_x) AS sxx,
         |    sum(w * fr_y * fr_y) AS syy FROM j GROUP BY 1)
         |SELECT rf, CAST(n AS BIGINT) AS n,
         |  ${sr4("(n * sxy - sx * sy) / nullif(sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 0e0)")} AS spearman
         |FROM st ORDER BY rf""".stripMargin,
    "q211_mann_whitney" ->
      s"""WITH spend AS (SELECT user_id, ${sr2("sum(value)")} AS y
         |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
         |lab AS (SELECT y,
         |    ('0x' || substr(sha256(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 2 = 0 AS in_a
         |  FROM spend),
         |g AS (SELECT y,
         |    CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         |    count(*) AS t FROM lab GROUP BY 1),
         |r AS (SELECT ca, t,
         |    CAST(sum(t) OVER (ORDER BY y
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - t
         |      AS DOUBLE) + CAST(t + 1 AS DOUBLE) / 2.0e0 AS fr
         |  FROM g),
         |s AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
         |    CAST(sum(t - ca) AS BIGINT) AS n_b,
         |    sum(ca * fr) AS r_a,
         |    sum(CAST(t AS DOUBLE) * t * t - t) AS tie3 FROM r)
         |SELECT n_a, n_b,
         |  ${sr2("r_a - n_a * (n_a + 1) / 2.0e0")} AS u_a,
         |  ${sr4("((r_a - n_a * (n_a + 1) / 2.0e0) - n_a * n_b / 2.0e0) / nullif(sqrt(n_a * n_b / 12.0e0 * ((CAST(n_a + n_b AS DOUBLE) + 1) - tie3 / nullif(CAST(n_a + n_b AS DOUBLE) * (CAST(n_a + n_b AS DOUBLE) - 1), 0e0))), 0e0)")} AS z
         |FROM s""".stripMargin,
    "q212_acf_weekly" ->
      s"""WITH daily AS (SELECT l_shipdate AS day,
         |    ${sr2("sum(l_extendedprice * (1.0e0 - l_discount))")} AS rev
         |  FROM lineitem GROUP BY 1),
         |l AS (SELECT rev,
         |    lag(rev, 1) OVER (ORDER BY day) AS f1,
         |    lag(rev, 2) OVER (ORDER BY day) AS f2,
         |    lag(rev, 3) OVER (ORDER BY day) AS f3,
         |    lag(rev, 4) OVER (ORDER BY day) AS f4,
         |    lag(rev, 5) OVER (ORDER BY day) AS f5,
         |    lag(rev, 6) OVER (ORDER BY day) AS f6,
         |    lag(rev, 7) OVER (ORDER BY day) AS f7
         |  FROM daily),
         |st AS (SELECT t.k AS lag_k, l.rev,
         |    CASE t.k WHEN 1 THEN f1 WHEN 2 THEN f2 WHEN 3 THEN f3
         |      WHEN 4 THEN f4 WHEN 5 THEN f5 WHEN 6 THEN f6 ELSE f7
         |    END AS f
         |  FROM l CROSS JOIN generate_series(1, 7) t(k))
         |SELECT lag_k, count(f) AS n_pairs, ${sr4("corr(rev, f)")} AS acf
         |FROM st GROUP BY 1 ORDER BY 1""".stripMargin,
    "q213_theilsen_trend" ->
      s"""WITH daily AS (SELECT l_shipdate AS day,
         |    ${sr2("sum(l_extendedprice * (1.0e0 - l_discount))")} AS rev
         |  FROM lineitem WHERE year(l_shipdate) = 2000 GROUP BY 1),
         |m AS (SELECT min(day) AS d0 FROM daily),
         |t AS (SELECT CAST(date_diff('day', d0, day) AS DOUBLE) AS t, rev
         |  FROM daily, m),
         |p AS (SELECT (b.rev - a.rev) / (b.t - a.t) AS slope
         |  FROM t a JOIN t b ON a.t < b.t),
         |sl AS (SELECT count(*) AS n_pairs,
         |    quantile_cont(slope, 0.5e0) AS med FROM p)
         |SELECT count(*) AS n_days, max(n_pairs) AS n_pairs,
         |  ${sr4("max(med)")} AS slope,
         |  ${sr4("quantile_cont(rev - med * t, 0.5e0)")} AS intercept
         |FROM t, sl""".stripMargin,
    "q214_stickiness" ->
      s"""WITH e AS (SELECT
         |    (epoch_us(ts) - 1704067200000000) // 86400000000 AS day,
         |    user_id FROM events),
         |ew AS (SELECT day // 7 AS week, day, user_id FROM e),
         |dau AS (SELECT week, day, count(DISTINCT user_id) AS dau
         |  FROM ew GROUP BY 1, 2),
         |byw AS (SELECT week, count(*) AS days_obs,
         |    ${sr2("avg(dau)")} AS avg_dau FROM dau GROUP BY 1),
         |wau AS (SELECT week, count(DISTINCT user_id) AS wau
         |  FROM ew GROUP BY 1)
         |SELECT week, days_obs, wau, avg_dau,
         |  ${sr4("avg_dau / wau")} AS stickiness
         |FROM byw JOIN wau USING (week) ORDER BY week""".stripMargin,
    "q215_interevent_gaps" ->
      s"""WITH g AS (SELECT event_type,
         |    epoch_us(ts) - lag(epoch_us(ts), 1) OVER (
         |      PARTITION BY user_id, event_type ORDER BY ts, event_id)
         |      AS gap_us
         |  FROM events)
         |SELECT event_type, count(*) AS n_gaps,
         |  ${sr4("quantile_cont(CAST(gap_us AS DOUBLE) / 1000000.0e0, 0.5e0)")} AS p50_s,
         |  ${sr4("quantile_cont(CAST(gap_us AS DOUBLE) / 1000000.0e0, 0.9e0)")} AS p90_s
         |FROM g WHERE gap_us IS NOT NULL
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q216_burst_screen" ->
      s"""WITH b AS (SELECT user_id,
         |    count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
         |      RANGE BETWEEN 59999999 PRECEDING AND CURRENT ROW) AS burst
         |  FROM events)
         |SELECT user_id, count(*) AS n_events,
         |  CAST(max(burst) AS BIGINT) AS max_burst
         |FROM b GROUP BY 1
         |ORDER BY max_burst DESC, user_id LIMIT 20""".stripMargin,
    "q220_activity_histogram" ->
      s"""WITH ud AS (SELECT DISTINCT user_id,
         |    (epoch_us(ts) - 1704067200000000) // 86400000000 AS day
         |  FROM events),
         |ad AS (SELECT user_id, count(*) AS active_days
         |  FROM ud GROUP BY 1)
         |SELECT active_days, count(*) AS n_users
         |FROM ad GROUP BY 1 ORDER BY 1""".stripMargin,
    "q207_welch_ttest" ->
      s"""WITH spend AS (SELECT user_id, sum(value) AS y
         |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
         |arm AS (SELECT y,
         |    CASE WHEN ('0x' || substr(sha256(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 2 = 0
         |         THEN 'A' ELSE 'B' END AS arm
         |  FROM spend),
         |per AS (SELECT arm, count(*) AS n, avg(y) AS m, var_samp(y) AS v
         |  FROM arm GROUP BY 1),
         |a AS (SELECT n AS n_a, m AS m_a, v AS v_a FROM per WHERE arm = 'A'),
         |b AS (SELECT n AS n_b, m AS m_b, v AS v_b FROM per WHERE arm = 'B')
         |SELECT n_a, n_b, ${sr2("m_a")} AS mean_a, ${sr2("m_b")} AS mean_b,
         |  ${sr2("sqrt(v_a)")} AS sd_a, ${sr2("sqrt(v_b)")} AS sd_b,
         |  ${sr4("(m_a - m_b) / nullif(sqrt(v_a / n_a + v_b / n_b), 0e0)")} AS t,
         |  ${sr2("(v_a / n_a + v_b / n_b) * (v_a / n_a + v_b / n_b) / nullif((v_a / n_a) * (v_a / n_a) / CAST(n_a - 1 AS DOUBLE) + (v_b / n_b) * (v_b / n_b) / CAST(n_b - 1 AS DOUBLE), 0e0)")} AS df
         |FROM a CROSS JOIN b""".stripMargin,
    "q208_mase_backtest" ->
      s"""WITH daily AS (SELECT l_shipdate AS day,
         |    ${sr2("sum(l_extendedprice * (1.0e0 - l_discount))")} AS rev
         |  FROM lineitem GROUP BY 1),
         |lagged AS (SELECT day, rev,
         |    lag(rev, 7) OVER (ORDER BY day) AS f_seasonal,
         |    lag(rev, 1) OVER (ORDER BY day) AS f_naive
         |  FROM daily),
         |t AS (SELECT * FROM lagged WHERE year(day) = 2001
         |  AND f_seasonal IS NOT NULL AND f_naive IS NOT NULL)
         |SELECT count(*) AS n_test,
         |  ${sr2("avg(abs(rev - f_naive))")} AS mae_naive,
         |  ${sr2("avg(abs(rev - f_seasonal))")} AS mae_seasonal,
         |  ${sr4("avg(abs(rev - f_seasonal)) / nullif(avg(abs(rev - f_naive)), 0e0)")} AS mase
         |FROM t""".stripMargin,
    "q205_hhi_concentration" ->
      s"""WITH rev AS (SELECT l_suppkey,
         |    ${sr2("sum(l_extendedprice * (1.0e0 - l_discount))")} AS rev
         |  FROM lineitem GROUP BY 1),
         |j AS (SELECT n_name, rev,
         |    sum(rev) OVER (PARTITION BY n_name) AS tot
         |  FROM rev
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey)
         |SELECT n_name, count(*) AS n_suppliers,
         |  ${sr2("max(tot)")} AS nation_rev,
         |  ${sr4("sum((rev / tot) * (rev / tot))")} AS hhi
         |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    "q206_bootstrap_ci" ->
      s"""WITH x AS (SELECT event_id, value FROM events
         |  WHERE event_type = 'purchase'),
         |wt AS (SELECT r, value,
         |    CASE WHEN h8 < '5e2d58d8' THEN 0 WHEN h8 < 'bc5ab1b1' THEN 1
         |         WHEN h8 < 'eb715e1d' THEN 2 WHEN h8 < 'fb239797' THEN 3
         |         WHEN h8 < 'ff1025f5' THEN 4 ELSE 5 END AS w
         |  FROM (SELECT t.r, x.value,
         |      substr(sha256(CAST(x.event_id AS VARCHAR) || ':' ||
         |        CAST(t.r AS VARCHAR)), 1, 8) AS h8
         |    FROM x CROSS JOIN generate_series(0, 99) t(r))),
         |means AS (SELECT r,
         |    ${sqlRnd("sum(w * value) / CAST(sum(w) AS DOUBLE)", 10)} AS m
         |  FROM wt GROUP BY 1)
         |SELECT count(*) AS n_replicas, ${sr4("avg(m)")} AS boot_mean,
         |  ${sr4("quantile_cont(m, 0.025e0)")} AS lo95,
         |  ${sr4("quantile_cont(m, 0.975e0)")} AS hi95
         |FROM means""".stripMargin,
    "q202_psi_drift" ->
      s"""WITH ev AS (SELECT value,
         |    ((epoch_us(ts) - 1704067200000000) // 86400000000) < 15 AS is_a
         |  FROM events),
         |mm AS (SELECT min(value) AS lo, max(value) AS hi FROM ev),
         |c AS (SELECT
         |    CAST(least(floor((value - lo) * 10.0e0 / (hi - lo)), 9.0e0)
         |      AS BIGINT) AS bin,
         |    CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         |    CAST(sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS cb
         |  FROM ev, mm GROUP BY 1),
         |t AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
         |    CAST(sum(cb) AS BIGINT) AS nb FROM c)
         |SELECT bin, ca, cb,
         |  ${sqlRnd("(CAST(ca + 1 AS DOUBLE) / (na + 10) - CAST(cb + 1 AS DOUBLE) / (nb + 10)) * ln((CAST(ca + 1 AS DOUBLE) / (na + 10)) / (CAST(cb + 1 AS DOUBLE) / (nb + 10)))", 6)} AS psi_contrib
         |FROM c, t ORDER BY bin""".stripMargin,
    "q203_benford_audit" ->
      s"""WITH dg AS (SELECT
         |    CAST(substr(CAST(CAST(floor(o_totalprice * 100) AS BIGINT)
         |      AS VARCHAR), 1, 1) AS BIGINT) AS digit,
         |    count(*) AS n
         |  FROM orders WHERE o_totalprice >= 0.01e0 GROUP BY 1),
         |t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM dg)
         |SELECT digit, n,
         |  ${sqlRnd("CAST(n AS DOUBLE) / tot", 6)} AS p_obs,
         |  ${sqlRnd("log10(1.0e0 + 1.0e0 / digit)", 6)} AS p_benford,
         |  ${sqlRnd(s"abs(${sqlRnd("CAST(n AS DOUBLE) / tot", 6)} - ${sqlRnd("log10(1.0e0 + 1.0e0 / digit)", 6)})", 6)} AS abs_dev
         |FROM dg, t ORDER BY digit""".stripMargin,
    "q198_survival_km" ->
      s"""WITH life AS (SELECT user_id,
         |    min((epoch_us(ts) - 1704067200000000) // 86400000000) AS first_day,
         |    max((epoch_us(ts) - 1704067200000000) // 86400000000) AS last_day
         |  FROM events GROUP BY 1),
         |h AS (SELECT max(last_day) AS h FROM life),
         |lt AS (SELECT last_day - first_day AS t,
         |    CASE WHEN last_day <= h.h - 7 THEN 1 ELSE 0 END AS death
         |  FROM life, h),
         |byt AS (SELECT t, count(*) AS n_t,
         |    CAST(sum(death) AS BIGINT) AS d FROM lt GROUP BY 1),
         |wr AS (SELECT t, d,
         |    CAST(sum(n_t) OVER (ORDER BY t DESC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS n_risk
         |  FROM byt),
         |hz AS (SELECT t, n_risk, d, CAST(d AS DOUBLE) / n_risk AS haz FROM wr)
         |SELECT t, n_risk, d,
         |  ${sr4("CASE WHEN sum(CASE WHEN haz >= 1.0e0 THEN 1 ELSE 0 END) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) > 0 THEN 0.0e0 ELSE exp(sum(CASE WHEN haz < 1.0e0 THEN ln(1.0e0 - haz) ELSE 0.0e0 END) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) END")}
         |    AS survival
         |FROM hz ORDER BY t""".stripMargin,
    "q200_holt_trend" ->
      s"""WITH daily AS (
         |  SELECT l_returnflag, l_shipdate AS day,
         |    ${sr2("sum(l_extendedprice * (1e0 - l_discount))")} AS rev
         |  FROM lineitem GROUP BY 1, 2),
         |ser AS (SELECT l_returnflag, list(rev ORDER BY day) AS xs
         |        FROM daily GROUP BY 1),
         |st AS (SELECT l_returnflag, CAST(len(xs) AS BIGINT) AS n_points,
         |  list_reduce(list_transform(xs, y -> [y, 0e0]),
         |    (acc, x) -> [
         |      floor((0.5e0 * x[1] + (1e0 - 0.5e0) * (acc[1] + acc[2])) * 1e10 + 0.5e0) / 1e10,
         |      floor((0.3e0 * ((floor((0.5e0 * x[1] + (1e0 - 0.5e0) * (acc[1] + acc[2])) * 1e10 + 0.5e0) / 1e10) - acc[1]) +
         |        (1e0 - 0.3e0) * acc[2]) * 1e10 + 0.5e0) / 1e10
         |    ]) AS st
         |  FROM ser)
         |SELECT l_returnflag, n_points, st[1] AS level, st[2] AS trend,
         |  ${sr2("st[1] + st[2]")} AS forecast
         |FROM st ORDER BY l_returnflag""".stripMargin,
    "q181_growth_accounting" ->
      s"""WITH uw AS (SELECT DISTINCT user_id,
         |    (epoch_us(ts) - 1704067200000000) // 604800000000 AS wk
         |  FROM events),
         |f AS (SELECT user_id, min(wk) AS first_wk FROM uw GROUP BY 1),
         |cur AS (SELECT user_id, wk, 1 AS is_cur FROM uw),
         |prev AS (SELECT user_id, wk + 1 AS wk, 1 AS is_prev FROM uw),
         |j AS (SELECT user_id, wk, coalesce(is_cur, 0) AS c,
         |    coalesce(is_prev, 0) AS p
         |  FROM cur FULL JOIN prev USING (user_id, wk)),
         |g AS (SELECT j.wk,
         |    CAST(sum(CASE WHEN c = 1 AND j.wk = f.first_wk THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
         |    CAST(sum(CASE WHEN c = 1 AND p = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
         |    CAST(sum(CASE WHEN c = 1 AND p = 0 AND j.wk > f.first_wk THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected,
         |    CAST(sum(CASE WHEN c = 0 AND p = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_churned
         |  FROM j JOIN f USING (user_id) GROUP BY 1)
         |SELECT wk, n_new, n_retained, n_resurrected, n_churned,
         |  ${sr4("CAST(n_new + n_resurrected AS DOUBLE) / CAST(nullif(n_churned, 0) AS DOUBLE)")} AS quick_ratio
         |FROM g ORDER BY wk""".stripMargin,
    "q171_stl_decompose" ->
      s"""WITH daily AS (SELECT
         |    (epoch_us(ts) - 1704067200000000) // 86400000000 AS day,
         |    ${sr2("sum(value)")} AS rev
         |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
         |d2 AS (SELECT day, rev,
         |    CAST(floor(rev * 100e0 + 0.5e0) AS BIGINT) AS rev100 FROM daily),
         |t AS (SELECT day, rev,
         |    ${sr4("CAST(sum(rev100) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS DOUBLE) / CAST(count(*) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) * 100 AS DOUBLE)")} AS trend
         |  FROM d2),
         |t2 AS (SELECT day, rev, trend,
         |    CAST(floor((rev - trend) * 10000e0 + 0.5e0) AS BIGINT) AS det FROM t),
         |seas AS (SELECT ((day % 7) + 7) % 7 AS dow,
         |    ${sr4("CAST(sum(det) AS DOUBLE) / CAST(count(*) * 10000 AS DOUBLE)")} AS seasonal
         |  FROM t2 GROUP BY 1)
         |SELECT t2.day, ((t2.day % 7) + 7) % 7 AS dow, t2.rev, t2.trend, s.seasonal,
         |  ${sr4("t2.rev - t2.trend - s.seasonal")} AS resid
         |FROM t2 JOIN seas s ON ((t2.day % 7) + 7) % 7 = s.dow
         |ORDER BY t2.day""".stripMargin,
    "q174_discount_elasticity" ->
      s"""SELECT p_brand, count(*) AS n_lines,
         |  ${sr4("avg(l_discount)")} AS avg_discount,
         |  ${sr4("covar_pop(l_discount, l_quantity) / nullif(var_pop(l_discount), 0.0)")} AS slope
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q175_user_features" ->
      s"""WITH e AS (SELECT user_id, event_type, value,
         |    (epoch_us(ts) - 1704067200000000) // 86400000000 AS day
         |  FROM events)
         |SELECT user_id, count(*) AS n_total,
         |  CAST(sum(CASE WHEN day > 23 THEN 1 ELSE 0 END) AS BIGINT) AS n_7d,
         |  CAST(sum(CASE WHEN day > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_30d,
         |  30 - max(day) AS days_since_last,
         |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
         |  ${sr2("sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0e0 END)")} AS total_spend,
         |  count(DISTINCT day) AS active_days
         |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,
    "q168_user_entropy" ->
      s"""WITH ct AS (SELECT user_id, event_type, count(*) AS c
         |  FROM events GROUP BY 1, 2),
         |tot AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS n
         |  FROM ct GROUP BY 1)
         |SELECT ct.user_id, max(n) AS n_events, count(*) AS n_types,
         |  ${sr4("-sum((CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n))")} AS entropy
         |FROM ct JOIN tot USING (user_id)
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q156_cusum_changepoint" ->
      s"""WITH daily AS (SELECT (epoch_us(ts) - 1704067200000000) // 86400000000 AS day,
         |    ${sr2("sum(value)")} AS rev
         |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
         |g AS (SELECT ${sr4("avg(rev)")} AS mu, count(*) AS n_days FROM daily),
         |c AS (SELECT day, ${sr4(
             "sum(rev - g.mu) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)")} AS cusum,
         |    g.mu, g.n_days
         |  FROM daily CROSS JOIN g)
         |SELECT day AS changepoint_day, cusum, mu, n_days
         |FROM c ORDER BY abs(cusum) DESC, day LIMIT 1""".stripMargin,
    "q152_skyline" ->
      """WITH bypd AS (SELECT o_totalprice, o_orderdate, count(*) AS n
        |  FROM orders GROUP BY 1, 2),
        |grain AS (SELECT g.o_totalprice, g.dmax, b.n AS n_orders
        |  FROM (SELECT o_totalprice, max(o_orderdate) AS dmax
        |        FROM bypd GROUP BY 1) g
        |  JOIN bypd b ON b.o_totalprice = g.o_totalprice
        |    AND b.o_orderdate = g.dmax),
        |sky AS (SELECT o_totalprice, dmax, n_orders,
        |    max(dmax) OVER (ORDER BY o_totalprice
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_cheaper
        |  FROM grain)
        |SELECT o_totalprice, dmax AS o_orderdate, n_orders
        |FROM sky WHERE best_cheaper IS NULL OR dmax > best_cheaper
        |ORDER BY o_totalprice""".stripMargin,
    "q148_pareto" ->
      s"""WITH rev AS (SELECT n.n_name, ${sr2("sum(o.o_totalprice)")} AS rev
         |  FROM orders o
         |  JOIN customer c ON o.o_custkey = c.c_custkey
         |  JOIN nation n ON c.c_nationkey = n.n_nationkey
         |  GROUP BY 1),
         |tot AS (SELECT ${sr2("sum(rev)")} AS tot FROM rev),
         |cum AS (SELECT n_name, rev, tot,
         |    sum(rev) OVER (ORDER BY rev DESC, n_name
         |      ROWS UNBOUNDED PRECEDING) AS cum_rev
         |  FROM rev CROSS JOIN tot)
         |SELECT n_name, rev, ${sr4("rev / tot")} AS share,
         |  ${sr4("cum_rev / tot")} AS cum_share,
         |  CAST(CASE WHEN cum_rev / tot <= 0.8 THEN 1 ELSE 0 END AS BIGINT) AS head_80
         |FROM cum ORDER BY rev DESC, n_name""".stripMargin,
    "q145_ks_drift" ->
      s"""WITH t AS (SELECT event_type, value FROM events
         |  WHERE event_type IN ('click', 'purchase')),
         |pv AS (SELECT value,
         |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS c2
         |  FROM t GROUP BY 1),
         |tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
         |    CAST(sum(c2) AS BIGINT) AS n2 FROM pv),
         |cdf AS (SELECT
         |    sum(c1) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS f1,
         |    sum(c2) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS f2
         |  FROM pv)
         |SELECT tot.n1, tot.n2,
         |  ${sr5("max(abs(CAST(f1 AS DOUBLE) / tot.n1 - CAST(f2 AS DOUBLE) / tot.n2))")} AS ks_d
         |FROM cdf CROSS JOIN tot GROUP BY tot.n1, tot.n2""".stripMargin,
    "q141_cuped" ->
      s"""WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us, value FROM events),
         |u AS (SELECT DISTINCT user_id FROM ev),
         |arms AS (SELECT user_id,
         |    CASE WHEN ('0x' || substr(sha256(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 2 = 0
         |         THEN 'A' ELSE 'B' END AS arm
         |  FROM u),
         |pre AS (SELECT user_id, sum(value) AS x FROM ev
         |  WHERE event_type = 'purchase' AND us < 1705276800000000 GROUP BY 1),
         |post AS (SELECT user_id, sum(value) AS y FROM ev
         |  WHERE event_type = 'purchase' AND us >= 1705276800000000 GROUP BY 1),
         |m AS (SELECT arm, coalesce(x, 0e0) AS x, coalesce(y, 0e0) AS y
         |  FROM arms LEFT JOIN pre USING (user_id) LEFT JOIN post USING (user_id)),
         |g AS (SELECT covar_pop(x, y) / var_pop(x) AS theta,
         |    avg(x) AS mx, var_pop(y) AS vy FROM m),
         |adj AS (SELECT arm, y, y - g.theta * (x - g.mx) AS yadj, g.vy, g.theta
         |  FROM m CROSS JOIN g),
         |vr AS (SELECT ${sr4("1e0 - var_pop(yadj) / max(vy)")} AS var_reduction,
         |    ${sr4("max(theta)")} AS theta FROM adj)
         |SELECT arm, count(*) AS n, ${sr4("avg(y)")} AS mean_y,
         |  ${sr4("avg(yadj)")} AS mean_y_adj, vr.var_reduction, vr.theta
         |FROM adj CROSS JOIN vr
         |GROUP BY arm, vr.var_reduction, vr.theta ORDER BY arm""".stripMargin,
    "q140_ab_test" ->
      s"""WITH u AS (SELECT DISTINCT user_id FROM events),
         |arms AS (SELECT user_id,
         |    CASE WHEN ('0x' || substr(sha256(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 2 = 0
         |         THEN 'A' ELSE 'B' END AS arm
         |  FROM u),
         |conv AS (SELECT user_id FROM events WHERE event_type = 'purchase'
         |  GROUP BY 1 HAVING count(*) >= 14),
         |per AS (SELECT arm, count(*) AS n,
         |    CAST(sum(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS conv
         |  FROM arms a LEFT JOIN conv c USING (user_id) GROUP BY 1),
         |j AS (SELECT a.n AS n_a, a.conv AS conv_a, b.n AS n_b, b.conv AS conv_b,
         |    a.conv / CAST(a.n AS DOUBLE) AS pa, b.conv / CAST(b.n AS DOUBLE) AS pb,
         |    (a.conv + b.conv) / CAST(a.n + b.n AS DOUBLE) AS p
         |  FROM (SELECT n, conv FROM per WHERE arm = 'A') a
         |  CROSS JOIN (SELECT n, conv FROM per WHERE arm = 'B') b)
         |SELECT n_a, conv_a, n_b, conv_b,
         |  ${sr4("pa")} AS rate_a, ${sr4("pb")} AS rate_b,
         |  ${sr4("(pa - pb) / nullif(sqrt(p * (1e0 - p) * (1e0 / n_a + 1e0 / n_b)), 0e0)")} AS z
         |FROM j""".stripMargin,
    "q123_chisq_assoc" ->
      s"""WITH cn AS (SELECT c.c_mktsegment, n.n_regionkey
         |  FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey),
         |obs AS (SELECT c_mktsegment, n_regionkey, count(*) AS o FROM cn GROUP BY 1, 2),
         |rt AS (SELECT c_mktsegment, sum(o) AS rt FROM obs GROUP BY 1),
         |ct AS (SELECT n_regionkey, sum(o) AS ct FROM obs GROUP BY 1),
         |tot AS (SELECT sum(o) AS n FROM obs),
         |grid AS (
         |  SELECT rt.c_mktsegment, ct.n_regionkey, rt.rt, ct.ct,
         |    coalesce(obs.o, 0) AS o, tot.n,
         |    (rt.rt * ct.ct / tot.n) AS e
         |  FROM rt CROSS JOIN ct
         |  LEFT JOIN obs ON obs.c_mktsegment = rt.c_mktsegment
         |    AND obs.n_regionkey = ct.n_regionkey
         |  CROSS JOIN tot)
         |SELECT ${sr4("sum(pow(o - e, 2) / e)")} AS chi2,
         |  (count(DISTINCT c_mktsegment) - 1) * (count(DISTINCT n_regionkey) - 1) AS dof,
         |  count(*) AS n_cells, CAST(max(n) AS BIGINT) AS n
         |FROM grid""".stripMargin,
    "q124_mom_growth" ->
      s"""WITH monthly AS (
         |  SELECT n.n_name, date_trunc('month', o.o_orderdate) AS mon,
         |    ${sr2("sum(o.o_totalprice)")} AS rev
         |  FROM orders o
         |  JOIN customer c ON c.c_custkey = o.o_custkey
         |  JOIN nation n ON n.n_nationkey = c.c_nationkey
         |  GROUP BY 1, 2)
         |SELECT n_name, mon, rev,
         |  lag(rev) OVER (PARTITION BY n_name ORDER BY mon) AS prev,
         |  ${sr4("(rev - lag(rev) OVER (PARTITION BY n_name ORDER BY mon)) / " +
                 "lag(rev) OVER (PARTITION BY n_name ORDER BY mon)")} AS growth
         |FROM monthly ORDER BY n_name, mon""".stripMargin,
    "q121_rolling_active_users" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |off AS (SELECT unnest(generate_series(0, 6)) AS o),
        |contrib AS (SELECT user_id, day + CAST(o AS INTEGER) AS t
        |            FROM ud CROSS JOIN off),
        |wau AS (SELECT t, count(DISTINCT user_id) AS wau_7d FROM contrib GROUP BY 1),
        |dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM ud GROUP BY 1)
        |SELECT CAST(d.day AS TIMESTAMP) AS day, d.dau, w.wau_7d
        |FROM dau d JOIN wau w ON w.t = d.day ORDER BY d.day""".stripMargin,
    "q122_mad_outliers" ->
      s"""WITH med AS (SELECT event_type, median(value) AS med FROM events GROUP BY 1),
         |mad AS (SELECT e.event_type, min(m.med) AS med,
         |    median(abs(e.value - m.med)) AS mad
         |  FROM events e JOIN med m USING (event_type) GROUP BY 1)
         |SELECT e.event_id, e.event_type, ${sr2("e.value")} AS value,
         |  ${sr4("m.med")} AS med, ${sr4("m.mad")} AS mad,
         |  ${sr4("0.6745e0 * (e.value - m.med) / nullif(m.mad, 0e0)")} AS rz
         |FROM events e JOIN mad m USING (event_type)
         |ORDER BY abs(${sr4("0.6745e0 * (e.value - m.med) / m.mad")}) DESC, e.event_id
         |LIMIT 20""".stripMargin,
    "q117_gap_fill_hourly" ->
      s"""WITH hourly AS (
         |  SELECT event_type, date_trunc('hour', ts) AS hour,
         |    count(*) AS n_events, sum(value) AS sv
         |  FROM events GROUP BY 1, 2),
         |span AS (SELECT min(hour) AS t0, max(hour) AS t1 FROM hourly),
         |spine AS (SELECT unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS hour FROM span),
         |keys AS (SELECT DISTINCT event_type FROM hourly)
         |SELECT k.event_type, s.hour,
         |  coalesce(h.n_events, 0) AS n_events,
         |  ${sr2("coalesce(h.sv, 0e0)")} AS sum_value
         |FROM keys k CROSS JOIN spine s
         |LEFT JOIN hourly h ON h.event_type = k.event_type AND h.hour = s.hour
         |ORDER BY k.event_type, s.hour""".stripMargin,
    "q118_ewma_daily_revenue" ->
      s"""WITH daily AS (
         |  SELECT l_returnflag, l_shipdate AS day,
         |    ${sr2("sum(l_extendedprice * (1e0 - l_discount))")} AS rev
         |  FROM lineitem GROUP BY 1, 2),
         |ser AS (SELECT l_returnflag, list(rev ORDER BY day) AS xs
         |        FROM daily GROUP BY 1)
         |SELECT l_returnflag, CAST(len(xs) AS BIGINT) AS n_points,
         |  list_reduce(xs, (acc, x) ->
         |    floor((acc * (1e0 - 0.3e0) + 0.3e0 * x) * 1e10 + 0.5e0) / 1e10) AS ewma
         |FROM ser ORDER BY l_returnflag""".stripMargin,
    "q119_winsorized_stats" ->
      s"""WITH pct AS (
         |  SELECT event_type, quantile_cont(value, 0.05e0) AS p05,
         |    quantile_cont(value, 0.95e0) AS p95
         |  FROM events GROUP BY 1)
         |SELECT e.event_type, count(*) AS n,
         |  ${sr4("avg(e.value)")} AS mean_raw,
         |  ${sr4("avg(least(greatest(e.value, p.p05), p.p95))")} AS mean_winsor,
         |  ${sr4("min(p.p05)")} AS p05, ${sr4("max(p.p95)")} AS p95
         |FROM events e JOIN pct p USING (event_type)
         |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,
    "q120_ref_integrity" ->
      """WITH edges AS (
        |  SELECT 'customer.c_nationkey->nation' AS edge,
        |    (SELECT count(*) FROM customer) AS n_child,
        |    (SELECT count(*) FROM customer c WHERE NOT EXISTS
        |      (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)) AS n_orphan,
        |    (SELECT count(DISTINCT n_nationkey) FROM nation) AS n_parent,
        |    (SELECT count(*) FROM nation n WHERE NOT EXISTS
        |      (SELECT 1 FROM customer c WHERE c.c_nationkey = n.n_nationkey)) AS n_unref_parent
        |  UNION ALL
        |  SELECT 'lineitem.l_orderkey->orders',
        |    (SELECT count(*) FROM lineitem),
        |    (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        |      (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)),
        |    (SELECT count(DISTINCT o_orderkey) FROM orders),
        |    (SELECT count(*) FROM orders o WHERE NOT EXISTS
        |      (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey))
        |  UNION ALL
        |  SELECT 'nation.n_regionkey->region',
        |    (SELECT count(*) FROM nation),
        |    (SELECT count(*) FROM nation n WHERE NOT EXISTS
        |      (SELECT 1 FROM region r WHERE r.r_regionkey = n.n_regionkey)),
        |    (SELECT count(DISTINCT r_regionkey) FROM region),
        |    (SELECT count(*) FROM region r WHERE NOT EXISTS
        |      (SELECT 1 FROM nation n WHERE n.n_regionkey = r.r_regionkey))
        |  UNION ALL
        |  SELECT 'orders.o_custkey->customer',
        |    (SELECT count(*) FROM orders),
        |    (SELECT count(*) FROM orders o WHERE NOT EXISTS
        |      (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
        |    (SELECT count(DISTINCT c_custkey) FROM customer),
        |    (SELECT count(*) FROM customer c WHERE NOT EXISTS
        |      (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey))
        |  UNION ALL
        |  SELECT 'supplier.s_nationkey->nation',
        |    (SELECT count(*) FROM supplier),
        |    (SELECT count(*) FROM supplier s WHERE NOT EXISTS
        |      (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey)),
        |    (SELECT count(DISTINCT n_nationkey) FROM nation),
        |    (SELECT count(*) FROM nation n WHERE NOT EXISTS
        |      (SELECT 1 FROM supplier s WHERE s.s_nationkey = n.n_nationkey)))
        |SELECT edge, n_child, n_orphan, n_parent, n_unref_parent
        |FROM edges ORDER BY edge""".stripMargin,
    "q112_table_profile" ->
      s"""WITH p AS (
         |  SELECT 'c_acctbal' AS column_name, count(*) AS n_rows,
         |    count(c_acctbal) AS n_nonnull, count(DISTINCT c_acctbal) AS n_distinct,
         |    ${sr2("min(c_acctbal)")} AS min_v, ${sr2("max(c_acctbal)")} AS max_v
         |  FROM customer
         |  UNION ALL
         |  SELECT 'c_custkey', count(*), count(c_custkey), count(DISTINCT c_custkey),
         |    CAST(min(c_custkey) AS DOUBLE), CAST(max(c_custkey) AS DOUBLE) FROM customer
         |  UNION ALL
         |  SELECT 'c_mktsegment', count(*), count(c_mktsegment),
         |    count(DISTINCT c_mktsegment), NULL, NULL FROM customer
         |  UNION ALL
         |  SELECT 'c_name', count(*), count(c_name), count(DISTINCT c_name),
         |    NULL, NULL FROM customer
         |  UNION ALL
         |  SELECT 'c_nationkey', count(*), count(c_nationkey),
         |    count(DISTINCT c_nationkey),
         |    CAST(min(c_nationkey) AS DOUBLE), CAST(max(c_nationkey) AS DOUBLE) FROM customer)
         |SELECT column_name, n_rows, n_nonnull, n_distinct, min_v, max_v
         |FROM p ORDER BY column_name""".stripMargin,
    "q142_seasonal_anomaly" ->
      s"""WITH daily AS (SELECT
         |    (epoch_us(ts) - 1704067200000000) // 86400000000 AS day,
         |    ${sr2("sum(value)")} AS rev
         |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
         |dw AS (SELECT day, ((day % 7) + 7) % 7 AS dow, rev FROM daily),
         |st AS (SELECT dow, avg(rev) AS mu, stddev_samp(rev) AS sigma
         |  FROM dw GROUP BY 1)
         |SELECT d.day, d.dow, d.rev,
         |  ${sr4("(d.rev - st.mu) / nullif(st.sigma, 0e0)")} AS z
         |FROM dw d JOIN st USING (dow)
         |ORDER BY abs(${sr4("(d.rev - st.mu) / nullif(st.sigma, 0e0)")}) DESC, d.day
         |LIMIT 5""".stripMargin,
    "q116_anomaly_zscore" ->
      s"""WITH st AS (SELECT event_type, avg(value) AS mu,
         |    stddev_samp(value) AS sigma FROM events GROUP BY 1)
         |SELECT e.event_id, e.event_type, ${sr2("e.value")} AS value,
         |  ${sr4("(e.value - st.mu) / nullif(st.sigma, 0e0)")} AS z
         |FROM events e JOIN st USING (event_type)
         |ORDER BY abs(${sr4("(e.value - st.mu) / st.sigma")}) DESC, e.event_id
         |LIMIT 20""".stripMargin,
    "q38_window_distribution" ->
      s"""SELECT s_suppkey, s_acctbal,
         |  ${sr5("percent_rank() OVER (ORDER BY s_acctbal DESC, s_suppkey)")} AS pct_rank,
         |  ${sr5("cume_dist() OVER (ORDER BY s_acctbal DESC, s_suppkey)")} AS cume
         |FROM supplier ORDER BY s_suppkey""".stripMargin,
    "q57_edit_distance" ->
      """WITH p AS (SELECT doc_id, lower(trim(text)) AS t,
        |    substr(lower(trim(text)), 1, 40) AS pfx FROM documents)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(levenshtein(a.t, b.t) AS BIGINT) AS edit_dist,
        |  CAST(greatest(length(a.t), length(b.t)) AS BIGINT) AS max_len
        |FROM p a JOIN p b ON a.pfx = b.pfx AND a.doc_id < b.doc_id
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q58_regression_aggs" ->
      s"""SELECT l_returnflag,
         |  ${sr4("regr_slope(l_extendedprice, l_quantity)")} AS slope,
         |  ${sr4("regr_intercept(l_extendedprice, l_quantity)")} AS intercept,
         |  ${sr5("regr_r2(l_extendedprice, l_quantity)")} AS r2,
         |  CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
}
