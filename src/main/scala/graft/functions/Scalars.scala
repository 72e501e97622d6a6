package graft.functions

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.7 scalar function suite: string / date / math / json / array-HOF /
  * null-conditional. All row-level, all codegen'd builtins — each query is a
  * single WholeStageCodegen span over the scan with zero shuffles except the
  * final order (bounded output or key-ordered write).
  *
  * Cross-engine dialect traps handled per SURVEY §2.9: DuckDB json_extract
  * returns a quoted value (CAST both sides), DuckDB dayofweek is 0-6
  * Sun-based vs Spark 1-7 (normalized in the oracle), DuckDB date_trunc
  * returns DATE (cast to TIMESTAMP), DuckDB ceil/floor return DOUBLE while
  * Spark returns LONG (cast both), and Spark's builtin round differs from
  * DuckDB's on half-way points (we use the shared floor-based `rnd`).
  */
object Scalars {

  def q50(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .select(col("p_partkey"),
        upper(col("p_name")).as("uname"),
        substring(col("p_name"), 1, 10).as("prefix"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        length(col("p_name")).cast("long").as("name_len"),
        trim(concat(lit("  "), col("p_brand"), lit("  "))).as("trimmed"),
        expr("replace(p_type, ' ', '_')").as("type_us"),
        regexp_extract(col("p_brand"), "Brand#(\\d+)", 1).cast("long").as("brand_num"),
        size(split(col("p_name"), " ")).cast("long").as("n_words"))
      .orderBy("p_partkey")

  def q51(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        dayofweek(col("o_orderdate")).cast("long").as("dow"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).cast("long").as("days_since"),
        add_months(col("o_orderdate"), 3).cast("timestamp_ntz").as("plus3m"))
      .orderBy("o_orderkey")

  def q52(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        r4(abs(col("l_discount") - lit(0.05))).as("abs_dd"),
        ceil(col("l_extendedprice") / lit(100.0)).cast("long").as("ceil_c"),
        floor(col("l_extendedprice") / lit(100.0)).cast("long").as("floor_c"),
        r4(pow(col("l_quantity"), lit(2.0))).as("qty_sq"),
        r4(log(col("l_extendedprice"))).as("ln_price"),
        r4(sqrt(col("l_quantity"))).as("sqrt_qty"),
        r4(least(col("l_discount"), col("l_tax"))).as("min_dt"),
        r4(greatest(col("l_discount"), col("l_tax"))).as("max_dt"))
      // (l_orderkey, l_linenumber) is not unique — order by every output
      // column so remaining ties are value-identical rows (hash-safe)
      .orderBy("l_orderkey", "l_linenumber", "abs_dd", "ceil_c", "floor_c",
        "qty_sq", "ln_price", "sqrt_qty", "min_dt", "max_dt")

  def q53(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_id"),
        itemFromProps.as("item"),
        size(map_keys(expr("from_json(props, 'map<string,bigint>')")))
          .cast("long").as("n_keys"),
        array_join(map_keys(expr("from_json(props, 'map<string,bigint>')")), ",")
          .as("keys"))
      .orderBy("event_id")

  /** Spark 4's VARIANT surface: parse the JSON props ONCE into the binary
    * semi-structured type, then extract with `variant_get` — at scale the
    * parse cost is paid once per row instead of once per `get_json_object`
    * path, and the binary encoding pushes through shuffles untouched. The
    * extraction feeds the same (item → count, mean value) aggregate shape
    * as the ratings matrix, so the oracle stays pure SQL. The try_ variants
    * null malformed JSON and non-BIGINT-castable ids instead of raising —
    * the VARIANT-path analogue of Tables.itemFromProps' try_cast, identical
    * on every well-formed row (r11 corrupt-props sweep: variant_get threw
    * INVALID_VARIANT_CAST on an overflowing id). */
  def q08(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(expr("try_variant_get(try_parse_json(props), '$.k', 'bigint')").as("item"),
        col("value"))
      .groupBy("item")
      .agg(count(lit(1)).as("n_events"), r4(avg("value")).as("avg_value"))
      .orderBy("item")

  /** Array higher-order functions over the embedding column. Floats are cast
    * to double FIRST so both engines accumulate in double (float accumulation
    * would diverge beyond the 5-dp rounding guard). */
  def q54(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .withColumn("emb_d", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .select(col("vec_id"), col("label"),
        size(col("embedding")).cast("long").as("dim"),
        r5(sqrt(expr("aggregate(emb_d, 0D, (acc, x) -> acc + x * x)"))).as("l2_norm"),
        size(expr("filter(emb_d, x -> x > 0D)")).cast("long").as("n_pos"),
        r5(expr("aggregate(emb_d, 0D, (acc, x) -> acc + x) / size(emb_d)")).as("mean_elem"))
      .orderBy("vec_id")

  def q55(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .select(col("c_custkey"),
        when(col("c_acctbal") >= 5000, "gold")
          .when(col("c_acctbal") >= 0, "standard")
          .otherwise("delinquent").as("tier"),
        expr("nvl(nullif(c_mktsegment, 'MACHINERY'), 'OTHER')").as("seg_masked"),
        r2(coalesce(when(col("c_acctbal") > 0, col("c_acctbal")), lit(0.0))).as("pos_bal"))
      .orderBy("c_custkey")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q08_variant_extract" -> q08,
    "q50_string_funcs" -> q50,
    "q51_date_funcs" -> q51,
    "q52_math_funcs" -> q52,
    "q53_json_funcs" -> q53,
    "q54_array_hof" -> q54,
    "q55_null_conditional" -> q55)

  val oracle: Map[String, String] = Map(
    "q08_variant_extract" ->
      s"""SELECT TRY_CAST(json_extract(props, '$$.k') AS BIGINT) AS item,
         |  count(*) AS n_events, ${sr4("avg(value)")} AS avg_value
         |FROM events GROUP BY 1 ORDER BY item""".stripMargin,
    "q50_string_funcs" ->
      """SELECT p_partkey,
        |  upper(p_name) AS uname,
        |  substr(p_name, 1, 10) AS prefix,
        |  concat_ws('|', p_brand, p_type) AS brand_type,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  trim('  ' || p_brand || '  ') AS trimmed,
        |  replace(p_type, ' ', '_') AS type_us,
        |  CAST(regexp_extract(p_brand, 'Brand#(\d+)', 1) AS BIGINT) AS brand_num,
        |  CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_words
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q51_date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(month(o_orderdate) AS BIGINT) AS mo,
        |  CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |  CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS days_since,
        |  o_orderdate + INTERVAL 3 MONTH AS plus3m
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q52_math_funcs" ->
      s"""SELECT l_orderkey, l_linenumber,
         |  ${sr4("abs(l_discount - 0.05e0)")} AS abs_dd,
         |  CAST(ceil(l_extendedprice / 100e0) AS BIGINT) AS ceil_c,
         |  CAST(floor(l_extendedprice / 100e0) AS BIGINT) AS floor_c,
         |  ${sr4("pow(l_quantity, 2e0)")} AS qty_sq,
         |  ${sr4("ln(l_extendedprice)")} AS ln_price,
         |  ${sr4("sqrt(l_quantity)")} AS sqrt_qty,
         |  ${sr4("least(l_discount, l_tax)")} AS min_dt,
         |  ${sr4("greatest(l_discount, l_tax)")} AS max_dt
         |FROM lineitem ORDER BY l_orderkey, l_linenumber, abs_dd, ceil_c,
         |  floor_c, qty_sq, ln_price, sqrt_qty, min_dt, max_dt""".stripMargin,
    "q53_json_funcs" ->
      """SELECT event_id,
        |  TRY_CAST(json_extract(props, '$.k') AS BIGINT) AS item,
        |  CAST(len(json_keys(props)) AS BIGINT) AS n_keys,
        |  array_to_string(json_keys(props), ',') AS keys
        |FROM events ORDER BY event_id""".stripMargin,
    "q54_array_hof" ->
      s"""SELECT vec_id, label,
         |  CAST(len(embedding) AS BIGINT) AS dim,
         |  ${sr5("sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))")} AS l2_norm,
         |  CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
         |  ${sr5("list_sum(embedding::DOUBLE[]) / len(embedding)")} AS mean_elem
         |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q55_null_conditional" ->
      s"""SELECT c_custkey,
         |  CASE WHEN c_acctbal >= 5000 THEN 'gold'
         |       WHEN c_acctbal >= 0 THEN 'standard'
         |       ELSE 'delinquent' END AS tier,
         |  coalesce(nullif(c_mktsegment, 'MACHINERY'), 'OTHER') AS seg_masked,
         |  ${sr2("coalesce(CASE WHEN c_acctbal > 0 THEN c_acctbal END, 0e0)")} AS pos_bal
         |FROM customer ORDER BY c_custkey""".stripMargin)
}
