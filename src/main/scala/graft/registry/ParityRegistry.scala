package graft.registry

import graft.dedup.Dedup
import graft.functions.Fx
import graft.multimodal.Multimodal
import graft.operators.Analytics
import graft.similarity.Similarity
import graft.text.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.registry.RegistryBase._

/** Reference-parity queries (SURVEY.md §2) — query builders plus their DuckDB oracles.
  * Conventions: see [[graft.SparkEntry]]. Split from the original
  * single-file registry; member bodies are unchanged.
  */
private[graft] object ParityRegistry {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (pricingSummary _),
    "q02_latest_order_per_customer" -> (latestOrderPerCustomer _),
    "q03_top10_orders" -> (top10Orders _),
    "q04_order_priority_facets" -> (orderPriorityFacets _),
    "q05_part_name_facets" -> (partNameFacets _),
    "q06_revenue_by_nation" -> (revenueByNation _),
    "q07_order_price_stats" -> (orderPriceStats _),
    "q08_customers_without_orders" -> (customersWithoutOrders _),
    "q09_dim_customer_keys" -> (dimCustomerKeys _),
    "q10_date_dimension" -> (dateDimension _),
    "q11_duplicate_orderkey_stats" -> (duplicateOrderKeyStats _),
    "q12_lineitem_completeness" -> (lineitemCompleteness _),
    "q13_quantity_range_check" -> (quantityRangeCheck _),
    "q14_customer_name_pattern" -> (customerNamePattern _),
    "q15_events_hourly" -> (eventsHourly _),
    "q16_events_props_extract" -> (eventsPropsExtract _),
    "q17_union_high_low_orders" -> (unionHighLowOrders _),
  )

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_base_price,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
         round(avg(l_quantity), 4) AS avg_qty,
         round(avg(l_extendedprice), 4) AS avg_price,
         count(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q02_latest_order_per_customer" ->
      """SELECT o_custkey, o_orderkey,
         CAST(strftime(o_orderdate, '%Y%m%d') AS INT) AS o_orderdate_key,
         o_totalprice
         FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders)
         WHERE rn = 1 ORDER BY o_custkey""",
    "q03_top10_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""",
    "q04_order_priority_facets" ->
      """SELECT o_orderpriority AS facet, count(*) AS count FROM orders
         GROUP BY 1 ORDER BY count DESC, facet ASC NULLS LAST LIMIT 10""",
    "q05_part_name_facets" ->
      """SELECT regexp_extract(p_name, '^(\w+)', 1) AS facet,
         count(*) AS count FROM part
         GROUP BY 1 ORDER BY count DESC, facet ASC NULLS LAST LIMIT 10""",
    "q06_revenue_by_nation" ->
      """SELECT n_name,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
         count(*) AS line_count
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name ORDER BY n_name""",
    "q07_order_price_stats" ->
      """SELECT round(avg(o_totalprice), 4) AS mean,
         round(CAST(median(o_totalprice) AS DOUBLE), 4) AS median,
         round(max(o_totalprice), 2) AS max,
         round(sum(o_totalprice), 2) AS sum,
         count(o_totalprice) AS count
         FROM orders""",
    "q08_customers_without_orders" ->
      """SELECT DISTINCT c_custkey FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "q09_dim_customer_keys" ->
      """SELECT c_custkey,
         substring(md5(concat_ws('|',
           coalesce(CAST(c_custkey AS VARCHAR), 'None'),
           coalesce(c_name, 'None'))), 1, 12) AS customer_sk,
         lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS custkey_padded,
         c_mktsegment
         FROM customer ORDER BY c_custkey""",
    "q10_date_dimension" ->
      """SELECT strftime(d, '%Y-%m-%d') AS date_str,
         CAST(strftime(d, '%Y%m%d') AS INT) AS date_key,
         CAST(year(d) AS INT) AS year,
         CAST(quarter(d) AS INT) AS quarter,
         CAST(month(d) AS INT) AS month,
         monthname(d) AS month_name,
         dayname(d) AS day_of_week,
         CAST(dayofyear(d) AS INT) AS day_of_year,
         CAST(isodow(d) >= 6 AS INT) AS is_weekend
         FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders
               WHERE o_orderdate IS NOT NULL)
         ORDER BY date_str""",
    "q11_duplicate_orderkey_stats" ->
      """SELECT
         CAST(coalesce(sum(CASE WHEN n > 1 THEN n END), 0) AS BIGINT)
           AS duplicate_rows,
         CAST(coalesce(sum(CASE WHEN n = 1 THEN n END), 0) AS BIGINT)
           AS unique_rows,
         CAST(coalesce(sum(n), 0) AS BIGINT) AS total_rows
         FROM (SELECT o_custkey, count(*) AS n FROM orders GROUP BY 1)""",
    "q12_lineitem_completeness" ->
      """SELECT
         round(avg(CAST(l_orderkey IS NOT NULL AS INT)), 4) AS c_orderkey,
         round(avg(CAST(l_quantity IS NOT NULL AS INT)), 4) AS c_quantity,
         round(avg(CAST(l_shipdate IS NOT NULL AS INT)), 4) AS c_shipdate,
         count(*) AS total_rows
         FROM lineitem""",
    "q13_quantity_range_check" ->
      """SELECT
         count(CASE WHEN l_quantity IS NOT NULL AND l_quantity < 5.0
           THEN 1 END) AS below_min,
         count(CASE WHEN l_quantity IS NOT NULL AND l_quantity > 45.0
           THEN 1 END) AS above_max,
         count(l_quantity) AS checked,
         round(CAST(min(l_quantity) AS DOUBLE), 2) AS min_found,
         round(CAST(max(l_quantity) AS DOUBLE), 2) AS max_found
         FROM lineitem""",
    "q14_customer_name_pattern" ->
      """SELECT
         count(CASE WHEN c_name IS NOT NULL
           AND NOT regexp_matches(c_name, '^(?:Customer#\d{9})')
           THEN 1 END) AS mismatches,
         count(c_name) AS checked
         FROM customer""",
    "q15_events_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
         event_type,
         count(*) AS n_events,
         round(sum(value), 2) AS sum_value,
         count(DISTINCT user_id) AS n_users
         FROM events
         GROUP BY 1, 2 ORDER BY hour, event_type""",
    "q16_events_props_extract" ->
      """SELECT event_type,
         round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 4)
           AS avg_k,
         count(CAST(json_extract_string(props, '$.k') AS INT)) AS n_with_k
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q17_union_high_low_orders" ->
      """SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
         WHERE o_totalprice > 400000
         UNION ALL
         SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) FROM orders
         WHERE o_totalprice < 1000
         ORDER BY o_orderkey""",
  )

  /** A1/A4/A6: grouped aggregation — pricing summary (TPC-H Q1 shape). */
  private[graft] def pricingSummary(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_extendedprice"), 4).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** A2: latest-per-group (pandas groupby().idxmax() — first max wins).
    * Runs via the `max_by(struct(*), key)` aggregation form — partial +
    * final agg, ONE shuffle and no per-partition sort (the window form,
    * [[Analytics.latestPerGroup]], is result-identical and spec-checked
    * against this; the agg form is the scale default).
    */
  private[graft] def latestOrderPerCustomer(s: SparkSession, dir: String): DataFrame =
    Analytics.latestPerGroupAgg(
        t(s, dir, "orders"),
        Seq("o_custkey"),
        Seq(col("o_orderdate"), col("o_orderkey")))
      .select(
        col("o_custkey"),
        col("o_orderkey"),
        Fx.dateKey(col("o_orderdate")).as("o_orderdate_key"),
        col("o_totalprice"))
      .orderBy("o_custkey")

  /** T1: top-k by column (pandas nlargest). */
  private[graft] def top10Orders(s: SparkSession, dir: String): DataFrame =
    Analytics.topK(t(s, dir, "orders"), col("o_totalprice"), 10,
        col("o_orderkey"))
      .select("o_orderkey", "o_custkey", "o_totalprice")

  /** A3/T3: frequency facet counts (pandas value_counts().head). */
  private[graft] def orderPriorityFacets(s: SparkSession, dir: String): DataFrame =
    Analytics.facetCounts(t(s, dir, "orders"), col("o_orderpriority"), 10)

  /** P7/F14: regex-capture faceting (region-from-place in the reference;
    * here: leading word of part name).
    */
  private[graft] def partNameFacets(s: SparkSession, dir: String): DataFrame =
    Analytics.facetCounts(
      t(s, dir, "part"),
      regexp_extract(col("p_name"), "^(\\w+)", 1), 10)

  /** A4/A5: scalar summary stats (exact median — oracle equality). */
  private[graft] def orderPriceStats(s: SparkSession, dir: String): DataFrame =
    Analytics.summaryStats(t(s, dir, "orders"), col("o_totalprice"))
      .select(
        round(col("mean"), 4).as("mean"),
        round(col("median"), 4).as("median"),
        round(col("max"), 2).as("max"),
        round(col("sum"), 2).as("sum"),
        col("count"))

  /** J2/U2: anti-join — customers with no orders. */
  private[graft] def customersWithoutOrders(s: SparkSession, dir: String): DataFrame =
    Analytics.orphanKeys(
        t(s, dir, "customer"), t(s, dir, "orders"),
        "c_custkey", "o_custkey")
      .orderBy("c_custkey")

  /** F1-F3/F13: surrogate keys + zero-padding for dim_customer. */
  private[graft] def dimCustomerKeys(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select(
        col("c_custkey"),
        Fx.surrogateKey(col("c_custkey"), col("c_name")).as("customer_sk"),
        Fx.zeroPad(col("c_custkey"), 10).as("custkey_padded"),
        col("c_mktsegment"))
      .orderBy("c_custkey")

  /** F4-F9: generated date dimension over order dates. */
  private[graft] def dateDimension(s: SparkSession, dir: String): DataFrame =
    Fx.dateDimension(t(s, dir, "orders"), "o_orderdate")
      .select(
        date_format(col("date"), "yyyy-MM-dd").as("date_str"),
        col("date_key"), col("year"), col("quarter"), col("month"),
        col("month_name"), col("day_of_week"), col("day_of_year"),
        col("is_weekend").cast("int").as("is_weekend"))
      .orderBy("date_str")

  /** A8: duplicate-row accounting with pandas keep=False semantics —
    * all members of any duplicate group count.
    */
  private[graft] def duplicateOrderKeyStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("__n"))
      .agg(
        coalesce(sum(when(col("__n") > 1, col("__n"))), lit(0L))
          .as("duplicate_rows"),
        coalesce(sum(when(col("__n") === 1, col("__n"))), lit(0L))
          .as("unique_rows"),
        coalesce(sum(col("__n")), lit(0L)).as("total_rows"))

  /** A7/P4: per-column completeness ratios. */
  private[graft] def lineitemCompleteness(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").agg(
      round(avg(col("l_orderkey").isNotNull.cast("int")), 4)
        .as("c_orderkey"),
      round(avg(col("l_quantity").isNotNull.cast("int")), 4)
        .as("c_quantity"),
      round(avg(col("l_shipdate").isNotNull.cast("int")), 4)
        .as("c_shipdate"),
      count(lit(1)).as("total_rows"))

  /** P5/A6: range-rule accounting (violations below/above + bounds). */
  private[graft] def quantityRangeCheck(s: SparkSession, dir: String): DataFrame = {
    val q = col("l_quantity")
    t(s, dir, "lineitem").agg(
      count(when(q.isNotNull && q < 5.0, 1)).as("below_min"),
      count(when(q.isNotNull && q > 45.0, 1)).as("above_max"),
      count(q).as("checked"),
      round(min(q).cast("double"), 2).as("min_found"),
      round(max(q).cast("double"), 2).as("max_found"))
  }

  /** P6/F15: anchored pattern-rule accounting (pandas str.match). */
  private[graft] def customerNamePattern(s: SparkSession, dir: String): DataFrame = {
    val v = col("c_name").cast("string")
    t(s, dir, "customer").agg(
      count(when(v.isNotNull && !v.rlike("^(?:Customer#\\d{9})"), 1))
        .as("mismatches"),
      count(v).as("checked"))
  }

  /** Events: hourly tumbling aggregation (batch twin of the streaming
    * pipeline in graft.streaming).
    */
  private[graft] def eventsHourly(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
          .as("hour"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("sum_value"),
        countDistinct("user_id").as("n_users"))
      .orderBy("hour", "event_type")

  /** F18: JSON props extraction + grouped agg over extracted field. */
  private[graft] def eventsPropsExtract(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(
        col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy("event_type")
      .agg(
        round(avg("k"), 4).as("avg_k"),
        count(col("k")).as("n_with_k"))
      .orderBy("event_type")

  /** U1: union-by-name of heterogeneous projections with missing
    * columns → null (pandas concat outer-column behavior).
    */
  private[graft] def unionHighLowOrders(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val high = o.filter(col("o_totalprice") > 400000)
      .select(col("o_orderkey"), col("o_totalprice"),
        col("o_orderpriority"))
    val low = o.filter(col("o_totalprice") < 1000)
      .select(col("o_orderkey"), col("o_totalprice"))
    Analytics.unionAll(Seq(high, low))
      .select("o_orderkey", "o_totalprice", "o_orderpriority")
      .orderBy("o_orderkey")
  }


  import graft.dedup.Dedup
  import graft.multimodal.Multimodal
  import graft.similarity.Similarity
  import graft.text.TextAnalysis
}
