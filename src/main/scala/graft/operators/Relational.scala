package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.functions.Exact._
import graft.syntax._

/** Relational core: the reference's scan/filter/aggregate/top-k/join/
  * reshape surface (SURVEY.md §2.1, §2.3–§2.7) expressed over the
  * driver fixture tables.
  *
  * Scale notes (local[32] now, 1000 executors later):
  *  - Dimension joins (region/nation/customer) are explicitly
  *    `broadcast()` — no shuffle of the fact side.
  *  - Fact-fact joins (lineitem ⋈ orders) shuffle on the join key once;
  *    aggregations afterwards reuse the same key where possible.
  *  - Top-k queries compile to TakeOrderedAndProject (no global sort).
  *  - All money aggregates use the exact decimal-sum helpers (see
  *    [[graft.functions.Exact]]) so results are partition-order
  *    independent — a correctness property, not just an oracle trick.
  */
object Relational {

  /** q01 — TPC-H-Q1-style pricing summary (SURVEY A1/A4/W3; reference
    * summary aggregates at fastapi/app/main.py:81-104). Partial
    * aggregation (map-side combine) happens automatically in the
    * hash-aggregate; 6 groups → tiny shuffle.
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        dsumRevenue($"l_extendedprice", $"l_discount").as("sum_disc_price"),
        dsumCharge($"l_extendedprice", $"l_discount", $"l_tax").as("sum_charge"),
        davg($"l_quantity").as("avg_qty"),
        davg($"l_extendedprice").as("avg_price"),
        davg($"l_discount").as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val pricingSummarySql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${sqlDsum("l_quantity")} AS sum_qty,
       |  ${sqlDsum("l_extendedprice")} AS sum_base_price,
       |  ${sqlDsumRevenue("l_extendedprice", "l_discount")} AS sum_disc_price,
       |  ${sqlDsumCharge("l_extendedprice", "l_discount", "l_tax")} AS sum_charge,
       |  ${sqlDavg("l_quantity")} AS avg_qty,
       |  ${sqlDavg("l_extendedprice")} AS avg_price,
       |  ${sqlDavg("l_discount")} AS avg_disc,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** q02 — distinct key list (SURVEY A2; reference fetch_sites,
    * fastapi/app/main.py:74-77). Distinct on a low-cardinality column:
    * partial distinct map-side, 5-row shuffle. */
  def distinctTypes(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select($"event_type").distinct().orderBy($"event_type")

  val distinctTypesSql: String =
    "SELECT DISTINCT event_type FROM events ORDER BY event_type"

  /** q03 — per-key count/min/max summary (SURVEY A1; reference
    * fetch_weather_summary, fastapi/app/main.py:81-104). */
  def summaryByType(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n_rows"),
        min($"ts").as("min_ts"),
        max($"ts").as("max_ts"),
        countDistinct($"user_id").as("n_users"))
      .orderBy($"event_type")

  val summaryByTypeSql: String =
    """SELECT event_type, COUNT(*) AS n_rows, MIN(ts) AS min_ts,
      |  MAX(ts) AS max_ts, COUNT(DISTINCT user_id) AS n_users
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q04 — recent-N time slice, newest n rows re-sorted chronological
    * (SURVEY W1; reference fetch_hourly_rows, fastapi/app/main.py:
    * 112-124,141-154). The DESC limit compiles to
    * TakeOrderedAndProject — true top-k, no full sort; the final ASC
    * sort is over ≤336 rows. event_id is the deterministic tiebreak.
    */
  def recentN(spark: SparkSession, dir: String, n: Int = 336): DataFrame =
    Tables.events(spark, dir)
      .filter($"event_type" === "click")
      .select($"event_id", $"ts", $"user_id", $"value")
      .orderBy($"ts".desc, $"event_id".desc)
      .limit(n)
      .orderBy($"ts".asc, $"event_id".asc)

  val recentNSql: String =
    """SELECT * FROM (
      |  SELECT event_id, ts, user_id, value FROM events
      |  WHERE event_type = 'click'
      |  ORDER BY ts DESC, event_id DESC LIMIT 336)
      |ORDER BY ts ASC, event_id ASC""".stripMargin

  /** q05 — star-schema rollup: orders → customer → nation → region
    * (SURVEY JN2-shape). Dimensions are broadcast — the orders fact
    * table never shuffles for the joins, only for the 5-group
    * aggregate. */
  def regionRevenue(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir).select($"c_custkey", $"c_nationkey")
    val n = Tables.nation(spark, dir).select($"n_nationkey", $"n_regionkey")
    val r = Tables.region(spark, dir)
    o.join(broadcast(c), $"o_custkey" === $"c_custkey")
      .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name")
      .agg(count(lit(1)).as("n_orders"),
           dsum($"o_totalprice").as("total_revenue"))
      .orderBy($"r_name")
  }

  val regionRevenueSql: String =
    s"""SELECT r_name, COUNT(*) AS n_orders,
       |  ${sqlDsum("o_totalprice")} AS total_revenue
       |FROM orders
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY r_name ORDER BY r_name""".stripMargin

  /** q06 — fact-fact join + composite-key aggregate: lineitem ⋈ orders
    * on orderkey, revenue per (priority, ship year-month). One shuffle
    * for the join (or none if AQE converts to broadcast at small SF),
    * one for the ~400-group aggregate. */
  def priorityMonthlyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
    val o = Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_orderpriority")
    li.join(o, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
           dsumRevenue($"l_extendedprice", $"l_discount").as("revenue"))
      .orderBy($"o_orderpriority")
  }

  val priorityMonthlyRevenueSql: String =
    s"""SELECT o_orderpriority, COUNT(*) AS n_items,
       |  ${sqlDsumRevenue("l_extendedprice", "l_discount")} AS revenue
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** q07 — left-semi join / EXISTS (SURVEY P5 membership validation;
    * reference 404 check at fastapi/app/main.py:221-222): customers
    * that have at least one big order. */
  def customersWithBigOrders(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val big = Tables.orders(spark, dir)
      .filter($"o_totalprice" > 450000.0)
      .select($"o_custkey")
    c.join(big, $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  val customersWithBigOrdersSql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)
      |ORDER BY c_custkey""".stripMargin

  /** q08 — left-anti join / NOT EXISTS (the insert-half of the upsert
    * merge, SURVEY JN3): customers with no order since 2001. The date
    * filter is pushed below the join into the orders scan. */
  def customersWithoutOrders(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit("2001-01-01").cast(TimestampType))
      .select($"o_custkey")
    c.join(o, $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  val customersWithoutOrdersSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2001-01-01')
      |ORDER BY c_custkey""".stripMargin

  /** q09 — pivot to wide (SURVEY SO3; reference series pivot at
    * fastapi/app/etl/nasa.py:103-107): daily counts per event type as
    * columns. Explicit pivot values → no extra distinct-collect job. */
  def dailyTypePivot(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(date_trunc("day", $"ts").as("day"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy($"day")

  val dailyTypePivotSql: String =
    """SELECT date_trunc('day', ts) AS day,
      |  COUNT(*) FILTER (WHERE event_type = 'click') AS click,
      |  COUNT(*) FILTER (WHERE event_type = 'error') AS error,
      |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      |  COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
      |  COUNT(*) FILTER (WHERE event_type = 'view') AS view
      |FROM events GROUP BY 1 ORDER BY day""".stripMargin

  /** q10 — unpivot/melt to long (SURVEY SO2; reference completeness
    * melt at streamlit/app.py:525-526): lineitem measures → one row per
    * (line, metric). Narrow transform — no shuffle until the sort. */
  def lineitemUnpivot(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter($"l_orderkey" < 1000)
      .select($"l_orderkey", $"l_linenumber",
              $"l_quantity", $"l_extendedprice", $"l_discount")
      .unpivot(
        Array($"l_orderkey", $"l_linenumber"),
        Array($"l_quantity", $"l_extendedprice", $"l_discount"),
        "metric", "val")
      .orderBy($"l_orderkey", $"l_linenumber", $"metric")

  val lineitemUnpivotSql: String =
    """SELECT l_orderkey, l_linenumber, metric, val FROM (
      |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS val
      |  FROM lineitem WHERE l_orderkey < 1000
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
      |  FROM lineitem WHERE l_orderkey < 1000
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
      |  FROM lineitem WHERE l_orderkey < 1000)
      |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin

  /** q11 — ranked window / top-k per group (SURVEY W2; the dedup-rank
    * pattern at transform/silver_clean.py:99-101): top-3 orders per
    * customer. One shuffle on o_custkey; rank inside partitions. */
  def topOrdersPerCustomer(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    Tables.orders(spark, dir)
      .filter($"o_custkey" < 300)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
      .withColumn("rn", row_number().over(w).cast(LongType))
      .filter($"rn" <= 3)
      .orderBy($"o_custkey", $"rn")
  }

  val topOrdersPerCustomerSql: String =
    """SELECT * FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      |  FROM orders WHERE o_custkey < 300)
      |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  /** q12 — running aggregate over an explicit ROWS frame (SURVEY §2.6;
    * groundwork for the mart_forecast rolling features). Decimal
    * accumulation keeps the running sum exact regardless of how either
    * engine internally accumulates the frame. */
  def runningUserSpend(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts".asc, $"event_id".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .filter($"user_id" < 20)
      .select($"user_id", $"event_id", $"ts", $"value")
      .withColumn("running_value",
        sum($"value".cast(DecimalType(12, 2))).over(w).cast(DoubleType))
      .orderBy($"user_id", $"ts", $"event_id")
  }

  /** q13 — hierarchical ROLLUP totals (subtotal + grand-total rows),
    * the grouping-sets surface a reporting layer needs at scale; the
    * partial-aggregation tree means the rollup costs barely more than
    * the leaf aggregate. NULLS FIRST pinned in the oracle (DuckDB
    * defaults NULLS LAST; Spark defaults NULLS FIRST). */
  def pricingRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(dsum($"l_quantity").as("sum_qty"),
           count(lit(1)).as("n_rows"),
           (grouping($"l_returnflag") * 2 + grouping($"l_linestatus"))
             .cast(LongType).as("gid"))
      .orderBy($"gid", $"l_returnflag".asc_nulls_first,
               $"l_linestatus".asc_nulls_first)

  val pricingRollupSql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${sqlDsum("l_quantity")} AS sum_qty,
       |  COUNT(*) AS n_rows,
       |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid
       |FROM lineitem
       |GROUP BY ROLLUP(l_returnflag, l_linestatus)
       |ORDER BY gid, l_returnflag ASC NULLS FIRST,
       |  l_linestatus ASC NULLS FIRST""".stripMargin

  /** q14 — approximate distinct counting (HyperLogLog++): the
    * mergeable-sketch aggregate that replaces exact COUNT(DISTINCT) at
    * 100 TB (constant memory per group, partial sketches merge across
    * partitions — no giant distinct shuffle).
    *
    * Oracle discipline (VERDICT r6 item 5): the raw estimate is
    * engine-specific by construction (HLL register layouts differ), so
    * the HASHED output carries the exact count plus a boolean
    * `within_5pct` VERDICT — Spark computes |approx−exact| ≤ 5%·exact,
    * the oracle emits literal TRUE. A hash match therefore proves the
    * sketch landed within the bound (rsd=0.02 ⇒ 5% is 2.5σ); the
    * estimate itself stays observable via [[approxDistinctRaw]] and
    * the tighter 2%-rsd spec in SessionizeSpec. */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    approxDistinctRaw(spark, dir)
      .select($"event_type", $"exact_users",
        (abs($"approx_users" - $"exact_users")
          <= lit(0.05) * $"exact_users").as("within_5pct"))

  /** q14's dev/audit form WITH the engine-specific estimate column. */
  def approxDistinctRaw(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy($"event_type")
      .agg(approx_count_distinct($"user_id", rsd = 0.02).as("approx_users"),
           countDistinct($"user_id").as("exact_users"))
      .orderBy($"event_type")

  val approxDistinctSql: String =
    """SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
      |  TRUE AS within_5pct
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q17 — gap-based sessionization: a new session starts after a
    * 30-minute silence per user (lag → flag → running sum → per-session
    * aggregate). The batch twin of streaming session windows; one
    * shuffle on user_id, everything else window-local. */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"ts")
      .withColumn("prev_ts", lag($"ts", 1).over(wOrd))
      .withColumn("new_session",
        when($"prev_ts".isNull
          || unix_micros($"ts") - unix_micros($"prev_ts") > 1800000000L, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum($"new_session").over(wRun))
      .groupBy($"user_id", $"session_seq")
      .agg(count(lit(1)).as("n_events"),
           min($"ts").as("session_start"),
           max($"ts").as("session_end"))
      .withColumn("duration_us",
        unix_micros($"session_end") - unix_micros($"session_start"))
      .orderBy($"user_id", $"session_seq")
  }

  val sessionizeSql: String =
    """WITH flagged AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
      |sessions AS (
      |  SELECT user_id, event_id, ts,
      |    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
      |  FROM flagged)
      |SELECT user_id, session_seq, COUNT(*) AS n_events,
      |  MIN(ts) AS session_start, MAX(ts) AS session_end,
      |  epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us
      |FROM sessions GROUP BY user_id, session_seq
      |ORDER BY user_id, session_seq""".stripMargin

  /** q18 — CUBE over (returnflag, linestatus): all 4 grouping sets in
    * one pass (the Expand operator fans each row out; partial
    * aggregation keeps the shuffle tiny). */
  def pricingCube(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube($"l_returnflag", $"l_linestatus")
      .agg(dsum($"l_quantity").as("sum_qty"),
           count(lit(1)).as("n_rows"),
           (grouping($"l_returnflag") * 2 + grouping($"l_linestatus"))
             .cast(LongType).as("gid"))
      .orderBy($"gid", $"l_returnflag".asc_nulls_first,
               $"l_linestatus".asc_nulls_first)

  val pricingCubeSql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${sqlDsum("l_quantity")} AS sum_qty,
       |  COUNT(*) AS n_rows,
       |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid
       |FROM lineitem
       |GROUP BY CUBE(l_returnflag, l_linestatus)
       |ORDER BY gid, l_returnflag ASC NULLS FIRST,
       |  l_linestatus ASC NULLS FIRST""".stripMargin

  /** q19 — exact interpolated percentiles per group (median + p90 of
    * event value). Both engines interpolate linearly on the sorted
    * values; the 6dp rounding absorbs any last-ulp formula difference. */
  def valuePercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy($"event_type")
      .agg(round(expr("percentile(value, 0.5)"), 6).as("p50"),
           round(expr("percentile(value, 0.9)"), 6).as("p90"),
           round(expr("percentile(value, 0.99)"), 6).as("p99"))
      .orderBy($"event_type")

  val valuePercentilesSql: String =
    """SELECT event_type,
      |  ROUND(quantile_cont(value, 0.5), 6) AS p50,
      |  ROUND(quantile_cont(value, 0.9), 6) AS p90,
      |  ROUND(quantile_cont(value, 0.99), 6) AS p99
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q15 — set operations (INTERSECT / EXCEPT): customers who buy in
    * both the BUILDING and MACHINERY segments' order pools vs only the
    * first. INTERSECT and EXCEPT are distinct-based set ops, so both
    * reduce to membership flags over the distinct key space: ONE
    * customer⋈orders join feeding ONE hash aggregate that tracks
    * per-segment membership, from which both set results fall out as
    * filters. The naive form (materialize each side, then
    * intersect + except) scans the join twice and shuffles four times;
    * this shape is what a 100 TB set-op should compile to. Parity with
    * real INTERSECT/EXCEPT is pinned in RelationalSpec. */
  def customerSetOps(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val flags = c.filter($"c_mktsegment".isin("BUILDING", "MACHINERY"))
      .join(o, $"c_custkey" === $"o_custkey")
      .filter($"o_totalprice" > 300000.0)
      .groupBy($"c_nationkey")
      .agg(
        max(($"c_mktsegment" === "BUILDING").cast("int")).as("in_b"),
        max(($"c_mktsegment" === "MACHINERY").cast("int")).as("in_m"))
    flags.select($"c_nationkey",
        when($"in_b" === 1 && $"in_m" === 1, lit("intersect"))
          .when($"in_b" === 1, lit("except")).as("set_op"))
      .filter($"set_op".isNotNull)
      .orderBy($"set_op", $"c_nationkey")
  }

  val customerSetOpsSql: String =
    """WITH b AS (
      |  SELECT c_nationkey FROM customer JOIN orders ON c_custkey = o_custkey
      |  WHERE c_mktsegment = 'BUILDING' AND o_totalprice > 300000.0),
      |m AS (
      |  SELECT c_nationkey FROM customer JOIN orders ON c_custkey = o_custkey
      |  WHERE c_mktsegment = 'MACHINERY' AND o_totalprice > 300000.0)
      |SELECT c_nationkey, 'intersect' AS set_op FROM (SELECT * FROM b INTERSECT SELECT * FROM m)
      |UNION ALL
      |SELECT c_nationkey, 'except' FROM (SELECT * FROM b EXCEPT SELECT * FROM m)
      |ORDER BY set_op, c_nationkey""".stripMargin

  /** q16 — as-of join via last-observation-carried-forward: for every
    * event, the most recent strictly-earlier 'error' event of the same
    * user. The union-free window formulation is the scalable as-of
    * shape — one shuffle on the partition key, no range-join blowup
    * (SURVEY §4.3 lists as-of as the canonical custom-operator
    * candidate; the LOCF window covers the reference-adjacent case
    * without a custom SparkPlan). */
  def asofLastError(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts".asc, $"event_id".asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, dir)
      .select($"event_id", $"user_id", $"ts", $"event_type")
      .withColumn("prev_error_ts",
        last(when($"event_type" === "error", $"ts"), ignoreNulls = true)
          .over(w))
      .withColumn("gap_us",
        unix_micros($"ts") - unix_micros($"prev_error_ts"))
      .orderBy($"event_id")
  }

  val asofLastErrorSql: String =
    """SELECT event_id, user_id, ts, event_type, prev_error_ts,
      |  epoch_us(ts) - epoch_us(prev_error_ts) AS gap_us
      |FROM (
      |  SELECT event_id, user_id, ts, event_type,
      |    LAST_VALUE(CASE WHEN event_type = 'error' THEN ts END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      AS prev_error_ts
      |  FROM events)
      |ORDER BY event_id""".stripMargin

  val runningUserSpendSql: String =
    """SELECT user_id, event_id, ts, value,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER (
      |    PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    AS running_value
      |FROM events WHERE user_id < 20
      |ORDER BY user_id, ts, event_id""".stripMargin
}
