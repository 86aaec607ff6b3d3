package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator from SURVEY.md §2 (or a
  * north-star training-data-pipeline operator) expressed over the
  * driver fixture tables; `oracleSql` holds the DuckDB-equivalent SQL
  * for the hash-parity check. Column names and ordering are aligned
  * 1:1 between the two. Queries whose semantics aren't SQL-expressible
  * omit the oracle entry (rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.pricingSummary(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary"   -> (Relational.pricingSummary(_, _)),
    "q02_distinct_types"    -> (Relational.distinctTypes(_, _)),
    "q03_summary_by_type"   -> (Relational.summaryByType(_, _)),
    "q04_recent_n"          -> (Relational.recentN(_, _)),
    "q05_region_revenue"    -> (Relational.regionRevenue(_, _)),
    "q06_priority_revenue"  -> (Relational.priorityMonthlyRevenue(_, _)),
    "q07_exists_big_orders" -> (Relational.customersWithBigOrders(_, _)),
    "q08_anti_no_orders"    -> (Relational.customersWithoutOrders(_, _)),
    "q09_pivot_daily"       -> (Relational.dailyTypePivot(_, _)),
    "q10_unpivot_lineitem"  -> (Relational.lineitemUnpivot(_, _)),
    "q11_window_topk"       -> (Relational.topOrdersPerCustomer(_, _)),
    "q12_running_sum"       -> (Relational.runningUserSpend(_, _)),
  )

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary"   -> Relational.pricingSummarySql,
    "q02_distinct_types"    -> Relational.distinctTypesSql,
    "q03_summary_by_type"   -> Relational.summaryByTypeSql,
    "q04_recent_n"          -> Relational.recentNSql,
    "q05_region_revenue"    -> Relational.regionRevenueSql,
    "q06_priority_revenue"  -> Relational.priorityMonthlyRevenueSql,
    "q07_exists_big_orders" -> Relational.customersWithBigOrdersSql,
    "q08_anti_no_orders"    -> Relational.customersWithoutOrdersSql,
    "q09_pivot_daily"       -> Relational.dailyTypePivotSql,
    "q10_unpivot_lineitem"  -> Relational.lineitemUnpivotSql,
    "q11_window_topk"       -> Relational.topOrdersPerCustomerSql,
    "q12_running_sum"       -> Relational.runningUserSpendSql,
  )
}
