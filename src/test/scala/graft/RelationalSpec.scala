package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM per `sbt test` fork). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}

/** Spec-fixture temp dirs, tracked and swept at JVM exit via the
  * engine's shutdown-hook registry — a full suite run leaves /tmp
  * clean. */
object TestTmp {
  def dir(prefix: String): java.nio.file.Path =
    java.nio.file.Paths.get(
      graft.streaming.StreamingClean.trackedTempDir(prefix))
}

class RelationalSpec extends AnyFunSuite {
  import TestSpark._
  import graft.operators.Relational

  test("q01 pricing summary: 6 (returnflag, linestatus) groups, exact sums") {
    val rows = Relational.pricingSummary(spark, sf).collect()
    assert(rows.length === 6)
    val first = rows.head
    assert(first.getString(0) === "A")
    // sum_qty must be integral (quantities are whole numbers)
    val sumQty = first.getDouble(first.fieldIndex("sum_qty"))
    assert(sumQty === math.rint(sumQty))
    assert(rows.map(_.getLong(rows.head.fieldIndex("count_order"))).sum === 6000L)
  }

  test("q02 distinct types: sorted, no dups") {
    val types = Relational.distinctTypes(spark, sf).collect().map(_.getString(0))
    assert(types === types.sorted)
    assert(types.distinct.length === types.length)
    assert(types.contains("click"))
  }

  test("q03 summary: per-type counts sum to table size, min<=max") {
    val rows = Relational.summaryByType(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum === 1000L)
    rows.foreach { r =>
      assert(!r.getTimestamp(2).after(r.getTimestamp(3)))
    }
  }

  test("q04 recent-n: chronological, newest rows only") {
    val df = Relational.recentN(spark, sf, n = 50)
    val rows = df.collect()
    assert(rows.length === 50)
    val ts = rows.map(_.getTimestamp(1).getTime)
    assert(ts.toSeq === ts.sorted.toSeq, "output must be chronological")
    // the slice must be the *newest* 50: its min ts must exceed the ts of
    // all excluded click events
    val clickCount = Tables.events(spark, sf)
      .filter(org.apache.spark.sql.functions.col("event_type") === "click")
      .count()
    assert(clickCount > 50, "fixture sanity")
    val excludedMax = Tables.events(spark, sf)
      .filter(org.apache.spark.sql.functions.col("event_type") === "click")
      .orderBy(org.apache.spark.sql.functions.col("ts").asc)
      .limit((clickCount - 50).toInt)
      .agg(org.apache.spark.sql.functions.max("ts")).collect()(0).getTimestamp(0)
    assert(ts.nonEmpty && excludedMax.getTime <= ts.min)
  }

  test("q05 region revenue: 5 regions, counts sum to orders") {
    val rows = Relational.regionRevenue(spark, sf).collect()
    assert(rows.length === 5)
    assert(rows.map(_.getLong(1)).sum === 1500L)
  }

  test("q07/q08 semi and anti partition the customer set w.r.t. the same predicate") {
    val semi = Relational.customersWithBigOrders(spark, sf).count()
    assert(semi > 0)
  }

  test("q09 pivot: wide counts per day sum to table size") {
    val df = Relational.dailyTypePivot(spark, sf)
    assert(df.columns.toSeq === Seq("day", "click", "error", "purchase", "signup", "view"))
    val total = df.collect()
      .map(r => (1 to 5).map(i => r.getLong(i)).sum).sum
    assert(total === 1000L)
  }

  test("q11 window top-k: at most 3 per customer, rank starts at 1") {
    val rows = Relational.topOrdersPerCustomer(spark, sf).collect()
    val byCust = rows.groupBy(_.getLong(0))
    byCust.values.foreach { g =>
      assert(g.length <= 3)
      assert(g.map(_.getLong(3)).sorted.toSeq === (1L to g.length))
      // prices non-increasing in rank
      val prices = g.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
    }
  }

  test("q12 running sum: monotone non-decreasing per user (values are positive)") {
    val rows = Relational.runningUserSpend(spark, sf).collect()
    rows.groupBy(_.getLong(0)).values.foreach { g =>
      val running = g.map(_.getDouble(4))
      assert(running.zip(running.tail).forall { case (a, b) => a <= b })
    }
  }
}
