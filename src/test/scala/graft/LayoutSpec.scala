package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Layout

class LayoutSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    // clear any leftover managed-table locations from prior runs
    Seq("orders_b", "lineitem_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    val orders = Tables.orders(spark, sf)
    val lineitem = Tables.lineitem(spark, sf)
    Layout.writeBucketed(orders, "orders_b", Seq("o_orderkey"), 4)
    Layout.writeBucketed(
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
      "lineitem_b", Seq("o_orderkey"), 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() === lineitem.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("salted join equals the plain join on a skewed key distribution") {
    // 90% of big-side rows share one hot key
    val big = (1 to 2000).map(i =>
        (if (i % 10 == 0) s"k$i" else "hot", i)).toDF("k", "v")
    val small = Seq(("hot", 1.0), ("k10", 2.0), ("k20", 3.0), ("zzz", 9.9))
      .toDF("k", "w")
    val plain = big.join(small, Seq("k"))
      .groupBy("k").agg(count(lit(1)).as("n"), sum($"v").as("sv"))
    val salted = Layout.saltedJoin(big, small, "k", buckets = 8)
      .groupBy("k").agg(count(lit(1)).as("n"), sum($"v").as("sv"))
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }
}
