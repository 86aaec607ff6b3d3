package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

class SessionizeSpec extends AnyFunSuite {
  import TestSpark._

  test("sessions are gap-separated: consecutive sessions of a user are >30min apart") {
    val sessions = Relational.sessionize(spark, sf).collect()
    sessions.groupBy(_.getLong(0)).values.foreach { g =>
      val sorted = g.sortBy(_.getLong(1))
      // session_seq is 1..n dense
      assert(sorted.map(_.getLong(1)).toSeq === (1L to g.length))
      // start <= end within a session; gap between sessions > 30 min
      sorted.foreach { s =>
        assert(!s.getTimestamp(3).after(s.getTimestamp(4)))
        assert(s.getLong(5) >= 0)
      }
      def micros(t: java.sql.Timestamp): Long =
        t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // full microsecond precision — getTime truncates to ms, which
          // could spuriously fail a boundary gap of 30min + <1ms
          val gapUs = micros(b.getTimestamp(3)) - micros(a.getTimestamp(4))
          assert(gapUs > 1800000000L,
            s"sessions ${a.getLong(1)} and ${b.getLong(1)} not gap-separated")
        case _ =>
      }
    }
    val totalEvents = sessions.map(_.getLong(2)).sum
    assert(totalEvents === Tables.events(spark, sf).count())
  }

  test("cube contains rollup: every rollup grouping set appears in the cube") {
    val rollup = Relational.pricingRollup(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    val cube = Relational.pricingCube(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(rollup.subsetOf(cube))
    // cube adds the (null, status) sets
    assert(cube.size > rollup.size)
  }

  test("approx distinct within the configured 2% rsd of the exact count") {
    Relational.approxDistinctRaw(spark, sf).collect().foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact <= 0.06,
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }
    // the q14 gate shape: every verdict row must read true, or the
    // oracle hash (which emits literal TRUE) would mismatch
    Relational.approxDistinct(spark, sf).collect().foreach { r =>
      assert(r.getBoolean(2), s"${r.getString(0)}: within_5pct=false")
    }
  }

  test("percentiles are ordered p50 <= p90 <= p99 and within value bounds") {
    Relational.valuePercentiles(spark, sf).collect().foreach { r =>
      val (p50, p90, p99) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(p50 <= p90 && p90 <= p99)
      assert(p50 > 0 && p99 < 1000)
    }
  }
}
