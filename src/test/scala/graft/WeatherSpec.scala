package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Weather

/** Kernel semantics pinned against the reference's edge cases
  * (FIXTURES.md §A2; SURVEY §5.2-1/§7.4): boundary strictness, Q6
  * first-match-wins ordering, LWW dedup, empty-input passthrough,
  * idempotency, and the Q7 hourly-alignment invariant. */
class WeatherSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  /** Dirty Bronze fixture — one row per FIXTURES.md §A2 case. */
  private lazy val dirty = Seq(
    // (site, ts_utc, seq, ghi, t2m, ws) — boxed for nullability
    ("s1", ts("2024-01-01 14:00:00"), 1L, jd(100.0), jd(20.0), jd(5.0)),   // clean
    ("s1", ts("2024-01-01 15:37:12"), 2L, jd(50.0), jd(10.0), jd(1.0)),    // off-hour → 15:00
    ("s1", ts("2024-01-01 16:00:00"), 3L, jd(-5.0), jd(99.0), jd(2.0)),    // invalid_ghi (first-match-wins over temp)
    ("s1", ts("2024-01-01 17:00:00"), 4L, jd(10.0), jd(-80.1), jd(2.0)),   // invalid_temp low
    ("s1", ts("2024-01-01 18:00:00"), 5L, jd(10.0), jd(80.1), jd(2.0)),    // invalid_temp high
    ("s1", ts("2024-01-01 19:00:00"), 6L, jd(10.0), jd(20.0), jd(-0.1)),   // invalid_wind
    ("s1", ts("2024-01-01 20:00:00"), 7L, jd(0.0), jd(-80.0), jd(0.0)),    // boundary-valid (strict <)
    ("s1", ts("2024-01-01 21:00:00"), 8L, jd(80.0), jd(80.0), jd(3.0)),    // boundary-valid high
    ("s1", ts("2024-01-01 22:00:00"), 9L, null, jd(20.0), jd(2.0)),        // missing_ghi
    ("s1", ts("2024-01-01 23:00:00"), 10L, jd(10.0), null, jd(2.0)),       // missing_temp
    ("s1", ts("2024-01-02 00:00:00"), 11L, jd(10.0), jd(20.0), null),      // missing_wind
    // duplicate hour: seq 12 ingested earlier than seq 13 → 12 is the duplicate
    ("s1", ts("2024-01-02 01:05:00"), 12L, jd(11.0), jd(21.0), jd(1.0)),
    ("s1", ts("2024-01-02 01:45:00"), 13L, jd(12.0), jd(22.0), jd(2.0)),
    // second site, same hour as s1's duplicate — independent dedup
    ("s2", ts("2024-01-02 01:10:00"), 14L, jd(13.0), jd(23.0), jd(3.0)),
  ).toDF("site", "ts_utc", "ingest_seq", "ghi_wm2", "t2m_c", "ws10_mps")
    // ingested_at tracks ts_utc here; LWW order == ingest order
    .withColumn("ingested_at", col("ts_utc"))

  private def jd(d: Double): java.lang.Double = java.lang.Double.valueOf(d)

  test("Q2/Q3/Q4: boundary values kept, strict violations nulled then dropped") {
    val silver = Weather.cleanToHourly(dirty)
    val hours = silver.filter($"site" === "s1")
      .select(date_format($"ts_utc", "yyyy-MM-dd HH:mm").as("h"))
      .collect().map(_.getString(0)).sorted
    // kept: 14:00, 15:00 (off-hour binned), 20:00, 21:00 (boundaries), 01:00 (dedup winner)
    assert(hours.toSeq === Seq(
      "2024-01-01 14:00", "2024-01-01 15:00", "2024-01-01 20:00",
      "2024-01-01 21:00", "2024-01-02 01:00"))
  }

  test("Q5: last-write-wins dedup keeps max ingested_at, per site") {
    val silver = Weather.cleanToHourly(dirty)
    val dup = silver.filter($"site" === "s1"
        && $"ts_utc" === ts("2024-01-02 01:00:00")).collect()
    assert(dup.length === 1)
    assert(dup.head.getAs[Double]("ghi_wm2") === 12.0) // seq 13 wins
    val s2 = silver.filter($"site" === "s2").collect()
    assert(s2.length === 1 && s2.head.getAs[Double]("ghi_wm2") === 13.0)
  }

  test("Q7 invariant: every silver ts_utc is top-of-hour") {
    val silver = Weather.cleanToHourly(dirty)
    assert(silver.filter(minute($"ts_utc") =!= 0 || second($"ts_utc") =!= 0)
      .count() === 0)
  }

  test("Q8: empty bronze input passes through with schema intact") {
    val empty = dirty.limit(0)
    val out = Weather.cleanToHourly(empty)
    assert(out.count() === 0)
    assert(out.columns.toSeq ===
      Seq("site", "ts_utc", "ghi_wm2", "temp_c", "wind_mps"))
  }

  test("idempotency: clean(clean-shaped input) == identity on already-clean rows") {
    val silver = Weather.cleanToHourly(dirty)
    // re-feed silver as bronze (rename back, add audit cols)
    val refeed = silver.select(
      $"site", $"ts_utc", $"ghi_wm2",
      $"temp_c".as("t2m_c"), $"wind_mps".as("ws10_mps"))
      .withColumn("ingested_at", $"ts_utc")
      .withColumn("ingest_seq", lit(0L))
    val twice = Weather.cleanToHourly(refeed)
    assert(twice.count() === silver.count())
    assert(twice.exceptAll(silver).count() === 0)
  }

  test("Q6 ordering on the integrated fixture: multi-fault row counts as invalid_ghi") {
    // row seq=3 has ghi=-5 AND t2m=99; must classify as invalid_ghi.
    // Build reasons via the same logic as Weather.dropReasons but on
    // the local fixture (dropReasons itself reads the events table).
    val pre = dirty.withColumn("reason_pre",
      when($"ghi_wm2" < 0, "invalid_ghi")
        .when($"t2m_c" < -80 || $"t2m_c" > 80, "invalid_temp")
        .when($"ws10_mps" < 0, "invalid_wind")
        .when($"ghi_wm2".isNull, "missing_ghi")
        .when($"t2m_c".isNull, "missing_temp")
        .when($"ws10_mps".isNull, "missing_wind")
        .otherwise("kept"))
    val counts = pre.groupBy("reason_pre").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("invalid_ghi") === 1)
    assert(counts("invalid_temp") === 2)
    assert(counts("invalid_wind") === 1)
    assert(counts("missing_ghi") === 1)
    assert(counts.getOrElse("invalid_temp_high", 0L) === 0L)
  }

  test("drop reasons on fixture data partition the bronze row count") {
    val reasons = Weather.dropReasons(spark, sf).collect()
    val total = reasons.map(_.getLong(1)).sum
    assert(total === Tables.events(spark, sf).count())
    val kept = reasons.find(_.getString(0) == "kept").map(_.getLong(1)).get
    assert(kept === Weather.silverClean(spark, sf).count())
  }

  test("gold KPIs: capacity factors within DDL bounds [0, 1.2]") {
    val kpis = Weather.goldKpis(spark, sf).collect()
    kpis.foreach { r =>
      val pv = r.getAs[Double]("pv_cf"); val wd = r.getAs[Double]("wind_cf")
      assert(pv >= 0 && pv <= 1.2)
      assert(wd >= 0 && wd <= 1.2)
    }
  }

  test("completeness: range-invalid values count as unavailable (app.py:519-526)") {
    val comp = Weather.completeness(spark, sf)
      .filter($"variable" === "t2m_c")
      .select($"site", $"ts_hour", $"available")
    // availability on raw non-nullness only (the pre-fix semantics)
    val naive = Weather.bronze(spark, sf)
      .groupBy($"site", date_trunc("hour", $"ts_utc").as("ts_hour"))
      .agg(min(when($"t2m_c".isNotNull, 1).otherwise(0)).as("naive"))
    val joined = comp.join(naive, Seq("site", "ts_hour")).collect()
    assert(joined.forall(r => r.getAs[Int]("available") <= r.getAs[Int]("naive")),
      "validation can only remove availability")
    // the %79 dirt injects t2m=200 (present but out of range): at least
    // one hour must flip from naively-available to unavailable
    assert(joined.exists(r =>
      r.getAs[Int]("available") == 0 && r.getAs[Int]("naive") == 1))
  }

  test("forecast baseline: 48 horizons per site per var, yhat >= 0") {
    val fc = Weather.forecastBaseline(spark, sf).collect()
    val bySiteVar = fc.groupBy(r => (r.getString(0), r.getAs[String]("var")))
    assert(bySiteVar.keys.map(_._2).toSet === Set("pv", "wind"))
    bySiteVar.values.foreach { g =>
      assert(g.length === Weather.BaselineHorizons)
      assert(g.map(_.getAs[Int]("horizon_h")).sorted.toSeq
        === (1 to Weather.BaselineHorizons))
      assert(g.forall(_.getAs[Double]("yhat") >= 0))
    }
    // seasonal-naive past one season: h and h+24 read the same source
    // hour, so (site, var, yhat) agree between the two horizon days
    val byKey = fc.groupBy(r => (r.getString(0), r.getAs[String]("var")))
    byKey.values.foreach { g =>
      val byH = g.map(r => r.getAs[Int]("horizon_h") -> r.getAs[Double]("yhat")).toMap
      (1 to 24).foreach(h => assert(byH(h) === byH(h + 24)))
    }
    // wind capped by the 10 MWh power-curve clamp carried from features
    fc.filter(_.getAs[String]("var") == "wind")
      .foreach(r => assert(r.getAs[Double]("yhat") <= 10.0))
  }

  test("upsert merge: overlap region comes entirely from the incoming batch") {
    val merged = Weather.upsertMerge(spark, sf)
    val overlap = merged.filter(
      $"ts_hour" >= lit("2024-01-10").cast("timestamp")
        && $"ts_hour" < lit("2024-01-16").cast("timestamp"))
    assert(overlap.filter($"batch" === "old").count() === 0)
    assert(overlap.filter($"batch" === "new").count() > 0)
  }
}
