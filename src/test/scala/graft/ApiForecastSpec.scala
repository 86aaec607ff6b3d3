package graft

import java.time.LocalDate

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Forecast, Weather, WeatherApi}

class WeatherApiSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val bronze = Weather.bronze(spark, sf)
  private lazy val silver = Weather.cleanToHourly(bronze)

  test("/sites: sorted distinct site list") {
    val s = WeatherApi.sites(silver).collect().map(_.getString(0))
    assert(s.toSeq === s.sorted.toSeq && s.distinct.length === s.length)
  }

  test("unknown site raises the 404 analogue on hourly, raw, and metrics") {
    intercept[WeatherApi.UnknownSiteException] {
      WeatherApi.recentHours(bronze, silver, "nope", 24)
    }
    intercept[WeatherApi.UnknownSiteException] {
      WeatherApi.recentRaw(bronze, "nope", 24)
    }
    intercept[WeatherApi.UnknownSiteException] {
      WeatherApi.metrics(bronze, silver, "nope")
    }
  }

  test("site membership is judged on Bronze (a fully-dropped site is not a 404)") {
    // restrict silver to exclude one site entirely; bronze still has it
    val silverNoClick = silver.filter(col("site") =!= "click")
    val rows = WeatherApi.recentHours(bronze, silverNoClick, "click", 24)
    assert(rows.count() === 0) // 200 + empty, like the reference
  }

  test("summary: empty filter yields (0, null, null)") {
    val r = WeatherApi.summary(silver.filter(lit(false))).collect()(0)
    assert(r.getLong(0) === 0L && r.isNullAt(1) && r.isNullAt(2))
  }

  test("recentHours: hours clamped to [1,336], chronological output") {
    val rows = WeatherApi.recentHours(bronze, silver, "click", 10000).collect()
    assert(rows.length <= WeatherApi.MaxHours)
    val ts = rows.map(_.getTimestamp(1).getTime)
    assert(ts.toSeq === ts.sorted.toSeq)
    assert(WeatherApi.clampHours(0) === 1)
    assert(WeatherApi.clampHours(9999) === 336)
  }

  test("metrics: kept_pct consistent with row counts") {
    val m = WeatherApi.metrics(bronze, silver, "click").collect()(0)
    val raw = m.getLong(1); val kept = m.getLong(2)
    assert(m.getDouble(3) === kept.toDouble / raw * 100)
    assert(m.getLong(4) === math.max(raw - kept, 0L))
  }

  test("toJsonRows: Python-isoformat timestamps in JSON output") {
    val js = WeatherApi.toJsonRows(silver.limit(1)).collect()(0)
    // datetime.isoformat() parity: +00:00 offset, no .000000 for whole
    // seconds (main.py:22-23)
    assert(js.matches(""".*"ts_utc":"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\+00:00".*"""),
      s"got $js")
    import spark.implicits._
    val frac = Seq(java.sql.Timestamp.valueOf("2024-01-01 01:02:03.0405"))
      .toDF("ts")
    val js2 = WeatherApi.toJsonRows(frac).collect()(0)
    assert(js2.contains("\"2024-01-01T01:02:03.040500+00:00\""), s"got $js2")
  }

  test("ingestWindows: 7-day chunks, inclusive remainder, validation") {
    val w = WeatherApi.ingestWindows(
      LocalDate.of(2024, 1, 1), LocalDate.of(2024, 1, 17))
    assert(w === Seq(
      (LocalDate.of(2024, 1, 1), LocalDate.of(2024, 1, 7)),
      (LocalDate.of(2024, 1, 8), LocalDate.of(2024, 1, 14)),
      (LocalDate.of(2024, 1, 15), LocalDate.of(2024, 1, 17))))
    // single-day window
    assert(WeatherApi.ingestWindows(
      LocalDate.of(2024, 2, 1), LocalDate.of(2024, 2, 1)).size === 1)
    intercept[IllegalArgumentException] {
      WeatherApi.ingestWindows(LocalDate.of(2024, 2, 2), LocalDate.of(2024, 2, 1))
    }
  }

  test("F8 formatting: magnitude-dependent decimals, signed pct, buckets") {
    import spark.implicits._
    val df = Seq(1234.567, 12.345, -3.2, 0.0)
      .toDF("x")
      .select(
        WeatherApi.formatMetric(col("x")).as("m"),
        WeatherApi.formatPct(col("x")).as("p"),
        WeatherApi.pctBucket(col("x")).as("b"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    // _format_delta parity (app.py:320-327): sign for >= 0 (so +0.0%),
    // %.1f without thousands separators, positive/negative/neutral
    assert(rows(0) === ("1,235", "+1234.6%", "positive"))
    assert(rows(1) === ("12.3", "+12.3%", "positive"))
    assert(rows(2) === ("-3.2", "-3.2%", "negative"))
    assert(rows(3) === ("0.0", "+0.0%", "neutral"))
    val nulls = Seq[Option[Double]](None).toDF("x")
      .select(WeatherApi.formatMetric(col("x")), WeatherApi.pctBucket(col("x")),
              WeatherApi.formatPct(col("x")))
      .collect()(0)
    assert(nulls.getString(0) === "--" && nulls.getString(1) === "neutral")
    assert(nulls.getString(2) === "N/A")
  }
}

class ForecastSpec extends AnyFunSuite {
  import TestSpark._

  test("q30 sarimax-slot forecast honors the mart_forecast contract") {
    val fc = Forecast.forecastMl(spark, sf).collect()
    val bySiteVar = fc.groupBy(r => (r.getString(0), r.getString(3)))
    assert(bySiteVar.nonEmpty)
    assert(bySiteVar.keys.map(_._2).toSet === Set("pv", "wind"),
      "both DDL vars (init.sql:65) must be forecast")
    bySiteVar.values.foreach { g =>
      assert(g.length === Forecast.Horizons)
      assert(g.map(_.getInt(4)).sorted.toSeq === (1 to 48))
      g.foreach { r =>
        val yhat = r.getDouble(5)
        val lo = r.getDouble(6); val hi = r.getDouble(7)
        assert(yhat >= 0.0 && lo >= 0.0)
        assert(lo <= yhat && yhat <= hi)
        assert(r.getString(2) === "sarimax")
      }
    }
  }

  test("q30 fit is partition-order-invariant: identical coefficient " +
       "BITS under any repartitioning (the exact-statistics pin)") {
    // the hash gate rests on the sufficient statistics being exact
    // integer sums — order-independent by construction. Pin it: a
    // float-sum formulation would drift in the last ulps across
    // partitionings and this comparison is BIT equality, not a
    // tolerance.
    val train = Forecast.buildTrain(Forecast.history(spark, sf))
      .localCheckpoint(true)
    val a = Forecast.fitNormal(train.repartition(1))
    val b = Forecast.fitNormal(train.repartition(13))
    Seq("pv", "wind").foreach { v =>
      val (ba, ra) = a(v); val (bb, rb) = b(v)
      assert(ba.map(java.lang.Double.doubleToLongBits).toSeq ===
        bb.map(java.lang.Double.doubleToLongBits).toSeq,
        s"$v coefficients drifted across partitionings")
      assert(java.lang.Double.doubleToLongBits(ra) ===
        java.lang.Double.doubleToLongBits(rb), s"$v rmse drifted")
    }
  }

  test("q29/q30 satisfy every mart_forecast DDL CHECK; created_at is the " +
       "site's newest feature audit stamp (init.sql:61-73)") {
    import graft.schema.{Schemas, Validator}
    val expected = Weather.goldFeatures(spark, sf)
      .groupBy(col("site")).agg(max(col("computed_at")).as("created_at"))
      .collect().map(r => r.getString(0) -> r.getTimestamp(1)).toMap
    Seq(Forecast.forecastMl(spark, sf),
        Weather.forecastBaseline(spark, sf)).foreach { fc =>
      val v = Validator.violations(fc, Schemas.martForecastChecks)
      assert(v.values.forall(_ == 0), s"DDL CHECK violations: $v")
      val stamps = fc.select(col("site"), col("created_at")).distinct()
        .collect().map(r => r.getString(0) -> r.getTimestamp(1)).toMap
      assert(stamps === expected,
        "created_at must be deterministic (max computed_at per site), " +
          "not wall-clock NOW()")
    }
  }

  test("training frame: lags align (lag24 equals the value 24 rows back)") {
    val t = Forecast.trainingFrame(Weather.goldFeatures(spark, sf))
      .filter(col("site") === "click").orderBy("ts_utc").collect()
    assert(t.nonEmpty)
  }

  test("MLlib LinearRegression(solver=normal) matches Forecast.solve " +
       "within 1e-8 (coefficients and RMSE, both vars)") {
    val train = Forecast.buildTrain(Forecast.history(spark, sf))
    // equivalence is pinned at the unregularized point: MLlib's ridge
    // acts on standardized, intercept-excluded coefficients, which no
    // fixed raw-space λ reproduces — at regParam 0 both solve the
    // identical OLS normal equations
    val ours = Forecast.fitNormal(train, ridge = 0.0)
    val mllib = Forecast.fitMllib(train, regParam = 0.0)
    Seq("pv", "wind").foreach { v =>
      val (bOurs, rmseOurs) = ours(v)
      val (bMl, rmseMl) = mllib(v)
      assert(bOurs.length === bMl.length)
      bOurs.zip(bMl).zipWithIndex.foreach { case ((a, b), i) =>
        assert(math.abs(a - b) <= 1e-8, s"$v beta($i): $a vs $b")
      }
      assert(math.abs(rmseOurs - rmseMl) <= 1e-8, s"$v rmse")
    }
  }

  test("forecastMlLib: the MLlib-backed variant honors the same " +
       "mart_forecast contract and stays within ridge-distance of q30") {
    import graft.schema.{Schemas, Validator}
    val ml = Forecast.forecastMlLib(spark, sf)
    val v = Validator.violations(ml, Schemas.martForecastChecks)
    assert(v.values.forall(_ == 0), s"DDL CHECK violations: $v")
    val rows = ml.collect()
    val q30 = Forecast.forecastMl(spark, sf).collect()
    assert(rows.length === q30.length)
    // identical keys in identical order; yhat differs only by the
    // 1e-6 ridge the production fit keeps for determinism
    rows.zip(q30).foreach { case (a, b) =>
      assert(a.getString(0) === b.getString(0))
      assert(a.getAs[String]("var") === b.getAs[String]("var"))
      assert(a.getAs[Int]("horizon_h") === b.getAs[Int]("horizon_h"))
      assert(math.abs(a.getAs[Double]("yhat") - b.getAs[Double]("yhat"))
        <= 1e-3, s"yhat drift beyond ridge distance: $a vs $b")
    }
  }
}
