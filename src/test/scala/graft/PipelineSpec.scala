package graft

import java.time.LocalDate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Weather
import graft.sources.NasaIngest

/** End-to-end pipeline gates (VERDICT r5 #1): the composed
  * fetch → Bronze store → Silver store → marts callable publishes
  * exactly what the in-memory kernel computes, re-running it is a
  * no-op, and the NASA-source flavor drives the full nasa.py:160-192
  * loop through a fixture-JSON transport (no network). */
class PipelineSpec extends AnyFunSuite {
  import TestSpark._

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("q38: published Silver store == in-memory silver kernel; " +
       "re-running the pipeline is a no-op on every store") {
    val root = TestTmp.dir("graft-pipe-").toString + "/wh"
    val wh = Pipeline.Warehouse(root)
    val r1 = Pipeline.run(spark, sf, root)
    val silver1 = rows(spark.read.parquet(wh.silver).orderBy("site", "ts_utc"))
    val marts1 = rows(spark.read.parquet(wh.martFeatures)
      .orderBy("site", "ts_utc"))

    // the published store replays the batch kernel exactly
    val expected = rows(Weather.silverClean(spark, sf))
    val published = rows(spark.read.parquet(wh.silver)
      .select(col("site"), col("ts_utc"), col("ghi_wm2"),
              col("temp_c"), col("wind_mps"))
      .orderBy("site", "ts_utc"))
    assert(published === expected)

    // idempotency: run ∘ run == run, stage by stage
    val r2 = Pipeline.run(spark, sf, root)
    assert(r2 === r1)
    assert(rows(spark.read.parquet(wh.silver)
      .orderBy("site", "ts_utc")) === silver1)
    assert(rows(spark.read.parquet(wh.martFeatures)
      .orderBy("site", "ts_utc")) === marts1)
  }

  test("incremental refineSilver(sinceDs) merges only the touched " +
       "partitions and converges to the full re-clean") {
    val root = TestTmp.dir("graft-pipe-inc-").toString + "/wh"
    val wh = Pipeline.Warehouse(root)
    Pipeline.ingestEvents(spark, sf, wh)
    Pipeline.refineSilver(spark, wh)
    val full = rows(spark.read.parquet(wh.silver).orderBy("site", "ts_utc"))
    val cut = spark.read.parquet(wh.bronze)
      .agg(max(col("ds"))).collect()(0).getDate(0).toLocalDate
    // a bounded re-clean of the last day only: no-op content-wise
    Pipeline.refineSilver(spark, wh, sinceDs = Some(cut))
    assert(rows(spark.read.parquet(wh.silver)
      .orderBy("site", "ts_utc")) === full)
  }

  test("runNasaIngest: windowed fetch through a fixture-JSON transport " +
       "lands parsed hourly rows in the Bronze store; re-fetch is a no-op") {
    // two sites × 10 days → 2 windows each (7 + 3), scalar-form series
    val start = LocalDate.of(2024, 3, 1)
    val end = LocalDate.of(2024, 3, 10)
    val hours = 0 until 24 by 6 // sparse hours exercise null alignment
    def series(day: String, scale: Double) =
      hours.map(h => f""""$day${h}%02d": ${scale + h}%.1f""").mkString(", ")
    def payload(d0: LocalDate, d1: LocalDate): String = {
      val days = Iterator.iterate(d0)(_.plusDays(1))
        .takeWhile(!_.isAfter(d1)).toSeq
        .map(_.format(java.time.format.DateTimeFormatter.BASIC_ISO_DATE))
      s"""{"properties": {"parameter": {
         |  "ALLSKY_SFC_SW_DWN": {${days.map(series(_, 100.0)).mkString(", ")}},
         |  "T2M": {${days.map(series(_, 10.0)).mkString(", ")}},
         |  "WS10M": {${days.map(series(_, 1.0)).mkString(", ")}}}}}""".stripMargin
    }
    var urls = List.empty[String]
    val transport: NasaIngest.Transport = (url, _) => {
      urls ::= url
      val q = url.split('?')(1).split('&')
        .map(_.split('=')).map(p => p(0) -> p(1)).toMap
      val fmt = java.time.format.DateTimeFormatter.BASIC_ISO_DATE
      Right(200 -> payload(
        LocalDate.parse(q("start"), fmt), LocalDate.parse(q("end"), fmt)))
    }
    val root = TestTmp.dir("graft-pipe-nasa-").toString + "/wh"
    val wh = Pipeline.Warehouse(root)
    val stamp = java.sql.Timestamp.valueOf("2024-03-11 00:00:00")
    val sites = Seq(Pipeline.Site("alpha", 52.5, 13.4),
                    Pipeline.Site("beta", 40.7, -74.0))
    val n = Pipeline.runNasaIngest(spark, sites, start, end, wh, stamp,
      transport = transport)
    assert(n === 4, "2 sites x 2 windows")
    // the chunk planner hit the wire with the reference's <=7-day windows
    assert(urls.count(_.contains("start=20240301")) === 2)
    assert(urls.count(_.contains("start=20240308")) === 2)

    val bronze = spark.read.parquet(wh.bronze)
    // 2 sites x 10 days x 4 sparse hours, fully aligned (no nulls)
    val bronzeCount = bronze.count()
    assert(bronzeCount === 2L * 10 * hours.size)
    assert(bronze.filter(col("ghi_wm2").isNull
      || col("t2m_c").isNull || col("ws10_mps").isNull).count() === 0)
    // parsed values land in the right columns at the right hour
    val probe = bronze.filter(col("site") === "alpha"
        && col("ts_utc") === lit("2024-03-02 06:00:00").cast("timestamp"))
      .collect()
    assert(probe.length === 1)
    assert(probe(0).getAs[Double]("ghi_wm2") === 106.0)
    assert(probe(0).getAs[Double]("t2m_c") === 16.0)
    assert(probe(0).getAs[Double]("ws10_mps") === 7.0)

    // re-fetching the same windows merges onto the same keys: no-op
    val before = rows(bronze.orderBy("site", "ts_utc"))
    Pipeline.runNasaIngest(spark, sites, start, end, wh, stamp,
      transport = transport)
    assert(rows(spark.read.parquet(wh.bronze)
      .orderBy("site", "ts_utc")) === before)

    // and the cleaned silver built from it is complete + hourly
    // (fresh reads: `bronze` above snapshotted the pre-merge file list)
    Pipeline.refineSilver(spark, wh)
    val silver = spark.read.parquet(wh.silver)
    assert(silver.count() === bronzeCount, "all-valid rows all survive")
  }

  test("a failed window aborts the run (raise_for_status contract)") {
    val transport: NasaIngest.Transport = (_, _) => Right(503 -> "oops")
    val root = TestTmp.dir("graft-pipe-err-").toString + "/wh"
    val e = intercept[java.io.IOException] {
      Pipeline.runNasaIngest(spark, Seq(Pipeline.Site("x", 0, 0)),
        LocalDate.of(2024, 1, 1), LocalDate.of(2024, 1, 2),
        Pipeline.Warehouse(root),
        java.sql.Timestamp.valueOf("2024-01-03 00:00:00"),
        transport = transport)
    }
    assert(e.getMessage.contains("503"))
    assert(!new java.io.File(root).exists(), "no partial store published")
  }
}
