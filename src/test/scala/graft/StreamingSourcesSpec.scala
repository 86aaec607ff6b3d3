package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Weather
import graft.sources.{NasaIngest, UpsertWriter}
import graft.streaming.StreamingClean

class UpsertWriterSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def kv(rows: (String, Int, Double)*) =
    rows.toSeq.toDF("k", "version", "v")

  test("merge: incoming wins on key conflict; version arbitrates") {
    val existing = kv(("a", 1, 1.0), ("b", 5, 2.0))
    val incoming = kv(("a", 2, 10.0), ("b", 3, 20.0), ("c", 1, 30.0))
    val merged = UpsertWriter.merge(existing, incoming,
      Seq("k"), Seq("version")).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(merged === Map("a" -> 10.0, "b" -> 2.0, "c" -> 30.0))
  }

  test("merge: equal versions — incoming wins (ON CONFLICT DO UPDATE)") {
    val existing = kv(("a", 1, 1.0))
    val incoming = kv(("a", 1, 99.0))
    val merged = UpsertWriter.merge(existing, incoming,
      Seq("k"), Seq("version")).collect()
    assert(merged.length === 1 && merged.head.getDouble(2) === 99.0)
  }

  test("upsert: rerunning the same window is a no-op (idempotency)") {
    val path = TestTmp.dir("graft-ups-").toString + "/t"
    val batch = kv(("a", 1, 1.0), ("b", 1, 2.0))
    UpsertWriter.upsert(spark, path, batch, Seq("k"), Seq("version"))
    val snap1 = spark.read.parquet(path).orderBy("k").collect().toSeq
    UpsertWriter.upsert(spark, path, batch, Seq("k"), Seq("version"))
    val snap2 = spark.read.parquet(path).orderBy("k").collect().toSeq
    assert(snap1.length === 2 && snap2.length === 2)
    assert(snap1 === snap2)
  }

  test("upsert: CHECK-violating incoming batch is rejected and the store is untouched") {
    import org.apache.spark.sql.functions.col
    val path = TestTmp.dir("graft-ups-").toString + "/t"
    val checks = Seq(graft.schema.Schemas.Check("v_nonneg", col("v") < 0))
    UpsertWriter.upsert(spark, path, kv(("a", 1, 1.0)), Seq("k"), Seq("version"),
      checks = checks, table = "t")
    val before = spark.read.parquet(path).collect().toSeq
    val bad = kv(("a", 2, -5.0))
    intercept[graft.schema.Validator.ConstraintViolation] {
      UpsertWriter.upsert(spark, path, bad, Seq("k"), Seq("version"),
        checks = checks, table = "t")
    }
    assert(spark.read.parquet(path).collect().toSeq === before,
      "failed validation must not modify the published table")
  }

  test("upsert: late newer data overwrites, late older data is ignored") {
    val path = TestTmp.dir("graft-ups-").toString + "/t"
    UpsertWriter.upsert(spark, path, kv(("a", 5, 1.0)), Seq("k"), Seq("version"))
    UpsertWriter.upsert(spark, path, kv(("a", 9, 2.0)), Seq("k"), Seq("version"))
    UpsertWriter.upsert(spark, path, kv(("a", 3, 3.0)), Seq("k"), Seq("version"))
    val rows = spark.read.parquet(path).collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[Double]("v") === 2.0)
    assert(rows.head.getAs[Int]("version") === 9)
  }
}

class StreamingCleanSpec extends AnyFunSuite {
  import TestSpark._

  test("streaming clean == batch clean on the fixture (micro-batched, merged)") {
    val out = TestTmp.dir("graft-stream-").toString + "/silver"
    val streamed = StreamingClean.run(spark, s"$sf/events.parquet", out)
      .drop("ingested_at", "ingest_seq", "ds")
    val batch = Weather.cleanToHourly(Weather.bronze(spark, sf))
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
  }

  test("a micro-batch merges only its touched date partitions " +
       "(untouched partition files are byte-identical)") {
    import spark.implicits._
    // day-1 and day-2 events into the store, then a second stream
    // carrying only a newer day-2 event: the ds=day1 partition's files
    // must survive the merge untouched (same names, sizes, mtimes) —
    // the IO contract that makes the sink viable at 100 TB
    val out = TestTmp.dir("graft-mbpart-out-").toString + "/silver"
    val day1 = 1704067200000000L // 2024-01-01 00:00 UTC, micros
    val day2 = day1 + 86400L * 1000000L
    def write(events: Seq[(Long, Long)], dir: java.nio.file.Path): Unit = {
      events.map { case (id, ts) => (id, ts * 1000L, 1L, "click", 50.0, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(dir.toString)
      ()
    }
    // content hashes, not (size, mtime): mtime granularity is 1 s on
    // some filesystems, so a same-size rewrite within one tick could
    // false-pass (and metadata churn false-fail) — bytes can't lie
    def partFiles(ds: String): Map[String, String] = {
      val d = new java.io.File(s"$out/ds=$ds")
      Option(d.listFiles()).toSeq.flatten
        .filter(_.getName.endsWith(".parquet"))
        .map { f =>
          val md = java.security.MessageDigest.getInstance("MD5")
            .digest(java.nio.file.Files.readAllBytes(f.toPath))
          f.getName -> md.map("%02x".format(_)).mkString
        }.toMap
    }
    val in1 = TestTmp.dir("graft-mbpart-in1-")
    write(Seq((1L, day1), (2L, day2)), in1)
    StreamingClean.run(spark, in1.toString, out)
    val day1Before = partFiles("2024-01-01")
    assert(day1Before.nonEmpty)

    val in2 = TestTmp.dir("graft-mbpart-in2-")
    write(Seq((12L, day2)), in2) // newer seq, same (site, hour) as id 2
    StreamingClean.run(spark, in2.toString, out)
    assert(partFiles("2024-01-01") === day1Before,
      "merge must not rewrite the untouched date partition")
    val silver = spark.read.parquet(out)
    assert(silver.filter($"ds" === "2024-01-02")
      .select("ingest_seq").collect().map(_.getLong(0)).toSeq === Seq(12L),
      "the touched partition must carry the merged newer version")
    assert(silver.filter($"ds" === "2024-01-01").count() === 1)
  }
}

class NasaIngestSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** FIXTURES.md §A1 payload: list form with nulls, scalar form with a
    * malformed key, one parameter absent from some timestamps, plus an
    * unknown parameter that J2 must project away. */
  private val payload =
    """{"properties": {"parameter": {
      |  "ALLSKY_SFC_SW_DWN": {"20250101": [0.0, null, 12.5, 3.0]},
      |  "T2M":               {"2025010100": -3.4, "2025010101": null, "badkey": 1.0},
      |  "WS10M":             {"2025010100": 4.2, "2025010102": 5.0},
      |  "IGNORED_PARAM":     {"2025010100": 9.9}
      |}}}""".stripMargin

  private lazy val bronzeOut =
    NasaIngest.ingest(Seq(("site_a", payload)).toDF("site", "payload"))
      .collect()
      .map(r => r.getAs[Timestamp]("ts").toString -> r).toMap

  test("J1 list form: day key explodes to hourly timestamps with positions") {
    assert(bronzeOut("2025-01-01 00:00:00.0").getAs[Double]("ghi_wm2") === 0.0)
    assert(bronzeOut("2025-01-01 02:00:00.0").getAs[Double]("ghi_wm2") === 12.5)
    assert(bronzeOut("2025-01-01 03:00:00.0").getAs[Double]("ghi_wm2") === 3.0)
    // null element in the list survives as a null measure
    assert(bronzeOut("2025-01-01 01:00:00.0").isNullAt(
      bronzeOut("2025-01-01 01:00:00.0").fieldIndex("ghi_wm2")))
  }

  test("J1 scalar form parses YYYYMMDDHH keys; malformed keys are skipped") {
    assert(bronzeOut("2025-01-01 00:00:00.0").getAs[Double]("t2m_c") === -3.4)
    // 'badkey' contributed no row: the only timestamps are the union of
    // valid keys (hours 0-3)
    assert(bronzeOut.size === 4)
  }

  test("J2: unknown parameters are projected away") {
    val cols = bronzeOut.head._2.schema.fieldNames.toSet
    assert(!cols.contains("IGNORED_PARAM"))
    assert(cols === Set("site", "ts", "ghi_wm2", "t2m_c", "ws10_mps", "raw_json"))
  }

  test("J3: full-outer alignment — per-param gaps surface as nulls") {
    val r1 = bronzeOut("2025-01-01 01:00:00.0") // WS10M absent at hour 1
    assert(r1.isNullAt(r1.fieldIndex("ws10_mps")))
    val r2 = bronzeOut("2025-01-01 02:00:00.0") // T2M absent at hour 2
    assert(r2.isNullAt(r2.fieldIndex("t2m_c")))
    assert(r2.getAs[Double]("ws10_mps") === 5.0)
  }

  test("S7: raw_json blob carries source + measures") {
    val blob = bronzeOut("2025-01-01 00:00:00.0").getAs[String]("raw_json")
    assert(blob.contains("\"source\":\"NASA_POWER\""))
    assert(blob.contains("\"t2m_c\":-3.4"))
  }

  test("S1 fetch: success body, non-2xx status, and transport failure propagate (stubbed wire)") {
    // mirrors the reference's mocked requests.get tests
    // (tests/test_fetch_json.py:28-41) — no network involved
    val ok: NasaIngest.Transport = (_, _) => Right(200 -> """{"status":"ok"}""")
    assert(NasaIngest.fetch("http://example.com/health", transport = ok)
      === Right("""{"status":"ok"}"""))
    val notFound: NasaIngest.Transport = (_, _) => Right(404 -> "missing")
    assert(NasaIngest.fetch("http://example.com/health", transport = notFound)
      === Left(NasaIngest.HttpStatusError("http://example.com/health", 404)))
    val boom = new java.net.SocketTimeoutException("boom")
    val timedOut: NasaIngest.Transport = (_, _) => Left(boom)
    NasaIngest.fetch("http://example.com/health", transport = timedOut) match {
      case Left(NasaIngest.TransportFailure(url, cause)) =>
        assert(url === "http://example.com/health" && cause.getMessage === "boom")
      case other => fail(s"expected TransportFailure, got $other")
    }
    // the configured timeout reaches the transport
    var seenTimeout = -1
    val probe: NasaIngest.Transport = (_, t) => { seenTimeout = t; Right(200 -> "") }
    NasaIngest.fetch("http://x", timeoutMs = 1234, transport = probe)
    assert(seenTimeout === 1234)
  }

  test("round-trip on fixture data yields bronze-shaped rows") {
    val rt = NasaIngest.roundTrip(spark, sf)
    assert(rt.count() > 0)
    assert(rt.columns.toSet ===
      Set("site", "ts", "ghi_wm2", "t2m_c", "ws10_mps", "raw_json"))
  }

  test("round-trip payloads are chunked <= 7 days (168 hourly keys per row)") {
    // every payload row must carry at most one 7-day window of series
    // keys — the width hazard guard: a site's full history may never
    // land in a single payload row (nasa.py:160-177)
    import org.apache.spark.sql.functions._
    val payloads = NasaIngest.roundTripPayloads(spark, sf)
    val maxKeys = payloads
      .select(expr("size(from_json(get_json_object(payload, " +
        "'$.properties.parameter.T2M'), 'map<string,double>'))").as("n"))
      .agg(max("n")).collect()(0).getInt(0)
    assert(maxKeys <= 168, s"a payload row carries $maxKeys hourly keys")
    assert(payloads.count() >
      payloads.select("site").distinct().count(),
      "fixture history spans >7 days, so chunking must yield " +
        "multiple payloads per site")
  }
}
