package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.syntax._

/** NASA-POWER-style payload relationalization (SURVEY §2.2, J1–J3;
  * reference parser at fastapi/app/etl/nasa.py:58-108): nested
  * `properties.parameter.<PARAM>` series in TWO encodings —
  * `"YYYYMMDD" -> [24 hourly floats]` (list form) and
  * `"YYYYMMDDHH" -> float` (scalar form) — normalized per key (mixed
  * encodings within one parameter survive), malformed keys skipped,
  * then full-outer-aligned on the hour axis with one column per
  * parameter and a traceability `raw_json` blob (S7, nasa.py:106).
  *
  * The HTTP fetch stays a thin driver-side concern (as in the
  * reference); the parser is a pure DataFrame plan testable from JSON
  * strings, and scales by splitting payloads across partitions — each
  * payload explodes independently, no shuffle until the final
  * per-(site, ts) pivot.
  */
object NasaIngest {

  val Params: Seq[String] = Seq("ALLSKY_SFC_SW_DWN", "T2M", "WS10M")

  /** S1 — NASA POWER hourly point-endpoint URL (nasa.py:34-46). The
    * HTTP GET itself stays a driver-side concern behind any transport;
    * the engine owns the request construction and the parse. */
  def powerUrl(lat: Double, lon: Double,
               startYyyymmdd: String, endYyyymmdd: String): String = {
    val base = "https://power.larc.nasa.gov/api/temporal/hourly/point"
    val params = Seq(
      "parameters" -> Params.mkString(","),
      "community" -> "RE",
      "longitude" -> lon.toString,
      "latitude" -> lat.toString,
      "start" -> startYyyymmdd,
      "end" -> endYyyymmdd,
      "format" -> "JSON",
      "time-standard" -> "UTC")
    base + "?" + params.map { case (k, v) => s"$k=$v" }.mkString("&")
  }

  // ---------------------------------------------------------------
  // S1 transport — the engine-side counterpart of fetch_power's
  // GET + 60 s timeout + raise_for_status (nasa.py:50-54). The wire
  // call is pluggable so the error paths are unit-testable without
  // network (mirroring tests/test_fetch_json.py:28-41); the default
  // transport is a plain HttpURLConnection GET.
  // ---------------------------------------------------------------

  sealed trait FetchError { def url: String }
  /** Non-2xx response — raise_for_status's analogue. */
  final case class HttpStatusError(url: String, code: Int) extends FetchError
  /** Connect/read failure or timeout. */
  final case class TransportFailure(url: String, cause: Throwable) extends FetchError

  /** (url, timeoutMs) → (status, body) or the underlying exception. */
  type Transport = (String, Int) => Either[Throwable, (Int, String)]

  val DefaultTimeoutMs = 60000

  /** Default wire transport (driver-side, like the reference's
    * requests.get). */
  val httpTransport: Transport = (url, timeoutMs) =>
    try {
      val conn = new java.net.URI(url).toURL.openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      try {
        conn.setConnectTimeout(timeoutMs)
        conn.setReadTimeout(timeoutMs)
        conn.setRequestMethod("GET")
        val code = conn.getResponseCode
        val stream = if (code >= 400) conn.getErrorStream else conn.getInputStream
        val body =
          if (stream == null) ""
          else try new String(stream.readAllBytes(),
                              java.nio.charset.StandardCharsets.UTF_8)
          finally stream.close()
        Right(code -> body)
      } finally conn.disconnect() // also on timeout/reset — no fd leak
    } catch { case e: Throwable => Left(e) }

  /** GET `url`, propagating timeouts/transport failures and non-2xx
    * statuses as typed errors; the body comes back only on success —
    * exactly fetch_power's contract, minus the exception control
    * flow. */
  def fetch(url: String, timeoutMs: Int = DefaultTimeoutMs,
            transport: Transport = httpTransport): Either[FetchError, String] =
    transport(url, timeoutMs) match {
      case Left(e) => Left(TransportFailure(url, e))
      case Right((code, body)) if code >= 200 && code < 300 => Right(body)
      case Right((code, _)) => Left(HttpStatusError(url, code))
    }

  /** Raw payload schema: parameter values captured as raw JSON text so
    * each series can be re-parsed per its own encoding. */
  private val payloadSchema = StructType(Seq(
    StructField("properties", StructType(Seq(
      StructField("parameter", MapType(StringType, StringType)))))))

  /** (site, payload_json) → one row per (site, param, ts, value).
    * J1: dual-format normalization + malformed-key skip. */
  def parseSeries(payloads: DataFrame): DataFrame = {
    val entries = payloads
      .select($"site",
        explode(from_json($"payload", payloadSchema)
          .getField("properties").getField("parameter"))
          .as(Seq("param", "series_json")))
      .filter($"param".isin(Params: _*)) // J2 projection
      .select($"site", $"param",
        explode(from_json($"series_json", MapType(StringType, StringType)))
          .as(Seq("key", "val_str")))
    val listForm = entries
      .filter($"val_str".startsWith("["))
      .select($"site", $"param",
        try_to_timestamp($"key", lit("yyyyMMdd")).as("day_ts"),
        posexplode(from_json($"val_str", ArrayType(DoubleType)))
          .as(Seq("pos", "value")))
      .select($"site", $"param",
        expr("timestampadd(HOUR, pos, day_ts)").as("ts"), $"value")
    val scalarForm = entries
      .filter(!$"val_str".startsWith("["))
      .select($"site", $"param",
        try_to_timestamp(substring($"key", 1, 10), lit("yyyyMMddHH")).as("ts"),
        $"val_str".cast(DoubleType).as("value"))
    listForm.unionByName(scalarForm)
      .filter($"ts".isNotNull) // malformed keys skipped (nasa.py:71-74)
  }

  /** J3: align the per-parameter series on the hour axis (full outer —
    * absent parameters surface as nulls), project to the Bronze
    * column names, and attach the S7 raw_json blob. */
  def alignToBronze(series: DataFrame): DataFrame =
    series
      .groupBy($"site", $"ts")
      .pivot("param", Params)
      .agg(first($"value"))
      .withColumnRenamed("ALLSKY_SFC_SW_DWN", "ghi_wm2")
      .withColumnRenamed("T2M", "t2m_c")
      .withColumnRenamed("WS10M", "ws10_mps")
      .withColumn("raw_json", to_json(struct(
        lit("NASA_POWER").as("source"),
        $"ghi_wm2", $"t2m_c", $"ws10_mps")))
      .orderBy($"site", $"ts")

  /** End-to-end: payload rows → Bronze-shaped rows (entry point 1 of
    * SURVEY §3.1, stages 4–5). */
  def ingest(payloads: DataFrame): DataFrame =
    alignToBronze(parseSeries(payloads))

  /** q35 — round-trip demonstration on fixture data: build scalar-form
    * NASA payloads from hourly event aggregates, parse + align them
    * back, and return the Bronze rows. Validates the full J1→J2→J3
    * path inside the driver contract (rows-only check — the payload
    * construction isn't mirrored in SQL).
    *
    * Payloads are chunked per (site, 7-day window), mirroring the
    * reference's ≤7-day request windows (nasa.py:160-177): a payload
    * row carries at most 168 hours of series, so no single row/task
    * ever holds a site's full history (the collect_list width hazard
    * at 100× — a site's multi-year series in ONE row — cannot
    * arise; the same chunk arithmetic as WeatherApi.ingestWindows). */
  def roundTrip(spark: SparkSession, dir: String): DataFrame =
    ingest(roundTripPayloads(spark, dir))

  /** The payload-construction stage of [[roundTrip]], exposed so the
    * chunk-width invariant (≤168 hourly keys per payload row) is
    * directly testable. */
  def roundTripPayloads(spark: SparkSession, dir: String): DataFrame = {
    val hourly = graft.operators.Weather.bronze(spark, dir)
      .groupBy($"site", date_trunc("hour", $"ts_utc").as("h"))
      .agg(round(avg($"ghi_wm2"), 3).as("ghi"),
           round(avg($"t2m_c"), 3).as("t2m"),
           round(avg($"ws10_mps"), 3).as("ws"))
      .withColumn("chunk7d",
        floor(unix_timestamp($"h") / lit(7L * 86400)))
    val payloads = hourly
      .groupBy($"site", $"chunk7d")
      .agg(
        map_from_entries(collect_list(struct(
          date_format($"h", "yyyyMMddHH").as("k"), $"ghi".as("v"))))
          .as("ghi_series"),
        map_from_entries(collect_list(struct(
          date_format($"h", "yyyyMMddHH").as("k"), $"t2m".as("v"))))
          .as("t2m_series"),
        map_from_entries(collect_list(struct(
          date_format($"h", "yyyyMMddHH").as("k"), $"ws".as("v"))))
          .as("ws_series"))
      .select($"site", to_json(struct(struct(struct(
          $"ghi_series".as("ALLSKY_SFC_SW_DWN"),
          $"t2m_series".as("T2M"),
          $"ws_series".as("WS10M")).as("parameter")).as("properties")))
        .as("payload"))
    payloads
  }
}
