package graft

import java.time.LocalDate
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.operators.{Weather, WeatherApi}
import graft.sources.{NasaIngest, UpsertWriter}
import graft.streaming.StreamingClean
import graft.syntax._

/** The reference's two CLIs composed into one end-to-end callable
  * (VERDICT r5 "What's missing" #1): `run_ingest`
  * (fastapi/app/etl/nasa.py:160-192 — windowed fetch → parse →
  * upsert into raw_weather) and `silver_clean.run`
  * (transform/silver_clean.py:136-154 — read raw → clean → upsert
  * into fact_weather), plus the gold marts, all against PUBLISHED
  * Bronze/Silver parquet stores rather than in-memory frames.
  *
  * Layout: `<root>/bronze/raw_weather`, `<root>/silver/fact_weather`,
  * `<root>/gold/mart_{features,kpis}` — every fact store
  * `partitionBy("ds")` (the UTC date of ts_utc) and merged via
  * [[UpsertWriter.upsertPartitioned]], so a day's ingest rewrites a
  * day's partitions, not the table (the 100 TB shape). The clean
  * stage's (site, hour) LWW groups never span a `ds` boundary, so a
  * partition-bounded re-clean is self-contained — `refineSilver`'s
  * `sinceDs` prunes the Bronze scan to the touched dates and the
  * silver merge to the touched partitions.
  *
  * Idempotency (the reference's ON CONFLICT contract): every stage is
  * a keyed merge, so `run ∘ run == run` — re-running any window, or
  * the whole pipeline, is a byte-level no-op on the stores
  * (PipelineSpec pins this).
  */
object Pipeline {

  /** Store paths under one warehouse root. */
  final case class Warehouse(root: String) {
    val bronze: String = s"$root/bronze/raw_weather"
    val silver: String = s"$root/silver/fact_weather"
    val martFeatures: String = s"$root/gold/mart_features"
    val martKpis: String = s"$root/gold/mart_kpis"
  }

  /** Published-store row counts after a [[run]] (a zero-column
    * count(*) scan — cheap: column pruning drops every data page,
    * though vanilla Spark still launches the job; flip
    * `spark.sql.parquet.aggregatePushdown` for footer-only counts). */
  final case class Report(bronzeRows: Long, silverRows: Long,
                          featureRows: Long, kpiRows: Long)

  /** Bronze store schema = the Bronze relation + a traceability
    * `raw_json` blob (S7; null for sources that carry none) + the `ds`
    * partition date. Key (site, ts_utc, ingest_seq): `ingest_seq` is
    * the reference's implicit insertion order made explicit (SURVEY
    * §7.4-1), so the store preserves the full event-grain relation and
    * re-ingesting any window is a no-op; hour-level last-write-wins is
    * the CLEAN stage's job, exactly as in the reference (raw_weather
    * keeps every fetched row, silver_clean.py:99-101 dedups). */
  def ingestBronze(spark: SparkSession, bronzeRows: DataFrame,
                   wh: Warehouse): Unit = {
    val withBlob =
      if (bronzeRows.columns.contains("raw_json")) bronzeRows
      else bronzeRows.withColumn("raw_json", lit(null).cast(StringType))
    UpsertWriter.upsertPartitioned(spark, wh.bronze,
      withBlob.withColumn("ds", to_date($"ts_utc")),
      keys = Seq("site", "ts_utc", "ingest_seq"),
      versionCols = Seq("ingested_at"),
      partitionCol = "ds")
  }

  /** Stage 1, events-source flavor: the driver fixture's events table
    * is the stand-in data feed (same Bronze mapping the whole engine
    * uses); one call ingests the full fixture window. */
  def ingestEvents(spark: SparkSession, sfDir: String, wh: Warehouse): Unit =
    ingestBronze(spark, Weather.bronze(spark, sfDir), wh)

  final case class Site(name: String, lat: Double, lon: Double)

  /** Stage 1, NASA-source flavor — `run_ingest` (nasa.py:160-192):
    * split [start, end] into ≤7-day windows (S2), GET each site's
    * payload through `transport` (fixture-JSON in tests, HTTP in
    * production; a failed window aborts the run like
    * raise_for_status), relationalize with [[NasaIngest.ingest]], and
    * merge into the Bronze store. `fetchedAt` is the run's ingest
    * stamp (the reference's NOW() made explicit so runs are
    * replayable); `ingest_seq` derives from (site, ts) so a re-fetch
    * of the same window collapses onto the same keys.
    *
    * The fetch loop is driver-side (as in the reference) — one small
    * string per (site, window); the parse/align/merge below it is
    * fully distributed. Returns the number of payloads ingested. */
  def runNasaIngest(spark: SparkSession, sites: Seq[Site],
                    start: LocalDate, end: LocalDate, wh: Warehouse,
                    fetchedAt: java.sql.Timestamp,
                    transport: NasaIngest.Transport = NasaIngest.httpTransport)
      : Int = {
    val fmt = DateTimeFormatter.BASIC_ISO_DATE
    val fetched: Seq[(String, String)] = for {
      site <- sites
      (ws, we) <- WeatherApi.ingestWindows(start, end)
    } yield {
      val url = NasaIngest.powerUrl(site.lat, site.lon,
        ws.format(fmt), we.format(fmt))
      NasaIngest.fetch(url, transport = transport) match {
        case Right(body) => site.name -> body
        case Left(err) =>
          throw new java.io.IOException(s"run_ingest: $err")
      }
    }
    val payloads = spark.createDataFrame(fetched).toDF("site", "payload")
    val bronzeRows = NasaIngest.ingest(payloads)
      .select($"site", $"ts".as("ts_utc"),
        xxhash64($"site", $"ts").as("ingest_seq"),
        $"ghi_wm2", $"t2m_c", $"ws10_mps",
        lit(fetchedAt).as("ingested_at"), $"raw_json")
    ingestBronze(spark, bronzeRows, wh)
    fetched.size
  }

  /** Stage 2 — `silver_clean.run`: read the published Bronze store,
    * run the Q1–Q5 kernel, and merge into the Silver store keyed
    * (site, ts_utc) with the (ingested_at, ingest_seq) version order —
    * so late Bronze data for an already-cleaned hour wins iff newer,
    * ACROSS runs (the audit columns are stored for exactly this).
    * `sinceDs` bounds the re-clean: only Bronze partitions ≥ sinceDs
    * are read (partition-pruned scan) and only their silver partitions
    * are rewritten — the incremental shape; omit it for a full
    * re-clean (the reference CLI's default). */
  def refineSilver(spark: SparkSession, wh: Warehouse,
                   sinceDs: Option[LocalDate] = None): Unit = {
    val bronzeStore = sinceDs.foldLeft(spark.read.parquet(wh.bronze)) {
      (df, d) => df.filter($"ds" >= lit(java.sql.Date.valueOf(d)))
    }
    val cleaned = Weather.cleanToHourlyAudit(bronzeStore.select(
      $"site", $"ts_utc", $"ingest_seq",
      $"ghi_wm2", $"t2m_c", $"ws10_mps", $"ingested_at"))
    UpsertWriter.upsertPartitioned(spark, wh.silver,
      cleaned.withColumn("ds", to_date($"ts_utc")),
      keys = Seq("site", "ts_utc"),
      versionCols = Seq("ingested_at", "ingest_seq"),
      partitionCol = "ds",
      checks = graft.schema.Schemas.factWeatherChecks,
      table = "fact_weather")
  }

  /** Stage 3 — gold marts from the PUBLISHED Silver store (derived
    * data: rebuilt wholesale, the reference's INSERT..SELECT shape;
    * the marts stay `partitionBy("ds")` so downstream readers prune). */
  def buildMarts(spark: SparkSession, wh: Warehouse): Unit = {
    val silverStore = spark.read.parquet(wh.silver)
    Weather.goldFeaturesFromAudit(silverStore)
      .withColumn("ds", to_date($"ts_utc"))
      .write.mode("overwrite").partitionBy("ds").parquet(wh.martFeatures)
    Weather.martKpisFromAudit(silverStore)
      .withColumn("ds", to_date($"ts_utc"))
      .write.mode("overwrite").partitionBy("ds").parquet(wh.martKpis)
  }

  /** The one callable: fixture feed → Bronze store → Silver store →
    * gold marts. Re-running against the same warehouse is a no-op on
    * Bronze/Silver and a byte-identical rebuild of the marts. */
  def run(spark: SparkSession, sfDir: String, warehouseRoot: String): Report = {
    val wh = Warehouse(warehouseRoot)
    ingestEvents(spark, sfDir, wh)
    refineSilver(spark, wh)
    buildMarts(spark, wh)
    Report(
      bronzeRows = spark.read.parquet(wh.bronze).count(),
      silverRows = spark.read.parquet(wh.silver).count(),
      featureRows = spark.read.parquet(wh.martFeatures).count(),
      kpiRows = spark.read.parquet(wh.martKpis).count())
  }

  /** CLI — the reference's `python -m app.etl.nasa` / `python
    * silver_clean.py` chained as one runnable entry point:
    * `runMain graft.Pipeline [sfDir] [warehouseRoot]`. Builds (or
    * incrementally merges into) the warehouse at `warehouseRoot` from
    * the fixture feed and prints the published store sizes. */
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.001")
    val root = args.lift(1).getOrElse(
      StreamingClean.trackedTempDir("graft-wh-cli-") + "/wh")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val report = run(spark, sfDir, root)
    println(s"[pipeline] warehouse: $root")
    println(s"[pipeline] bronze=${report.bronzeRows} " +
      s"silver=${report.silverRows} features=${report.featureRows} " +
      s"kpis=${report.kpiRows}")
    spark.stop()
  }

  /** q38 — the end-to-end gate: run the pipeline into a scratch
    * warehouse, then read back the PUBLISHED Silver store. Its oracle
    * is the batch silver SQL, so a hash match proves fetch → Bronze
    * store → clean → Silver store computes exactly what the in-memory
    * kernel computes — through two real parquet publish/merge
    * round-trips. */
  def pipelineSilver(spark: SparkSession, sfDir: String): DataFrame = {
    val root = StreamingClean.trackedTempDir("graft-wh-") + "/wh"
    val wh = Warehouse(root)
    // The q38 gate covers the fact-store round-trip the oracle checks:
    // ingest → Bronze store → clean → Silver store → read back. The
    // mart stage is derived output on top (PipelineSpec drives it via
    // run()); the Report counts are reporting, not pipeline — neither
    // belongs in the per-call driver-contract cost.
    ingestEvents(spark, sfDir, wh)
    refineSilver(spark, wh)
    spark.read.parquet(wh.silver)
      .select($"site", $"ts_utc", $"ghi_wm2", $"temp_c", $"wind_mps")
      .orderBy($"site", $"ts_utc")
  }
}
