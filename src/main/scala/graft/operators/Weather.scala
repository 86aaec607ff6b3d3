package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.syntax._

/** The reference's semantic core — the medallion weather pipeline
  * (SURVEY.md §1, §2.8, §7) — expressed over the `events` fixture
  * table. `events` stands in for the NASA feed: a deterministic "dirt
  * injection" maps it onto the Bronze `raw_weather` shape
  * (infra/init.sql:8-18) with exactly the fault classes the cleaning
  * kernel must handle (range violations, missing measures, duplicate
  * site-hours), so every Q1–Q8 rule (transform/silver_clean.py:74-121)
  * and the Q6 drop-reason classifier (streamlit/app.py:260-310) is
  * exercised and oracle-checkable.
  *
  * Scale design: the whole pipeline is narrow until the single
  * `(site, ts_hour)` dedup window — one shuffle, key cardinality =
  * sites × hours, uniform (no skew: sites are even slices of the
  * stream). On a real cluster Bronze would be written partitioned by
  * site/date so the window becomes a partition-local sort.
  */
object Weather {

  // ---------------------------------------------------------------
  // Bronze (SURVEY S5/S6): events → raw_weather shape + injected dirt.
  // All injected faults key off event_id so both engines derive the
  // identical Bronze relation. Measures derive from `value` with plain
  // IEEE ops (mirrored 1:1 in SQL) so doubles are bit-identical.
  // `ingest_seq` (= event_id) is the total-order tiebreak the
  // reference gets implicitly from pandas sort stability
  // (silver_clean.py:100-101; SURVEY §7.4-1).
  // ---------------------------------------------------------------

  def bronze(spark: SparkSession, dir: String): DataFrame =
    bronzeFromEvents(Tables.events(spark, dir))

  /** Same mapping over any events-shaped frame (batch or streaming). */
  def bronzeFromEvents(events: DataFrame): DataFrame =
    events.select(
      $"event_type".as("site"),
      $"ts".as("ts_utc"),
      $"event_id".as("ingest_seq"),
      when($"event_id" % 97 === 0, -$"value")
        .when($"event_id" % 89 === 0, lit(null).cast(DoubleType))
        .otherwise($"value").as("ghi_wm2"),
      when($"event_id" % 83 === 0, lit(null).cast(DoubleType))
        .when($"event_id" % 79 === 0, lit(200.0))
        .when($"event_id" % 73 === 0, lit(-200.0))
        .otherwise($"value" / 6 - 40).as("t2m_c"),
      when($"event_id" % 71 === 0, lit(-1.0))
        .when($"event_id" % 67 === 0, lit(null).cast(DoubleType))
        .otherwise($"value" / 25).as("ws10_mps"),
      expr("timestampadd(MINUTE, CAST(event_id % 5 AS INT), ts)")
        .as("ingested_at"))

  /** DuckDB CTE computing the identical Bronze relation. */
  val bronzeCte: String =
    """bronze AS (
      |  SELECT event_type AS site, ts AS ts_utc, event_id AS ingest_seq,
      |    CASE WHEN event_id % 97 = 0 THEN -value
      |         WHEN event_id % 89 = 0 THEN NULL
      |         ELSE value END AS ghi_wm2,
      |    CASE WHEN event_id % 83 = 0 THEN NULL
      |         WHEN event_id % 79 = 0 THEN 200.0
      |         WHEN event_id % 73 = 0 THEN -200.0
      |         ELSE value / 6 - 40 END AS t2m_c,
      |    CASE WHEN event_id % 71 = 0 THEN -1.0
      |         WHEN event_id % 67 = 0 THEN NULL
      |         ELSE value / 25 END AS ws10_mps,
      |    ts + (event_id % 5) * INTERVAL '1 minute' AS ingested_at
      |  FROM events)""".stripMargin

  /** q20 — the Bronze scan itself (SURVEY S5 predicate scan shape). */
  def bronzeScan(spark: SparkSession, dir: String): DataFrame =
    bronze(spark, dir).orderBy($"ingest_seq")

  val bronzeScanSql: String =
    s"WITH $bronzeCte SELECT * FROM bronze ORDER BY ingest_seq"

  // ---------------------------------------------------------------
  // Silver (SURVEY Q1–Q5 + P1): the cleaning kernel.
  //  Q1 UTC normalization — session TZ is UTC; timestamps are already
  //     UTC-internal (silver_clean.py:81-82).
  //  Q2 hour bucketing: date_trunc (silver_clean.py:84-85).
  //  Q3 range→null, strict inequalities (silver_clean.py:87-91):
  //     ghi<0, t2m outside [-80,80], ws<0; boundary values are VALID.
  //  Q4 drop rows with any null measure (silver_clean.py:93-94).
  //  Q5 last-write-wins per (site, hour) by ingested_at, ingest_seq
  //     tiebreak (silver_clean.py:99-101).
  //  P1 rename to Silver schema (silver_clean.py:104-113).
  // ---------------------------------------------------------------

  /** The kernel as a reusable DataFrame→DataFrame pipeline — the same
    * function serves batch here and streaming foreachBatch (SURVEY
    * §2.10). Input must have Bronze columns. */
  def cleanToHourly(bronzeDf: DataFrame): DataFrame =
    cleanToHourlyAudit(bronzeDf).drop("ingested_at", "ingest_seq")

  /** Kernel variant keeping the audit columns — the streaming merge
    * needs them to arbitrate last-write-wins ACROSS micro-batches,
    * not just within one (SURVEY §2.10). */
  def cleanToHourlyAudit(bronzeDf: DataFrame): DataFrame = {
    val validated = bronzeDf.select(
      $"site",
      date_trunc("hour", $"ts_utc").as("ts_hour"),
      when($"ghi_wm2" < 0, lit(null).cast(DoubleType))
        .otherwise($"ghi_wm2").as("ghi_v"),
      when($"t2m_c" < -80 || $"t2m_c" > 80, lit(null).cast(DoubleType))
        .otherwise($"t2m_c").as("t2m_v"),
      when($"ws10_mps" < 0, lit(null).cast(DoubleType))
        .otherwise($"ws10_mps").as("ws_v"),
      $"ingested_at", $"ingest_seq")
      .filter($"ghi_v".isNotNull && $"t2m_v".isNotNull && $"ws_v".isNotNull)
    val w = Window.partitionBy($"site", $"ts_hour")
      .orderBy($"ingested_at".desc, $"ingest_seq".desc)
    validated
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"site", $"ts_hour".as("ts_utc"),
              $"ghi_v".as("ghi_wm2"), $"t2m_v".as("temp_c"),
              $"ws_v".as("wind_mps"), $"ingested_at", $"ingest_seq")
  }

  /** silver CTE (requires bronzeCte in scope). `silver_audit` keeps the
    * winning row's ingested_at as `cleaned_at` (fact_weather's audit
    * column, init.sql:32 — deterministic, unlike DEFAULT NOW(), so it
    * stays oracle-checkable); `silver` is the measure-only projection
    * every downstream query reads. */
  val silverCte: String =
    """validated AS (
      |  SELECT site, date_trunc('hour', ts_utc) AS ts_hour,
      |    CASE WHEN ghi_wm2 < 0 THEN NULL ELSE ghi_wm2 END AS ghi_v,
      |    CASE WHEN t2m_c < -80 OR t2m_c > 80 THEN NULL ELSE t2m_c END AS t2m_v,
      |    CASE WHEN ws10_mps < 0 THEN NULL ELSE ws10_mps END AS ws_v,
      |    ingested_at, ingest_seq
      |  FROM bronze),
      |complete AS (
      |  SELECT * FROM validated
      |  WHERE ghi_v IS NOT NULL AND t2m_v IS NOT NULL AND ws_v IS NOT NULL),
      |silver_audit AS (
      |  SELECT site, ts_hour AS ts_utc, ghi_v AS ghi_wm2,
      |         t2m_v AS temp_c, ws_v AS wind_mps, ingested_at AS cleaned_at
      |  FROM (SELECT *, ROW_NUMBER() OVER (
      |          PARTITION BY site, ts_hour
      |          ORDER BY ingested_at DESC, ingest_seq DESC) AS rn
      |        FROM complete)
      |  WHERE rn = 1),
      |silver AS (
      |  SELECT site, ts_utc, ghi_wm2, temp_c, wind_mps FROM silver_audit)""".stripMargin

  def withSilver(body: String): String =
    s"WITH $bronzeCte,\n$silverCte\n$body"

  /** q21 — Silver relation (the full kernel end-to-end). */
  def silverClean(spark: SparkSession, dir: String): DataFrame =
    cleanToHourly(bronze(spark, dir)).orderBy($"site", $"ts_utc")

  val silverCleanSql: String =
    withSilver("SELECT * FROM silver ORDER BY site, ts_utc")

  // ---------------------------------------------------------------
  // Q6 — drop-reason classification (streamlit/app.py:260-310).
  // First-match-wins ordered CASE; `duplicate` is assessed only among
  // otherwise-kept rows (SURVEY §7.4-5). Null comparisons fall through
  // (null < 0 is null → not matched) exactly as in pandas.
  // ---------------------------------------------------------------

  def dropReasons(spark: SparkSession, dir: String): DataFrame = {
    val pre = bronze(spark, dir).withColumn("reason_pre",
      when($"ghi_wm2" < 0, "invalid_ghi")
        .when($"t2m_c" < -80 || $"t2m_c" > 80, "invalid_temp")
        .when($"ws10_mps" < 0, "invalid_wind")
        .when($"ghi_wm2".isNull, "missing_ghi")
        .when($"t2m_c".isNull, "missing_temp")
        .when($"ws10_mps".isNull, "missing_wind")
        .otherwise("kept"))
    val w = Window
      .partitionBy($"site", date_trunc("hour", $"ts_utc"), $"reason_pre")
      .orderBy($"ingested_at".desc, $"ingest_seq".desc)
    pre.withColumn("rn", row_number().over(w))
      .withColumn("reason",
        when($"reason_pre" === "kept" && $"rn" > 1, "duplicate")
          .otherwise($"reason_pre"))
      .groupBy($"reason").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"reason")
  }

  val dropReasonsSql: String =
    s"""WITH $bronzeCte,
       |pre AS (
       |  SELECT *,
       |    CASE WHEN ghi_wm2 < 0 THEN 'invalid_ghi'
       |         WHEN t2m_c < -80 OR t2m_c > 80 THEN 'invalid_temp'
       |         WHEN ws10_mps < 0 THEN 'invalid_wind'
       |         WHEN ghi_wm2 IS NULL THEN 'missing_ghi'
       |         WHEN t2m_c IS NULL THEN 'missing_temp'
       |         WHEN ws10_mps IS NULL THEN 'missing_wind'
       |         ELSE 'kept' END AS reason_pre
       |  FROM bronze),
       |ranked AS (
       |  SELECT reason_pre,
       |    ROW_NUMBER() OVER (
       |      PARTITION BY site, date_trunc('hour', ts_utc), reason_pre
       |      ORDER BY ingested_at DESC, ingest_seq DESC) AS rn
       |  FROM pre)
       |SELECT CASE WHEN reason_pre = 'kept' AND rn > 1
       |            THEN 'duplicate' ELSE reason_pre END AS reason,
       |       COUNT(*) AS n
       |FROM ranked GROUP BY 1 ORDER BY n DESC, reason""".stripMargin

  // ---------------------------------------------------------------
  // A6 + SO2 — per-hour completeness matrix, long form
  // (streamlit/app.py:519-526): the reference nulls range-INVALID
  // values first (analyse_cleaning), so an invalid-but-present value
  // counts as unavailable; then available=1 iff every record that
  // (site, hour) has the measure valid and non-null; wide → melt.
  // Validation is the same Q3 range→null as the cleaning kernel.
  // ---------------------------------------------------------------

  def completeness(spark: SparkSession, dir: String): DataFrame = {
    def avail(c: Column) = min(when(c.isNotNull, 1).otherwise(0))
    bronze(spark, dir)
      .select($"site", date_trunc("hour", $"ts_utc").as("ts_hour"),
        when($"ghi_wm2" < 0, lit(null).cast(DoubleType))
          .otherwise($"ghi_wm2").as("ghi_v"),
        when($"t2m_c" < -80 || $"t2m_c" > 80, lit(null).cast(DoubleType))
          .otherwise($"t2m_c").as("t2m_v"),
        when($"ws10_mps" < 0, lit(null).cast(DoubleType))
          .otherwise($"ws10_mps").as("ws_v"))
      .groupBy($"site", $"ts_hour")
      .agg(avail($"ghi_v").as("ghi_wm2"),
           avail($"t2m_v").as("t2m_c"),
           avail($"ws_v").as("ws10_mps"))
      .unpivot(Array($"site", $"ts_hour"),
               Array($"ghi_wm2", $"t2m_c", $"ws10_mps"),
               "variable", "available")
      .orderBy($"site", $"ts_hour", $"variable")
  }

  val completenessSql: String = withSilver(
    """, wide AS (
      |  SELECT site, ts_hour,
      |    MIN(CASE WHEN ghi_v IS NOT NULL THEN 1 ELSE 0 END) AS ghi_wm2,
      |    MIN(CASE WHEN t2m_v IS NOT NULL THEN 1 ELSE 0 END) AS t2m_c,
      |    MIN(CASE WHEN ws_v IS NOT NULL THEN 1 ELSE 0 END) AS ws10_mps
      |  FROM validated GROUP BY 1, 2)
      |SELECT site, ts_hour, variable, available FROM (
      |  SELECT site, ts_hour, 'ghi_wm2' AS variable, ghi_wm2 AS available FROM wide
      |  UNION ALL
      |  SELECT site, ts_hour, 't2m_c', t2m_c FROM wide
      |  UNION ALL
      |  SELECT site, ts_hour, 'ws10_mps', ws10_mps FROM wide)
      |ORDER BY site, ts_hour, variable""".stripMargin)

  // ---------------------------------------------------------------
  // A8 — raw-vs-clean KPI metrics (fastapi/app/main.py:262-289):
  // kept_pct null-safe on zero raw rows, dropped clamped at 0.
  // ---------------------------------------------------------------

  def siteMetrics(spark: SparkSession, dir: String): DataFrame = {
    // NOTE: the raw/kept branches intentionally recompute the Bronze
    // subtree rather than cache it — the narrow codegen'd scan is
    // cheaper than materializing the cache (measured at sf0.1)
    val b = bronze(spark, dir)
    val raw = b.groupBy($"site")
      .agg(count(lit(1)).as("raw_rows"))
    val kept = cleanToHourly(b).groupBy($"site")
      .agg(count(lit(1)).as("kept_rows"))
    raw.join(kept, Seq("site"), "left_outer")
      .select(
        $"site", $"raw_rows",
        coalesce($"kept_rows", lit(0L)).as("kept_rows"),
        when($"raw_rows" === 0, lit(null).cast(DoubleType))
          .otherwise(coalesce($"kept_rows", lit(0L)).cast(DoubleType)
                     / $"raw_rows" * 100).as("kept_pct"),
        greatest($"raw_rows" - coalesce($"kept_rows", lit(0L)), lit(0L))
          .as("dropped_rows"))
      .orderBy($"site")
  }

  val siteMetricsSql: String = withSilver(
    """, raw AS (SELECT site, COUNT(*) AS raw_rows FROM bronze GROUP BY site),
      |kept AS (SELECT site, COUNT(*) AS kept_rows FROM silver GROUP BY site)
      |SELECT r.site, r.raw_rows,
      |  COALESCE(k.kept_rows, 0) AS kept_rows,
      |  CASE WHEN r.raw_rows = 0 THEN NULL
      |       ELSE CAST(COALESCE(k.kept_rows, 0) AS DOUBLE) / r.raw_rows * 100
      |       END AS kept_pct,
      |  GREATEST(r.raw_rows - COALESCE(k.kept_rows, 0), 0) AS dropped_rows
      |FROM raw r LEFT JOIN kept k ON r.site = k.site
      |ORDER BY r.site""".stripMargin)

  // ---------------------------------------------------------------
  // A4 + F7 — raw vs clean means with zero-guarded percent deltas
  // (streamlit/app.py:331-353). Means rounded to 6dp (sum error after
  // /n is ~1e-12 — far from the 5e-7 rounding boundary); deltas
  // computed from the rounded means so both engines use identical
  // operands.
  // ---------------------------------------------------------------

  def siteMeans(spark: SparkSession, dir: String): DataFrame = {
    val b = bronze(spark, dir) // recompute beats cache for narrow scans
    val raw = b.groupBy($"site").agg(
      round(avg($"ghi_wm2"), 6).as("raw_ghi"),
      round(avg($"t2m_c"), 6).as("raw_t2m"),
      round(avg($"ws10_mps"), 6).as("raw_ws"))
    val clean = cleanToHourly(b).groupBy($"site").agg(
      round(avg($"ghi_wm2"), 6).as("clean_ghi"),
      round(avg($"temp_c"), 6).as("clean_t2m"),
      round(avg($"wind_mps"), 6).as("clean_ws"))
    def delta(c: Column, r: Column) =
      when(r === 0, lit(null).cast(DoubleType))
        .otherwise(round((c - r) / r * 100, 6))
    raw.join(clean, Seq("site"))
      .withColumn("delta_ghi_pct", delta($"clean_ghi", $"raw_ghi"))
      .withColumn("delta_t2m_pct", delta($"clean_t2m", $"raw_t2m"))
      .withColumn("delta_ws_pct", delta($"clean_ws", $"raw_ws"))
      .orderBy($"site")
  }

  val siteMeansSql: String = withSilver(
    """, raw AS (
      |  SELECT site, ROUND(AVG(ghi_wm2), 6) AS raw_ghi,
      |    ROUND(AVG(t2m_c), 6) AS raw_t2m, ROUND(AVG(ws10_mps), 6) AS raw_ws
      |  FROM bronze GROUP BY site),
      |clean AS (
      |  SELECT site, ROUND(AVG(ghi_wm2), 6) AS clean_ghi,
      |    ROUND(AVG(temp_c), 6) AS clean_t2m, ROUND(AVG(wind_mps), 6) AS clean_ws
      |  FROM silver GROUP BY site)
      |SELECT r.site, raw_ghi, raw_t2m, raw_ws, clean_ghi, clean_t2m, clean_ws,
      |  CASE WHEN raw_ghi = 0 THEN NULL
      |       ELSE ROUND((clean_ghi - raw_ghi) / raw_ghi * 100, 6) END AS delta_ghi_pct,
      |  CASE WHEN raw_t2m = 0 THEN NULL
      |       ELSE ROUND((clean_t2m - raw_t2m) / raw_t2m * 100, 6) END AS delta_t2m_pct,
      |  CASE WHEN raw_ws = 0 THEN NULL
      |       ELSE ROUND((clean_ws - raw_ws) / raw_ws * 100, 6) END AS delta_ws_pct
      |FROM raw r JOIN clean c ON r.site = c.site
      |ORDER BY r.site""".stripMargin)

  // ---------------------------------------------------------------
  // JN1 — 3-way full-outer series alignment on the time axis
  // (fastapi/app/etl/nasa.py:91-108): three per-site hourly series,
  // absent hours surface as nulls. The per-series aggregates are tiny
  // → Spark broadcasts the join sides.
  // ---------------------------------------------------------------

  def alignedSeries(spark: SparkSession, dir: String): DataFrame = {
    // one scan + one shuffle builds all three per-site series; the
    // full-outer alignment then joins three tiny cached slices (the
    // same operator shape, without re-scanning events per series)
    val byHourSite = bronze(spark, dir)
      .filter($"site".isin("click", "error", "purchase"))
      .groupBy(date_trunc("hour", $"ts_utc").as("ts_hour"), $"site")
      // exact decimal mean — same 6dp ROUND boundary hazard as q31
      .agg(graft.functions.Exact.davg($"ghi_wm2").as("ghi"))
      // lazy localCheckpoint, not cache(): the handle is function-local
      // (un-unpersistable by any caller); blocks free with the plan
      .localCheckpoint(false)
    def series(site: String, out: String) =
      byHourSite.filter($"site" === site).select($"ts_hour", $"ghi".as(out))
    series("click", "click_ghi")
      .join(series("error", "error_ghi"), Seq("ts_hour"), "full_outer")
      .join(series("purchase", "purchase_ghi"), Seq("ts_hour"), "full_outer")
      .orderBy($"ts_hour")
  }

  val alignedSeriesSql: String =
    s"""WITH $bronzeCte,
       |s1 AS (SELECT date_trunc('hour', ts_utc) AS ts_hour,
       |         ${graft.functions.Exact.sqlDavg("ghi_wm2")} AS click_ghi
       |       FROM bronze WHERE site = 'click' GROUP BY 1),
       |s2 AS (SELECT date_trunc('hour', ts_utc) AS ts_hour,
       |         ${graft.functions.Exact.sqlDavg("ghi_wm2")} AS error_ghi
       |       FROM bronze WHERE site = 'error' GROUP BY 1),
       |s3 AS (SELECT date_trunc('hour', ts_utc) AS ts_hour,
       |         ${graft.functions.Exact.sqlDavg("ghi_wm2")} AS purchase_ghi
       |       FROM bronze WHERE site = 'purchase' GROUP BY 1)
       |SELECT ts_hour, click_ghi, error_ghi, purchase_ghi
       |FROM s1 FULL JOIN s2 USING (ts_hour) FULL JOIN s3 USING (ts_hour)
       |ORDER BY ts_hour""".stripMargin

  // ---------------------------------------------------------------
  // Gold marts (infra/init.sql:44-91; SURVEY §7.1-6). Row-wise IEEE
  // arithmetic mirrored 1:1 — no rounding needed for features; KPI
  // capacity factors aggregate ≤24 rows/group → round(…,6) is safe.
  // PV: 5 MW at 20% efficiency; wind: cubic power curve capped at
  // 10 MWh (the DDL only fixes schema + bounds, init.sql:56).
  // ---------------------------------------------------------------

  val PvCapacityMw = 5.0
  val WindCapacityMw = 10.0

  /** mart_features at its full DDL shape (init.sql:44-54) incl. the
    * computed_at audit column: deterministic from the winning Bronze
    * row's ingested_at (the q36/q37 pattern — DEFAULT NOW() would
    * break oracle-checkability). Un-enforced pipeline builder — q28/
    * q29/q30 compose on top of it; the q27 mart boundary adds the
    * CHECK enforcement in [[goldFeaturesMart]]. */
  def goldFeatures(spark: SparkSession, dir: String): DataFrame =
    goldFeaturesFromAudit(cleanToHourlyAudit(bronze(spark, dir)))
      .orderBy($"site", $"ts_utc")

  /** The same mart over any audit-shaped silver frame (needs site,
    * ts_utc, ghi_wm2, wind_mps, ingested_at) — shared by the in-memory
    * path above and the warehouse path (graft.Pipeline), which reads
    * the PUBLISHED silver store instead of recomputing the kernel. */
  def goldFeaturesFromAudit(silverAudit: DataFrame): DataFrame =
    silverAudit.select(
      $"site", $"ts_utc",
      ($"ghi_wm2" / 1000).as("ghi_kwh_m2"),
      ($"ghi_wm2" / 1000 * 5.0 * 0.2).as("pv_est_mwh"),
      least(lit(10.0), lit(0.003) * $"wind_mps" * $"wind_mps" * $"wind_mps")
        .as("wind_est_mwh"),
      $"ingested_at".as("computed_at"))

  /** q27 — the mart_features write boundary: Validator.enforce guards
    * the DDL CHECKs (measures ≥ 0, hourly alignment) over the
    * once-materialized frame before it is published. */
  def goldFeaturesMart(spark: SparkSession, dir: String): DataFrame = {
    val features = goldFeatures(spark, dir).localCheckpoint(false)
    graft.schema.Validator
      .enforce(features, graft.schema.Schemas.martFeaturesChecks,
        "mart_features")
      .orderBy($"site", $"ts_utc")
  }

  val featuresCte: String =
    """features AS (
      |  SELECT site, ts_utc,
      |    ghi_wm2 / 1000 AS ghi_kwh_m2,
      |    ghi_wm2 / 1000 * 5.0 * 0.2 AS pv_est_mwh,
      |    LEAST(10.0, 0.003 * wind_mps * wind_mps * wind_mps) AS wind_est_mwh,
      |    cleaned_at AS computed_at
      |  FROM silver_audit)""".stripMargin

  val goldFeaturesSql: String = withSilver(
    s", $featuresCte\nSELECT * FROM features ORDER BY site, ts_utc")

  def goldKpis(spark: SparkSession, dir: String): DataFrame =
    goldFeatures(spark, dir)
      .groupBy($"site", date_trunc("day", $"ts_utc").as("day"))
      .agg(round(sum($"pv_est_mwh"), 6).as("pv_mwh"),
           round(sum($"wind_est_mwh"), 6).as("wind_mwh"),
           count(lit(1)).as("n_hours"))
      .select($"site", $"day", $"pv_mwh", $"wind_mwh", $"n_hours",
        round(least(lit(1.2), $"pv_mwh" / (lit(PvCapacityMw) * $"n_hours")), 6)
          .as("pv_cf"),
        round(least(lit(1.2), $"wind_mwh" / (lit(WindCapacityMw) * $"n_hours")), 6)
          .as("wind_cf"))
      .orderBy($"site", $"day")

  val goldKpisSql: String = withSilver(
    s""", $featuresCte,
       |agg AS (
       |  SELECT site, date_trunc('day', ts_utc) AS day,
       |    ROUND(SUM(pv_est_mwh), 6) AS pv_mwh,
       |    ROUND(SUM(wind_est_mwh), 6) AS wind_mwh,
       |    COUNT(*) AS n_hours
       |  FROM features GROUP BY 1, 2)
       |SELECT site, day, pv_mwh, wind_mwh, n_hours,
       |  ROUND(LEAST(1.2, pv_mwh / (5.0 * n_hours)), 6) AS pv_cf,
       |  ROUND(LEAST(1.2, wind_mwh / (10.0 * n_hours)), 6) AS wind_cf
       |FROM agg ORDER BY site, day""".stripMargin)

  // ---------------------------------------------------------------
  // DDL-complete audit shapes (VERDICT r1 "What's missing" #2):
  // fact_weather with cleaned_at (init.sql:26-37) and the HOURLY
  // (site, ts_utc) mart_kpis with explicit capacity columns and
  // computed_at (init.sql:80-91). Audit timestamps derive from the
  // winning Bronze row's ingested_at — deterministic (unlike DEFAULT
  // NOW()), so both queries stay oracle-checkable. Validator.enforce
  // guards the DDL CHECKs at the query boundary, over the cached
  // frame (one extra small aggregate, no recompute).
  // ---------------------------------------------------------------

  /** q37 — fact_weather DDL shape incl. the cleaned_at audit column. */
  def silverAudit(spark: SparkSession, dir: String): DataFrame = {
    val audit = cleanToHourlyAudit(bronze(spark, dir))
      .select($"site", $"ts_utc", $"ghi_wm2", $"temp_c", $"wind_mps",
              $"ingested_at".as("cleaned_at"))
      .localCheckpoint(false) // enforce + orderBy share one compute
    graft.schema.Validator
      .enforce(audit, graft.schema.Schemas.factWeatherChecks, "fact_weather")
      .orderBy($"site", $"ts_utc")
  }

  val silverAuditSql: String =
    withSilver("SELECT * FROM silver_audit ORDER BY site, ts_utc")

  /** q36 — mart_kpis at its true hourly grain: capacity factors are
    * est_mwh / (capacity_mw × 1 h), clamped to the DDL's [0, 1.2]. */
  def martKpisHourly(spark: SparkSession, dir: String): DataFrame = {
    val kpis = martKpisFromAudit(cleanToHourlyAudit(bronze(spark, dir)))
      .localCheckpoint(false) // enforce + orderBy share one compute
    graft.schema.Validator
      .enforce(kpis, graft.schema.Schemas.martKpisChecks, "mart_kpis")
      .orderBy($"site", $"ts_utc")
  }

  /** mart_kpis over any audit-shaped silver frame (the
    * [[goldFeaturesFromAudit]] pattern; used by graft.Pipeline). */
  def martKpisFromAudit(silverAudit: DataFrame): DataFrame =
    silverAudit.select(
      $"site", $"ts_utc",
      lit(PvCapacityMw).as("pv_capacity_mw"),
      lit(WindCapacityMw).as("wind_capacity_mw"),
      round(least(lit(1.2),
        ($"ghi_wm2" / 1000 * 5.0 * 0.2) / PvCapacityMw), 6).as("pv_cf"),
      round(least(lit(1.2),
        least(lit(10.0), lit(0.003) * $"wind_mps" * $"wind_mps" * $"wind_mps")
          / WindCapacityMw), 6).as("wind_cf"),
      $"ingested_at".as("computed_at"))

  val martKpisHourlySql: String = withSilver(
    """, kpis AS (
      |  SELECT site, ts_utc,
      |    CAST(5.0 AS DOUBLE) AS pv_capacity_mw,
      |    CAST(10.0 AS DOUBLE) AS wind_capacity_mw,
      |    ROUND(LEAST(1.2, (ghi_wm2 / 1000 * 5.0 * 0.2) / 5.0), 6) AS pv_cf,
      |    ROUND(LEAST(1.2,
      |      LEAST(10.0, 0.003 * wind_mps * wind_mps * wind_mps) / 10.0), 6)
      |      AS wind_cf,
      |    cleaned_at AS computed_at
      |  FROM silver_audit)
      |SELECT * FROM kpis ORDER BY site, ts_utc""".stripMargin)

  // ---------------------------------------------------------------
  // mart_forecast (infra/init.sql:61-73): seasonal-naive baseline —
  // yhat(T+h) = y(T+h-24⌈h/24⌉), i.e. the same hour of the last
  // observed day, for the DDL's full horizon range 1..48 (init.sql:66;
  // horizons 25..48 reach back 48 h, the standard seasonal-naive
  // convention past one season and the one q30's 'sarimax' slot uses).
  // Gaps coalesce to 0 (yhat is NOT NULL ≥ 0 in the DDL). Both DDL
  // vars are forecast — var='pv' from pv_est_mwh and var='wind' from
  // wind_est_mwh (init.sql:65, the KPI mart models both capacities,
  // init.sql:83-86). Interval bounds ±10% (the DDL fixes schema, not
  // the model).
  // ---------------------------------------------------------------

  val BaselineHorizons = 48

  def forecastBaseline(spark: SparkSession, dir: String): DataFrame = {
    // materialized once (lazy localCheckpoint — the handle is
    // function-local, so cache() could never be unpersisted): both the
    // last-hour aggregate and the horizon join read the full
    // silver+features lineage (the result is site×hours — small —
    // unlike the Bronze frames, where materializing measured slower)
    val features = goldFeatures(spark, dir)
      .select($"site", $"ts_utc", $"pv_est_mwh", $"wind_est_mwh",
              $"computed_at")
      .localCheckpoint(false)
    // created_at (init.sql:72): deterministic "forecast built from data
    // as of X" — the newest audit stamp among the site's features
    val lastHour = features.groupBy($"site")
      .agg(max($"ts_utc").as("t_max"),
           max($"computed_at").as("created_at"))
    val horizons = lastHour
      .select($"site", $"t_max", $"created_at",
              explode(sequence(lit(1), lit(BaselineHorizons))).as("horizon_h"))
      .withColumn("horizon_h", $"horizon_h".cast(IntegerType))
      .withColumn("lag_step", when($"horizon_h" <= 24, 24).otherwise(48))
      .withColumn("src_ts",
        expr("timestampadd(HOUR, horizon_h - lag_step, t_max)"))
      .withColumn("ts_utc", expr("timestampadd(HOUR, horizon_h, t_max)"))
    val out = horizons
      .join(features.drop("computed_at").withColumnRenamed("ts_utc", "src_ts"),
            Seq("site", "src_ts"), "left_outer")
      .select(
        $"site", $"ts_utc", lit("baseline").as("model"), $"horizon_h",
        $"created_at",
        coalesce($"pv_est_mwh", lit(0.0)).as("pv"),
        coalesce($"wind_est_mwh", lit(0.0)).as("wind"))
      .unpivot(Array($"site", $"ts_utc", $"model", $"horizon_h", $"created_at"),
               Array($"pv", $"wind"), "var", "yhat")
      .withColumn("yhat_lower", $"yhat" * 0.9)
      .withColumn("yhat_upper", $"yhat" * 1.1)
      .select($"site", $"ts_utc", $"model", $"var", $"horizon_h",
              $"yhat", $"yhat_lower", $"yhat_upper", $"created_at")
      .localCheckpoint(false)
    graft.schema.Validator
      .enforce(out, graft.schema.Schemas.martForecastChecks, "mart_forecast")
      .orderBy($"site", $"var", $"horizon_h")
  }

  val forecastBaselineSql: String = withSilver(
    s""", $featuresCte,
       |last_hour AS (SELECT site, MAX(ts_utc) AS t_max,
       |                MAX(computed_at) AS created_at
       |              FROM features GROUP BY site),
       |horizons AS (
       |  SELECT l.site, l.t_max, l.created_at, CAST(g.h AS INTEGER) AS horizon_h,
       |    l.t_max + (CAST(g.h AS INTEGER)
       |               - CASE WHEN g.h <= 24 THEN 24 ELSE 48 END)
       |      * INTERVAL '1 hour' AS src_ts,
       |    l.t_max + CAST(g.h AS INTEGER) * INTERVAL '1 hour' AS ts_utc
       |  FROM last_hour l, generate_series(1, 48) AS g(h)),
       |joined AS (
       |  SELECT h.site, h.ts_utc, 'baseline' AS model, h.horizon_h, h.created_at,
       |    COALESCE(f.pv_est_mwh, 0.0) AS pv,
       |    COALESCE(f.wind_est_mwh, 0.0) AS wind
       |  FROM horizons h
       |  LEFT JOIN features f ON f.site = h.site AND f.ts_utc = h.src_ts),
       |long AS (
       |  SELECT site, ts_utc, model, 'pv' AS var, horizon_h, pv AS yhat, created_at FROM joined
       |  UNION ALL
       |  SELECT site, ts_utc, model, 'wind', horizon_h, wind, created_at FROM joined)
       |SELECT site, ts_utc, model, var, horizon_h, yhat,
       |  yhat * 0.9 AS yhat_lower, yhat * 1.1 AS yhat_upper, created_at
       |FROM long ORDER BY site, var, horizon_h""".stripMargin)

  // ---------------------------------------------------------------
  // JN3 / S3-S4 — key-match upsert as a relational statement: incoming
  // window wins over the overlapping existing window (nasa.py:133-137,
  // silver_clean.py:50-53). The file-based writer with the same
  // semantics lives in graft.sources.UpsertWriter.
  // ---------------------------------------------------------------

  def upsertMerge(spark: SparkSession, dir: String): DataFrame = {
    // The window bounds are day-aligned, so every (site, hour) group
    // falls wholly inside or outside each batch window — one scan +
    // one aggregation over the union range yields BOTH batches as
    // hour-level slices (identical means), instead of two full scans.
    val hourly = bronze(spark, dir)
      .filter($"ts_utc" >= lit("2024-01-01").cast(TimestampType)
              && $"ts_utc" < lit("2024-01-31").cast(TimestampType))
      .groupBy($"site", date_trunc("hour", $"ts_utc").as("ts_hour"))
      // Exact decimal mean, NOT round(avg(...), 6): per-hour groups are
      // small, so the mean can land a hair under a 6dp half-boundary
      // where DuckDB's scaled-multiply ROUND rounds up (the ×1e6
      // product hits .5 exactly in binary) while Spark's BigDecimal
      // round correctly rounds down — observed at sf0.1. ghi is ±2dp
      // `value`, so the DECIMAL(12,2) sum is lossless and the division
      // operands are bit-identical in both engines; no rounding needed.
      .agg(graft.functions.Exact.davg($"ghi_wm2").as("ghi_mean"))
      .localCheckpoint(false) // both batch slices read this aggregate
    val existing = hourly
      .filter($"ts_hour" < lit("2024-01-16").cast(TimestampType))
      .withColumn("batch", lit("old"))
    val incoming = hourly
      .filter($"ts_hour" >= lit("2024-01-10").cast(TimestampType))
      .withColumn("batch", lit("new"))
    existing.join(incoming, Seq("site", "ts_hour"), "left_anti")
      .unionByName(incoming)
      .orderBy($"site", $"ts_hour")
  }

  val upsertMergeSql: String =
    s"""WITH $bronzeCte,
       |existing AS (
       |  SELECT site, date_trunc('hour', ts_utc) AS ts_hour,
       |    ${graft.functions.Exact.sqlDavg("ghi_wm2")} AS ghi_mean, 'old' AS batch
       |  FROM bronze
       |  WHERE ts_utc >= TIMESTAMP '2024-01-01' AND ts_utc < TIMESTAMP '2024-01-16'
       |  GROUP BY 1, 2),
       |incoming AS (
       |  SELECT site, date_trunc('hour', ts_utc) AS ts_hour,
       |    ${graft.functions.Exact.sqlDavg("ghi_wm2")} AS ghi_mean, 'new' AS batch
       |  FROM bronze
       |  WHERE ts_utc >= TIMESTAMP '2024-01-10' AND ts_utc < TIMESTAMP '2024-01-31'
       |  GROUP BY 1, 2)
       |SELECT * FROM existing e
       |WHERE NOT EXISTS (SELECT 1 FROM incoming i
       |                  WHERE i.site = e.site AND i.ts_hour = e.ts_hour)
       |UNION ALL
       |SELECT * FROM incoming
       |ORDER BY site, ts_hour""".stripMargin

  // ---------------------------------------------------------------
  // J-family scalar ops over the semi-structured column.
  // ---------------------------------------------------------------

  /** q32 — JSON field extraction (SURVEY S7/F10 inverse; the reference
    * round-trips raw_json blobs, nasa.py:106,122). */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter($"user_id" < 50)
      .select($"event_id",
              get_json_object($"props", "$.k").cast(IntegerType).as("k"))
      .orderBy($"event_id")

  val jsonExtractSql: String =
    """SELECT event_id,
      |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
      |FROM events WHERE user_id < 50 ORDER BY event_id""".stripMargin

  /** q33 — J1 dual-format timestamp-key parser (nasa.py:58-76):
    * scalar `YYYYMMDDHH` keys and list-form `YYYYMMDD` keys with an
    * hour position; malformed keys are skipped, not errors. Keys are
    * derived from events so both engines parse identical inputs. */
  def dualFormatTsParse(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select($"event_id", $"ts",
        when($"event_id" % 101 === 0, lit("badkey"))
          .when($"event_id" % 2 === 0, date_format($"ts", "yyyyMMddHH"))
          .otherwise(date_format($"ts", "yyyyMMdd")).as("key"),
        hour($"ts").as("pos"))
      .select($"event_id",
        when($"event_id" % 2 === 0,
             try_to_timestamp($"key", lit("yyyyMMddHH")))
          .otherwise(expr(
            "timestampadd(HOUR, pos, try_to_timestamp(key, 'yyyyMMdd'))"))
          .as("parsed_ts"))
      .filter($"parsed_ts".isNotNull)
      .orderBy($"event_id")

  val dualFormatTsParseSql: String =
    """SELECT event_id, parsed_ts FROM (
      |  SELECT event_id,
      |    CASE WHEN event_id % 2 = 0
      |         THEN try_strptime(CASE WHEN event_id % 101 = 0 THEN 'badkey'
      |                                ELSE strftime(ts, '%Y%m%d%H') END,
      |                           '%Y%m%d%H')
      |         ELSE try_strptime(CASE WHEN event_id % 101 = 0 THEN 'badkey'
      |                                ELSE strftime(ts, '%Y%m%d') END,
      |                           '%Y%m%d')
      |              + hour(ts) * INTERVAL '1 hour' END AS parsed_ts
      |  FROM events)
      |WHERE parsed_ts IS NOT NULL ORDER BY event_id""".stripMargin
}
