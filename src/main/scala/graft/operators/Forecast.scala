package graft.operators

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.LinearRegression
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.syntax._

/** mart_forecast's second model slot (infra/init.sql:61-73): the DDL
  * fixes the OUTPUT contract — model ∈ {'baseline','sarimax'},
  * var ∈ {'pv','wind'}, horizon_h ∈ [1,48], yhat ≥ 0 with optional
  * interval bounds — not the algorithm (MLlib has no SARIMAX; SURVEY
  * §7.4-9). This fills the 'sarimax' slot with its MLlib analogue: a
  * linear model on seasonal-lag + Fourier(hour-of-day) features
  * (lag-24/lag-48 ≈ the seasonal AR terms, Fourier ≈ the seasonal
  * component), solved with the deterministic "normal" (WLS) solver,
  * intervals from training RMSE.
  *
  * Scale notes: feature building is one window pass per site
  * (shuffle on site); the normal-equation solve reduces X'X / X'y —
  * a fixed-size aggregate regardless of row count. Forecast rows are
  * horizons × sites (tiny). Not oracle-checked (an iterative/LAPACK
  * fit isn't bit-reproducible in SQL) — bounds and shape are pinned by
  * ForecastSpec instead.
  */
object Forecast {

  val Horizons = 48

  /** Per-(site, hour) training frame with seasonal lags + Fourier
    * terms over the gold PV series. */
  private[graft] def trainingFrame(features: DataFrame): DataFrame = {
    val w = Window.partitionBy($"site").orderBy($"ts_utc")
    features
      .select($"site", $"ts_utc", $"pv_est_mwh".as("y"))
      .withColumn("lag24", lag($"y", 24).over(w))
      .withColumn("lag48", lag($"y", 48).over(w))
      .withColumn("hod", hour($"ts_utc").cast(DoubleType))
      .withColumn("sin_h", sin($"hod" * (2 * math.Pi / 24)))
      .withColumn("cos_h", cos($"hod" * (2 * math.Pi / 24)))
      .filter($"lag24".isNotNull && $"lag48".isNotNull)
  }

  /** q30 — 'sarimax'-slot forecast: fit on history, emit horizons 1..48
    * per site for BOTH DDL vars (init.sql:65) from each site's last
    * observed hour. The lag window, horizon frame, and both joins are
    * built once with pv and wind side by side; only the (cheap,
    * fixed-size) normal-equation fit and the final projection run
    * per-var. */
  def forecastMl(spark: SparkSession, dir: String): DataFrame = {
    val gold = Weather.goldFeatures(spark, dir)
    val w = Window.partitionBy($"site").orderBy($"ts_utc")
    val hist = gold
      .select($"site", $"ts_utc",
        $"pv_est_mwh".as("y_pv"), $"wind_est_mwh".as("y_wind"))
      .cache()
    val train = hist
      .withColumn("lag24_pv", lag($"y_pv", 24).over(w))
      .withColumn("lag48_pv", lag($"y_pv", 48).over(w))
      .withColumn("lag24_wind", lag($"y_wind", 24).over(w))
      .withColumn("lag48_wind", lag($"y_wind", 48).over(w))
      .withColumn("hod", hour($"ts_utc").cast(DoubleType))
      .withColumn("sin_h", sin($"hod" * (2 * math.Pi / 24)))
      .withColumn("cos_h", cos($"hod" * (2 * math.Pi / 24)))
      .filter($"lag24_pv".isNotNull && $"lag48_pv".isNotNull)
      .cache()

    // Horizon frame: for h ≤ 24 the lag-24 feature is the observed
    // y(T+h-24); for h in 25..48 it falls back to y(T+h-48) (the same
    // direct-forecast trick SARIMAX deployments use past one season).
    val lastHour = hist.groupBy($"site").agg(max($"ts_utc").as("t_max"))
    val horizons = lastHour
      .select($"site", $"t_max",
        explode(sequence(lit(1), lit(Horizons))).as("h"))
      .withColumn("target_ts", expr("timestampadd(HOUR, h, t_max)"))
      .withColumn("lag_step", when($"h" <= 24, 24).otherwise(48))
      .withColumn("src24", expr("timestampadd(HOUR, h - lag_step, t_max)"))
      .withColumn("src48", expr("timestampadd(HOUR, h - lag_step - 24, t_max)"))
    val feats = horizons
      .join(hist.select($"site", $"ts_utc".as("src24"),
              $"y_pv".as("lag24_pv"), $"y_wind".as("lag24_wind")),
            Seq("site", "src24"), "left_outer")
      .join(hist.select($"site", $"ts_utc".as("src48"),
              $"y_pv".as("lag48_pv"), $"y_wind".as("lag48_wind")),
            Seq("site", "src48"), "left_outer")
      .na.fill(0.0, Seq("lag24_pv", "lag48_pv", "lag24_wind", "lag48_wind"))
      .withColumn("hod", hour($"target_ts").cast(DoubleType))
      .withColumn("sin_h", sin($"hod" * (2 * math.Pi / 24)))
      .withColumn("cos_h", cos($"hod" * (2 * math.Pi / 24)))
      .cache()

    val perVar = Seq("pv", "wind").map { variable =>
      val assembler = new VectorAssembler()
        .setInputCols(Array(
          s"lag24_$variable", s"lag48_$variable", "sin_h", "cos_h"))
        .setOutputCol("feat")
      val lr = new LinearRegression()
        .setFeaturesCol("feat").setLabelCol(s"y_$variable")
        .setSolver("normal").setRegParam(1e-6)
      val model = lr.fit(assembler.transform(train))
      val rmse = model.summary.rootMeanSquaredError
      model.transform(assembler.transform(feats))
        .select(
          $"site", $"target_ts".as("ts_utc"),
          lit("sarimax").as("model"), lit(variable).as("var"),
          $"h".cast(IntegerType).as("horizon_h"),
          greatest(lit(0.0), $"prediction").as("yhat"))
        .withColumn("yhat_lower", greatest(lit(0.0), $"yhat" - 1.96 * rmse))
        .withColumn("yhat_upper", $"yhat" + 1.96 * rmse)
    }
    perVar.reduce(_ unionByName _)
      .orderBy($"site", $"var", $"horizon_h")
  }
}
