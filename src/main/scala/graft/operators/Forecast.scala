package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.syntax._

/** mart_forecast's second model slot (infra/init.sql:61-73): the DDL
  * fixes the OUTPUT contract — model ∈ {'baseline','sarimax'},
  * var ∈ {'pv','wind'}, horizon_h ∈ [1,48], yhat ≥ 0 with optional
  * interval bounds — not the algorithm (no SARIMAX exists on the JVM;
  * SURVEY §7.4-9). This fills the 'sarimax' slot with a ridge-
  * regularized linear model on seasonal-lag + Fourier(hour-of-day)
  * features (lag-24/lag-48 ≈ the seasonal AR terms, Fourier ≈ the
  * seasonal component), for BOTH DDL vars.
  *
  * The fit is the normal-equation solve itself, done Spark-natively:
  * ONE aggregate pass computes the sufficient statistics (X'X, X'y,
  * y'y, n) for both vars simultaneously — a fixed-size (≈50-number)
  * reduce regardless of row count, the shape that survives 100 TB —
  * and the 5×5 ridge system is solved on the driver. Training RMSE
  * (for the interval bounds) comes from the SAME statistics
  * (‖y−Xβ‖² = y'y − 2β'X'y + β'X'Xβ), so no second data pass. This is
  * exactly what MLlib's LinearRegression(solver="normal") computes,
  * minus its per-model job fan-out (measured: 2.7 s → well under 1 s
  * for both vars at sf0.1).
  */
object Forecast {

  val Horizons = 48
  val Ridge = 1e-6

  /** Per-(site, hour) training frame with seasonal lags + Fourier
    * terms over the gold PV series (kept for spec parity). */
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

  /** Solve (A + ridge·I)·β = b for symmetric A via Gaussian
    * elimination with partial pivoting (dim is tiny — 5). */
  private def solve(a: Array[Array[Double]], b: Array[Double],
                    ridge: Double): Array[Double] = {
    val n = b.length
    val m = Array.tabulate(n, n + 1) { (i, j) =>
      if (j == n) b(i) else if (i == j) a(i)(j) + ridge else a(i)(j)
    }
    var col = 0
    while (col < n) {
      var piv = col
      var r = col + 1
      while (r < n) { if (math.abs(m(r)(col)) > math.abs(m(piv)(col))) piv = r; r += 1 }
      val tmp = m(col); m(col) = m(piv); m(piv) = tmp
      val d = m(col)(col)
      require(math.abs(d) > 1e-300, "singular normal equations")
      var j = col
      while (j <= n) { m(col)(j) /= d; j += 1 }
      r = 0
      while (r < n) {
        if (r != col && m(r)(col) != 0.0) {
          val f = m(r)(col)
          var k = col
          while (k <= n) { m(r)(k) -= f * m(col)(k); k += 1 }
        }
        r += 1
      }
      col += 1
    }
    Array.tabulate(n)(i => m(i)(n))
  }

  /** Per-site history frame with both DDL vars — shared input of
    * [[buildTrain]] and the horizon emitter. */
  private[graft] def history(spark: SparkSession, dir: String): DataFrame =
    Weather.goldFeatures(spark, dir)
      .select($"site", $"ts_utc",
        $"pv_est_mwh".as("y_pv"), $"wind_est_mwh".as("y_wind"),
        $"computed_at")
      // lazy localCheckpoint, not cache(): the handle is function-local
      // (un-unpersistable); blocks free with the plan (q45 discipline)
      .localCheckpoint(false)

  /** Training frame for both vars: seasonal lags + Fourier terms. */
  private[graft] def buildTrain(hist: DataFrame): DataFrame = {
    val w = Window.partitionBy($"site").orderBy($"ts_utc")
    hist
      .withColumn("lag24_pv", lag($"y_pv", 24).over(w))
      .withColumn("lag48_pv", lag($"y_pv", 48).over(w))
      .withColumn("lag24_wind", lag($"y_wind", 24).over(w))
      .withColumn("lag48_wind", lag($"y_wind", 48).over(w))
      .withColumn("hod", hour($"ts_utc").cast(DoubleType))
      .withColumn("sin_h", sin($"hod" * (2 * math.Pi / 24)))
      .withColumn("cos_h", cos($"hod" * (2 * math.Pi / 24)))
      // all four lags must be present: per-term null-skipping inside
      // the sums would otherwise assemble X'X and X'y from different
      // row subsets and silently corrupt the fit
      .filter($"lag24_pv".isNotNull && $"lag48_pv".isNotNull
              && $"lag24_wind".isNotNull && $"lag48_wind".isNotNull)
  }

  /** Per-var design row x = (1, lag24, lag48, sin_h, cos_h). */
  private def xs(v: String): Seq[Column] =
    Seq(lit(1.0), col(s"lag24_$v"), col(s"lag48_$v"), $"sin_h", $"cos_h")
  private val Dims = 5

  /** Normal-equation fit for both vars from ONE sufficient-statistics
    * pass (the fixed-size reduce that survives any scale); returns
    * (β, training RMSE) per var. What MLlib's
    * LinearRegression(solver="normal") computes, minus its per-model
    * job fan-out — ForecastSpec pins the equivalence at ridge 0. */
  private[graft] def fitNormal(train: DataFrame,
                               ridge: Double = Ridge)
      : Map[String, (Array[Double], Double)] = {
    val aggs = Seq("pv", "wind").flatMap { v =>
      val x = xs(v); val y = col(s"y_$v")
      val xtx = for (i <- 0 until Dims; j <- i until Dims)
        yield sum(x(i) * x(j)).as(s"${v}_xx_${i}_$j")
      val xty = (0 until Dims).map(i => sum(x(i) * y).as(s"${v}_xy_$i"))
      xtx ++ xty :+ sum(y * y).as(s"${v}_yy")
    } :+ count(lit(1)).as("n")
    val row = train.agg(aggs.head, aggs.tail: _*).collect()(0)
    require(row.getAs[Long]("n") > 0,
      "forecastMl: empty training frame — every site needs > 48 hours " +
        "of history for the seasonal lags")
    val n = row.getAs[Long]("n").toDouble

    def fit(v: String): (Array[Double], Double) = {
      val a = Array.tabulate(Dims, Dims) { (i, j) =>
        val (lo, hi) = if (i <= j) (i, j) else (j, i)
        row.getAs[Double](s"${v}_xx_${lo}_$hi")
      }
      val b = Array.tabulate(Dims)(i => row.getAs[Double](s"${v}_xy_$i"))
      val yy = row.getAs[Double](s"${v}_yy")
      val beta = solve(a, b, ridge)
      // ‖y − Xβ‖² from the same statistics — no second data pass
      val bAb = (for (i <- 0 until Dims; j <- 0 until Dims)
        yield beta(i) * a(i)(j) * beta(j)).sum
      val btb = (0 until Dims).map(i => beta(i) * b(i)).sum
      val rmse = math.sqrt(math.max(0.0, (yy - 2 * btb + bAb) / n))
      (beta, rmse)
    }
    Seq("pv", "wind").map(v => v -> fit(v)).toMap
  }

  /** The MLlib-backed fit (north star: "MLlib forecasting"): the same
    * model through `o.a.s.ml.regression.LinearRegression(solver =
    * "normal")` — WeightedLeastSquares assembles the identical normal
    * equations distributed-side and solves by Cholesky. regParam 0 +
    * standardization off makes it EXACTLY the ridge-0 [[fitNormal]]
    * system (MLlib regularizes standardized, intercept-excluded
    * coefficients, which matches no fixed λ on raw ones — so
    * equivalence is pinned at the unregularized point; the production
    * path keeps the deterministic fitNormal with its tiny ridge).
    * Two MLlib jobs instead of one aggregate — the cost [[forecastMl]]
    * avoids; [[forecastMlLib]] accepts it to stay on the library
    * solver. */
  private[graft] def fitMllib(train: DataFrame, regParam: Double = 0.0)
      : Map[String, (Array[Double], Double)] = {
    import org.apache.spark.ml.functions.array_to_vector
    import org.apache.spark.ml.regression.LinearRegression
    Seq("pv", "wind").map { v =>
      val assembled = train.select(
        col(s"y_$v").as("label"),
        array_to_vector(array(xs(v).tail: _*)).as("features"))
      val model = new LinearRegression()
        .setSolver("normal").setRegParam(regParam)
        .setStandardization(false).setFitIntercept(true)
        .fit(assembled)
      val beta = model.intercept +: model.coefficients.toArray
      v -> (beta, model.summary.rootMeanSquaredError)
    }.toMap
  }

  /** q30 — 'sarimax'-slot forecast: fit on history, emit horizons 1..48
    * per site for both DDL vars from each site's last observed hour. */
  def forecastMl(spark: SparkSession, dir: String): DataFrame = {
    val hist = history(spark, dir)
    emit(hist, fitNormal(buildTrain(hist)))
  }

  /** The same mart via the MLlib fit — drop-in behind the identical
    * mart_forecast contract (schema + DDL CHECKs enforced in [[emit]]);
    * yhat differs from q30 only by ridge 1e-6 vs 0. */
  def forecastMlLib(spark: SparkSession, dir: String): DataFrame = {
    val hist = history(spark, dir)
    emit(hist, fitMllib(buildTrain(hist)))
  }

  /** Shared horizon emitter: score `models` over horizons 1..48 per
    * site and enforce the mart_forecast DDL contract. */
  private def emit(hist: DataFrame,
                   models: Map[String, (Array[Double], Double)]): DataFrame = {
    // Horizon frame: for h ≤ 24 the lag-24 feature is the observed
    // y(T+h-24); for h in 25..48 it falls back to y(T+h-48) (the same
    // direct-forecast trick SARIMAX deployments use past one season).
    // created_at (init.sql:72): deterministic "forecast built from data
    // as of X" — the newest audit stamp among the site's history
    val lastHour = hist.groupBy($"site")
      .agg(max($"ts_utc").as("t_max"),
           max($"computed_at").as("created_at"))
    val horizons = lastHour
      .select($"site", $"t_max", $"created_at",
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

    val perVar = Seq("pv", "wind").map { v =>
      val (beta, rmse) = models(v)
      val pred = xs(v).zip(beta).map { case (c, b) => c * lit(b) }
        .reduce(_ + _)
      feats.select(
          $"site", $"target_ts".as("ts_utc"),
          lit("sarimax").as("model"), lit(v).as("var"),
          $"h".cast(IntegerType).as("horizon_h"),
          greatest(lit(0.0), pred).as("yhat"), $"created_at")
        .withColumn("yhat_lower", greatest(lit(0.0), $"yhat" - 1.96 * rmse))
        .withColumn("yhat_upper", $"yhat" + 1.96 * rmse)
        .select($"site", $"ts_utc", $"model", $"var", $"horizon_h",
                $"yhat", $"yhat_lower", $"yhat_upper", $"created_at")
    }
    val out = perVar.reduce(_ unionByName _).localCheckpoint(false)
    graft.schema.Validator
      .enforce(out, graft.schema.Schemas.martForecastChecks, "mart_forecast")
      .orderBy($"site", $"var", $"horizon_h")
  }
}
