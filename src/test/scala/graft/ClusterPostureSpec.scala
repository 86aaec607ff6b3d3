package graft

import org.scalatest.funsuite.AnyFunSuite

/** The cluster-deployment configuration smoke: Bench documents that a
  * real deployment flips `SPARK_GRAFT_AQE=true` and a shuffle
  * partition count sized to the cluster (not the sub-GB bench's 8).
  * Nothing should DEPEND on the bench posture's AQE-off semantics —
  * this suite proves it by running every driver-contract query under
  * AQE + 64 shuffle partitions in a sibling session and demanding
  * row-for-row equality with the default session.
  *
  * Sessions share the JVM/SparkContext (`newSession`), so this also
  * exercises config isolation: both postures execute interleaved
  * against the same context.
  */
class ClusterPostureSpec extends AnyFunSuite {
  import TestSpark.sf

  /** q30's WLS fit sums doubles in partition order, and its rows-only
    * contract (no oracle) documents that floating drift across
    * configurations is acceptable — everything else must be EXACT
    * row-for-row (the same discipline the DuckDB hash gate enforces
    * at 32-vs-1 threads). */
  private val RowsOnly = Set("q30_forecast_ml")

  test("every query is posture-invariant under AQE + 64 shuffle partitions") {
    val base = TestSpark.spark
    val posture = base.newSession()
    posture.conf.set("spark.sql.adaptive.enabled", "true")
    posture.conf.set("spark.sql.shuffle.partitions", "64")
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        val expect = q(base, sf).collect()
        val got = q(posture, sf).collect()
        if (RowsOnly(name)) {
          if (got.length == expect.length) None
          else Some(s"$name: ${got.length} rows vs ${expect.length}")
        } else if (got.toSeq == expect.toSeq) None
        else Some(s"$name: results differ under cluster posture")
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }
}
