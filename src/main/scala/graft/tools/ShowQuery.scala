package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: print one driver-contract query's rows — for
  * eyeballing verdict columns (q14 within_5pct) and small result sets
  * while iterating. Usage: runMain graft.tools.ShowQuery <name> [sfDir] [n]. */
object ShowQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val n = if (args.length > 2) args(2).toInt else 50
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "8"))
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.queries(name)(spark, sfDir).show(n, false)
    spark.stop()
  }
}
