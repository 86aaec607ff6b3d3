package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Dev scratch: stage-by-stage timing of the LSH pipeline. */
object ProfileLsh {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    time("shingle fps count")(Dedup.shingleFps(spark, dir).count())
    spark.catalog.clearCache()
    time("signatures count")(Dedup.minhashSignatures(spark, dir).count())
    spark.catalog.clearCache()
    time("full q47 (1st)")(Dedup.lshNearDupPairs(spark, dir).count())
    spark.catalog.clearCache()
    time("full q47 (2nd)")(Dedup.lshNearDupPairs(spark, dir).count())
    spark.catalog.clearCache()
    time("full q55 (1st)")(Dedup.winnowFingerprints(spark, dir).count())
    spark.catalog.clearCache()
    time("full q55 (2nd)")(Dedup.winnowFingerprints(spark, dir).count())
    spark.stop()
  }
}
