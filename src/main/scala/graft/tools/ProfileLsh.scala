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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val shd = Dedup.shingles(spark, dir).cache()
    time("shingles count")(shd.count())
    val mh = Dedup.minhashFromShingles(shd)
    time("minhash count")(mh.count())
    val bands = mh
      .withColumn("band_id", (col("seed") / lit(Dedup.BandSize)).cast("int"))
      .groupBy(col("doc_id"), col("band_id"))
      .agg(md5(array_join(transform(
          array_sort(collect_list(struct(col("seed"), col("minhash")))),
          x => x.getField("minhash")), "").cast("binary")).as("band_val"))
      .cache()
    time("bands count")(bands.count())
    val cand = bands.as("x")
      .join(bands.as("y"), Seq("band_id", "band_val"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
      .cache()
    time("candidates count")(cand.count())
    val sizes = shd.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = cand
      .join(shd.select(col("doc_id").as("doc_a"), col("s")), Seq("doc_a"))
      .join(shd.select(col("doc_id").as("doc_b"), col("s")), Seq("doc_b", "s"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("i"))
    time("verified count")(inter.count())
    time("full q47")(Dedup.lshNearDupPairs(spark, dir).count())
    spark.stop()
  }
}
