package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev scratch: dump formatted physical plans for selected queries so
  * pushdown / broadcast / codegen structure can be audited. */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q04_recent_n", "q05_region_revenue", "q07_exists_big_orders",
               "q21_silver_clean", "q36_mart_kpis", "q47_lsh_near_dups",
               "q49_cosine_topk", "q55_winnow_fp", "q56_simhash_pairs",
               "q62_dedup_clusters", "q64_shard_pack", "q66_frame_sample")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n===================== $n =====================")
      println(SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
