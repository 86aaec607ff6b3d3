package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Corpus, Dedup}
import graft.syntax._

/** Dev scratch: per-stage wall-clock of the q76 composition, to
  * attribute its cost (the per-operator TimeQuery numbers don't sum
  * to the composed total — this shows which stage diverges when run
  * inside the composition's session state). */
object StageTime {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stage] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = Tables.documents(spark, dir)
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass")
      spark.catalog.clearCache()
      val clusters = time("q62 clusters (construct+loop)")(
        Dedup.dedupClusters(spark, dir))
      time("q62 count")(clusters.count())
      time("q70 keep corpus")(
        Dedup.dedupKeepCorpusFrom(docs, clusters).count())
      time("q73 keep ids")(
        Corpus.repetitionStatsFrom(docs).filter($"keep").count())
      time("q74 keep ids")(
        Corpus.unigramLogProbFrom(docs).filter($"keep").count())
      time("q59 contaminated")(Corpus.decontaminateFrom(docs)
        .filter($"contamination" >= Corpus.DecontamMaxRate).count())
      time("q75 sampled")(Corpus.mixtureSampleFrom(docs,
        Corpus.MixtureRates, Corpus.MixtureDefaultRate)
        .filter($"sampled").count())
      time("q58 splits")(Corpus.splitAssignFrom(docs).count())
      time("q72 chunk agg")(Corpus.chunkDocsFrom(docs)
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_chunks")).count())
      time("q76 composed")(Corpus.trainingCorpus(spark, dir).count())
    }
    spark.stop()
  }
}
