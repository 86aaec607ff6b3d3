package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Corpus, Dedup}
import graft.syntax._

/** Dev scratch: per-step wall-clock of the q89 maintenance path, to
  * attribute its cost vs the full-batch q70 chain it must beat. */
object ProfileQ89 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "524288")
      .config("spark.sql.files.openCostInBytes", "262144")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[q89] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = Tables.documents(spark, dir)
    val (prevFps, prevBands, prevCand, prevVerified) =
      time("index build (one-time)")(
        Dedup.indexState(Corpus.snapshotPrev(docs)))
    val diff = time("diff build (one-time)")(
      Corpus.snapshotDiffDerived(docs).localCheckpoint(true))

    (1 to 3).foreach { pass =>
      println(s"--- maintenance pass $pass")
      spark.catalog.clearCache()
      val curDocs = Corpus.snapshotCur(docs)
      // replicate incrementalKeepCorpusOf with per-step timing
      val dirtyOut = diff.filter($"status".isin("removed", "changed"))
        .select($"doc_id")
      val deltaIds = diff.filter($"status".isin("added", "changed"))
        .select($"doc_id")
      val deltaFps = Dedup.shingleFpsFrom(
        curDocs.join(broadcast(deltaIds), Seq("doc_id")))
        .localCheckpoint(false)
      time("deltaFps")(deltaFps.count())
      val deltaBands = Dedup.lshBands(deltaFps)
      val keptBands = prevBands.join(broadcast(dirtyOut),
        Seq("doc_id"), "left_anti")
      val allBands = keptBands.unionByName(deltaBands).localCheckpoint(false)
      time("allBands")(allBands.count())
      val oversized = allBands.groupBy($"band_id", $"band_val")
        .agg(count(lit(1)).as("bn")).filter($"bn" > Dedup.MaxBucketDocs)
        .select($"band_id", $"band_val")
      val affected = prevBands.join(broadcast(dirtyOut), Seq("doc_id"))
        .select($"band_id", $"band_val")
        .union(deltaBands.select($"band_id", $"band_val"))
      val regenSrc = allBands
        .join(broadcast(oversized), Seq("band_id", "band_val"), "left_anti")
        .join(broadcast(affected), Seq("band_id", "band_val"), "left_semi")
      val regenPairs = regenSrc.as("x")
        .join(regenSrc.as("y"), Seq("band_id", "band_val"))
        .filter($"x.doc_id" < $"y.doc_id")
        .select($"x.doc_id".as("doc_a"), $"y.doc_id".as("doc_b"))
      val carried = prevCand
        .join(broadcast(dirtyOut.withColumnRenamed("doc_id", "doc_a")),
          Seq("doc_a"), "left_anti")
        .join(broadcast(dirtyOut.withColumnRenamed("doc_id", "doc_b")),
          Seq("doc_b"), "left_anti")
        .join(broadcast(oversized), Seq("band_id", "band_val"), "left_anti")
        .select($"doc_a", $"doc_b")
        .distinct()
        .localCheckpoint(false)
      time("carried")(carried.count())
      val carriedVerified = carried
        .join(broadcast(prevVerified.select($"doc_a", $"doc_b")),
          Seq("doc_a", "doc_b"), "left_semi")
      val freshPairs = regenPairs.distinct()
        .join(carried, Seq("doc_a", "doc_b"), "left_anti")
        .localCheckpoint(false)
      time("freshPairs")(freshPairs.count())
      val endpoints = freshPairs.select($"doc_a".as("doc_id"))
        .union(freshPairs.select($"doc_b".as("doc_id")))
      val allFps = prevFps
        .join(broadcast(dirtyOut), Seq("doc_id"), "left_anti")
        .unionByName(deltaFps)
      val fpsNeeded = allFps.join(broadcast(endpoints), Seq("doc_id"),
        "left_semi")
      val verified = carriedVerified
        .unionByName(Dedup.verifyCandidates(freshPairs, fpsNeeded)
          .select($"doc_a", $"doc_b"))
        .localCheckpoint(false)
      time("verified")(verified.count())
      val clusters = time("clusters (iterative)")(
        Dedup.dedupClustersFrom(verified))
      time("clusters count")(clusters.count())
      val out = Dedup.dedupKeepCorpusFrom(curDocs, clusters)
      time("keep corpus count")(out.count())
    }
    @volatile var jobStart = Map.empty[Int, (Long, String)]
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val site = j.stageInfos.map(_.name.takeWhile(_ != '\n'))
            .mkString(" | ")
          jobStart += j.jobId -> (System.nanoTime(), site)
        }
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val (dt, site) = jobStart.get(j.jobId)
            .map { case (t, s) => ((System.nanoTime() - t) / 1e9, s) }
            .getOrElse((-1.0, "?"))
          println(f"  [job ${j.jobId}] $dt%.2f s  $site")
        }
      })
    (1 to 3).foreach { pass =>
      println(s"--- named pass $pass")
      spark.catalog.clearCache()
      val named = time("named construction (incl. CC rounds)")(
        Dedup.incrementalKeepCorpus(spark, dir))
      time("named count")(named.count())
    }
    spark.stop()
  }
}
