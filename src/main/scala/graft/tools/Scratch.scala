package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.syntax._

/** Dev scratch for the r17 optimization round: stage-level attribution
  * inside the prefix-filter pair pipelines (q130/q131) — corpus sizes,
  * candidate counts, and per-stage wall-clock, to locate the dominant
  * cost before changing anything. Not part of the driver contract. */
object Scratch {
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
      println(f"[scr] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    (1 to 2).foreach { pass =>
      println(s"--- pass $pass")
      val fps = time("shingleFps ckpt")(
        Dedup.shingleFps(spark, dir).localCheckpoint(true))
      println(s"[scr] fps rows=${fps.count()} docs=${fps.select("doc_id").distinct().count()} " +
        s"distinct fp=${fps.select("fp").distinct().count()}")
      val dfTop = fps.groupBy($"fp").agg(count(lit(1)).as("df"))
        .agg(max($"df"), avg($"df")).head()
      println(s"[scr] max df=${dfTop.get(0)} avg df=${dfTop.get(1)}")

      // q131 stage by stage (mirrors prefixContainmentSizedOver)
      val t = Dedup.ContainmentThreshold
      val ranked = time("rarityRanked+ckpt")(
        Dedup.rarityRanked(fps, "fp", Dedup.MaxShingleDocFreq))
      val (it, rk) = ranked
      rk.count()
      val pref = rk.filter($"pos" <= $"n" - Dedup.ceilTauN($"n", t) + lit(1L))
      println(s"[scr] ranked rows=${rk.count()} pref rows=${pref.count()}")
      val cand0 = pref.as("x").join(rk.as("y"), Seq("fp"))
        .filter($"x.doc_id" =!= $"y.doc_id" && $"x.n" <= $"y.n")
      time("cand join raw count")(println(s"[scr] raw cand rows=${cand0.count()}"))
      val cand = cand0.select(
          least($"x.doc_id", $"y.doc_id").as("doc_a"),
          greatest($"x.doc_id", $"y.doc_id").as("doc_b"),
          (least($"x.pos", $"y.pos") +
            least($"x.n" - $"x.pos", $"y.n" - $"y.pos")).as("bound"),
          Dedup.ceilTauN(least($"x.n", $"y.n"), t).as("need"))
        .groupBy($"doc_a", $"doc_b")
        .agg(min($"bound").as("bound"), first($"need").as("need"))
        .filter($"bound" >= $"need")
        .select($"doc_a", $"doc_b")
      val candC = time("cand groupBy+filter ckpt")(cand.localCheckpoint(true))
      println(s"[scr] surviving cand pairs=${candC.count()}")
      time("verify (candidateOverlap)")(
        println(s"[scr] verified=${Dedup.verifyContainmentUnsorted(candC, it).count()}"))
    }
    spark.stop()
  }
}
