package graft.sources

import java.net.URI
import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{col, lit, row_number}

/** Idempotent keyed upsert over a file-backed table — the Spark
  * re-expression of the reference's `INSERT ... ON CONFLICT (keys) DO
  * UPDATE` sinks (fastapi/app/etl/nasa.py:126-149,
  * transform/silver_clean.py:47-54,125-132). Last write wins per key,
  * arbitrated by explicit version columns (the reference's
  * `ingested_at` + insertion order; SURVEY §7.4-1 requires the total
  * order).
  *
  * Semantics: `upsert(run) ∘ upsert(run) == upsert(run)` — re-running
  * any window is a no-op (README.md:36), and late data for an
  * already-written key overwrites iff its version is newer.
  *
  * Scale notes: the merge is one shuffle on the key columns (both
  * sides hash-partitioned); on a real deployment the table would be a
  * transactional format (Delta/Iceberg MERGE) — here the swap is a
  * tmp-write + directory rename, which is the strongest atomicity a
  * bare filesystem offers. Rewriting the full table per merge is the
  * textbook copy-on-write trade-off; partitioning the store by
  * key-prefix (site/date) and merging only touched partitions is the
  * incremental refinement.
  */
object UpsertWriter {

  /** Pure merge: one row per key — the newest version among existing
    * and incoming rows (incoming wins version ties via the `is_new`
    * tiebreak, matching ON CONFLICT DO UPDATE). */
  def merge(existing: DataFrame, incoming: DataFrame,
            keys: Seq[String], versionCols: Seq[String]): DataFrame = {
    val tagged = existing.withColumn("is_new", lit(0))
      .unionByName(incoming.withColumn("is_new", lit(1)))
    val order = versionCols.map(col(_).desc) :+ col("is_new").desc
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    tagged.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn", "is_new")
  }

  /** Merge `incoming` into the parquet table at `path` (created if
    * absent), swapping directories after the merged result is fully
    * materialized. Callers needing the new row count read it from the
    * published table (a parquet `count()` is footer-metadata-only) —
    * doing it here unconditionally taxed every streaming micro-batch
    * with an extra job (VERDICT r1). */
  def upsert(spark: SparkSession, path: String, incoming: DataFrame,
             keys: Seq[String], versionCols: Seq[String],
             checks: Seq[graft.schema.Schemas.Check] = Nil,
             table: String = "upsert-target"): Unit = {
    val fs = FileSystem.get(new URI(path), spark.sparkContext.hadoopConfiguration)
    val target = new Path(path)
    // Constraint gate at the write boundary (the engine-side stand-in
    // for the reference DDL's CHECKs): only the INCOMING slice is
    // validated — existing rows passed the gate when they were written.
    // The frame is persisted first so the validation aggregate and the
    // merge write share one computation of the incoming lineage
    // (matters per-micro-batch in the streaming path); enforce runs
    // INSIDE the try so a rejected batch still unpersists its cache.
    val guarded = if (checks.isEmpty) incoming else incoming.cache()
    try {
      if (checks.nonEmpty)
        graft.schema.Validator.enforce(guarded, checks, table)
      val merged =
        if (fs.exists(target))
          merge(spark.read.parquet(path), guarded, keys, versionCols)
        else guarded
      val tmp = new Path(path + ".tmp-" + UUID.randomUUID().toString.take(8))
      // materializes the merge BEFORE the old version is touched
      merged.write.mode("overwrite").parquet(tmp.toString)
      val bak = new Path(path + ".bak")
      if (fs.exists(bak)) fs.delete(bak, true)
      // Hadoop rename signals failure by returning false, not throwing —
      // ignoring it here could delete the only surviving copy. Roll the
      // backup back if the forward rename fails.
      if (fs.exists(target) && !fs.rename(target, bak))
        throw new java.io.IOException(s"upsert: cannot move $target aside")
      if (!fs.rename(tmp, target)) {
        if (fs.exists(bak)) fs.rename(bak, target) // restore old version
        throw new java.io.IOException(s"upsert: cannot publish $tmp to $target")
      }
      fs.delete(bak, true)
      // the session's FileStatusCache still lists the replaced files —
      // without this, the next read of the store in the same session
      // throws FileNotFoundException on the deleted parts
      spark.catalog.refreshByPath(path)
    } finally if (checks.nonEmpty) guarded.unpersist()
  }

  /** Partition-pruned upsert: the store is laid out
    * `partitionBy(partitionCol)` and only partitions present in
    * `incoming` are read, merged, and rewritten (dynamic partition
    * overwrite). This is the shape that survives 100 TB — a day's
    * ingest merges a day's partitions, not the table. */
  def upsertPartitioned(spark: SparkSession, path: String,
                        incoming: DataFrame, keys: Seq[String],
                        versionCols: Seq[String],
                        partitionCol: String,
                        checks: Seq[graft.schema.Schemas.Check] = Nil,
                        table: String = "upsert-target"): Unit = {
    val fs = FileSystem.get(new URI(path), spark.sparkContext.hadoopConfiguration)
    val target = new Path(path)
    // the incoming lineage can feed the CHECK aggregate, the touched-
    // partition listing, AND the merge — persist it once. A fresh
    // write with no checks has exactly one consumer (the write), so
    // caching there would be a pure extra materialization.
    val multiConsumer = checks.nonEmpty || fs.exists(target)
    val guarded = if (multiConsumer) incoming.cache() else incoming
    try {
      if (checks.nonEmpty)
        graft.schema.Validator.enforce(guarded, checks, table)
      if (!fs.exists(target)) {
        guarded.write.partitionBy(partitionCol).parquet(path)
      } else {
        val touched = guarded.select(partitionCol).distinct()
          .collect().map(_.get(0)).toSeq
        // partition filter prunes the scan to touched partitions only
        val existingSlice = spark.read.parquet(path)
          .filter(col(partitionCol).isin(touched: _*))
        val merged = merge(existingSlice, guarded, keys, versionCols)
        // stage: the merge reads the partitions we are about to rewrite
        val tmp = new Path(path + ".stage-" + UUID.randomUUID().toString.take(8))
        merged.write.parquet(tmp.toString)
        spark.read.parquet(tmp.toString)
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy(partitionCol)
          .parquet(path)
        fs.delete(tmp, true)
      }
      // invalidate the session's cached file listing for the store
      // (dynamic overwrite replaced files in the touched partitions)
      spark.catalog.refreshByPath(path)
    } finally if (multiConsumer) guarded.unpersist()
  }
}
