package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

import graft.syntax._

/** The corpus-dedup operator family under Structured Streaming: exact
  * deduplication of an ARRIVING document stream — the ingest-time shape
  * of a training-data pipeline, where dedup state must persist across
  * micro-batches instead of being a one-shot groupBy.
  *
  * State per content fingerprint = (smallest doc_id seen, copies seen),
  * held in `flatMapGroupsWithState` — the `KeyValueGroupedDataset`
  * custom-state path (SURVEY §2.11). Both state fields are
  * order-independent reductions (min / count), so the drained result is
  * byte-identical to the batch q44 groupBy NO MATTER how documents are
  * split into micro-batches or in what order they arrive — which is
  * what makes the streaming path oracle-checkable against the batch
  * SQL, the same parity discipline q34 applies to the weather kernel.
  *
  * Scale notes: state is one (16-byte digest, two longs) entry per
  * DISTINCT document — bounded by corpus content, not stream length;
  * at 10⁹ distinct docs the state store shards across executors by the
  * digest (the same key the batch shuffle uses). In a live (unbounded)
  * deployment the emitted changelog feeds the downstream sink in
  * Update mode; `Trigger.AvailableNow` here drains a bounded backlog
  * and stops, exactly like the weather clean (StreamingClean).
  */
object StreamingCorpus {

  /** Monotonic suffix for per-call memory-sink table names. */
  private val sinkSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** documents.parquet raw schema for the streaming reader. */
  val documentsRawSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Streaming reader over a documents parquet file or directory
    * (single files staged via symlink, as the events reader does). */
  def readDocumentsStream(spark: SparkSession, docsPath: String,
                          maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val src = java.nio.file.Paths.get(docsPath)
    val inputDir =
      if (java.nio.file.Files.isDirectory(src)) docsPath
      else {
        val d = java.nio.file.Paths.get(
          StreamingClean.trackedTempDir("graft-docs-in-"))
        java.nio.file.Files.createSymbolicLink(d.resolve(src.getFileName), src)
        d.toString
      }
    val reader = spark.readStream.schema(documentsRawSchema)
    maxFilesPerTrigger.fold(reader)(n =>
        reader.option("maxFilesPerTrigger", n))
      .parquet(inputDir)
  }

  case class FpDoc(fp: String, doc_id: Long)
  case class FpState(fp: String, keeper_doc_id: Long, n_copies: Long)

  /** Drain `docsPath` through the stateful dedup and return the final
    * (fp, keeper_doc_id, n_copies) table — the q44 shape. The memory
    * sink holds the Update-mode changelog (one row per fingerprint per
    * batch whose state changed); the final reduction keeps each
    * fingerprint's last state via order-independent min/max (keeper
    * only ever decreases, copies only ever grow). */
  def dedupStream(spark: SparkSession, docsPath: String,
                  maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import spark.implicits.{newProductEncoder, newStringEncoder}
    val fps = readDocumentsStream(spark, docsPath, maxFilesPerTrigger)
      .select(
        md5(regexp_replace(lower(trim($"text")), "\\s+", " ")
          .cast(BinaryType)).as("fp"),
        $"doc_id")
      .as[FpDoc]
    val updater = (fp: String, rows: Iterator[FpDoc],
                   state: GroupState[FpState]) => {
      val batch = rows.toSeq
      val prev = state.getOption
      val next = FpState(fp,
        (prev.map(_.keeper_doc_id) ++ batch.map(_.doc_id)).min,
        prev.map(_.n_copies).getOrElse(0L) + batch.size)
      state.update(next)
      // the updater only runs for keys with rows in the batch, so
      // n_copies strictly grew — every invocation IS a state change
      // and emits one changelog row
      Iterator(next)
    }
    val changelog = fps.groupByKey(_.fp)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout)(updater)
    // unique per CALL, not per path: hex avoids abs(Int.MinValue) < 0
    // producing a junk identifier, and the monotonic suffix keeps two
    // concurrent dedupStream calls (same or colliding paths) from
    // clobbering each other's memory-sink table
    val name = "graft_corpus_dedup_" +
      Integer.toHexString(docsPath.hashCode) + "_" +
      sinkSeq.incrementAndGet()
    val checkpoint = StreamingClean.trackedTempDir("graft-cd-ckpt-")
    val q = changelog.writeStream
      .outputMode(OutputMode.Update)
      .format("memory").queryName(name)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally StreamingClean.rmTree(checkpoint)
    // Materialize the folded result EAGERLY (small: one row per
    // distinct doc) and drop the memory-sink table before returning —
    // otherwise every call would leak its full changelog into the
    // session catalog for the JVM's lifetime (the per-call unique
    // query name makes the tables accumulate, not replace). The
    // checkpoint pins only the folded rows; its blocks free with the
    // returned plan.
    val result = spark.table(name)
      .groupBy($"fp")
      .agg(min($"keeper_doc_id").as("keeper_doc_id"),
           max($"n_copies").as("n_copies"))
      .orderBy($"keeper_doc_id")
      .localCheckpoint(true)
    spark.catalog.dropTempView(name)
    result
  }

  /** q68 — streaming-vs-batch dedup parity: the full stateful pipeline
    * over the fixture documents. Its oracle is the BATCH q44 SQL —
    * passing means ingest-time dedup state converges to exactly what
    * the one-shot groupBy computes. */
  def dedupViaStreaming(spark: SparkSession, sfDir: String): DataFrame =
    dedupStream(spark, s"$sfDir/documents.parquet")
}
