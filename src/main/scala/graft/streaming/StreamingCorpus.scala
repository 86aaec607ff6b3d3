package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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

  // ---------------------------------------------------------------
  // q71 — streaming NEAR-dup dedup (VERDICT r6 item 1): ingest-time
  // MinHash-band LSH, the streaming twin of the batch q47→q62→q70
  // chain. Exact-digest state (q68) only catches byte-identical
  // copies; a real ingest pipeline also wants near-dups caught as
  // documents ARRIVE — each micro-batch signs its documents, probes
  // the band-bucket state accumulated by every earlier batch, and
  // records the candidate pairs it discovers, so a document arriving
  // Tuesday pairs with its Monday near-original without waiting for
  // the nightly batch.
  //
  // State lives in append-only parquet LOGS under one state root —
  // bands (doc_id, band_id, band_val), fps (doc_id, fp), cand
  // (band-tagged candidate pairs), docs (the corpus itself) — NOT in
  // flatMapGroupsWithState executor state, deliberately:
  //   (a) verification needs each candidate's full shingle-fp set; as
  //       executor state that set would be duplicated into all 4 band
  //       buckets per doc, while the store holds it once;
  //   (b) the stores ARE the product — the same bands/fps tables the
  //       batch path computes, queryable mid-stream for audits;
  //   (c) every per-batch transformation is the BATCH operator
  //       (lshBands, verifyCandidates, dedupClustersFrom,
  //       dedupKeepCorpusFrom) applied to micro-batch frames, so
  //       streaming-vs-batch parity is structural, not reimplemented.
  // At 100 TB the append-only logs shard by their join keys (bands by
  // hash(band_val), fps by doc_id) under the warehouse layout; a
  // micro-batch's probe join touches only its buckets' partitions and
  // nothing is ever rewritten — the same touched-partition discipline
  // as the Silver sink.
  //
  // Mega-bucket guard, cross-batch exact: occupancy only GROWS, so
  //   - a batch skips pair-generation for any bucket already over
  //     [[graft.operators.Dedup.MaxBucketDocs]] (it is final-oversized
  //     for certain — bounds per-bucket work at ~cap²/2 pairs ever);
  //   - pairs recorded earlier, while the bucket was still small, are
  //     band-tagged in the cand log and dropped at resolution time iff
  //     the bucket's FINAL occupancy exceeds the cap (unless the pair
  //     also shares a healthy bucket) — byte-for-byte the batch q47
  //     guard semantics (StreamingCorpusSpec pins the crossing case).
  // ---------------------------------------------------------------

  /** Read a state log if it exists, else an empty frame of `schema` —
    * first-batch reads and a pair log that never saw a candidate. */
  private def readLog(spark: SparkSession, path: String,
                      schema: StructType): DataFrame =
    if (new java.io.File(path).exists())
      spark.read.schema(schema).parquet(path)
    else spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema)

  private val bandsSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("band_id", IntegerType),
    StructField("band_val", StringType)))
  private val candSchema = StructType(Seq(
    StructField("band_id", IntegerType), StructField("band_val", StringType),
    StructField("doc_a", LongType), StructField("doc_b", LongType)))

  /** One micro-batch of the streaming LSH: sign the arriving docs,
    * probe the band log as of the PREVIOUS batch, record new candidate
    * pairs (at least one side arriving now), then append this batch's
    * docs/fps/bands to the logs. Append-only + read-side dedup keeps a
    * replayed batch (foreachBatch is at-least-once) a no-op in every
    * downstream result. */
  private def processNearDupBatch(batch: DataFrame, root: String): Unit = {
    import graft.operators.Dedup
    val spark = batch.sparkSession
    val docs = batch.select($"doc_id", $"text")
    // one signature pass feeds the fps log AND the band computation
    val fps = Dedup.shingleFpsFrom(docs).localCheckpoint(false)
    val newBands = Dedup.lshBands(fps).localCheckpoint(false)
    val all = readLog(spark, s"$root/bands", bandsSchema)
      .union(newBands).distinct()
    // bucket occupancy as of THIS batch: already-oversized buckets are
    // final-oversized (occupancy is monotone), so skip their pairs now
    val oversized = all.groupBy($"band_id", $"band_val")
      .agg(count(lit(1)).as("bn")).filter($"bn" > Dedup.MaxBucketDocs)
      .select($"band_id", $"band_val")
    val prunedNew = newBands.join(broadcast(oversized),
      Seq("band_id", "band_val"), "left_anti")
    val prunedAll = all.join(broadcast(oversized),
      Seq("band_id", "band_val"), "left_anti")
    // new × all (old×old pairs were recorded when their later doc
    // arrived); canonical (least, greatest) + distinct collapses the
    // doubled new×new matches
    val newPairs = prunedNew.as("x")
      .join(prunedAll.as("y"), Seq("band_id", "band_val"))
      .filter($"x.doc_id" =!= $"y.doc_id")
      .select($"band_id", $"band_val",
        least($"x.doc_id", $"y.doc_id").as("doc_a"),
        greatest($"x.doc_id", $"y.doc_id").as("doc_b"))
      .distinct()
    // record candidates BEFORE appending the band log: the pair scan
    // must see the pre-batch band snapshot it was computed against
    newPairs.write.mode("append").parquet(s"$root/cand")
    newBands.write.mode("append").parquet(s"$root/bands")
    fps.write.mode("append").parquet(s"$root/fps")
    docs.write.mode("append").parquet(s"$root/docs")
  }

  /** Resolution — the drain-time tail of the streaming LSH: apply the
    * final-occupancy guard to the candidate log, verify survivors with
    * true Jaccard, cluster, and materialize the kept corpus. Exactly
    * the batch q47-verify → q62 → q70 operators over the streamed
    * state, which is why q71's oracle IS the batch kept-corpus SQL.
    * In a live deployment this runs per trigger (or on a schedule)
    * over the same logs; under AvailableNow it runs once at drain. */
  private def resolveKeptCorpus(spark: SparkSession, root: String): DataFrame = {
    import graft.operators.Dedup
    val bands = readLog(spark, s"$root/bands", bandsSchema).distinct()
    val oversized = bands.groupBy($"band_id", $"band_val")
      .agg(count(lit(1)).as("bn")).filter($"bn" > Dedup.MaxBucketDocs)
      .select($"band_id", $"band_val")
    val cand = readLog(spark, s"$root/cand", candSchema).distinct()
      .join(broadcast(oversized), Seq("band_id", "band_val"), "left_anti")
      .select($"doc_a", $"doc_b").distinct()
    val fps = spark.read.parquet(s"$root/fps").distinct()
    val verified = Dedup.verifyCandidates(cand, fps)
    val clusters = Dedup.dedupClustersFrom(
      verified.select($"doc_a", $"doc_b"))
    val docs = spark.read.parquet(s"$root/docs").dropDuplicates("doc_id")
    Dedup.dedupKeepCorpusFrom(docs, clusters)
  }

  /** Drain `docsPath` through the streaming LSH into a fresh state
    * root and return the kept corpus (doc_id, n_chars) — the q70
    * shape. */
  def nearDupStream(spark: SparkSession, docsPath: String,
                    maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val root = StreamingClean.trackedTempDir("graft-lsh-state-")
    val checkpoint = StreamingClean.trackedTempDir("graft-nd-ckpt-")
    val q = readDocumentsStream(spark, docsPath, maxFilesPerTrigger)
      .writeStream
      .queryName("graft_streaming_near_dups_" + sinkSeq.incrementAndGet())
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processNearDupBatch(batch, root)
      }
      .start()
    try q.awaitTermination()
    finally StreamingClean.rmTree(checkpoint)
    resolveKeptCorpus(spark, root)
  }

  /** q71 — streaming-vs-batch NEAR-dup parity: the fixture corpus is
    * staged as four doc_id-ranged files and drained one file per
    * micro-batch, so candidate discovery genuinely crosses batch
    * boundaries (a doc in batch 3 probes state from batch 1). Oracle =
    * the batch q70 SQL: the streamed keeper set must equal what the
    * one-shot q47→q62→q70 chain computes. */
  def nearDupViaStreaming(spark: SparkSession, sfDir: String): DataFrame = {
    val staged = StreamingClean.trackedTempDir("graft-nd-in-") + "/docs"
    spark.read.parquet(s"$sfDir/documents.parquet")
      .repartitionByRange(4, $"doc_id")
      .write.mode("overwrite").parquet(staged)
    nearDupStream(spark, staged, maxFilesPerTrigger = Some(1))
  }

  // ---------------------------------------------------------------
  // q87 — streaming heavy hitters: the q86 count-min sketch maintained
  // as STREAMING STATE. The CMS exists precisely for this shape —
  // counters merge by addition, so per-(row, bucket) state accumulates
  // micro-batch by micro-batch into exactly the table the batch
  // aggregate builds, and its size is depth × width (4 × 1024 rows)
  // NO MATTER the stream length or vocabulary: the bounded-memory
  // frequency summary of an unbounded token stream. The exact
  // per-token counter state alongside it is vocabulary-bounded (the
  // q68 state-growth regime) and exists to cut the top-K and attest
  // the sketch; a 100 TB deployment that cannot afford vocab-sized
  // state drops that side and keeps the CMS + a fixed-size top-K
  // candidate heap (space-saving), trading the exactness this query's
  // oracle proves for O(K) memory.
  //
  // Both counters are order-independent sums, so the drained result is
  // byte-identical to the batch q86 — the oracle IS the batch SQL
  // (q68/q71's parity discipline applied to sketches).
  // ---------------------------------------------------------------

  case class KeyCount(key: String, cnt: Long)

  /** Drain a stream of string keys through per-key additive count
    * state and return the final (key, cnt) table. The changelog folds
    * with max — counts only grow — so replayed batches cannot inflate
    * the result. */
  private def countStream(spark: SparkSession, keys: Dataset[String],
                          prefix: String): DataFrame = {
    import spark.implicits.newProductEncoder
    val updater = (key: String, rows: Iterator[String],
                   state: GroupState[KeyCount]) => {
      val next = KeyCount(key,
        state.getOption.map(_.cnt).getOrElse(0L) + rows.size)
      state.update(next)
      Iterator(next)
    }
    val changelog = keys.groupByKey(identity)(
        spark.implicits.newStringEncoder)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout)(updater)
    val name = prefix + sinkSeq.incrementAndGet()
    val checkpoint = StreamingClean.trackedTempDir("graft-hh-ckpt-")
    val q = changelog.writeStream
      .outputMode(OutputMode.Update)
      .format("memory").queryName(name)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally StreamingClean.rmTree(checkpoint)
    // eager-checkpoint the fold and drop the sink table (the
    // dedupStream hygiene: per-call names would otherwise accumulate
    // changelogs in the catalog for the JVM's lifetime)
    val result = spark.table(name)
      .groupBy($"key").agg(max($"cnt").as("cnt"))
      .localCheckpoint(true)
    spark.catalog.dropTempView(name)
    result
  }

  /** Drain `docsPath` through both stateful counters and compose the
    * q86 output: exact top-K from the token state, estimates from the
    * CMS state, via the shared [[graft.operators.Corpus
    * .composeHeavyHitters]] tail. */
  def heavyHitterStream(spark: SparkSession, docsPath: String,
                        maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import graft.operators.{Corpus, TextOps}
    import spark.implicits.newStringEncoder
    val toks = readDocumentsStream(spark, docsPath, maxFilesPerTrigger)
      .select(explode(TextOps.tokens($"text")).as("token")).as[String]
    val tokenCounts = countStream(spark, toks, "graft_hh_tok_")
      .select($"key".as("token"), $"cnt")
    // each token occurrence feeds one cell per sketch row; the cell id
    // string "r:b" is the state key. Derived from the SAME token
    // stream definition as the exact side (each started query still
    // reads its own source instance) so the two sides cannot drift.
    val cells = toks
      .select(Corpus.cmsRows.as("r"), $"token")
      .select(concat($"r".cast(StringType), lit(":"),
        Corpus.cmsBucket($"r", $"token").cast(StringType)).as("cell"))
      .as[String]
    val counters = countStream(spark, cells, "graft_hh_cms_")
      .select(
        split($"key", ":").getItem(0).cast(IntegerType).as("r"),
        split($"key", ":").getItem(1).cast(LongType).as("b"),
        $"cnt".as("c"))
    Corpus.composeHeavyHitters(tokenCounts, counters)
  }

  /** q87 — streaming-vs-batch heavy-hitter parity: the fixture corpus
    * drained one doc_id-ranged file per micro-batch through both
    * counter states. Oracle = the batch q86 SQL. */
  def heavyHittersViaStreaming(spark: SparkSession, sfDir: String): DataFrame = {
    val staged = StreamingClean.trackedTempDir("graft-hh-in-") + "/docs"
    spark.read.parquet(s"$sfDir/documents.parquet")
      .repartitionByRange(4, $"doc_id")
      .write.mode("overwrite").parquet(staged)
    heavyHitterStream(spark, staged, maxFilesPerTrigger = Some(1))
  }
}
