package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.syntax._

/** Multimodal-column plumbing: treat media payloads as opaque `binary`
  * columns with typed metadata, processed in batched per-partition
  * passes. The container has no image/audio codecs, so the decoder is
  * a clearly-marked deterministic stub — the Spark-side contract
  * (schema, binary handling, partition-batched execution, metadata
  * extraction) is real and tested.
  *
  * Scale notes: binary payloads ride through Tungsten as byte arrays —
  * no serialization cliff; `mapPartitions` amortizes decoder init
  * (model load, codec context) once per partition, the same shape a
  * Pandas-UDF/`mapInPandas` pipeline uses. Partition sizing must come
  * from `spark.sql.files.maxPartitionBytes`, not row counts, because
  * rows are fat.
  */
object Multimodal {

  /** Typed decoded-media record (what a real image decoder would
    * emit: dimensions + a small feature vector). */
  case class MediaMeta(
      doc_id: Long, n_bytes: Int, head_byte: Int,
      width: Int, height: Int, feature: Array[Float])

  /** Deterministic STUB decoder — stands in for e.g. JPEG decode +
    * resize + embed. Derives "dimensions" and a "feature" from the
    * payload bytes so tests are reproducible without codecs. */
  def stubDecode(payload: Array[Byte]): (Int, Int, Array[Float]) = {
    val n = payload.length
    val w = 64 + (n % 64)
    val h = 64 + ((n / 64) % 64)
    val feat = Array.tabulate(8)(i =>
      (if (n == 0) 0f else payload(i % n).toFloat / 127f))
    (w, h, feat)
  }

  /** Media table synthesized from `documents`: the text payload as an
    * opaque binary column (UTF-8), exactly how an image/audio bytes
    * column would arrive from parquet. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select($"doc_id", encode($"text", "UTF-8").as("payload"))

  /** Batched decode pass: one decoder instance per partition, typed
    * output. This is the real plumbing under a `mapInPandas`-style
    * pipeline — swap `stubDecode` for a codec and nothing else moves. */
  def decodeMedia(spark: SparkSession, dir: String): Dataset[MediaMeta] = {
    import spark.implicits.{newProductEncoder, newSequenceEncoder}
    mediaTable(spark, dir)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition init would go here (codec ctx / model load)
        rows.map { case (id, payload) =>
          val (w, h, feat) = stubDecode(payload)
          // head_byte = first Unicode codepoint of the decoded text —
          // matches mediaMeta's ascii(substring(text,1,1)) for
          // non-ASCII payloads too (a raw first-byte read would
          // diverge on multi-byte characters)
          val text = new String(payload, java.nio.charset.StandardCharsets.UTF_8)
          MediaMeta(id, payload.length,
            if (text.isEmpty) 0 else text.codePointAt(0), w, h, feat)
        }
      }
  }

  /** q52 — the oracle-checkable slice of the decode path: opaque
    * binary payload → typed metadata (byte length, first byte, stub
    * dimensions). The dimension arithmetic mirrors `stubDecode` so the
    * DataFrame path and the typed `mapPartitions` path are
    * cross-checked by both the oracle and the ScalaTest spec. */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select($"doc_id",
        octet_length($"payload").cast(LongType).as("n_bytes"),
        ascii(substring(decode($"payload", "UTF-8"), 1, 1)).as("head_byte"))
      .withColumn("width", lit(64L) + $"n_bytes" % 64)
      .withColumn("height", lit(64L) + expr("n_bytes div 64") % 64)
      .orderBy($"doc_id")

  val mediaMetaSql: String =
    """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
      |  ascii(substring(text, 1, 1)) AS head_byte,
      |  64 + octet_length(encode(text)) % 64 AS width,
      |  64 + (octet_length(encode(text)) // 64) % 64 AS height
      |FROM documents ORDER BY doc_id""".stripMargin
}
