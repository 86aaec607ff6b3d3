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
    mediaTableFrom(Tables.documents(spark, dir))

  /** Same over any documents-shaped frame (specs/dev amplification). */
  def mediaTableFrom(docs: DataFrame): DataFrame =
    docs.select($"doc_id", encode($"text", "UTF-8").as("payload"))

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

  // ---------------------------------------------------------------
  // q66 — frame sampling: the video-style access pattern. A media
  // payload is a sequence of fixed-size frames; training pipelines
  // keep every k-th (keyframe extraction, clip subsampling). The
  // kernel is a Catalyst Generator (functions/MediaExpressions) —
  // decode once, slice frames, emit one row per sampled frame, all
  // inside Tungsten rows; frames are FrameChars-codepoint slices of
  // the payload so the oracle can mirror the arithmetic exactly.
  //
  // Scale shape: a pure generator pass (one input row → ~frames/stride
  // output rows), no shuffle, no encoder round-trip; output is
  // fingerprints + sizes, not frame bytes, so the exchange stays
  // narrow even for fat payloads.
  // ---------------------------------------------------------------

  /** Frame geometry sized to the fixture corpus (docs run 44–577
    * chars): 64-char frames at stride 2 give 1–10 frames per doc with
    * real skipping — a production video path swaps in codec frame
    * boundaries and a keyframe stride; the plumbing is identical. */
  val FrameChars = 64
  val FrameStride = 2

  def frameSample(spark: SparkSession, dir: String): DataFrame =
    frameSampleFrom(mediaTable(spark, dir))

  def frameSampleFrom(media: DataFrame, frameChars: Int = FrameChars,
                      stride: Int = FrameStride): DataFrame = {
    graft.functions.MediaExpressions.register(media.sparkSession)
    media
      .select($"doc_id",
        expr(s"graft_frames(payload, $frameChars, $stride)")
          .as(Seq("frame_idx", "frame_md5", "frame_chars")))
      .orderBy($"doc_id", $"frame_idx")
  }

  val frameSampleSql: String =
    s"""SELECT doc_id, i AS frame_idx,
       |  md5(substring(text, CAST(i * $FrameChars + 1 AS INT), $FrameChars)) AS frame_md5,
       |  length(substring(text, CAST(i * $FrameChars + 1 AS INT), $FrameChars)) AS frame_chars
       |FROM documents,
       |  UNNEST(generate_series(0,
       |    CAST(ceil(length(text) / $FrameChars.0) AS BIGINT) - 1,
       |    $FrameStride)) AS u(i)
       |ORDER BY doc_id, frame_idx""".stripMargin

  // ---------------------------------------------------------------
  // q67 — resize planning: fit each media item into a bounding box
  // while preserving aspect ratio — the metadata half of a real
  // resize (the pixel work lives behind the stub decoder). Integer
  // floor arithmetic so both engines agree exactly; the engine path
  // rides the same typed mapPartitions pass as the decode (one
  // decoder+resizer init per partition).
  // ---------------------------------------------------------------

  val ResizeMaxDim = 96

  case class Resized(doc_id: Long, width: Long, height: Long,
                     out_w: Long, out_h: Long)

  def mediaResize(spark: SparkSession, dir: String): DataFrame =
    mediaResizeFrom(mediaTable(spark, dir))

  def mediaResizeFrom(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits.newProductEncoder
    media
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          val (w, h, _) = stubDecode(payload)
          val m = math.max(w, h)
          val (ow, oh) =
            if (m <= ResizeMaxDim) (w, h)
            else (w * ResizeMaxDim / m, h * ResizeMaxDim / m)
          Resized(id, w.toLong, h.toLong, ow.toLong, oh.toLong)
        }
      }
      .toDF()
      .orderBy($"doc_id")
  }

  val mediaResizeSql: String =
    s"""WITH dims AS (
       |  SELECT doc_id,
       |    64 + octet_length(encode(text)) % 64 AS width,
       |    64 + (octet_length(encode(text)) // 64) % 64 AS height
       |  FROM documents)
       |SELECT doc_id, width, height,
       |  CASE WHEN greatest(width, height) <= $ResizeMaxDim THEN width
       |       ELSE width * $ResizeMaxDim // greatest(width, height) END AS out_w,
       |  CASE WHEN greatest(width, height) <= $ResizeMaxDim THEN height
       |       ELSE height * $ResizeMaxDim // greatest(width, height) END AS out_h
       |FROM dims ORDER BY doc_id""".stripMargin
}
