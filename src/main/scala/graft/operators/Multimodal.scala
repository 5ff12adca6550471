package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` + typed
  * metadata, with model-stage operators structured as partition-level
  * batch calls.
  *
  * The reference's media stages are external-model calls — BLIP captioning
  * (worker/app/services/images.py:13-31), faster-whisper STT
  * (parse_audio.py:11-64) — each with a deterministic dev-mode stub. The
  * Spark-side contract that matters at 100 TB is reproduced here for real:
  *   - media rows are (id, kind, binary content, metadata struct);
  *   - decode/caption/transcribe run via `mapPartitions`, accumulating
  *     fixed-size batches so a model server/GPU sees batched inputs (the
  *     reference batches 64 embeds per call, config.py:45);
  *   - outputs are columns, so downstream chunk/embed/search is unchanged.
  * The decode itself is STUBBED deterministically (sha256-derived), since
  * media libraries are not in this environment — swap `decodeBatch` for a
  * JNI/ONNX/pdfbox call at deploy time; the plumbing does not change.
  */
object Multimodal {

  case class MediaRow(id: String, kind: String, path: String, content: Array[Byte])
  case class DecodedRow(
      id: String, kind: String, path: String,
      width: Int, height: Int, durationMs: Long, caption: String)

  val DefaultBatchSize = 64

  /** Deterministic stand-in for a real decoder/captioner: derives fake
    * dimensions/duration/caption from the content hash. Replace with the
    * real model call; signature (batch in, batch out) is the contract.
    */
  private[operators] def decodeBatch(batch: Seq[MediaRow]): Seq[DecodedRow] =
    batch.map { m =>
      val h = java.security.MessageDigest.getInstance("SHA-256").digest(m.content)
      def b(i: Int): Int = h(i) & 0xff
      DecodedRow(
        m.id, m.kind, m.path,
        width = 64 + b(0) * 8,
        height = 64 + b(1) * 8,
        durationMs = if (m.kind == "audio" || m.kind == "video") (b(2).toLong + 1) * 1000 else 0L,
        caption = s"${m.kind} stub: ${m.path} sig=${h.take(4).map(x => f"${x & 0xff}%02x").mkString}")
    }

  /** Partition-level batched decode: accumulates `batchSize` rows before
    * each (stubbed) model call — the exact shape a GPU-backed service
    * needs. No shuffle; media bytes never leave their partition.
    */
  def decode(media: Dataset[MediaRow], batchSize: Int = DefaultBatchSize): Dataset[DecodedRow] = {
    implicit val enc = Encoders.product[DecodedRow]
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap(group => decodeBatch(group.toSeq))
    }
  }

  /** Read a directory of media files as MediaRows (binaryFile source). */
  def readMedia(spark: org.apache.spark.sql.SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .load(dir)
      .select(
        sha2(col("content"), 256).as("id"),
        FileIngestKind.kindCol(col("path")).as("kind"),
        col("path"),
        col("content"))
      .as[MediaRow]
  }

  /** "Resize" metadata transform (declarative; the pixel work happens in
    * the decode stage at deploy).
    */
  def resizeTo(decoded: DataFrame, maxSide: Int): DataFrame =
    decoded
      .withColumn("scale",
        least(lit(1.0), lit(maxSide) / greatest(col("width"), col("height")).cast("double")))
      .withColumn("out_width", (col("width") * col("scale")).cast("int"))
      .withColumn("out_height", (col("height") * col("scale")).cast("int"))
      .drop("scale")

  /** Frame sampling plan for video rows: one row per sampled frame at
    * `everyMs` intervals — the explode is declarative; frame extraction
    * itself belongs to the decode stage.
    */
  def sampleFrames(decoded: DataFrame, everyMs: Long): DataFrame =
    decoded
      .filter(col("durationMs") > 0)
      .select(col("id"), col("path"),
        explode(sequence(lit(0L), col("durationMs") - 1, lit(everyMs))).as("frame_ms"))
}

private[operators] object FileIngestKind {
  import org.apache.spark.sql.Column
  def kindCol(path: Column): Column = {
    val ext = lower(regexp_extract(element_at(split(path, "/"), -1), "\\.([^.]+)$", 1))
    when(ext.isin("png", "jpg", "jpeg", "gif", "webp", "bmp"), "image")
      .when(ext.isin("mp3", "wav", "m4a", "flac", "ogg"), "audio")
      .when(ext.isin("mp4", "mov", "avi", "mkv", "webm"), "video")
      .otherwise("binary")
  }
}
