package graft.sources

import java.io.ByteArrayOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ZIP archive export (SURVEY §2.1 S17, §2.3 J3; reference:
  * worker/app/routers/export.py:163-419): for one document, an in-memory
  * zip of
  *   - `chunks.jsonl` — the stable-field JSONL rows,
  *   - `manifest.json` — counts + sha256 (distributed aggregation),
  *   - the original source file, located by joining the chunk's `path`
  *     payload against the dropzone listing (J3 — broadcast: the listing
  *     for one document is a single file).
  *
  * The per-document assembly is driver-side by design (a zip is a small,
  * single-consumer artifact); everything feeding it — the JSONL rows and
  * the manifest aggregates — is computed distributed.
  *
  * Pass a STORE-backed frame (`ChunkStore.read`), not a raw ingest
  * lineage: this runs two jobs over `chunks`, and an unmaterialized
  * ingest plan is re-derived (and its large task binary re-broadcast)
  * for each.
  */
object Archive {

  def buildArchive(
      spark: SparkSession,
      chunks: DataFrame,
      documentId: String,
      dropzone: Option[String]): Array[Byte] = {

    val jsonl = Exports.exportChunks(chunks, documentId)
      .toJSON.collect().mkString("\n")

    val manifestRow = Exports.manifest(chunks, documentId).collect().headOption
    val manifestJson = manifestRow match {
      case Some(m) =>
        s"""{"document_id": "${m.getAs[String]("document_id")}",
           | "chunk_count": ${m.getAs[Long]("chunk_count")},
           | "total_chars": ${m.getAs[Long]("total_chars")},
           | "content_sha256": "${m.getAs[String]("content_sha256")}",
           | "path": "${m.getAs[String]("path")}",
           | "kind": "${m.getAs[String]("kind")}"}""".stripMargin
      case None => """{"error": "document not found"}"""
    }

    // J3: locate the original source file by the chunk payload's path
    val original: Option[(String, Array[Byte])] = for {
      m <- manifestRow
      dz <- dropzone
      row <- {
        val rel = m.getAs[String]("path")
        spark.read.format("binaryFile")
          .option("recursiveFileLookup", "true")
          .load(dz)
          .withColumn("relpath", FileIngest.canonicalRelpath(col("path"), dz))
          .filter(col("relpath") === rel)
          .select(col("relpath"), col("content"))
          .collect().headOption
      }
    } yield (row.getString(0), row.getAs[Array[Byte]](1))

    val bos = new ByteArrayOutputStream()
    val zip = new ZipOutputStream(bos)
    def put(name: String, bytes: Array[Byte]): Unit = {
      zip.putNextEntry(new ZipEntry(name))
      zip.write(bytes)
      zip.closeEntry()
    }
    put("chunks.jsonl", jsonl.getBytes("UTF-8"))
    put("manifest.json", manifestJson.getBytes("UTF-8"))
    original.foreach { case (rel, bytes) => put(s"source/$rel", bytes) }
    zip.close()
    bos.toByteArray
  }
}
