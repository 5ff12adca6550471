package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Export + listing surface (SURVEY §2.1 S15-S17, §2.4 A1, §2.3 J1/J2).
  *
  * The reference exports a document's chunks as stable-field JSONL plus a
  * manifest with counts and a sha256 (reference: worker/app/routers/
  * export.py:66-160, 163-419), and lists documents by merging chunk- and
  * image-collection aggregates keyed by document_id
  * (worker/app/routers/documents.py:19-168).
  */
object Exports {

  /** S16: stable-field projection for JSONL export (export.py:66-80).
    * `df.write.json(dir)` on the result emits the JSONL; `toJSON` serves
    * the API path.
    */
  def exportChunks(chunks: DataFrame, documentId: String): DataFrame =
    chunks
      .filter(col("document_id") === documentId)
      .select("id", "document_id", "kind", "path", "idx", "text")
      .orderBy("idx")

  /** S17 manifest, batch form: counts + deterministic content signature
    * (sha256 over the SORTED `idx:chunk_sig` lines — stable across
    * partitionings and row order) for EVERY document in one grouped pass.
    * The reference serves one manifest per request (export.py:66-160);
    * this is the Spark-native all-documents shape, one shuffle on
    * document_id with map-side partial aggregation.
    */
  def manifestAll(chunks: DataFrame): DataFrame =
    chunks
      .withColumn("chunk_sig", sha2(concat_ws("|", col("idx"), col("text")), 256))
      .groupBy(col("document_id"))
      .agg(
        count(lit(1)).as("chunk_count"),
        sum(length(col("text"))).as("total_chars"),
        sha2(array_join(array_sort(collect_list(
          concat_ws(":", col("idx"), col("chunk_sig")))), "\n"), 256).as("content_sha256"),
        min(col("path")).as("path"),
        min(col("kind")).as("kind"))

  /** S17 manifest for one document (the reference's per-request shape). */
  def manifest(chunks: DataFrame, documentId: String): DataFrame =
    manifestAll(chunks.filter(col("document_id") === documentId))

  /** J2: export lookup with collection fallback — the chunks collection
    * serves the export unless the document has no text chunks, in which
    * case the image collection's rows serve it (reference export.py
    * falls back across collections). One pass: union with a source
    * priority, keep only the best-priority source present.
    */
  def exportDocument(
      chunks: DataFrame, images: DataFrame, documentId: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val u = chunks.withColumn("_src", lit(0))
      .unionByName(images.withColumn("_src", lit(1)))
      .filter(col("document_id") === documentId)
    u.withColumn("_best",
        min(col("_src")).over(Window.partitionBy(col("document_id"))))
      .filter(col("_src") === col("_best"))
      .select("id", "document_id", "kind", "path", "idx", "text")
      .orderBy("idx")
  }

  /** A1 + J1: documents listing — per-document roll-up over the chunk
    * collection full-outer-merged with the image collection
    * (documents.py:147-168: union of kinds/paths, per-collection counts,
    * sort by document_id desc, cap 200).
    */
  def documentsListing(
      chunks: DataFrame, images: DataFrame, limit: Int = 200): DataFrame = {
    def rollup(df: DataFrame, countName: String): DataFrame =
      df.groupBy(col("document_id"))
        .agg(
          sort_array(collect_set(col("kind"))).as(s"kinds_$countName"),
          slice(sort_array(collect_set(col("path"))), 1, 3).as(s"paths_$countName"),
          count(lit(1)).as(countName))

    val c = rollup(chunks, "chunks_count")
    val i = rollup(images, "images_count")
    c.join(i, Seq("document_id"), "full_outer")
      .select(
        col("document_id"),
        array_distinct(concat(
          coalesce(col("kinds_chunks_count"), array()),
          coalesce(col("kinds_images_count"), array()))).as("kinds"),
        slice(array_distinct(concat(
          coalesce(col("paths_chunks_count"), array()),
          coalesce(col("paths_images_count"), array()))), 1, 3).as("paths"),
        coalesce(col("chunks_count"), lit(0L)).as("chunks_count"),
        coalesce(col("images_count"), lit(0L)).as("images_count"))
      .orderBy(col("document_id").desc)
      .limit(limit)
  }
}
