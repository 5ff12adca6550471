package graft.core

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** The universal chunk row (SURVEY §1.1) as a typed Dataset element —
  * compile-time field checks for pipeline code that consumes the store.
  * Mirrors the reference's Chunk schema (worker/app/schema/
  * chunk_schema.py:8-24) with the vector inline and provenance columns
  * promoted (SURVEY §1.5: promote indexed meta fields for pushdown).
  */
case class Chunk(
    id: String,
    document_id: String,
    kind: String,
    path: String,
    idx: Int,
    text: String,
    vector: Array[Double],
    content_sig: String,
    bytes: Long)

object Chunk {
  /** Typed view over a chunk-schema DataFrame (ingest output or store
    * read; extra physical columns like doc_bucket are dropped).
    */
  def typed(df: DataFrame): Dataset[Chunk] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select("id", "document_id", "kind", "path", "idx", "text", "vector",
      "content_sig", "bytes").as[Chunk]
  }

  def fromStore(spark: SparkSession, path: String): Dataset[Chunk] =
    typed(graft.sources.ChunkStore.read(spark, path))
}
