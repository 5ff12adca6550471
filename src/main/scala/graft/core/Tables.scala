package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (see TESTDATA.md).
  *
  * Every [[graft.SparkEntry.queries]] entry receives `(spark, sfDir)` and
  * resolves its inputs through here, so the same query runs unchanged at
  * sf0.001 (smoke), sf0.01 (oracle) and sf0.1 (bench) — and, at production
  * scale, against any directory of identically-named parquet tables.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
