package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Times every write-time store build for a sfDir — Bench's index-build
  * block as a standalone driver, for iterating on build-path cost without
  * a full bench run. Pass `fresh` to delete the artifact roots first.
  *
  * Usage: runMain graft.tools.StoreBuilds [sfDir] [fresh]
  */
object StoreBuilds {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val fresh = args.contains("fresh")
    if (fresh) {
      val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
      tmp.listFiles().filter(f => f.getName.startsWith("graft-") &&
          !f.getName.startsWith("graft-scale-"))
        .foreach(org.apache.commons.io.FileUtils.deleteDirectory)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (cpus.toInt * 8).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def build(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      try { f; println(f"[build] $name%-18s ${(System.nanoTime() - t0) / 1e9}%.2f s") }
      catch { case e: Throwable =>
        println(s"[build] $name FAILED: ${e.getMessage.linesIterator.nextOption().getOrElse("")}")
      }
    }
    build("vector_ivf") {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      graft.sources.VectorStore.ensure(
        spark, emb.filter(col("vec_id") =!= 0), "embedding", sfDir)
    }
    build("vector_pq") {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      graft.sources.VectorStore.ensurePq(
        spark, emb.filter(col("vec_id") =!= 0), "embedding", sfDir)
    }
    build("quality_model") {
      graft.operators.QualityModel.ensure(
        spark, spark.read.parquet(s"$sfDir/documents.parquet"), sfDir)
    }
    build("text_index") {
      val docsW = graft.core.Tables.fanOut(
        graft.core.Tables(spark, sfDir, "documents"))
      graft.sources.TextIndex.ensure(spark, docsW, "doc_id", "text", sfDir)
    }
    build("band_store") {
      val docsW = graft.core.Tables.fanOut(
        graft.core.Tables(spark, sfDir, "documents"))
      graft.sources.BandStore.ensure(spark, docsW, "doc_id", "text", sfDir)
    }
    build("cluster_store") {
      val docsW = graft.core.Tables.fanOut(
        graft.core.Tables(spark, sfDir, "documents"))
      graft.sources.ClusterStore.ensure(spark, docsW, "doc_id", "text",
        sfDir, graft.sources.BandStore.ensure(spark, docsW, "doc_id",
          "text", sfDir))
    }
    build("frame_store") {
      graft.queries.PipelineCatalog.ensureFrameStore(spark, sfDir)
    }
    build("dz_ledger") {
      graft.queries.IngestCatalog.ensureDzLedger(spark, sfDir)
    }
    build("inc_text_index") {
      graft.queries.PipelineCatalog.q77EnsureIncremental(spark, sfDir)
    }
    build("inc_vector_ivf") {
      graft.queries.PipelineCatalog.q78EnsureIncremental(spark, sfDir)
    }
    build("inc_vector_pq") {
      graft.queries.PipelineCatalog.q79EnsureIncremental(spark, sfDir)
    }
    build("stream_stores") {
      graft.queries.PipelineCatalog.q87EnsureStreaming(spark, sfDir)
    }
    build("bpe_merges") {
      graft.queries.PipelineCatalog.ensureBpe(spark, sfDir)
    }
    build("bpe_merges_v2") {
      graft.queries.PipelineCatalog.ensureBpeV2(spark, sfDir)
    }
    build("loader_manifest") {
      graft.queries.PipelineCatalog.ensureManifest(spark, sfDir)
    }
    build("inc_manifest") {
      graft.queries.PipelineCatalog.q149EnsureIncremental(spark, sfDir)
    }
    build("stream_manifest") {
      graft.queries.PipelineCatalog.q150EnsureStreaming(spark, sfDir)
    }
    build("inc_clusters") {
      graft.queries.PipelineCatalog.q154EnsureIncremental(spark, sfDir)
    }
    build("stream_clusters") {
      graft.queries.PipelineCatalog.q155EnsureStreaming(spark, sfDir)
    }
    spark.stop()
  }
}
