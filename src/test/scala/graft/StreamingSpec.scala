package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ChunkStore
import graft.streaming.Dropzone

/** Streaming dropzone: files land → micro-batch → idempotent store upsert
  * (SURVEY §2.9 ST1-ST4).
  */
class StreamingSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("files are ingested as they arrive; re-dropped files replace themselves") {
    val dropzone: Path = Files.createTempDirectory("graft-stream-dz")
    val store = Files.createTempDirectory("graft-stream-store").resolve("chunks").toString
    val checkpoint = Files.createTempDirectory("graft-stream-ckpt").toString

    Files.writeString(dropzone.resolve("a.txt"), "first document body")

    val query = Dropzone.start(spark, dropzone.toString, store, checkpoint,
      chunkSize = 200, chunkOverlap = 40)
    try {
      query.processAllAvailable()
      val after1 = ChunkStore.read(spark, store)
      assert(after1.select("path").distinct().collect().map(_.getString(0)).toSet
        == Set("a.txt"))

      // second file arrives
      Files.writeString(dropzone.resolve("b.txt"), "second document body")
      query.processAllAvailable()
      val after2 = ChunkStore.read(spark, store)
      assert(after2.select("path").distinct().collect().map(_.getString(0)).toSet
        == Set("a.txt", "b.txt"))

      // a changed file re-dropped under a NEW name that maps to the same
      // document identity is the batch path's job; the stream's job is that
      // replays do not duplicate: counts are stable across an empty trigger.
      val n = after2.count()
      query.processAllAvailable()
      assert(ChunkStore.read(spark, store).count() == n)
    } finally query.stop()
  }

  test("ST4: restart from checkpoint resumes without duplicating processed files") {
    val dropzone: Path = Files.createTempDirectory("graft-restart-dz")
    val store = Files.createTempDirectory("graft-restart-store").resolve("chunks").toString
    val checkpoint = Files.createTempDirectory("graft-restart-ckpt").toString

    Files.writeString(dropzone.resolve("one.txt"), "first file before the crash")
    val q1 = Dropzone.start(spark, dropzone.toString, store, checkpoint,
      chunkSize = 200, chunkOverlap = 40)
    try { q1.processAllAvailable() } finally q1.stop()
    val afterFirst = ChunkStore.read(spark, store).count()

    // file lands while the query is down; a new query on the SAME
    // checkpoint must pick it up and must NOT re-duplicate one.txt
    Files.writeString(dropzone.resolve("two.txt"), "second file after restart")
    val q2 = Dropzone.start(spark, dropzone.toString, store, checkpoint,
      chunkSize = 200, chunkOverlap = 40)
    try { q2.processAllAvailable() } finally q2.stop()

    val rows = ChunkStore.read(spark, store)
    assert(rows.count() == afterFirst + 1)
    assert(rows.select("path").distinct().collect().map(_.getString(0)).toSet
      == Set("one.txt", "two.txt"))
  }

  test("ST3: micro-batch skips files already stored with identical content") {
    import org.apache.spark.sql.DataFrame
    val store = Files.createTempDirectory("graft-st3-store").resolve("chunks").toString
    def files(body: String): DataFrame = {
      import spark.implicits._
      Seq(("dz/a.txt", body.getBytes("UTF-8")))
        .toDF("path", "content")
        .withColumn("length", octet_length(col("content")).cast("long"))
    }
    def run(body: String): Unit = Dropzone.processBatch(
      spark, files(body), "dz", store, 200, 40, 8, skipUnchangedFiles = true)

    run("the first version of the file")
    def partFiles() = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Path.of(store)).iterator().asScala
        .filter(_.toString.endsWith(".parquet")).map(_.toString).toSeq.sorted
    }
    val before = partFiles()

    // identical content re-delivered (post-eviction replay / touch):
    // zero buckets rewritten
    run("the first version of the file")
    assert(partFiles() == before, "unchanged re-delivery must not touch the store")

    // changed content under the same path replaces the document's chunks
    run("the second version entirely rewritten")
    val texts = ChunkStore.read(spark, store)
      .filter(col("path") === "a.txt").select("text")
      .collect().map(_.getString(0)).toSeq
    assert(texts.exists(_.contains("second version")))
    assert(!texts.exists(_.contains("first version")))
  }

  test("store compaction preserves content and reduces file count") {
    val dropzone: Path = Files.createTempDirectory("graft-compact-dz")
    val store = Files.createTempDirectory("graft-compact-store").resolve("chunks").toString
    // several upserts -> several file sets per bucket
    for (i <- 1 to 4) {
      Files.writeString(dropzone.resolve(s"f$i.txt"), s"document number $i body")
      spark.catalog.refreshByPath(dropzone.toString)
      graft.sources.ChunkStore.upsert(
        graft.sources.FileIngest.ingestDirectory(spark, dropzone.toString, 200, 40),
        store, numBuckets = 4)
    }
    def parquetFiles = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Path.of(store)).iterator().asScala
        .count(p => p.toString.endsWith(".parquet"))
    }
    val before = ChunkStore.read(spark, store).select("id").collect().map(_.getString(0)).sorted.toSeq
    val filesBefore = parquetFiles
    graft.sources.ChunkStore.compact(spark, store)
    val after = ChunkStore.read(spark, store).select("id").collect().map(_.getString(0)).sorted.toSeq
    assert(after == before)
    assert(parquetFiles < filesBefore, s"expected fewer files than $filesBefore")
  }
}
