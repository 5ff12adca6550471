package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash band-bucket artifact — the serving layout that makes
  * near-duplicate detection INCREMENTAL.
  *
  * The full-corpus near-dup pass ([[graft.operators.Dedup.minhashNearDuplicates]])
  * re-shingles and re-hashes everything per run; a daily pipeline instead
  * banding-fingerprints the corpus ONCE, persists the (doc, band, bucket)
  * rows, and probes each day's delta against the store. Rows are
  * partitioned by `bh_bucket = pmod(bh, Buckets)`, so a probe prunes to
  * exactly the partitions its own band hashes can collide with — the
  * TextIndex/VectorStore at-rest discipline applied to dedup. Probing
  * reads O(collisions); the corpus is never re-fingerprinted.
  *
  * Incremental lifecycle (TextIndex's (doc, gen) pattern, leaner): an
  * upsert appends the delta's band rows at gen+1 and writes a (doc,
  * gen+1) tombstone per replaced/deleted doc — it READS NO STORED STATE
  * at all (no stats to adjust), which makes it the cheapest of the three
  * incremental artifacts. Replay-idempotent via tracked batch ids;
  * crash-atomic because partial next-gen directories are deleted before
  * a redo and the stats sidecar (carrying the watermark) commits last.
  * A segment-count / tombstone-byte policy triggers zero-touch
  * compaction, which folds live rows back to gen-0 in the next epoch and
  * commits via the atomic pointer flip.
  *
  * Same portable hash family/constants as the inline operator (sha256
  * base + mod-2^60 affine permutations, `BandMinhash`), so any engine —
  * including the DuckDB oracle — replays the stored bands bit-for-bit.
  * (reference: re-ingest replace semantics, worker/app/utils/docids.py:
  * 44-49, generalized to corpus-scale near-dup serving.)
  */
object BandStore {

  /** bh partitions — bounds probe-side partition pruning lists. */
  val Buckets = 64

  final case class Store(rows: DataFrame, numHashes: Int, nBands: Int)

  /** Compaction triggers, recorded beside the artifact at write time. */
  final case class Policy(maxSegments: Long = 8L,
      maxTombstoneBytes: Long = VectorStore.MaxTombstoneBroadcastBytes)

  def storePath(sfDir: String): String = {
    val src = new java.io.File(s"$sfDir/documents.parquet")
    val parent = src.getAbsoluteFile.getParentFile
    if (parent != null && parent.canWrite)
      new java.io.File(parent, "documents.parquet._graft_bands").toString
    else {
      val root = sys.env.get("GRAFT_INDEX_DIR")
        .getOrElse(System.getProperty("java.io.tmpdir"))
      val sig = java.security.MessageDigest.getInstance("MD5")
        .digest(src.getAbsolutePath.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      new java.io.File(root, s"graft-bandstore-$sig").toString
    }
  }

  private def manifest(sfDir: String, numHashes: Int, bands: Int): String = {
    val stamp = VectorStore.sourceStamp(new java.io.File(s"$sfDir/documents.parquet"))
    s"""{"layout":"bands-v2-gen","src":"$stamp","num_hashes":$numHashes,"bands":$bands,"buckets":$Buckets,"hash_family":"sha256-affine-2^60","tokenizer":"v1-frozen"}"""
  }

  /** One row per (doc, band): the band's fold hash `bh`, the doc's full
    * band array (for emit-once against probes), and its shingle count
    * (similarity upper bounds / stats without re-reading the doc).
    */
  def bandRows(docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int, bands: Int): DataFrame = {
    // pre-filter on the CHEAP token count, not size(shingles): the two
    // are equivalent (the kernel returns empty below 3 v1 tokens, nulls
    // propagate identically), but a shingle-based filter collapses into
    // the scan's DataFilters and the Filter node, re-running the whole
    // shingle kernel 2 extra times per row
    val sh = docs
      .filter(size(split(trim(col(textCol)), " ")) >= 3)
      .select(col(idCol).as("c_id"),
        graft.operators.WordShingles.wordShingles(col(textCol)).as("shingles"))
    sh.select(col("c_id"), size(col("shingles")).as("n_sh"),
        graft.functions.BandMinhash.bandMinhash(col("shingles"), numHashes, bands).as("bhs"))
      .select(col("c_id"), col("n_sh"), col("bhs"),
        posexplode(col("bhs")).as(Seq("band", "bh")))
      .withColumn("bh_bucket", pmod(col("bh"), lit(Buckets.toLong)))
  }

  // ----------------------------------------------------------- sidecars

  private def statsPath(path: String) = java.nio.file.Paths.get(path, "_graft_stats.json")
  private def policyPath(path: String) = java.nio.file.Paths.get(path, "_graft_policy.json")

  private def writeStats(path: String, gen: Long, lastBatch: Long): Unit =
    java.nio.file.Files.writeString(statsPath(path),
      s"""{"gen":$gen,"last_batch":$lastBatch}""")

  /** (current max generation, streaming replay watermark). */
  def readStats(path: String): (Long, Long) =
    if (!java.nio.file.Files.exists(statsPath(path))) (0L, -1L)
    else {
      val s = java.nio.file.Files.readString(statsPath(path))
      def f(k: String) = s.split(s""""$k":""")(1).takeWhile(c => c == '-' || c.isDigit).toLong
      (f("gen"), f("last_batch"))
    }

  private def writePolicy(path: String, p: Policy): Unit =
    java.nio.file.Files.writeString(policyPath(path),
      s"""{"max_segments":${p.maxSegments},"max_tombstone_bytes":${p.maxTombstoneBytes}}""")

  private def readPolicy(path: String): Policy =
    if (!java.nio.file.Files.exists(policyPath(path))) Policy()
    else {
      val s = java.nio.file.Files.readString(policyPath(path))
      def f(k: String) = s.split(s""""$k":""")(1).takeWhile(_.isDigit).toLong
      Policy(f("max_segments"), f("max_tombstone_bytes"))
    }

  private def bandsDir(path: String) =
    new java.io.File(s"$path/bands/e${VectorStore.epochOf(path)}")
  private def tombstonesDir(path: String) =
    new java.io.File(s"$path/tombstones/e${VectorStore.epochOf(path)}")

  /** Tombstone-filter stored rows: a row is dead iff some tombstone for
    * its doc has a STRICTLY higher generation (a replaced doc's fresh
    * rows share the tombstone's gen and survive). No tombstones → the
    * plan is identical to the append-only layout. Size-gated broadcast,
    * the liveRows discipline shared with TextIndex/VectorStore.
    */
  private def liveRows(spark: SparkSession, path: String, rows: DataFrame): DataFrame =
    if (!VectorStore.hasParquetData(tombstonesDir(path))) rows
    else {
      val tomb = VectorStore.seg(spark, tombstonesDir(path).toString)
        .groupBy(col("doc")).agg(max(col("gen")).as("__tomb_gen"))
        .select(col("doc").as("c_id"), col("__tomb_gen"))
      val joined =
        if (VectorStore.dirBytes(tombstonesDir(path)) <=
            VectorStore.MaxTombstoneBroadcastBytes)
          rows.join(broadcast(tomb), Seq("c_id"), "left")
        else rows.hint("shuffle_hash")
          .join(tomb.hint("shuffle_hash"), Seq("c_id"), "left")
      joined.filter(col("__tomb_gen").isNull || col("gen") >= col("__tomb_gen"))
        .drop("__tomb_gen")
    }

  /** Full (re)build: band rows at gen 0 in the NEXT epoch, committed by
    * the atomic pointer flip. Preserves the replay watermark.
    */
  def exists(path: String): Boolean =
    VectorStore.hasParquetData(bandsDir(path))

  def write(docs: DataFrame, idCol: String, textCol: String, path: String,
      numHashes: Int, bands: Int, policy: Policy = Policy(),
      batchId: Long = -1L): Unit = {
    val prevLast = readStats(path)._2
    val next = VectorStore.epochOf(path) + 1
    bandRows(docs, idCol, textCol, numHashes, bands)
      .withColumn("gen", lit(0L))
      .repartition(col("bh_bucket"))
      .write.mode("overwrite").option("partitionOverwriteMode", "static")
      .partitionBy("gen", "bh_bucket")
      .parquet(s"$path/bands/e$next")
    VectorStore.setEpoch(path, next)
    writePolicy(path, policy)
    writeStats(path, gen = 0L,
      lastBatch = if (batchId >= 0) batchId else prevLast)
    VectorStore.gcEpochs(path, Seq("bands", "tombstones"), next)
  }

  /** Incremental maintenance — the cheapest of the three incremental
    * artifacts: appends the delta's band rows at gen+1 and tombstones
    * every replaced/deleted doc at gen+1, reading NO stored state (there
    * are no corpus-derived stats to adjust; a tombstone for a doc that
    * was never stored kills nothing). Replay-idempotent via `batchId`;
    * crash-atomic: partial next-gen directories are deleted before a
    * redo, stats (the watermark) commit last.
    */
  def upsert(spark: SparkSession, delta: DataFrame, idCol: String,
      textCol: String, deletedIds: DataFrame, path: String,
      numHashes: Int, bands: Int, batchId: Long = -1L): Unit = {
    val (gen0, lastBatch) = readStats(path)
    if (batchId >= 0 && batchId <= lastBatch) return
    val nextGen = gen0 + 1
    val epoch = VectorStore.epochOf(path)
    Seq("bands", "tombstones").foreach { sub =>
      val d = new java.io.File(s"$path/$sub/e$epoch/gen=$nextGen")
      if (d.exists()) {
        org.apache.commons.io.FileUtils.deleteDirectory(d)
        spark.catalog.refreshByPath(s"$path/$sub/e$epoch")
      }
    }
    val affected = delta.select(col(idCol).as("doc"))
      .unionByName(deletedIds.select(col(deletedIds.columns.head).as("doc")))
      .distinct()
    if (!affected.isEmpty)
      affected.select(col("doc"), lit(nextGen).as("gen"))
        .write.mode("append").partitionBy("gen")
        .parquet(s"$path/tombstones/e$epoch")
    bandRows(delta, idCol, textCol, numHashes, bands)
      .withColumn("gen", lit(nextGen))
      .write.mode("append").partitionBy("gen", "bh_bucket")
      .parquet(s"$path/bands/e$epoch")
    writeStats(path, nextGen, if (batchId >= 0) batchId else lastBatch)
    maybeCompact(spark, path)
  }

  /** Fold live rows back to gen-0 in the next epoch (LSM compaction;
    * serving correctness never depends on it — the fold is committed by
    * the atomic pointer flip, which retires old segments AND tombstones
    * together).
    */
  def compact(spark: SparkSession, path: String): Unit = {
    val (_, lastBatch) = readStats(path)
    val next = VectorStore.epochOf(path) + 1
    val live = liveRows(spark, path,
        VectorStore.seg(spark, bandsDir(path).toString))
      .localCheckpoint()
    live.withColumn("gen", lit(0L))
      .repartition(col("bh_bucket"))
      .write.mode("overwrite").option("partitionOverwriteMode", "static")
      .partitionBy("gen", "bh_bucket")
      .parquet(s"$path/bands/e$next")
    VectorStore.setEpoch(path, next)
    writeStats(path, gen = 0L, lastBatch = lastBatch)
    VectorStore.gcEpochs(path, Seq("bands", "tombstones"), next)
  }

  private def maybeCompact(spark: SparkSession, path: String): Unit = {
    val p = readPolicy(path)
    val (gen, _) = readStats(path)
    val tombBytes = VectorStore.dirBytes(tombstonesDir(path))
    if (gen + 1 > p.maxSegments || tombBytes > p.maxTombstoneBytes)
      compact(spark, path)
  }

  def read(spark: SparkSession, path: String, numHashes: Int, bands: Int): Store =
    Store(liveRows(spark, path,
      VectorStore.seg(spark, bandsDir(path).toString)), numHashes, bands)

  /** Load the store for `docs`, building it if absent/stale — index at
    * ingest: Verify/Bench build once per sfDir, probes only read.
    */
  def ensure(spark: SparkSession, docs: => DataFrame, idCol: String,
      textCol: String, sfDir: String,
      numHashes: Int = 32, bands: Int = 8): Store = {
    val path = storePath(sfDir)
    val mfPath = java.nio.file.Paths.get(path, "_graft_manifest.json")
    val expected = manifest(sfDir, numHashes, bands)
    val fresh = java.nio.file.Files.exists(mfPath) &&
      java.nio.file.Files.readString(mfPath) == expected
    if (!fresh) {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
      write(docs, idCol, textCol, path, numHashes, bands)
      java.nio.file.Files.writeString(mfPath, expected)
    }
    read(spark, path, numHashes, bands)
  }
}
