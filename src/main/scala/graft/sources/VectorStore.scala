package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** ANN layout persisted at WRITE time (SURVEY §4.2): the vector table is
  * stored partitioned by its IVF `cell` (spherical k-means, nearest
  * centroid) and sign-LSH `bucket` (fixed hyperplanes), so a search
  * touches only the probed partitions — `.explain` shows PartitionFilters
  * on the scan, and a 100 TB corpus prunes ~nProbe/k (IVF) or
  * ~ΣC(planes,r)/2^planes (LSH) of its bytes at the SOURCE, not after a
  * full scan.
  *
  * The reference's vector store similarly indexes at upsert time, not
  * query time (reference: worker/app/qdrant_init.py:32-43 creates the
  * collection index once; queries only search it). Index build here is one
  * k-means fit (sampleable at scale) + one narrow labelling pass.
  *
  * Lifecycle (epoch pointer, gen segments, (id, gen) tombstones + the
  * size-gated liveRows filter, crash-redo, policy compaction triggers,
  * manifest gate, sidecar IO) is [[GenStore]]'s — this file owns the two
  * vector layouts (full vectors and PQ codes), their assignment
  * arithmetic, and the drift/quality retrain triggers.
  *
  * Layout on disk:
  *   path/vectors/e<epoch>/gen=<g>/cell=<c>/part-….parquet
  *   path/_graft_centroids.json   — k × dim centroid matrix (engine-portable)
  */
object VectorStore {

  case class Index(vectors: DataFrame, centroids: Array[Array[Double]],
      planes: Int, dim: Int)

  /** Compaction thresholds — the shared [[GenStore.Policy]] record; this
    * store arms the segment-count and tombstone-byte triggers.
    */
  type Policy = GenStore.Policy
  val Policy: GenStore.Policy.type = GenStore.Policy

  def indexPath(sfDir: String, planes: Int, dim: Int, k: Int): String =
    GenStore.artifactPath(sfDir, "embeddings.parquet", "_graft_index",
      "graft-vstore")

  private def manifest(sfDir: String, planes: Int, dim: Int, k: Int): String = {
    val stamp = GenStore.sourceStamp(new java.io.File(s"$sfDir/embeddings.parquet"))
    // layout version: bump when cell/bucket assignment semantics change,
    // so indexes written by an older build rebuild instead of silently
    // mixing assignment families ("portable-v1" = NearestCell identity
    // assignment replacing MLlib model.transform)
    // v2: rows carry the segment generation (incremental-upsert layout)
    // v3: gen is a TOP-LEVEL partition column (gen=N/cell=C/): a crashed
    //     upsert's partial segment is identifiable and deletable by
    //     directory, which is what makes batch replay crash-atomic
    // v4: tables live under an epoch directory committed by the atomic
    //     `_graft_epoch` pointer — compaction/retrain rewrites are
    //     crash-atomic too (see GenStore's epoch section)
    s"""{"source_stamp":"$stamp","planes":$planes,"dim":$dim,"k":$k,"assign":"portable-v4"}"""
  }

  /** Write-time indexing: label every vector with `cell` (IVF) and
    * `bucket` (sign LSH); store PARTITIONED by cell and CLUSTERED
    * (sorted) by bucket inside each partition. Cell probes prune whole
    * partitions; bucket probes push an IN filter into parquet, where the
    * sort makes row-group min/max stats skip the non-probed ranges — the
    * standard coarse-partition + fine-cluster lakehouse layout (a full
    * cell×bucket partition grid would mean k·2^planes tiny partitions).
    */
  def write(emb: DataFrame, vecCol: String, path: String,
      planes: Int = 8, dim: Int = 64, k: Int = 16, seed: Long = 42L,
      batchId: Long = -1L, policy: Policy = Policy()): Unit = {
    val (model, indexed) = Similarity.ivfIndex(emb, vecCol, k, seed)
    // full rebuilds land in the NEXT epoch and commit via the atomic
    // pointer flip: a crash mid-rebuild leaves the old epoch serving
    val next = GenStore.epochOf(path) + 1
    indexed.drop("features")
      .withColumn("bucket",
        Similarity.bucketCol(col(vecCol).cast("array<double>"), planes, dim))
      .withColumn("gen", lit(0L))
      .repartition(col("cell"))
      .sortWithinPartitions(col("cell"), col("bucket"))
      .write.mode("overwrite").option("partitionOverwriteMode", "static")
      .partitionBy("gen", "cell")
      .parquet(s"$path/vectors/e$next")
    val json = model.clusterCenters
      .map(_.toArray.mkString("[", ",", "]")).mkString("[", ",", "]")
    GenStore.atomicWrite(
      java.nio.file.Paths.get(path, "_graft_centroids.json"), json)
    GenStore.setEpoch(path, next) // commit: retires old vectors AND old tombstones
    // a rebuild (ensure on a changed source, retrain) must not reset the
    // streaming replay watermark: with no explicit batchId, carry the
    // stored one forward so a restarted stream cannot re-apply a
    // delivered batch to the fresh artifact
    val prevLast = readIncStats(path)._4
    GenStore.writePolicy(path, policy)
    writeIncStats(path,
      emb.sparkSession.read.parquet(s"$path/vectors/e$next").count(), 0L, 0L,
      if (batchId >= 0) batchId else prevLast)
    GenStore.gcEpochs(path, Seq("vectors", "tombstones"), next)
  }

  // Existence is keyed on the COMMITTED epoch, not the pre-commit
  // sidecar (r10): write() lands the codebooks/centroids json BEFORE the
  // setEpoch flip, so a crash in that window used to leave a store that
  // "existed" while its live epoch dir never held the build — the next
  // batch then appended deltas into an empty table and served only them.
  // setEpoch is the commit; an uncommitted build must read as absent so
  // the next ensure/first-batch rebuilds it.
  def pqExists(path: String): Boolean =
    java.nio.file.Files.exists(
      java.nio.file.Paths.get(path, "_graft_pq_codebooks.json")) &&
      GenStore.epochOf(path) >= 1L

  private[graft] def readCentroids(path: String): Array[Array[Double]] = {
    val node = GenStore.readSidecar(
      java.nio.file.Paths.get(path, "_graft_centroids.json")).get
    (0 until node.size()).map { i =>
      val row = node.get(i)
      Array.tabulate(row.size())(j => row.get(j).asDouble())
    }.toArray
  }

  def read(spark: SparkSession, path: String, planes: Int, dim: Int,
      idCol: String = "vec_id"): Index =
    Index(liveRows(spark, path,
      GenStore.seg(spark, GenStore.tableDir(path, "vectors")), idCol),
      readCentroids(path), planes, dim)

  // ---------------------------------------------------------------------
  // Incremental maintenance (reference: Qdrant indexes points per upsert
  // batch, worker/app/services/qdrant_client.py:303-407, and never
  // rebuilds the collection on new data). New/changed vectors are
  // assigned with the STORED centroids/hyperplanes — pure literal
  // arithmetic, no read of stored vectors — and appended into their cell
  // partitions at the next segment generation; replaced/deleted ids get
  // tombstones ("rows of this id below gen g are dead"). Centroids only
  // retrain when drift (appended fraction, tracked in the stats sidecar)
  // passes taste — the probe identity stays replayable from the SAME
  // exported literals across any number of upserts.
  // ---------------------------------------------------------------------

  private def incStatsPath(path: String) =
    java.nio.file.Paths.get(path, "_graft_inc_stats.json")

  private def writeIncStats(path: String, baseN: Long, appendedN: Long,
      gen: Long, lastBatch: Long = -1L): Unit =
    GenStore.atomicWrite(incStatsPath(path),
      s"""{"base_n":$baseN,"appended_n":$appendedN,"gen":$gen,"last_batch":$lastBatch}""")

  private[graft] def readIncStats(path: String): (Long, Long, Long, Long) =
    GenStore.readSidecar(incStatsPath(path)).map { node =>
      (GenStore.jLong(node, "base_n", 0L), GenStore.jLong(node, "appended_n", 0L),
        GenStore.jLong(node, "gen", 0L), GenStore.jLong(node, "last_batch", -1L))
    }.getOrElse((0L, 0L, 0L, -1L))

  def vectorsExist(path: String): Boolean = // epoch-keyed: see pqExists
    java.nio.file.Files.exists(
      java.nio.file.Paths.get(path, "_graft_centroids.json")) &&
      GenStore.epochOf(path) >= 1L

  private def maybeCompact(spark: SparkSession, path: String,
      idCol: String, sub: String): Unit = {
    val (_, _, gen, _) = readIncStats(path)
    val p = GenStore.readPolicy(path)
    if (gen >= p.maxSegments ||
        GenStore.dirBytes(GenStore.tombstonesDir(path)) > p.maxTombstoneBytes)
      compactVectors(spark, path, idCol, sub)
  }

  /** Appended-since-train fraction — the retrain trigger a maintenance
    * job compares against its drift budget (the cells stay CORRECT under
    * any drift — stale centroids only cost recall, never wrong results,
    * because probe selection and assignment use the same literals).
    */
  def driftFraction(path: String): Double = {
    val (baseN, appendedN, _, _) = readIncStats(path)
    if (baseN <= 0L) 0.0 else appendedN.toDouble / baseN.toDouble
  }

  /** Tombstone filter with this store's key naming: tombstones carry
    * `id`, rows carry the caller's `idCol` (which may itself be "id" —
    * GenStore aliases to a reserved name before the join exactly so that
    * case works).
    */
  private def liveRows(spark: SparkSession, path: String, rows: DataFrame,
      idCol: String): DataFrame =
    GenStore.liveRows(spark, path, rows, rowKey = idCol, tombCol = "id",
      maxGen = GenStore.committedGen(incStatsPath(path)))

  /** The delta's labelled segment rows — cell/bucket assignment from the
    * stored centroid literals ONLY (test-guarded: no scan of the stored
    * vectors, the corpus, or anything else).
    */
  private[graft] def assignDelta(delta: DataFrame, vecCol: String,
      centroids: Array[Array[Double]], planes: Int, dim: Int,
      gen: Long): DataFrame =
    delta
      .withColumn("cell", graft.functions.VectorFunctions.nearestCell(
        col(vecCol).cast("array<double>"), centroids))
      .withColumn("bucket",
        Similarity.bucketCol(col(vecCol).cast("array<double>"), planes, dim))
      .withColumn("gen", lit(gen))

  /** Merge a delta of new/changed vectors and a set of deleted ids into
    * the stored index without touching stored vectors: one assignment
    * pass over the delta (stored-literal arithmetic), one partitioned
    * append, one tombstone append. `delta` must be unique on `idCol`.
    */
  def upsertVectors(spark: SparkSession, delta: DataFrame, idCol: String,
      vecCol: String, deletedIds: DataFrame, path: String,
      planes: Int = 8, dim: Int = 64, batchId: Long = -1L): Unit = {
    val centroids = readCentroids(path)
    val (baseN, appendedN, gen0, lastBatch) = readIncStats(path)
    // foreachBatch replay safety (same contract as TextIndex.upsert):
    // re-appending a delivered batch would duplicate its vectors
    if (batchId >= 0 && batchId <= lastBatch) return
    val nextGen = gen0 + 1
    GenStore.dropPartialGen(spark, path, Seq("vectors", "tombstones"), nextGen)
    val nDelta = delta.count()
    // tombstone EVERY affected id (replaced, deleted, or absent — the
    // last is harmless): no read of stored state is needed at all
    GenStore.appendTombstones(path,
      delta.select(col(idCol).as("id"))
        .unionByName(deletedIds.select(col(deletedIds.columns.head).as("id"))),
      tombCol = "id", gen = nextGen)
    assignDelta(delta, vecCol, centroids, planes, dim, nextGen)
      .repartition(col("cell"))
      .sortWithinPartitions(col("cell"), col("bucket"))
      .write.mode("append").partitionBy("gen", "cell")
      .parquet(GenStore.tableDir(path, "vectors"))
    writeIncStats(path, baseN, appendedN + nDelta, nextGen,
      if (batchId >= 0) batchId else lastBatch)
    maybeCompact(spark, path, idCol, sub = "vectors")
  }

  /** Drift-triggered retrain — the maintenance job that completes the
    * incremental story: when the appended fraction passes `threshold`,
    * re-run the FULL build over the live rows (one k-means fit + one
    * relabel pass, the same cost as the original build — but now a
    * scheduled maintenance event, not an inline rebuild on every source
    * change) and clear drift + tombstones. Below the threshold it is a
    * no-op. Returns whether a retrain ran. NOTE: retraining changes the
    * centroid literals — downstream PQ codes keyed to them must rebuild
    * too (their manifest fingerprints the centroid set exactly for this).
    */
  def retrainIfDrifted(spark: SparkSession, path: String, vecCol: String,
      idCol: String = "vec_id", planes: Int = 8, dim: Int = 64,
      k: Int = 16, seed: Long = 42L, threshold: Double = 0.2): Boolean = {
    if (driftFraction(path) <= threshold) false
    else {
      val live = read(spark, path, planes, dim, idCol).vectors
        .drop("cell", "bucket", "gen")
        .localCheckpoint() // snapshot BEFORE the rebuild below
      // write() commits into the next epoch: stale tombstones retire with
      // the old one atomically, drift resets, the watermark is preserved
      write(live, vecCol, path, planes, dim, k, seed)
      true
    }
  }

  /** Fold segments + tombstones back to a clean gen-0 layout (LSM
    * compaction; serving correctness never depends on it). Works on both
    * the vectors and the codes artifact (`sub` = which table to rewrite).
    * Drift counters are PRESERVED: compaction rewrites files, it does not
    * retrain — the fraction of rows assigned with stale centroids is
    * unchanged, and resetting it would let a churn-heavy store (which
    * auto-compacts often) evade retrainIfDrifted forever.
    */
  def compactVectors(spark: SparkSession, path: String,
      idCol: String = "vec_id", sub: String = "vectors"): Unit = {
    val next = GenStore.epochOf(path) + 1
    val live = liveRows(spark, path,
      GenStore.seg(spark, GenStore.tableDir(path, sub)), idCol)
      .withColumn("gen", lit(0L))
      .localCheckpoint()
    // fold into the NEXT epoch (overwrite clears any orphan of a crashed
    // prior attempt), then the pointer flip retires the old epoch AND its
    // tombstones in one atomic step — no window where stale tombstones
    // can kill freshly folded rows
    // writeTable keeps a fully-tombstoned store readable (GenStore r10)
    GenStore.writeTable(live, "cell", Seq("gen", "cell"), Nil,
      s"$path/$sub/e$next")
    GenStore.setEpoch(path, next)
    val (baseN, appendedN, _, lastBatch) = readIncStats(path)
    writeIncStats(path, baseN, appendedN, 0L, lastBatch)
    GenStore.gcEpochs(path, Seq(sub, "tombstones"), next)
  }

  /** Load the index for `emb`, building it first if absent — the dev-loop
    * equivalent of "index at ingest": Verify/Bench build once per sfDir,
    * every query after that only probes.
    */
  def ensure(spark: SparkSession, emb: => DataFrame, vecCol: String,
      sfDir: String, planes: Int = 8, dim: Int = 64, k: Int = 16,
      seed: Long = 42L): Index = {
    val path = indexPath(sfDir, planes, dim, k)
    GenStore.ensureFresh(path, manifest(sfDir, planes, dim, k)) {
      write(emb, vecCol, path, planes, dim, k, seed)
    }
    read(spark, path, planes, dim)
  }

  // ---------------------------------------------------------------------
  // Product-quantization artifact: a codes table (m bytes/vector) beside
  // the vector table, + the trained sub-codebooks as an engine-portable
  // JSON matrix. Candidate generation scans codes ONLY (32× fewer bytes
  // at m=8 over 64 float dims); exact rerank joins survivors back to the
  // full vectors. Same manifest/rebuild discipline as the IVF/LSH index.
  // ---------------------------------------------------------------------

  case class PqIndex(codes: DataFrame, codebooks: Array[Array[Array[Double]]],
      m: Int, dsub: Int, ksub: Int)

  def pqPath(sfDir: String): String =
    GenStore.artifactPath(sfDir, "embeddings.parquet", "_graft_pq",
      "graft-pqstore", key = "#pq")

  private def pqManifest(sfDir: String, m: Int, ksub: Int, seed: Long,
      centroids: Array[Array[Double]]): String = {
    val stamp = GenStore.sourceStamp(new java.io.File(s"$sfDir/embeddings.parquet"))
    // Fingerprint the IVF centroids the codes are cell-partitioned by:
    // a rebuilt IVF index (different params/seed) must invalidate the PQ
    // artifact too, or q76-style probes would prune the WRONG partitions.
    val cfp = java.security.MessageDigest.getInstance("MD5")
      .digest(centroids.map(_.mkString(",")).mkString(";").getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    // v4: codes carry the IVF `cell` partition column (IVF-PQ layout) AND
    // the segment generation (incremental-upsert layout); manifest pins
    // the k-means seed + the exact centroid set
    // v5: gen is a top-level partition directory (crash-atomic replay,
    // see GenStore.dropPartialGen); v6: epoch-pointer committed rewrites
    s"""{"source_stamp":"$stamp","m":$m,"ksub":$ksub,"seed":$seed,""" +
      s""""centroid_fp":"$cfp","assign":"pq-portable-v6"}"""
  }

  /** Train per-subspace spherical sub-codebooks (seeded MLlib k-means over
    * the L2-normalized vector's m equal slices) and persist every vector's
    * codes. One fit per subspace — each over dsub-dim points, sampleable
    * at scale — then ONE narrow labelling pass through the portable
    * [[graft.functions.PqEncode]] argmin (`‖c‖² − 2·sub·c`), so code
    * assignment is replayable from the exported codebook literals.
    */
  def writePq(emb: DataFrame, vecCol: String, path: String,
      m: Int = 8, ksub: Int = 16, seed: Long = 42L,
      centroids: Array[Array[Double]], policy: Policy = Policy()): Unit = {
    import org.apache.spark.ml.functions.array_to_vector
    val next = GenStore.epochOf(path) + 1
    val nv = emb.withColumn("nv",
      graft.functions.VectorFunctions.l2Normalize(col(vecCol).cast("array<double>")))
    val dim = nv.select(size(col("nv"))).head().getInt(0)
    require(dim % m == 0, s"PQ: dim $dim not divisible by m=$m subspaces")
    val dsub = dim / m
    val codebooks = Array.tabulate(m) { mi =>
      val sub = nv.select(
        array_to_vector(slice(col("nv"), mi * dsub + 1, dsub)).as("features"))
      new org.apache.spark.ml.clustering.KMeans()
        .setK(ksub).setSeed(seed + mi).setMaxIter(5)
        .fit(sub).clusterCenters.map(_.toArray)
    }
    // IVF-PQ layout: codes partitioned by the SAME portable cell
    // assignment as the vector store, so a probed search prunes code
    // partitions at the source before any ADC arithmetic
    nv.withColumn("codes",
        graft.functions.VectorFunctions.pqEncode(col("nv"), codebooks))
      .withColumn("cell", graft.functions.VectorFunctions.nearestCell(
        col(vecCol).cast("array<double>"), centroids))
      .drop("nv", vecCol)
      .withColumn("gen", lit(0L))
      .repartition(col("cell"))
      .write.mode("overwrite").option("partitionOverwriteMode", "static")
      .partitionBy("gen", "cell").parquet(s"$path/codes/e$next")
    val json = codebooks.map(_.map(_.mkString("[", ",", "]"))
      .mkString("[", ",", "]")).mkString("[", ",", "]")
    GenStore.atomicWrite(
      java.nio.file.Paths.get(path, "_graft_pq_codebooks.json"), json)
    GenStore.setEpoch(path, next)
    // an ensurePq-triggered rebuild must not erase the streaming replay
    // watermark (retrainIfDrifted restores it explicitly; this path now
    // preserves it by default)
    val prevLast = readIncStats(path)._4
    GenStore.writePolicy(path, policy)
    writeIncStats(path,
      emb.sparkSession.read.parquet(s"$path/codes/e$next").count(), 0L, 0L, prevLast)
    // training-time mean reconstruction error — the denominator the
    // quality-drift ratio compares every future delta against
    val baseQerr = {
      val r = nv.agg(avg(
        graft.functions.VectorFunctions.pqRecError(col("nv"), codebooks))).head()
      if (r.isNullAt(0)) 0.0 else r.getDouble(0)
    }
    writePqQuality(path, baseQerr, 0.0, 0L)
    GenStore.gcEpochs(path, Seq("codes", "tombstones"), next)
  }

  // --- PQ codebook quality ---------------------------------------------
  // Appended-fraction drift (readIncStats on the PQ root) says how MUCH
  // new data arrived since the codebooks trained; this sidecar says how
  // WELL the frozen codebooks still fit it. A distribution shift costs
  // ADC precision silently — codes stay valid, distances just get worse —
  // so every upsert accumulates the delta's mean reconstruction error
  // (Σ_m min_c ‖sub−c‖², VectorKernels.pqRecError) and retrainPqIfStale
  // compares it against the training-time mean. Compaction rewrites
  // files, not codebooks: the sidecar is untouched by epoch swaps, like
  // the drift counters. (A crash between the inc-stats write and this
  // sidecar's loses ONE delta's quality contribution — a maintenance
  // metric, never serving correctness.)

  private def pqQualityFile(path: String) =
    java.nio.file.Paths.get(path, "_graft_pq_quality.json")

  private def writePqQuality(path: String, baseQerr: Double,
      deltaQerrSum: Double, deltaN: Long): Unit =
    GenStore.atomicWrite(pqQualityFile(path),
      s"""{"base_qerr":$baseQerr,"delta_qerr_sum":$deltaQerrSum,"delta_n":$deltaN}""")

  private[graft] def readPqQuality(path: String): (Double, Double, Long) =
    GenStore.readSidecar(pqQualityFile(path)).map { node =>
      (GenStore.jDouble(node, "base_qerr", 0.0),
        GenStore.jDouble(node, "delta_qerr_sum", 0.0),
        GenStore.jLong(node, "delta_n", 0L))
    }.getOrElse((0.0, 0.0, 0L))

  /** Appended rows' mean quantization error over the training-time mean.
    * 1.0 = the codebooks fit new data exactly as well as the corpus they
    * trained on; a ratio past taste (retrainPqIfStale's default 1.5)
    * means the appended distribution drifted and ADC precision is
    * silently degrading.
    */
  def pqQualityRatio(path: String): Double = {
    val (base, dSum, dN) = readPqQuality(path)
    if (dN <= 0L || base <= 0.0) 1.0 else (dSum / dN) / base
  }

  private def readPqCodebooks(path: String): Array[Array[Array[Double]]] = {
    val node = GenStore.readSidecar(
      java.nio.file.Paths.get(path, "_graft_pq_codebooks.json")).get
    (0 until node.size()).map { mi =>
      val cb = node.get(mi)
      (0 until cb.size()).map { c =>
        val row = cb.get(c)
        Array.tabulate(row.size())(j => row.get(j).asDouble())
      }.toArray
    }.toArray
  }

  /** Incremental PQ maintenance: encode the delta with the STORED
    * sub-codebooks (pure literal arithmetic — codebooks only retrain on
    * drift, like centroids) and append into the cell partitions; same
    * tombstone contract as the vector segments.
    */
  def upsertPqCodes(spark: SparkSession, delta: DataFrame, idCol: String,
      vecCol: String, deletedIds: DataFrame, path: String,
      centroids: Array[Array[Double]], batchId: Long = -1L): Unit = {
    val codebooks = readPqCodebooks(path)
    val (baseN, appendedN, gen0, lastBatch) = readIncStats(path)
    if (batchId >= 0 && batchId <= lastBatch) return
    val nextGen = gen0 + 1
    GenStore.dropPartialGen(spark, path, Seq("codes", "tombstones"), nextGen)
    val nDelta = delta.count()
    GenStore.appendTombstones(path,
      delta.select(col(idCol).as("id"))
        .unionByName(deletedIds.select(col(deletedIds.columns.head).as("id"))),
      tombCol = "id", gen = nextGen)
    delta
      .withColumn("nv", graft.functions.VectorFunctions.l2Normalize(
        col(vecCol).cast("array<double>")))
      .withColumn("codes",
        graft.functions.VectorFunctions.pqEncode(col("nv"), codebooks))
      .withColumn("cell", graft.functions.VectorFunctions.nearestCell(
        col(vecCol).cast("array<double>"), centroids))
      .drop("nv", vecCol)
      .withColumn("gen", lit(nextGen))
      .repartition(col("cell"))
      .write.mode("append").partitionBy("gen", "cell")
      .parquet(GenStore.tableDir(path, "codes"))
    writeIncStats(path, baseN, appendedN + nDelta, nextGen,
      if (batchId >= 0) batchId else lastBatch)
    // accumulate the delta's quantization error into the quality sidecar
    // (replay-guarded above with the rest of the upsert, so a re-delivered
    // batch never double-counts)
    val (baseQ, dSum, dN) = readPqQuality(path)
    val deltaErr = {
      val r = delta
        .withColumn("nv", graft.functions.VectorFunctions.l2Normalize(
          col(vecCol).cast("array<double>")))
        .agg(sum(graft.functions.VectorFunctions.pqRecError(col("nv"), codebooks)))
        .head()
      if (r.isNullAt(0)) 0.0 else r.getDouble(0)
    }
    writePqQuality(path, baseQ, dSum + deltaErr, dN + nDelta)
    maybeCompact(spark, path, idCol, sub = "codes")
  }

  def readPq(spark: SparkSession, path: String,
      idCol: String = "vec_id"): PqIndex = {
    val cbs = readPqCodebooks(path)
    PqIndex(liveRows(spark, path,
      GenStore.seg(spark, GenStore.tableDir(path, "codes")), idCol),
      cbs, cbs.length, cbs(0)(0).length, cbs(0).length)
  }

  /** Quality-triggered PQ retrain — the codebook twin of
    * [[retrainIfDrifted]]: rebuild the sub-codebooks from the
    * caller-supplied live vectors when EITHER the appended fraction
    * passes `driftThreshold` (how much new data) OR the appended rows'
    * mean quantization error passes `qualityThreshold` × the
    * training-time mean (how badly the frozen codebooks fit it). The
    * second trigger is what catches a distribution shift hiding inside a
    * small delta: codes stay VALID under any drift — ADC distances just
    * silently lose precision — so no correctness gate ever fires without
    * this. Returns whether a retrain ran; [[writePq]] resets both drift
    * and quality counters and preserves the streaming replay watermark.
    */
  def retrainPqIfStale(spark: SparkSession, emb: => DataFrame, vecCol: String,
      sfDir: String, m: Int = 8, ksub: Int = 16, seed: Long = 42L,
      driftThreshold: Double = 0.2, qualityThreshold: Double = 1.5,
      planes: Int = 8, dim: Int = 64, ivfK: Int = 16): Boolean = {
    val path = pqPath(sfDir)
    if (driftFraction(path) <= driftThreshold &&
        pqQualityRatio(path) <= qualityThreshold) false
    else {
      // shared centroid set with the IVF store queries probe (fresh →
      // no rebuild); the manifest already fingerprints it
      val centroids = ensure(spark, emb, vecCol, sfDir, planes, dim, ivfK).centroids
      writePq(emb, vecCol, path, m, ksub, seed, centroids)
      GenStore.atomicWrite(
        java.nio.file.Paths.get(path, "_graft_pq_manifest.json"),
        pqManifest(sfDir, m, ksub, seed, centroids))
      true
    }
  }

  def ensurePq(spark: SparkSession, emb: => DataFrame, vecCol: String,
      sfDir: String, m: Int = 8, ksub: Int = 16, seed: Long = 42L): PqIndex = {
    val path = pqPath(sfDir)
    // the cell layout comes from the SAME IVF index queries probe —
    // one shared centroid set, one portable assignment identity; its
    // fingerprint is part of the manifest, so resolve it first
    val centroids = ensure(spark, emb, vecCol, sfDir).centroids
    GenStore.ensureFresh(path, pqManifest(sfDir, m, ksub, seed, centroids),
        manifestName = "_graft_pq_manifest.json") {
      writePq(emb, vecCol, path, m, ksub, seed, centroids)
    }
    readPq(spark, path)
  }
}
