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
  * Layout on disk:
  *   path/vectors/cell=<c>/bucket=<b>/part-….parquet
  *   path/_graft_centroids.json   — k × dim centroid matrix (engine-portable)
  */
object VectorStore {

  case class Index(vectors: DataFrame, centroids: Array[Array[Double]],
      planes: Int, dim: Int)

  /** Content stamp of the source table: for a plain file its (size,
    * mtime); for a Spark-written DIRECTORY, the sorted (name, size, mtime)
    * of its part files — a directory's own stat does not change on
    * in-place part rewrites, so hashing only it can serve a stale index
    * after the table regenerates (rows-only queries would not catch it).
    */
  def sourceStamp(src: java.io.File): String =
    if (!src.exists()) "absent"
    else if (src.isDirectory) {
      val parts = Option(src.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && !f.getName.startsWith("."))
        .sortBy(_.getName)
      parts.map(f => s"${f.getName}:${f.length()}:${f.lastModified()}")
        .mkString("dir[", ",", "]")
    } else s"${src.length()}|${src.lastModified()}"

  /** Index location: BESIDE the table it indexes — `<table>._graft_index/`
    * under the index root — with a `_graft_manifest.json` recording the
    * source stamp + layout params; [[ensure]] rebuilds on any mismatch
    * rather than trusting the path. The root is the table's own parent
    * directory when writable (the at-rest lakehouse layout: index travels
    * with the data); a read-only source (this sandbox's /root/testdata)
    * falls back to `GRAFT_INDEX_DIR` or the JVM tmpdir, keyed by the
    * table's absolute path.
    */
  def indexPath(sfDir: String, planes: Int, dim: Int, k: Int): String = {
    val src = new java.io.File(s"$sfDir/embeddings.parquet")
    val parent = src.getAbsoluteFile.getParentFile
    if (parent != null && parent.canWrite)
      new java.io.File(parent, "embeddings.parquet._graft_index").toString
    else {
      val root = sys.env.get("GRAFT_INDEX_DIR")
        .getOrElse(System.getProperty("java.io.tmpdir"))
      val sig = java.security.MessageDigest.getInstance("MD5")
        .digest(src.getAbsolutePath.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      new java.io.File(root, s"graft-vstore-$sig").toString
    }
  }

  private def manifest(sfDir: String, planes: Int, dim: Int, k: Int): String = {
    val stamp = sourceStamp(new java.io.File(s"$sfDir/embeddings.parquet"))
    // layout version: bump when cell/bucket assignment semantics change,
    // so indexes written by an older build rebuild instead of silently
    // mixing assignment families ("portable-v1" = NearestCell identity
    // assignment replacing MLlib model.transform)
    s"""{"source_stamp":"$stamp","planes":$planes,"dim":$dim,"k":$k,"assign":"portable-v1"}"""
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
      planes: Int = 8, dim: Int = 64, k: Int = 16, seed: Long = 42L): Unit = {
    val (model, indexed) = Similarity.ivfIndex(emb, vecCol, k, seed)
    indexed.drop("features")
      .withColumn("bucket",
        Similarity.bucketCol(col(vecCol).cast("array<double>"), planes, dim))
      .repartition(col("cell"))
      .sortWithinPartitions(col("cell"), col("bucket"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$path/vectors")
    val json = model.clusterCenters
      .map(_.toArray.mkString("[", ",", "]")).mkString("[", ",", "]")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path, "_graft_centroids.json"), json)
  }

  def read(spark: SparkSession, path: String, planes: Int, dim: Int): Index = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(
      java.nio.file.Files.readString(
        java.nio.file.Paths.get(path, "_graft_centroids.json")))
    val centroids = (0 until node.size()).map { i =>
      val row = node.get(i)
      Array.tabulate(row.size())(j => row.get(j).asDouble())
    }.toArray
    Index(spark.read.parquet(s"$path/vectors"), centroids, planes, dim)
  }

  /** Load the index for `emb`, building it first if absent — the dev-loop
    * equivalent of "index at ingest": Verify/Bench build once per sfDir,
    * every query after that only probes.
    */
  def ensure(spark: SparkSession, emb: => DataFrame, vecCol: String,
      sfDir: String, planes: Int = 8, dim: Int = 64, k: Int = 16,
      seed: Long = 42L): Index = {
    val path = indexPath(sfDir, planes, dim, k)
    val mfPath = java.nio.file.Paths.get(path, "_graft_manifest.json")
    val expected = manifest(sfDir, planes, dim, k)
    val fresh = java.nio.file.Files.exists(mfPath) &&
      java.nio.file.Files.readString(mfPath) == expected
    if (!fresh) {
      write(emb, vecCol, path, planes, dim, k, seed)
      java.nio.file.Files.writeString(mfPath, expected)
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

  def pqPath(sfDir: String): String = {
    val src = new java.io.File(s"$sfDir/embeddings.parquet")
    val parent = src.getAbsoluteFile.getParentFile
    if (parent != null && parent.canWrite)
      new java.io.File(parent, "embeddings.parquet._graft_pq").toString
    else {
      val root = sys.env.get("GRAFT_INDEX_DIR")
        .getOrElse(System.getProperty("java.io.tmpdir"))
      val sig = java.security.MessageDigest.getInstance("MD5")
        .digest((src.getAbsolutePath + "#pq").getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      new java.io.File(root, s"graft-pqstore-$sig").toString
    }
  }

  private def pqManifest(sfDir: String, m: Int, ksub: Int, seed: Long,
      centroids: Array[Array[Double]]): String = {
    val stamp = sourceStamp(new java.io.File(s"$sfDir/embeddings.parquet"))
    // Fingerprint the IVF centroids the codes are cell-partitioned by:
    // a rebuilt IVF index (different params/seed) must invalidate the PQ
    // artifact too, or q76-style probes would prune the WRONG partitions.
    val cfp = java.security.MessageDigest.getInstance("MD5")
      .digest(centroids.map(_.mkString(",")).mkString(";").getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    // v3: codes carry the IVF `cell` partition column (IVF-PQ layout);
    // manifest pins the k-means seed + the exact centroid set
    s"""{"source_stamp":"$stamp","m":$m,"ksub":$ksub,"seed":$seed,""" +
      s""""centroid_fp":"$cfp","assign":"pq-portable-v3"}"""
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
      centroids: Array[Array[Double]]): Unit = {
    import org.apache.spark.ml.functions.array_to_vector
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
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/codes")
    val json = codebooks.map(_.map(_.mkString("[", ",", "]"))
      .mkString("[", ",", "]")).mkString("[", ",", "]")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path, "_graft_pq_codebooks.json"), json)
  }

  def readPq(spark: SparkSession, path: String): PqIndex = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(
      java.nio.file.Files.readString(
        java.nio.file.Paths.get(path, "_graft_pq_codebooks.json")))
    val cbs = (0 until node.size()).map { mi =>
      val cb = node.get(mi)
      (0 until cb.size()).map { c =>
        val row = cb.get(c)
        Array.tabulate(row.size())(j => row.get(j).asDouble())
      }.toArray
    }.toArray
    PqIndex(spark.read.parquet(s"$path/codes"), cbs,
      cbs.length, cbs(0)(0).length, cbs(0).length)
  }

  def ensurePq(spark: SparkSession, emb: => DataFrame, vecCol: String,
      sfDir: String, m: Int = 8, ksub: Int = 16, seed: Long = 42L): PqIndex = {
    val path = pqPath(sfDir)
    val mfPath = java.nio.file.Paths.get(path, "_graft_pq_manifest.json")
    // the cell layout comes from the SAME IVF index queries probe —
    // one shared centroid set, one portable assignment identity; its
    // fingerprint is part of the manifest, so resolve it first
    val centroids = ensure(spark, emb, vecCol, sfDir).centroids
    val expected = pqManifest(sfDir, m, ksub, seed, centroids)
    val fresh = java.nio.file.Files.exists(mfPath) &&
      java.nio.file.Files.readString(mfPath) == expected
    if (!fresh) {
      writePq(emb, vecCol, path, m, ksub, seed, centroids)
      java.nio.file.Files.writeString(mfPath, expected)
    }
    readPq(spark, path)
  }
}
