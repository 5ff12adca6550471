package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Write-time LEARNED quality-classifier artifact (the fastText/GPT-3-shaped
  * logistic regression q67 serves): training happens ONCE at index time and
  * the coefficients persist beside the table they score — the exact contract
  * [[graft.sources.VectorStore.ensure]] gives IVF centroids. Serving is a
  * single narrow pass against the stored literals; the 5-Newton-step IRLS
  * fit (5 corpus scans + 5 Hessian shuffles) never runs in query wall-time.
  *
  * The reference trains no model (its quality gates are rules —
  * worker/app/services/chunker.py normalization + size thresholds); this is
  * the pipeline-extension operator family, built on the public recipe shape:
  * GPT-3's LR-on-hashed-bags filter, CCNet/LLaMA retrains of the same.
  *
  * Layout on disk (beside the scored table, tmp-dir fallback when read-only):
  *   <documents.parquet>._graft_qc/_graft_qc_weights.json  — (B+2) doubles
  *   .../_graft_qc_manifest.json — source stamp + hyperparams + version
  *   .../_graft_qc_quality.json  — train-time mean log-loss + delta accum
  *
  * Staleness has the same two triggers as PQ ([[graft.sources.VectorStore
  * .retrainPqIfStale]]): VOLUME (appended fraction of the training corpus)
  * and QUALITY (appended rows' mean log-loss under the frozen weights vs
  * the training-time mean — the signal that catches a topic/language shift
  * hiding inside a small delta: predictions stay valid Doubles under any
  * drift, they just silently stop separating keep from drop).
  *
  * Training is bit-deterministic under any partitioning: gradient and
  * Hessian components accumulate as DECIMAL(38,18) (exact, order-free),
  * the driver solve is fixed-order Gaussian elimination, and the weights
  * round-trip the JSON sidecar exactly (shortest-round-trip doubles).
  * Serving from just-trained and from re-read weights is therefore
  * byte-identical — the q67 oracle is authored from the same literals.
  */
object QualityModel {

  /** Hash buckets (feature dims = B + length feature + bias). */
  val B = 64
  /** Rule-gate threshold distilled into silver labels (q22's score). */
  val Tau = 0.42
  /** IRLS steps — Newton converges in a few on this well-conditioned fit. */
  val Iters = 5
  /** ×N ridge: bounds near-separable weights. */
  val Ridge = 1e-3
  val Dim: Int = B + 2

  /** Artifact version: bump when the feature map or label rule changes, so
    * weights written by an older build retrain instead of silently scoring
    * with a mismatched feature space.
    */
  private val Version = "qc-v1"

  // ---------------------------------------------------------------------
  // Paths + sidecars
  // ---------------------------------------------------------------------

  /** GRAFT_INDEX_DIR/tmpdir keyed by the documents table's path (beside
    * the table only with the explicit GRAFT_INDEX_BESIDE opt-in) —
    * [[graft.sources.GenStore.artifactPath]]'s resolution.
    */
  def modelPath(sfDir: String): String =
    graft.sources.GenStore.artifactPath(sfDir, "documents.parquet",
      "_graft_qc", "graft-qc")

  private def manifest(sfDir: String): String = {
    val stamp = graft.sources.GenStore.sourceStamp(
      new java.io.File(s"$sfDir/documents.parquet"))
    s"""{"version":"$Version","stamp":"$stamp","b":$B,"tau":$Tau,"iters":$Iters,"ridge":$Ridge}"""
  }

  private def weightsFile(path: String) =
    java.nio.file.Paths.get(path, "_graft_qc_weights.json")
  private def manifestFile(path: String) =
    java.nio.file.Paths.get(path, "_graft_qc_manifest.json")
  private def qualityFile(path: String) =
    java.nio.file.Paths.get(path, "_graft_qc_quality.json")

  private def atomicWrite(p: java.nio.file.Path, s: String): Unit =
    graft.sources.GenStore.atomicWrite(p, s)

  /** Weights serialize via Double.toString (shortest round-trip repr) and
    * parse back bit-exactly — serving from disk ≡ serving from the fit.
    */
  private def writeWeights(path: String, w: Array[Double]): Unit =
    atomicWrite(weightsFile(path), w.map(_.toString).mkString("[", ",", "]"))

  def readWeights(path: String): Option[Array[Double]] =
    graft.sources.GenStore.readSidecar(weightsFile(path)).map(node =>
      Array.tabulate(node.size())(i => node.get(i).asDouble()))

  private def writeQuality(path: String, baseLoss: Double, baseN: Long,
      deltaLossSum: Double, deltaN: Long): Unit =
    atomicWrite(qualityFile(path),
      s"""{"base_loss":$baseLoss,"base_n":$baseN,"delta_loss_sum":$deltaLossSum,"delta_n":$deltaN}""")

  private[graft] def readQuality(path: String): (Double, Long, Double, Long) = {
    import graft.sources.GenStore.{jDouble, jLong, readSidecar}
    readSidecar(qualityFile(path)).map { node =>
      (jDouble(node, "base_loss", 0.0), jLong(node, "base_n", 0L),
        jDouble(node, "delta_loss_sum", 0.0), jLong(node, "delta_n", 0L))
    }.getOrElse((0.0, 0L, 0.0, 0L))
  }

  /** Appended fraction of the training corpus — the volume trigger. */
  def driftFraction(path: String): Double = {
    val (_, baseN, _, dN) = readQuality(path)
    if (baseN <= 0L) 0.0 else dN.toDouble / baseN
  }

  /** Appended rows' mean log-loss under the FROZEN weights over the
    * training-time mean. 1.0 = the model separates new data exactly as
    * well as its training corpus; past taste (default 1.5) = the incoming
    * distribution drifted and keep/drop precision is silently degrading.
    */
  def qualityRatio(path: String): Double = {
    val (base, _, dSum, dN) = readQuality(path)
    if (dN <= 0L || base <= 0.0) 1.0 else (dSum / dN) / base
  }

  // ---------------------------------------------------------------------
  // Feature map (shared verbatim by training, serving, drift accumulation
  // and the DuckDB oracle replay)
  // ---------------------------------------------------------------------

  private def bucketOf(t: Column): Column =
    (TextAnalytics.hash60(t) % B).cast("int")

  /** Silver labels: the q22 rule-based score, thresholded at [[Tau]]. */
  private def ruleScore: Column =
    lit(0.2) * least(col("n").cast("double") / 100.0, lit(1.0)) +
      lit(0.5) * (col("stop_hits").cast("double") / col("n")) +
      lit(0.3) * (lit(1.0) - least(
        abs(col("total_len").cast("double") / col("n") - 5.0) / 10.0, lit(1.0)))

  /** Per-doc feature frame: (doc_id, lang, y, n, counts[B]) — ONE narrow
    * pass over the corpus; bucket counts via a bounded array fold.
    */
  def features(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", TextAnalytics.tokens(col("text")))
      .withColumn("bs", transform(col("toks"), bucketOf _))
      .withColumn("n", size(col("bs")))
      .filter(col("n") > 0)
      .withColumn("total_len", TextAnalytics.totalTokenChars(col("toks")))
      .withColumn("stop_hits",
        TextAnalytics.wordListHits(col("toks"), TextAnalytics.EnStopwords))
      .withColumn("y", (ruleScore >= Tau).cast("int"))
      .withColumn("counts",
        transform(sequence(lit(0), lit(B - 1)),
          b => size(filter(col("bs"), x => x === b))))
      .select(col("doc_id"), col("lang"), col("y"), col("n"), col("counts"))

  /** Present features per doc, ascending index: token buckets (x = c/n),
    * then the length feature b=B, then bias b=B+1 — term set and order
    * exactly mirror the oracle's `sum(w*x ORDER BY b)`.
    */
  def xsCol: Column = {
    val idx = sequence(lit(0), lit(B - 1))
    concat(
      filter(zip_with(col("counts"), idx,
        (c, b) => struct(b.as("b"), (c / col("n").cast("double")).as("x"))),
        p => p.getField("x") > 0.0),
      array(
        struct(lit(B).as("b"),
          least(col("n").cast("double") / 100.0, lit(1.0)).as("x")),
        struct(lit(B + 1).as("b"), lit(1.0).as("x"))))
  }

  /** Ordered dot product of the sparse features against weight literals. */
  def zCol(w: Array[Double]): Column = {
    val wLut = array(w.toIndexedSeq.map(lit): _*)
    aggregate(xsCol, lit(0.0), (acc, p) =>
      acc + element_at(wLut, p.getField("b") + 1) * p.getField("x"))
  }

  // ---------------------------------------------------------------------
  // Training (write-time only)
  // ---------------------------------------------------------------------

  /** Distributed IRLS over a materialized feature frame. Each Newton step
    * is ONE fused gradient+Hessian job: the second generator explodes only
    * the upper triangle (p2.b ≥ p1.b, filtered BEFORE the explode) plus a
    * sentinel b2 = −1 element per p1 row carrying the gradient term — both
    * aggregations ride one scan with map-side combine over ≤(B+2)² keys.
    * DECIMAL(38,18) accumulators make the cross-row sums exact and
    * order-independent; the driver solve is (B+2)³ flops of fixed-order
    * partial-pivot Gaussian elimination — training is bit-deterministic
    * under any partitioning.
    */
  def train(feats: DataFrame, nDocs: Double): Array[Double] = {
    val w = new Array[Double](Dim)
    val lambda = Ridge * nDocs
    for (_ <- 1 to Iters) {
      val base = feats
        .withColumn("z", zCol(w))
        .withColumn("mu", lit(1.0) / (lit(1.0) + exp(-col("z"))))
        .withColumn("sd", col("mu") - col("y"))
        .withColumn("r", col("mu") * (lit(1.0) - col("mu")))
        .withColumn("xs", xsCol)
      val gh = base.select(col("sd"), col("r"), explode(col("xs")).as("p1"), col("xs"))
        .select(col("sd"), col("r"), col("p1"),
          explode(concat(
            filter(col("xs"), p2 => p2.getField("b") >= col("p1.b")),
            array(struct(lit(-1).as("b"), lit(0.0).as("x"))))).as("p2"))
        .groupBy(col("p1.b").as("b1"), col("p2.b").as("b2"))
        .agg(sum(when(col("p2.b") === -1, col("sd") * col("p1.x"))
          .otherwise(col("r") * col("p1.x") * col("p2.x"))
          .cast("decimal(38,18)")).as("s"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getDecimal(2).doubleValue())
        .toMap
      val g = gh.collect { case ((b1, -1), v) => b1 -> v }
      val h = gh.filter(_._1._2 >= 0)
      val a = Array.tabulate(Dim, Dim)((i, j) =>
        h.getOrElse((math.min(i, j), math.max(i, j)), 0.0) +
          (if (i == j) lambda else 0.0))
      val rhs = Array.tabulate(Dim)(i => g.getOrElse(i, 0.0))
      for (p <- 0 until Dim) {
        var best = p
        for (i <- p + 1 until Dim)
          if (math.abs(a(i)(p)) > math.abs(a(best)(p))) best = i
        val tr = a(p); a(p) = a(best); a(best) = tr
        val tb = rhs(p); rhs(p) = rhs(best); rhs(best) = tb
        for (i <- p + 1 until Dim) {
          val f = a(i)(p) / a(p)(p)
          for (j <- p until Dim) a(i)(j) -= f * a(p)(j)
          rhs(i) -= f * rhs(p)
        }
      }
      val delta = new Array[Double](Dim)
      for (i <- Dim - 1 to 0 by -1) {
        var acc = rhs(i)
        for (j <- i + 1 until Dim) acc -= a(i)(j) * delta(j)
        delta(i) = acc / a(i)(i)
      }
      for (b <- 0 until Dim) w(b) -= delta(b)
    }
    w
  }

  /** (Σ log-loss, row count) of the stored weights over a feature frame —
    * exact DECIMAL accumulation so the train-time base and every delta are
    * comparable regardless of partitioning. Clamped at 1e-12 to keep a
    * perfectly-separated doc from yielding ±Inf.
    */
  private def logLossSum(feats: DataFrame, w: Array[Double]): (Double, Long) = {
    val r = feats
      .withColumn("z", zCol(w))
      .withColumn("mu",
        greatest(least(lit(1.0) / (lit(1.0) + exp(-col("z"))),
          lit(1.0 - 1e-12)), lit(1e-12)))
      .agg(
        sum((-(col("y") * log(col("mu")) +
          (lit(1) - col("y")) * log(lit(1.0) - col("mu"))))
          .cast("decimal(38,18)")).as("loss"),
        count(lit(1)).as("n"))
      .head()
    (r.getDecimal(0).doubleValue(), r.getLong(1))
  }

  /** Train on `docs` and commit the artifact: weights, manifest, quality
    * sidecar (train-time mean log-loss as the drift base, delta counters
    * reset). The feature frame is checkpointed once for all IRLS steps.
    */
  def write(docs: DataFrame, path: String, expectedManifest: String): Array[Double] = {
    val feats = features(docs).localCheckpoint()
    val nDocs = feats.count().toDouble
    val w = train(feats, nDocs)
    val (loss, n) = logLossSum(feats, w)
    writeWeights(path, w)
    writeQuality(path, if (n > 0) loss / n else 0.0, n, 0.0, 0L)
    // manifest commits LAST: a crash mid-write leaves no manifest and the
    // next ensure retrains instead of serving half an artifact
    atomicWrite(manifestFile(path), expectedManifest)
    w
  }

  /** Serve-or-train: returns the stored coefficients, training exactly
    * once per (source stamp, hyperparams) — the IVF-centroid contract.
    * `docs` is by-name and untouched on the fresh path.
    */
  def ensure(spark: SparkSession, docs: => DataFrame, sfDir: String): Array[Double] = {
    val path = modelPath(sfDir)
    val expected = manifest(sfDir)
    val fresh = java.nio.file.Files.exists(manifestFile(path)) &&
      java.nio.file.Files.readString(manifestFile(path)) == expected
    if (fresh) readWeights(path).getOrElse(write(docs, path, expected))
    else write(docs, path, expected)
  }

  /** Accumulate an appended slice's log-loss under the FROZEN weights into
    * the quality sidecar — one narrow pass over the delta, the same shape
    * as VectorStore.upsertPqCodes' reconstruction-error accumulation.
    */
  def accumulateDelta(delta: DataFrame, sfDir: String): Unit = {
    val path = modelPath(sfDir)
    readWeights(path).foreach { w =>
      val (lossSum, n) = logLossSum(features(delta), w)
      val (base, baseN, dSum, dN) = readQuality(path)
      writeQuality(path, base, baseN, dSum + lossSum, dN + n)
    }
  }

  /** Quality-triggered retrain — the classifier twin of
    * [[graft.sources.VectorStore.retrainPqIfStale]]: refit when EITHER the
    * appended fraction passes `driftThreshold` OR the appended rows' mean
    * log-loss passes `qualityThreshold` × the training-time mean. Returns
    * whether a retrain ran; a retrain resets both counters.
    */
  def retrainIfStale(spark: SparkSession, docs: => DataFrame, sfDir: String,
      driftThreshold: Double = 0.2, qualityThreshold: Double = 1.5): Boolean = {
    val path = modelPath(sfDir)
    if (driftFraction(path) <= driftThreshold &&
        qualityRatio(path) <= qualityThreshold) false
    else {
      write(docs, path, manifest(sfDir))
      true
    }
  }
}
