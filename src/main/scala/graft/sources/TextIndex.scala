package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BM25 serving artifact persisted at WRITE time and maintained
  * INCREMENTALLY at upsert — the text analog of [[VectorStore]]
  * (reference: the Qdrant content text index is built at upsert and
  * updated per point batch, `worker/app/services/qdrant_client.py:206-297`
  * index creation, `:303-407` upsert; it never rebuilds the collection on
  * new data — neither does this store).
  *
  * `SearchOps.bm25Scores` recomputes corpus stats and postings per call —
  * fine as the oracle path, wrong as a serving path at 100 TB (every
  * query re-tokenizes the corpus). This store materializes, once per
  * corpus, and then maintains per delta batch:
  *
  *   path/postings/term_bucket=<b>/…  — (term, doc, dl, tf, gen),
  *       partitioned by a 64-way portable term-hash bucket and sorted by
  *       term within each file: a query's literal terms map to ≤|terms|
  *       buckets (partition pruning at the source) and the in-file sort
  *       gives parquet row-group min/max skipping on `term`. `gen` is the
  *       segment generation the row was written in (0 = initial build).
  *   path/doclens/doc_bucket=<b>/…    — (doc, dl, gen): one row per doc
  *       VERSION, the delta-sized bookkeeping table an upsert consults to
  *       find replaced/deleted docs' lengths (never the postings, never
  *       the corpus).
  *   path/_graft_stats.json           — {n, sum_dl, gen} as EXACT
  *       integers, adjusted incrementally (avgdl derives as one double
  *       division, identical to the inline path's sum/count).
  *
  * Epoch pointer, (doc, gen) tombstones + the size-gated liveRows filter,
  * crash-redo of partial segments, policy-triggered compaction, the
  * manifest gate and the sidecar IO discipline are all [[GenStore]]'s —
  * this file owns only the postings/doclens layout and the exact-integer
  * stats arithmetic.
  *
  * Per-term document frequency is NOT stored: df for a query term is
  * `countDistinct(doc)` over that term's LIVE postings — the rows the
  * query already reads — so it stays exact under any upsert/delete
  * history at zero extra scan cost. (A stored df table cannot be
  * delta-maintained without knowing a replaced doc's OLD terms, which
  * would force a postings scan per upsert.)
  *
  * A serving query therefore reads O(matching postings) bytes + the
  * (small) tombstone list; an UPSERT reads O(delta) + the doc-bucket
  * rows of the affected ids in `doclens` — at no point does maintenance
  * re-tokenize or re-scan the unchanged corpus. Tombstones accumulate
  * with churn; [[compact]] folds them back to a clean gen-0 layout.
  */
object TextIndex {

  val TermBuckets = 64
  val DocBuckets = 64

  case class Index(postings: DataFrame, df: DataFrame, n: Long, sumDl: Long) {
    def avgdl: Double = sumDl.toDouble / n
  }

  /** Compaction triggers — the shared [[GenStore.Policy]] record; this
    * store arms the segment-count and dead-fraction triggers (it tracks
    * an EXACT dead-version count in its stats, a tighter signal than
    * tombstone bytes).
    */
  type Policy = GenStore.Policy
  val Policy: GenStore.Policy.type = GenStore.Policy

  /** Portable term bucket: first 60 bits of sha256, mod 64 — the same
    * `hash60` family every other persisted layout uses, JVM-computable
    * for literal query terms ([[bucketOf]]) so probes are plain literals.
    */
  def termBucketCol(term: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(graft.operators.TextAnalytics.hash60(term), lit(TermBuckets.toLong))

  def bucketOf(term: String): Long = {
    val h = graft.functions.Sha256.hash60(term.getBytes("UTF-8"))
    java.lang.Math.floorMod(h, TermBuckets.toLong)
  }

  /** Doc-id bucket for the doclens bookkeeping table: an upsert's
    * affected-id frame joins on (doc_bucket, doc), so dynamic partition
    * pruning restricts the lookup to the buckets the delta actually
    * touches.
    */
  def docBucketCol(doc: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(graft.operators.TextAnalytics.hash60(doc.cast("string")), lit(DocBuckets.toLong))

  def indexPath(sfDir: String): String =
    GenStore.artifactPath(sfDir, "documents.parquet", "_graft_text_index",
      "graft-tindex")

  private def manifest(sfDir: String): String = {
    val stamp = GenStore.sourceStamp(new java.io.File(s"$sfDir/documents.parquet"))
    // tokenizer contract is part of the layout version: postings written
    // under a different tokenization must rebuild, not silently mis-score
    // seg-v4: gen is a top-level partition directory (gen=N/term_bucket=B/)
    // so a crashed upsert's partial segment is deletable wholesale — the
    // piece that makes the batch-replay guard crash-atomic
    // seg-v5: tables live under an atomic-pointer-committed epoch dir
    s"""{"source_stamp":"$stamp","term_buckets":$TermBuckets,"tokenize":"ws-split-v2","layout":"seg-v5"}"""
  }

  // --- stats sidecar (exact integers; gen = last segment written;
  //     dead_n = dead doc VERSIONS awaiting compaction — each upsert
  //     tombstones exactly the live versions it replaces/deletes, so the
  //     count maintains incrementally with no scan) --------------------

  private def statsPath(path: String) =
    java.nio.file.Paths.get(path, "_graft_stats.json")

  private def writeStats(path: String, n: Long, sumDl: Long, gen: Long,
      lastBatch: Long = -1L, deadN: Long = 0L): Unit =
    GenStore.atomicWrite(statsPath(path),
      s"""{"n":$n,"sum_dl":$sumDl,"gen":$gen,"last_batch":$lastBatch,"dead_n":$deadN}""")

  private def readStats(path: String): (Long, Long, Long, Long) = {
    val s = readStatsFull(path)
    (s._1, s._2, s._3, s._4)
  }

  /** Streaming replay watermark (−1 when never batch-stamped). */
  private[graft] def lastBatchId(path: String): Long = readStatsFull(path)._4

  private def readStatsFull(path: String): (Long, Long, Long, Long, Long) =
    GenStore.readSidecar(statsPath(path)).map { node =>
      (GenStore.jLong(node, "n", 0L), GenStore.jLong(node, "sum_dl", 0L),
        GenStore.jLong(node, "gen", 0L), GenStore.jLong(node, "last_batch", -1L),
        GenStore.jLong(node, "dead_n", 0L))
    }.getOrElse((0L, 0L, 0L, -1L, 0L))

  /** Run [[compact]] iff the recorded policy says the artifact crossed
    * its churn budget. Driver-side metadata decision only (no job);
    * serving state is compaction-invariant (spec-pinned), so the trigger
    * can fire inside any upsert, including a streaming micro-batch.
    */
  private def maybeCompact(spark: SparkSession, path: String): Unit = {
    val (n, _, gen, _, deadN) = readStatsFull(path)
    val p = GenStore.readPolicy(path)
    val deadFrac =
      if (n + deadN <= 0L) 0.0 else deadN.toDouble / (n + deadN).toDouble
    if (gen >= p.maxSegments || deadFrac >= p.maxDeadFraction)
      compact(spark, path)
  }

  def exists(path: String): Boolean =
    java.nio.file.Files.exists(statsPath(path))

  // --- tokenize + shared delta frames -----------------------------------

  /** `(doc, toks, dl)` under the ws-split-v2 contract — the ONLY
    * tokenization in the store; write and upsert both go through it.
    */
  private def tokenized(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
        col(idCol).as("doc"),
        graft.operators.TextAnalytics.tokens(col(textCol)).as("toks"))
      .select(col("doc"), col("toks"), size(col("toks")).cast("long").as("dl"))

  /** Postings rows for one segment — reads NOTHING but `withDl`'s own
    * lineage (test-guarded: an index update must not scan the base
    * postings or the unchanged corpus).
    */
  private[graft] def segmentPostings(withDl: DataFrame, gen: Long): DataFrame =
    withDl
      .select(col("doc"), col("dl"), explode(col("toks")).as("term"))
      .groupBy(col("term"), col("doc"), col("dl"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("gen", lit(gen))
      .withColumn("term_bucket", termBucketCol(col("term")))

  private def segmentDoclens(withDl: DataFrame, gen: Long): DataFrame =
    withDl.select(col("doc"), col("dl"))
      .withColumn("gen", lit(gen))
      .withColumn("doc_bucket", docBucketCol(col("doc")))

  private def writeSegment(withDl: DataFrame, gen: Long, path: String,
      mode: String, epoch: Long): Unit = {
    // overwrite here means FULL replace — pin static per-writer so a
    // session-level dynamic overwrite mode cannot leave dead partitions
    segmentPostings(withDl, gen)
      .repartition(col("term_bucket"))
      .sortWithinPartitions(col("term_bucket"), col("term"))
      .write.mode(mode).option("partitionOverwriteMode", "static")
      .partitionBy("gen", "term_bucket")
      .parquet(s"$path/postings/e$epoch")
    GenStore.CrashPoints.hit("postings-segment-written")
    segmentDoclens(withDl, gen)
      .repartition(col("doc_bucket"))
      .write.mode(mode).option("partitionOverwriteMode", "static")
      .partitionBy("gen", "doc_bucket")
      .parquet(s"$path/doclens/e$epoch")
  }

  private def liveRows(spark: SparkSession, path: String, rows: DataFrame): DataFrame =
    GenStore.liveRows(spark, path, rows, rowKey = "doc", tombCol = "doc",
      maxGen = GenStore.committedGen(statsPath(path)))

  /** The LIVE doclens rows of the affected ids — the upsert's only read
    * of pre-existing state: (doc_bucket, doc) equi-join so partition
    * pruning bounds it by the delta's bucket spread, never the corpus.
    */
  private[graft] def liveAffectedDoclens(spark: SparkSession, path: String,
      affected: DataFrame): DataFrame = {
    val keyed = affected.select(col("doc"))
      .withColumn("doc_bucket", docBucketCol(col("doc")))
    liveRows(spark, path, GenStore.seg(spark, GenStore.tableDir(path, "doclens")))
      .join(broadcast(keyed), Seq("doc_bucket", "doc"))
  }

  /** One tokenize pass over the corpus → postings + doclens + stats, all
    * at generation 0. The only corpus-wide work, paid at write time (the
    * reference pays the same cost inside Qdrant's upsert-time indexing).
    */
  def write(docs: DataFrame, idCol: String, textCol: String, path: String,
      batchId: Long = -1L, policy: Policy = Policy()): Unit = {
    // a rebuild must not reset the streaming replay watermark (same
    // contract as VectorStore.write)
    val prevLast = if (exists(path)) readStats(path)._4 else -1L
    // full rebuilds land in the NEXT epoch and commit via the atomic
    // pointer flip — a crash mid-rebuild leaves the old epoch serving,
    // and the flip retires old segments AND old tombstones together
    val next = GenStore.epochOf(path) + 1
    val withDl = tokenized(docs, idCol, textCol)
    val stats = withDl.agg(
      count(lit(1)).as("n"), coalesce(sum(col("dl")), lit(0L)).as("sum_dl")).head()
    writeSegment(withDl, gen = 0L, path, mode = "overwrite", epoch = next)
    GenStore.setEpoch(path, next)
    GenStore.writePolicy(path, policy)
    writeStats(path, stats.getLong(0), stats.getLong(1), gen = 0L,
      if (batchId >= 0) batchId else prevLast)
    GenStore.gcEpochs(path, Seq("postings", "doclens", "tombstones"), next)
  }

  /** Incremental maintenance: merge a delta of new/changed documents and
    * a set of deleted ids into the stored index WITHOUT touching the
    * unchanged corpus — the q54 skip-unchanged contract extended to the
    * serving artifact.
    *
    * Reads: the delta itself (tokenized once) and the affected ids' rows
    * in `doclens` (bucket-joined). Writes: one appended postings/doclens
    * segment at the next generation, tombstones for the replaced/deleted
    * live versions, and the stats sidecar adjusted by exact integer
    * arithmetic (n/Σdl: − removed live versions + delta). Changed docs
    * are tombstone-then-readd at the same generation; `delta` must be
    * unique on `idCol`.
    */
  def upsert(spark: SparkSession, delta: DataFrame, idCol: String,
      textCol: String, deletedIds: DataFrame, path: String,
      batchId: Long = -1L): Unit = {
    val (n0, sumDl0, gen0, lastBatch, dead0) = readStatsFull(path)
    // foreachBatch replay safety: a restarted stream re-delivers the last
    // uncommitted batch; re-appending its postings would DOUBLE every tf.
    // Tracked batch ids make the upsert idempotent (the standard
    // idempotent-sink pattern); ad-hoc callers pass no id and always apply.
    if (batchId >= 0 && batchId <= lastBatch) return
    val nextGen = gen0 + 1
    // crash atomicity: stats (carrying the watermark) are written LAST,
    // so a crash mid-append leaves lastBatch at its old value and the
    // replay re-enters here — delete the partial gen=N directories first
    // and the redo runs against the exact pre-batch state (liveRows and
    // liveAffectedDoclens see no gen-N rows after the cleanup)
    GenStore.dropPartialGen(spark, path,
      Seq("postings", "doclens", "tombstones"), nextGen)
    // materialize the delta tokenization once: it feeds stats, tombstone
    // lookup, postings AND doclens (and must not be recomputed after the
    // appends below start changing what the path contains)
    val withDl = tokenized(delta, idCol, textCol).localCheckpoint()
    val dStats = withDl.agg(
      count(lit(1)).as("n"), coalesce(sum(col("dl")), lit(0L)).as("s")).head()
    val affected = withDl.select(col("doc"))
      .unionByName(deletedIds.select(col(deletedIds.columns.head).as("doc")))
      .distinct()
    val liveOld = liveAffectedDoclens(spark, path, affected)
      .select(col("doc"), col("dl"))
      .localCheckpoint() // snapshot BEFORE appending to doclens
    val rStats = liveOld.agg(
      count(lit(1)).as("n"), coalesce(sum(col("dl")), lit(0L)).as("s")).head()
    // changed docs are tombstoned at the SAME generation their new rows
    // carry, so the new version survives the strictly-below filter
    GenStore.appendTombstones(path, liveOld.select(col("doc")),
      tombCol = "doc", gen = nextGen)
    writeSegment(withDl, nextGen, path, mode = "append",
      epoch = GenStore.epochOf(path))
    writeStats(path,
      n0 - rStats.getLong(0) + dStats.getLong(0),
      sumDl0 - rStats.getLong(1) + dStats.getLong(1),
      nextGen, if (batchId >= 0) batchId else lastBatch,
      dead0 + rStats.getLong(0))
    // zero-touch maintenance: fold back to gen-0 when the policy says
    // churn crossed its budget (bounded segments + tombstones forever)
    maybeCompact(spark, path)
  }

  /** Fold accumulated segments + tombstones back into a clean gen-0
    * layout (the LSM compaction step — run by the policy trigger when
    * churn crosses its budget; serving correctness never depends on it).
    * The folded tables land in the NEXT epoch and the atomic pointer
    * flip commits them: there is no window where stale tombstones can
    * kill freshly folded rows, and a crash mid-fold leaves the old
    * epoch serving untouched.
    */
  def compact(spark: SparkSession, path: String): Unit = {
    val (n, sumDl, _, lastBatch) = readStats(path)
    val next = GenStore.epochOf(path) + 1
    val live = liveRows(spark, path,
      GenStore.seg(spark, GenStore.tableDir(path, "postings")))
      .localCheckpoint()
    val doclens = liveRows(spark, path,
      GenStore.seg(spark, GenStore.tableDir(path, "doclens")))
      .localCheckpoint()
    // writeTable keeps a fully-emptied index readable (GenStore r10 note)
    GenStore.writeTable(live.withColumn("gen", lit(0L)),
      "term_bucket", Seq("gen", "term_bucket"),
      Seq("term_bucket", "term"), s"$path/postings/e$next")
    GenStore.writeTable(doclens.withColumn("gen", lit(0L)),
      "doc_bucket", Seq("gen", "doc_bucket"),
      Nil, s"$path/doclens/e$next")
    GenStore.setEpoch(path, next)
    writeStats(path, n, sumDl, gen = 0L, lastBatch)
    GenStore.gcEpochs(path, Seq("postings", "doclens", "tombstones"), next)
  }

  def read(spark: SparkSession, path: String): Index = {
    val (n, sumDl, _, _) = readStats(path)
    val postings = liveRows(spark, path,
      GenStore.seg(spark, GenStore.tableDir(path, "postings")))
    // df as a view over LIVE postings: a filter on (term_bucket, term) —
    // both grouping keys — pushes below the aggregate to the pruned scan,
    // so a query's df costs the same rows it already reads for tf
    val df = postings
      .groupBy(col("term_bucket"), col("term"))
      .agg(countDistinct(col("doc")).as("df"))
    Index(postings, df, n, sumDl)
  }

  /** Load the index for a corpus, building it first if absent or stale —
    * index-at-ingest for the dev loop, same contract as
    * [[VectorStore.ensure]].
    */
  def ensure(spark: SparkSession, docs: => DataFrame, idCol: String,
      textCol: String, sfDir: String): Index = {
    val path = indexPath(sfDir)
    GenStore.ensureFresh(path, manifest(sfDir)) {
      write(docs, idCol, textCol, path)
    }
    read(spark, path)
  }
}
