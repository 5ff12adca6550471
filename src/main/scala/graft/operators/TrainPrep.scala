package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Training-set preparation operators a 100 TB data pipeline needs beyond
  * the reference's own surface (prompt-mandated extensions, SURVEY §5):
  * deterministic dataset splits and token-budget sequence packing.
  */
object TrainPrep {

  /** Deterministic, engine-portable split assignment: each id hashes to a
    * basis-point bucket via the same 60-bit sha256 prefix used across the
    * engine (TextAnalytics.hash60 — reproducible in any SQL engine, unlike
    * xxhash/murmur seeds), and cumulative weight thresholds name the
    * split. Stable under re-runs, insert-order, partitioning and engine —
    * the property that keeps train/test membership frozen as a 100 TB
    * corpus grows: membership depends only on (id, salt).
    *
    * `weights`: (name, basis points) summing to ≤ 10000; the remainder
    * falls into the last split.
    */
  def assignSplits(
      df: DataFrame, idCol: String, salt: String,
      weights: Seq[(String, Int)]): DataFrame = {
    require(weights.nonEmpty && weights.map(_._2).sum <= 10000,
      "weights are basis points summing to <= 10000")
    val bucket = pmod(
      TextAnalytics.hash60(concat(col(idCol).cast("string"), lit(":" + salt))),
      lit(10000L))
    val thresholds = weights.scanLeft(0)(_ + _._2).tail
    val cases = weights.zip(thresholds).dropRight(1)
    val expr = cases.foldLeft(Option.empty[org.apache.spark.sql.Column]) {
      case (acc, ((name, _), cum)) =>
        Some(acc.fold(when(bucket < cum, name))(_.when(bucket < cum, name)))
    }
    df.withColumn("split",
      expr.fold(lit(weights.last._1))(_.otherwise(weights.last._1)))
  }

  /** Deterministic stratified sample: the first `n` rows of each
    * `groupCol` stratum in engine-portable hash order (the same
    * [[TextAnalytics.hash60]] family as [[assignSplits]]) — the curation
    * primitive that caps over-represented sources in a training mix.
    * Membership depends only on (id, salt, the stratum's other ids):
    * re-runs, partitioning and engine changes keep the same sample, and
    * any SQL engine replays it. One shuffle (the per-stratum window).
    */
  def stratifiedSample(
      df: DataFrame, groupCol: String, idCol: String,
      salt: String, n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(
        TextAnalytics.hash60(concat(col(idCol).cast("string"), lit(":" + salt))),
        col(idCol))
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= n)
  }

  /** Greedy token-budget sequence packing: within each `groupCol` shard,
    * walk items in `orderCol` order and pack them into sequences whose
    * `nTokensCol` totals stay ≤ `budget`; an item alone over budget gets
    * its own sequence. Adds `seq_idx` (sequence ordinal within the group)
    * and `seq_pos` (position within the sequence).
    *
    * Shape at scale: packing is an inherently sequential fold, so it runs
    * as ONE pass per group — `repartition(groupCol)` co-locates each
    * shard, `sortWithinPartitions` fixes the walk order, and mapPartitions
    * streams rows without materializing a group in memory. Everything
    * upstream/downstream stays declarative; the shuffle is the same one a
    * groupBy would pay.
    */
  def packSequences(
      df: DataFrame, groupCol: String, orderCol: String,
      nTokensCol: String, budget: Long): DataFrame = {
    val outSchema = df.schema
      .add("seq_idx", LongType, nullable = false)
      .add("seq_pos", IntegerType, nullable = false)
    val gIdx = df.schema.fieldIndex(groupCol)
    val nIdx = df.schema.fieldIndex(nTokensCol)
    df.repartition(col(groupCol))
      .sortWithinPartitions(col(groupCol), col(orderCol))
      .mapPartitions { rows =>
        var curGroup: Any = null
        var first = true
        var seqIdx = 0L
        var seqPos = 0
        var curTokens = 0L
        rows.map { row =>
          val g = row.get(gIdx)
          val n = row.getLong(nIdx)
          if (first || g != curGroup) {
            curGroup = g; first = false
            seqIdx = 0L; seqPos = 0; curTokens = n
          } else if (curTokens + n > budget) {
            seqIdx += 1; seqPos = 0; curTokens = n
          } else {
            seqPos += 1; curTokens += n
          }
          Row.fromSeq(row.toSeq :+ seqIdx :+ seqPos)
        }
      }(Encoders.row(outSchema))
  }

  /** Token-balanced training shards — stratified boustrophedon dealing.
    *
    * Hash assignment ([[graft.queries.PipelineCatalog q86]] shape)
    * balances document COUNTS; shard token totals then drift with the
    * doc-length mix. Greedy LPT bin-packing balances best but is
    * inherently sequential. The distributed middle ground: stratify docs
    * into log2 size classes, sub-split each class by a portable hash so
    * no rank window sees more than |class|/subSplits rows (the no-global-
    * rank rule — a single-partition window is the canonical scale
    * killer), then deal each (class, sub) stratum across shards snake-
    * wise (boustrophedon) by within-stratum rank from a stratum-hashed
    * starting shard. Every stratum hands each shard an equal share ±1 of
    * its size class, so shard token totals differ by O(strata · class
    * width), independent of corpus size. Deterministic in (ids, token
    * counts) only — partition-order-proof and engine-replayable.
    */
  def balancedShards(
      docs: DataFrame, idCol: String, nTokensCol: String,
      nShards: Int, subSplits: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nt = greatest(col(nTokensCol).cast("long"), lit(1L))
    val sized = docs.select(col(idCol), col(nTokensCol),
      floor(log2(nt)).cast("long").as("size_class"),
      pmod(TextAnalytics.hash60(col(idCol).cast("string")),
        lit(subSplits.toLong)).as("stratum"))
    val w = Window.partitionBy(col("size_class"), col("stratum"))
      .orderBy(col(nTokensCol).desc, col(idCol))
    val start = pmod(TextAnalytics.hash60(
        concat_ws("#", col("size_class"), col("stratum"))),
      lit(nShards.toLong))
    val r = row_number().over(w) - 1
    val cycle = (r / nShards).cast("long")
    val k = pmod(r, lit(nShards))
    val idx = when(pmod(cycle, lit(2L)) === 0, k).otherwise(lit(nShards - 1) - k)
    sized.withColumn("shard", pmod(start + idx, lit(nShards.toLong)).cast("long"))
  }
}
