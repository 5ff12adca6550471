package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Convergence properties of the connected-components canonicalizer
  * (q75's engine). The pointer-jumping hop must make long chains — the
  * shape versioned/re-crawled documents produce — converge in
  * O(log diameter) rounds, and a genuine non-convergence must THROW
  * instead of silently returning split clusters.
  */
class DedupClusterSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("200-long chain converges within default maxIters (pointer jumping)") {
    import spark.implicits._
    // a single path 0-1-2-…-200: diameter 200 >> maxIters 20, so plain
    // neighbour propagation alone could NOT converge — label-of-label
    // halves the chains each round (~8 rounds for 200 nodes)
    val pairs = (0 until 200).map(i => (i.toLong, i + 1L)).toDF("a_id", "b_id")
    val out = Dedup.duplicateClusters(pairs, "a_id", "b_id").collect()
    assert(out.length == 201)
    assert(out.forall(_.getLong(1) == 0L), "all nodes must label to min node 0")
    assert(out.count(_.getBoolean(2)) == 1, "exactly one canonical survivor")
  }

  test("disjoint components keep distinct min-labels") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 20L))
      .toDF("a_id", "b_id")
    val out = Dedup.duplicateClusters(pairs, "a_id", "b_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("non-convergence at maxIters throws instead of returning wrong labels") {
    import spark.implicits._
    val pairs = (0 until 40).map(i => (i.toLong, i + 1L)).toDF("a_id", "b_id")
    // maxIters=1 cannot settle a 40-chain even with jumping
    val err = intercept[IllegalStateException](
      Dedup.duplicateClusters(pairs, "a_id", "b_id", maxIters = 1).collect())
    assert(err.getMessage.contains("not converged"), err.getMessage)
  }
}
