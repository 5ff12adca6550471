package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: time one catalog query N times at a given sfDir under the
  * SAME session config as Bench, optionally dumping the executed plan —
  * for chasing per-query regressions (e.g. the round-2 q03 delta) without
  * a full bench run.
  *
  * Usage: runMain graft.tools.QueryTime <name> [sfDir] [reps] [plan]
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 5
    val showPlan = args.contains("plan")
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("GRAFT_QT_INIT_PARTS", (cpus.toInt * 8).toString))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Time construction + materialization, matching Bench's definition:
    // store-backed lineages do EAGER work at construction (manifest checks,
    // candidate localCheckpoints) — r10 found q97 "0.5 s" under the old
    // materialize-only timing vs its honest 3.4 s with construction
    // included. The construction share is printed so the split stays
    // visible.
    def run(): (Double, Double) = {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val tc = (System.nanoTime() - t0) / 1e9
      val h = xxhash64(df.columns.map(col).toIndexedSeq: _*)
      df.select(h.as("h")).agg(expr("bit_xor(h)")).head()
      ((System.nanoTime() - t0) / 1e9, tc)
    }
    val runs = (1 to reps).map(_ => run())
    val times = runs.map(_._1)
    println(f"$name: ${runs.map { case (t, c) => f"$t%.2f(c$c%.2f)" }.mkString(" ")} " +
      f"(min ${times.min}%.2f)")
    if (showPlan) {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val h = xxhash64(df.columns.map(col).toIndexedSeq: _*)
      val agg = df.select(h.as("h")).agg(expr("bit_xor(h)"))
      agg.head()
      println(agg.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
