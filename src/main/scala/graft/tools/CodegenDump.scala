package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic: dump the whole-stage generated code of one catalog query
  * (per-stage sizes + full source to a file) — for chasing Janino
  * "Code grows beyond 64 KB" fallbacks, which silently drop the ingest
  * lineage to interpreted mode (the round-5 q33/q34/q54 regression).
  *
  * Usage: runMain graft.tools.CodegenDump <name> [sfDir] [outFile]
  */
object CodegenDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val out = if (args.length > 2) args(2) else "/tmp/codegen.java"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // AQE wraps the plan in AdaptiveSparkPlanExec, which hides the
      // codegen stages until execution — disable for static inspection
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    val codes = org.apache.spark.sql.execution.debug.codegenStringSeq(
      df.queryExecution.executedPlan)
    codes.zipWithIndex.foreach { case ((subtree, code, _), i) =>
      println(s"== stage $i: ${code.length} chars, " +
        s"${code.count(_ == '\n')} lines — ${subtree.linesIterator.next()}")
    }
    val biggest = codes.maxBy(_._2.length)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), biggest._2)
    println(s"largest stage written to $out")
    spark.stop()
  }
}
