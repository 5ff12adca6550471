package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic: run one catalog query at a given sfDir and print its rows
  * as JSON lines — for reading a REPORT query's values on an ad-hoc
  * corpus (e.g. q147 on a high-dup synthetic draw, SCALING row 29)
  * without a full Verify sweep.
  *
  * Usage: runMain graft.tools.RunQuery <name> [sfDir] [maxRows]
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val maxRows = if (args.length > 2) args(2).toInt else 1000
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    // take, not collect().take: the cap must bound DRIVER memory too
    df.toJSON.take(maxRows).foreach(println)
    spark.stop()
  }
}
