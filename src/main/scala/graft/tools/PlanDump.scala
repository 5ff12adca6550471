package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-loop plan printer: `runMain graft.tools.PlanDump <name> [sfDir]`
  * prints the named catalog query's executed plan (the string PlanSpec
  * asserts against) for eyeballing pushdown/codegen/broadcast shapes.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: PlanDump <query> [sfDir]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.maxMetadataStringLength", "1000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(graft.SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString)
    spark.stop()
  }
}
