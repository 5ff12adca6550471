package graft.tools

import org.apache.spark.sql.SparkSession

/** Mimics the driver's smoke check: SparkEntry.entry(spark) must return
  * rows > 0 on sf0.001. Run: sbt "runMain graft.tools.EntrySmoke"
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    println(s"== entry rows: ${df.count()}")
    df.show(12, 80)
    spark.stop()
  }
}
