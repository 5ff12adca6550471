package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-loop single-query timer: `runMain graft.tools.TimeQuery <name>
  * [sfDir] [runs]` — runs the named catalog query with Bench's hygiene
  * (count() to drain, GC + cooldown between runs) and prints each run's
  * seconds. For iterating on ONE query's plan without paying a full
  * bench sweep.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      sys.error("usage: TimeQuery <queryName> [sfDir] [runs]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    // warmup pass (index/artifact builds, code cache)
    fn(spark, sfDir).count()
    val times = (1 to runs).map { i =>
      spark.sqlContext.clearCache()
      System.gc(); System.gc(); Thread.sleep(200)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"run $i: $s%.3f s")
      s
    }
    println(f"$name min=${times.min}%.3f s over $runs runs (warm)")
    spark.stop()
  }
}
