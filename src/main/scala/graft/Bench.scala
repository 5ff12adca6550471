package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Benchmark main: runs every catalog query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line with per-query wall times, plus an ingest
  * throughput figure (chunk+embed chars/sec over the documents table —
  * the reference's own headline is corpus ingest, README.md:33-44).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
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
    // Warm the session at the smallest SF (class loading, codegen compiler,
    // shuffle infra) so per-query timings reflect steady-state throughput —
    // the reference's own eval treats the first query as warmup
    // (eval/results/last.json: max 4285 ms "first query incl. warmup").
    try {
      val warmDir = "/root/testdata/sf0.001"
      SparkEntry.queries.take(3).foreach { case (_, fn) => fn(spark, warmDir).count() }
    } catch { case _: Throwable => () }

    var failed = List.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count()
      catch { case e: Throwable =>
        failed ::= name
        System.err.println(s"[bench] $name FAILED: ${e.getMessage.linesIterator.nextOption.getOrElse("")}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }

    // ingest throughput: full chunk(800/100)+dev-embed(64) pipeline over
    // the documents table, measured as source chars/sec
    val ingestTp =
      try {
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        val totalChars = docs.agg(sum(length(col("text")))).head.getLong(0)
        val t0 = System.nanoTime()
        docs.select(col("doc_id"),
            posexplode(graft.operators.Chunker.chunkTextCol(col("text"), 800, 100))
              .as(Seq("idx", "chunk")))
          .withColumn("vector", graft.operators.DevEmbed.devEmbed(col("chunk"), 64))
          .select(count(lit(1)), sum(element_at(col("vector"), 1))).head
        val secs = (System.nanoTime() - t0) / 1e9
        totalChars / secs
      } catch { case _: Throwable => -1.0 }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"ingest_chars_per_sec":$ingestTp,"sf":"$sfDir"}""")
    spark.stop()
  }
}
