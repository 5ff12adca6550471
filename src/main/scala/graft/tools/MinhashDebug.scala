package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.BandMinhash
import graft.operators.{Dedup, WordShingles}

/** Stage-by-stage timing of the MinHash-LSH pipeline at a given SF. */
object MinhashDebug {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"== $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val sh = docs.select(col("doc_id").as("doc"),
        WordShingles.wordShingles(col("text")).as("shingles"))
      .filter(size(col("shingles")) > 0)
    time("shingles")(println(sh.count()))

    val banded = sh.select(col("doc"),
      posexplode(BandMinhash.bandMinhash(col("shingles"), 32, 8)).as(Seq("band", "bh")))
    time("banded")(println(banded.count()))

    time("full operator")(
      println(Dedup.minhashNearDuplicates(docs, "doc_id", "text", 32, 8, 0.5).count()))
    time("full operator 2nd run")(
      println(Dedup.minhashNearDuplicates(docs, "doc_id", "text", 32, 8, 0.5).count()))
  }
}
