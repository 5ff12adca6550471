package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-query CORE-scaling draw at a compute-bound size (r17 verdict #8):
  * every parallelism claim so far rests on sf0.1 numbers, where the median
  * query is ~0.5 s and fixed per-job overhead swamps core count (the r17
  * suite ran 106.9 s @32 cores vs 119.9 s @8 — a 1.12× ratio at a 4× core
  * cut says nothing per query). This tool times one representative per
  * query CLASS on the REPS× letter-permuted corpus (the bench's own
  * scale_check artifact — identical manifest signature, so the corpus and
  * the /tmp stores are shared) in TWO fresh sessions, local[hi] then
  * local[lo], and prints sec@hi / sec@lo / ratio per query. A ratio near
  * the core ratio = compute-bound and parallel; near 1 = fixed-overhead or
  * serial — the named offenders list the committed table needs.
  *
  * Store-backed lineages get one UNTIMED warm run per session-independent
  * store first (build is write-time work, not serve), then min-of-2 warm
  * serves per core point — same split as the bench's scale_check.
  *
  * Usage: runMain graft.tools.CoreScaling [sfDir] [reps] [hiCpus] [loCpus]
  */
object CoreScaling {

  private val Queries = Seq(
    "q03_regional_revenue",   // TPC join+agg
    "q60_bm25",               // full-scan text scoring
    "q68_bm25_indexed",       // store-served text index probe
    "q73_batch_pq",           // batch ADC scan + rerank
    "q85_dedup_apply",        // cluster-store label serve
    "q88_span_removal",       // span dedup (salted/window kernel)
    "q96_inc_near_dup",       // incremental band-store probe
    "q97_stream_near_dup",    // streaming band-store probe
    "q98_curation_pipeline",  // composed curation
    "q99_full_recipe",        // composed recipe (decontam + spans)
    "q107_sequence_packing",  // prefix-sum packing window
    "q112_packed_manifest",
    "q120_bpe_merges",        // iterative driver loop (expected serial-ish)
    "q121_ann_recall",        // IVF recall curve
    "q128_pq_recall")         // PQ recall curve

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(10)
    val hi = args.lift(2).map(_.toInt).getOrElse(
      Runtime.getRuntime.availableProcessors())
    val lo = args.lift(3).map(_.toInt).getOrElse(math.max(2, hi / 4))

    def session(cpus: Int): SparkSession = {
      val s = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus.toString)
        .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
          (cpus * 8).toString)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.codegen.cache.maxEntries", "5000")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }

    def mat(df: DataFrame): Unit = {
      val h = xxhash64(df.columns.map(col).toIndexedSeq: _*)
      df.select(h.as("h")).agg(expr("bit_xor(h)")).head()
    }

    // REPS× corpus: byte-identical recipe AND manifest signature as
    // Bench's scale_check (md5 of "path#scaleN", scenario scale-v1), so
    // whichever runs first builds it and the other reuses it.
    def ensureScaledCorpus(spark: SparkSession): String = {
      val srcDocs = new java.io.File(s"$sfDir/documents.parquet")
      val sig = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${srcDocs.getAbsolutePath}#scale$reps".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      val dir = new java.io.File(System.getProperty("java.io.tmpdir"), s"graft-scale-$sig")
      val mfPath = java.nio.file.Paths.get(dir.toString, "_graft_manifest.json")
      val expected = {
        val stamp = graft.sources.GenStore.sourceStamp(srcDocs)
        s"""{"source_stamp":"$stamp","reps":$reps,"scenario":"scale-v1"}"""
      }
      if (!(java.nio.file.Files.exists(mfPath) &&
          java.nio.file.Files.readString(mfPath) == expected)) {
        if (dir.exists()) {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(dir.toPath).iterator().asScala.toSeq
            .sortBy(-_.getNameCount).foreach(java.nio.file.Files.delete)
        }
        java.nio.file.Files.createDirectories(dir.toPath)
        graft.core.Tables.names.filter(_ != "documents").foreach { n =>
          java.nio.file.Files.createSymbolicLink(
            java.nio.file.Paths.get(dir.toString, s"$n.parquet"),
            java.nio.file.Paths.get(s"$sfDir/$n.parquet"))
        }
        val docs = spark.read.parquet(srcDocs.toString)
        val maxId = docs.agg(max(col("doc_id"))).head().getLong(0) + 1L
        val alpha = "abcdefghijklmnopqrstuvwxyz"
        def perm(rep: Int): String = {
          val a = alpha.toCharArray
          var x = rep.toLong * 2654435761L + 1013904223L
          for (i <- a.length - 1 to 1 by -1) {
            x = (x * 6364136223846793005L + 1442695040888963407L) & Long.MaxValue
            val j = (x % (i + 1)).toInt
            val t = a(i); a(i) = a(j); a(j) = t
          }
          new String(a)
        }
        val scaled = (0 until reps).map { r =>
          val base = docs.withColumn("doc_id", col("doc_id") + lit(r.toLong * maxId))
          if (r == 0) base
          else {
            val p = perm(r)
            base.withColumn("text", translate(col("text"),
              alpha + alpha.toUpperCase, p + p.toUpperCase))
          }
        }.reduce(_ unionByName _)
        scaled.write.mode("overwrite").parquet(s"$dir/documents.parquet")
        java.nio.file.Files.writeString(mfPath, expected)
      }
      dir.toString
    }

    def cooldown(s: SparkSession): Unit = {
      s.sqlContext.clearCache(); System.gc(); System.gc(); Thread.sleep(200)
    }

    def measure(cpus: Int, dir: String,
        warmStores: Boolean): Seq[(String, Double)] = {
      val s = session(cpus)
      // JIT/codegen warmup at the smallest SF, same as the bench
      graft.Bench.warmupDir(sfDir).foreach { wd =>
        try graft.SparkEntry.queries.take(3).foreach { case (_, fn) => mat(fn(s, wd)) }
        catch { case _: Throwable => }
      }
      val out = Queries.map { name =>
        val t = try {
          if (warmStores) { mat(graft.SparkEntry.queries(name)(s, dir)); cooldown(s) }
          (1 to 2).map { i =>
            if (i > 1) cooldown(s)
            val t0 = System.nanoTime()
            mat(graft.SparkEntry.queries(name)(s, dir))
            (System.nanoTime() - t0) / 1e9
          }.min
        } catch { case e: Throwable =>
          System.err.println(s"[corescale] $name @${cpus}c FAILED: " +
            e.getMessage.linesIterator.nextOption().getOrElse(""))
          -1.0
        }
        cooldown(s)
        println(f"[corescale] $name%-26s @${cpus}%2dc  $t%7.2f s")
        name -> t
      }
      s.stop()
      out
    }

    val s0 = session(hi)
    val dir = ensureScaledCorpus(s0)
    s0.stop()
    // hi first (builds the /tmp stores for the scaled corpus on its
    // untimed warm pass), then lo reuses them — both measure warm SERVE
    val hiTimes = measure(hi, dir, warmStores = true).toMap
    val loTimes = measure(lo, dir, warmStores = true).toMap
    val rows = Queries.map { q =>
      val (th, tl) = (hiTimes.getOrElse(q, -1.0), loTimes.getOrElse(q, -1.0))
      val ratio = if (th > 0 && tl > 0) tl / th else -1.0
      println(f"[corescale] TABLE $q%-26s ${th}%7.2f s @${hi}c  ${tl}%7.2f s @${lo}c  ratio ${ratio}%5.2f")
      f""""$q":{"sec_c$hi":$th%.3f,"sec_c$lo":$tl%.3f,"ratio":$ratio%.2f}"""
    }
    println(s"""{"metric":"core_scaling","reps":$reps,"cpus_hi":$hi,"cpus_lo":$lo,"per_query":${rows.mkString("{", ",", "}")},"sf":"$sfDir"}""")
  }
}
