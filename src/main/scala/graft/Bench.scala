package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Benchmark main: runs every catalog query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line with per-query wall times, plus an ingest
  * throughput figure (chunk+embed chars/sec over the documents table —
  * the reference's own headline is corpus ingest, README.md:33-44).
  *
  * Honesty rules:
  *  - every query is MATERIALIZED (xxhash64 over all output columns,
  *    folded to one sum) — a bare `.count()` lets Catalyst prune
  *    projection-only work and flatters those entries;
  *  - the deliberately-quadratic DuckDB-oracle twins (q18 exact Jaccard
  *    all-pairs, q28 exact embedding all-pairs) are correctness-tier only:
  *    timed and reported, but EXCLUDED from the headline total — their
  *    scale path (q19/q29) is what the engine ships;
  *  - the ANN index (cell/bucket partitioned vector store) is built before
  *    timing and reported as index_build_sec — index build is write-time
  *    work (VectorStore), queries only probe.
  */
object Bench {

  private val CorrectnessOnly = Set("q18_jaccard_pairs", "q28_embedding_near_dup")

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

    /** Materialize: fold every output column into one hash-sum so the
      * whole projection is computed, shuffled, and reduced.
      */
    def run(df: org.apache.spark.sql.DataFrame): Unit = {
      val h = xxhash64(df.columns.map(col).toIndexedSeq: _*)
      df.select(h.as("h")).agg(expr("bit_xor(h)")).head()
    }

    // Warm the session at the smallest SF (class loading, codegen compiler,
    // shuffle infra) so per-query timings reflect steady-state throughput —
    // the reference's own eval treats the first query as warmup
    // (eval/results/last.json: max 4285 ms "first query incl. warmup").
    try {
      val warmDir = "/root/testdata/sf0.001"
      SparkEntry.queries.take(3).foreach { case (_, fn) => run(fn(spark, warmDir)) }
    } catch { case _: Throwable => () }

    // write-time ANN indexing for this sfDir (probe queries then only scan
    // the probed partitions)
    val indexBuild = {
      val t0 = System.nanoTime()
      try {
        val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
        graft.sources.VectorStore.ensure(
          spark, emb.filter(col("vec_id") =!= 0), "embedding", sfDir)
        graft.sources.VectorStore.ensurePq(
          spark, emb.filter(col("vec_id") =!= 0), "embedding", sfDir)
        (System.nanoTime() - t0) / 1e9
      } catch { case _: Throwable => -1.0 }
    }

    // Two timed runs per query, report the MIN: single-shot timings on a
    // 32-thread local box carry ±1s scheduler/GC noise (round-2's "q03
    // regression" was exactly this — a 2.55s one-shot vs 1.2-1.7s
    // steady-state over 5 reps under the identical plan/config). Min of 2
    // is the steady-state throughput the 100 TB comparison cares about;
    // both runs fully materialize.
    //
    // PER-QUERY ISOLATION (round-3 finding): running 51 queries x 2
    // materializations back-to-back in one JVM accumulates broadcast/
    // shuffle/codegen state until late-alphabet queries run under memory
    // pressure — BENCH_r03 reported q28 at 22.1s where the identical
    // plan/config measures 1.29s in isolation (tools/QueryTime). Between
    // queries we clear the SQL cache and force the ContextCleaner to drain
    // (broadcast/shuffle driver refs are weakly held — they release on GC),
    // plus a short cooldown. Both raw run times, per-query GC time and
    // post-query heap are reported so contamination is visible in the file
    // itself, and a post-suite fresh-context sample re-measure asserts the
    // suite numbers were clean (isolation_check below).
    val gcBeans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
    def gcMillis(): Long = {
      var s = 0L; gcBeans.forEach(b => s += math.max(0L, b.getCollectionTime)); s
    }
    def cooldown(): Unit = {
      spark.catalog.clearCache()
      System.gc()
      Thread.sleep(200)
      System.gc()
    }
    var failed = List.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def timeOnce(): Double = {
        val t0 = System.nanoTime()
        run(fn(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }
      val gc0 = gcMillis()
      val (t1, t2) =
        try {
          val a = timeOnce()
          val b = timeOnce()
          (a, b)
        } catch { case e: Throwable =>
          failed ::= name
          System.err.println(s"[bench] $name FAILED: ${e.getMessage.linesIterator.nextOption().getOrElse("")}")
          (-1.0, -1.0)
        }
      val gcSec = (gcMillis() - gc0) / 1e3
      val rt = Runtime.getRuntime
      val heapMb = (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
      cooldown()
      (name, math.min(t1, t2), t1, t2, gcSec, heapMb)
    }

    // ingest throughput: full chunk(800/100)+dev-embed(64) pipeline over
    // the documents table, measured as source chars/sec
    val ingestTp =
      try {
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        val totalChars = docs.agg(sum(length(col("text")))).head().getLong(0)
        val t0 = System.nanoTime()
        docs.select(col("doc_id"),
            posexplode(graft.operators.Chunker.chunkTextCol(col("text"), 800, 100))
              .as(Seq("idx", "chunk")))
          .withColumn("vector", graft.operators.DevEmbed.devEmbed(col("chunk"), 64))
          .select(count(lit(1)), sum(element_at(col("vector"), 1))).head()
        val secs = (System.nanoTime() - t0) / 1e9
        totalChars / secs
      } catch { case _: Throwable => -1.0 }

    // Isolation self-check: re-measure a sample of late-alphabet queries
    // (the ones BENCH_r03 misreported) in a FRESH SparkContext and require
    // the suite numbers to be within 2x of the isolated measurements — the
    // bench refuses to silently publish contaminated numbers again.
    spark.stop()
    val sampleNames = Seq("q28_embedding_near_dup", "q31_asof_join",
      "q35_provenance_search").filter(SparkEntry.queries.contains)
    val isolated: Seq[(String, Double)] = {
      val s2 = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate()
      s2.sparkContext.setLogLevel("WARN")
      def run2(df: org.apache.spark.sql.DataFrame): Unit = {
        val h = xxhash64(df.columns.map(col).toIndexedSeq: _*)
        df.select(h.as("h")).agg(expr("bit_xor(h)")).head()
      }
      val out = sampleNames.map { name =>
        val t = try {
          (1 to 2).map { _ =>
            val t0 = System.nanoTime()
            run2(SparkEntry.queries(name)(s2, sfDir))
            (System.nanoTime() - t0) / 1e9
          }.min
        } catch { case _: Throwable => -1.0 }
        name -> t
      }
      s2.stop()
      out
    }
    val suiteByName = results.map(r => r._1 -> r._2).toMap
    val isolationChecks = isolated.collect { case (name, iso) if iso > 0 =>
      val suite = suiteByName.getOrElse(name, -1.0)
      // floor the denominator: sub-second queries can "fail" 2x on pure
      // scheduler jitter, which is noise, not contamination
      val ratio = if (suite > 0) suite / math.max(iso, 0.5) else -1.0
      (name, suite, iso, ratio)
    }
    // three outcomes, not two: an empty check set means the fresh-context
    // re-measurement itself failed — inconclusive, not contamination
    val isolationStatus =
      if (isolationChecks.isEmpty) "no_measurements"
      else if (isolationChecks.forall(_._4 <= 2.0)) "ok"
      else "contaminated"
    val isolationOk = isolationStatus == "ok"
    if (isolationStatus == "contaminated")
      System.err.println("[bench] ISOLATION CHECK FAILED: suite numbers are " +
        "contaminated vs fresh-context re-measurement: " +
        isolationChecks.filter(_._4 > 2.0)
          .map(c => f"${c._1} suite=${c._2}%.2fs isolated=${c._3}%.2fs")
          .mkString("; "))
    else if (isolationStatus == "no_measurements")
      System.err.println("[bench] ISOLATION CHECK INCONCLUSIVE: no isolated " +
        "measurements obtained (every sample query failed in the fresh " +
        "context) — suite numbers are unverified, not proven contaminated")

    val qs = results.map { case (k, v, _, _, _, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val detail = results.map { case (k, _, t1, t2, gcSec, heapMb) =>
      "\"" + k + "\":{\"runs\":[" + t1 + "," + t2 + "],\"gc_sec\":" + gcSec +
        ",\"heap_mb\":" + heapMb + "}"
    }.mkString("{", ",", "}")
    val iso = isolationChecks.map { case (k, suite, isoT, ratio) =>
      "\"" + k + "\":{\"suite\":" + suite + ",\"isolated\":" + isoT +
        ",\"ratio\":" + f"$ratio%.3f" + "}"
    }.mkString("{", ",", "}")
    val errs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.collect {
      case (k, v, _, _, _, _) if !CorrectnessOnly.contains(k) && v >= 0 => v
    }.sum
    val co = CorrectnessOnly.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val notes = "per-query sec = min of 2 fully-materialized runs; clearCache+" +
      "2xGC+200ms cooldown between queries (r3: one-JVM state accumulation " +
      "inflated late-suite numbers 3-17x); isolation_check re-measures a " +
      "3-query sample in a fresh SparkContext and must agree within 2x"
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"correctness_only":$co,"index_build_sec":$indexBuild,"ingest_chars_per_sec":$ingestTp,"runs_per_query":2,"query_detail":$detail,"isolation_check":$iso,"isolation_ok":$isolationOk,"isolation_status":"$isolationStatus","notes":"$notes","sf":"$sfDir"}""")
  }
}
