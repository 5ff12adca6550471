package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-construction eagerness audit (r12): the r11 verdict caught
  * q88/q99 running a full `docs.count()` job every time their lineage
  * was CONSTRUCTED — work invisible to plan inspection and billed to
  * whoever builds the query, at any scale. This tool constructs every
  * catalog query TWICE (first pass absorbs one-time manifest-gated
  * `ensure` builds; the second, steady-state pass is the measurement)
  * and reports every Spark job launched during the second construction,
  * with stage names, so a count-gate-style regression anywhere in the
  * catalog is one `runMain` away from visible.
  *
  * Legitimate construction jobs are bounded METADATA or probe work:
  * "parquet at" (schema-inference footer reads), single-row dev-embed
  * probes (`head` over `range(1)`), store manifest/stats reads (no job
  * at all). A corpus-shaped stage name (count/collect over a table
  * lineage) in steady state is a bug.
  *
  * Run: sbt "runMain graft.tools.ConstructAudit [sfDir]"
  */
object ConstructAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.add(js.stageInfos.map(s => s"${s.name}[${s.numTasks}t]")
          .mkString(" | ")); ()
      }
    })

    def construct(name: String): Unit = {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.queryExecution.executedPlan
      ()
    }

    // What a stage name is allowed to be at steady-state construction.
    // Everything else is a SUSPECT — the docs.count() class of bug.
    def classify(stage: String): String =
      if (stage.startsWith("parquet at Tables.scala")) "schema"  // footer read
      else if (stage.startsWith("parquet at GenStore.scala") ||
               stage.startsWith("parquet at ChunkStore.scala") ||
               stage.startsWith("parquet at Dropzone.scala")) "store-read"
      else if (stage.startsWith("head at PipelineCatalog") ||
               stage.startsWith("collect at Dedup")) "probe"    // literal export
      else if (stage.startsWith("localCheckpoint at")) "checkpoint"
      else if (stage.contains("withThreadLocalCaptured")) "broadcast"
      else "SUSPECT"

    import scala.jdk.CollectionConverters._
    var flagged = 0
    val verbose = sys.env.get("GRAFT_AUDIT_VERBOSE").contains("1")
    graft.SparkEntry.queries.keys.foreach { name =>
      try {
        construct(name) // pass 1: absorb one-time ensure builds
        Thread.sleep(50)
        jobs.clear()
        construct(name) // pass 2: steady-state construction
        Thread.sleep(300) // let the listener bus drain
        val steady = jobs.iterator.asScala.toList
        val cats = steady.flatMap(_.split('|').map(s =>
          classify(s.trim.replaceAll("\\[\\d+t\\]$", ""))))
        val summary = cats.groupBy(identity).view.mapValues(_.size).toMap
          .toSeq.sortBy(_._1).map { case (k, n) => s"$k:$n" }.mkString(" ")
        val bad = cats.count(_ == "SUSPECT")
        if (bad > 0) flagged += 1
        if (bad > 0 || verbose || steady.size > 8)
          println(f"${if (bad > 0) "SUSPECT" else "ok"}%-8s $name%-28s " +
            f"jobs=${steady.size} [$summary]" +
            (if (bad > 0) " :: " + steady.mkString(" ;; ") else ""))
      } catch { case e: Throwable =>
        flagged += 1
        println(f"ERROR    $name%-28s ${e.getMessage.linesIterator.nextOption().getOrElse("")}")
      }
    }
    // Eager-by-design constructors (the catalog's documented shapes):
    //  - checkpoint/broadcast: the CC label-propagation loop (q75/q85/
    //    q98/q99) and candidate probes (q96/q97) materialize per round;
    //  - probe: centroid/query-vector literal exports (q25/q27/q69/...,
    //    q104) and the q102 order-bounds probe (skippable via
    //    orderBounds);
    //  - store-read: manifest/stats/pointer resolution on persisted
    //    artifacts — bounded by store metadata, not corpus size.
    // SUSPECTS counts queries with any stage OUTSIDE those classes.
    println(s"CONSTRUCT_AUDIT_SUSPECTS=$flagged")
    spark.stop()
  }
}
