package graft.tools

import org.scalatest.funsuite.AnyFunSuite

import ConstructAudit.{Stage, suspectsFor, bounds}

/** The audit core's magnitude bounds (r12 verdict nit #1): whitelisted
  * classes must be bounded, not blanket-allowed — a corpus-scale job
  * wearing an allowed class's stage name has to trip the audit. The
  * end-to-end tool run (real catalog, 0 suspects) stays a per-round
  * `runMain`; this spec pins the CLASSIFIER + CEILING logic both ways
  * so the tool cannot silently regress into the r12 blanket-allow.
  */
class ConstructAuditSpec extends AnyFunSuite {

  test("real-catalog-shaped constructions pass: bounded metadata, probes, CC rounds") {
    // the documented steady-state shapes, at audit-tier magnitudes
    val ccLoop = (1 to 45).flatMap(_ => Seq(
      Stage("localCheckpoint at Dedup.scala:281", 4),
      Stage("$anonfun$withThreadLocalCaptured$2 at CompletableFuture.java:1768", 4)))
    val meta = Seq(
      Stage("parquet at Tables.scala:31", 1),
      Stage("parquet at GenStore.scala:120", 2),
      Stage("parquet at ChunkStore.scala:34", 1),
      Stage("head at PipelineCatalog.scala:1883", 1),
      Stage("collect at Dedup.scala:192", 2))
    assert(suspectsFor(meta) == Nil)
    assert(suspectsFor(ccLoop ++ meta) == Nil,
      "a 45-round CC loop at small task counts is the documented shape")
  }

  test("an injected corpus-scale checkpoint trips the audit (magnitude, not class)") {
    // the r12 blind spot: class 'checkpoint' was unconditionally ok, so
    // this 512-task corpus materialization would have passed silently
    val bad = Seq(Stage("localCheckpoint at Dedup.scala:281", 512))
    val out = suspectsFor(bad)
    assert(out.exists(m => m.startsWith("MAGNITUDE checkpoint") &&
      m.contains("512t")), s"corpus-scale checkpoint not flagged: $out")
    // same for a corpus-scale broadcast collect
    val badB = Seq(Stage(
      "$anonfun$withThreadLocalCaptured$2 at CompletableFuture.java:1768", 300))
    assert(suspectsFor(badB).exists(_.startsWith("MAGNITUDE broadcast")))
    // and a probe that stopped being a probe
    assert(suspectsFor(Seq(Stage("head at PipelineCatalog.scala:1883", 64)))
      .exists(_.startsWith("MAGNITUDE probe")))
    // store-reads are footer reads bounded by segment-file count (≤64 at
    // the audit tier, ceiling 128); a store whose construction suddenly
    // reads 512 files has outgrown its compaction policy
    assert(suspectsFor(Seq(Stage("parquet at GenStore.scala:308", 512)))
      .exists(_.startsWith("MAGNITUDE store-read")))
  }

  test("a runaway iteration count trips the per-class stage ceiling") {
    val (maxStages, maxTasks) = bounds("checkpoint")
    val runaway = (1 to maxStages + 10).map(_ =>
      Stage("localCheckpoint at Dedup.scala:281", math.min(4, maxTasks)))
    val out = suspectsFor(runaway)
    assert(out.exists(m => m.startsWith("MAGNITUDE checkpoint") &&
      m.contains("stages")),
      s"unbounded CC iteration growth not flagged: $out")
  }

  test("unknown stage shapes remain class suspects (the original docs.count gate)") {
    val out = suspectsFor(Seq(Stage("count at PipelineCatalog.scala:2290", 4)))
    assert(out.exists(_.startsWith("SUSPECT-CLASS count at PipelineCatalog")))
  }
}
