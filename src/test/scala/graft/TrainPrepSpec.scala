package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TrainPrep

class TrainPrepSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("split assignment is deterministic, salt-sensitive, and well-proportioned") {
    import spark.implicits._
    val ids = (1 to 20000).toDF("id")
    val w = Seq("train" -> 8000, "val" -> 1000, "test" -> 1000)
    val a = TrainPrep.assignSplits(ids, "id", "s1", w)
    val b = TrainPrep.assignSplits(ids.repartition(13), "id", "s1", w)
    // identical membership regardless of partitioning / evaluation order
    assert(a.orderBy("id").collect().toSeq == b.orderBy("id").collect().toSeq)
    val counts = a.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("train") - 16000) < 400, s"train=${counts("train")}")
    assert(math.abs(counts("val") - 2000) < 200 && math.abs(counts("test") - 2000) < 200)
    // a different salt reshuffles membership
    val c = TrainPrep.assignSplits(ids, "id", "s2", w)
    val moved = a.withColumnRenamed("split", "s_a")
      .join(c.withColumnRenamed("split", "s_c"), "id")
      .filter(col("s_a") =!= col("s_c")).count()
    assert(moved > 1000, s"salt change moved only $moved ids")
  }

  test("packSequences: budget respected, order kept, oversize isolated, groups reset") {
    import spark.implicits._
    val rows = Seq(
      // group g1: 60+60 pack, 100 overflows to seq 1, 250 oversize alone
      ("g1", 1L, 60L), ("g1", 2L, 60L), ("g1", 3L, 100L), ("g1", 4L, 250L),
      ("g1", 5L, 10L),
      // group g2 restarts numbering
      ("g2", 1L, 199L), ("g2", 2L, 1L), ("g2", 3L, 2L))
      .toDF("g", "ord", "n")
    val out = TrainPrep.packSequences(rows, "g", "ord", "n", budget = 200L)
      .select("g", "ord", "seq_idx", "seq_pos")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(out == Seq(
      ("g1", 1L, 0L, 0), ("g1", 2L, 0L, 1), // 120 <= 200
      ("g1", 3L, 1L, 0),                    // 220 > 200 -> new seq
      ("g1", 4L, 2L, 0),                    // oversize alone
      ("g1", 5L, 3L, 0),                    // 250+10 > 200 -> next seq
      ("g2", 1L, 0L, 0), ("g2", 2L, 0L, 1), // 199+1 = 200 fits exactly
      ("g2", 3L, 1L, 0)))                   // 200+2 > 200 -> new seq

    // invariant on real data: every multi-item sequence stays within budget
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("n", size(split(trim(col("text")), " ")).cast("long"))
    val packed = TrainPrep.packSequences(docs, "lang", "doc_id", "n", 200L)
    val over = packed.groupBy("lang", "seq_idx")
      .agg(sum("n").as("tot"), count(lit(1)).as("k"))
      .filter(col("tot") > 200 && col("k") > 1)
    assert(over.isEmpty)
  }
}
