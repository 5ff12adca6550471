package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Curation

/** The two-phase salted per-key cap must be VALUE-identical to the plain
  * single-window cap (SCALING.md documents it as the hot-domain
  * mitigation for q102's admission rule — a documented mitigation that
  * isn't proven equivalent is a foot-gun, not a mitigation).
  */
class CurationSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def hotCorpus(n: Int, hotFrac: Double) = {
    import spark.implicits._
    // one CDN domain owns hotFrac of the corpus; ids shuffled so arrival
    // order proves nothing
    val rng = new scala.util.Random(7)
    rng.shuffle((0 until n).toList).zipWithIndex.map { case (id, i) =>
      val dom =
        if (i < (n * hotFrac).toInt) "cdn.hot.example"
        else s"site-${i % 37}.example"
      (id.toLong, dom)
    }.toDF("doc_id", "domain")
  }

  test("salted cap == plain cap: same kept set, same exact ranks") {
    val df = hotCorpus(4000, 0.5)
    def collect(out: org.apache.spark.sql.DataFrame) = out
      .select("doc_id", "domain", "rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    for (cap <- Seq(1, 25, 60); salts <- Seq(1, 3, 16)) {
      val plain = collect(Curation.plainRankCap(df, "domain", "doc_id", cap))
      val salted = collect(
        Curation.saltedRankCap(df, "domain", "doc_id", cap, salts))
      assert(salted == plain, s"cap=$cap salts=$salts diverged: " +
        s"salted-only=${(salted -- plain).take(3)} plain-only=${(plain -- salted).take(3)}")
    }
  }

  test("phase-2 window input is bounded by salts x cap per key") {
    // the scale claim: after phase 1 the hot key contributes at most
    // salts*cap rows to the exact-rank window, however hot it is
    val df = hotCorpus(4000, 0.8)
    val cap = 10; val salts = 4
    val phase1 = df
      .withColumn("__salt", pmod(xxhash64(col("doc_id")), lit(salts)))
      .withColumn("__sub", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("domain"), col("__salt")).orderBy(col("doc_id"))))
      .filter(col("__sub") <= cap)
    val survivors = phase1.groupBy("domain").count()
      .agg(max("count")).head().getLong(0)
    assert(survivors <= salts.toLong * cap,
      s"hot key leaked $survivors rows into the exact window")
  }

  test("property: salted cap equals a pure-Scala reference cap on random corpora") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // rows: globally-unique order ids with random hot-ish key assignment;
    // cap and salts swept — the reference model is independent Scala
    val rowsGen = for {
      n <- Gen.choose(0, 120)
      keys <- Gen.listOfN(n, Gen.frequency(
        5 -> Gen.const("hot"), 3 -> Gen.oneOf("a", "b", "c", "d")))
    } yield keys.zipWithIndex.map { case (k, i) => (i.toLong, k) }
    val prop = Prop.forAll(rowsGen, Gen.choose(0, 5), Gen.choose(1, 8)) {
      (rows: Seq[(Long, String)], cap: Int, salts: Int) =>
        import spark.implicits._
        val expected = rows.groupBy(_._2).flatMap { case (k, rs) =>
          rs.map(_._1).sorted.take(cap).zipWithIndex
            .map { case (id, i) => (id, k, (i + 1).toLong) }
        }.toSet
        val got = Curation.saltedRankCap(
            rows.toDF("doc_id", "domain"), "domain", "doc_id", cap, salts)
          .select("doc_id", "domain", "rank").collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
        got == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("urlDomain: scheme-tolerant, strips userinfo/port/path, lowercases") {
    import spark.implicits._
    val cases = Seq(
      "https://News.Example.COM/a/b" -> "news.example.com",
      "http://user:pw@host.example:8080/x" -> "host.example",
      "s3a://bucket.name/key" -> "bucket.name",
      "ftp://plain.example" -> "plain.example",
      "not a url" -> "")
    val got = cases.map(_._1).toDF("url")
      .select(Curation.urlDomain(col("url"))).collect().map(_.getString(0))
    assert(got.toSeq == cases.map(_._2), s"got ${got.toSeq}")
  }
}
