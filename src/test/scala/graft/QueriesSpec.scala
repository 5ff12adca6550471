package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Smoke + invariant tests for the full query catalog at sf0.001.
  * Value-level correctness is the driver's DuckDB oracle (see
  * tools/oracle_check.py for the dev loop); these tests pin structural
  * invariants the oracle can't see.
  */
class QueriesSpec extends AnyFunSuite {

  private val Sf = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()

  test("every catalog query runs and returns rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, Sf).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("entry returns k=12 ranked sources") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length == 12)
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.sameElements(scores.sortBy(-_: Double)), "scores not descending")
  }

  test("chunk idx is consecutive per document (validate_json.py:51-66 invariant)") {
    import org.apache.spark.sql.functions._
    val chunks = SparkEntry.queries("q13_chunks")(spark, Sf)
    val bad = chunks.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), max(col("idx")).as("mx"), min(col("idx")).as("mn"))
      .filter(col("mn") =!= 0 || col("mx") =!= col("n") - 1)
      .count()
    assert(bad == 0)
  }

  test("minhash-LSH near-dups are a superset of exact lang-blocked Jaccard pairs") {
    val exact = SparkEntry.queries("q18_jaccard_pairs")(spark, Sf)
      .select("a_id", "b_id", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = SparkEntry.queries("q19_minhash_lsh")(spark, Sf)
      .select("a_id", "b_id", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exact.nonEmpty, "expected planted near-dup pairs in testdata")
    val missed = exact -- lsh
    assert(missed.isEmpty, s"LSH missed exact pairs: $missed")
  }

  test("ANN recall@10 >= 0.4 against exact KNN") {
    val exact = SparkEntry.queries("q16_knn_cosine")(spark, Sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val ann = SparkEntry.queries("q25_ann_lsh")(spark, Sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = (exact & ann).size.toDouble / exact.size
    assert(recall >= 0.4, s"ANN recall too low: $recall")
  }

  test("IVF ANN recall@10 >= 0.7 against exact KNN (random-vector data; see IvfTune)") {
    val exact = SparkEntry.queries("q16_knn_cosine")(spark, Sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val ivf = SparkEntry.queries("q27_ann_ivf")(spark, Sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.7, s"IVF recall too low: $recall")
  }

  test("topRun mode: max count wins, ties take the smallest value, empty -> (0,'')") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq(
      (1, Seq("b", "a", "b", "c", "a")), // tie a=2 b=2 -> lexicographically first
      (2, Seq("z")),
      (3, Seq.empty[String])
    ).toDF("id", "arr")
    val out = df.select(col("id"),
      graft.operators.TextAnalytics.topRun(col("arr")).as("t")).orderBy("id").collect()
    assert(out(0).getStruct(1).getLong(0) == 2 && out(0).getStruct(1).getString(1) == "a")
    assert(out(1).getStruct(1).getLong(0) == 1 && out(1).getStruct(1).getString(1) == "z")
    assert(out(2).getStruct(1).getLong(0) == 0 && out(2).getStruct(1).getString(1) == "")
  }

  test("DSIR weights favor the target (en) slice; resample size is bounded") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("q71_dsir_weights")(spark, Sf)
    val Array(enMean, otherMean) = df
      .groupBy((col("lang") === "en").as("t")).agg(avg("dsir_logw").as("m"))
      .orderBy(col("t").desc).collect().map(_.getDouble(1))
    assert(enMean > otherMean,
      s"target slice not upweighted: en=$enMean other=$otherMean")
    val total = df.count()
    val selected = df.filter(col("selected")).count()
    assert(selected == math.min(100L, total))
  }

  test("PQ ANN recall@10 >= 0.4 against exact KNN (random-vector worst case)") {
    val exact = SparkEntry.queries("q16_knn_cosine")(spark, Sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val pq = SparkEntry.queries("q69_ann_pq")(spark, Sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = (exact & pq).size.toDouble / exact.size
    assert(recall >= 0.4, s"PQ recall too low: $recall")
  }

  test("IVF-PQ results stay inside the IVF probe set (subset of probed cells)") {
    val ivf = SparkEntry.queries("q27_ann_ivf")(spark, Sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val ivfpq = SparkEntry.queries("q76_ivf_pq")(spark, Sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // same probe set, ADC-approximated ranking: overlap must be substantial
    val overlap = (ivf & ivfpq).size.toDouble / ivf.size
    assert(overlap >= 0.4, s"IVF-PQ diverged from IVF within identical probes: $overlap")
  }

  test("int8 search recall@10 >= 0.9 against exact KNN (99.99% cosine fidelity)") {
    val exact = SparkEntry.queries("q16_knn_cosine")(spark, Sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val i8 = SparkEntry.queries("q72_i8_search")(spark, Sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = (exact & i8).size.toDouble / exact.size
    assert(recall >= 0.9, s"int8 recall too low: $recall")
  }

  test("batch PQ: 10 rows per query; in-corpus queries self-hit at rank 1") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("q73_batch_pq")(spark, Sf).cache()
    val perQuery = df.groupBy("query_id").count().collect()
    assert(perQuery.length == 5 && perQuery.forall(_.getLong(1) == 10L))
    // queries 1..4 are corpus members: exact rerank must surface them first
    val selfHits = df.filter(col("rank") === 1 && col("query_id") =!= 0)
      .select("query_id", "vec_id").collect()
    assert(selfHits.forall(r => r.getLong(0) == r.getLong(1)),
      s"self-hit missing: ${selfHits.mkString(",")}")
    df.unpersist()
  }

  test("global line dedup removes the cross-document boilerplate everywhere") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("q74_global_line_dedup")(spark, Sf)
    val leaked = df.filter(col("clean_text").contains("boilerplate footer") ||
      col("clean_text").contains("generated by pipeline v2")).count()
    assert(leaked == 0, s"$leaked docs still carry boilerplate lines")
    assert(df.filter(col("n_removed") >= 2).count() == df.count(),
      "every doc carries at least the two injected boilerplate lines")
  }

  test("dup clusters: every near-dup pair lands in one cluster, one canonical each") {
    import org.apache.spark.sql.functions._
    val clusters = SparkEntry.queries("q75_dup_clusters")(spark, Sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    val pairs = SparkEntry.queries("q19_minhash_lsh")(spark, Sf)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(clusters(a)._1 == clusters(b)._1, s"pair ($a,$b) split across clusters")
    }
    clusters.groupBy(_._2._1).foreach { case (cid, members) =>
      val canon = members.filter(_._2._2).keys.toSeq
      assert(canon == Seq(cid), s"cluster $cid canonical set: $canon")
      assert(members.keys.min == cid, s"cluster id $cid is not the min member")
    }
  }

  test("LSH embedding near-dups are a subset of exact pairs with equal cosines") {
    val exact = SparkEntry.queries("q28_embedding_near_dup")(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = SparkEntry.queries("q29_embedding_near_dup_lsh")(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exact.nonEmpty)
    val extras = lsh -- exact
    assert(extras.isEmpty, s"LSH produced pairs the exact join lacks: $extras")
  }

  test("simhash banding finds exactly the brute-force Hamming pairs") {
    import org.apache.spark.sql.functions._
    val fp = SparkEntry.queries("q20_simhash")(spark, Sf)
    val a = fp.select(col("doc_id").as("a_id"), col("simhash").as("fa"))
    val b = fp.select(col("doc_id").as("b_id"), col("simhash").as("fb"))
    val brute = a.join(b, col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("fa").bitwiseXOR(col("fb"))).as("hamming"))
      .filter(col("hamming") <= 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val banded = SparkEntry.queries("q30_simhash_near_dup")(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded == brute, s"banding != brute force: only-banded=${banded -- brute} only-brute=${brute -- banded}")
    assert(brute.nonEmpty, "expected some near-dup fingerprints in testdata")
  }
}
