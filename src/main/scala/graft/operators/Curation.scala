package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators that don't belong to a narrower family.
  *
  * Reference scope note: the reference (jsonify2ai) curates per-document
  * (parsers, chunking, dedup by content hash); corpus-level admission
  * rules like per-domain caps are the web-corpus stage every pretraining
  * pipeline adds on top (C4, RefinedWeb §3.1) — see q102 and SCALING.md
  * §"Training-set preparation".
  */
object Curation {

  /** Two-phase skew-safe per-key rank cap — the exact-`row_number` cap
    * (q102's per-domain admission) for the pathological key: at 100 TB a
    * single CDN domain can own a large corpus fraction, and a plain
    * `Window.partitionBy(key)` sends every one of its rows to ONE task.
    *
    * Phase 1 sub-ranks within (key, salt) — salt = hash(order key) mod
    * `salts`, so the hot key's window input splits `salts` ways — and
    * keeps sub_rank ≤ cap. Every true top-`cap` row of a key survives:
    * a row's rank within any SUBSET of its key's rows is ≤ its rank in
    * the full set. Phase 2 exact-ranks the ≤ salts×cap survivors per
    * key — a constant-bounded window regardless of how hot the key is.
    *
    * Returns the kept rows with their exact per-key rank in `rankCol`
    * (1..cap in `orderCol` order). Value-identical to
    * `row_number().over(partitionBy(key).orderBy(order)) <= cap` —
    * CurationSpec asserts set AND rank equality on a hot-key corpus.
    * `orderCol` must be unique per row within a key (q102 orders by the
    * stable doc id): ties across salt buckets would make both forms
    * nondeterministic.
    */
  def saltedRankCap(df: DataFrame, keyCol: String, orderCol: String,
      cap: Int, salts: Int = 16, rankCol: String = "rank"): DataFrame = {
    require(cap >= 0, "cap must be non-negative")
    require(salts > 0, "salts must be positive")
    val subRank = row_number().over(
      Window.partitionBy(col(keyCol), col("__salt")).orderBy(col(orderCol)))
    val exactRank = row_number().over(
      Window.partitionBy(col(keyCol)).orderBy(col(orderCol)))
    df.withColumn("__salt", pmod(xxhash64(col(orderCol)), lit(salts)))
      .withColumn("__sub", subRank)
      .filter(col("__sub") <= cap)
      .withColumn(rankCol, exactRank.cast("long"))
      .filter(col(rankCol) <= cap)
      .drop("__salt", "__sub")
  }

  /** The plain single-window form of the same cap (what q102 inlines) —
    * here so the spec can assert the two forms agree on identical input.
    */
  def plainRankCap(df: DataFrame, keyCol: String, orderCol: String,
      cap: Int, rankCol: String = "rank"): DataFrame =
    df.withColumn(rankCol, row_number().over(
        Window.partitionBy(col(keyCol)).orderBy(col(orderCol))).cast("long"))
      .filter(col(rankCol) <= cap)

  /** Domain extraction from a URL — q102's first step as a reusable
    * column (scheme-tolerant, port and userinfo stripped, lowercased).
    */
  def urlDomain(url: Column): Column =
    lower(regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)", 1))
}
