package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for deliberately skewed keys.
  *
  * AQE's skew-join handles most runtime skew (enabled in our sessions);
  * this utility is the explicit form for pipelines that KNOW their hot
  * keys (e.g. a handful of boilerplate documents owning millions of
  * chunks): the left (large, skewed) side gets a random-but-deterministic
  * salt in [0, S), the right side is replicated S times, and the join key
  * becomes (key, salt) — splitting each hot key across S tasks.
  */
object SkewJoin {

  /** Inner equi-join `left.key == right.key` with salt factor S.
    * `left` is the large/skewed side. Right side is replicated S× —
    * keep it broadcast-size × S or pre-filter to the hot keys.
    */
  def saltedJoin(
      left: DataFrame, right: DataFrame, key: String, saltFactor: Int): DataFrame = {
    require(saltFactor >= 1)
    // deterministic salt: spreads a key's rows without RNG state
    val salted = left.withColumn("_salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(saltFactor)))
    val replicated = right
      .withColumn("_salt", explode(sequence(lit(0), lit(saltFactor - 1))))
      .withColumn("_salt", col("_salt").cast("long"))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
