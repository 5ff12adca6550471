package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-interval range join: pairs (l, r) with the same key and
  * `r.time ∈ [l.time - before, l.time + after]`.
  *
  * A naive non-equi join degenerates to a per-key cross product (Spark
  * plans BroadcastNestedLoop for pure inequality conditions). Instead both
  * sides are bucketed into time bins as wide as the window span; a
  * matching pair's bins can differ by at most one, so the join becomes an
  * EQUI-join on (key, bin) with the right side exploded into its bin and
  * both neighbours, then an exact range filter. Hash-joinable, AQE-
  * optimizable, and the fan-out is a fixed 3x on one side — independent
  * of data volume, so it holds at 100 TB.
  */
object RangeJoin {

  /** @param left    probe rows (columns prefixed `l_` in the output if they
    *                collide)
    * @param right   candidate rows; emitted columns renamed `r_<name>`
    * @param key     equality key (both sides)
    * @param time    event-time column in microseconds (both sides, LongType)
    * @param before  microseconds before l.time (inclusive)
    * @param after   microseconds after l.time (inclusive)
    */
  def intervalJoin(
      left: DataFrame, right: DataFrame,
      key: String, time: String,
      before: Long, after: Long,
      rightCols: Seq[String]): DataFrame = {
    require(before >= 0 && after >= 0 && before + after > 0)
    val span = before + after

    // The true window [t-before, t+after] fits inside [t-span, t+span], so
    // with bins of width `span`, matching rows' bins differ by at most 1.
    // floor(long/long) promotes to double: exact while |t| < 2^53 µs
    // (epoch micros stay under that until ~year 2255; `div` is NOT a
    // drop-in — it truncates toward zero and would break bin adjacency
    // for negative pre-1970 times, which floor handles correctly).
    val l = left.withColumn("_bin", floor(col(time) / span))
    val r = right
      .select((Seq(col(key).as("_rk"), col(time).as(s"r_$time")) ++
        rightCols.map(c => col(c).as(s"r_$c"))): _*)
      .withColumn("_rbin_base", floor(col(s"r_$time") / span))
      .withColumn("_rbin", explode(array(
        col("_rbin_base") - 1, col("_rbin_base"), col("_rbin_base") + 1)))
      .drop("_rbin_base")

    l.join(r, col(key) === col("_rk") && col("_bin") === col("_rbin"))
      .filter(col(s"r_$time") >= col(time) - before &&
        col(s"r_$time") <= col(time) + after)
      .drop("_bin", "_rbin", "_rk")
  }
}
