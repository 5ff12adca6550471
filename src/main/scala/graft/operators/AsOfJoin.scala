package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the single most recent right row with
  * the same key and `rightTime <= leftTime` (the time-series "latest prior
  * observation" join; DuckDB/kdb call it ASOF JOIN, Spark has no built-in).
  *
  * Implemented by composition, per the custom-operator preference order
  * (compose > Expression > Strategy): union both sides tagged, one window
  * sorted by (key, time) carrying the last right value forward
  * (`last(_, ignoreNulls)` over unbounded-preceding), then keep left rows.
  * ONE shuffle on the key — the same exchange a sort-merge join would pay —
  * and no range-explosion: each row is touched once, so 100 TB of events
  * streams through in a single partitioned sort.
  *
  * Ties (equal timestamps) match (right sorts before left at the same
  * instant); left rows with no prior right row keep nulls (left-outer
  * semantics).
  */
object AsOfJoin {

  /** @param left      rows to enrich
    * @param right     observation rows
    * @param key       equality key column name (both sides)
    * @param time      event-time column name (both sides, same orderable type)
    * @param rightCols right columns to carry (emitted as `asof_<name>`)
    */
  def leftAsOf(
      left: DataFrame, right: DataFrame,
      key: String, time: String,
      rightCols: Seq[String]): DataFrame = {
    val rightPrep = right
      .select((Seq(col(key), col(time)) ++ rightCols.map(c => col(c).as(s"_r_$c"))): _*)
      .withColumn("_side", lit(0))
    val leftPrep = left.withColumn("_side", lit(1))
    val unioned = leftPrep.unionByName(rightPrep, allowMissingColumns = true)

    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val withTime = unioned.withColumn(s"asof_$time",
      last(when(col("_side") === 0, col(time)), ignoreNulls = true).over(w))
    val carried = rightCols.foldLeft(withTime) { (acc, c) =>
      acc.withColumn(s"asof_$c",
        last(when(col("_side") === 0, col(s"_r_$c")), ignoreNulls = true).over(w))
    }

    carried
      .filter(col("_side") === 1)
      .drop("_side")
      .drop(rightCols.map(c => s"_r_$c"): _*)
  }
}
