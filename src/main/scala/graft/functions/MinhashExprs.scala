package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash band hashes as a codegen'd Catalyst expression.
  *
  * For an `array<string>` of shingles, computes `numHashes` minhashes (the
  * k-th hash of a shingle is XXH64 of its base-64-bit hash with seed k) and
  * folds each band's `numHashes / bands` minhashes into one 64-bit band
  * bucket id, returning `array<long>` of length `bands`.
  *
  * This replaces a nested higher-order-function formulation
  * (`transform(sequence…, aggregate(shingles…, xxhash64…))`) that evaluated
  * ~15.7M interpreted lambda calls at sf0.1 (≈19 s); the same arithmetic in
  * one JVM loop is ~100x cheaper and stays inside whole-stage codegen.
  */
case class BandMinhash(child: Expression, numHashes: Int, bands: Int)
    extends UnaryExpression {
  require(numHashes % bands == 0, "numHashes must be divisible by bands")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "band_minhash"

  override protected def nullSafeEval(input: Any): Any =
    BandMinhash.compute(input.asInstanceOf[ArrayData], numHashes, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BandMinhash$$.MODULE$$.compute($c, $numHashes, $bands)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BandMinhash {
  private val BaseSeed = 42L

  def compute(shingles: ArrayData, numHashes: Int, bands: Int): ArrayData = {
    val n = shingles.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = shingles.getUTF8String(i)
      val base = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, BaseSeed)
      var k = 0
      while (k < numHashes) {
        val hk = XXH64.hashLong(base, k.toLong)
        if (hk < mins(k)) mins(k) = hk
        k += 1
      }
      i += 1
    }
    val rowsPerBand = numHashes / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = BaseSeed
      var r = 0
      while (r < rowsPerBand) {
        acc = XXH64.hashLong(mins(b * rowsPerBand + r), acc)
        r += 1
      }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }

  /** array<long> of `bands` LSH bucket ids for an array<string> of shingles. */
  def bandMinhash(shingles: Column, numHashes: Int, bands: Int): Column =
    GraftSql.column(BandMinhash(GraftSql.expression(shingles), numHashes, bands))
}
