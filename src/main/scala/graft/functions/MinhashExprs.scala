package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** One-pass MinHash band hashes as a codegen'd Catalyst expression, in an
  * ENGINE-PORTABLE hash family.
  *
  * For an `array<string>` of shingles, computes `numHashes` minhashes and
  * folds each band's `numHashes / bands` minhashes into one 60-bit band
  * bucket id, returning `array<long>` of length `bands`.
  *
  * Hash family (all arithmetic mod 2^60, so any SQL engine replays it with
  * no unsigned/overflow semantics in the way):
  *   - base(shingle)  = first 60 bits of sha256(shingle)  — the same
  *     portable scheme as [[graft.operators.TextAnalytics.hash60]];
  *   - h_k(base)      = (A_k * base + B_k) mod 2^60, A_k odd < 2^30 —
  *     a per-k affine permutation of the 60-bit space. The 30-bit
  *     multiplier bound lets DuckDB compute A*x mod 2^60 exactly via a
  *     split multiply (A*x0 + ((A*x1 mod 2^30) << 30), all intermediates
  *     < 2^62) with checked BIGINT arithmetic;
  *   - band fold      = acc := (M * (acc XOR m_k) + C) mod 2^60 over the
  *     band's minhashes, acc_0 = 42.
  *
  * [[sqlLcg]] / [[sqlMix]] emit the matching DuckDB SQL, so the q19 oracle
  * replays the banding bit-for-bit (the previous XXH64 family was
  * Spark-internal and forced a rows-only check).
  *
  * This replaces a nested higher-order-function formulation that evaluated
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

/** The raw `numHashes` minhashes with NO band fold — the shared signature a
  * banding-parameter study computes once and then folds per candidate
  * (bands, rowsPerBand) config via [[BandFold]]. Same hash family as
  * [[BandMinhash]] (sha256 base + mod-2^60 affine permutations), so a SQL
  * oracle replays it from the same `mins` CTE the q19 banding uses.
  */
case class RawMinhash(child: Expression, numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "raw_minhash"

  override protected def nullSafeEval(input: Any): Any =
    BandMinhash.rawMins(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BandMinhash$$.MODULE$$.rawMins($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Folds an `array<long>` of raw minhashes ([[RawMinhash]]) into `bands`
  * 60-bit band bucket ids — exactly [[BandMinhash]]'s fold, split out so
  * one signature pass can be banded under several (bands, rowsPerBand)
  * configurations. `BandFold(RawMinhash(sh, n), b) == BandMinhash(sh, n, b)`
  * element-for-element (KernelsSpec pins the identity).
  */
case class BandFold(child: Expression, bands: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "band_fold"

  override protected def nullSafeEval(input: Any): Any =
    BandMinhash.foldBands(input.asInstanceOf[ArrayData], bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BandMinhash$$.MODULE$$.foldBands($c, $bands)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BandMinhash {
  val Mask60: Long = (1L << 60) - 1
  val FoldSeed: Long = 42L
  val MixMul: Long = deriveOdd30(9001)
  val MixAdd: Long = derive60(9002)

  /** Deterministic constant streams (fixed LCG over the index — no RNG
    * state, stable across sessions/engines; same discipline as
    * [[graft.operators.Similarity.planeComponent]]).
    */
  private def scramble(i: Long): Long = {
    var x = i * 6364136223846793005L + 1442695040888963407L
    x ^= (x >>> 29); x *= -5840758589994634535L; x ^= (x >>> 32)
    x
  }
  private def deriveOdd30(i: Int): Long = (scramble(i.toLong) & 0x3fffffffL) | 1L
  private def derive60(i: Int): Long = scramble(i.toLong + 4096L) & Mask60

  /** Per-hash multiplier A_k: odd, < 2^30. */
  def mulConst(k: Int): Long = deriveOdd30(k)
  /** Per-hash addend B_k: < 2^60. */
  def addConst(k: Int): Long = derive60(k)

  /** (A * x + B) mod 2^60 — JVM wrap-around at 2^64 then masking to 60
    * bits is exact because 2^60 | 2^64.
    */
  @inline private def lcg(a: Long, x: Long, b: Long): Long = (a * x + b) & Mask60

  /** The k-th minhash's SQL form over a non-negative 60-bit BIGINT `x`:
    * split multiply keeps every intermediate < 2^62 under DuckDB's checked
    * BIGINT arithmetic.
    */
  def sqlLcg(k: Int, x: String): String = sqlAffine(mulConst(k), addConst(k), x)

  /** The band-fold step's SQL form: mix(acc, m) = (M*(acc XOR m)+C) mod 2^60. */
  def sqlMix(acc: String, m: String): String =
    sqlAffine(MixMul, MixAdd, s"xor($acc, $m)")

  private def sqlAffine(a: Long, b: Long, x: String): String =
    s"(($a * (($x) & 1073741823) + ((($a * (($x) >> 30)) & 1073741823) << 30) + $b) & $Mask60)"

  def compute(shingles: ArrayData, numHashes: Int, bands: Int): ArrayData = {
    val n = shingles.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = shingles.getUTF8String(i)
      val base = Sha256.hash60(s.getBytes)
      var k = 0
      while (k < numHashes) {
        val hk = lcg(mulConst(k), base, addConst(k))
        if (hk < mins(k)) mins(k) = hk
        k += 1
      }
      i += 1
    }
    val rowsPerBand = numHashes / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = FoldSeed
      var r = 0
      while (r < rowsPerBand) {
        acc = lcg(MixMul, acc ^ mins(b * rowsPerBand + r), MixAdd)
        r += 1
      }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }

  /** The minhash loop of [[compute]] without the band fold. */
  def rawMins(shingles: ArrayData, numHashes: Int): ArrayData = {
    val n = shingles.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = shingles.getUTF8String(i)
      val base = Sha256.hash60(s.getBytes)
      var k = 0
      while (k < numHashes) {
        val hk = lcg(mulConst(k), base, addConst(k))
        if (hk < mins(k)) mins(k) = hk
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** The band fold of [[compute]] over precomputed raw minhashes. */
  def foldBands(mins: ArrayData, bands: Int): ArrayData = {
    val numHashes = mins.numElements()
    require(numHashes % bands == 0, "mins length must be divisible by bands")
    val rowsPerBand = numHashes / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = FoldSeed
      var r = 0
      while (r < rowsPerBand) {
        acc = lcg(MixMul, acc ^ mins.getLong(b * rowsPerBand + r), MixAdd)
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

  /** array<long> of the raw `numHashes` minhashes (no fold). */
  def rawMinhashCol(shingles: Column, numHashes: Int): Column =
    GraftSql.column(RawMinhash(GraftSql.expression(shingles), numHashes))

  /** array<long> of `bands` bucket ids folded from raw minhashes. */
  def bandFoldCol(mins: Column, bands: Int): Column =
    GraftSql.column(BandFold(GraftSql.expression(mins), bands))
}

/** Shared sha256 kernel helpers (thread-local digest — MessageDigest is
  * not thread-safe and per-call getInstance costs an allocation in the
  * per-token hot loop).
  */
object Sha256 {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("SHA-256")
  }

  /** First 60 bits of sha256(bytes) — numerically equal to DuckDB/Spark
    * `CAST('0x' || substr(sha256(x), 1, 15) AS BIGINT)` (15 hex chars =
    * first 7.5 bytes = big-endian first 8 bytes >>> 4).
    */
  def hash60(bytes: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    val h = md.digest(bytes)
    val hi =
      ((h(0) & 0xffL) << 56) | ((h(1) & 0xffL) << 48) | ((h(2) & 0xffL) << 40) |
        ((h(3) & 0xffL) << 32) | ((h(4) & 0xffL) << 24) | ((h(5) & 0xffL) << 16) |
        ((h(6) & 0xffL) << 8) | (h(7) & 0xffL)
    hi >>> 4
  }
}
