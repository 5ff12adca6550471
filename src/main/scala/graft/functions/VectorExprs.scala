package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Dense-vector kernels as codegen'd Catalyst expressions.
  *
  * The reference's only scoring primitive is cosine similarity, delegated to
  * its vector store (reference: worker/app/qdrant_init.py:32-43 configures
  * cosine distance). Re-expressed Spark-side as a tight `double[]` loop
  * invoked from generated code — no UDF serialization, no higher-order-
  * function per-element overhead — so a brute-force scan stays
  * memory-bandwidth-bound at scale.
  *
  * Inputs must be `array<double>` (cast float embeddings once, at scan time).
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  protected def staticCall: String

  override protected def nullSafeEval(a: Any, b: Any): Any =
    evalArrays(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  protected def evalArrays(a: ArrayData, b: ArrayData): Double

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"$staticCall($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    withNewChildren(Seq(newLeft, newRight)).asInstanceOf[Expression]
}

case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "cosine_similarity"
  override protected def staticCall: String = "graft.functions.VectorKernels.cosine"
  override protected def evalArrays(a: ArrayData, b: ArrayData): Double =
    VectorKernels.cosine(a, b)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "dot_product"
  override protected def staticCall: String = "graft.functions.VectorKernels.dot"
  override protected def evalArrays(a: ArrayData, b: ArrayData): Double =
    VectorKernels.dot(a, b)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `l2_normalize(vec)` ➜ unit-length array<double> (zero vector stays
  * zero). Normalizing at write time turns every cosine into a plain dot
  * product — half the flops on the 100 TB scan path (SURVEY §4.2) — and
  * feeds spherical k-means without interpreted higher-order functions.
  */
case class L2Normalize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "l2_normalize"

  override protected def nullSafeEval(input: Any): Any =
    VectorKernels.l2Normalize(input.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorKernels.l2Normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `nearest_cell(vec)` ➜ index of the nearest centroid (spherical k-means
  * cell) under squared Euclidean distance on the L2-normalized vector,
  * computed via the engine-portable identity `d² = 1 + ‖c‖² − 2·(nv·c)`
  * (‖nv‖ = 1) with the centroid norms precomputed as literals. MLlib's own
  * `model.transform` assignment goes through `fastSquaredDistance` (norm
  * cache + error-corrected dot trick) that no other engine reproduces
  * bit-for-bit; this kernel's arithmetic is three IEEE ops a SQL oracle
  * replays exactly (`1.0 + n2 - 2.0*list_inner_product(nv, c)`), making
  * cell assignment — and therefore IVF probe results — cross-engine
  * deterministic, the same portability contract as the minhash/LSH
  * families. Ties keep the lowest centroid index (= the oracle's
  * first-position-of-min).
  */
case class NearestCell(child: Expression, centroids: Array[Array[Double]],
    cnorm2: Array[Double])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "nearest_cell"

  override protected def nullSafeEval(input: Any): Any =
    VectorKernels.nearestCell(input.asInstanceOf[ArrayData], centroids, cnorm2)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val nRef = ctx.addReferenceObj("cnorm2", cnorm2, "double[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VectorKernels.nearestCell($c, $cRef, $nRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Symmetric int8 quantization kernels (`scale = max|x|/127`,
  * `q = clamp(floor(x/scale + 0.5))`, `deq = q·scale`): 4× smaller
  * embeddings at rest — the storage move a 100 TB vector corpus makes —
  * with the SAME engine-portable arithmetic discipline as every other
  * kernel (floor-based half-up rounding, clamp after floor), so a SQL
  * oracle replays quantization bit-for-bit.
  */
case class I8Scale(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "i8_scale"
  override protected def nullSafeEval(input: Any): Any =
    VectorKernels.i8Scale(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorKernels.i8Scale($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class I8Quantize(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.ByteType, containsNull = false)
  override def prettyName: String = "i8_quantize"
  override protected def nullSafeEval(v: Any, s: Any): Any =
    VectorKernels.i8Quantize(v.asInstanceOf[ArrayData], s.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, s) => s"graft.functions.VectorKernels.i8Quantize($v, $s)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `i8_dot(a, b)` ➜ exact integer dot product of two array<tinyint>
  * vectors (≤ 127²·dim, far inside long range). The int8 scoring path:
  * `approx_cos ≈ idot · scale_a · scale_b` over at-rest quantized
  * vectors reads 4× fewer bytes than the float scan and its integer
  * accumulation is EXACT — bit-identical on every engine, no float-order
  * pinning needed.
  */
case class I8Dot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "i8_dot"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.i8Dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernels.i8Dot($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class I8Dequant(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "i8_dequant"
  override protected def nullSafeEval(q: Any, s: Any): Any =
    VectorKernels.i8Dequant(q.asInstanceOf[ArrayData], s.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (q, s) => s"graft.functions.VectorKernels.i8Dequant($q, $s)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Product-quantization kernels: [[PqEncode]] maps an (L2-normalized)
  * vector to `m` sub-codebook indices — `array<tinyint>`, dim·8 bytes →
  * m bytes, 32× at (64 dims, m=8) — and [[PqAdc]] scores codes against a
  * query's precomputed lookup table (asymmetric distance computation).
  * The 100 TB shape: candidate generation scans ONLY the codes column
  * (a ~3 % slice of the vector bytes), the exact rerank joins the few
  * surviving ids back to full vectors. Assignment uses the portable
  * per-subspace identity `argmin_c ‖c‖² − 2·(sub·c)` (the ‖sub‖² term is
  * constant per row-subspace, so the argmin is the true nearest centroid)
  * — replayable in SQL from the exported codebook literals, same contract
  * as [[NearestCell]]. Ties keep the lowest code. Reference analog: the
  * vector store's quantization config (qdrant_client.py collection
  * schema); re-expressed as write-time columnar codes.
  */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]],
    cnorm2: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.ByteType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(input: Any): Any =
    VectorKernels.pqEncode(input.asInstanceOf[ArrayData], codebooks, cnorm2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    val n2Ref = ctx.addReferenceObj("cnorm2", cnorm2, "double[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VectorKernels.pqEncode($c, $cbRef, $n2Ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `pq_rec_error(v)` ➜ Σ_m min_c ‖sub_m − c‖² — the reconstruction
  * (quantization) error of a pre-normalized vector under the codebooks.
  * This is the codebook-QUALITY signal the incremental PQ store tracks:
  * appended-fraction drift says how MUCH new data arrived, this says how
  * WELL the frozen codebooks still fit it — a distribution shift costs
  * ADC precision silently (recall guards only catch it at test scale),
  * so the store compares the appended rows' mean error against the
  * training-time mean and retrains past a ratio threshold.
  */
case class PqRecError(child: Expression, codebooks: Array[Array[Array[Double]]],
    cnorm2: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_rec_error"

  override protected def nullSafeEval(input: Any): Any =
    VectorKernels.pqRecError(input.asInstanceOf[ArrayData], codebooks, cnorm2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    val n2Ref = ctx.addReferenceObj("cnorm2", cnorm2, "double[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VectorKernels.pqRecError($c, $cbRef, $n2Ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `pq_adc(codes)` ➜ Σ_m lut[m][codes[m]], accumulated in ascending
  * subspace order (the order the SQL replay's left-associative `+` chain
  * uses). With `lut[m][c] = qn_m · codebook[m][c]` this approximates the
  * query-to-vector inner product (= cosine, both sides normalized).
  */
case class PqAdc(child: Expression, lut: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override protected def nullSafeEval(input: Any): Any =
    VectorKernels.pqAdc(input.asInstanceOf[ArrayData], lut)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lutRef = ctx.addReferenceObj("lut", lut, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorKernels.pqAdc($c, $lutRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Static (Java-callable) kernels referenced from generated code. */
object VectorKernels {
  def l2Normalize(a: ArrayData): ArrayData = {
    val x = a.toDoubleArray()
    var n = 0.0
    var i = 0
    while (i < x.length) { n += x(i) * x(i); i += 1 }
    val inv = if (n == 0.0) 0.0 else 1.0 / math.sqrt(n)
    val out = new Array[Double](x.length)
    i = 0
    while (i < x.length) { out(i) = x(i) * inv; i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
  def dot(a: ArrayData, b: ArrayData): Double = {
    val x = a.toDoubleArray()
    val y = b.toDoubleArray()
    val n = math.min(x.length, y.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += x(i) * y(i); i += 1 }
    s
  }

  /** Squared-distance-on-the-unit-sphere to each centroid via
    * `1 + ‖c‖² − 2·(nv·c)` where `nv = x·(1/√Σx²)` — each element
    * normalized with ONE rounding (multiply by the precomputed inverse),
    * matching the SQL replay `x * (1.0/sqrt(list_inner_product(v,v)))`.
    */
  def nearestCell(a: ArrayData, cs: Array[Array[Double]], cn2: Array[Double]): Int = {
    val x = a.toDoubleArray()
    var n = 0.0
    var i = 0
    while (i < x.length) { n += x(i) * x(i); i += 1 }
    val inv = if (n == 0.0) 0.0 else 1.0 / math.sqrt(n)
    var best = 0
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < cs.length) {
      val cc = cs(c)
      // dim drift between a store's vectors and its trained centroids must
      // fail loudly — a truncated dot product silently assigns plausible
      // but wrong cells, corrupting every probe of the store
      if (x.length != cc.length)
        throw new IllegalArgumentException(
          s"nearest_cell: vector dim ${x.length} != centroid dim ${cc.length}")
      var dot = 0.0
      var j = 0
      val m = x.length
      while (j < m) { dot += (x(j) * inv) * cc(j); j += 1 }
      val d = 1.0 + cn2(c) - 2.0 * dot
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  def i8Scale(a: ArrayData): Double = {
    val x = a.toDoubleArray()
    var m = 0.0
    var i = 0
    while (i < x.length) { val v = math.abs(x(i)); if (v > m) m = v; i += 1 }
    m / 127.0
  }

  def i8Quantize(a: ArrayData, scale: Double): ArrayData = {
    val x = a.toDoubleArray()
    val out = new Array[Any](x.length)
    var i = 0
    while (i < x.length) {
      val q =
        if (scale == 0.0) 0.0
        else math.max(-127.0, math.min(127.0, math.floor(x(i) / scale + 0.5)))
      out(i) = q.toByte
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def i8Dot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += a.getByte(i).toLong * b.getByte(i).toLong; i += 1 }
    s
  }

  def i8Dequant(q: ArrayData, scale: Double): ArrayData = {
    val n = q.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = q.getByte(i) * scale; i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Per-subspace nearest-codebook-entry indices of a pre-normalized
    * vector. `codebooks(m)(c)` is the c-th centroid of subspace m;
    * `cn2(m)(c) = ‖codebooks(m)(c)‖²` precomputed ascending-index (the
    * literals the SQL replay embeds). Strict `<` keeps the FIRST minimum —
    * DuckDB's `list_position(ds, list_min(ds))`.
    */
  def pqEncode(a: ArrayData, cbs: Array[Array[Array[Double]]],
      cn2: Array[Array[Double]]): ArrayData = {
    val x = a.toDoubleArray()
    val m = cbs.length
    val dsub = if (m == 0) 0 else cbs(0)(0).length
    if (x.length != m * dsub)
      throw new IllegalArgumentException(
        s"pq_encode: vector dim ${x.length} != m*dsub ${m * dsub}")
    val out = new Array[Any](m)
    var mi = 0
    while (mi < m) {
      val cb = cbs(mi)
      val n2 = cn2(mi)
      val off = mi * dsub
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < cb.length) {
        val cc = cb(c)
        var dot = 0.0
        var j = 0
        while (j < dsub) { dot += x(off + j) * cc(j); j += 1 }
        val d = n2(c) - 2.0 * dot
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(mi) = best.toByte
      mi += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Reconstruction error: per subspace, `‖sub‖² + min_c (‖c‖² − 2·sub·c)`
    * — the same argmin scan as [[pqEncode]], keeping the min VALUE instead
    * of its index. Tiny negative FP residue clamps to 0.
    */
  def pqRecError(a: ArrayData, cbs: Array[Array[Array[Double]]],
      cn2: Array[Array[Double]]): Double = {
    val x = a.toDoubleArray()
    val m = cbs.length
    val dsub = if (m == 0) 0 else cbs(0)(0).length
    if (x.length != m * dsub)
      throw new IllegalArgumentException(
        s"pq_rec_error: vector dim ${x.length} != m*dsub ${m * dsub}")
    var err = 0.0
    var mi = 0
    while (mi < m) {
      val cb = cbs(mi)
      val n2 = cn2(mi)
      val off = mi * dsub
      var sub2 = 0.0
      var j = 0
      while (j < dsub) { sub2 += x(off + j) * x(off + j); j += 1 }
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < cb.length) {
        val cc = cb(c)
        var dot = 0.0
        var k = 0
        while (k < dsub) { dot += x(off + k) * cc(k); k += 1 }
        val d = n2(c) - 2.0 * dot
        if (d < bestD) bestD = d
        c += 1
      }
      err += sub2 + bestD
      mi += 1
    }
    if (err < 0.0) 0.0 else err
  }

  /** ADC score: ascending-m accumulation of the query LUT at each code. A
    * code outside the trained codebook (layout drift between a codes table
    * and its codebook artifact) fails loudly, like [[nearestCell]]'s dim
    * check — a silent modulo would score plausible-but-wrong cells.
    */
  def pqAdc(codes: ArrayData, lut: Array[Array[Double]]): Double = {
    val m = codes.numElements()
    if (m != lut.length)
      throw new IllegalArgumentException(
        s"pq_adc: ${m} codes != ${lut.length} subspaces")
    var s = 0.0
    var mi = 0
    while (mi < m) {
      val c = codes.getByte(mi).toInt
      val l = lut(mi)
      if (c < 0 || c >= l.length)
        throw new IllegalArgumentException(
          s"pq_adc: code $c out of range [0, ${l.length}) in subspace $mi")
      s += l(c)
      mi += 1
    }
    s
  }

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val x = a.toDoubleArray()
    val y = b.toDoubleArray()
    val n = math.min(x.length, y.length)
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) { dot += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i); i += 1 }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
  }
}

object VectorFunctions {
  private def toExpr(c: Column): Expression = GraftSql.expression(c)

  /** Cosine similarity of two array<double> columns. */
  def cosine(a: Column, b: Column): Column =
    GraftSql.column(CosineSimilarity(toExpr(a), toExpr(b)))

  /** Dot product of two array<double> columns (== cosine for pre-normalized
    * vectors — normalize at write time to halve scan cost, SURVEY §4.2).
    */
  def dot(a: Column, b: Column): Column =
    GraftSql.column(DotProduct(toExpr(a), toExpr(b)))

  /** Unit-length normalization of an array<double> column. */
  def l2Normalize(a: Column): Column =
    GraftSql.column(L2Normalize(toExpr(a)))

  /** Centroid norms ‖c‖² (ascending-index accumulation — the values the
    * [[NearestCell]] replay embeds as literals).
    */
  def centroidNorm2(cs: Array[Array[Double]]): Array[Double] =
    cs.map { c =>
      var s = 0.0
      var j = 0
      while (j < c.length) { s += c(j) * c(j); j += 1 }
      s
    }

  /** Nearest spherical-k-means cell of an array<double> column. */
  def nearestCell(a: Column, centroids: Array[Array[Double]]): Column =
    GraftSql.column(NearestCell(toExpr(a), centroids, centroidNorm2(centroids)))

  /** Per-subspace codebook norms ‖c‖² (the [[PqEncode]] literals). */
  def codebookNorm2(cbs: Array[Array[Array[Double]]]): Array[Array[Double]] =
    cbs.map(centroidNorm2)

  /** PQ codes (array<tinyint>, one per subspace) of a pre-normalized
    * array<double> column.
    */
  def pqEncode(a: Column, codebooks: Array[Array[Array[Double]]]): Column =
    GraftSql.column(PqEncode(toExpr(a), codebooks, codebookNorm2(codebooks)))

  /** ADC score of a codes column against a query lookup table. */
  def pqAdc(codes: Column, lut: Array[Array[Double]]): Column =
    GraftSql.column(PqAdc(toExpr(codes), lut))

  /** Quantization error of a pre-normalized array<double> column under
    * the codebooks (codebook-quality drift signal).
    */
  def pqRecError(a: Column, codebooks: Array[Array[Array[Double]]]): Column =
    GraftSql.column(PqRecError(toExpr(a), codebooks, codebookNorm2(codebooks)))

  /** Symmetric int8 quantization scale (max|x|/127) of a vector column. */
  def i8Scale(a: Column): Column = GraftSql.column(I8Scale(toExpr(a)))

  /** Quantize a vector to array<tinyint> with a given scale. */
  def i8Quantize(a: Column, scale: Column): Column =
    GraftSql.column(I8Quantize(toExpr(a), toExpr(scale)))

  /** Dequantize array<tinyint> back to array<double>. */
  def i8Dequant(q: Column, scale: Column): Column =
    GraftSql.column(I8Dequant(toExpr(q), toExpr(scale)))

  /** Exact integer dot product of two array<tinyint> columns. */
  def i8Dot(a: Column, b: Column): Column =
    GraftSql.column(I8Dot(toExpr(a), toExpr(b)))
}
