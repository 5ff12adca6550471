package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic dev-mode text embedding.
  *
  * Reproduces the reference's dev-mode vector generator bit-for-bit
  * (reference: worker/app/services/embed_ollama.py:45-51): with
  * `h = sha256(utf8(text))` (32 digest bytes), `vec[i] = h[i mod 32] / 256.0`
  * for `i < dim`; the reference default dim is 768
  * (worker/app/config.py:41-42).
  *
  * This is the oracle-testable stand-in for the real embedding stage; the
  * production path swaps in a `mapPartitions` batch call to a model server
  * behind the same column contract (SURVEY §2.8 T3). Values are exact in
  * binary floating point (integer / 2^8), so Spark and any SQL oracle agree
  * with no rounding.
  */
case class DevEmbed(child: Expression, dim: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "dev_embed"

  override protected def nullSafeEval(input: Any): Any =
    DevEmbed.compute(input.asInstanceOf[UTF8String], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.operators.DevEmbed$$.MODULE$$.compute($c, $dim)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DevEmbed {
  val DefaultDim = 768

  def compute(text: UTF8String, dim: Int): ArrayData = {
    val h = MessageDigest.getInstance("SHA-256").digest(text.getBytes)
    val out = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      out(i) = (h(i % 32) & 0xff) / 256.0
      i += 1
    }
    new GenericArrayData(out)
  }

  /** array<double> embedding column. */
  def devEmbed(text: Column, dim: Int = DefaultDim): Column =
    GraftSql.column(DevEmbed(GraftSql.expression(text), dim))
}
