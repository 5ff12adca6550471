package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of trimmed text, as one codegen'd pass.
  *
  * Equivalent to `array_distinct(transform(sequence(...), i =>
  * concat_ws(' ', words[i..i+n-1])))` over `split(trim(text), ' ')` — but
  * Spark higher-order functions are interpreted (CodegenFallback), and that
  * formulation dominated the near-dup pipeline's runtime. Order is first
  * occurrence; texts under n words yield an empty array.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.operators.WordShingles$$.MODULE$$.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {
  def compute(text: UTF8String, n: Int): ArrayData = {
    // UTF8String.trim() strips ASCII space only and split(" ", -1) keeps
    // empty tokens — same semantics as Spark's trim()/split(_, " ") and the
    // DuckDB oracle's trim()/string_split(_, ' '). Java String.trim +
    // split(' ') would strip \t/\n and drop trailing empties, silently
    // diverging the cross-engine LSH replay on such data (mirrors
    // SimHashText, TextExprs.scala).
    val words = text.trim().toString.split(" ", -1)
    if (words.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new mutable.LinkedHashSet[String]
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= words.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    new GenericArrayData(seen.iterator.map(UTF8String.fromString).toArray[Any])
  }

  /** Distinct word n-gram shingles of a text column. */
  def wordShingles(text: Column, n: Int = 3): Column =
    GraftSql.column(WordShingles(GraftSql.expression(text), n))
}
