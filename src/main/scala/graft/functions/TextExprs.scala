package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd text-analysis kernels.
  *
  * Spark higher-order-function lambdas (`transform`/`aggregate`/`filter`)
  * are CodegenFallback — always interpreted. The nested-HOF SimHash
  * formulation cost ~4 s at sf0.1 in the q30 hot path; the identical
  * arithmetic as one JVM loop invoked from generated code is ~O(100x)
  * cheaper (same precedent as [[BandMinhash]]: 19 s → 1 s).
  */

/** 60-bit SimHash over an `array<long>` of 60-bit token hashes: per bit
  * position, tokens vote +1/−1 by their bit; the fingerprint sets bits
  * with a non-negative vote. Bit-identical to the previous HOF
  * formulation and to the DuckDB oracle's SQL expansion (q20/q30).
  */
case class SimHash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override protected def nullSafeEval(input: Any): Any =
    SimHash60.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash60$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash60 {
  def compute(hs: ArrayData): Long = {
    val n = hs.numElements()
    val ones = new Array[Int](60)
    var j = 0
    while (j < n) {
      val h = hs.getLong(j)
      var i = 0
      while (i < 60) {
        ones(i) += ((h >>> i) & 1L).toInt
        i += 1
      }
      j += 1
    }
    // vote = 2*ones - n; bit set when vote >= 0
    var fp = 0L
    var i = 0
    while (i < 60) {
      if (2 * ones(i) - n >= 0) fp |= (1L << i)
      i += 1
    }
    fp
  }

  def simhash60(tokenHashes: Column): Column =
    GraftSql.column(SimHash60(GraftSql.expression(tokenHashes)))
}

/** 60-bit SimHash straight from a text column in ONE per-row pass:
  * tokenize (split trimmed text on single spaces — identical to
  * `split(trim(text), " ")`), distinct, sha256-based 60-bit token hash
  * ([[Sha256.hash60]], the portable `hash60` scheme), per-bit ±1 votes.
  *
  * Replaces the explode → groupBy(doc) → collect_list(h) → simhash(hs)
  * assembly, which moved EVERY token hash of the corpus through a shuffle
  * and built per-doc arrays in aggregation buffers — at 100 TB that is a
  * token-level exchange where a narrow map suffices. Bit-identical to the
  * q20/q30 DuckDB oracle's SQL expansion.
  */
case class SimHashText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_text"

  override protected def nullSafeEval(input: Any): Any =
    SimHashText.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashText$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashText {
  def compute(text: UTF8String): Long = {
    // UTF8String.trim() strips ASCII space only — same as Spark's trim();
    // String.split(" ", -1) keeps interior empty tokens — same as Spark's
    // split(_, " ") and DuckDB's string_split(_, ' ').
    val words = text.trim().toString.split(" ", -1)
    val seen = new java.util.HashSet[String](words.length * 2)
    val ones = new Array[Int](60)
    var n = 0
    var j = 0
    while (j < words.length) {
      val w = words(j)
      if (seen.add(w)) {
        n += 1
        val h = Sha256.hash60(w.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var i = 0
        while (i < 60) {
          ones(i) += ((h >>> i) & 1L).toInt
          i += 1
        }
      }
      j += 1
    }
    var fp = 0L
    var i = 0
    while (i < 60) {
      if (2 * ones(i) - n >= 0) fp |= (1L << i)
      i += 1
    }
    fp
  }

  def simhashText(text: Column): Column =
    GraftSql.column(SimHashText(GraftSql.expression(text)))
}

/** Encoding-sniffing text decode of a binary column — the reference's
  * `decode_bytes` waterfall (note_to_json/utils/encoding.py:21-56):
  * strict UTF-8 first, then UTF-16 LE/BE/auto, then cp1252/latin-1;
  * a leading U+FEFF BOM is stripped after decode; a >10% NUL ratio
  * rejects non-UTF-16 candidates (catches UTF-16 bytes that happen to be
  * valid UTF-8); UTF-16 candidates must be ≥50% printable ASCII. A bare
  * `decode(content, 'UTF-8')` silently garbles BOM-prefixed and UTF-16
  * files (reference tests: test_bom_handling.py, test_utf8_and_utf16_files.py).
  */
case class DecodeText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def prettyName: String = "decode_text"

  override protected def nullSafeEval(input: Any): Any =
    DecodeText.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DecodeText$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DecodeText {
  private val Utf16Names = Set("UTF-16LE", "UTF-16BE", "UTF-16")
  private val Encodings =
    Seq("UTF-8", "UTF-16LE", "UTF-16BE", "UTF-16", "windows-1252", "ISO-8859-1")

  private def strictDecode(data: Array[Byte], name: String): Option[String] =
    try {
      val dec = java.nio.charset.Charset.forName(name).newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      Some(dec.decode(java.nio.ByteBuffer.wrap(data)).toString)
    } catch { case _: Exception => None }

  def decodeBytes(data: Array[Byte]): String = {
    Encodings.foreach { enc =>
      strictDecode(data, enc).foreach { decoded0 =>
        val decoded =
          if (decoded0.nonEmpty && decoded0.charAt(0) == '\ufeff') decoded0.substring(1)
          else decoded0
        val ok =
          if (decoded.isEmpty) true
          else {
            val nulls = decoded.count(_ == '\u0000')
            val nullOk = nulls.toDouble / decoded.length <= 0.1 || Utf16Names(enc)
            val printableOk = !Utf16Names(enc) || {
              val printable = decoded.count(c => c >= ' ' && c < 0x7f)
              printable >= decoded.length * 0.5
            }
            nullOk && printableOk
          }
        if (ok) return decoded
      }
    }
    // latin-1 decodes any byte string; unreachable in practice
    new String(data, java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  def compute(data: Array[Byte]): UTF8String =
    UTF8String.fromString(decodeBytes(data))

  def decodeText(content: Column): Column =
    GraftSql.column(DecodeText(GraftSql.expression(content)))
}

/** Sum of per-token character lengths of an `array<string>` — the codegen
  * replacement for `aggregate(transform(toks, length), 0, +)` (q22).
  */
case class SumCharLengths(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "sum_char_lengths"

  override protected def nullSafeEval(input: Any): Any =
    SumCharLengths.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SumCharLengths$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SumCharLengths {
  def compute(toks: ArrayData): Long = {
    val n = toks.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      s += toks.getUTF8String(i).numChars()
      i += 1
    }
    s
  }

  def sumCharLengths(tokens: Column): Column =
    GraftSql.column(SumCharLengths(GraftSql.expression(tokens)))
}

/** Count of tokens (with repeats) contained in a fixed word list — the
  * codegen replacement for `size(filter(toks, array_contains(list, _)))`.
  */
case class WordListHits(child: Expression, words: Seq[String]) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "word_list_hits"

  @transient private lazy val wordSet: java.util.HashSet[UTF8String] = WordListHits.toSet(words)

  override protected def nullSafeEval(input: Any): Any =
    WordListHits.compute(input.asInstanceOf[ArrayData], wordSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordSet", wordSet, "java.util.HashSet")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WordListHits$$.MODULE$$.compute($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordListHits {
  def toSet(words: Seq[String]): java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  def compute(toks: ArrayData, words: java.util.HashSet[UTF8String]): Int = {
    val n = toks.numElements()
    var hits = 0
    var i = 0
    while (i < n) {
      if (words.contains(toks.getUTF8String(i))) hits += 1
      i += 1
    }
    hits
  }

  def wordListHits(tokens: Column, words: Seq[String]): Column =
    GraftSql.column(WordListHits(GraftSql.expression(tokens), words))
}
