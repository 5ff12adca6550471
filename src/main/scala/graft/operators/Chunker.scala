package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Sliding-window text chunker — the reference's core dataflow operator.
  *
  * Semantics contract (reference: worker/app/services/chunker.py:56-131,
  * defaults CHUNK_SIZE=800 / CHUNK_OVERLAP=100 at worker/app/config.py:49-51):
  *  - whitespace runs collapse to a single space, text is trimmed;
  *  - each window is at most `size` chars; if the window does not reach the
  *    end of text, the cut prefers the LAST space strictly inside the window
  *    (index > 0 within the window), else a hard cut at `size`;
  *  - next window starts at `end - overlap`, with forward-progress guards
  *    (overlap clamped to size-1; fallback advance by `size - overlap`);
  *  - chunks are trimmed; empty chunks are dropped; the final chunk may be
  *    short. Boundary goldens pinned by reference unit tests
  *    (worker/tests/test_process_unit.py:32-56) are replicated in
  *    ChunkerSpec.
  *
  * Exposed as a Catalyst expression returning `array<string>`; pair with
  * `posexplode` to get `(idx, chunk)` rows — Spark's generate path handles
  * distribution, so chunking 100 TB of documents is a narrow map with no
  * shuffle.
  */
object Chunker {
  val DefaultSize = 800
  val DefaultOverlap = 100

  private val WsRe = "(?U)\\s+".r

  /** Collapse whitespace runs to single spaces and trim
    * (reference: worker/app/services/chunker.py:17-29).
    */
  def normalize(text: String): String =
    if (text == null || text.isEmpty) "" else WsRe.replaceAllIn(text, " ").trim

  /** Deterministic cut point in [start, start+size): last space strictly
    * inside the window, else hard cut (chunker.py:32-53). Indices are
    * CODEPOINT positions: Python slices by codepoint, so astral-plane
    * characters (emoji) must count as one unit, not a UTF-16 pair.
    */
  private def nextCut(cps: Array[Int], start: Int, size: Int): Int = {
    val end = math.min(start + size, cps.length)
    if (end >= cps.length) cps.length
    else {
      var wsPos = -1
      var i = end - 1
      while (i > start && wsPos < 0) { if (cps(i) == ' ') wsPos = i; i -= 1 }
      if (wsPos > start) wsPos else end // space at window index 0 is rejected
    }
  }

  def chunkText(
      text: String,
      size: Int = DefaultSize,
      overlap: Int = DefaultOverlap,
      normalizeWhitespace: Boolean = true): Seq[String] = {
    if (text == null || text.isEmpty) return Nil
    val t = if (normalizeWhitespace) normalize(text) else text
    if (size <= 0 || t.isEmpty) return Nil

    var ov = math.max(0, overlap)
    if (ov >= size) ov = math.max(0, size - 1)
    val step = math.max(1, size - ov)
    val cps = t.codePoints().toArray
    val n = cps.length
    val out = ArrayBuffer.empty[String]
    def slice(from: Int, until: Int): String =
      new String(cps, from, until - from)

    var start = 0
    var prevStart = -1
    var done = false
    while (start < n && !done) {
      var end = nextCut(cps, start, size)
      if (end <= start) end = math.min(start + size, n)

      val chunk = slice(start, end).trim
      if (chunk.nonEmpty) out += chunk

      if (end >= n) done = true
      else {
        var next = end - ov
        if (next <= start) next = start + step
        if (next <= prevStart) next = if (prevStart >= 0) prevStart + step else start + step
        prevStart = start
        start = math.min(next, n)
      }
    }
    out.toSeq
  }

  /** Chat-aware chunker: packs `\n\n`-separated message blocks up to `size`
    * chars; an oversized message is split with its header line repeated on
    * every piece, preferring a newline cut past half the available window
    * (reference: worker/app/services/chunker.py:134-253). All sizes and
    * slices are CODEPOINT-based like Python's — UTF-16 slicing would both
    * shift boundaries and cut surrogate pairs in half.
    */
  def chunkChatMessages(
      text: String,
      size: Int = DefaultSize): Seq[String] = {
    if (text == null || text.isEmpty || size <= 0) return Nil

    def cpLen(s: String): Int = s.codePointCount(0, s.length)

    val blocks = text.split("\n\n", -1)
    val chunks = ArrayBuffer.empty[String]
    val current = ArrayBuffer.empty[String]
    var currentSize = 0

    def flush(): Unit = if (current.nonEmpty) {
      chunks += current.mkString("\n\n")
      current.clear()
      currentSize = 0
    }

    for (raw <- blocks) {
      val block = raw.trim
      if (block.nonEmpty) {
        val blockSize = cpLen(block)
        if (blockSize > size) {
          // split oversized message, repeating its header on every piece
          val (header, content) = block.split("\n", 2) match {
            case Array(h, c) => (h + "\n", c)
            case _ =>
              val colon = block.indexOf(": ")
              if (colon > 0) (block.substring(0, colon + 2), block.substring(colon + 2))
              else {
                val cut = block.offsetByCodePoints(0, math.min(50, cpLen(block)))
                (block.substring(0, cut) + ": ", block.substring(cut))
              }
          }
          flush()
          val available = math.max(1, size - cpLen(header))
          val cps = content.codePoints().toArray
          def slice(from: Int, until: Int): String = new String(cps, from, until - from)
          var cs = 0
          while (cs < cps.length) {
            if (cs + available < cps.length) {
              var lastNl = -1
              var i = cs + available - 1
              while (i >= cs && lastNl < 0) { if (cps(i) == '\n') lastNl = i - cs; i -= 1 }
              if (lastNl > available / 2) {
                chunks += header + slice(cs, cs + lastNl + 1)
                cs += lastNl + 1
              } else {
                chunks += header + slice(cs, cs + available)
                cs += available
              }
            } else {
              chunks += header + slice(cs, cps.length)
              cs = cps.length
            }
          }
        } else {
          // NB: the separator size is computed BEFORE the flush decision and
          // still added afterwards — reproducing chunker.py:237-247 exactly.
          val separatorSize = if (current.nonEmpty) 2 else 0
          if (currentSize + separatorSize + blockSize > size) flush()
          current += block
          currentSize += separatorSize + blockSize
        }
      }
    }
    flush()
    chunks.toSeq
  }

  /** array<string> of chunks, for `posexplode` into (idx, chunk) rows. */
  def chunkTextCol(text: Column, size: Int, overlap: Int): Column =
    GraftSql.column(ChunkText(GraftSql.expression(text), size, overlap))

  def chunkChatCol(text: Column, size: Int): Column =
    GraftSql.column(ChunkChat(GraftSql.expression(text), size))
}

/** `chunk_text(text)` ➜ array<string> (see [[Chunker.chunkText]]). */
case class ChunkText(child: Expression, size: Int, overlap: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "chunk_text"

  override protected def nullSafeEval(input: Any): Any =
    ChunkText.compute(input.asInstanceOf[UTF8String], size, overlap)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.operators.ChunkText$$.MODULE$$.compute($c, $size, $overlap)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ChunkText {
  def compute(text: UTF8String, size: Int, overlap: Int): ArrayData = {
    val chunks = Chunker.chunkText(text.toString, size, overlap)
    new GenericArrayData(chunks.map(UTF8String.fromString).toArray[Any])
  }
}

/** `chunk_chat(text)` ➜ array<string> (see [[Chunker.chunkChatMessages]]). */
case class ChunkChat(child: Expression, size: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "chunk_chat"

  override protected def nullSafeEval(input: Any): Any =
    ChunkChat.compute(input.asInstanceOf[UTF8String], size)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.operators.ChunkChat$$.MODULE$$.compute($c, $size)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ChunkChat {
  def compute(text: UTF8String, size: Int): ArrayData = {
    val chunks = Chunker.chunkChatMessages(text.toString, size)
    new GenericArrayData(chunks.map(UTF8String.fromString).toArray[Any])
  }
}
