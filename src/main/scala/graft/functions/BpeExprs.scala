package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass BPE merge application (SCALING ledger row 30).
  *
  * The chained form — one `replace(" A  B " -> " AB ")` DataFrame stage per
  * learned merge (`applyMerge` folded over the merge list) — is fine at the
  * shipped K=6 but is a K-operator Catalyst plan: a production 32k-merge
  * vocabulary dies in analysis/codegen long before execution. Production
  * tokenizers apply a LEARNED vocabulary in one pass over each word; this
  * expression is that pass, with semantics pinned byte-identical to the
  * sequential-sweep contract both engines already share:
  *
  *   for rank r in learned order: ONE leftmost-non-overlapping sweep of
  *   merge r over the symbol sequence (exactly what `replace` does on the
  *   space-wrapped symbolization — and what the DuckDB oracle replays).
  *
  * NOT HuggingFace's min-rank-until-fixpoint loop: under sequential-sweep
  * semantics a merge whose turn has passed never re-fires, even if a later
  * merge recreates its pair. The kernel reproduces this with a monotone
  * rank heap: pairs present in the word seed the heap; each pop ≥ the last
  * processed rank runs one sweep; adjacencies created by a sweep push only
  * ranks STRICTLY GREATER than the swept rank (earlier turns are over).
  * Per-word cost is O(symbols² + applies·log) — independent of vocabulary
  * size K, where the chained plan paid K operators and K scheduling floors.
  *
  * The merge table rides an executor-side [[Broadcast]] (torrent-fetched
  * once per executor), not the task closure: at 32k merges the automaton is
  * megabytes, and per-task shipping would re-send it with every batch.
  */
final class BpeAutomaton(val lhs: Array[String], val rhs: Array[String])
    extends Serializable {
  require(lhs.length == rhs.length, "merge table arity mismatch")

  /** pair key -> ranks holding that pair, ascending. Almost always one
    * rank per pair, but a pair STRING can in principle be relearned after
    * later merges recreate its symbols (e.g. "abc" formed by both
    * (a,bc) and (ab,c)) — so the value is the full rank list and lookups
    * take a lower bound.
    */
  private val ranks = new java.util.HashMap[String, Array[Int]](lhs.length * 2)
  locally {
    var i = 0
    while (i < lhs.length) {
      val k = lhs(i) + "\u0000" + rhs(i)
      val prev = ranks.get(k)
      ranks.put(k, if (prev == null) Array(i) else prev :+ i)
      i += 1
    }
  }

  def isEmpty: Boolean = lhs.length == 0

  /** Smallest rank of pair (a, b) strictly greater than `after`, or -1. */
  def rankAfter(a: String, b: String, after: Int): Int = {
    val arr = ranks.get(a + "\u0000" + b)
    if (arr == null) -1
    else {
      var i = 0
      while (i < arr.length) {
        if (arr(i) > after) return arr(i)
        i += 1
      }
      -1
    }
  }
}

/** `apply_bpe(wrapped_symbolization)` — the whole learned merge list in one
  * codegen'd expression. Input/output are the engine-portable space-wrapped
  * symbolizations (`" a  b  c "`) every BPE query already speaks.
  */
case class ApplyBpe(child: Expression, bc: Broadcast[BpeAutomaton])
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "apply_bpe"

  override protected def nullSafeEval(input: Any): Any =
    ApplyBpe.compute(input.asInstanceOf[UTF8String], bc.value)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bpeAuto", bc,
      classOf[Broadcast[BpeAutomaton]].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ApplyBpe$$.MODULE$$.compute($c, " +
        s"(graft.functions.BpeAutomaton)$bcRef.value())")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ApplyBpe {

  /** Split a trimmed wrapped symbolization on its two-space separators.
    * Manual scan (no regex): this runs once per word-table row.
    */
  private def splitSyms(t: String): Array[String] = {
    val out = new java.util.ArrayList[String](8)
    var start = 0
    var i = t.indexOf("  ")
    while (i >= 0) {
      out.add(t.substring(start, i))
      start = i + 2
      i = t.indexOf("  ", start)
    }
    out.add(t.substring(start))
    out.toArray(new Array[String](out.size()))
  }

  def compute(input: UTF8String, auto: BpeAutomaton): UTF8String = {
    val t = input.toString.trim
    if (t.isEmpty) return input
    var syms = splitSyms(t)
    if (syms.length >= 2 && !auto.isEmpty) {
      val pq = new java.util.PriorityQueue[Integer]()
      var i = 0
      while (i < syms.length - 1) {
        val rk = auto.rankAfter(syms(i), syms(i + 1), -1)
        if (rk >= 0) pq.add(rk)
        i += 1
      }
      var last = -1
      while (!pq.isEmpty) {
        val r0 = pq.poll().intValue()
        // monotone pops: duplicates of an already-swept rank are skipped;
        // stale entries (pair gone by its turn) no-op in the sweep below
        if (r0 != last) {
          last = r0
          val a = auto.lhs(r0)
          val b = auto.rhs(r0)
          val out = new java.util.ArrayList[String](syms.length)
          var applied = false
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
              out.add(a + b); applied = true; j += 2
            } else {
              out.add(syms(j)); j += 1
            }
          }
          if (applied) {
            syms = out.toArray(new Array[String](out.size()))
            // re-seed: only ranks whose sequential turn is still ahead
            var k = 0
            while (k < syms.length - 1) {
              val rk = auto.rankAfter(syms(k), syms(k + 1), r0)
              if (rk >= 0) pq.add(rk)
              k += 1
            }
          }
        }
      }
    }
    val sb = new java.lang.StringBuilder(t.length + 2)
    sb.append(' ')
    var m = 0
    while (m < syms.length) {
      if (m > 0) sb.append("  ")
      sb.append(syms(m))
      m += 1
    }
    sb.append(' ')
    UTF8String.fromString(sb.toString)
  }

  /** Driver-side reference implementation — the literal sequential fold of
    * leftmost-non-overlapping replaces the chained DataFrame form executes.
    * Test-only (parity oracle for [[compute]] at arbitrary depth).
    */
  private[graft] def foldReference(
      wrapped: String, merges: Seq[(String, String)]): String =
    merges.foldLeft(wrapped) { case (acc, (a, b)) =>
      acc.replace(" " + a + "  " + b + " ", " " + a + b + " ")
    }

  def applyBpe(c: Column, merges: Seq[(String, String)],
      spark: SparkSession): Column = {
    val auto = new BpeAutomaton(
      merges.map(_._1).toArray, merges.map(_._2).toArray)
    val bc = spark.sparkContext.broadcast(auto)
    GraftSql.column(ApplyBpe(GraftSql.expression(c), bc))
  }
}

/** `char_interleave(word)` — the space-wrapped character symbolization
  * (`"ab"` → `" a  b "`) as one codegen'd CODE-POINT walk, replacing the
  * per-occurrence `regexp_replace(word, "(.)", " $1 ")` on the BPE apply
  * path (r16 Next #4's cleanup: a regex engine invocation per word
  * occurrence, for what is a linear scan). Code-point-wise — a
  * supplementary character is ONE symbol, exactly what Java regex `(.)`
  * matched and what DuckDB's RE2 `'(.)'` replay matches, so the v1 oracle
  * text is unchanged and the v2 (full-UTF-8) alphabet symbolizes
  * identically across engines.
  */
case class CharInterleave(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "char_interleave"

  override protected def nullSafeEval(input: Any): Any =
    CharInterleave.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CharInterleave$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharInterleave {
  def compute(input: UTF8String): UTF8String = {
    val s = input.toString
    if (s.isEmpty) return UTF8String.EMPTY_UTF8
    val sb = new java.lang.StringBuilder(s.length * 3 + 2)
    var i = 0
    var first = true
    while (i < s.length) {
      val cp = s.codePointAt(i)
      sb.append(if (first) " " else "  ")
      sb.appendCodePoint(cp)
      first = false
      i += Character.charCount(cp)
    }
    sb.append(' ')
    UTF8String.fromString(sb.toString)
  }

  def charInterleave(c: Column): Column =
    GraftSql.column(CharInterleave(GraftSql.expression(c)))
}
