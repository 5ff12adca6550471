package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compact path-derivation kernels (F11/F12: docids.py:28-41 relpath
  * canonicalization, file_router.py extension probe).
  *
  * These replace chains of anchored `regexp_replace` / `split` /
  * `element_at` column expressions. Semantics are identical (every
  * original regex was a literal ^-anchored prefix strip or a last-dot
  * suffix probe), but the codegen footprint is ONE static call instead
  * of ~1.5 KB of inlined regex machinery per copy. That footprint is
  * load-bearing: predicate pushdown substitutes these expressions into
  * filters (ignore-filters, empty guards, chat detection) many times
  * over, and the inlined-regex form pushed the fused ingest stage past
  * the JVM's 64 KB method limit — Janino then failed to compile and the
  * WHOLE routing stage silently ran interpreted (the round-5 ingest
  * regression). Small call sites keep every copy cheap and the stage
  * inside whole-stage codegen.
  */
object PathKernels {

  /** `regexp_replace ^file: → ^<root>/ → ^\./ → ^data/dropzone/` chain as
    * sequential literal prefix strips (anchored single-occurrence
    * replaces ARE prefix strips).
    */
  def canonicalRelpath(path: UTF8String, rootNorm: String): UTF8String = {
    var t = path.toString
    if (t.startsWith("file:")) t = t.substring(5)
    if (t.startsWith(rootNorm)) t = t.substring(rootNorm.length)
    if (t.startsWith("./")) t = t.substring(2)
    if (t.startsWith("data/dropzone/")) t = t.substring(14)
    UTF8String.fromString(t)
  }

  /** `element_at(split(p, "/"), -1)` — text after the last slash
    * (trailing slash → empty, like the split form).
    */
  def basename(path: UTF8String): UTF8String = {
    val t = path.toString
    UTF8String.fromString(t.substring(t.lastIndexOf('/') + 1))
  }

  /** `lower(regexp_extract(basename, "\.([^.]+)$" | "(\.[^.]+)$", 1))` —
    * the lowercased text after (withDot: including) the last dot of the
    * basename; empty when there is no dot or nothing follows it, exactly
    * like the no-match regexp_extract.
    */
  def ext(path: UTF8String, withDot: Boolean): UTF8String = {
    val t = path.toString
    val name = t.substring(t.lastIndexOf('/') + 1)
    val dot = name.lastIndexOf('.')
    if (dot < 0 || dot == name.length - 1) UTF8String.EMPTY_UTF8
    else UTF8String.fromString(
      name.substring(if (withDot) dot else dot + 1)
        .toLowerCase(java.util.Locale.ROOT))
  }
}

case class CanonicalRelpath(child: Expression, rootNorm: String)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "canonical_relpath"

  override protected def nullSafeEval(input: Any): Any =
    PathKernels.canonicalRelpath(input.asInstanceOf[UTF8String], rootNorm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rootRef = ctx.addReferenceObj("rootNorm", rootNorm, "java.lang.String")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PathKernels$$.MODULE$$.canonicalRelpath($c, $rootRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class PathBasename(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "path_basename"

  override protected def nullSafeEval(input: Any): Any =
    PathKernels.basename(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PathKernels$$.MODULE$$.basename($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class PathExt(child: Expression, withDot: Boolean) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "path_ext"

  override protected def nullSafeEval(input: Any): Any =
    PathKernels.ext(input.asInstanceOf[UTF8String], withDot)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PathKernels$$.MODULE$$.ext($c, $withDot)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
