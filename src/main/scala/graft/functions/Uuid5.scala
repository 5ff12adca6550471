package graft.functions

import java.nio.ByteBuffer
import java.security.MessageDigest
import java.util.UUID

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC 4122 §4.3 name-based (SHA-1) UUID as a codegen'd Catalyst expression.
  *
  * The reference derives every document/chunk identity deterministically:
  * `document_id = uuid5(namespace, relpath)` and
  * `chunk_id = uuid5(document_id, "chunk:{idx}")`
  * (reference: worker/app/utils/docids.py:25,44-49), which is what makes
  * re-ingestion replace rather than duplicate. Spark has no uuid5 built-in
  * (`uuid()` is nondeterministic), hence this expression. It stays inside
  * whole-stage codegen via a static-call `defineCodeGen`, so id derivation
  * adds no codegen boundary on the 100 TB ingest path.
  */
case class Uuid5(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "uuid5"

  override protected def nullSafeEval(ns: Any, name: Any): Any =
    Uuid5.compute(ns.asInstanceOf[UTF8String], name.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Uuid5$$.MODULE$$.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Uuid5 {
  /** Namespace seed used by the reference for all filesystem document ids
    * (reference: worker/app/utils/docids.py:25).
    */
  val DefaultNamespace = "00000000-0000-5000-8000-000000000000"

  /** SHA-1(namespace-bytes ++ name-utf8) with version 5 / IETF variant bits.
    *
    * A namespace that is not itself a UUID (the reference's prefixed ids:
    * `chatgpt:{id}`, `transcript:{sig}:{thread}`) is first mapped to one
    * via uuid5(DefaultNamespace, namespace) — the reference falls back to
    * RANDOM uuid4 point ids on those paths (process.py:1364,1515), which
    * its own invariants doc flags as divergent; we keep determinism
    * everywhere (SURVEY §7.4).
    */
  def compute(namespace: UTF8String, name: UTF8String): UTF8String = {
    val nsStr = namespace.toString
    val ns =
      try UUID.fromString(nsStr)
      catch {
        case _: IllegalArgumentException =>
          UUID.fromString(
            compute(UTF8String.fromString(DefaultNamespace), namespace).toString)
      }
    val md = MessageDigest.getInstance("SHA-1")
    val nsBytes = ByteBuffer.allocate(16)
      .putLong(ns.getMostSignificantBits)
      .putLong(ns.getLeastSignificantBits)
      .array()
    md.update(nsBytes)
    md.update(name.getBytes)
    val h = md.digest()
    h(6) = ((h(6) & 0x0f) | 0x50).toByte // version 5
    h(8) = ((h(8) & 0x3f) | 0x80).toByte // IETF variant
    val bb = ByteBuffer.wrap(h, 0, 16)
    UTF8String.fromString(new UUID(bb.getLong, bb.getLong).toString)
  }

  /** uuid5(namespace, name) as a Column. */
  def uuid5(namespace: Column, name: Column): Column =
    GraftSql.column(
      Uuid5(GraftSql.expression(namespace), GraftSql.expression(name)))

  /** Document id for a canonical relpath, matching the reference scheme. */
  def documentId(relpath: Column): Column = {
    import org.apache.spark.sql.functions.lit
    uuid5(lit(DefaultNamespace), relpath)
  }

  /** Chunk id: uuid5(document_id, "chunk:{idx}"). */
  def chunkId(documentId: Column, idx: Column): Column = {
    import org.apache.spark.sql.functions.{concat, lit}
    uuid5(documentId, concat(lit("chunk:"), idx.cast(StringType)))
  }
}
