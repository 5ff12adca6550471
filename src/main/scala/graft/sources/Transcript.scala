package graft.sources

import java.security.MessageDigest
import java.util.regex.Pattern

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Chat-transcript detection + parsing (SURVEY §2.8 T5, §2.7 F16/F17;
  * reference: worker/app/services/parse_transcript.py).
  *
  * Detection is pure column arithmetic over regex match counts — exactly
  * the reference's weighted-pattern confidence (parse_transcript.py:51-142)
  * re-expressed with `regexp_extract_all` + `when`, fully codegen-able and
  * distributable. Parsing (role-split + normalization + formatting +
  * deterministic `transcript:{sig}:{thread}` ids) runs as a Catalyst
  * expression.
  */
object Transcript {

  val DetectionThreshold = 0.85

  // Reference patterns (parse_transcript.py:24-45), Java regex with inline flags.
  private val RolePrefix = "(?im)^(user|assistant|system|human|ai|bot|agent)\\s*:\\s*"
  private val TimestampedRole =
    "(?im)^\\[?\\d{4}-\\d{2}-\\d{2}[T\\s]?\\d{0,2}:?\\d{0,2}:?\\d{0,2}[^\\]]*\\]?\\s*(user|assistant|system|human|ai|bot|agent)\\s*:\\s*"
  private val JsonRole =
    "(?i)[\"']?role[\"']?\\s*:\\s*[\"']?(user|assistant|system|human|ai|bot|agent)[\"']?"
  private val MarkdownRole = "(?im)^\\*\\*(user|assistant|system|human|ai|bot|agent)\\*\\*\\s*:\\s*"

  private def matchCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  private def roleVariant(pattern: String, roles: String): Column => Column = {
    val p = pattern.replace("(user|assistant|system|human|ai|bot|agent)", roles)
    (text: Column) => text.rlike(p)
  }

  /** Detection confidence in [0,1] (parse_transcript.py:51-142).
    *
    * The regex match counts and role flags are computed ONCE as child
    * columns; the clamp/boost arithmetic combines their scalars in a
    * single expression. A naive `when(...).otherwise(...)` chain
    * re-references each prior stage twice — exponential duplication of the
    * regex subtrees that blew the serialized plan up to multi-MiB task
    * binaries.
    */
  def confidence(text: Column, filename: Column): Column = {
    val totalLines = size(filter(split(text, "\n"), l => trim(l) =!= ""))
    val ts = matchCount(text, TimestampedRole)
    val rp = matchCount(text, RolePrefix)
    val md = matchCount(text, MarkdownRole)
    val js = matchCount(text, JsonRole)

    val userRoles = "(?:user|human)"
    val assistantRoles = "(?:assistant|ai|bot|agent)"
    val systemRoles = "(?:system)"
    def anyPattern(roles: String): Column =
      roleVariant(RolePrefix, roles)(text) ||
        roleVariant(TimestampedRole, roles)(text) ||
        roleVariant(MarkdownRole, roles)(text)
    val nRoles = anyPattern(userRoles).cast("int") +
      anyPattern(assistantRoles).cast("int") + anyPattern(systemRoles).cast("int")

    val hints = Seq("chat", "transcript", "conversation", "dialog", "dialogue")
    val boost = when(
      hints.map(h => lower(filename).contains(h)).reduce(_ || _), 0.15).otherwise(0.0)

    val tooShort = text.isNull || length(trim(text)) < 20

    org.apache.spark.sql.GraftSql.column(TranscriptConfidence(Seq(
      ts, rp, md, js, nRoles, totalLines, boost, tooShort.cast("int"))
      .map(org.apache.spark.sql.GraftSql.expression)))
  }

  def isTranscript(text: Column, filename: Column): Column =
    confidence(text, filename) >= DetectionThreshold

  // ---------------------------------------------------------------------
  // Parsing
  // ---------------------------------------------------------------------

  val parsedSchema: StructType = StructType(Seq(
    StructField("document_id", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("title", StringType, nullable = false),
    StructField("message_count", IntegerType, nullable = false)))

  private val SplitPattern = Pattern.compile(
    "(?:^|\\n)(?:\\[?\\d{4}-\\d{2}-\\d{2}[T\\s]?\\d{0,2}:?\\d{0,2}:?\\d{0,2}[^\\]]*\\]?\\s*)?" +
      "(?:\\*\\*)?(user|assistant|system|human|ai|bot|agent)(?:\\*\\*)?\\s*:\\s*",
    Pattern.CASE_INSENSITIVE)

  private def sha1Hex(s: String, n: Int): String =
    MessageDigest.getInstance("SHA-1")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(n)

  private def normalizeRole(raw: String): String = raw.toLowerCase match {
    case "human" | "user" => "user"
    case "assistant" | "ai" | "bot" | "agent" => "assistant"
    case "system" => "system"
    case other => other
  }

  private def roleLabel(role: String): String = role match {
    case "user" => "User"
    case "assistant" => "Assistant"
    case "system" => "System"
    case other => other.capitalize
  }

  /** Split into (role, content) messages like re.split with a capturing
    * group (parse_transcript.py:160-195).
    */
  def extractMessages(text: String): Seq[(String, String)] = {
    val m = SplitPattern.matcher(text)
    val roles = ArrayBuffer.empty[String]
    val bounds = ArrayBuffer.empty[(Int, Int)] // content start for each role
    while (m.find()) {
      roles += m.group(1)
      bounds += ((m.start(), m.end()))
    }
    if (roles.isEmpty) {
      val t = text.trim
      return if (t.isEmpty) Nil else Seq(("unknown", t))
    }
    val out = ArrayBuffer.empty[(String, String)]
    var i = 0
    while (i < roles.length) {
      val contentStart = bounds(i)._2
      val contentEnd = if (i + 1 < roles.length) bounds(i + 1)._1 else text.length
      val content = text.substring(contentStart, contentEnd).trim
      if (content.nonEmpty) out += ((normalizeRole(roles(i)), content))
      i += 1
    }
    out.toSeq
  }

  /** Full parse → (document_id, formatted_text, title, message_count)
    * (parse_transcript.py:228-291).
    */
  def parse(text: String, filename: String): Option[InternalRow] = {
    if (text == null || text.trim.isEmpty) return None
    val messages = extractMessages(text)
    if (messages.isEmpty) return None

    val fileSig = sha1Hex(text, 16)
    val threadId = sha1Hex(text.take(1000), 12) + "_0"
    val documentId = s"transcript:$fileSig:$threadId"

    val formatted = messages
      .map { case (role, content) => s"${roleLabel(role)}: $content" }
      .mkString("\n\n")

    val baseName = {
      val b = if (filename.contains(".")) filename.substring(0, filename.lastIndexOf('.'))
        else filename
      b.replace('_', ' ').replace('-', ' ').trim
    }
    val firstUser = messages.collectFirst {
      case ("user", content) if content.nonEmpty => content.take(50).trim
    }
    val title = firstUser match {
      case Some(msg) =>
        val t = if (msg.length > 40) msg.take(40) + "..." else msg
        s"$baseName: $t"
      case None => if (baseName.nonEmpty) baseName else "Chat Transcript"
    }

    def u(s: String) = UTF8String.fromString(s)
    Some(InternalRow(u(documentId), u(formatted), u(title), messages.length))
  }

  /** struct<document_id,text,title,message_count> or null. */
  def parseTranscriptCol(text: Column, filename: Column): Column =
    GraftSql.column(TranscriptParse(
      GraftSql.expression(text), GraftSql.expression(filename)))
}

/** Scalar combine for [[Transcript.confidence]]: children =
  * (ts, rp, md, js, nRoles, totalLines, boost, tooShort). Pure arithmetic
  * over 8 already-computed values; CodegenFallback is fine (one call per
  * row, trivial cost) and keeps the expression tree linear.
  */
case class TranscriptConfidence(children: Seq[Expression])
    extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "transcript_confidence"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    def num(i: Int): Double = children(i).eval(input) match {
      case null => 0.0
      case n: Number => n.doubleValue()
      case b: Boolean => if (b) 1.0 else 0.0
    }
    val (ts, rp, md, js) = (num(0), num(1), num(2), num(3))
    val nRoles = num(4)
    val totalLines = num(5)
    val boost = num(6)
    val tooShort = num(7) > 0.5
    if (tooShort || totalLines == 0) return 0.0

    val weightedRaw = ts * 1.5 + rp * 1.2 + md * 1.2 + js * 0.5
    val weighted = if (nRoles < 2) weightedRaw * 0.3 else weightedRaw
    val expected = math.max(2.0, totalLines / 10.0)
    val ratio = math.min(weighted / expected, 2.0)
    val base = math.min(ratio * 0.5, 0.95)
    val c0 = math.min(base + boost, 0.99)
    val c1 = if (weighted < 2) math.min(c0, 0.5) else c0
    val c2 = if (ts >= 3) math.max(c1, 0.9) else c1
    val c3 = if (rp >= 4 && nRoles >= 2) math.max(c2, 0.88) else c2
    java.math.BigDecimal.valueOf(c3)
      .setScale(3, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

case class TranscriptParse(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = Transcript.parsedSchema
  override def prettyName: String = "parse_transcript"
  override def nullable: Boolean = true

  override protected def nullSafeEval(text: Any, filename: Any): Any =
    Transcript.parse(
      text.asInstanceOf[UTF8String].toString,
      filename.asInstanceOf[UTF8String].toString).orNull

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, f) => {
      s"""
        ${ev.value} = graft.sources.TranscriptParse$$.MODULE$$.computeRow($t, $f);
        ${ev.isNull} = ${ev.value} == null;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object TranscriptParse {
  def computeRow(text: UTF8String, filename: UTF8String): InternalRow =
    Transcript.parse(text.toString, filename.toString).orNull
}
