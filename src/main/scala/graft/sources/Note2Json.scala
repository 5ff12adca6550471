package graft.sources

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** note2json normalizer (SURVEY §2.8 T6; reference:
  * jsonify2ai/modules/note2json/note_to_json/parser.py): markdown/plain
  * text with inline metadata → fixed structured schema.
  *
  * Ported semantics (parser.py:157-307):
  *  - sanitize: strip NULs, truncate at 10000 chars with "... [truncated]";
  *  - `# ` headers collected; first H1 becomes the title; if no headers,
  *    first non-empty line is the fallback title;
  *  - `**Date:**` / `**Tone:**` single-line fields; `**Tags:**` keeps only
  *    `#`-prefixed tokens, hash stripped (F18);
  *  - `**Summary:**` accumulates following lines until blank or `---`;
  *  - `**Core Reflections:**` accumulates `-` list items until a non-list
  *    line;
  *  - date parsed from `yyyy-MM-dd[ HH:mm:ss]` / ISO; emitted as
  *    `<iso>Z` timestamp. Unlike the reference, a missing/unparseable date
  *    yields NULL instead of wall-clock "now" — a distributed engine must
  *    stay deterministic; ingestion time is a separate provenance column.
  *
  * JSON inputs (sniffed `{`/`[` first char) pass through
  * `_normalize_from_json` semantics: schema-shaped objects as-is is not
  * reproducible column-wise, so objects contribute title/tags and the
  * compact JSON as plain_text.
  */
object Note2Json {

  val schema: StructType = StructType(Seq(
    StructField("title", StringType, nullable = false),
    StructField("timestamp", StringType, nullable = true),
    StructField("raw_text", StringType, nullable = false),
    StructField("plain_text", StringType, nullable = false),
    StructField("tags", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("headers", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("date", StringType, nullable = true),
    StructField("tone", StringType, nullable = true),
    StructField("summary", StringType, nullable = true),
    StructField("reflections", ArrayType(StringType, containsNull = false), nullable = false)))

  private def sanitize(text: String): String = {
    val noNul = text.replace("\u0000", "")
    if (noNul.length > 10000) noNul.substring(0, 10000) + "... [truncated]" else noNul
  }

  private def parseDate(dateStr: String): Option[String] = {
    val formats = Seq("yyyy-MM-dd", "yyyy-MM-dd HH:mm:ss", "yyyy-MM-dd'T'HH:mm:ss")
    formats.iterator.flatMap { f =>
      try {
        val fmt = java.time.format.DateTimeFormatter.ofPattern(f)
        val iso =
          if (f == "yyyy-MM-dd")
            java.time.LocalDate.parse(dateStr, fmt).atStartOfDay()
          else java.time.LocalDateTime.parse(dateStr, fmt)
        Some(iso.format(java.time.format.DateTimeFormatter.ISO_LOCAL_DATE_TIME) + "Z")
      } catch { case _: Exception => None }
    }.nextOption()
  }

  /** Python-json.dumps-compatible serialization (`", "` / `": "`
    * separators, ensure_ascii=False) so plain_text matches the reference's
    * `_normalize_from_json` byte-for-byte.
    */
  private def pyDumps(n: com.fasterxml.jackson.databind.JsonNode): String = {
    val sb = new java.lang.StringBuilder
    def esc(s: String): String = {
      val b = new java.lang.StringBuilder("\"")
      s.foreach {
        case '"' => b.append("\\\"")
        case '\\' => b.append("\\\\")
        case '\n' => b.append("\\n")
        case '\r' => b.append("\\r")
        case '\t' => b.append("\\t")
        case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
        case c => b.append(c)
      }
      b.append("\"").toString
    }
    def go(x: com.fasterxml.jackson.databind.JsonNode): Unit = {
      if (x.isObject) {
        sb.append('{')
        val it = x.properties().iterator(); var first = true
        while (it.hasNext) {
          val e = it.next()
          if (!first) sb.append(", ")
          first = false
          sb.append(esc(e.getKey)).append(": ")
          go(e.getValue)
        }
        sb.append('}')
      } else if (x.isArray) {
        sb.append('[')
        val it = x.elements(); var first = true
        while (it.hasNext) {
          if (!first) sb.append(", ")
          first = false
          go(it.next())
        }
        sb.append(']')
      } else if (x.isTextual) sb.append(esc(x.asText()))
      else if (x.isNull) sb.append("null")
      else sb.append(x.asText()) // numbers/booleans render as JSON literals
    }
    go(n)
    sb.toString
  }

  private val jsonMapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** `_normalize_from_json` (parser.py:58-111): object title / filename
    * stem, F18 tag normalization (strip '#', booleans → "true"/"false"),
    * plain_text = the python-style JSON dump (or the bare string).
    */
  def normalizeFromJson(raw: String, filenameHint: String): Option[InternalRow] = {
    val node = try jsonMapper.readTree(raw) catch { case _: Exception => return None }
    if (node == null) return None

    val stem = {
      val h = if (filenameHint.nonEmpty) filenameHint else "json"
      h.split("\\.", 2).head
    }
    val title =
      if (node.isObject && node.has("title")) {
        val t = node.get("title")
        if (t.isBoolean) { if (t.asBoolean) "True" else "False" } else t.asText()
      } else stem

    val tags = scala.collection.mutable.ArrayBuffer.empty[String]
    if (node.isObject && node.has("tags") && node.get("tags").isArray) {
      node.get("tags").elements().forEachRemaining { t =>
        if (t.isTextual || t.isNumber || t.isBoolean) {
          val s = if (t.isBoolean) { if (t.asBoolean) "true" else "false" } else t.asText()
          tags += (if (s.startsWith("#")) s.substring(1) else s)
        }
      }
    }
    val plain = if (node.isTextual) node.asText() else pyDumps(node)

    def u(s: String) = UTF8String.fromString(s)
    def arr(xs: Seq[String]) = new GenericArrayData(xs.map(u).toArray[Any])
    Some(InternalRow(
      u(title), null, u(raw), u(plain),
      arr(tags.toSeq), arr(Nil), null, null, null, arr(Nil)))
  }

  /** Auto format sniff (read_input, parser.py:357-394): leading `{`/`[` →
    * JSON normalize (falling back to text parse on malformed JSON), else
    * markdown/plain text.
    */
  def parseAuto(input: String, filenameHint: String): Option[InternalRow] = {
    val first = input.dropWhile(_.isWhitespace).headOption
    if (first.contains('{') || first.contains('['))
      normalizeFromJson(input, filenameHint).orElse(parseText(input, filenameHint))
    else parseText(input, filenameHint)
  }

  def parseText(input: String, filenameHint: String): Option[InternalRow] = {
    val text = sanitize(input)
    if (text.trim.isEmpty) return None

    val lines = text.split("\r\n|\r|\n", -1)
    val rawText = text.trim
    val plainText = rawText.replace("\n", " ")
    val defaultTitle = if (filenameHint.nonEmpty) filenameHint else "stdin"
    var title = defaultTitle
    val tags = ArrayBuffer.empty[String]
    val headers = ArrayBuffer.empty[String]
    val reflections = ArrayBuffer.empty[String]
    var dateStr: Option[String] = None
    var toneStr: Option[String] = None
    var summary: Option[StringBuilder] = None
    var inSummary = false
    var inReflect = false

    for (raw <- lines) {
      val line = raw.replaceAll("[\r\n]+$", "")

      if (line.startsWith("# ")) {
        val h = line.dropWhile(c => c == '#' || c == ' ').trim
        if (h.nonEmpty) {
          headers += h
          if (title == defaultTitle) title = h
        }
      }
      if (line.startsWith("**Date:**"))
        dateStr = Some(line.substring("**Date:**".length).trim)
      if (line.startsWith("**Tags:**")) {
        tags.clear()
        tags ++= line.substring("**Tags:**".length).trim
          .split("\\s+").filter(_.startsWith("#")).map(_.dropWhile(_ == '#').trim)
      }
      if (line.startsWith("**Tone:**"))
        toneStr = Some(line.substring("**Tone:**".length).trim)

      if (line.toLowerCase.startsWith("**summary:**")) {
        inSummary = true
        summary = Some(new StringBuilder)
      } else if (inSummary) {
        if (line.trim.isEmpty || line.trim.startsWith("---")) inSummary = false
        else summary.foreach(_.append(line.trim).append(' '))
      }

      if (line.toLowerCase.startsWith("**core reflections:**")) {
        inReflect = true
      } else if (inReflect) {
        if (!line.startsWith("-")) inReflect = false
        else {
          val r = line.dropWhile(c => c == '-' || c == ' ').trim
          if (r.nonEmpty) reflections += r
        }
      }
    }

    if (headers.isEmpty && title == defaultTitle)
      lines.find(_.trim.nonEmpty).foreach(l => title = l.trim)
    if (title.trim.isEmpty) title = if (filenameHint.nonEmpty) filenameHint else "untitled"

    val timestamp = dateStr.flatMap(parseDate)

    def u(s: String) = UTF8String.fromString(s)
    def arr(xs: Seq[String]) = new GenericArrayData(xs.map(u).toArray[Any])
    Some(InternalRow(
      u(title), timestamp.map(u).orNull, u(rawText), u(plainText),
      arr(tags.toSeq), arr(headers.toSeq),
      dateStr.map(u).orNull, toneStr.map(u).orNull,
      summary.map(s => u(s.toString.trim)).orNull,
      arr(reflections.toSeq)))
  }

  /** struct per [[schema]], null for empty input. */
  def note2json(text: Column, filenameHint: Column): Column =
    GraftSql.column(Note2JsonParse(
      GraftSql.expression(text), GraftSql.expression(filenameHint)))
}

case class Note2JsonParse(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = Note2Json.schema
  override def prettyName: String = "note2json"
  override def nullable: Boolean = true

  override protected def nullSafeEval(text: Any, hint: Any): Any =
    Note2JsonParse.computeRow(
      text.asInstanceOf[UTF8String], hint.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, h) => {
      s"""
        ${ev.value} = graft.sources.Note2JsonParse$$.MODULE$$.computeRow($t, $h);
        ${ev.isNull} = ${ev.value} == null;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Note2JsonParse {
  def computeRow(text: UTF8String, hint: UTF8String): InternalRow =
    Note2Json.parseAuto(text.toString, hint.toString).orNull
}
