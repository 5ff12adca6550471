package graft.sources

import scala.collection.mutable.ArrayBuffer

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ChatGPT-export parsing: one JSON file → many conversation documents
  * (SURVEY §2.8 T4; reference: worker/app/services/parse_chatgpt.py).
  *
  * The export's `mapping` node carries union-typed content (string | dict
  * with parts | list), which defeats a static `from_json` schema — so the
  * salvage logic runs as a Jackson-backed Catalyst expression producing
  * `array<struct<...>>` for `posexplode`. Semantics ported from the
  * reference: id fallback chain (id → conversation_id → uuid), per-message
  * content salvage (parse_chatgpt.py:192-223), sort by create_time
  * (:261-265), `[YYYY-MM-DD HH:MM] role: content` formatting (:268-280),
  * unix→ISO-8601-Z conversion for conversation timestamps (:132-165).
  */
object ChatExport {

  val schema: StructType = StructType(Seq(
    StructField("conversation_id", StringType, nullable = false),
    StructField("title", StringType, nullable = true),
    StructField("text", StringType, nullable = false),
    StructField("message_count", IntegerType, nullable = false),
    StructField("chat_created_at", StringType, nullable = true),
    StructField("chat_updated_at", StringType, nullable = true)))

  private val mapper = new ObjectMapper()

  /** Structural detection (parse_chatgpt.py:16-89): a list where some item
    * has a dict `mapping` containing a node with message.author.role and
    * salvageable content.
    */
  def isChatExport(text: String, filename: String = ""): Boolean = {
    if (filename.toLowerCase == "conversations.json") return true
    val root = try mapper.readTree(text) catch { case _: Exception => return false }
    if (!root.isArray || root.isEmpty) return false
    val convs = root.elements()
    while (convs.hasNext) {
      val item = convs.next()
      if (item.isObject) {
        val mapping = item.get("mapping")
        if (mapping != null && mapping.isObject) {
          val nodes = mapping.elements()
          while (nodes.hasNext) {
            val node = nodes.next()
            if (node.isObject) {
              val message = node.get("message")
              if (message != null && message.isObject) {
                val author = message.get("author")
                val roleOk = author != null && author.isObject &&
                  author.get("role") != null && author.get("role").isTextual
                if (roleOk && hasSalvageableContent(message.get("content"))) return true
              }
            }
          }
        }
      }
    }
    false
  }

  private def hasSalvageableContent(content: JsonNode): Boolean =
    content != null && (
      (content.isTextual && content.asText().trim.nonEmpty) ||
      (content.isArray && content.size() > 0) ||
      (content.isObject && {
        val parts = content.get("parts")
        (parts != null && parts.isArray && parts.size() > 0) || content.has("text")
      }))

  private def salvageContent(content: JsonNode): String = {
    if (content == null) return ""
    if (content.isTextual) return content.asText()
    if (content.isObject) {
      val parts = content.get("parts")
      if (parts != null && parts.isArray) {
        val out = ArrayBuffer.empty[String]
        parts.elements().forEachRemaining { p =>
          if (p.isTextual) out += p.asText()
          else if (p.isObject && p.has("text")) out += p.get("text").asText()
        }
        return out.mkString("\n")
      }
      if (content.has("text")) return content.get("text").asText()
      return ""
    }
    if (content.isArray) {
      val out = ArrayBuffer.empty[String]
      content.elements().forEachRemaining { p =>
        if (p.isTextual) out += p.asText()
        else if (p.isObject && p.has("text")) out += p.get("text").asText()
      }
      return out.mkString("\n")
    }
    ""
  }

  /** ISO-8601 Z like Python datetime.isoformat(): either no fraction or
    * exactly 6-digit microseconds (parse_chatgpt.py:141-143).
    */
  private def isoZ(epochSeconds: Double): String = {
    val secs = math.floor(epochSeconds).toLong
    val micros = math.round((epochSeconds - secs) * 1e6)
    val base = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochSecond(secs))
    if (micros == 0) s"${base}Z" else f"$base.$micros%06dZ"
  }

  private def stamp(epochSeconds: Double): String =
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochSecond(math.floor(epochSeconds).toLong))

  /** Parse one export into conversation structs. */
  def parseExport(text: String): Seq[InternalRow] = {
    val root = try mapper.readTree(text) catch { case _: Exception => return Nil }
    if (!root.isArray) return Nil
    val out = ArrayBuffer.empty[InternalRow]
    root.elements().forEachRemaining { conv =>
      if (conv.isObject) parseConversation(conv).foreach(out += _)
    }
    out.toSeq
  }

  private def parseConversation(conv: JsonNode): Option[InternalRow] = {
    def textOf(field: String): Option[String] = {
      val n = conv.get(field)
      if (n != null && !n.isNull) Some(n.asText()) else None
    }
    val conversationId = textOf("id").orElse(textOf("conversation_id"))
      .orElse(textOf("uuid")).filter(_.nonEmpty)
    if (conversationId.isEmpty) return None

    val title = textOf("title").orElse(textOf("conversation_title")).filter(_.nonEmpty)
    def isoOf(field: String): Option[String] = {
      val n = conv.get(field)
      if (n == null || n.isNull) None
      else if (n.isNumber) Some(isoZ(n.asDouble()))
      else None // string ISO passthrough handled by upstream systems rarely; keep numeric path
    }
    val created = isoOf("create_time")
    val updated = isoOf("update_time")

    val mapping = conv.get("mapping")
    if (mapping == null || !mapping.isObject) return None

    case class Msg(role: String, content: String, stampStr: String, createTime: Double)
    val msgs = ArrayBuffer.empty[Msg]
    mapping.elements().forEachRemaining { node =>
      if (node.isObject) {
        val message = node.get("message")
        if (message != null && message.isObject) {
          val role = Option(message.get("author"))
            .filter(_.isObject).flatMap(a => Option(a.get("role")))
            .map(_.asText())
            .orElse(Option(message.get("role")).map(_.asText()))
            .getOrElse("unknown")
          val content = salvageContent(message.get("content"))
          if (content.trim.nonEmpty) {
            val ct = Option(message.get("create_time")).filter(_.isNumber)
              .orElse(Option(node.get("create_time")).filter(_.isNumber))
              .map(_.asDouble()).getOrElse(0.0)
            val ts = if (ct != 0.0) stamp(ct) else ""
            msgs += Msg(role, content, ts, ct)
          }
        }
      }
    }
    val sorted = msgs.sortBy(_.createTime)
    val lines = sorted.map { m =>
      if (m.stampStr.nonEmpty) s"[${m.stampStr}] ${m.role}: ${m.content}"
      else s"${m.role}: ${m.content}"
    }
    val text = lines.mkString("\n\n")
    if (text.trim.isEmpty) return None

    def u(s: String): UTF8String = UTF8String.fromString(s)
    Some(InternalRow(
      u(conversationId.get),
      title.map(u).orNull,
      u(text),
      sorted.length,
      created.map(u).orNull,
      updated.map(u).orNull))
  }

  /** array<struct> of conversations for posexplode. */
  def chatConversations(raw: Column): Column =
    GraftSql.column(ChatExportExplode(GraftSql.expression(raw)))
}

/** `chat_conversations(json)` ➜ array<struct<conversation_id, title, text,
  * message_count, chat_created_at, chat_updated_at>>.
  */
case class ChatExportExplode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(ChatExport.schema, containsNull = false)
  override def prettyName: String = "chat_conversations"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      ChatExport.parseExport(input.asInstanceOf[UTF8String].toString).toArray[Any])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.sources.ChatExportExplode$$.MODULE$$.computeArray($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ChatExportExplode {
  def computeArray(text: UTF8String): ArrayData =
    new GenericArrayData(ChatExport.parseExport(text.toString).toArray[Any])
}
